package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters, so graft's
  * custom Catalyst expressions (graft.expressions.*) can be exposed as
  * regular `Column`s. The same pattern every Spark extension library uses
  * (no Spark internals are modified — this only re-exports two converters).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column → Expression conversion. `expression` returns a lazy
    * `ColumnNodeExpression` wrapper, which the classic DataFrame API
    * converts during plan building — but an expression returned from a SQL
    * FunctionBuilder goes straight into the analyzer, which type-checks the
    * enclosing function before any wrapper conversion runs (the child reads
    * as VOID and analysis fails). SQL-registered builders must therefore
    * convert the composed Column eagerly.
    */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}

/** Bridge to the `private[sql]` session-local `FunctionRegistry`, so graft's
  * SQL functions can be registered onto an ALREADY-RUNNING session
  * (`graft.GraftFunctions.register(spark)`). The config-time path —
  * `spark.sql.extensions=graft.GraftExtensions` — needs no bridge and is the
  * recommended production route; this exists for notebooks/REPLs where the
  * session is handed to the user pre-built.
  */
object GraftRegistryBridge {
  def register(spark: SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit = {
    val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      "graft.GraftFunctions", name)
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info,
        builder)
  }
}
