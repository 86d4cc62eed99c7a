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
}
