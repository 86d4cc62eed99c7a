package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{PortableHash28, PortableHash60, VecCosine, VecDot}

/** SparkSessionExtensions entry point: registers graft's custom expressions
  * as SQL functions, so `spark.sql("SELECT vec_cosine(a, b) ...")` works and
  * the engine is usable from pure-SQL clients (SURVEY.md §7.4 custom path
  * (b), wired through the supported extension mechanism).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * programmatically via `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot takes exactly 2 arguments")
        VecDot(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_cosine takes exactly 2 arguments")
        VecCosine(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("portable_hash60"),
      new ExpressionInfo(classOf[PortableHash60].getName, "portable_hash60"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "portable_hash60 takes exactly 1 argument")
        PortableHash60(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("portable_hash28"),
      new ExpressionInfo(classOf[PortableHash28].getName, "portable_hash28"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "portable_hash28 takes exactly 1 argument")
        PortableHash28(children.head)
      }))
  }
}
