package graft

/** Plan-inspection main — the per-query companion to [[PlanAudit]]: dump
  * one declared query's FORMATTED physical plan (scan pushdowns, exchange
  * placement, codegen spans) for eyeball review.
  *
  * Usage: `runMain graft.ExplainQ <sfDir> <queryName>`
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
