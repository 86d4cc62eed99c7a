package graft
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    df.explain("formatted")
    spark.stop()
  }
}
