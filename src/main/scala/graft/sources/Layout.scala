package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout utilities — the bronze-layer partitioning discipline
  * (SURVEY.md §7.1: parquet partitioned by `(experiment, device, stream,
  * chunk_start)` so every read is a pruned scan; the reference's codec
  * "decode" becomes partition pruning).
  *
  * At 100 TB the partition layout IS the index: a time-range query over a
  * month of one device touches that device's ~720 hourly partitions and
  * nothing else. `writeChunked`/`readChunk` make the contract concrete and
  * testable (LayoutSpec asserts the scan's file set actually shrinks).
  */
object Layout {

  /** Write a stream DataFrame partitioned by derived chunk columns
    * (`chunk_date`, `chunk_hour` from the event time) plus any logical keys.
    * Hive-style directories → partition pruning on equality/range filters
    * over the partition columns.
    */
  def writeChunked(df: DataFrame, path: String, tsCol: String,
                   keys: Seq[String] = Seq.empty): Unit =
    df.withColumn("chunk_date", date_format(col(tsCol), "yyyy-MM-dd"))
      .withColumn("chunk_hour", hour(col(tsCol)))
      .write
      .partitionBy(keys :+ "chunk_date" :+ "chunk_hour": _*)
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Pruned read of one time range [start, end): lexicographic
    * (chunk_date, chunk_hour) bounds as partition filters — only the hourly
    * partitions intersecting the range are listed/read — plus the exact row
    * predicate for sub-hour boundaries. LayoutSpec asserts the executed
    * scan's numFiles equals the intersecting hour count.
    */
  def readRange(spark: SparkSession, path: String, tsCol: String,
                start: String, end: String): DataFrame = {
    val s = to_timestamp(lit(start))
    val e = to_timestamp(lit(end))
    val eIncl = e - expr("INTERVAL 1 MICROSECOND") // end is exclusive
    val sd = date_format(s, "yyyy-MM-dd"); val sh = hour(s)
    val ed = date_format(eIncl, "yyyy-MM-dd"); val eh = hour(eIncl)
    spark.read.parquet(path)
      .filter(col("chunk_date") > sd ||
        (col("chunk_date") === sd && col("chunk_hour") >= sh))
      .filter(col("chunk_date") < ed ||
        (col("chunk_date") === ed && col("chunk_hour") <= eh))
      .filter(col(tsCol) >= s && col(tsCol) < e)
  }
}
