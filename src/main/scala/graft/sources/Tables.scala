package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * Mirrors the reference's source layer: a catalog of named tables, each a
  * parquet scan (`fetch_stream`'s bronze layer — reference
  * `aeon/dj_pipeline/__init__.py:71-106`). All column pruning and predicate
  * pushdown happens through Catalyst on top of these scans; loaders never
  * cache or collect.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The `events` stream table has been written by the generator with three
    * different physical `ts` encodings across rounds; normalize all of them
    * to the µs-precision session-TZ TimestampType the query layer expects —
    * the reference's own fetch-edge precision contract (µs rounding,
    * `aeon/dj_pipeline/__init__.py:100-105`):
    *  - nanosecond INT64 (Spark rejects outright): read as long via
    *    `spark.sql.legacy.parquet.nanosAsLong`, floor-divide to µs;
    *  - `timestamp[us]` without TZ annotation (Spark 4 infers
    *    TIMESTAMP_NTZ, which `unix_micros` et al. reject): cast to
    *    TIMESTAMP — the session timezone is pinned UTC (GraftSession), so
    *    the instant is unchanged;
    *  - plain `timestamp[us]` with TZ: pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
