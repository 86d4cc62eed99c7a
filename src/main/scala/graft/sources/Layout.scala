package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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

  /** Linear map of an integral column over `[lo, hi]` onto the Morton grid
    * `[0, 2^bits)` — exact INTEGER arithmetic throughout (`(c-lo)·2^bits`
    * then integral division by the span; a double round-trip would lose
    * exactness once the product exceeds 2⁵³, e.g. microsecond timestamps
    * at bits=16), so the bucket — and everything z-ordered on it — replays
    * bit-for-bit in any engine with `//` (q119's DuckDB oracle).
    */
  def mortonBucket(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    // (c-lo)·2^bits is computed in Long: reject spans where it could wrap
    // (a silent non-ANSI overflow would alias buckets with no error)
    require(hi - lo + 1 <= (Long.MaxValue >> bits),
      s"span ${hi - lo + 1} * 2^$bits overflows Long — use fewer bits or a " +
        "narrower range")
    import org.apache.spark.sql.GraftColumnBridge._
    column(new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      eagerExpression((c.cast("long") - lit(lo)) * lit(1L << bits)),
      eagerExpression(lit(hi - lo + 1))))
  }

  /** 2-D Morton (Z-order) code: interleave the low `bits` bits of two
    * bucketed dimensions (`a` even positions, `b` odd) into one long whose
    * ordering is the Z space-filling curve. Pure codegen'd bit arithmetic
    * (2·bits shift/mask terms), no UDF.
    *
    * Why it matters at 100 TB: sorting by `(t, u)` clusters files tightly
    * on `t` but leaves every file spanning ALL of `u`, so a predicate on
    * `u` skips nothing. Sorting by the z-value bounds EVERY file in BOTH
    * dimensions (a contiguous z-range is a union of small rectangles), so
    * parquet min/max stats skip files for rectangle queries on either or
    * both dimensions — the layout trick behind Delta/Iceberg `ZORDER BY`,
    * here as a plain column so it composes with any writer. LayoutSpec
    * measures the skip-rate difference on disk.
    */
  def morton2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** Z-order a frame for writing: range-partition into `numFiles` output
    * tasks by the interleaved code and sort within each — every output file
    * then covers a contiguous z-range, i.e. a small rectangle stack in
    * (`a`, `b`) space, giving parquet file/row-group stats selectivity on
    * both dimensions. Layout-only: row VALUES are untouched, so this never
    * appears inside an oracled result, only in front of a writer. (Range
    * boundaries come from Spark's reservoir sampling — fine for layout,
    * where boundaries only need to exist, not reproduce; see shardByTokens'
    * scaladoc for why content-bearing assignments must not rely on it.)
    */
  def zorderBy(df: DataFrame, a: Column, b: Column, numFiles: Int,
               bits: Int = 16): DataFrame = {
    // morton2 reads only the low `bits` bits, so an unbucketed dimension
    // (ids in the millions at bits=16) would alias distant rows onto the
    // same z-code and the layout would QUIETLY stop skipping — the failure
    // is invisible until someone measures file envelopes. This is the
    // write-path entry point (a branch per row is noise next to the write),
    // so enforce the [0, 2^bits) contract loudly; bucket with
    // [[mortonBucket]] / pmod first.
    def checked(c: Column, name: String): Column =
      when(c.cast("long").between(0L, (1L << bits) - 1), c.cast("long"))
        .otherwise(raise_error(concat(
          lit(s"zorderBy: $name value "), c.cast("string"),
          lit(s" outside [0, 2^$bits) — bucket dimensions first " +
            "(mortonBucket/pmod)"))))
    df.withColumn("__z", morton2(checked(a, "a"), checked(b, "b"), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

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
