package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization / gaps-and-islands (SURVEY.md W7).
  *
  * Reference: contiguous in-patch visits delimited by exits —
  * `time_slice = exit_patch.cumsum()` then per-slice logic
  * (`aeon/dj_pipeline/tracking.py:318-323`); epochs closing on the next
  * epoch's start (`acquisition.py:253-304`).
  *
  * One shuffle on `keys`, two window passes, all codegen'd. In streaming the
  * same semantics are `session_window(ts, gap)` (see graft.streaming).
  */
object Sessionize {

  /** Assign a session id per key: a new session starts when the gap since the
    * previous event exceeds `gapSeconds` (classic gaps-and-islands).
    * Adds `session_id` (0-based per key, ordered by time).
    */
  def byGap(df: DataFrame, timeCol: String, keys: Seq[String], gapSeconds: Long): DataFrame = {
    require(keys.nonEmpty,
      "Sessionize.byGap needs partitioning keys (sessions shuffle on " +
        "them); an unkeyed sessionization runs in ONE partition — if that " +
        "is really what you want, call byGapGlobal")
    byGapImpl(df, timeCol, keys, gapSeconds)
  }

  /** Unkeyed [[byGap]]: one global gaps-and-islands pass in a single
    * partition — fine for a presentation-edge frame (one device's events,
    * a catalog), never for corpus-scale input. The separate name makes the
    * single-partition choice explicit at the call site.
    */
  def byGapGlobal(df: DataFrame, timeCol: String, gapSeconds: Long): DataFrame =
    byGapImpl(df, timeCol, Seq.empty, gapSeconds)

  private def byGapImpl(df: DataFrame, timeCol: String, keys: Seq[String],
                        gapSeconds: Long): DataFrame = {
    val part = if (keys.nonEmpty) Window.partitionBy(keys.map(col): _*) else Window.partitionBy()
    val w = part.orderBy(col(timeCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(col(timeCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(timeCol)) - unix_micros(col("__prev")) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(wRun) - 1)
      .drop("__prev", "__new")
  }

  /** Sessionize on an explicit boundary flag: a new island starts where
    * `boundary` is true (the reference's `exit_patch.cumsum()` pattern).
    */
  def byBoundary(df: DataFrame, timeCol: String, keys: Seq[String], boundary: Column): DataFrame = {
    require(keys.nonEmpty,
      "Sessionize.byBoundary needs partitioning keys (islands shuffle on " +
        "them); an unkeyed pass runs in ONE partition — if that is really " +
        "what you want, call byBoundaryGlobal")
    byBoundaryImpl(df, timeCol, keys, boundary)
  }

  /** Unkeyed [[byBoundary]] — same single-partition caveat as
    * [[byGapGlobal]]. */
  def byBoundaryGlobal(df: DataFrame, timeCol: String, boundary: Column): DataFrame =
    byBoundaryImpl(df, timeCol, Seq.empty, boundary)

  private def byBoundaryImpl(df: DataFrame, timeCol: String,
                             keys: Seq[String], boundary: Column): DataFrame = {
    val part = if (keys.nonEmpty) Window.partitionBy(keys.map(col): _*) else Window.partitionBy()
    val wRun = part.orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("session_id", sum(boundary.cast("long")).over(wRun))
  }
}
