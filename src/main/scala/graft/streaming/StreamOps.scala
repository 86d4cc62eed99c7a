package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming re-expression of the reference's incremental
  * semantics (SURVEY.md §2.9).
  *
  * The reference is a micro-batch incremental pipeline: 1-hour tumbling
  * chunks (`aeon/dj_pipeline/acquisition.py:500-511`), epochs that close only
  * when the successor appears (`acquisition.py:253-304`), and late-data
  * look-back repair (`acquisition.py:278-304`). Those map to tumbling
  * windows + watermarks + session windows here. Every transform is
  * batch/stream agnostic — it takes a DataFrame that may be `readStream`-
  * sourced, so the same code runs in the batch populate engine and in a
  * `Trigger.AvailableNow` incremental job (the Spark-native analogue of
  * `populate()` over new chunks).
  */
object StreamOps {

  /** Per-(key, 1-hour chunk) sample counts + bounds — the streaming Chunk
    * catalog (reference `Chunk` table). With a watermark, late rows beyond
    * `lateness` are dropped and the window state is bounded; the reference's
    * equivalent is the look-back closure repairing only epoch N-1.
    */
  def chunkCounts(events: DataFrame, tsCol: String, keys: Seq[String],
                  lateness: String = "2 hours"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark(tsCol, lateness) else events
    wm.groupBy((keys.map(col) :+ window(col(tsCol), "1 hour").as("chunk")): _*)
      .agg(count(lit(1)).as("sample_count"),
        min(col(tsCol)).as("first_ts"), max(col(tsCol)).as("last_ts"))
      .select((keys.map(col) :+ col("chunk.start").as("chunk_start") :+
        col("chunk.end").as("chunk_end") :+ col("sample_count") :+
        col("first_ts") :+ col("last_ts")): _*)
  }

  /** Session windows by inactivity gap — the streaming form of
    * `Sessionize.byGap` (reference in-patch visits, `tracking.py:318-323`).
    */
  def sessionAgg(events: DataFrame, tsCol: String, keys: Seq[String],
                 gap: String = "30 minutes",
                 lateness: String = "1 hour"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark(tsCol, lateness) else events
    wm.groupBy((keys.map(col) :+ session_window(col(tsCol), gap).as("session")): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"))
      .select((keys.map(col) :+ col("session.start").as("window_start") :+
        col("session.end").as("window_end") :+ col("n_events") :+
        col("session_start") :+ col("session_end")): _*)
  }

  /** Streaming look-back REPAIR (§2.9 row 4): when epoch N arrives, the
    * still-open epoch N−1 is re-emitted CLOSED with its corrected end —
    * the reference's `acquisition.py:278-304` semantics (epoch end is only
    * knowable from its successor's start; the reference UPDATEs the prior
    * epoch's row on ingest of the next), not merely a watermark drop.
    *
    * Custom state via `flatMapGroupsWithState` keyed by experiment: the state
    * is the single open epoch start (a few bytes per experiment — bounded
    * regardless of stream length). Each batch merges incoming starts with the
    * open one, emits a closure row per consecutive pair, and keeps the max
    * open. Re-delivered starts dedup inside the batch+state merge
    * (at-least-once safe); an epoch arriving out-of-order BEFORE the open one
    * closes against it (the reference repairs exactly one epoch back, same
    * here — rewriting epochs already closed would need a retracting sink).
    *
    * Batch-equivalence (StreamingSpec): the union of closure rows across any
    * batch split equals `BronzeIngest.epochsWithClosure(...)` restricted to
    * non-null ends. Works in batch mode too (state starts empty, one group
    * pass), so the same code serves the populate engine.
    *
    * Output: (experimentCol, startCol, epoch_end, epoch_duration_s).
    */
  def epochClosures(epochStarts: DataFrame,
                    experimentCol: String = "experiment",
                    startCol: String = "epoch_start"): DataFrame = {
    val spark = epochStarts.sparkSession
    import spark.implicits._
    val pairs = epochStarts
      .select(col(experimentCol).cast("string"),
        unix_micros(col(startCol).cast("timestamp")))
      .as[(String, Long)]
    val closures = pairs.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (exp: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val open = if (state.exists) Seq(state.get) else Seq.empty[Long]
          val all = (open ++ rows.map(_._2)).distinct.sorted
          if (all.isEmpty) Iterator.empty
          else {
            state.update(all.last)
            all.sliding(2).collect { case Seq(a, b) => (exp, a, b) }
          }
      }
    closures.toDF("__exp", "__start_us", "__end_us")
      .select(col("__exp").as(experimentCol),
        timestamp_micros(col("__start_us")).as(startCol),
        timestamp_micros(col("__end_us")).as("epoch_end"),
        ((col("__end_us") - col("__start_us")).cast("double") / 1e6)
          .as("epoch_duration_s"))
  }

  /** Rolling per-key column stats over tumbling windows (streaming form of
    * the per-chunk summary stats, `utils/stats.py:14-23`).
    */
  /** @param valueScale when > 0, values are declared to sit on a
    *   10^-valueScale decimal grid (sensor readings, prices) and the mean
    *   is computed from an EXACT integer-scaled sum: partial aggregates
    *   are int64 — order-free and associative, so the result cannot drift
    *   across partial-aggregation order, task retries, or engines (a plain
    *   double `avg` is accumulation-order-dependent in its last ulp, which
    *   can cross the display-rounding boundary — caught by the sf0.001
    *   q82 run). 0 = general doubles, plain avg.
    */
  def windowedStats(events: DataFrame, tsCol: String, valueCol: String,
                    keys: Seq[String], width: String = "1 hour",
                    lateness: String = "2 hours",
                    valueScale: Int = 0): DataFrame = {
    require(valueScale >= 0 && valueScale <= 4, "valueScale in [0, 4]")
    val wm = if (events.isStreaming) events.withWatermark(tsCol, lateness) else events
    val grouped = wm.groupBy(
      (keys.map(col) :+ window(col(tsCol), width).as("w")): _*)
    val agged =
      if (valueScale > 0) {
        // exact int64 sum on the declared grid; the 4-decimal mean is then
        // rounded IN INTEGER SPACE (half away from zero) and divided once
        // — `round(double, 4)` on an exact .xxxx5 half-point is
        // engine-specific (Spark rounds the shortest decimal repr HALF_UP,
        // DuckDB rounds the scaled binary double), so no double may carry
        // a half-point into a rounding call
        val f = math.pow(10, valueScale) // exact power of ten in double
        val p = math.pow(10, 4 - valueScale).toLong
        grouped.agg(count(col(valueCol)).as("count"),
            min(col(valueCol)).as("min"), max(col(valueCol)).as("max"),
            sum(round(col(valueCol) * lit(f), 0).cast("long")).as("__s"))
          .withColumn("__num", col("__s") * lit(p))
          .withColumn("mean",
            (expr("(abs(__num) * 2 + count) div (2 * count)") *
              when(col("__num") < 0, lit(-1L)).otherwise(lit(1L)))
              .cast("double") / lit(10000.0))
          .drop("__s", "__num")
      } else grouped.agg(count(col(valueCol)).as("count"),
        min(col(valueCol)).as("min"), max(col(valueCol)).as("max"),
        round(avg(col(valueCol)), 4).as("mean"))
    agged.select((keys.map(col) :+ col("w.start").as("window_start") :+
      col("count") :+ col("min") :+ col("max") :+ col("mean")): _*)
  }
}
