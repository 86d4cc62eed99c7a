package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CameraQC derivation — the reference's video-stream quality control
  * (`aeon/dj_pipeline/qc.py:70-116`; SURVEY.md §7.3 "minimum end-to-end
  * slice"). Input: per-frame video metadata `(time, hw_counter, hw_timestamp,
  * frame)` per device; output: frame-level deltas/offsets and a per-group
  * summary with drop counts.
  *
  * All lag/cumsum work happens in one window pass per key (single shuffle on
  * the device/chunk key); the summary is a partial-aggregable groupBy. At
  * 100 TB each (device, chunk) partition is ~180k rows (50 Hz × 1 h) — well
  * within a task.
  */
object CameraQC {

  /** Frame-level QC columns (reference `qc.py:92-99`):
    *  - `*_delta`: frame-to-frame diffs of time (s), hw_counter,
    *    hw_timestamp (ns → s), frame index;
    *  - `drops`: dropped frames before this one (`hw_counter_delta - 1`);
    *  - `frame_offset`: cumulative dropped frames (`drops.cumsum`).
    */
  def frameDeltas(meta: DataFrame, keys: Seq[String]): DataFrame = {
    // QC is inherently per-stream (per camera/chunk); an empty key set
    // would drag every frame row through one partition's global window.
    require(keys.nonEmpty,
      "CameraQC.frameDeltas needs partitioning keys (per camera/chunk); " +
        "an unkeyed pass runs in ONE partition")
    val part = Window.partitionBy(keys.map(col): _*)
    val w = part.orderBy(col("time"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    meta
      .withColumn("time_delta",
        (unix_micros(col("time")) - unix_micros(lag(col("time"), 1).over(w)))
          .cast("double") / 1e6)
      .withColumn("hw_counter_delta", col("hw_counter") - lag(col("hw_counter"), 1).over(w))
      .withColumn("hw_timestamp_delta",
        (col("hw_timestamp") - lag(col("hw_timestamp"), 1).over(w)).cast("double") / 1e9)
      .withColumn("frame_delta", col("frame") - lag(col("frame"), 1).over(w))
      .withColumn("drops",
        when(col("hw_counter_delta").isNotNull,
          greatest(col("hw_counter_delta") - 1, lit(0L))).otherwise(lit(0L)))
      .withColumn("frame_offset", sum(col("drops")).over(wRun))
  }

  /** Per-group QC summary (reference `qc.py:100-116` stored row):
    * sample count, max deltas, total dropped frames, and the observed
    * frame rate vs a nominal fps.
    */
  def summary(deltas: DataFrame, keys: Seq[String], nominalFps: Double = 50.0): DataFrame =
    deltas.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("sample_count"),
        min(col("time")).as("first_time"),
        max(col("time")).as("last_time"),
        max(col("time_delta")).as("max_harp_delta"),
        max(col("hw_timestamp_delta")).as("max_camera_delta"),
        sum(col("drops")).as("drop_count"),
        round(count(lit(1)) /
          ((unix_micros(max(col("time"))) - unix_micros(min(col("time"))))
            .cast("double") / 1e6), 4).as("observed_fps"))
      .withColumn("nominal_fps", lit(nominalFps))
      .withColumn("frame_rate_ok",
        abs(col("observed_fps") - col("nominal_fps")) / col("nominal_fps") < 0.05)
}
