package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Resample
import graft.streaming.StreamingResample

/** Streaming grid resampling: chronological waves drain against the
  * persisted per-key last-sample state; the final drained grid equals the
  * one-shot operator row-for-row, a re-drain (or a drain after checkpoint
  * loss) is a no-op, and late rows drop under the watermark rule with the
  * grid equal to the one-shot over the kept rows.
  */
class StreamingResampleSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("key", StringType), StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  private val Step = 60L * 1000000L // 1-minute grid

  private def ts(sec: Long): Timestamp =
    new Timestamp(1704067200000L + sec * 1000L) // 2024-01-01 00:00:00 UTC

  private def gridSet(dir: String): Set[(String, Long, Long)] =
    spark.read.parquet(dir)
      .select(col("key"), unix_micros(col("grid_ts")), col("value_micro"))
      .as[(String, Long, Long)].collect().toSet

  private def oneShotSet(df: DataFrame): Set[(String, Long, Long)] =
    Resample.linearGrid(df, "key", "ts", "value", Step)
      .select(col("key"), unix_micros(col("grid_ts")), col("value_micro"))
      .as[(String, Long, Long)].collect().toSet

  test("chronological waves: final drained grid equals one-shot; re-drain no-op") {
    val root = Files.createTempDirectory("stream_resample")
    val (src, grid, state, ckpt) = (root.resolve("src").toString,
      root.resolve("grid").toString, root.resolve("state").toString,
      root.resolve("ckpt").toString)

    // irregular series, two keys, duplicate timestamps within a wave,
    // wave boundary NOT grid-aligned; wave 2 strictly later per key
    val wave1 = Seq(
      ("a", ts(10), 1.0), ("a", ts(10), 3.0), // duplicate collapses to mean
      ("a", ts(70), 2.0), ("a", ts(130), 10.0),
      ("b", ts(35), 5.5), ("b", ts(95), -4.25))
    val wave2 = Seq(
      ("a", ts(145), 4.0), ("a", ts(250), 7.0),
      ("b", ts(260), 0.75),
      ("c", ts(30), 1.5), ("c", ts(180), 9.0)) // new key appears late
    val all = (wave1 ++ wave2).toDF("key", "ts", "value")

    wave1.toDF("key", "ts", "value").write.mode("append").parquet(src)
    StreamingResample.drain(spark, src, grid, state, ckpt,
      "key", "ts", "value", schema, Step)
    // wave-1 grid: exactly the one-shot over wave 1 (nothing forward yet)
    assert(gridSet(grid) == oneShotSet(wave1.toDF("key", "ts", "value")))

    wave2.toDF("key", "ts", "value").write.mode("append").parquet(src)
    StreamingResample.drain(spark, src, grid, state, ckpt,
      "key", "ts", "value", schema, Step)
    val drained = gridSet(grid)
    assert(drained == oneShotSet(all),
      s"drained ≠ one-shot:\n  drained=$drained\n  oneShot=${oneShotSet(all)}")
    // the cross-wave bracket really interpolated: grid point a@180 s sits
    // between a@145 (wave 2) — state was a@130 (wave 1) — check a@120
    // bracketed (70, 130) and a@240 bracketed (145, 250)
    assert(drained.contains(("a", ts(240).getTime * 1000L,
      (4000000L * (250 - 240) + 7000000L * (240 - 145)) / (250 - 145))))

    // re-drain with nothing new: no growth in grid or state
    val (g0, s0) = (spark.read.parquet(grid).count(),
      spark.read.parquet(state).count())
    StreamingResample.drain(spark, src, grid, state, ckpt,
      "key", "ts", "value", schema, Step)
    assert(spark.read.parquet(grid).count() == g0)
    assert(spark.read.parquet(state).count() == s0)
  }

  test("checkpoint loss: full replay is a harmless no-op") {
    val root = Files.createTempDirectory("stream_resample_ckpt")
    val (src, grid, state, ckpt) = (root.resolve("src").toString,
      root.resolve("grid").toString, root.resolve("state").toString,
      root.resolve("ckpt").toString)
    val rows = Seq(("a", ts(5), 1.0), ("a", ts(65), 3.0), ("a", ts(125), 5.0))
    rows.toDF("key", "ts", "value").write.mode("append").parquet(src)
    StreamingResample.drain(spark, src, grid, state, ckpt,
      "key", "ts", "value", schema, Step)
    val before = gridSet(grid)
    assert(before == oneShotSet(rows.toDF("key", "ts", "value")))
    // lose the checkpoint: the whole backlog replays; the late rule (all
    // rows ≤ state.t) plus keyed appends make it a no-op
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    StreamingResample.drain(spark, src, grid, state,
      root.resolve("ckpt2").toString, "key", "ts", "value", schema, Step)
    assert(gridSet(grid) == before)
    assert(spark.read.parquet(state).count() ==
      spark.read.parquet(state).dropDuplicates("key", "t").count())
  }

  test("state compaction between waves changes nothing downstream") {
    val root = Files.createTempDirectory("stream_resample_compact")
    val (src, grid, state, ckpt) = (root.resolve("src").toString,
      root.resolve("grid").toString, root.resolve("state").toString,
      root.resolve("ckpt").toString)
    val waves = Seq(
      Seq(("a", ts(10), 1.0), ("b", ts(20), 2.0)),
      Seq(("a", ts(100), 3.0), ("b", ts(130), 4.0)),
      Seq(("a", ts(200), 5.0), ("b", ts(250), 6.0)))
    // drain wave 1 and 2, compact, drain wave 3
    waves(0).toDF("key", "ts", "value").write.mode("append").parquet(src)
    StreamingResample.drain(spark, src, grid, state, ckpt,
      "key", "ts", "value", schema, Step)
    waves(1).toDF("key", "ts", "value").write.mode("append").parquet(src)
    StreamingResample.drain(spark, src, grid, state, ckpt,
      "key", "ts", "value", schema, Step)
    assert(spark.read.parquet(state).count() == 4) // 2 keys × 2 waves
    val removed = graft.operators.Populate.compactLatest(spark, state,
      Seq("key"), "t")
    assert(removed == 2 && spark.read.parquet(state).count() == 2)
    // compaction is idempotent
    assert(graft.operators.Populate.compactLatest(spark, state,
      Seq("key"), "t") == 0L)
    waves(2).toDF("key", "ts", "value").write.mode("append").parquet(src)
    StreamingResample.drain(spark, src, grid, state, ckpt,
      "key", "ts", "value", schema, Step)
    val all = waves.flatten.toDF("key", "ts", "value")
    assert(gridSet(grid) == oneShotSet(all),
      "compacted state must bracket wave 3 exactly like the full table")
  }

  test("late rows drop; grid equals one-shot over the kept rows") {
    val root = Files.createTempDirectory("stream_resample_late")
    val (src, grid, state, ckpt) = (root.resolve("src").toString,
      root.resolve("grid").toString, root.resolve("state").toString,
      root.resolve("ckpt").toString)
    val wave1 = Seq(("a", ts(10), 1.0), ("a", ts(70), 2.0))
    wave1.toDF("key", "ts", "value").write.mode("append").parquet(src)
    StreamingResample.drain(spark, src, grid, state, ckpt,
      "key", "ts", "value", schema, Step)
    // wave 2 carries one late row (t=40 < state.t=70) and one fresh row
    Seq(("a", ts(40), 100.0), ("a", ts(190), 4.0))
      .toDF("key", "ts", "value").write.mode("append").parquet(src)
    StreamingResample.drain(spark, src, grid, state, ckpt,
      "key", "ts", "value", schema, Step)
    val kept = wave1 ++ Seq(("a", ts(190), 4.0))
    assert(gridSet(grid) == oneShotSet(kept.toDF("key", "ts", "value")),
      "late row must not perturb the drained grid")
  }
}
