package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("chunkCounts over a MemoryStream groups into 1-hour chunks") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "k", "v")
    val q = StreamOps.chunkCounts(df, "ts", Seq("k"))
      .writeStream.format("memory").queryName("chunks_test")
      .outputMode("complete").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:05:00"), "a", 1.0),
        (ts("2024-01-01 10:55:00"), "a", 2.0),
        (ts("2024-01-01 11:05:00"), "a", 3.0),
        (ts("2024-01-01 10:30:00"), "b", 4.0))
      q.processAllAvailable()
      val out = spark.table("chunks_test")
        .select("k", "chunk_start", "sample_count").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(out == Set(
        ("a", ts("2024-01-01 10:00:00"), 2L),
        ("a", ts("2024-01-01 11:00:00"), 1L),
        ("b", ts("2024-01-01 10:00:00"), 1L)))
    } finally q.stop()
  }

  test("chunkCounts watermark drops data later than the lateness bound (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "k", "v")
    val q = StreamOps.chunkCounts(df, "ts", Seq("k"), lateness = "2 hours")
      .writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      // Batch 1 advances event time to 18:00 → watermark becomes 16:00.
      mem.addData(
        (ts("2024-01-01 10:30:00"), "a", 1.0),
        (ts("2024-01-01 18:00:00"), "a", 2.0))
      q.processAllAvailable()
      // Batch 2: one on-time row and one 6h-late row (behind the watermark).
      mem.addData(
        (ts("2024-01-01 18:10:00"), "a", 3.0),
        (ts("2024-01-01 10:45:00"), "a", 99.0)) // LATE → must be dropped
      q.processAllAvailable()
      // Close remaining windows so append emits them.
      mem.addData((ts("2024-01-02 12:00:00"), "a", 4.0))
      q.processAllAvailable()

      val counts = spark.table("wm_test")
        .select("chunk_start", "sample_count").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      // the 10:00 chunk closed with ONE row — the late 10:45 row never counted
      assert(counts(ts("2024-01-01 10:00:00")) == 1L)
      assert(counts(ts("2024-01-01 18:00:00")) == 2L)
    } finally q.stop()
  }

  test("sessionAgg batch-mode matches gap semantics") {
    val df = Seq(
      (ts("2024-01-01 10:00:00"), "u"),
      (ts("2024-01-01 10:10:00"), "u"),
      (ts("2024-01-01 11:30:00"), "u")).toDF("ts", "k")
    val out = StreamOps.sessionAgg(df, "ts", Seq("k"), gap = "30 minutes")
      .select("k", "n_events").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("u", 2L), ("u", 1L)))
  }

  test("windowedStats batch-mode computes per-window stats") {
    val df = Seq(
      (ts("2024-01-01 10:05:00"), "a", 1.0),
      (ts("2024-01-01 10:35:00"), "a", 3.0),
      (ts("2024-01-01 11:05:00"), "a", 5.0)).toDF("ts", "k", "v")
    val out = StreamOps.windowedStats(df, "ts", "v", Seq("k"))
      .orderBy("window_start")
      .select("count", "min", "max", "mean").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 2 && out(0).getDouble(3) == 2.0)
    assert(out(1).getLong(0) == 1 && out(1).getDouble(3) == 5.0)
  }
}
