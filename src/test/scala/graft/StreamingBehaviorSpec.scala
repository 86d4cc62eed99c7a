package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Behavior
import graft.streaming.StreamingBehavior

/** Streaming funnel ≡ batch funnel across arbitrary wave splits (the
  * latest Update-mode row per user equals the batch counts), bounded
  * state semantics (expiry), and the strictly-later tie rule.
  */
class StreamingBehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // covers: completion, window expiry, order violation, chain recovery,
  // boundary-inclusive completion, tie (equal-ts view+click must NOT
  // advance), multi-anchor users
  private val events: Seq[(Long, Timestamp, String)] = Seq(
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:10:00"), "click"),
    (1L, ts("2024-01-01 10:20:00"), "purchase"),
    (1L, ts("2024-01-02 10:00:00"), "view"),
    (1L, ts("2024-01-02 10:30:00"), "click"),
    (1L, ts("2024-01-02 11:30:00"), "purchase"),
    (2L, ts("2024-01-01 09:00:00"), "view"),
    (2L, ts("2024-01-01 09:10:00"), "purchase"),
    (2L, ts("2024-01-01 09:20:00"), "click"),
    (3L, ts("2024-01-01 08:00:00"), "view"),
    (3L, ts("2024-01-01 08:05:00"), "click"),
    (3L, ts("2024-01-01 08:10:00"), "purchase"),
    (4L, ts("2024-01-01 00:00:00"), "view"),
    (4L, ts("2024-01-01 00:30:00"), "click"),
    (4L, ts("2024-01-01 01:00:00"), "purchase"),
    // user 6: click at the SAME timestamp as the view — must not advance
    (6L, ts("2024-01-01 07:00:00"), "view"),
    (6L, ts("2024-01-01 07:00:00"), "click"),
    (6L, ts("2024-01-01 07:30:00"), "purchase"),
    (6L, ts("2024-01-01 07:10:00"), "click"))

  private def batchCounts(windowSec: Long): Map[Long, (Long, Long)] =
    Behavior.funnel(events.toDF("user_id", "ts", "event_type"), "user_id",
        "ts", "event_type", Seq("view", "click", "purchase"), windowSec)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  private def streamCounts(windowSec: Long,
                           splits: Seq[Int]): Map[Long, (Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val name = s"funnel_test_${windowSec}_${splits.mkString("_")}"
    val q = StreamingBehavior.funnelCounts(
        mem.toDF().toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
        windowSec)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      // waves split at the given indexes of the TIME-SORTED event list —
      // in-order arrival across batches, arbitrary arrival within one
      val sorted = events.sortBy(e => (e._2.getTime, e._3))
      val cuts = (0 +: splits :+ sorted.size).distinct.sorted
      cuts.sliding(2).foreach { case Seq(a, b) =>
        if (b > a) { mem.addData(sorted.slice(a, b): _*); q.processAllAvailable() }
      }
      spark.table(name)
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("n_anchors").as("a"),
          org.apache.spark.sql.functions.max("n_completed").as("c"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    } finally q.stop()
  }

  test("streamed funnel counts equal batch across arbitrary wave splits") {
    for (win <- Seq(3600L, 1000L); splits <- Seq(Seq(5), Seq(3, 9, 14),
        Seq(1, 2, 3, 4, 5, 6, 7))) {
      assert(streamCounts(win, splits) == batchCounts(win),
        s"window $win splits $splits")
    }
  }

  test("string user ids keep distinct states (no long-cast collapse)") {
    // two non-integral ids with identical event shapes: a long-cast key
    // would null both into ONE shared state and double-count
    val evs = Seq(
      ("u-a", ts("2024-01-01 10:00:00"), "view"),
      ("u-a", ts("2024-01-01 10:10:00"), "click"),
      ("u-a", ts("2024-01-01 10:20:00"), "purchase"),
      ("u-b", ts("2024-01-01 10:00:00"), "view"))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    val q = StreamingBehavior.funnelCounts(
        mem.toDF().toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
        3600L)
      .writeStream.format("memory").queryName("funnel_test_string_ids")
      .outputMode("update").start()
    try {
      mem.addData(evs: _*); q.processAllAvailable()
      val got = spark.table("funnel_test_string_ids")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got == Map("u-a" -> ((1L, 1L)), "u-b" -> ((1L, 0L))), got)
      // output schema preserves the input key type
      assert(spark.table("funnel_test_string_ids").schema("user_id")
        .dataType.typeName == "string")
    } finally q.stop()
  }

  test("equal-timestamp click does not advance the chain (tie rule)") {
    val batch = batchCounts(3600L)
    // user 6: the same-ts click is ignored; the 07:10 click + 07:30
    // purchase complete the chain
    assert(batch(6L) == ((1L, 1L)))
    assert(streamCounts(3600L, Seq(4)) == batch)
  }
}
