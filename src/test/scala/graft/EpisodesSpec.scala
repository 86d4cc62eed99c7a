package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Behavior, Dedup}

/** Episode extraction (backward last-occurrence chains + blocker counts),
  * threshold-crossing bursts, and sorted-neighborhood blocking — hand
  * fixtures pinning the edge semantics the oracles then re-check at scale.
  */
class EpisodesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000L

  private val episodeEvents = Seq(
    // user 1: view → click → error → purchase: episode, 1 blocker
    (1L, ts("2024-01-01 10:00:00"), 10L, "view"),
    (1L, ts("2024-01-01 10:10:00"), 11L, "click"),
    (1L, ts("2024-01-01 10:15:00"), 12L, "error"),
    (1L, ts("2024-01-01 10:20:00"), 13L, "purchase"),
    // user 2: click+purchase but no view: no episode
    (2L, ts("2024-01-01 09:00:00"), 20L, "click"),
    (2L, ts("2024-01-01 09:10:00"), 21L, "purchase"),
    // user 3: one chain, TWO purchases — both emit, same view/click
    (3L, ts("2024-01-01 08:00:00"), 30L, "view"),
    (3L, ts("2024-01-01 08:05:00"), 31L, "click"),
    (3L, ts("2024-01-01 08:10:00"), 32L, "purchase"),
    (3L, ts("2024-01-01 08:20:00"), 33L, "purchase"),
    // user 4: error BEFORE the view and AFTER the purchase: 0 blockers
    (4L, ts("2024-01-01 07:00:00"), 40L, "error"),
    (4L, ts("2024-01-01 07:05:00"), 41L, "view"),
    (4L, ts("2024-01-01 07:10:00"), 42L, "click"),
    (4L, ts("2024-01-01 07:15:00"), 43L, "purchase"),
    (4L, ts("2024-01-01 07:20:00"), 44L, "error"),
    // user 5: purchase exactly AT the window boundary (inclusive)
    (5L, ts("2024-01-01 00:00:00"), 50L, "view"),
    (5L, ts("2024-01-01 00:30:00"), 51L, "click"),
    (5L, ts("2024-01-01 01:00:00"), 52L, "purchase"),
    // user 6: purchase one µs PAST the boundary: dropped
    (6L, ts("2024-01-01 00:00:00"), 60L, "view"),
    (6L, ts("2024-01-01 00:30:00"), 61L, "click"),
    (6L, ts("2024-01-01 01:00:00.000001"), 62L, "purchase"),
    // user 7: a LATER view+click replaces the earlier pair (most recent
    // occurrence walk), and the error between the OLD view and the new
    // one must not count against the new chain
    (7L, ts("2024-01-01 06:00:00"), 70L, "view"),
    (7L, ts("2024-01-01 06:01:00"), 71L, "error"),
    (7L, ts("2024-01-01 06:02:00"), 72L, "view"),
    (7L, ts("2024-01-01 06:03:00"), 73L, "click"),
    (7L, ts("2024-01-01 06:04:00"), 74L, "purchase"))
    .toDF("user_id", "t", "event_id", "event_type")

  private def episodes(windowSec: Long = 3600L) =
    Behavior.matchEpisodes(episodeEvents, "user_id", "t", "event_id",
        "event_type", Seq("view", "click", "purchase"), blocker = "error",
        windowSec = windowSec, carryCols = Seq("event_id"))
      .orderBy("user_id", "purchase_us")

  test("matchEpisodes emits completed chains with blocker counts") {
    val rows = episodes().collect()
    val byUser = rows.groupBy(_.getLong(0))
    assert(!byUser.contains(2L), "no view → no episode")
    assert(!byUser.contains(6L), "past-boundary purchase dropped")
    val u1 = byUser(1L).head
    assert(u1.getAs[Long]("view_us") === us("2024-01-01 10:00:00"))
    assert(u1.getAs[Long]("click_us") === us("2024-01-01 10:10:00"))
    assert(u1.getAs[Long]("n_blockers") === 1L)
    assert(byUser(3L).length === 2, "both purchases emit")
    assert(byUser(3L).forall(_.getAs[Long]("click_us") === us("2024-01-01 08:05:00")))
    assert(byUser(4L).head.getAs[Long]("n_blockers") === 0L,
      "errors outside [view, purchase] don't count")
    assert(byUser(5L).nonEmpty, "boundary is inclusive")
    val u7 = byUser(7L).head
    assert(u7.getAs[Long]("view_us") === us("2024-01-01 06:02:00"),
      "most recent view wins")
    assert(u7.getAs[Long]("n_blockers") === 0L,
      "blockers before the matched view don't count")
  }

  test("matchEpisodes carries the final row's passthrough columns") {
    val rows = episodes().collect()
    val u3 = rows.filter(_.getLong(0) == 3L).map(_.getAs[Long]("event_id"))
    assert(u3.toSet === Set(32L, 33L))
  }

  test("matchEpisodes four-stage chain walks recursively") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "x"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "c"),
      (1L, ts("2024-01-01 10:04:00"), 5L, "d"),
      // user 2: b → c → d with NO 'a' anywhere — chain incomplete
      (2L, ts("2024-01-01 11:00:00"), 6L, "b"),
      (2L, ts("2024-01-01 11:01:00"), 7L, "c"),
      (2L, ts("2024-01-01 11:02:00"), 8L, "d"))
      .toDF("user_id", "t", "event_id", "event_type")
    val out = Behavior.matchEpisodes(ev, "user_id", "t", "event_id",
        "event_type", Seq("a", "b", "c", "d"), blocker = "x",
        windowSec = 3600L)
      .orderBy("user_id").collect()
    assert(out.length === 1, "user 2 has no 'a' — chain incomplete")
    val r = out.head
    assert(r.getAs[Long]("a_us") === us("2024-01-01 10:00:00"))
    assert(r.getAs[Long]("b_us") === us("2024-01-01 10:01:00"))
    assert(r.getAs[Long]("c_us") === us("2024-01-01 10:03:00"))
    assert(r.getAs[Long]("n_blockers") === 1L)
  }

  test("thresholdBursts detects crossings and groups them by gap") {
    val sig = Seq(
      // user 1: two crossings 1h apart (one burst), then one 7h later
      // (new burst); a first-row high value is NOT a crossing
      (1L, ts("2024-01-01 00:00:00"), 1L, 20.0), // first row: no crossing
      (1L, ts("2024-01-01 00:10:00"), 2L, 5.0),
      (1L, ts("2024-01-01 01:00:00"), 3L, 18.0), // crossing 1
      (1L, ts("2024-01-01 01:30:00"), 4L, 3.0),
      (1L, ts("2024-01-01 02:00:00"), 5L, 25.0), // crossing 2 (same burst)
      (1L, ts("2024-01-01 05:00:00"), 6L, 2.0),
      (1L, ts("2024-01-01 09:00:00"), 7L, 16.0), // crossing 3 (new burst)
      // user 2: stays above threshold after one crossing — only ONE
      // crossing (no re-cross without dipping below)
      (2L, ts("2024-01-01 00:00:00"), 8L, 1.0),
      (2L, ts("2024-01-01 00:10:00"), 9L, 30.0), // crossing
      (2L, ts("2024-01-01 00:20:00"), 10L, 40.0), // still high: no crossing
      // user 3: never crosses
      (3L, ts("2024-01-01 00:00:00"), 11L, 9.0))
      .toDF("user_id", "t", "event_id", "value")
    val out = Behavior.thresholdBursts(sig, "user_id", "t", "event_id",
        "value", threshold = 15.0, gapSeconds = 6L * 3600L)
      .orderBy("user_id", "burst_id").collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("burst_id"),
      r.getAs[Long]("n_crossings"))).toSeq ===
      Seq((1L, 0L, 2L), (1L, 1L, 1L), (2L, 0L, 1L)))
    val b0 = out.head
    assert(b0.getAs[Timestamp]("burst_start") === ts("2024-01-01 01:00:00"))
    assert(b0.getAs[Timestamp]("burst_end") === ts("2024-01-01 02:00:00"))
    assert(b0.getAs[Double]("peak_value") === 25.0)
  }

  test("sortedNeighborhood finds prefix-adjacent near-dups, window-bounded") {
    val body = (1 to 40).map(i => s"token$i").mkString(" ")
    val docs = Seq(
      // three shared-prefix near-dups: pairwise pos_dist 1, 1, 2
      (1L, s"alpha common prefix $body end one"),
      (2L, s"alpha common prefix $body end two"),
      (3L, s"alpha common prefix $body end three tail"),
      // unrelated docs that sort far away, with disjoint bodies
      (10L, "zebra unrelated text " +
        (1 to 40).map(i => s"zeb$i").mkString(" ")),
      (11L, "middle other content entirely different words here " +
        (1 to 40).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.sortedNeighborhood(docs, "doc_id", "text",
        window = 10, minJaccard = 0.5, numRanges = 4)
      .orderBy("id_a", "id_b").collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"got $pairs")
    assert(out.forall(_.getAs[Double]("jaccard") >= 0.5))
    // the same docs pushed outside the window by a tiny window find nothing
    // beyond adjacent positions
    val tight = Dedup.sortedNeighborhood(docs, "doc_id", "text",
        window = 1, minJaccard = 0.5, numRanges = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight === Set((1L, 2L), (2L, 3L)),
      "window=1 keeps only adjacent pairs")
  }

  test("sortedNeighborhood pairs each candidate exactly once across blocks") {
    // 30 docs all sharing a prefix AND a heading (so every pair's jaccard
    // is positive) → every within-10 pair is a candidate; the block
    // decomposition must yield each (a,b) exactly once
    val docs = (1 to 30).map(i =>
        (i.toLong, "shared heading words one two three four five " +
          (1 to 30).map(j => s"u${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val cand = Dedup.sortedNeighborhood(docs, "doc_id", "text",
        window = 10, minJaccard = 1e-9, numRanges = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.length === cand.distinct.length, "no duplicate pairs")
    assert(cand.length === (0 until 30).map(i => math.min(10, 29 - i)).sum,
      "every within-window pair present exactly once")
  }
}
