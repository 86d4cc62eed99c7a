package graft

import java.sql.Timestamp

import graft.operators.Behavior

/** Funnel matching vs a brute exists-any-ordered-chain reference (the
  * first-next walk must be equivalent), window boundaries inclusive, and
  * cohort retention on a hand grid.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: view→click→purchase inside 1h: completes
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:10:00"), "click"),
    (1L, ts("2024-01-01 10:20:00"), "purchase"),
    // user 1 second view: click after, purchase after click but outside 1h
    (1L, ts("2024-01-02 10:00:00"), "view"),
    (1L, ts("2024-01-02 10:30:00"), "click"),
    (1L, ts("2024-01-02 11:30:00"), "purchase"),
    // user 2: purchase BEFORE click — order violated, no funnel
    (2L, ts("2024-01-01 09:00:00"), "view"),
    (2L, ts("2024-01-01 09:10:00"), "purchase"),
    (2L, ts("2024-01-01 09:20:00"), "click"),
    // user 3: first click's purchase is late, but an EARLY purchase sits
    // between click1 and click2 — chain view→click1→that purchase works
    (3L, ts("2024-01-01 08:00:00"), "view"),
    (3L, ts("2024-01-01 08:05:00"), "click"),
    (3L, ts("2024-01-01 08:10:00"), "purchase"),
    (3L, ts("2024-01-01 08:15:00"), "click"),
    // user 4: completes EXACTLY at the window boundary (inclusive)
    (4L, ts("2024-01-01 00:00:00"), "view"),
    (4L, ts("2024-01-01 00:30:00"), "click"),
    (4L, ts("2024-01-01 01:00:00"), "purchase"),
    // user 5: view only
    (5L, ts("2024-01-01 12:00:00"), "view"))
    .toDF("user_id", "ts", "event_type")

  private def bruteFunnel(windowSec: Long): Map[Long, (Long, Long)] = {
    val evs = events.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000L,
        r.getString(2)))
    evs.filter(_._3 == "view").groupBy(_._1).map { case (u, views) =>
      val uev = evs.filter(_._1 == u)
      val done = views.count { case (_, vt, _) =>
        uev.exists { case (_, ct, cty) => cty == "click" && ct > vt &&
          uev.exists { case (_, pt, pty) => pty == "purchase" && pt > ct &&
            pt - vt <= windowSec * 1000000L } }
      }
      u -> (views.length.toLong, done.toLong)
    }
  }

  test("funnel equals the exists-any ordered-chain reference") {
    for (win <- Seq(3600L, 3599L, 7200L, 100000L)) {
      val got = Behavior.funnel(events, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), windowSec = win)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == bruteFunnel(win), s"window $win")
    }
  }

  test("boundary, order violation, and chain-recovery cases") {
    val got = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSec = 3600L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((2L, 1L, 50L)))  // 1 of 2 views converts
    assert(got(2L) == ((1L, 0L, 0L)))   // order violated
    assert(got(3L) == ((1L, 1L, 100L))) // early purchase after click1
    assert(got(4L) == ((1L, 1L, 100L))) // exactly at boundary: inclusive
    assert(got(5L) == ((1L, 0L, 0L)))
  }

  test("transitionMatrix: counts, row normalization, and tie ordering") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 10:01:00"), "b"),
      (1L, ts("2024-01-01 10:02:00"), "a"),
      (1L, ts("2024-01-01 10:03:00"), "b"),
      (2L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-01 10:01:00"), "c"),
      // user 3: two events at the SAME timestamp — type order breaks the
      // tie deterministically (a before b)
      (3L, ts("2024-01-01 10:00:00"), "b"),
      (3L, ts("2024-01-01 10:00:00"), "a"))
      .toDF("user_id", "ts", "event_type")
    val got = Behavior.transitionMatrix(ev, "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // from 'a': a→b x3 (users 1 twice, 3 once), a→c x1 → 750000 / 250000
    assert(got(("a", "b")) == ((3L, 750000L)))
    assert(got(("a", "c")) == ((1L, 250000L)))
    assert(got(("b", "a")) == ((1L, 1000000L)))
    assert(got.size == 3)
  }

  test("cohortRetention: offsets, sizes, and day-0 identity") {
    val ev2 = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-02 23:00:00")), (2L, ts("2024-01-01 01:00:00")),
      (3L, ts("2024-01-02 05:00:00")), (3L, ts("2024-01-04 05:00:00")))
      .toDF("user_id", "ts").withColumn("event_type", org.apache.spark.sql.functions.lit("e"))
    val got = Behavior.cohortRetention(ev2, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L, 2L),  // users 1,2 on their day 0
      ("2024-01-01", 1L, 1L, 2L),  // user 1 returns next day
      ("2024-01-02", 0L, 1L, 1L),  // user 3's cohort
      ("2024-01-02", 2L, 1L, 1L))) // user 3 returns at offset 2
  }
}
