package graft

import org.apache.spark.sql.functions._

import graft.operators.{Behavior, Intervals}

/** Interval-set algebra (union-coalesce, sweep intersection) and the CUSUM
  * closed form — hand fixtures for the half-open edge semantics plus
  * randomized parity against literal sequential references.
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def mergedTriples(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k", "interval_id")
      .select("k", "start_us", "end_us")
      .as[(String, Long, Long)].collect().toSeq

  test("merge coalesces overlapping and touching intervals, half-open") {
    val iv = Seq(
      ("a", 0L, 10L), ("a", 5L, 20L),   // overlap -> one
      ("a", 20L, 30L),                  // touching [20,30) merges at gap 0
      ("a", 40L, 50L),                  // gap of 10 -> separate
      ("b", 0L, 100L), ("b", 10L, 20L), // containment collapses
      ("b", 200L, 210L)
    ).toDF("k", "s", "e")
    val got = Intervals.merge(iv, Seq("k"), "s", "e")
    assert(mergedTriples(got) === Seq(
      ("a", 0L, 30L), ("a", 40L, 50L), ("b", 0L, 100L), ("b", 200L, 210L)))
    assert(got.filter(col("k") === "a" && col("interval_id") === 0)
      .select("n_merged").as[Long].head() === 3L)
  }

  test("merge gapMicros bridges near-adjacent intervals") {
    val iv = Seq(("a", 0L, 10L), ("a", 15L, 20L), ("a", 40L, 45L))
      .toDF("k", "s", "e")
    assert(mergedTriples(Intervals.merge(iv, Seq("k"), "s", "e", 5L)) ===
      Seq(("a", 0L, 20L), ("a", 40L, 45L)))
    assert(mergedTriples(Intervals.merge(iv, Seq("k"), "s", "e", 4L)) ===
      Seq(("a", 0L, 10L), ("a", 15L, 20L), ("a", 40L, 45L)))
  }

  test("merge rejects degenerate intervals loudly") {
    val iv = Seq(("a", 10L, 10L)).toDF("k", "s", "e")
    val e = intercept[Exception] {
      Intervals.merge(iv, Seq("k"), "s", "e").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("degenerate interval")))
  }

  test("intersect emits maximal spans where both sides are active") {
    val a = Seq(("u", 0L, 100L), ("u", 150L, 200L)).toDF("k", "s", "e")
    val b = Seq(("u", 50L, 160L), ("u", 170L, 180L), ("v", 0L, 10L))
      .toDF("k", "s", "e")
    // [50,100) from the first pair, [150,160) and [170,180) inside the
    // second a-span; v has no a-side at all
    assert(mergedTriples(Intervals.intersect(a, b, Seq("k"), "s", "e")) ===
      Seq(("u", 50L, 100L), ("u", 150L, 160L), ("u", 170L, 180L)))
  }

  test("intersect half-open: end-meets-start is empty, shared interiors merge") {
    val a = Seq(("u", 0L, 10L)).toDF("k", "s", "e")
    val b = Seq(("u", 10L, 20L)).toDF("k", "s", "e")
    assert(Intervals.intersect(a, b, Seq("k"), "s", "e").count() === 0L)
    // two abutting b-intervals inside one a-interval come back as ONE span
    val b2 = Seq(("u", 2L, 5L), ("u", 5L, 8L)).toDF("k", "s", "e")
    assert(mergedTriples(Intervals.intersect(a, b2, Seq("k"), "s", "e")) ===
      Seq(("u", 2L, 8L)))
  }

  test("intersect matches a brute-force point-sampling reference on random sets") {
    val rnd = new scala.util.Random(7)
    def gen(n: Int) = Seq.fill(n) {
      val k = s"k${rnd.nextInt(3)}"
      val s = rnd.nextInt(200).toLong
      (k, s, s + 1L + rnd.nextInt(40))
    }
    val a = gen(40); val b = gen(40)
    val got = Intervals.intersect(a.toDF("k", "s", "e"), b.toDF("k", "s", "e"),
        Seq("k"), "s", "e")
      .select("k", "start_us", "end_us")
      .as[(String, Long, Long)].collect()
    // reference: a µs-resolution membership bitmap per key
    def live(iv: Seq[(String, Long, Long)], k: String, t: Long) =
      iv.exists { case (kk, s, e) => kk == k && s <= t && t < e }
    for (k <- Seq("k0", "k1", "k2"); t <- 0L until 260L) {
      val want = live(a, k, t) && live(b, k, t)
      val have = got.exists { case (kk, s, e) => kk == k && s <= t && t < e }
      assert(have === want, s"key $k instant $t")
    }
    // spans are maximal: no two adjacent/overlapping output spans per key
    got.groupBy(_._1).foreach { case (_, spans) =>
      val sorted = spans.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(e1 < s2)
        case _ => ()
      }
    }
  }

  test("coverageByBucket splits spans on the grid, boundary-end exclusive") {
    val day = 86400L * 1000000L
    val iv = Seq(
      ("a", 0L, day),            // exactly one bucket, ends ON the boundary
      ("a", day + 100L, day + 300L), // 200 µs inside bucket 1
      ("b", day / 2, 2L * day + day / 4) // spans three buckets
    ).toDF("k", "s", "e")
    val got = graft.operators.Intervals
      .coverageByBucket(iv, Seq("k"), "s", "e", day)
      .orderBy("k", "bucket_start_us")
      .select("k", "bucket_start_us", "covered_us")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 0L, day), ("a", day, 200L),
      ("b", 0L, day / 2), ("b", day, day), ("b", 2L * day, day / 4)))
  }

  test("cusum closed form equals the literal sequential recursion") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      (s"k${i % 3}", new java.sql.Timestamp(1700000000000L + i * 1000L),
        i.toLong, (rnd.nextInt(2000) - 900).toLong)
    }
    val df = rows.toDF("k", "ts", "tie", "vm")
    val got = Behavior.cusum(df, "k", "ts", "tie", "vm",
        driftMicro = 50L, thresholdMicro = 1000L)
      .select("k", "tie", "s_micro", "alarm")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    for (key <- Seq("k0", "k1", "k2")) {
      var s = 0L
      rows.filter(_._1 == key).sortBy(_._3).foreach { case (_, _, tie, vm) =>
        s = math.max(0L, s + vm - 50L)
        assert(got((key, tie)) === ((s, s >= 1000L)), s"$key tie $tie")
      }
    }
  }
}
