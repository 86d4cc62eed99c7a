package graft

import org.apache.spark.sql.functions._

import graft.operators.EventMatch

/** Event-train agreement matching (`operators/EventMatch.scala`) — the
  * reference's cross-block unit matching: bucketed-coincidence matrix
  * against a brute-force replay, burst non-inflation, mutual-best
  * assignment determinism, and seed-first global-id propagation.
  */
class EventMatchSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Long)]) = rows.toDF("unit", "us")

  test("agreementMatrix equals the brute-force |dt|<=delta replay on random trains") {
    val rnd = new scala.util.Random(31)
    val a = (0 until 400).map(_ => (rnd.nextInt(5).toLong,
      rnd.nextInt(20000).toLong)).distinct
    val b = (0 until 400).map(_ => (rnd.nextInt(5).toLong,
      rnd.nextInt(20000).toLong)).distinct
    val delta = 25L
    val got = EventMatch.agreementMatrix(df(a), df(b), "unit", "us", delta)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // brute force: per (ua-unit, ub-unit) distinct coincident event counts
    val na = a.groupBy(_._1).map { case (u, r) => u -> r.size.toLong }
    val nb = b.groupBy(_._1).map { case (u, r) => u -> r.size.toLong }
    val want = (for {
      ua <- a.map(_._1).distinct
      ub <- b.map(_._1).distinct
    } yield {
      val ta = a.filter(_._1 == ua).map(_._2)
      val tb = b.filter(_._1 == ub).map(_._2)
      val ca = ta.count(x => tb.exists(y => math.abs(x - y) <= delta)).toLong
      val cb = tb.count(y => ta.exists(x => math.abs(x - y) <= delta)).toLong
      (ua, ub) -> ((ca, cb))
    }).filter(p => p._2._1 > 0).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (k, (ca, cb)) =>
      val (gNa, gNb, gCa, gCb, perm) = got(k)
      assert((gNa, gNb) === ((na(k._1), nb(k._2))), k)
      assert((gCa, gCb) === ((ca, cb)), k)
      val c = math.min(ca, cb)
      assert(perm === 1000L * c / (gNa + gNb - c), k)
    }
  }

  test("bursts cannot inflate the score: each event coincides at most once") {
    // one a-event surrounded by five b-events within delta, and vice versa
    val a = df(Seq((1L, 1000L), (1L, 5000L)))
    val b = df(Seq((2L, 990L), (2L, 995L), (2L, 1000L), (2L, 1005L),
      (2L, 1010L)))
    val row = EventMatch.agreementMatrix(a, b, "unit", "us", 25L)
      .collect().head
    assert(row.getLong(4) === 1L, "coinc_a: the single a-event, once")
    assert(row.getLong(5) === 5L, "coinc_b: all five b-events coincide")
    // agreement uses min: 1000 * 1 / (2 + 5 - 1)
    assert(row.getLong(6) === 166L)
  }

  test("exact boundary: |dt| == delta coincides, delta+1 does not") {
    val a = df(Seq((1L, 1000L)))
    val hit = EventMatch.agreementMatrix(a, df(Seq((2L, 1025L))),
      "unit", "us", 25L).count()
    val miss = EventMatch.agreementMatrix(a, df(Seq((2L, 1026L))),
      "unit", "us", 25L).count()
    assert(hit === 1L && miss === 0L)
  }

  test("mutualBestMatch keeps only mutual argmaxes, ties to the smaller id") {
    val matrix = Seq(
      // unit_a 1: best is b=10 (800); unit_b 10: best is a=1 -> mutual
      (1L, 10L, 100L, 100L, 80L, 80L, 800L),
      (1L, 11L, 100L, 100L, 30L, 30L, 300L),
      // unit_a 2's best is b=10 (500) but b=10 prefers a=1 -> dropped;
      // its second choice b=11 is NOT its argmax -> 2 stays unmatched
      (2L, 10L, 100L, 100L, 50L, 50L, 500L),
      (2L, 11L, 100L, 100L, 40L, 40L, 400L))
      .toDF("unit_a", "unit_b", "n_a", "n_b", "coinc_a", "coinc_b",
        "agreement_permille")
    val got = EventMatch.mutualBestMatch(matrix, 100L)
      .select("unit_a", "unit_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
    // deterministic ties: equal scores resolve to the smaller partner
    val tied = Seq(
      (1L, 10L, 10L, 10L, 5L, 5L, 500L),
      (1L, 11L, 10L, 10L, 5L, 5L, 500L))
      .toDF("unit_a", "unit_b", "n_a", "n_b", "coinc_a", "coinc_b",
        "agreement_permille")
    assert(EventMatch.mutualBestMatch(tied, 100L)
      .select("unit_b").as[Long].collect().toSeq === Seq(10L))
  }

  test("threshold gates the assignment") {
    val matrix = Seq((1L, 10L, 100L, 100L, 20L, 20L, 111L))
      .toDF("unit_a", "unit_b", "n_a", "n_b", "coinc_a", "coinc_b",
        "agreement_permille")
    assert(EventMatch.mutualBestMatch(matrix, 112L).count() === 0L)
    assert(EventMatch.mutualBestMatch(matrix, 111L).count() === 1L)
  }

  test("propagateGlobalIds: identity seed, inherited ids through a permutation, fresh ids for new units") {
    // block 0: units 0..3 on a sparse grid; block 1: labels permuted by
    // v = (u + 2) % 4, same times (perfect agreement), plus new unit 9
    // far from everything
    def train(u: Long, off: Long) =
      (0 until 50).map(k => (u, off + k * 100000L + u * 10L))
    val b0 = df((0L to 3L).flatMap(u => train(u, 0L)))
    val b1 = df((0L to 3L).flatMap { u =>
      train(u, 0L).map { case (_, t) => ((u + 2) % 4, t) }
    } ++ train(9L, 43L)) // new unit: offset 43+90 far beyond delta of others
    val got = EventMatch.propagateGlobalIds(Seq(b0, b1), "unit", "us",
        deltaUs = 5L, minPermille = 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    (0L to 3L).foreach { u =>
      assert(got((0L, u)) === u, s"seed $u")
      assert(got((1L, (u + 2) % 4)) === u, s"inherit ${(u + 2) % 4}")
    }
    assert(got((1L, 9L)) === 4L, "fresh id = running max + 1")
  }

  test("unitYieldReport: new/retained/dropped on gapped block ids (positional)") {
    import spark.implicits._
    // blocks 10/20/30 (gapped ids must behave positionally):
    //   g1 in all three; g2 in 10,20; g3 in 20,30; g4 in 10,30 (gap)
    val asn = Seq(
      (10L, 1L, 1L), (20L, 1L, 1L), (30L, 1L, 1L),
      (10L, 2L, 2L), (20L, 2L, 2L),
      (20L, 3L, 3L), (30L, 3L, 3L),
      (10L, 4L, 4L), (30L, 4L, 4L)
    ).toDF("block", "unit", "global_unit")
    val got = EventMatch.unitYieldReport(asn)
      .orderBy("block").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (10L, 3L, 3L, 0L, 0L),
      (20L, 3L, 1L, 2L, 1L), // g3 new; g1,g2 retained; g4 dropped here
      (30L, 3L, 0L, 2L, 1L)  // g4 re-appears but is neither new nor retained
    ))
  }

  test("unitLongevity counts DISTINCT events per block and spans gaps") {
    import spark.implicits._
    val asn = Seq(
      (0L, 7L, 1L), (2L, 8L, 1L), // g1 in blocks 0 and 2 (gap at 1)
      (0L, 9L, 2L)
    ).toDF("block", "unit", "global_unit")
    val events = Seq(
      (0L, 7L, 100L), (0L, 7L, 200L), (0L, 7L, 200L), // burst dup: 2 distinct
      (2L, 8L, 300L), (2L, 8L, 400L), (2L, 8L, 500L),
      (0L, 9L, 100L)
    ).toDF("block", "unit", "us")
    val got = EventMatch.unitLongevity(asn, events)
      .orderBy("global_unit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      (1L, 0L, 2L, 2L, 2L, 3L, 5L),
      (2L, 0L, 0L, 1L, 1L, 1L, 1L)))
  }
}

/** Conversion-path discovery: prefix-to-first-target semantics, the
  * step cap's truncate-means-not-converted rule, and tie determinism.
  */
class ConversionPathsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Behavior

  test("paths stop at the first target; capped sessions count as unconverted") {
    val rows = Seq(
      // session (1,0): converts at step 3; step 4 must NOT appear
      (1L, 0L, 100L, 1L, "view"), (1L, 0L, 200L, 2L, "click"),
      (1L, 0L, 300L, 3L, "purchase"), (1L, 0L, 400L, 4L, "view"),
      // session (2,0): never converts -> whole (short) session
      (2L, 0L, 100L, 5L, "view"), (2L, 0L, 200L, 6L, "click"),
      // session (3,0): 5 events, purchase at step 5, cap 3 -> truncated,
      // unconverted
      (3L, 0L, 100L, 7L, "view"), (3L, 0L, 200L, 8L, "view"),
      (3L, 0L, 300L, 9L, "click"), (3L, 0L, 400L, 10L, "click"),
      (3L, 0L, 500L, 11L, "purchase"),
      // session (4,0): same path as (2,0) -> groups together
      (4L, 0L, 900L, 12L, "view"), (4L, 0L, 950L, 13L, "click")
    ).map { case (u, s, us, id, t) =>
      (u, s, new java.sql.Timestamp(us), id, t)
    }.toDF("user_id", "session_id", "ts", "event_id", "event_type")
    val got = Behavior.conversionPaths(rows, Seq("user_id", "session_id"),
        "ts", "event_id", "event_type", "purchase", maxSteps = 3)
      .orderBy("path").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("view>click", 2L, 0L),
      ("view>click>purchase", 1L, 1L),
      ("view>view>click", 1L, 0L)))
  }

  test("rank ties break on the tie column deterministically") {
    val t0 = new java.sql.Timestamp(1000L)
    val rows = Seq(
      (1L, 0L, t0, 2L, "click"), (1L, 0L, t0, 1L, "view"),
      (1L, 0L, t0, 3L, "purchase")
    ).toDF("user_id", "session_id", "ts", "event_id", "event_type")
    val got = Behavior.conversionPaths(rows, Seq("user_id", "session_id"),
        "ts", "event_id", "event_type", "purchase", maxSteps = 8)
      .collect()(0)
    assert(got.getString(0) == "view>click>purchase")
    assert(got.getLong(2) == 1L)
  }
}
