package graft

import graft.operators.Robust

/** Exact median/MAD against a brute in-memory reference (doubled order
  * statistics — no interpolation floats), odd/even group sizes, Hampel's
  * rule, and constant groups (MAD 0 → every deviation is an outlier).
  */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  private def brute(vals: Seq[Long], k: Int): (Long, Long, Long) = {
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((xs.size + 1) / 2 - 1) + s(xs.size / 2)
    }
    val m = med2(vals)
    val d2 = vals.map(v => math.abs(2 * v - m))
    val mad = med2(d2)
    (m, mad, d2.count(_ > k.toLong * mad).toLong)
  }

  test("madSummary matches brute order statistics, odd and even n") {
    val groups = Map(
      "odd" -> Seq(10L, 12L, 11L, 100L, 13L),
      "even" -> Seq(5L, 7L, 9L, 11L),
      "dups" -> Seq(4L, 4L, 4L, 4L, 50L),
      "const" -> Seq(8L, 8L, 8L),
      "two" -> Seq(1L, 1000L))
    val df = groups.toSeq.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .toDF("g", "v")
    val got = Robust.madSummary(df, Seq("g"), "v", k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    groups.foreach { case (g, vs) =>
      val (m, mad, out) = brute(vs, 3)
      assert(got(g) == ((vs.size.toLong, m, mad, out)), s"group $g")
    }
    // the planted spike IS the outlier where MAD is positive
    assert(got("odd")._4 == 1L)
    // constant group: MAD 0, all deviations 0 → no outliers
    assert(got("const")._4 == 0L)
    // dups: MAD 0 but the 50 deviates → flagged even with zero MAD
    assert(got("dups")._4 == 1L)
  }

  test("nearestRankQuantiles matches the brute nearest-rank definition") {
    val groups = Map("a" -> (1L to 10L), "b" -> (1L to 7L), "c" -> Seq(42L))
    val df = groups.toSeq.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .toDF("g", "v")
    val pcts = Seq(1, 25, 50, 75, 90, 100)
    val got = Robust.nearestRankQuantiles(df, Seq("g"), "v", pcts)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    groups.foreach { case (g, vs) =>
      val s = vs.toSeq.sorted
      pcts.foreach { p =>
        val idx = math.max(1, (p * s.size + 99) / 100)
        assert(got((g, p.toLong)) == ((s.size.toLong, s(idx - 1))),
          s"group $g pct $p")
      }
    }
    // every (group, pct) present exactly once
    assert(got.size == groups.size * pcts.size)
  }

  test("null values are dropped, not sorted into the order statistics") {
    val df = Seq(("g", Some(10L)), ("g", None), ("g", Some(12L)),
      ("g", Some(11L))).toDF("g", "v")
    val r = Robust.madSummary(df, Seq("g"), "v").collect().head
    assert(r.getLong(1) == 3L)        // n counts non-null only
    assert(r.getLong(2) == 11L + 11L) // med2 of {10,11,12}
  }
}
