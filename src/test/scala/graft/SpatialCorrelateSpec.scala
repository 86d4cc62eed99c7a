package graft

import org.apache.spark.sql.functions._

import graft.operators.{Correlate, Spatial}

/** Grid radius join ≡ brute force on random point sets; lagged Pearson
  * statistics ≡ the literal overlap-pair sums.
  */
class SpatialCorrelateSpec extends SparkSpec {
  import spark.implicits._

  test("radiusSelfJoin equals brute force on random points incl. negatives") {
    val rnd = new scala.util.Random(17)
    val pts = (0 until 300).map { i =>
      (i.toLong, (rnd.nextInt(2000) - 1000).toLong,
        (rnd.nextInt(2000) - 1000).toLong)
    }
    val r = 150L
    val got = Spatial.radiusSelfJoin(pts.toDF("id", "x", "y"), "id", "x", "y", r)
      .select("id_a", "id_b", "dist2")
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= r * r
    } yield (ia, ib, d2)).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("radiusSelfJoin emits each pair exactly once (no cross-cell dups)") {
    // points straddling cell boundaries: distance 10, rad 10, cells of 10
    val pts = Seq((1L, 9L, 0L), (2L, 11L, 0L), (3L, 19L, 0L), (4L, -1L, 0L))
    val got = Spatial.radiusSelfJoin(pts.toDF("id", "x", "y"),
        "id", "x", "y", 10L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got.size === got.distinct.size)
    // boundary-inclusive: (1,3) and (1,4) sit at exactly distance 10
    assert(got.toSet === Set((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)))
  }

  test("pearsonAtLags equals literal overlap-pair statistics") {
    val rnd = new scala.util.Random(23)
    val a = (0 until 60).map(i => ("k", i.toLong, rnd.nextInt(100).toLong))
    val b = (0 until 60).filter(_ % 7 != 3) // holes in the right series
      .map(i => ("k", i.toLong, rnd.nextInt(100).toLong))
    val lags = Seq(-2, 0, 3)
    val got = Correlate.pearsonAtLags(a.toDF("k", "idx", "v"),
        b.toDF("k", "idx", "v"), Seq("k"), "idx", "v", lags)
      .select("lag", "n", "num", "den_x", "den_y")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val bm = b.map(r => r._2 -> r._3).toMap
    lags.foreach { lag =>
      val pairs = a.flatMap { case (_, i, x) => bm.get(i + lag).map((x, _)) }
      val n = pairs.size.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      assert(got(lag.toLong) ===
        ((n, n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)),
        s"lag $lag")
    }
  }

  test("autocorr at lag 0 is a perfect correlation (num = den)") {
    val s = (0 until 30).map(i => ("k", i.toLong, (i * 3 % 17).toLong))
    val row = Correlate.autocorr(s.toDF("k", "idx", "v"), Seq("k"),
        "idx", "v", Seq(0))
      .select("num", "den_x", "den_y").as[(Long, Long, Long)].head()
    assert(row._1 === row._2 && row._2 === row._3)
  }
}
