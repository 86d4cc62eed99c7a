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
      .select(col("lag"), col("n"), col("num").cast("long"),
        col("den_x").cast("long"), col("den_y").cast("long"))
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
      .select("num", "den_x", "den_y")
      .as[(BigDecimal, BigDecimal, BigDecimal)].head()
    assert(row._1 === row._2 && row._2 === row._3)
  }

  // VERDICT r10 #3: the Long formulation of `n·Σx²` wraps silently at
  // micro-snapped magnitudes (x ~ 4·10⁹ ⇒ x² ≈ 1.6·10¹⁹ > 2⁶³); the
  // DECIMAL(38,0) path must agree with driver-side BigInt arithmetic
  // exactly where the Long path provably does not.
  test("pearsonAtLags is exact where the Long path provably wraps") {
    val rnd = new scala.util.Random(41)
    // values ~4e9 with small jitter: single products x·x wrap a Long,
    // while num/den stay small (catastrophic cancellation: den = n²·var)
    val base = 4000000000L
    val s = (0 until 50).map(i => ("k", i.toLong, base + rnd.nextInt(1000)))
    // pin the wrap: the Long arithmetic the old path ran is provably wrong
    val xs = s.map(_._3)
    val wrapped = xs.map(x => x * x).sum // Long math, wraps
    val exactSxx = xs.map(x => BigInt(x) * BigInt(x)).sum
    assert(BigInt(wrapped) !== exactSxx, "planted magnitudes must wrap Long")
    val got = Correlate.autocorr(s.toDF("k", "idx", "v"), Seq("k"),
        "idx", "v", Seq(0, 1))
      .select(col("lag"), col("n"), col("num").cast("string"),
        col("den_x").cast("string"), col("den_y").cast("string"))
      .as[(Long, Long, String, String, String)].collect()
      .map(r => r._1 -> (r._2, BigInt(r._3), BigInt(r._4), BigInt(r._5)))
      .toMap
    Seq(0, 1).foreach { lag =>
      val pairs = s.flatMap { case (_, i, x) =>
        s.find(_._2 == i + lag).map(t => (BigInt(x), BigInt(t._3)))
      }
      val n = BigInt(pairs.size)
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      assert(got(lag.toLong) === ((pairs.size.toLong, n * sxy - sx * sy,
        n * sxx - sx * sx, n * syy - sy * sy)), s"lag $lag")
    }
  }

  test("spearman equals the BigInt tie-doubled rank replay") {
    val rnd = new scala.util.Random(59)
    // small value range -> heavy ties on both axes
    val rows = (0 until 300).map { i =>
      (s"g${i % 2}", rnd.nextInt(15).toLong, rnd.nextInt(15).toLong)
    }
    val got = Correlate.spearman(rows.toDF("g", "x", "y"), Seq("g"),
        "x", "y")
      .select(col("g"), col("n"), col("num").cast("string"),
        col("den_x").cast("string"), col("den_y").cast("string"))
      .as[(String, Long, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, BigInt(r._3), BigInt(r._4), BigInt(r._5))))
      .toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      def rank2(vs: Seq[Long]): Seq[BigInt] = {
        val sorted = vs.sorted
        vs.map { v =>
          val first = sorted.indexOf(v) + 1
          val c = sorted.count(_ == v)
          BigInt(2L * first + c - 1)
        }
      }
      val rx = rank2(rs.map(_._2)); val ry = rank2(rs.map(_._3))
      val n = BigInt(rs.size)
      val sx = rx.sum; val sy = ry.sum
      val sxy = rx.zip(ry).map(p => p._1 * p._2).sum
      val sxx = rx.map(r => r * r).sum; val syy = ry.map(r => r * r).sum
      assert(got(g) === ((rs.size.toLong, n * sxy - sx * sy,
        n * sxx - sx * sx, n * syy - sy * sy)), s"group $g")
    }
  }

  test("spearman of a strictly monotone pair is a perfect +1 (num = den)") {
    val rows = (0 until 40).map(i => ("k", i.toLong, (i * 7 + 3).toLong))
    val r = Correlate.spearman(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .select("num", "den_x", "den_y")
      .as[(BigDecimal, BigDecimal, BigDecimal)].head()
    assert(r._1 === r._2 && r._2 === r._3)
  }

  test("degreeAssortativity matches BigInt brute force on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 400)
      .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = graft.operators.Graphs.degreeAssortativity(
        edges.toDF("src", "dst"), "src", "dst")
      .select(col("n_endpoints"), col("sum_x").cast("string"),
        col("sum_xy").cast("string"), col("sum_xx").cast("string"),
        col("r_num").cast("string"), col("r_den").cast("string"))
      .as[(Long, String, String, String, String, String)].head()
    val und = edges.flatMap(e => Seq(e, e.swap)).distinct
    val deg = und.groupBy(_._1).map { case (n, es) => n -> BigInt(es.size) }
    val tagged = und.map { case (a, b) => (deg(a), deg(b)) }
    val n = BigInt(tagged.size)
    val sx = tagged.map(_._1).sum
    val sxy = tagged.map(t => t._1 * t._2).sum
    val sxx = tagged.map(t => t._1 * t._1).sum
    assert(got === ((tagged.size.toLong, sx.toString, sxy.toString,
      sxx.toString, (n * sxy - sx * sx).toString,
      (n * sxx - sx * sx).toString)))
  }
}
