package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Graphs, Robust}

/** Round-11 robust/graph additions: the Hampel filter against a literal
  * driver replay, and link prediction against brute-force common-neighbor
  * enumeration.
  */
class HampelLinkSpec extends SparkSpec {
  import spark.implicits._

  test("hampelFilter equals the literal centered-window replay") {
    val rnd = new scala.util.Random(11)
    val half = 3
    val rows = (0 until 120).map { i =>
      (i % 3L, new Timestamp(1700000000000L + i * 60000L), i.toLong,
        rnd.nextInt(2000).toLong - 1000L)
    }
    // a planted spike the filter must flag
    val spiked = rows :+ (0L,
      new Timestamp(1700000000000L + 200 * 60000L), 999L, 900000L)
    val got = Robust.hampelFilter(spiked.toDF("k", "ts", "tie", "vm"),
        "k", "ts", "tie", "vm", half = half, k = 3)
      .select(col("k"), col("tie"), col("med2"), col("mad2"),
        col("is_outlier"))
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val byKey = spiked.groupBy(_._1).map { case (k, rs) =>
      k -> rs.sortBy(r => (r._2.getTime, r._3))
    }
    for ((k, rs) <- byKey; (row, i) <- rs.zipWithIndex) {
      val win = rs.slice(math.max(0, i - half),
        math.min(rs.size, i + half + 1)).map(_._4).sorted
      val n = win.size
      val med2 = win((n + 1) / 2 - 1) + win(n / 2)
      val dev = win.map(v => math.abs(2 * v - med2)).sorted
      val mad2 = dev((n + 1) / 2 - 1) + dev(n / 2)
      val out = math.abs(2 * row._4 - med2) > 3L * mad2
      assert(got((k, row._3)) === ((med2, mad2, out)),
        s"key $k tie ${row._3}")
    }
    assert(got((0L, 999L))._3, "the planted spike must flag as an outlier")
  }

  test("linkPrediction equals brute common-neighbor enumeration") {
    val rnd = new scala.util.Random(5)
    val edges = (0 until 300)
      .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = Graphs.linkPrediction(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Long, Long, Boolean, Long)].collect().toSet
    val adj = edges.flatMap(e => Seq(e, e.swap)).distinct
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val nodes = adj.keys.toSeq
    val want = (for {
      u <- nodes; v <- nodes if u < v
      cn = (adj(u) & adj(v)).size if cn > 0
    } yield (u, v, cn.toLong, adj(u).size.toLong, adj(v).size.toLong,
      adj(u).contains(v),
      1000000L * cn / (adj(u).size + adj(v).size - cn))).toSet
    assert(got === want)
    assert(want.exists(_._6) && want.exists(!_._6),
      "fixture should score both edges and non-edges")
  }

  test("linkPrediction's hub cap drops wedges at capped centers only") {
    // star: hub 0 connected to 1..9, plus edge (1,2). With maxDegree 5
    // the hub contributes no wedges: only pair (1,2) shares center 1/2's
    // neighborhoods... which are {0,2}/{0,1} -> cn via center 0 is GONE,
    // so (1,2)'s only common neighbor 0 disappears and NO pairs survive
    // except those sharing a sub-cap center: (0, x) pairs via centers 1,2
    val edges = (1L to 9L).map(n => (0L, n)) :+ (1L, 2L)
    val got = Graphs.linkPrediction(edges.toDF("src", "dst"), "src", "dst",
        maxDegree = 5)
      .select("u", "v", "cn").as[(Long, Long, Long)].collect().toSet
    // centers 1 and 2 (degree 2) contribute pair (0, 2) and (0, 1)
    assert(got === Set((0L, 2L, 1L), (0L, 1L, 1L)))
  }
}
