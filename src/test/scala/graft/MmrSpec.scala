package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** MMR selection against a driver replay of the exact trajectory —
  * VecCosine's sequential double accumulation, Spark's HALF_UP round,
  * floor-to-micro, the undivided integer objective, smallest-id ties — plus
  * the properties that make it MMR (diversity vs pure relevance).
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < math.min(a.length, b.length)) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Spark round(col, 6) = BigDecimal HALF_UP, then floor to micro. */
  private def simMicro(a: Array[Float], b: Array[Float]): Long =
    math.floor(BigDecimal(cosine(a, b))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1000000.0)
      .toLong

  private def brute(pool: Seq[(Long, Long, Array[Float])], k: Int,
                    lambdaPct: Int): Seq[(Int, Long, Long)] = {
    var rem = pool
    var ms = pool.map(p => p._1 -> 0L).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var r = 1
    while (r <= k && rem.nonEmpty) {
      val scored = rem.map { case (id, rel, v) =>
        (id, lambdaPct * rel - (100 - lambdaPct) * ms(id), v)
      }
      val (pid, sc, pv) = scored.minBy { case (id, s, _) => (-s, id) }
      out += ((r, pid, sc))
      rem = rem.filterNot(_._1 == pid)
      ms = rem.map { case (id, _, v) =>
        val s = simMicro(v, pv)
        id -> (if (r == 1) s else math.max(ms(id), s))
      }.toMap
      r += 1
    }
    out.toSeq
  }

  private def run(pool: Seq[(Long, Long, Array[Float])], k: Int,
                  lambdaPct: Int): Seq[(Int, Long, Long)] =
    Similarity.mmrSelect(
      pool.map { case (id, rel, v) => (id, rel, v.toSeq) }
        .toDF("id", "rel_micro", "vec"),
      "id", "vec", "rel_micro", k, lambdaPct)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq

  private def randPool(seed: Int, n: Int, dim: Int)
      : Seq[(Long, Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, rnd.nextLong(2000000L) - 1000000L,
        Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }
  }

  test("mmrSelect equals the driver trajectory replay on random pools") {
    for (trial <- 1 to 3; lambda <- Seq(0, 50, 70, 100)) {
      val pool = randPool(trial * 31, 25, 8)
      assert(run(pool, 8, lambda) == brute(pool, 8, lambda),
        s"trial $trial lambda $lambda")
    }
  }

  test("lambda=100 reduces to pure relevance order with id ties") {
    val pool = randPool(5, 20, 4)
    val want = pool.sortBy { case (id, rel, _) => (-rel, id) }.take(6)
      .zipWithIndex.map { case ((id, rel, _), i) => (i + 1, id, 100 * rel) }
    assert(run(pool, 6, 100) == want)
  }

  test("MMR crosses clusters where pure relevance stays in one") {
    // cluster A near (1,0): highest relevance; cluster B near (0,1): lower
    val a = Seq[(Long, Long, Array[Float])](
      (1L, 1000000L, Array(1f, 0.01f)), (2L, 990000L, Array(1f, 0.02f)),
      (3L, 980000L, Array(1f, 0.03f)))
    val b = Seq[(Long, Long, Array[Float])](
      (11L, 500000L, Array(0.01f, 1f)), (12L, 490000L, Array(0.02f, 1f)))
    val rel = run(a ++ b, 2, 100).map(_._2)
    val mmr = run(a ++ b, 2, 50).map(_._2)
    assert(rel == Seq(1L, 2L)) // relevance-only: both from cluster A
    assert(mmr.head == 1L && mmr(1) >= 11L, // MMR: second pick jumps to B
      s"expected a cross-cluster pick, got $mmr")
  }

  test("k beyond the pool returns every row once, ranks dense from 1") {
    val pool = randPool(9, 5, 4)
    val got = run(pool, 50, 70)
    assert(got.map(_._1) == (1 to 5))
    assert(got.map(_._2).toSet == pool.map(_._1).toSet)
  }

  test("mmrSelect rejects a non-integral id column loudly") {
    // a string id would null through cast("long") and silently drop rows
    // via the null-propagating id =!= pid filter — same guard as
    // labelPropagation
    val df = Seq(("a", 10L, Seq(1f, 0f)), ("b", 5L, Seq(0f, 1f)))
      .toDF("id", "rel_micro", "vec")
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrSelect(df, "id", "vec", "rel_micro", 2, 50)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }
}
