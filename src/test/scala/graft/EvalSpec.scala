package graft

import org.apache.spark.sql.functions._

import graft.operators.Eval

/** Exact AUC ≡ the probabilistic definition: AUC = P(score₊ > score₋) +
  * ½·P(score₊ = score₋), computed by brute pair enumeration (doubled to
  * stay integer).
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def bruteAucMicro(rows: Seq[(Long, Boolean)]): Option[Long] = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      // 2·Σ over pairs of (1 if p > n, ½ if tie) — kept doubled
      val num2 = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      Some(BigInt(1000000L) * num2 / (BigInt(2) * pos.size * neg.size))
        .map(_.toLong)
    }
  }

  test("aucExact equals brute pair enumeration, ties included") {
    val rnd = new scala.util.Random(3)
    // small score range -> heavy ties, the part rank arithmetic gets wrong
    val rows = (0 until 400).map { i =>
      (s"g${i % 3}", rnd.nextInt(12).toLong,
        rnd.nextInt(100) < 30 + 20 * (i % 3))
    }
    val got = Eval.aucExact(rows.toDF("g", "s", "y"), Seq("g"), "s", "y")
      .select(col("g"), col("n_pos"), col("n_neg"), col("auc_micro"))
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val flat = rs.map(r => (r._2, r._3))
      assert(got(g)._2 === flat.count(_._2).toLong, s"$g n_pos")
      assert(got(g)._3 === flat.count(!_._2).toLong, s"$g n_neg")
      assert(got(g)._4 === bruteAucMicro(flat), s"$g auc")
    }
  }

  test("perfect separation gives 10^6; anti-separation gives 0") {
    val perfect = (0 until 50).map(i => ("k", i.toLong, i >= 25))
    val p = Eval.aucExact(perfect.toDF("g", "s", "y"), Seq("g"), "s", "y")
      .select("auc_micro").as[Long].head()
    assert(p === 1000000L)
    val anti = perfect.map { case (g, s, y) => (g, s, !y) }
    val a = Eval.aucExact(anti.toDF("g", "s", "y"), Seq("g"), "s", "y")
      .select("auc_micro").as[Long].head()
    assert(a === 0L)
  }

  test("a one-class group reports null AUC, not a crash or a 0") {
    val rows = Seq(("only_pos", 1L, true), ("only_pos", 2L, true),
      ("mixed", 1L, true), ("mixed", 2L, false))
    val got = Eval.aucExact(rows.toDF("g", "s", "y"), Seq("g"), "s", "y")
      .select(col("g"), col("auc_micro"))
      .as[(String, Option[Long])].collect().toMap
    assert(got("only_pos") === None)
    assert(got("mixed") === Some(0L)) // the one positive scores LOWER
  }
}
