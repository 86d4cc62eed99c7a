package graft

import graft.operators.Collocations

/** PMI collocations against a brute-force in-memory reference on the same
  * micro grid, plus the minCount gate and the tie rule.
  */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "new york is big", "new york new york", "big apple big apple",
    "york new", "is big is big is big", "a b a b a b a")

  private def brute(minCount: Long, topN: Int)
      : Seq[(String, String, Long, Long)] = {
    val docs = texts.map(_.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").trim
      .split("\\s+").filter(_.nonEmpty).toSeq)
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val bi = docs.flatMap(ws => ws.zip(ws.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong)
    val u = uni.values.sum.toDouble
    val b = bi.values.sum.toDouble
    bi.toSeq.filter(_._2 >= minCount).map { case ((w1, w2), cab) =>
      val pmi = math.floor(1e6 * StrictMath.log(
        (cab.toDouble * u * u) / (b * uni(w1).toDouble * uni(w2).toDouble)))
        .toLong
      (w1, w2, cab, pmi)
    }.sortBy { case (w1, w2, _, p) => (-p, w1, w2) }.take(topN)
  }

  test("pmiBigrams matches brute force; minCount gates singletons") {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Collocations.pmiBigrams(docs, "text", minCount = 2, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == brute(2, 10))
    // "york new" occurs twice (once in-doc 1, once doc 3); "apple big"
    // once only — gated by minCount=2
    assert(!got.exists(t => t._1 == "apple" && t._2 == "big"))
    // the planted strong collocation ranks above the weak one
    val idx = got.indexWhere(t => (t._1, t._2) == ("new", "york"))
    val weak = got.indexWhere(t => (t._1, t._2) == ("is", "big"))
    assert(idx >= 0 && (weak < 0 || idx < weak))
  }
}
