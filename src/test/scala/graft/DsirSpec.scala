package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance resampling + hashed n-gram LM cross-entropy.
  *
  * The q124/q125 oracles replay the same hashed-LM construction, so they
  * cannot catch a degenerate DESIGN — these specs pin what the mirror is
  * blind to: the selection actually skews toward the target distribution,
  * the LM actually assigns lower cross-entropy to in-domain text, word
  * ORDER matters (bigrams are real, not a unigram bag), the degenerate
  * target==raw case reduces to a uniform Gumbel draw, and the physical
  * plan is a top-k frontier, not a global sort.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint planted vocabularies; "sci" is the target domain
  private def sciDoc(i: Int) =
    s"plasma drift field coil flux plasma torus coil field drift mode $i"
  private def webDoc(i: Int) =
    s"click buy cheap deal offer click sale cheap buy deal now $i"

  private lazy val corpus = ((1 to 80).map(i => (i.toLong, sciDoc(i))) ++
    (81 to 160).map(i => (i.toLong, webDoc(i)))).toDF("id", "text")

  private lazy val targetSeed =
    (1001 to 1040).map(i => (i.toLong, sciDoc(i))).toDF("id", "text")

  test("importanceResample skews hard toward the target domain") {
    val target = Dsir.trainNgramModel(targetSeed, "text", nBuckets = 256)
    val raw = Dsir.trainNgramModel(corpus, "text", nBuckets = 256)
    val picked = Dsir.importanceResample(corpus, "id", "text", target, raw,
        k = 60)
      .select("id").as[Long].collect().toSet
    assert(picked.size == 60)
    val sci = picked.count(_ <= 80)
    // 50/50 corpus; importance weights should make the draw near-pure sci
    assert(sci >= 55, s"expected ≥55 of 60 from the target domain, got $sci")
    // deterministic: the identical call selects the identical rows
    val again = Dsir.importanceResample(corpus, "id", "text", target, raw,
        k = 60)
      .select("id").as[Long].collect().toSet
    assert(again == picked)
  }

  test("degenerate target==raw: zero weights, pure hash-Gumbel draw") {
    val m = Dsir.trainNgramModel(corpus, "text", nBuckets = 256)
    assert(Dsir.importanceWeights(m, m).forall(_ == 0L))
    val picked = Dsir.importanceResample(corpus, "id", "text", m, m, k = 60)
      .select("id").as[Long].collect().toSet
    // a uniform draw should straddle both halves, not collapse to one
    val sci = picked.count(_ <= 80)
    assert(sci >= 15 && sci <= 45, s"uniform draw came out $sci/60 sci")
    // k ≥ n keeps everything
    assert(Dsir.importanceResample(corpus, "id", "text", m, m, k = 500)
      .count() == 160)
  }

  test("crossEntropy separates in-domain from out-of-domain text") {
    val model = Dsir.trainNgramModel(targetSeed, "text", nBuckets = 256)
    val ce = Dsir.crossEntropy(corpus, "id", "text", model)
      .select("id", "ce_micro").as[(Long, Long)].collect().toMap
    val sciMax = (1 to 80).map(i => ce(i.toLong)).max
    val webMin = (81 to 160).map(i => ce(i.toLong)).min
    assert(sciMax < webMin,
      s"every sci doc must beat every web doc: sci max $sciMax, web min $webMin")
    // perplexityFilter at a threshold between the two keeps exactly sci
    val kept = Dsir.perplexityFilter(corpus, "id", "text", model,
        maxCeMicro = (sciMax + webMin) / 2)
      .select("id").as[Long].collect().toSet
    assert(kept == (1 to 80).map(_.toLong).toSet)
  }

  test("bigrams are real: word order moves the score") {
    val model = Dsir.trainNgramModel(targetSeed, "text", nBuckets = 1024)
    // same unigram multiset, scrambled order → different bigrams
    val straight = "plasma drift field coil flux torus mode"
    val scrambled = "mode flux plasma coil torus drift field"
    val ce = Dsir.crossEntropy(
        Seq((1L, straight), (2L, scrambled)).toDF("id", "text"),
        "id", "text", model)
      .select("id", "ce_micro").as[(Long, Long)].collect().toMap
    assert(ce(1L) < ce(2L),
      s"in-order text must score better: straight ${ce(1L)}, scrambled ${ce(2L)}")
  }

  test("featureless docs: score 0, null CE, dropped by the filter") {
    val model = Dsir.trainNgramModel(targetSeed, "text", nBuckets = 256)
    val docs = Seq((1L, "plasma drift"), (2L, "??!  .,")).toDF("id", "text")
    val ce = Dsir.crossEntropy(docs, "id", "text", model)
    assert(ce.filter(col("id") === 2L).select("n_feats").as[Long].head() == 0L)
    assert(ce.filter(col("id") === 2L).filter(col("ce_micro").isNull)
      .count() == 1)
    assert(Dsir.perplexityFilter(docs, "id", "text", model, Long.MaxValue)
      .select("id").as[Long].collect().toSeq == Seq(1L))
    val w = Dsir.importanceWeights(model, model)
    assert(Dsir.importanceScore(docs, "id", "text", w)
      .filter(col("id") === 2L).select("dsir_score").as[Long].head() == 0L)
  }

  test("one-pass target+raw training equals the two-scan counts exactly") {
    val labeled = corpus.withColumn("__t", col("id") <= 80)
    val (tc, rc) = Dsir.trainTargetRawCounts(labeled, "text", "__t",
      nBuckets = 256)
    assert(tc.sameElements(
      Dsir.trainNgramCounts(corpus.filter(col("id") <= 80), "text", 256)))
    assert(rc.sameElements(Dsir.trainNgramCounts(corpus, "text", 256)))
  }

  test("sharded count training merges to the one-shot model exactly") {
    val parts = Seq(
      corpus.filter(col("id") <= 50),
      corpus.filter(col("id") > 50 && col("id") <= 110),
      corpus.filter(col("id") > 110))
    val merged = parts
      .map(p => Dsir.trainNgramCounts(p, "text", nBuckets = 256))
      .reduce(Dsir.mergeNgramCounts)
    val oneShot = Dsir.trainNgramCounts(corpus, "text", nBuckets = 256)
    assert(merged.sameElements(oneShot))
    assert(Dsir.modelFromCounts(merged)
      .sameElements(Dsir.trainNgramModel(corpus, "text", nBuckets = 256)))
  }

  test("fused scoreAndCrossEntropy equals the separate calls exactly") {
    val target = Dsir.trainNgramModel(targetSeed, "text", nBuckets = 256)
    val raw = Dsir.trainNgramModel(corpus, "text", nBuckets = 256)
    val w = Dsir.importanceWeights(target, raw)
    val docs = corpus.unionByName(
      Seq((999L, "??!")).toDF("id", "text")) // a featureless doc too
    val fused = Dsir.scoreAndCrossEntropy(docs, "id", "text", w, target)
      .select("id", "dsir_score", "n_feats", "ce_micro")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    val separate = Dsir.importanceScore(docs, "id", "text", w)
      .join(Dsir.crossEntropy(docs, "id", "text", target), Seq("id"))
      .select("id", "dsir_score", "n_feats", "ce_micro")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(fused == separate)
    // gumbelTopK over precomputed scores == importanceResample end to end
    val viaFused = Dsir.gumbelTopK(
        Dsir.scoreAndCrossEntropy(corpus, "id", "text", w, target),
        "id", "dsir_score", k = 40)
      .select("id").as[Long].collect().toSet
    val viaResample = Dsir.importanceResample(corpus, "id", "text", target,
        raw, k = 40)
      .select("id").as[Long].collect().toSet
    assert(viaFused == viaResample)
  }

  test("model invariants and the top-k physical plan") {
    val m = Dsir.trainNgramModel(corpus, "text", nBuckets = 128)
    assert(m.length == 128 && m.forall(_ >= 1L))
    // floored add-one shares sum to ≤ 1 on the grid (within flooring loss)
    assert(m.sum <= Dsir.Scale && m.sum > Dsir.Scale - 2L * 128)
    val plan = Dsir.importanceResample(corpus, "id", "text", m, m, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"resample must plan as a per-task top-k frontier:\n$plan")
    assert(!plan.contains("Window"), s"no window operator expected:\n$plan")
  }
}
