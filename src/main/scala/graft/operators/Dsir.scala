package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169) and hashed n-gram language-model scoring (the CCNet
  * perplexity-filter pattern, Wenzek et al. 2020) — the model-based data
  * SELECTION layer of the LLM-pipeline brief, complementing
  * [[QualityFilter]]'s discriminative gate: instead of learning
  * positive-vs-negative weights, these model the TARGET DISTRIBUTION
  * (e.g. wiki-quality text) and keep corpus documents that look like it.
  *
  * Both share one model family: a bag-of-hashed-n-grams unigram model over
  * `nBuckets` buckets (unigrams + bigrams of the dedup-normalized token
  * stream, multiplicity kept — the DSIR paper's feature space). Training is
  * a single count aggregate; the model is an `nBuckets`-long array of
  * add-one-smoothed fixed-point probabilities (10⁻⁹ grid, pure integer —
  * the [[QualityFilter]] discipline), driver state like IVF centers.
  *
  * Log-space scoring CANNOT be all-integer (it needs ln), so weights are
  * snapped to a micro-nat grid ONCE per bucket at model-build time:
  * `w_b = floor(10⁶ · ln(p_b / q_b))`. Document scores are then integer
  * sums of per-bucket weights — exact, accumulation-order-free, and
  * engine-replayable. The only cross-engine hazard left is a bucket whose
  * ln lands within 1 ulp of a 10⁻⁶ grid boundary (probability ~10⁻⁹ per
  * bucket per model — accepted and documented, vs the unbounded hazard of
  * comparing order-dependent double SUMS).
  *
  * Scale shape (100 TB corpus, catalog-scale model):
  *  - train: explode features → one hash-partitioned count aggregate with
  *    map-side partials over ≤ nBuckets cells → nBuckets-row driver collect;
  *  - score: features → codegen'd hash + `element_at` into a literal weight
  *    array → one groupBy(id) long sum. No join, no broadcast table — the
  *    model rides in the plan (a few KB of literals);
  *  - resample: Gumbel-top-k over `score + Gumbel(hash(id))` — the DSIR
  *    paper's sampling-without-replacement trick — planned as
  *    TakeOrderedAndProject: per-task k-row frontiers, no global sort, no
  *    shuffle of the corpus. The Gumbel draw is keyed on the portable hash
  *    of the id, so retries and other engines select identical rows.
  */
object Dsir {

  /** Fixed-point probability grid (10⁻⁹), shared with [[QualityFilter]]. */
  val Scale: Long = 1000000000L

  /** Micro-nat grid for log weights and Gumbel keys. */
  val LogScale: Long = 1000000L

  private val TwoPow60: Double = 1152921504606846976.0

  /** Shared feature extractor: dedup-normalized whitespace tokens →
    * unigrams + bigrams (multiplicity kept) → portable-hash bucket in
    * `[0, nBuckets)` as `__b`. Used by train AND score so the feature
    * space cannot desynchronize. Docs with no tokens vanish (re-joined by
    * scorers).
    */
  private def featureBuckets(df: DataFrame, textCol: String,
                             nBuckets: Int): DataFrame = {
    val ws = filter(
      split(TextFunctions.normalizeForDedup(col(textCol)), " "),
      w => length(w) > 0)
    val nBi = greatest(size(ws) - 1, lit(0))
    val bis = zip_with(
      slice(ws, lit(1), nBi),
      slice(ws, lit(2), nBi),
      (a, b) => concat(a, lit(" "), b))
    df.withColumn("__f", explode(concat(ws, bis)))
      .withColumn("__b",
        pmod(HashFunctions.portableHash60(col("__f")), lit(nBuckets.toLong))
          .cast("int"))
      .drop("__f")
  }

  /** Raw per-bucket feature counts — the MERGEABLE form of the model
    * (counts are additive; smoothing and normalization are not). Train
    * per day/shard, [[mergeNgramCounts]] the arrays, then
    * [[modelFromCounts]] once — the incremental-twin discipline: a rolling
    * corpus model never re-scans history.
    */
  def trainNgramCounts(docs: DataFrame, textCol: String,
                       nBuckets: Int = 1024): Array[Long] = {
    require(nBuckets > 0, "nBuckets must be positive")
    val counts = featureBuckets(docs.select(col(textCol)), textCol, nBuckets)
      .groupBy("__b").agg(count(lit(1)).as("c"))
      .collect()
    val c = Array.fill(nBuckets)(0L)
    counts.foreach(r => c(r.getInt(0)) += r.getLong(1))
    c
  }

  /** Target and raw counts in ONE corpus pass: `targetCol` (boolean) marks
    * the docs that also feed the target model; the raw side counts every
    * doc. One explode + one conditional-sum aggregate instead of two full
    * feature scans — the DSIR training shape when the target seed lives
    * inside the corpus (the common case: a lang/source/label column).
    */
  def trainTargetRawCounts(docs: DataFrame, textCol: String,
                           targetCol: String,
                           nBuckets: Int = 1024): (Array[Long], Array[Long]) = {
    require(nBuckets > 0, "nBuckets must be positive")
    val counts = featureBuckets(
        docs.select(col(targetCol).cast("boolean").as("__t"), col(textCol)),
        textCol, nBuckets)
      .groupBy("__b")
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("tc"),
        count(lit(1)).as("rc"))
      .collect()
    val t = Array.fill(nBuckets)(0L)
    val r = Array.fill(nBuckets)(0L)
    counts.foreach { row =>
      val i = row.getInt(0)
      t(i) += row.getLong(1)
      r(i) += row.getLong(2)
    }
    (t, r)
  }

  /** Per-group bucket-count ROWS `(groupCol, bucket, c)` — the fully
    * distributed form of [[trainNgramCounts]] for partitioned or
    * incremental training: no driver array, one row per non-empty
    * `(group, bucket)` cell. The incremental training drain keys groups
    * by source FILE so replays land idempotently.
    */
  def ngramCountsBy(docs: DataFrame, groupCol: String, textCol: String,
                    nBuckets: Int): DataFrame =
    featureBuckets(docs.select(col(groupCol), col(textCol)),
        textCol, nBuckets)
      .groupBy(col(groupCol), col("__b").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Elementwise sum of two count arrays (same nBuckets required). */
  def mergeNgramCounts(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length, "count arrays must share nBuckets")
    Array.tabulate(a.length)(i => a(i) + b(i))
  }

  /** Counts → add-one-smoothed bucket probabilities on the 10⁻⁹ integer
    * grid, clamped to ≥ 1 so log weights stay finite (a bucket's floored
    * share hits 0 only past 10⁹ total features — at that scale raise
    * `Scale`, or accept the clamp's floor on rare-bucket penalties). All
    * arithmetic integer; replays exactly in SQL.
    */
  def modelFromCounts(counts: Array[Long]): Array[Long] = {
    val c = counts.map(_ + 1L) // add-one smoothing
    val t = c.foldLeft(BigInt(0))(_ + _)
    // BigInt intermediate: c(i)*Scale overflows Long once a bucket holds
    // >~9.2e9 features (plausible at 100 TB). The SQL replay's BIGINT
    // multiply would hard-error there; below that threshold BigInt and
    // Long arithmetic agree bit-for-bit, so oracle parity is unaffected.
    Array.tabulate(c.length)(i =>
      math.max(1L, (BigInt(c(i)) * Scale / t).toLong))
  }

  /** One-shot convenience: [[trainNgramCounts]] → [[modelFromCounts]]. */
  def trainNgramModel(docs: DataFrame, textCol: String,
                      nBuckets: Int = 1024): Array[Long] =
    modelFromCounts(trainNgramCounts(docs, textCol, nBuckets))

  /** DSIR importance weights in micro-nats: `floor(10⁶·ln(p_target/p_raw))`
    * per bucket. `StrictMath.log` (fdlibm) for JVM-stable results; the
    * grid snap makes the array the portable model artifact.
    */
  def importanceWeights(target: Array[Long], raw: Array[Long]): Array[Long] = {
    require(target.length == raw.length,
      "target and raw models must share nBuckets")
    Array.tabulate(target.length) { i =>
      math.floor(LogScale.toDouble *
        StrictMath.log(target(i).toDouble / raw(i).toDouble)).toLong
    }
  }

  /** Per-bucket log-probabilities in micro-nats (≤ 0):
    * `floor(10⁶·ln(p_b/10⁹))` — the scoring table for [[crossEntropy]].
    */
  def logProbWeights(model: Array[Long]): Array[Long] =
    Array.tabulate(model.length) { i =>
      math.floor(LogScale.toDouble *
        StrictMath.log(model(i).toDouble / Scale.toDouble)).toLong
    }

  /** `(idCol, dsir_score)` sums for docs that HAVE features — the shared
    * aggregate behind [[importanceScore]]/[[importanceResample]] (callers
    * left-join and coalesce featureless docs to 0 themselves, so the
    * resample path attaches extra doc columns with ONE join, not two).
    */
  private def scoreAgg(docs: DataFrame, idCol: String, textCol: String,
                       weights: Array[Long]): DataFrame =
    featureBuckets(docs.select(col(idCol), col(textCol)),
        textCol, weights.length)
      .select(col(idCol),
        element_at(typedlit(weights.toSeq), col("__b") + 1).as("__w"))
      .groupBy(idCol)
      .agg(sum(col("__w")).as("dsir_score"))

  /** Sum a literal per-bucket weight table over every document's features:
    * `(idCol, dsir_score)`, one row per input doc, featureless docs score 0.
    */
  def importanceScore(docs: DataFrame, idCol: String, textCol: String,
                      weights: Array[Long]): DataFrame =
    docs.select(col(idCol))
      .join(scoreAgg(docs, idCol, textCol, weights), Seq(idCol), "left")
      .withColumn("dsir_score", coalesce(col("dsir_score"), lit(0L)))

  /** DSIR score AND cross-entropy in ONE feature pass: two `element_at`
    * lookups per exploded feature, one aggregate — the fused scorer for
    * pipelines that gate on perplexity and then resample by importance
    * (q128), where separate [[importanceScore]]+[[crossEntropy]] calls
    * would each re-shingle the corpus. Output: docs' columns +
    * `(dsir_score, n_feats, ce_micro)`; featureless docs score 0 with
    * null CE. Exactly equal to the separate calls (spec-pinned).
    */
  def scoreAndCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
                           weights: Array[Long],
                           targetModel: Array[Long]): DataFrame = {
    require(weights.length == targetModel.length,
      "weights and targetModel must share nBuckets")
    val lw = logProbWeights(targetModel)
    val agg = featureBuckets(docs.select(col(idCol), col(textCol)),
        textCol, weights.length)
      .select(col(idCol),
        element_at(typedlit(weights.toSeq), col("__b") + 1).as("__w"),
        element_at(typedlit(lw.toSeq), col("__b") + 1).as("__lw"))
      .groupBy(idCol)
      .agg(sum(col("__w")).as("dsir_score"), count(lit(1)).as("n_feats"),
        sum(col("__lw")).as("__ll"))
      .withColumn("ce_micro", expr("(-__ll) div n_feats"))
      .drop("__ll")
    docs.join(agg, Seq(idCol), "left")
      .withColumn("dsir_score", coalesce(col("dsir_score"), lit(0L)))
      .withColumn("n_feats", coalesce(col("n_feats"), lit(0L)))
  }

  /** Gumbel-top-k over an ALREADY-COMPUTED integer score column — the
    * selection tail of [[importanceResample]], public so fused pipelines
    * (one [[scoreAndCrossEntropy]] pass → gate → draw) don't re-extract
    * features just to sample. Same key arithmetic, same plan shape
    * (TakeOrderedAndProject).
    */
  def gumbelTopK(df: DataFrame, idCol: String, scoreCol: String, k: Int,
                 tag: String = "dsir"): DataFrame = {
    require(k > 0, "k must be positive")
    df.withColumn("__key", col(scoreCol) + gumbelMicro(idCol, tag))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** The deterministic Gumbel(0,1) draw keyed on the document id:
    * `u = (hash+0.5)/2⁶⁰ ∈ (0,1)`, `g = −ln(−ln u)` — snapped to the
    * micro-nat grid so the resampling key stays integral.
    */
  private def gumbelMicro(idCol: String, tag: String) = {
    val u = (HashFunctions.portableHash60(
        concat(lit(tag + ":"), col(idCol).cast("string"))).cast("double") +
      lit(0.5)) / lit(TwoPow60)
    floor(lit(LogScale.toDouble) * -log(-log(u))).cast("long")
  }

  /** DSIR selection: score every doc with `ln(p_target/p_raw)` weights and
    * keep the k largest `score + Gumbel(hash(id))` keys — sampling without
    * replacement proportional to the importance weight (Gumbel-top-k), the
    * DSIR paper's §2.2 procedure, with a hash-keyed Gumbel so re-runs and
    * oracle replays pick the identical k docs. Extra columns of `docs`
    * survive. Plans as TakeOrderedAndProject (per-task k-row frontier).
    */
  def importanceResample(docs: DataFrame, idCol: String, textCol: String,
                         target: Array[Long], raw: Array[Long], k: Int,
                         tag: String = "dsir"): DataFrame = {
    require(k > 0, "k must be positive")
    val scored = docs.join(
        scoreAgg(docs, idCol, textCol, importanceWeights(target, raw)),
        Seq(idCol), "left")
      .withColumn("dsir_score", coalesce(col("dsir_score"), lit(0L)))
    gumbelTopK(scored, idCol, "dsir_score", k, tag)
  }

  /** Per-document cross-entropy under the model, in micro-nats per feature:
    * `(idCol, n_feats, ce_micro)` — `ce_micro = (−Σ log p) / n_feats`
    * (integer division; both operands ≥ 0). Featureless docs get
    * `n_feats = 0`, `ce_micro` null — CCNet drops them, so does
    * [[perplexityFilter]]. Low is target-like; `exp(ce/10⁶)` is the
    * per-feature perplexity if anyone wants the classical unit.
    */
  def crossEntropy(docs: DataFrame, idCol: String, textCol: String,
                   model: Array[Long]): DataFrame = {
    val lw = logProbWeights(model)
    val scored = featureBuckets(docs.select(col(idCol), col(textCol)),
        textCol, model.length)
      .select(col(idCol),
        element_at(typedlit(lw.toSeq), col("__b") + 1).as("__w"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"), sum(col("__w")).as("__ll"))
      .withColumn("ce_micro", expr("(-__ll) div n_feats"))
      .drop("__ll")
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .withColumn("n_feats", coalesce(col("n_feats"), lit(0L)))
  }

  /** CCNet-style perplexity gate: keep documents whose per-feature
    * cross-entropy under the target-domain model is ≤ `maxCeMicro`
    * micro-nats (featureless docs are dropped — no evidence either way).
    * A pure per-doc filter: one corpus scan, no shuffle beyond the
    * per-doc aggregate.
    */
  def perplexityFilter(docs: DataFrame, idCol: String, textCol: String,
                       model: Array[Long], maxCeMicro: Long): DataFrame =
    docs.join(
      crossEntropy(docs, idCol, textCol, model)
        .filter(col("ce_micro") <= maxCeMicro)
        .select(col(idCol), col("n_feats"), col("ce_micro")),
      Seq(idCol))
}
