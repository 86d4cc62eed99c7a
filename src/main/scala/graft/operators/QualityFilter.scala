package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}

/** Model-based quality filtering — the trainable gate of the LLM-pipeline
  * brief (the CCNet/fastText pattern: label a small seed set, train a linear
  * text classifier over hashed unigram features, score the whole corpus and
  * keep what the model likes). The heuristic gates (`TextFunctions.
  * qualityFeatures`, q62) are fixed rules; this learns its rule from data.
  *
  * The model is a hashed-unigram CENTROID (Rocchio) classifier: each token
  * hashes into one of `nBuckets` buckets; a bucket's weight is the
  * difference between its share of positive-class tokens and its share of
  * negative-class tokens, add-one smoothed, on a fixed 10⁻⁹ integer grid:
  *
  *   w_b = floor((g_b+1)·S / T_g) − floor((bad_b+1)·S / T_b),  S = 10⁹
  *
  * A document's score is the sum of its tokens' weights — positive means
  * its unigram profile sits closer to the positive class. All arithmetic is
  * INTEGER (counts, fixed-point shares, long sums): deliberately no
  * log-odds or sigmoid, because sums of doubles depend on accumulation
  * order and transcendentals on the engine's libm — this grid replays
  * exactly in any engine (the q87 floor-to-milli discipline applied to a
  * classifier), at the cost of clipping shares below 10⁻⁹ to zero.
  *
  * Scale shape:
  *  - training is one explode → per-bucket count aggregate (nBuckets cells,
  *    map-side partials) → an nBuckets-row driver collect (catalog-scale;
  *    the model IS driver state, like IVF centers) with pure-Scala long
  *    arithmetic for the weights;
  *  - scoring embeds the weights as a literal array: explode → codegen'd
  *    hash + `element_at` → one groupBy(id) sum of longs. No join, no
  *    broadcast table — the model rides in the plan;
  *  - `S = 10⁹` keeps every intermediate in int64 headroom: shares are
  *    ≤ S, so a doc's score is bounded by `tokens(doc) · S` and the
  *    training product `(g_b+1)·S` only overflows past ~9·10⁹ tokens in
  *    ONE bucket — at that corpus scale, raise `nBuckets` (which shrinks
  *    per-bucket counts) before shrinking `S`.
  *
  * Reference scope note: the reference has no learned filter (its QC is
  * rule-based); this belongs to the pipeline brief's text-analysis family.
  */
object QualityFilter {

  /** Fixed-point share grid (10⁻⁹ resolution). */
  val Scale: Long = 1000000000L

  /** Tokens → hash buckets, shared by train and score so the feature space
    * cannot desynchronize: dedup normalization, whitespace split, empty
    * tokens dropped, portable 60-bit hash mod `nBuckets`.
    */
  private def tokenBuckets(df: DataFrame, textCol: String,
                           nBuckets: Int): DataFrame =
    df.withColumn("__tok",
        explode(split(TextFunctions.normalizeForDedup(col(textCol)), " ")))
      .filter(length(col("__tok")) > 0)
      .withColumn("__b",
        pmod(HashFunctions.portableHash60(col("__tok")), lit(nBuckets.toLong))
          .cast("int"))
      .drop("__tok")

  /** Train the centroid weights from a labeled seed set. `labelCol` must be
    * boolean (true = positive/keep class); null-labeled docs contribute to
    * neither class (their tokens are counted and discarded — filter them out
    * first if the seed set is mostly unlabeled). Returns the `nBuckets`
    * weight array to pass to [[scoreHashed]] — persist it like any model
    * artifact.
    */
  def trainHashedCentroid(docs: DataFrame, textCol: String, labelCol: String,
                          nBuckets: Int = 1024): Array[Long] = {
    val (g, bad) = trainLabeledCounts(docs, textCol, labelCol, nBuckets)
    weightsFromCounts(g, bad)
  }

  /** One-shot RAW per-bucket class counts `(goodCounts, badCounts)` — the
    * mergeable training state behind [[trainHashedCentroid]] (the
    * `Dsir.trainNgramCounts` discipline applied to the classifier):
    * persist/merge these across shards or waves, then
    * [[weightsFromCounts]] when a model is needed. Unsmoothed — smoothing
    * belongs to the counts→weights step so merging stays exact.
    */
  def trainLabeledCounts(docs: DataFrame, textCol: String, labelCol: String,
                         nBuckets: Int = 1024): (Array[Long], Array[Long]) = {
    require(nBuckets > 0, "nBuckets must be positive")
    val counts = tokenBuckets(
        docs.select(col(labelCol).cast("boolean").as("__y"), col(textCol)),
        textCol, nBuckets)
      .groupBy("__b")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("g"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("bad"))
      .collect()
    val g = Array.fill(nBuckets)(0L)
    val bad = Array.fill(nBuckets)(0L)
    counts.foreach { r =>
      val i = r.getInt(0)
      g(i) += r.getLong(1)
      bad(i) += r.getLong(2)
    }
    (g, bad)
  }

  /** Per-group labeled bucket-count ROWS `(groupCol, bucket, g, bad)` — the
    * fully distributed form of [[trainLabeledCounts]] for partitioned or
    * incremental training: no driver array, one row per non-empty
    * `(group, bucket)` cell. The streaming training drain keys groups by
    * source FILE so replays land idempotently
    * (graft.streaming.StreamingQualityFilter).
    */
  def labeledCountsBy(docs: DataFrame, groupCol: String, textCol: String,
                      labelCol: String, nBuckets: Int): DataFrame =
    tokenBuckets(
        docs.select(col(groupCol), col(labelCol).cast("boolean").as("__y"),
          col(textCol)),
        textCol, nBuckets)
      .groupBy(col(groupCol), col("__b").as("bucket"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("g"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("bad"))

  /** Elementwise sum of two labeled-count states (same nBuckets required):
    * counts are plain sums, so sharded training merged in ANY order equals
    * the one-shot pass (spec-pinned).
    */
  def mergeLabeledCounts(a: (Array[Long], Array[Long]),
                         b: (Array[Long], Array[Long]))
      : (Array[Long], Array[Long]) = {
    require(a._1.length == b._1.length && a._2.length == b._2.length,
      "count arrays must share nBuckets")
    (Array.tabulate(a._1.length)(i => a._1(i) + b._1(i)),
      Array.tabulate(a._2.length)(i => a._2(i) + b._2(i)))
  }

  /** Raw class counts → centroid weights: add-one smoothing, then the
    * fixed-point share difference on the 10⁻⁹ grid. BigInt intermediate
    * for `(c+1)·S` (the `Dsir.modelFromCounts` overflow discipline): a
    * bucket past ~9.2e9 tokens no longer silently wraps, while below that
    * threshold BigInt and Long agree bit-for-bit, so oracle parity is
    * unaffected.
    */
  def weightsFromCounts(gRaw: Array[Long], badRaw: Array[Long]): Array[Long] = {
    require(gRaw.length == badRaw.length,
      "good and bad count arrays must share nBuckets")
    val g = gRaw.map(_ + 1L) // add-one smoothing
    val bad = badRaw.map(_ + 1L)
    val tg = g.foldLeft(BigInt(0))(_ + _)
    val tb = bad.foldLeft(BigInt(0))(_ + _)
    Array.tabulate(g.length)(i =>
      ((BigInt(g(i)) * Scale / tg) - (BigInt(bad(i)) * Scale / tb)).toLong)
  }

  /** Score every document against trained weights: `(idCol, score,
    * predicted)` — one row per input doc (tokenless docs score 0), long
    * integer scores, `predicted` = score > 0.
    */
  def scoreHashed(docs: DataFrame, idCol: String, textCol: String,
                  weights: Array[Long]): DataFrame = {
    val scored = tokenBuckets(docs.select(col(idCol), col(textCol)),
        textCol, weights.length)
      .select(col(idCol),
        element_at(typedlit(weights.toSeq), col("__b") + 1).as("__w"))
      .groupBy(idCol)
      .agg(sum(col("__w")).as("score"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .withColumn("score", coalesce(col("score"), lit(0L)))
      .withColumn("predicted", col("score") > 0)
  }

  /** WITHIN-document repetition screen — the Gopher repetition filters
    * (Rae et al. 2021, "Scaling Language Models: ...", appendix A1.1;
    * reimplemented the same way by the public Dolma/RedPajama pipelines):
    * a document that keeps repeating itself is boilerplate or generator
    * spam, and the signal is the share of its characters covered by its
    * most frequent short n-gram plus the share covered by ANY long n-gram
    * that occurs more than once. This is the within-doc complement of the
    * corpus-level span dedup ([[Dedup.repeatedSpans]] finds text repeated
    * ACROSS documents; this flags text repeated INSIDE one).
    *
    * Per document (word n-grams over a single-space split):
    *   - `n_tokens`, `n_chars`
    *   - `top{topN}_gram` / `top{topN}_n`: the most frequent topN-gram
    *     (ties broken by the lexicographically LARGEST gram — a total
    *     order any engine replays) and its occurrence count
    *   - `top_char_permille`: floor(1000 · top_n · len(gram) / n_chars)
    *   - `dup_char_permille`: floor(1000 · Σ_{dupN-grams with count ≥ 2}
    *     count · len(gram) / n_chars)
    * Character coverage counts every occurrence without de-overlapping
    * (the common public reimplementation; exact interval union would need
    * a per-doc sweep for a correction that doesn't change the gate), so
    * `dup_char_permille` can exceed 1000 on degenerate inputs — callers
    * threshold, they don't sum. All arithmetic integer (floor-div): the
    * screen replays exactly in any engine.
    *
    * Scale shape: two map-only n-gram expansions (array `transform` over
    * the token array — expansion factor n, no shuffle) each feeding one
    * (doc, gram) aggregate with map-side partials, then a per-doc argmax /
    * sum and two broadcast-size-agnostic equi-joins back on the doc id.
    * Nothing global, nothing quadratic in document length.
    */
  def repetitionScreen(docs: DataFrame, idCol: String, textCol: String,
                       topN: Int = 2, dupN: Int = 5): DataFrame = {
    require(topN >= 1 && dupN >= 1, "n-gram sizes must be >= 1")
    val id = col(idCol)
    val base = docs.select(id, col(textCol).as("__t"))
      .withColumn("__w", split(col("__t"), " "))
      .withColumn("n_tokens", size(col("__w")).cast("long"))
      .withColumn("n_chars", length(col("__t")).cast("long"))

    def gramCounts(n: Int): DataFrame = {
      val joined = (1 to n).map(j => s"element_at(__w, i + ${j - 1})")
        .mkString("concat_ws(' ', ", ", ", ")")
      // guard: sequence(1, 0) DESCENDS in Spark, and ANSI element_at
      // throws on index 0 — a doc shorter than the gram emits no grams
      base
        .select(id, explode(expr(
          s"case when size(__w) >= $n then " +
            s"transform(sequence(1, size(__w) - ${n - 1}), i -> $joined) " +
            "else array() end")).as("gram"))
        .groupBy(id, col("gram"))
        .agg(count(lit(1)).as("n"))
    }

    val top = gramCounts(topN)
      .groupBy(id)
      .agg(max(struct(col("n"), col("gram"))).as("__top"))
      .select(id, col("__top.gram").as(s"top${topN}_gram"),
        col("__top.n").as(s"top${topN}_n"))
    val dup = gramCounts(dupN)
      .groupBy(id)
      .agg(sum(when(col("n") >= 2, col("n") * length(col("gram")))
        .otherwise(0L)).as("__dupchars"))

    base.select(id, col("n_tokens"), col("n_chars"))
      .join(top, Seq(idCol), "left")
      .join(dup, Seq(idCol), "left")
      .select(id, col("n_tokens"), col("n_chars"),
        coalesce(col(s"top${topN}_gram"), lit("")).as(s"top${topN}_gram"),
        coalesce(col(s"top${topN}_n"), lit(0L)).as(s"top${topN}_n"),
        // greatest(…, 1): an empty doc has n_chars = 0 and ANSI div throws
        coalesce(expr(s"(1000 * top${topN}_n * length(top${topN}_gram)) " +
          "div greatest(n_chars, 1)"), lit(0L)).as("top_char_permille"),
        coalesce(expr("(1000 * __dupchars) div greatest(n_chars, 1)"),
          lit(0L)).as("dup_char_permille"))
  }
}
