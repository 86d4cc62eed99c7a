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
    require(nBuckets > 0, "nBuckets must be positive")
    val counts = tokenBuckets(
        docs.select(col(labelCol).cast("boolean").as("__y"), col(textCol)),
        textCol, nBuckets)
      .groupBy("__b")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("g"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("bad"))
      .collect()
    val g = Array.fill(nBuckets)(1L) // add-one smoothing
    val bad = Array.fill(nBuckets)(1L)
    counts.foreach { r =>
      val i = r.getInt(0)
      g(i) += r.getLong(1)
      bad(i) += r.getLong(2)
    }
    val tg = g.sum
    val tb = bad.sum
    Array.tabulate(nBuckets)(i => g(i) * Scale / tg - bad(i) * Scale / tb)
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
}
