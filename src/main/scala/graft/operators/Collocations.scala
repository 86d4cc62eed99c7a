package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus collocation extraction — pointwise mutual information over
  * adjacent word pairs (Church & Hanks 1990), the classic phrase-mining
  * primitive a training-data pipeline uses to find multi-word units worth
  * protecting from tokenizer splits.
  *
  * Scale shape: ONE corpus pass builds both count tables in-plan —
  * adjacent pairs come straight off each document's word array (the
  * [[Vocab]] `topPair` transform: `struct(ws[i], ws[i+1])` over a
  * sequence, NO per-doc window shuffle), unigrams off the same explode.
  * Both aggregates are vocabulary-scale with map-side partials; the
  * bigram→unigram score join shuffles on the word (vocabulary plateaus on
  * natural text — this is a vocab×vocab-scale join, never corpus-scale).
  * Top-N plans as TakeOrderedAndProject.
  *
  * Determinism: `pmi_micro = floor(10⁶ · ln((c_ab·U·U)/(B·c_a·c_b)))` —
  * exact BIGINT counts into one IEEE expression with a single micro-
  * snapped `ln` (the DSIR grid discipline; c·U·U can exceed 2⁵³ at corpus
  * scale, but both engines round the double product identically, so the
  * grid value still agrees).
  */
object Collocations {

  /** Top-`topN` bigram collocations by PMI: `(w1, w2, pair_count,
    * pmi_micro)`, pairs below `minCount` dropped (singleton pairs score
    * spuriously high PMI), ties on the pair strings.
    */
  def pmiBigrams(docs: DataFrame, textCol: String,
                 minCount: Long = 5L, topN: Int = 50,
                 checkpointer: Dedup.Checkpointer = Dedup.Checkpointer.Local)
      : DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(topN > 0, "topN must be positive")
    val ws = docs.select(filter(
      split(TextFunctions.normalizeForDedup(col(textCol)), " "),
      w => length(w) > 0).as("ws"))
    // cut both count tables: uni feeds the total AND both score joins, bi
    // the total AND the scored pairs — uncut, each consumer re-runs the
    // corpus tokenize (the q149 exchange-reuse lesson); the cuts are
    // vocabulary-scale
    val uni = checkpointer.cut(ws.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")))
    val bi = checkpointer.cut(ws.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(ws) - 1),
             i -> struct(element_at(ws, i) AS w1,
                         element_at(ws, i + 1) AS w2))""")).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("pair_count")))
    val totals = uni.agg(sum("c").as("__u"))
      .crossJoin(bi.agg(sum("pair_count").as("__b")))
    bi.filter(col("pair_count") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("__ca")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("__cb")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi_micro",
        floor(lit(1e6) * log(
          (col("pair_count").cast("double") * col("__u").cast("double") *
            col("__u").cast("double")) /
          (col("__b").cast("double") * col("__ca").cast("double") *
            col("__cb").cast("double")))).cast("long"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(topN)
      .select("w1", "w2", "pair_count", "pmi_micro")
  }

  /** Windowed (skip-gram) PMI — [[pmiBigrams]] generalized to ORDERED
    * pairs `(ws[i], ws[j])` with `i < j ≤ i+window` (the word2vec-style
    * co-occurrence statistic; window=1 degenerates to adjacent bigrams).
    * Long-range collocations ("either … or", split phrasal verbs) that
    * adjacency misses score here.
    *
    * Scale shape: identical to [[pmiBigrams]] — pairs come off each doc's
    * word array IN PLACE via a nested transform+flatten (window·|tokens|
    * rows, linear, no per-doc window shuffle), then the same
    * vocabulary-scale count joins and single micro-snapped ln. The pair
    * TABLE is larger by ≤ window× — the only cost of the generalization.
    */
  def pmiSkipgrams(docs: DataFrame, textCol: String, window: Int,
                   minCount: Long = 5L, topN: Int = 50,
                   checkpointer: Dedup.Checkpointer = Dedup.Checkpointer.Local)
      : DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(minCount >= 1, "minCount must be >= 1")
    require(topN > 0, "topN must be positive")
    val ws = docs.select(filter(
      split(TextFunctions.normalizeForDedup(col(textCol)), " "),
      w => length(w) > 0).as("ws"))
    val uni = checkpointer.cut(ws.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")))
    val bi = checkpointer.cut(ws.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        s"""flatten(transform(sequence(1, size(ws) - 1),
              i -> transform(sequence(i + 1, least(i + $window, size(ws))),
                j -> struct(element_at(ws, i) AS w1,
                            element_at(ws, j) AS w2))))""")).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("pair_count")))
    val totals = uni.agg(sum("c").as("__u"))
      .crossJoin(bi.agg(sum("pair_count").as("__b")))
    bi.filter(col("pair_count") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("__ca")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("__cb")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi_micro",
        floor(lit(1e6) * log(
          (col("pair_count").cast("double") * col("__u").cast("double") *
            col("__u").cast("double")) /
          (col("__b").cast("double") * col("__ca").cast("double") *
            col("__cb").cast("double")))).cast("long"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(topN)
      .select("w1", "w2", "pair_count", "pmi_micro")
  }
}
