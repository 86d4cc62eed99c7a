package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Subword seed-vocabulary induction — the SentencePiece/unigram-LM
  * SEEDING step (Kudo 2018, arXiv:1804.10959 §3.2: the seed vocabulary is
  * the most frequent substrings of the corpus) and the distributed-heavy
  * half of tokenizer training: counting candidate units over the whole
  * corpus. (The subsequent EM prune loop operates on the seed table —
  * catalog-scale driver work, out of the engine's scope by the same
  * argument as IVF center training.)
  *
  * Scale shape: one corpus pass — explode normalized words (multiplicity
  * kept), expand each word's substrings of length `[minLen, maxLen]`
  * in-plan (array HOFs over one short word at a time, never a per-seed
  * re-scan), one hash-partitioned count aggregate with map-side partials,
  * then `orderBy(count).limit(topN)` ⇒ TakeOrderedAndProject per-task
  * frontiers. The candidate stream is ≤ `maxLen`× the token stream; the
  * aggregate's cardinality is the corpus's distinct-substring vocabulary,
  * which plateaus far below the stream size on natural text.
  */
object Vocab {

  /** `(token, count)` for the `topN` most frequent substrings (ties break
    * on the token string, so the table is deterministic and
    * engine-replayable). Words shorter than `minLen` contribute nothing.
    */
  def topSubstrings(docs: DataFrame, textCol: String,
                    minLen: Int = 2, maxLen: Int = 6,
                    topN: Int = 1000): DataFrame = {
    require(minLen >= 1 && maxLen >= minLen, "need 1 <= minLen <= maxLen")
    require(topN > 0, "topN must be positive")
    docs
      .select(explode(filter(
        split(TextFunctions.normalizeForDedup(col(textCol)), " "),
        w => length(w) > 0)).as("__w"))
      // NB sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — words
      // shorter than l must be guarded explicitly
      .select(explode(expr(
        s"""flatten(transform(sequence($minLen, $maxLen), l ->
              CASE WHEN length(__w) >= l THEN
                transform(sequence(1, length(__w) - l + 1), p ->
                  substring(__w, p, l))
              ELSE array() END))""")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("token"))
      .limit(topN)
  }
}
