package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

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

  /** Greedy longest-match subword encoding (the WordPiece/SentencePiece
    * APPLY step): each normalized word is consumed left to right, at every
    * position taking the LONGEST vocab token that matches (ties cannot
    * occur — same start, same length ⇒ same string), falling back to the
    * single character (the "unknown" unit) when nothing matches. Output:
    * input columns + `subwords: array<string>` in stream order.
    *
    * Deterministic: the encoding is a pure function of (text, vocab).
    * Implemented as `mapPartitions` over a broadcast length-bucketed vocab
    * set — genuinely imperative per-word consumption (SURVEY §7.4's
    * last-resort clause): an `aggregate()` HOF could fold the same state
    * but evaluates interpreted per character, and the vocab probe order
    * (longest first) would re-allocate per step. Cost is O(len·maxLen)
    * membership probes per word against an in-memory hash set; the vocab
    * broadcast is topN strings (KBs).
    */
  def encodeGreedy(docs: DataFrame, idCol: String, textCol: String,
                   vocab: Array[String]): DataFrame = {
    require(vocab.nonEmpty, "vocab must not be empty")
    val spark = docs.sparkSession
    val bv = spark.sparkContext.broadcast(vocab.toSet)
    val maxLen = vocab.map(_.length).max
    val inSchema = docs.select(col(idCol), col(textCol)).schema
    val outSchema = StructType(inSchema.fields :+
      StructField("subwords", ArrayType(StringType, containsNull = false)))
    val enc = spark.createDataFrame(
      docs.select(col(idCol), col(textCol)).rdd.mapPartitions { rows =>
        val v = bv.value
        rows.map { r =>
          val text = Option(r.getString(1)).getOrElse("")
          val words = TextFunctions.normalizeForDedupJvm(text)
            .split(" ").filter(_.nonEmpty)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          words.foreach { w =>
            var pos = 0
            while (pos < w.length) {
              var l = math.min(maxLen, w.length - pos)
              while (l > 1 && !v.contains(w.substring(pos, pos + l))) l -= 1
              val tok =
                if (v.contains(w.substring(pos, pos + l)))
                  w.substring(pos, pos + l)
                else w.substring(pos, pos + 1) // unknown: single char
              out += tok
              pos += tok.length
            }
          }
          Row(r.get(0), r.getString(1), out.toSeq)
        }
      }, outSchema)
    docs.join(enc.drop(textCol), Seq(idCol))
  }
}
