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
    *
    * Delegates to [[topSubstringsFromCounts]] over [[wordCounts]] — a
    * substring occurs once per word INSTANCE, so counting word types
    * weighted by frequency is the same number by construction, and the
    * drained-store path cannot drift from this one.
    */
  def topSubstrings(docs: DataFrame, textCol: String,
                    minLen: Int = 2, maxLen: Int = 6,
                    topN: Int = 1000): DataFrame =
    topSubstringsFromCounts(wordCounts(docs, textCol), "word", "freq",
      minLen, maxLen, topN)

  /** [[topSubstrings]] from a persisted/merged word-count table — the
    * restartable path shared with BPE/WordPiece training (accumulate with
    * `graft.streaming.StreamingVocab`, seed from the aggregate). Each word
    * type contributes its substring multiset `freq` times.
    */
  def topSubstringsFromCounts(wordCounts: DataFrame, wordCol: String,
                              freqCol: String,
                              minLen: Int = 2, maxLen: Int = 6,
                              topN: Int = 1000): DataFrame = {
    require(minLen >= 1 && maxLen >= minLen, "need 1 <= minLen <= maxLen")
    require(topN > 0, "topN must be positive")
    wordCounts
      .select(col(wordCol).cast("string").as("__w"),
        col(freqCol).cast("long").as("__f"))
      .filter(length(col("__w")) > 0)
      // NB sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — words
      // shorter than l must be guarded explicitly
      .select(col("__f"), explode(expr(
        s"""flatten(transform(sequence($minLen, $maxLen), l ->
              CASE WHEN length(__w) >= l THEN
                transform(sequence(1, length(__w) - l + 1), p ->
                  substring(__w, p, l))
              ELSE array() END))""")).as("token"))
      .groupBy("token")
      .agg(sum(col("__f")).as("count"))
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

  /** One learned BPE merge rule: at `step`, the adjacent symbol pair
    * (`left`, `right`) had the highest corpus frequency (`pairCount`,
    * ties broken on the pair strings) and was fused into `left+right`.
    */
  final case class BpeMerge(step: Int, left: String, right: String,
                            pairCount: Long)

  /** `|`-delimited symbol-string representation used throughout BPE
    * training: the word `abc` symbolized as chars is `"|a||b||c|"` — every
    * token wrapped in `|…|`. Tokens are normalized `[a-z0-9]+` (see
    * [[TextFunctions.normalizeForDedup]]) so `|` can never occur inside
    * one, which makes the per-round merge apply a LITERAL string replace:
    * fusing pair (a, b) is `replace(s, "|a||b|", "|ab|")`. Both Spark's
    * `StringReplace` and ANSI SQL `replace` scan left-to-right,
    * non-overlapping, continuing AFTER each replacement — exactly the
    * regex-substitution semantics of the original BPE implementation
    * (Sennrich 2016, arXiv:1508.07909 §3.2), so the engine and a SQL
    * oracle replay the training bit-for-bit by construction.
    */
  private def symbolized(wordCounts: DataFrame, wordCol: String,
                         freqCol: String): DataFrame =
    wordCounts
      .select(col(wordCol).as("__w"), col(freqCol).cast("long").as("__freq"))
      .filter(length(col("__w")) >= 2) // 1-char words never form pairs
      .select(
        concat(lit("|"),
          array_join(expr(
            "transform(sequence(1, length(__w)), i -> substring(__w, i, 1))"),
            "||"),
          lit("|")).as("s"),
        col("__freq"))

  /** `(word, freq)` — the corpus's normalized word-type table, BPE
    * training's entire input state: counts are plain sums, so shards or
    * waves merge by `groupBy(word).sum(freq)` and training from the
    * merged table equals the one-shot pass (spec-pinned; the
    * `trainLabeledCounts` discipline with the corpus vocabulary as the
    * bucket space). Persist it with [[wordCountsBy]] +
    * `graft.streaming.StreamingVocab` for incremental accumulation.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(filter(
        split(TextFunctions.normalizeForDedup(col(textCol)), " "),
        w => length(w) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Per-group `(groupCol, word, freq)` rows — the fully distributed form
    * of [[wordCounts]] for partitioned or incremental training; the
    * streaming drain keys groups by source FILE so replays land
    * idempotently.
    */
  def wordCountsBy(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs
      .select(col(groupCol), explode(filter(
        split(TextFunctions.normalizeForDedup(col(textCol)), " "),
        w => length(w) > 0)).as("word"))
      .groupBy(col(groupCol), col("word"))
      .agg(count(lit(1)).as("freq"))

  /** The round's argmax: adjacent-pair corpus counts over the symbolized
    * word-type table, highest count first, ties on (left, right) so the
    * winner is deterministic and engine-replayable. `orderBy.limit(1)`
    * plans as TakeOrderedAndProject — per-task frontiers, no global sort.
    */
  private def topPair(words: DataFrame): DataFrame =
    words
      .select(col("__freq"),
        expr("""split(trim(BOTH '|' FROM s), '\\|\\|')""").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("__freq"), explode(expr(
        """transform(sequence(1, size(t) - 1),
             i -> struct(element_at(t, i) AS l, element_at(t, i + 1) AS r))"""))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("__freq")).as("c"))
      .orderBy(col("c").desc, col("l"), col("r"))
      .limit(1)

  /** Distributed BPE merge-rule TRAINING (Sennrich 2016, arXiv:1508.07909
    * §3.2) — the iterative half of tokenizer training that
    * [[topSubstrings]] (unigram seeding) deliberately stops short of.
    *
    * Scale shape: training state is the WORD-TYPE table `(symbol-string,
    * freq)` — distinct normalized words weighted by corpus multiplicity,
    * which plateaus at the corpus vocabulary (~10⁷ rows at 100 TB), not the
    * token stream. Each round is (1) one map + hash-aggregate shuffle for
    * pair counts with map-side partials, (2) a 1-row TakeOrderedAndProject
    * argmax collect, (3) a codegen'd literal `replace` applying the merge
    * in-plan. Rounds materialize through the [[Dedup.Checkpointer]] (the
    * superseded round is released immediately), and words that become a
    * single symbol drop out of the working set — the table only shrinks.
    * The merge table itself is catalog-scale (`nMerges` rows, ~30k in
    * production tokenizers) and lives on the driver like IVF centers or
    * classifier weights.
    *
    * Stops early when no adjacent pair remains. Returns merges in learned
    * order; feed to [[encodeBpe]] / [[mergesDf]].
    */
  def trainBpe(docs: DataFrame, textCol: String, nMerges: Int,
               checkpointer: Dedup.Checkpointer = Dedup.Checkpointer.Local)
      : Seq[BpeMerge] =
    trainBpeFromCounts(wordCounts(docs, textCol), "word", "freq", nMerges,
      checkpointer)

  /** [[trainBpe]] from a PERSISTED/merged word-count table ([[wordCounts]]
    * schema) — the restartable path: accumulate counts incrementally
    * (`StreamingVocab.trainDrain`), then train the merge table from the
    * aggregate whenever a new tokenizer epoch is needed, without
    * re-tokenizing the corpus.
    */
  def trainBpeFromCounts(wordCounts: DataFrame, wordCol: String,
                         freqCol: String, nMerges: Int,
                         checkpointer: Dedup.Checkpointer = Dedup.Checkpointer.Local)
      : Seq[BpeMerge] = {
    require(nMerges > 0, "nMerges must be positive")
    trainMerges(symbolized(wordCounts, wordCol, freqCol), nMerges,
      checkpointer)
  }

  /** The shared merge-training loop over an already-symbolized
    * `(s, __freq)` table — char symbols ([[trainBpeFromCounts]]) and
    * hex-byte symbols ([[trainBpeBytesFromCounts]]) train identically
    * because the `|a||b|` framing is representation-agnostic.
    */
  private def trainMerges(initial: DataFrame, nMerges: Int,
                          checkpointer: Dedup.Checkpointer): Seq[BpeMerge] = {
    var cut = checkpointer.cut(initial)
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    try {
      var r = 1
      var drained = false
      while (r <= nMerges && !drained) {
        val top = topPair(cut).collect()
        if (top.isEmpty) drained = true
        else {
          val (a, b, c) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += BpeMerge(r, a, b, c)
          if (r < nMerges) { // the final round's apply feeds nothing
            val next = checkpointer.cut(
              cut.select(
                replace(col("s"), lit("|" + a + "||" + b + "|"),
                  lit("|" + a + b + "|")).as("s"),
                col("__freq"))
              .filter(col("s").contains("||"))) // fully-merged words retire
            checkpointer.release(cut)
            cut = next
          }
          r += 1
        }
      }
      merges.toSeq
    } finally checkpointer.release(cut)
  }

  /** The learned merge table as a DataFrame `(step, merge_left,
    * merge_right, pair_count)` — the persistable model artifact.
    */
  def mergesDf(spark: org.apache.spark.sql.SparkSession,
               merges: Seq[BpeMerge]): DataFrame =
    spark.createDataFrame(merges)
      .select(col("step"), col("left").as("merge_left"),
        col("right").as("merge_right"), col("pairCount").as("pair_count"))

  /** BPE ENCODING: symbolize each normalized word to characters, then apply
    * the learned merges IN ORDER, each as a leftmost non-overlapping pass
    * that never rescans a token it just produced — the exact semantics
    * training used (see [[symbolized]]), so encoding the training corpus
    * reproduces training's final state. Output: input columns + `subwords:
    * array<string>` in stream order.
    *
    * `mapPartitions` over the broadcast merge table (same justification as
    * [[encodeGreedy]]: per-word consumption is genuinely imperative, and
    * the table is catalog-scale KBs). Cost is O(nMerges · len) per word.
    * The standard rank-map optimization (merge the lowest-rank adjacent
    * pair present, repeat — subword-nmt/HF-style) would drop this to
    * O(len²) probes, but it is NOT exactly equivalent to in-order
    * application: when two distinct rules produce equal strings (e.g.
    * "abc" via both (ab, c) and (a, bc)), a later rule can manufacture
    * the symbol an earlier rule's pair mentions, and min-rank iteration
    * revisits that earlier rule where the sequential pass (and therefore
    * the training fixpoint and the SQL oracle) does not. Sequential is
    * the semantics here — one pass per rule, in learned order.
    */
  def encodeBpe(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[BpeMerge]): DataFrame = {
    val spark = docs.sparkSession
    val ordered = merges.sortBy(_.step).map(m => (m.left, m.right)).toArray
    val bm = spark.sparkContext.broadcast(ordered)
    val inSchema = docs.select(col(idCol), col(textCol)).schema
    val outSchema = StructType(inSchema.fields :+
      StructField("subwords", ArrayType(StringType, containsNull = false)))
    val enc = spark.createDataFrame(
      docs.select(col(idCol), col(textCol)).rdd.mapPartitions { rows =>
        val rules = bm.value
        rows.map { r =>
          val text = Option(r.getString(1)).getOrElse("")
          val words = TextFunctions.normalizeForDedupJvm(text)
            .split(" ").filter(_.nonEmpty)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          words.foreach { w =>
            var syms = Array.tabulate(w.length)(i => w.substring(i, i + 1))
            var k = 0
            while (k < rules.length && syms.length > 1) {
              val (a, b) = rules(k)
              val next = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                  next += a + b; i += 2
                } else { next += syms(i); i += 1 }
              }
              syms = next.toArray
              k += 1
            }
            out ++= syms
          }
          Row(r.get(0), r.getString(1), out.toSeq)
        }
      }, outSchema)
    docs.join(enc.drop(textCol), Seq(idCol))
  }

  // ---- byte-level BPE (GPT-2/tiktoken byte-fallback family) ----

  /** Whitespace-only word counts over the RAW text — byte-level BPE's
    * pre-tokenization (Radford 2019 §2.2 discipline): case, digits, and
    * punctuation are carried as bytes; nothing is normalized away. The
    * char-level family's [[wordCounts]] lower-cases and strips — this one
    * must not, or the byte vocabulary could never learn cased/punctuated
    * merges.
    */
  def wordCountsRaw(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(filter(split(col(textCol), "\\s+"),
        w => length(w) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** UTF-8 BYTE symbolization: each word becomes its bytes as 2-hex-digit
    * symbols in the same `|AA||BB|` framing [[symbolized]] uses, so the
    * whole merge machinery (pair counts, literal replace, retirement)
    * applies verbatim — a merged symbol is the concatenated hex of its
    * byte span, and decoding any token is one `unhex`. Hex keeps symbols
    * printable and the training SQL-replayable (`hex()` is uppercase
    * 2-digits-per-byte in both engines). Words of one byte never form
    * pairs and are dropped, mirroring [[symbolized]]'s length filter.
    */
  private def symbolizedHexBytes(wordCounts: DataFrame, wordCol: String,
                                 freqCol: String): DataFrame =
    wordCounts
      .select(col(wordCol).as("__w"), col(freqCol).cast("long").as("__freq"))
      .filter(expr("octet_length(__w)") >= 2)
      .select(
        concat(lit("|"),
          array_join(expr(
            """transform(sequence(1, octet_length(__w)),
                 i -> substring(hex(__w), 2*i-1, 2))"""), "||"),
          lit("|")).as("s"),
        col("__freq"))

  /** BYTE-LEVEL BPE training (Radford 2019 "Language Models are
    * Unsupervised Multitask Learners" §2.2; the GPT-2/tiktoken family):
    * UTF-8 bytes are the base symbols, so the 256-entry base vocabulary
    * covers EVERY input and no `[UNK]` can ever appear — the byte-fallback
    * property the char-level [[trainBpe]] lacks. Merges are learned over
    * byte pairs with the identical round shape (one pair-count shuffle +
    * a 1-row argmax + an in-plan literal replace per round; word-type
    * table state, Checkpointer-cut).
    */
  def trainBpeBytes(docs: DataFrame, textCol: String, nMerges: Int,
                    checkpointer: Dedup.Checkpointer = Dedup.Checkpointer.Local)
      : Seq[BpeMerge] =
    trainBpeBytesFromCounts(wordCountsRaw(docs, textCol), "word", "freq",
      nMerges, checkpointer)

  /** [[trainBpeBytes]] from a persisted/merged RAW word-count table — the
    * same restartable discipline as [[trainBpeFromCounts]].
    */
  def trainBpeBytesFromCounts(wordCounts: DataFrame, wordCol: String,
                              freqCol: String, nMerges: Int,
                              checkpointer: Dedup.Checkpointer = Dedup.Checkpointer.Local)
      : Seq[BpeMerge] = {
    require(nMerges > 0, "nMerges must be positive")
    trainMerges(symbolizedHexBytes(wordCounts, wordCol, freqCol), nMerges,
      checkpointer)
  }

  /** Byte-level BPE ENCODING: whitespace pre-tokenize the RAW text, map
    * each word to its UTF-8 bytes as hex symbols, apply the learned merges
    * sequentially (identical pass semantics to [[encodeBpe]] — see the
    * rank-map caveat there). Output subwords are hex strings over the
    * token's byte span (`unhex` decodes); total coverage by construction —
    * any byte of any script falls back to its base symbol, never `[UNK]`.
    */
  def encodeBpeBytes(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[BpeMerge]): DataFrame = {
    val spark = docs.sparkSession
    val ordered = merges.sortBy(_.step).map(m => (m.left, m.right)).toArray
    val bm = spark.sparkContext.broadcast(ordered)
    val inSchema = docs.select(col(idCol), col(textCol)).schema
    val outSchema = StructType(inSchema.fields :+
      StructField("subwords", ArrayType(StringType, containsNull = false)))
    val enc = spark.createDataFrame(
      docs.select(col(idCol), col(textCol)).rdd.mapPartitions { rows =>
        val rules = bm.value
        val hexDigits = "0123456789ABCDEF"
        rows.map { r =>
          val text = Option(r.getString(1)).getOrElse("")
          val words = text.split("\\s+").filter(_.nonEmpty)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          words.foreach { w =>
            val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            var syms = Array.tabulate(bytes.length) { i =>
              val b = bytes(i) & 0xff
              s"${hexDigits(b >> 4)}${hexDigits(b & 0xf)}"
            }
            var k = 0
            while (k < rules.length && syms.length > 1) {
              val (a, b) = rules(k)
              val next = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                  next += a + b; i += 2
                } else { next += syms(i); i += 1 }
              }
              syms = next.toArray
              k += 1
            }
            out ++= syms
          }
          Row(r.get(0), r.getString(1), out.toSeq)
        }
      }, outSchema)
    docs.join(enc.drop(textCol), Seq(idCol))
  }
}
