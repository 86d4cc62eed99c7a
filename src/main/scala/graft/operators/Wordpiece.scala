package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

import graft.functions.TextFunctions

/** WordPiece tokenizer training and encoding (Schuster & Nakajima 2012,
  * "Japanese and Korean voice search"; the likelihood-scored merge loop as
  * popularized by BERT's tokenizer): like BPE, training greedily fuses one
  * adjacent unit pair per round over the corpus word-type table — but the
  * round's winner maximizes `count(pair) / (count(left) · count(right))`
  * (the pairwise likelihood GAIN of a unigram LM under the fusion, up to a
  * corpus constant) instead of BPE's raw pair count, and non-word-initial
  * units carry the `##` continuation prefix so one surface string gets
  * distinct word-initial and word-internal identities.
  *
  * Reference behavior: the aeon query layer ships no tokenizer — this is
  * part of the training-data pipeline pack (builder prompt), sitting beside
  * [[Vocab.trainBpe]] (count-argmax merges) and [[Unigram]] (EM pruning) to
  * complete the three classic subword-training families.
  *
  * Scale shape (same argument as [[Vocab.trainBpeFromCounts]]): training
  * state is the word-TYPE table `(symbol-string, freq)` — bounded by the
  * corpus vocabulary (~10⁷ rows at 100 TB), not the token stream. Each
  * round is (1) a unit-count hash aggregate whose result is ALPHABET-scale
  * (≤ initial alphabet + one new unit per round — a few hundred rows, so
  * the score join broadcasts it), (2) the same adjacent-pair aggregate BPE
  * uses, (3) a 1-row TakeOrderedAndProject argmax, (4) a codegen'd literal
  * `replace` apply. Unlike BPE's working set, fully-merged words are KEPT:
  * their single unit still contributes to `count(left)`/`count(right)`
  * denominators of later rounds.
  *
  * Determinism across engines: the score is a ratio of exact BIGINT counts
  * evaluated as `CAST(p AS DOUBLE) / (CAST(cl AS DOUBLE) · CAST(cr AS
  * DOUBLE))` — multiplication and division are IEEE-754 correctly-rounded
  * in both Spark and any ANSI SQL engine, so identical inputs give
  * bit-identical doubles and an identical argmax ordering (ties break on
  * the pair strings). No libm call (ln/exp) is involved, so there is not
  * even the 1-ulp grid hazard the DSIR micro-nat weights document.
  */
object Wordpiece {

  /** One learned WordPiece merge: at `step`, fusing (`left`, `right`) —
    * `right` always carries the `##` prefix — maximized
    * `pairCount / (leftCount · rightCount)`; the new unit is
    * `left + right.stripPrefix("##")`.
    */
  final case class WpMerge(step: Int, left: String, right: String,
                           pairCount: Long, leftCount: Long, rightCount: Long) {
    def unit: String = left + right.stripPrefix("##")
  }

  /** The `|`-delimited symbolized word-type table (see
    * [[Vocab.trainBpeFromCounts]] for why `|` delimiters make the merge
    * apply a literal replace): word `abc` → `|a||##b||##c|`. All word
    * types are kept — including 1-char words and words that later merge to
    * a single unit — because unit counts (the score denominators) range
    * over every unit occurrence in the corpus.
    */
  private def symbolized(wordCounts: DataFrame, wordCol: String,
                         freqCol: String): DataFrame =
    wordCounts
      .select(col(wordCol).as("__w"), col(freqCol).cast("long").as("__freq"))
      .select(
        concat(lit("|"),
          array_join(expr(
            """transform(sequence(1, length(__w)), i ->
                 CASE WHEN i = 1 THEN substring(__w, 1, 1)
                 ELSE '##' || substring(__w, i, 1) END)"""),
            "||"),
          lit("|")).as("s"),
        col("__freq"))

  /** Corpus unit counts at the current round: every `|…|` cell, weighted by
    * word frequency. Alphabet-scale output (a few hundred rows).
    */
  private def unitCounts(words: DataFrame): DataFrame =
    words
      .select(col("__freq"),
        explode(expr("""split(trim(BOTH '|' FROM s), '\\|\\|')""")).as("u"))
      .groupBy("u").agg(sum(col("__freq")).as("uc"))

  /** The round's argmax: adjacent-pair counts joined to the (broadcast)
    * unit counts, ordered by likelihood score then (left, right).
    * `orderBy.limit(1)` plans as TakeOrderedAndProject.
    */
  private def topPair(words: DataFrame): DataFrame = {
    val units = unitCounts(words)
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
      .join(broadcast(units.select(col("u").as("l"), col("uc").as("cl"))), "l")
      .join(broadcast(units.select(col("u").as("r"), col("uc").as("cr"))), "r")
      .withColumn("score",
        col("c").cast("double") /
          (col("cl").cast("double") * col("cr").cast("double")))
      .orderBy(col("score").desc, col("l"), col("r"))
      .limit(1)
      .select("l", "r", "c", "cl", "cr")
  }

  /** Distributed WordPiece merge-rule training over a corpus. Stops early
    * when no adjacent pair remains. Returns merges in learned order.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
            checkpointer: Dedup.Checkpointer = Dedup.Checkpointer.Local)
      : Seq[WpMerge] =
    trainFromCounts(Vocab.wordCounts(docs, textCol), "word", "freq", nMerges,
      checkpointer)

  /** [[train]] from a persisted/merged word-count table — the restartable
    * path shared with BPE (word counts are plain sums; accumulate with
    * `graft.streaming.StreamingVocab`, train from the aggregate).
    */
  def trainFromCounts(wordCounts: DataFrame, wordCol: String, freqCol: String,
                      nMerges: Int,
                      checkpointer: Dedup.Checkpointer = Dedup.Checkpointer.Local)
      : Seq[WpMerge] = {
    require(nMerges > 0, "nMerges must be positive")
    var cut = checkpointer.cut(symbolized(wordCounts, wordCol, freqCol))
    val merges = scala.collection.mutable.ArrayBuffer.empty[WpMerge]
    try {
      var r = 1
      var drained = false
      while (r <= nMerges && !drained) {
        val top = topPair(cut).collect()
        if (top.isEmpty) drained = true
        else {
          val m = WpMerge(r, top(0).getString(0), top(0).getString(1),
            top(0).getLong(2), top(0).getLong(3), top(0).getLong(4))
          merges += m
          if (r < nMerges) {
            val next = checkpointer.cut(
              cut.select(
                replace(col("s"), lit("|" + m.left + "||" + m.right + "|"),
                  lit("|" + m.unit + "|")).as("s"),
                col("__freq")))
            checkpointer.release(cut)
            cut = next
          }
          r += 1
        }
      }
      merges.toSeq
    } finally checkpointer.release(cut)
  }

  /** The learned merge table as a DataFrame — the persistable model
    * artifact, counts included so the likelihood score is recomputable.
    */
  def mergesDf(spark: SparkSession, merges: Seq[WpMerge]): DataFrame =
    spark.createDataFrame(merges)
      .select(col("step"), col("left").as("merge_left"),
        col("right").as("merge_right"), col("pairCount").as("pair_count"),
        col("leftCount").as("left_count"), col("rightCount").as("right_count"))

  /** The encoding vocabulary a training run induces: the initial alphabet
    * (every word-initial char and every `##`-prefixed char the corpus
    * contains) plus one new unit per merge, in merge order. Driver-side and
    * alphabet-scale, like the merge table itself.
    */
  def vocabulary(wordCounts: DataFrame, wordCol: String,
                 merges: Seq[WpMerge]): Array[String] = {
    val alphabet = wordCounts
      .select(explode(expr(
        s"""transform(sequence(1, length($wordCol)), i ->
              CASE WHEN i = 1 THEN substring($wordCol, 1, 1)
              ELSE '##' || substring($wordCol, i, 1) END)""")).as("u"))
      .distinct().orderBy("u").collect().map(_.getString(0))
    alphabet ++ merges.sortBy(_.step).map(_.unit)
  }

  /** Token emitted for a word the vocabulary cannot segment. */
  val Unk = "[UNK]"

  /** WordPiece ENCODING: greedy longest-match per normalized word — at the
    * word start only non-`##` units match; past it only `##` units match
    * (the `##` is part of the emitted token). A word with ANY unmatchable
    * position collapses to the single [[Unk]] token — WordPiece's
    * whole-word unknown semantics, not a per-char fallback. Output: input
    * columns + `subwords: array<string>` in stream order.
    *
    * `mapPartitions` over a broadcast length-bucketed vocab set (same
    * justification as [[Vocab.encodeGreedy]]: per-word consumption is
    * genuinely imperative; the vocab is KBs). Deterministic: a pure
    * function of (text, vocab).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: Array[String]): DataFrame = {
    require(vocab.nonEmpty, "vocab must not be empty")
    val spark = docs.sparkSession
    val bv = spark.sparkContext.broadcast(vocab.toSet)
    // longest surface form a unit can cover (## is marking, not surface)
    val maxCover = vocab.map(u => u.stripPrefix("##").length).max
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
            val toks = scala.collection.mutable.ArrayBuffer.empty[String]
            var pos = 0
            var failed = false
            while (pos < w.length && !failed) {
              val pre = if (pos == 0) "" else "##"
              var l = math.min(maxCover, w.length - pos)
              while (l > 0 && !v.contains(pre + w.substring(pos, pos + l)))
                l -= 1
              if (l == 0) failed = true
              else { toks += pre + w.substring(pos, pos + l); pos += l }
            }
            if (failed) out += Unk else out ++= toks
          }
          Row(r.get(0), r.getString(1), out.toSeq)
        }
      }, outSchema)
    docs.join(enc.drop(textCol), Seq(idCol))
  }
}
