package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

import graft.functions.TextFunctions

/** Unigram-LM tokenizer training (Kudo 2018, arXiv:1804.10959 §3) — the
  * SentencePiece sibling of [[Vocab.trainBpe]], as HARD (Viterbi) EM:
  *
  *  1. seed vocabulary = the corpus's most frequent substrings
  *     ([[Vocab.topSubstrings]]) plus ALL single characters (coverage — a
  *     Viterbi lattice must never dead-end), probabilities from their
  *     substring counts;
  *  2. E-step: each word's max-probability segmentation under the current
  *     model (Viterbi over the token lattice), token counts summed over
  *     the corpus weighted by word frequency;
  *  3. M-step: counts renormalize into the next model; tokens that won no
  *     Viterbi position are pruned (single characters survive at a
  *     count-1 floor for coverage) — the paper's likelihood-loss prune
  *     approximated by its hard-EM limit.
  *
  * Soft EM (forward-backward expectations) refines probabilities the
  * paper's way, but its expected counts are order-sensitive float sums —
  * not engine-replayable. Hard EM keeps every quantity on the integer
  * grids this engine oracles everywhere: token log-probs are micro-nats
  * (`floor(10⁶·ln(c/total))`, the DSIR discipline), path scores exact
  * long sums, E-step counts exact integers. The classic coordinate-ascent
  * argument gives monotone non-decreasing corpus Viterbi likelihood
  * (modulo grid flooring), spec-asserted.
  *
  * Scale shape: training state is the word-type table ([[Vocab.wordCounts]],
  * corpus-vocabulary-sized); one E-step = one `mapPartitions` pass over it
  * with the broadcast model (KBs) + one hash aggregate on token — the
  * model itself is catalog-scale driver state like IVF centers. The
  * Viterbi kernel is O(len·maxTokenLen) per word — genuinely imperative
  * per-position consumption (SURVEY §7.4's last-resort clause, same as
  * [[Vocab.encodeGreedy]]).
  */
object Unigram {

  /** micro-nat log-prob grid (10⁻⁶ nats). */
  val LogScale: Long = 1000000L

  /** token → micro-nat log-prob (≤ 0), with the longest token length
    * cached for the lattice walk. */
  final case class UnigramModel(tokens: Map[String, Long], maxLen: Int)

  private def gridLogProbs(counts: Seq[(String, Long)]): UnigramModel = {
    val total = counts.foldLeft(BigInt(0))(_ + _._2)
    val toks = counts.map { case (t, c) =>
      t -> math.floor(LogScale.toDouble *
        StrictMath.log(c.toDouble / total.toDouble)).toLong
    }.toMap
    UnigramModel(toks, toks.keys.map(_.length).max)
  }

  /** Seed model: [[Vocab.topSubstrings]]`(minLen..maxLen, topN)` plus ALL
    * single characters with their occurrence counts (chars are what
    * guarantee every word segments). Probabilities =
    * `floor(10⁶·ln(count/total))` over the combined count mass.
    */
  def seedModel(docs: DataFrame, textCol: String,
                minLen: Int = 2, maxLen: Int = 5,
                topN: Int = 200): UnigramModel =
    seedModelFromCounts(Vocab.wordCounts(docs, textCol), "word", "freq",
      minLen, maxLen, topN)

  /** [[seedModel]] from a persisted/merged word-count table — the
    * restartable path shared with BPE/WordPiece ([[emRound]] already takes
    * counts, so with this the WHOLE unigram training loop runs off a
    * `graft.streaming.StreamingVocab` drained store without re-tokenizing
    * the corpus). Identical to [[seedModel]] by construction (substring
    * occurrences = word-type occurrences weighted by frequency).
    */
  def seedModelFromCounts(wordCounts: DataFrame, wordCol: String,
                          freqCol: String,
                          minLen: Int = 2, maxLen: Int = 5,
                          topN: Int = 200): UnigramModel = {
    require(minLen >= 2, "seed minLen below 2 would duplicate the char layer")
    val seeds = Vocab.topSubstringsFromCounts(wordCounts, wordCol, freqCol,
        minLen, maxLen, topN)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val chars = Vocab.topSubstringsFromCounts(wordCounts, wordCol, freqCol,
        1, 1, Int.MaxValue)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    gridLogProbs((seeds ++ chars).toSeq)
  }

  /** The Viterbi segmentation of one normalized word: max total micro-nat
    * score, ties broken toward the LONGER token then the lexicographically
    * smaller one at each position (right-to-left DP, so the rule is
    * positionwise-deterministic and SQL-replayable).
    */
  def viterbiSegment(w: String, model: UnigramModel): List[String] = {
    val n = w.length
    val best = Array.fill(n + 2)(Long.MinValue)
    val choice = new Array[String](n + 1)
    best(n + 1) = 0L
    var pos = n
    while (pos >= 1) {
      var bs = Long.MinValue
      var bt: String = null
      var l = 1
      val lMax = math.min(model.maxLen, n - pos + 1)
      while (l <= lMax) {
        val t = w.substring(pos - 1, pos - 1 + l)
        model.tokens.get(t) match {
          case Some(wt) if best(pos + l) != Long.MinValue =>
            val s = wt + best(pos + l)
            if (s > bs || (s == bs && (l > bt.length ||
                (l == bt.length && t.compareTo(bt) < 0)))) {
              bs = s; bt = t
            }
          case _ => ()
        }
        l += 1
      }
      require(bt != null,
        s"Viterbi dead end in '$w' at $pos — model lost character coverage")
      best(pos) = bs
      choice(pos) = bt
      pos -= 1
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var p = 1
    while (p <= n) { out += choice(p); p += choice(p).length }
    out.toList
  }

  /** E-step: `(token, count)` — how many Viterbi positions each model
    * token wins over the corpus, weighted by word-type frequency. One
    * mapPartitions pass over the word-type table + one token aggregate;
    * counts are exact longs, so shards/waves merge by plain summation.
    */
  def viterbiCounts(wordCounts: DataFrame, wordCol: String, freqCol: String,
                    model: UnigramModel): DataFrame = {
    val spark = wordCounts.sparkSession
    val bm = spark.sparkContext.broadcast(model)
    val outSchema = StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("count", org.apache.spark.sql.types.LongType,
        nullable = false)))
    spark.createDataFrame(
      wordCounts
        .select(col(wordCol).cast("string"), col(freqCol).cast("long"))
        .filter(length(col(wordCol)) > 0)
        .rdd.flatMap { r =>
          val m = bm.value
          viterbiSegment(r.getString(0), m).map(t => Row(t, r.getLong(1)))
        }, outSchema)
      .groupBy("token")
      .agg(sum(col("count")).as("count"))
  }

  /** One hard-EM round: E-step counts → renormalized model. Tokens with
    * zero Viterbi wins are PRUNED; single characters survive at a count-1
    * floor (coverage). */
  def emRound(wordCounts: DataFrame, wordCol: String, freqCol: String,
              model: UnigramModel): UnigramModel = {
    val won = viterbiCounts(wordCounts, wordCol, freqCol, model)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val next = model.tokens.keys.flatMap { t =>
      val c = won.getOrElse(t, 0L)
      if (c > 0L) Some(t -> c)
      else if (t.length == 1) Some(t -> 1L) // char floor: coverage
      else None
    }.toSeq
    gridLogProbs(next)
  }

  // ---------------------------------------------------------------- soft EM

  /** Forward-backward over one word's segmentation lattice: the posterior-
    * EXPECTED count of every model token across ALL segmentations (weighted
    * by their probability), plus the word's marginal log-likelihood
    * `log Z` in nats. The soft-EM E-step kernel (Kudo 2018 §3.2 — the
    * reference algorithm [[emRound]]'s Viterbi pass approximates).
    *
    * ENGINE-PRIVATE FLOAT PATH (the [[Similarity.trainCenters]] discipline):
    * log-sum-exp is IEEE double arithmetic, so results are property-pinned
    * (UnigramSpec: brute enumeration parity, monotone marginal likelihood,
    * hard-EM agreement in the confident limit), not DuckDB-oracled — the
    * oracled training path remains [[emRound]].
    *
    * Same lattice as [[viterbiSegment]]: arcs are model tokens up to
    * `maxLen`; a word that cannot be covered is a loud error.
    */
  def forwardBackward(w: String, model: UnigramModel)
      : (collection.Map[String, Double], Double) = {
    val n = w.length
    val neg = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == neg) b else if (b == neg) a
      else {
        val hi = math.max(a, b)
        hi + math.log1p(math.exp(math.min(a, b) - hi))
      }
    val alpha = Array.fill(n + 1)(neg)
    alpha(0) = 0.0
    var i = 0
    while (i < n) {
      if (alpha(i) != neg) {
        var l = 1
        val lMax = math.min(model.maxLen, n - i)
        while (l <= lMax) {
          model.tokens.get(w.substring(i, i + l)) match {
            case Some(wt) =>
              alpha(i + l) = lse(alpha(i + l), alpha(i) + wt.toDouble / LogScale)
            case None => ()
          }
          l += 1
        }
      }
      i += 1
    }
    val z = alpha(n)
    require(z != neg,
      s"lattice dead end in '$w' — model lost character coverage")
    val beta = Array.fill(n + 1)(neg)
    beta(n) = 0.0
    var j = n - 1
    while (j >= 0) {
      var l = 1
      val lMax = math.min(model.maxLen, n - j)
      while (l <= lMax) {
        model.tokens.get(w.substring(j, j + l)) match {
          case Some(wt) if beta(j + l) != neg =>
            beta(j) = lse(beta(j), wt.toDouble / LogScale + beta(j + l))
          case _ => ()
        }
        l += 1
      }
      j -= 1
    }
    val ec = scala.collection.mutable.HashMap.empty[String, Double]
    i = 0
    while (i < n) {
      if (alpha(i) != neg) {
        var l = 1
        val lMax = math.min(model.maxLen, n - i)
        while (l <= lMax) {
          val t = w.substring(i, i + l)
          model.tokens.get(t) match {
            case Some(wt) if beta(i + l) != neg =>
              val p = math.exp(alpha(i) + wt.toDouble / LogScale +
                beta(i + l) - z)
              if (p > 0.0) ec.update(t, ec.getOrElse(t, 0.0) + p)
            case _ => ()
          }
          l += 1
        }
      }
      i += 1
    }
    (ec, z)
  }

  private def gridLogProbsDouble(counts: Seq[(String, Double)]): UnigramModel = {
    val total = counts.iterator.map(_._2).sum
    val toks = counts.map { case (t, c) =>
      t -> math.floor(LogScale.toDouble * StrictMath.log(c / total)).toLong
    }.toMap
    UnigramModel(toks, toks.keys.map(_.length).max)
  }

  /** One SOFT-EM round — the full Kudo 2018 §3 update: forward-backward
    * expected counts over every word type (weighted by frequency) →
    * renormalized model. Tokens with negligible expected mass are pruned;
    * single characters survive at a count-1 floor, as in [[emRound]].
    *
    * Scale shape is [[emRound]]'s exactly: one `mapPartitions` pass over
    * the word-type table with the broadcast model (the kernel is
    * O(len·maxLen) per word like Viterbi, twice), one `reduceByKey` on
    * token, a vocabulary-sized driver collect for the catalog-scale
    * M-step. Property-pinned, not oracled (float E-step; see
    * [[forwardBackward]]).
    */
  def emRoundSoft(wordCounts: DataFrame, wordCol: String, freqCol: String,
                  model: UnigramModel,
                  pruneBelow: Double = 1e-9): UnigramModel = {
    val spark = wordCounts.sparkSession
    val bm = spark.sparkContext.broadcast(model)
    val won = wordCounts
      .select(col(wordCol).cast("string"), col(freqCol).cast("long"))
      .filter(length(col(wordCol)) > 0)
      .rdd.mapPartitions { rows =>
        val m = bm.value
        rows.flatMap { r =>
          val f = r.getLong(1).toDouble
          forwardBackward(r.getString(0), m)._1.iterator
            .map { case (t, c) => (t, c * f) }
        }
      }
      .reduceByKey(_ + _).collect().toMap
    val next = model.tokens.keys.flatMap { t =>
      val c = won.getOrElse(t, 0.0)
      if (c > pruneBelow) Some(t -> c)
      else if (t.length == 1) Some(t -> 1.0) // char floor: coverage
      else None
    }.toSeq
    gridLogProbsDouble(next)
  }

  /** Corpus MARGINAL log-likelihood in nats under `model` — `Σ freq·log Z`
    * over word types, the quantity soft EM coordinate-ascends (the Viterbi
    * [[corpusLikelihood]] is the hard-EM counterpart). Float path,
    * property-pinned. */
  def marginalLikelihood(wordCounts: DataFrame, wordCol: String,
                         freqCol: String, model: UnigramModel): Double = {
    val spark = wordCounts.sparkSession
    val bm = spark.sparkContext.broadcast(model)
    wordCounts
      .select(col(wordCol).cast("string"), col(freqCol).cast("long"))
      .filter(length(col(wordCol)) > 0)
      .rdd.map { r =>
        forwardBackward(r.getString(0), bm.value)._2 * r.getLong(1)
      }.fold(0.0)(_ + _)
  }

  /** Seed + `rounds` SOFT-EM rounds — [[train]]'s forward-backward twin. */
  def trainSoft(docs: DataFrame, textCol: String, rounds: Int,
                minLen: Int = 2, maxLen: Int = 5,
                topN: Int = 200): UnigramModel = {
    require(rounds >= 0, "rounds must be non-negative")
    val wc = Vocab.wordCounts(docs, textCol).cache()
    try {
      var m = seedModelFromCounts(wc, "word", "freq", minLen, maxLen, topN)
      (1 to rounds).foreach(_ => m = emRoundSoft(wc, "word", "freq", m))
      m
    } finally { wc.unpersist(); () }
  }

  /** Seed + `rounds` hard-EM rounds over the corpus's word-type table. */
  def train(docs: DataFrame, textCol: String, rounds: Int,
            minLen: Int = 2, maxLen: Int = 5, topN: Int = 200): UnigramModel = {
    require(rounds >= 0, "rounds must be non-negative")
    val wc = Vocab.wordCounts(docs, textCol).cache()
    try {
      var m = seedModel(docs, textCol, minLen, maxLen, topN)
      (1 to rounds).foreach(_ => m = emRound(wc, "word", "freq", m))
      m
    } finally { wc.unpersist(); () }
  }

  /** Corpus Viterbi log-likelihood in micro-nats under `model` — the
    * quantity hard EM coordinate-ascends (spec-asserted monotone). */
  def corpusLikelihood(wordCounts: DataFrame, wordCol: String,
                       freqCol: String, model: UnigramModel): Long = {
    val spark = wordCounts.sparkSession
    val bm = spark.sparkContext.broadcast(model)
    wordCounts
      .select(col(wordCol).cast("string"), col(freqCol).cast("long"))
      .filter(length(col(wordCol)) > 0)
      .rdd.map { r =>
        val m = bm.value
        viterbiSegment(r.getString(0), m)
          .map(m.tokens).sum * r.getLong(1)
      }.fold(0L)(_ + _)
  }

  /** Viterbi ENCODING: input columns + `subwords: array<string>` — the
    * unigram-LM apply step under a trained model, stream order, same
    * surface as [[Vocab.encodeGreedy]]/[[Vocab.encodeBpe]].
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             model: UnigramModel): DataFrame = {
    val spark = docs.sparkSession
    val bm = spark.sparkContext.broadcast(model)
    val inSchema = docs.select(col(idCol), col(textCol)).schema
    val outSchema = StructType(inSchema.fields :+
      StructField("subwords", ArrayType(StringType, containsNull = false)))
    val enc = spark.createDataFrame(
      docs.select(col(idCol), col(textCol)).rdd.mapPartitions { rows =>
        val m = bm.value
        rows.map { r =>
          val text = Option(r.getString(1)).getOrElse("")
          val words = TextFunctions.normalizeForDedupJvm(text)
            .split(" ").filter(_.nonEmpty)
          Row(r.get(0), r.getString(1),
            words.toSeq.flatMap(w => viterbiSegment(w, m)))
        }
      }, outSchema)
    docs.join(enc.drop(textCol), Seq(idCol))
  }
}
