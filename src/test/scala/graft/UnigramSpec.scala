package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Unigram, Vocab}
import graft.operators.Unigram.UnigramModel

/** Unigram-LM (hard-EM) tokenizer: the Viterbi kernel is pinned against a
  * full segmentation ENUMERATION (words are short, so every segmentation
  * is listable), EM rounds against the coordinate-ascent likelihood
  * guarantee, and pruning/coverage against planted vocabularies.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference: enumerate all segmentations, pick by the tie rule ----

  private def enumerate(w: String, m: Map[String, Long], maxLen: Int)
      : List[(Long, List[String])] =
    if (w.isEmpty) List((0L, Nil))
    else (1 to math.min(maxLen, w.length)).toList.flatMap { l =>
      val t = w.take(l)
      if (!m.contains(t)) Nil
      else enumerate(w.drop(l), m, maxLen).map { case (s, p) =>
        (m(t) + s, t :: p)
      }
    }

  // among max-score paths: prefer the LONGER head token, then the
  // lexicographically smaller one, recursively — the DP's positionwise rule
  private def pathLt(a: List[String], b: List[String]): Boolean = (a, b) match {
    case (Nil, Nil) => false
    case (x :: xs, y :: ys) =>
      if (x.length != y.length) x.length > y.length
      else if (x != y) x < y
      else pathLt(xs, ys)
    case _ => a.nonEmpty // same total length -> same depth; defensive
  }

  private def refSegment(w: String, model: UnigramModel): List[String] = {
    val all = enumerate(w, model.tokens, model.maxLen)
    val best = all.map(_._1).max
    all.filter(_._1 == best).map(_._2)
      .reduceLeft((p, q) => if (pathLt(q, p)) q else p)
  }

  test("viterbiSegment equals full-enumeration argmax on random models") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 30).foreach { _ =>
      val alphabet = "abc"
      // random token set: all chars (coverage) + random 2-4 grams
      val chars = alphabet.map(_.toString)
      val grams = Seq.fill(8)(
        Seq.fill(2 + rnd.nextInt(3))(alphabet(rnd.nextInt(3))).mkString)
      val toks = (chars ++ grams).distinct
        .map(t => t -> -(1L + rnd.nextInt(5000000).toLong)).toMap
      val model = UnigramModel(toks, toks.keys.map(_.length).max)
      (1 to 10).foreach { _ =>
        val w = Seq.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(3))).mkString
        val got = Unigram.viterbiSegment(w, model)
        val want = refSegment(w, model)
        assert(got == want, s"word '$w': $got != $want (model $toks)")
        assert(got.mkString == w)
      }
    }
  }

  private lazy val corpus = {
    val texts = (1 to 40).map { i =>
      if (i % 2 == 0) s"banana bandana band banana split $i"
      else s"tartan tarpit tar pit tartan $i"
    }
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("viterbiCounts equals per-word reference counts weighted by frequency") {
    val model = Unigram.seedModel(corpus, "text", minLen = 2, maxLen = 4,
      topN = 30)
    val wc = Vocab.wordCounts(corpus, "text")
    val got = Unigram.viterbiCounts(wc, "word", "freq", model)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = scala.collection.mutable.Map.empty[String, Long]
    wc.collect().foreach { r =>
      val (w, f) = (r.getString(0), r.getLong(1))
      refSegment(w, model).foreach(t => ref(t) = ref.getOrElse(t, 0L) + f)
    }
    assert(got == ref.toMap)
    // counts merge: sharded word counts yield the same aggregate
    val shard = Unigram.viterbiCounts(wc.filter(length($"word") % 2 === 0),
        "word", "freq", model)
      .unionByName(Unigram.viterbiCounts(
        wc.filter(length($"word") % 2 === 1), "word", "freq", model))
      .groupBy("token").agg(sum($"count").as("count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shard == ref.toMap)
  }

  test("hard-EM rounds: likelihood monotone (grid slack), losers pruned, chars kept") {
    val wc = Vocab.wordCounts(corpus, "text").cache()
    var m = Unigram.seedModel(corpus, "text", minLen = 2, maxLen = 4,
      topN = 30)
    val totalToks = Unigram.viterbiCounts(wc, "word", "freq", m)
      .agg(sum($"count")).head.getLong(0)
    var ll = Unigram.corpusLikelihood(wc, "word", "freq", m)
    (1 to 3).foreach { _ =>
      val next = Unigram.emRound(wc, "word", "freq", m)
      val nll = Unigram.corpusLikelihood(wc, "word", "freq", next)
      // coordinate ascent up to the micro-nat grid: each token weight
      // floors by < 1 micro-nat, so corpus slack is < total path tokens
      assert(nll >= ll - totalToks,
        s"likelihood fell beyond grid slack: $ll -> $nll")
      // coverage never lost; vocabulary never grows under hard EM
      assert(next.tokens.keys.filter(_.length == 1).toSet ==
        m.tokens.keys.filter(_.length == 1).toSet)
      assert(next.tokens.size <= m.tokens.size)
      m = next; ll = nll
    }
    // every surviving multi-char token actually wins Viterbi positions
    val wins = Unigram.viterbiCounts(wc, "word", "freq", m)
      .collect().map(_.getString(0)).toSet
    m.tokens.keys.filter(_.length > 1).foreach(t =>
      assert(wins.contains(t), s"pruned-model token '$t' wins nothing"))
    wc.unpersist(); ()
  }

  test("forwardBackward equals full-enumeration marginals on random models") {
    def lse(xs: Seq[Double]): Double = {
      val hi = xs.max
      hi + math.log(xs.map(x => math.exp(x - hi)).sum)
    }
    val rnd = new scala.util.Random(20260814L)
    (1 to 30).foreach { _ =>
      val alphabet = "abc"
      val chars = alphabet.map(_.toString)
      val grams = Seq.fill(8)(
        Seq.fill(2 + rnd.nextInt(3))(alphabet(rnd.nextInt(3))).mkString)
      val toks = (chars ++ grams).distinct
        .map(t => t -> -(1L + rnd.nextInt(5000000).toLong)).toMap
      val model = UnigramModel(toks, toks.keys.map(_.length).max)
      (1 to 10).foreach { _ =>
        val w = Seq.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(3))).mkString
        val (ec, z) = Unigram.forwardBackward(w, model)
        val paths = enumerate(w, model.tokens, model.maxLen)
        val zRef = lse(paths.map(_._1.toDouble / 1e6))
        assert(math.abs(z - zRef) < 1e-9, s"'$w': logZ $z != $zRef")
        val ecRef = scala.collection.mutable.Map.empty[String, Double]
        paths.foreach { case (s, p) =>
          val w8 = math.exp(s.toDouble / 1e6 - zRef)
          p.foreach(t => ecRef(t) = ecRef.getOrElse(t, 0.0) + w8)
        }
        assert(ecRef.keySet == ec.keySet, s"'$w': token sets differ")
        ecRef.foreach { case (t, c) =>
          assert(math.abs(ec(t) - c) < 1e-9, s"'$w' token '$t': ${ec(t)} != $c")
        }
        // expected segment count is a convex mix of path lengths
        val total = ec.values.sum
        val lens = paths.map(_._2.size)
        assert(total >= lens.min - 1e-9 && total <= lens.max + 1e-9)
      }
    }
  }

  test("soft EM: marginal likelihood monotone and never below the seed's") {
    val wc = Vocab.wordCounts(corpus, "text").cache()
    val seed = Unigram.seedModel(corpus, "text", minLen = 2, maxLen = 4,
      topN = 30)
    val totalToks = Unigram.viterbiCounts(wc, "word", "freq", seed)
      .agg(sum($"count")).head.getLong(0)
    // grid flooring loses < 1 micro-nat per token occurrence per round
    val slack = totalToks * 1e-6 + 1e-6
    var m = seed
    var ll = Unigram.marginalLikelihood(wc, "word", "freq", m)
    (1 to 3).foreach { _ =>
      val next = Unigram.emRoundSoft(wc, "word", "freq", m)
      val nll = Unigram.marginalLikelihood(wc, "word", "freq", next)
      assert(nll >= ll - slack,
        s"marginal likelihood fell beyond grid slack: $ll -> $nll")
      assert(next.tokens.keys.filter(_.length == 1).toSet ==
        m.tokens.keys.filter(_.length == 1).toSet) // coverage kept
      assert(next.tokens.size <= m.tokens.size)
      m = next; ll = nll
    }
    // the EM guarantee proper: one soft round can never DECREASE the
    // marginal below the seed's. (soft-vs-hard is deliberately NOT pinned:
    // hard EM prunes Viterbi losers outright, concentrating mass, while
    // soft EM keeps every token's posterior mass — after one round either
    // model can hold the higher marginal, and on this corpus hard's does)
    val soft1 = Unigram.emRoundSoft(wc, "word", "freq", seed)
    assert(Unigram.marginalLikelihood(wc, "word", "freq", soft1) >=
      Unigram.marginalLikelihood(wc, "word", "freq", seed) - slack)
    wc.unpersist(); ()
  }

  test("soft EM agrees with hard EM in the confident limit") {
    // a model where every word has one dominant segmentation: multi-char
    // tokens near log-prob 0, chars at -12 nats — posterior mass on the
    // Viterbi path is ~1, so expected counts converge to Viterbi counts
    val toks = Map(
      "ban" -> -100000L, "ana" -> -120000L, "tar" -> -110000L,
      "a" -> -12000000L, "b" -> -12000000L, "n" -> -12000000L,
      "t" -> -12000000L, "r" -> -12000000L)
    val model = UnigramModel(toks, 3)
    val wc = Seq(("banana", 7L), ("tartar", 3L), ("ban", 2L))
      .toDF("word", "freq")
    val hardCounts = Unigram.viterbiCounts(wc, "word", "freq", model)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    wc.collect().foreach { r =>
      val (ec, _) = Unigram.forwardBackward(r.getString(0), model)
      ec.foreach { case (t, c) =>
        val hardWins = if (Unigram.viterbiSegment(r.getString(0), model)
          .count(_ == t) > 0) 1.0 else 0.0
        val _ = hardWins // per-word proximity asserted via the totals below
        assert(c >= -1e-6 && c <= r.getString(0).length + 1e-6)
      }
    }
    val soft = Unigram.emRoundSoft(wc, "word", "freq", model)
    val hard = Unigram.emRound(wc, "word", "freq", model)
    // same survivors (dominated chars floor at 1 in both), and the soft
    // expected counts reproduce the hard Viterbi counts to < 0.1%
    assert(soft.tokens.keySet == hard.tokens.keySet)
    hardCounts.foreach { case (t, c) =>
      val bm = spark.sparkContext.broadcast(model)
      val softCount = wc.collect().map { r =>
        Unigram.forwardBackward(r.getString(0), bm.value)._1
          .getOrElse(t, 0.0) * r.getLong(1)
      }.sum
      assert(math.abs(softCount - c) < 0.001 * c + 1e-6,
        s"token '$t': soft $softCount vs hard $c")
    }
    // and the renormalized grid log-probs agree within the grid + posterior
    // leakage tolerance
    hard.tokens.foreach { case (t, lp) =>
      assert(math.abs(soft.tokens(t) - lp) <= 100L,
        s"token '$t': soft ${soft.tokens(t)} vs hard $lp micro-nats")
    }
  }

  test("encode round-trips the normalized text and matches the kernel") {
    val model = Unigram.train(corpus, "text", rounds = 2, minLen = 2,
      maxLen = 4, topN = 30)
    val got = Unigram.encode(corpus, "doc_id", "text", model)
      .orderBy("doc_id").select("text", "subwords").collect()
      .map(r => (r.getString(0), r.getSeq[String](1).toList))
    got.foreach { case (text, subwords) =>
      val words = TextFunctions.normalizeForDedupJvm(text)
        .split(" ").filter(_.nonEmpty).toList
      assert(subwords == words.flatMap(w => Unigram.viterbiSegment(w, model)))
      assert(subwords.mkString == words.mkString)
    }
  }
}
