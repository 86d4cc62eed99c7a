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
