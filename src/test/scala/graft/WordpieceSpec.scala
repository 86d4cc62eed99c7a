package graft

import org.apache.spark.sql.functions._

import graft.operators.{Vocab, Wordpiece}

/** WordPiece training + encoding: differential against an in-memory
  * brute-force trainer (likelihood score `c(pair)/(c(l)·c(r))`, ties on the
  * pair strings, fully-merged words retained in the denominators), the
  * `##` continuation marking, whole-word [UNK] collapse, and the
  * shard-merge ≡ one-shot training property shared with BPE.
  */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference trainer over normalized word counts. */
  private def bruteTrain(wordCounts: Map[String, Long], nMerges: Int)
      : Seq[(String, String, Long, Long, Long)] = {
    var words = wordCounts.map { case (w, f) =>
      (w.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c }.toVector, f)
    }.toVector
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long, Long, Long)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val uc = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (us, f) =>
        us.foreach(u => uc(u) = uc.getOrElse(u, 0L) + f) }
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (us, f) =>
        us.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1)); pc(k) = pc.getOrElse(k, 0L) + f
        }
      }
      if (pc.isEmpty) done = true
      else {
        val best = pc.toSeq.map { case ((l, rr), c) =>
          (l, rr, c, uc(l), uc(rr),
            c.toDouble / (uc(l).toDouble * uc(rr).toDouble))
        }.minBy { case (l, rr, _, _, _, s) => (-s, l, rr) }
        out += ((best._1, best._2, best._3, best._4, best._5))
        val fused = best._1 + best._2.stripPrefix("##")
        words = words.map { case (us, f) =>
          val next = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < us.length) {
            if (i + 1 < us.length && us(i) == best._1 && us(i + 1) == best._2) {
              next += fused; i += 2
            } else { next += us(i); i += 1 }
          }
          (next.toVector, f)
        }
        r += 1
      }
    }
    out.toSeq
  }

  private val texts = Seq(
    "the cat sat on the mat", "the cats sat", "a cat and a rat sat",
    "mats and rats and cats", "the the the rat")
  private def docs = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def bruteCounts: Map[String, Long] = texts
    .flatMap(_.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").trim
      .split("\\s+")).filter(_.nonEmpty)
    .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("train matches the brute-force likelihood trainer") {
    val got = Wordpiece.train(docs, "text", nMerges = 6)
      .map(m => (m.left, m.right, m.pairCount, m.leftCount, m.rightCount))
    assert(got == bruteTrain(bruteCounts, 6))
  }

  test("fully-merged words keep feeding the denominators") {
    // 'aa' merges to one unit in round 1; its unit count must still back
    // round 2's scores ('aab' pairs (aa, ##b) — cl counts BOTH words)
    val d2 = Seq((0L, "aa aa aa aab aab xy")).toDF("doc_id", "text")
    val merges = Wordpiece.train(d2, "text", nMerges = 2)
    val wc = Map("aa" -> 3L, "aab" -> 2L, "xy" -> 1L)
    assert(merges.map(m => (m.left, m.right, m.pairCount, m.leftCount,
      m.rightCount)) == bruteTrain(wc, 2))
    val round2 = merges(1)
    if (round2.left == "aa") assert(round2.leftCount == 5L) // 3 + 2, not 2
  }

  test("trainFromCounts on merged shards equals one-shot training") {
    val wc = Vocab.wordCounts(docs, "text")
    val shardA = docs.filter($"doc_id" % 2 === 0)
    val shardB = docs.filter($"doc_id" % 2 === 1)
    val merged = Vocab.wordCounts(shardA, "text")
      .unionByName(Vocab.wordCounts(shardB, "text"))
      .groupBy("word").agg(sum("freq").as("freq"))
    val one = Wordpiece.trainFromCounts(wc, "word", "freq", 5)
    val inc = Wordpiece.trainFromCounts(merged, "word", "freq", 5)
    assert(one == inc)
  }

  test("encode: greedy longest match, ## marking, training corpus round-trips") {
    val merges = Wordpiece.train(docs, "text", nMerges = 6)
    val vocab = Wordpiece.vocabulary(Vocab.wordCounts(docs, "text"), "word",
      merges)
    val enc = Wordpiece.encode(docs, "doc_id", "text", vocab)
      .select("doc_id", "subwords").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // no UNK on the training corpus: the alphabet covers every char
    assert(!enc.values.flatten.exists(_ == Wordpiece.Unk))
    // surface round-trip: strip ## and concatenate == normalized text
    texts.zipWithIndex.foreach { case (t, i) =>
      val surface = enc(i.toLong).map(_.stripPrefix("##")).mkString
      assert(surface == t.toLowerCase.replaceAll("[^a-z0-9\\s]", " ")
        .trim.split("\\s+").filter(_.nonEmpty).mkString)
    }
    // greedy: every emitted token is in vocab; continuations carry ##
    enc.values.flatten.foreach(tok => assert(vocab.contains(tok)))
  }

  test("encode: a word with an uncovered char collapses to [UNK] wholly") {
    val merges = Wordpiece.train(docs, "text", nMerges = 4)
    val vocab = Wordpiece.vocabulary(Vocab.wordCounts(docs, "text"), "word",
      merges)
    // 'z' and '9' never occur in the training corpus
    val probe = Seq((0L, "cat catz zcat c9t mat")).toDF("doc_id", "text")
    val enc = Wordpiece.encode(probe, "doc_id", "text", vocab)
      .select("subwords").head().getSeq[String](0)
    // catz fails at 'z' AFTER matching 'cat' → the whole word is [UNK];
    // zcat fails at position 0; c9t mid-word; cat/mat encode fine
    assert(enc.count(_ == Wordpiece.Unk) == 3)
    assert(enc.head != Wordpiece.Unk && enc.last != Wordpiece.Unk)
  }

  test("greedy prefers the longest unit at each position") {
    // vocab has both 'ca' and 'cat': greedy must take 'cat'
    val vocab = Array("c", "a", "t", "s", "##a", "##t", "##s", "ca", "cat")
    val probe = Seq((0L, "cats")).toDF("doc_id", "text")
    val enc = Wordpiece.encode(probe, "doc_id", "text", vocab)
      .select("subwords").head().getSeq[String](0)
    assert(enc == Seq("cat", "##s"))
  }
}
