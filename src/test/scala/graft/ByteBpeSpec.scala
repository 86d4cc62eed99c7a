package graft

import scala.collection.mutable

import graft.operators.Vocab
import graft.operators.Vocab.BpeMerge

/** Byte-level BPE (the GPT-2/tiktoken byte-fallback family): differential
  * against a driver-side reference over RAW whitespace words symbolized as
  * UTF-8 hex bytes, plus the properties the char-level family cannot have —
  * total coverage of ANY input (no `[UNK]`), merges learned ACROSS
  * multi-byte character boundaries, and case/punctuation carried as bytes.
  * The oracled corpus (q181/q182) is pure ASCII, so this spec carries the
  * multi-byte evidence.
  */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  private def hexSyms(w: String): List[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02X").toList

  private def refMergePass(syms: List[String], a: String, b: String)
      : List[String] = {
    val out = mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refWords(texts: Seq[String]): Seq[String] =
    texts.flatMap(_.split("\\s+").filter(_.nonEmpty))

  private def refTrain(texts: Seq[String], nMerges: Int): Seq[BpeMerge] = {
    var wt: Map[String, (List[String], Long)] = refWords(texts)
      .filter(_.getBytes(java.nio.charset.StandardCharsets.UTF_8).length >= 2)
      .groupBy(identity)
      .map { case (w, ws) => w -> (hexSyms(w), ws.size.toLong) }
    val merges = mutable.ArrayBuffer.empty[BpeMerge]
    var r = 1
    var drained = false
    while (r <= nMerges && !drained) {
      val counts = mutable.Map.empty[(String, String), Long]
      wt.values.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) drained = true
      else {
        val ((a, b), c) = counts.toSeq
          .sortBy { case ((l, rr), cc) => (-cc, l, rr) }.head
        merges += BpeMerge(r, a, b, c)
        wt = wt.map { case (w, (syms, f)) => w -> (refMergePass(syms, a, b), f) }
        r += 1
      }
    }
    merges.toSeq
  }

  private def refEncode(text: String, merges: Seq[BpeMerge]): List[String] =
    refWords(Seq(text)).toList.flatMap { w =>
      var syms = hexSyms(w)
      merges.sortBy(_.step).foreach { m =>
        if (syms.length > 1) syms = refMergePass(syms, m.left, m.right)
      }
      syms
    }

  private def unhex(tok: String): Array[Byte] =
    tok.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  test("trainBpeBytes matches reference on cased/punctuated text") {
    // case and punctuation must participate as bytes — the char family's
    // normalizer would have erased "Low!"/"low" distinctions entirely
    val texts = Seq("Low low low! Low!", "low! low Low", "don't don't")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Vocab.trainBpeBytes(docs, "text", nMerges = 10)
    assert(got == refTrain(texts, 10))
    // at least one learned symbol includes a non-alnum byte (21 = '!')
    assert(got.exists(m => (m.left + m.right).grouped(2).contains("21")))
  }

  test("merges are learned across multi-byte character boundaries") {
    // é = C3 A9: the first merge on this corpus must fuse the intra-char
    // byte pair — exactly what byte-level BPE does and char-level cannot
    val texts = Seq("ééé ééé", "ééé")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Vocab.trainBpeBytes(docs, "text", nMerges = 3)
    assert(got == refTrain(texts, 3))
    assert(got.head.left == "C3" && got.head.right == "A9", got.head)
  }

  test("byte-fallback: unseen scripts encode with no [UNK] and round-trip exactly") {
    val train = Seq("low lower lowest", "low lower")
    val trainDf = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Vocab.trainBpeBytes(trainDf, "text", nMerges = 6)
    // encode text the training corpus never saw: accents, CJK, emoji
    val texts = train ++ Seq("café naïve", "日本語 テスト", "mix 🙂 done")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Vocab.encodeBpeBytes(docs, "doc_id", "text", merges)
      .orderBy("doc_id").select("doc_id", "text", "subwords").collect()
      .map(r => (r.getString(1), r.getSeq[String](2).toList))
    got.foreach { case (text, subwords) =>
      assert(subwords == refEncode(text, merges))
      // every token is decodable hex; concatenated bytes reconstruct the
      // raw (un-normalized) words exactly — total coverage, no [UNK]
      val bytes = subwords.flatMap(t => unhex(t).toSeq)
      val expected = text.split("\\s+").filter(_.nonEmpty).mkString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq
      assert(bytes == expected, s"round-trip failed for '$text'")
    }
  }

  test("on a lowercase-ASCII corpus, byte merges are the hex image of char merges") {
    // the two families coincide where normalization is the identity and
    // every char is one byte — a strong cross-family consistency check
    val texts = Seq("low lower lowest aaaa", "low lower xy yx", "aaaa xy yx")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val charM = Vocab.trainBpe(docs, "text", nMerges = 8)
    val byteM = Vocab.trainBpeBytes(docs, "text", nMerges = 8)
    def hexImage(s: String): String = hexSyms(s).mkString
    assert(byteM == charM.map(m =>
      m.copy(left = hexImage(m.left), right = hexImage(m.right))))
  }
}
