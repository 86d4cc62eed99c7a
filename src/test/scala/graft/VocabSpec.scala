package graft

import org.apache.spark.sql.functions._

import graft.operators.Vocab

/** Subword seed-vocabulary induction: differential against a brute-force
  * in-memory count, plus the short-word guard (Spark's `sequence(1, 0)` is
  * DESCENDING `[1, 0]`, not empty — an unguarded expansion fabricates
  * substrings at position 0 for words shorter than the window).
  */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  private def brute(texts: Seq[String], minLen: Int, maxLen: Int)
      : Map[String, Long] = {
    val words = texts.flatMap(_.toLowerCase
      .replaceAll("[^a-z0-9\\s]", " ").trim.split("\\s+")).filter(_.nonEmpty)
    words.flatMap { w =>
      for {
        l <- minLen to maxLen
        p <- 0 to w.length - l
      } yield w.substring(p, p + l)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("topSubstrings matches brute force, incl. words shorter than minLen") {
    // "ab" is shorter than maxLen (would trip the descending-sequence trap),
    // "x" shorter than minLen (contributes nothing)
    val texts = Seq("banana bandana ab", "banana x ab", "Ban!ana")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = Vocab.topSubstrings(docs, "text", minLen = 2, maxLen = 4,
        topN = 1000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == brute(texts, 2, 4))
    assert(!got.contains("x") && !got.contains("b")) // nothing below minLen
  }

  test("topSubstringsFromCounts over sharded counts equals the one-shot scan") {
    // the drained-store path: word counts accumulated across waves (plain
    // sums) must seed the identical substring table — freq weighting, not
    // per-instance explosion
    val texts = Seq("banana bandana ab", "banana x ab", "Ban!ana")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val oneShot = Vocab.topSubstrings(docs, "text", minLen = 2, maxLen = 4,
        topN = 1000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // shard the word-count table in two waves and re-merge by summing
    val wc = Vocab.wordCounts(docs, "text")
    val merged = wc.filter($"freq" % 2 === 0)
      .union(wc.filter($"freq" % 2 =!= 0))
      .groupBy("word").agg(org.apache.spark.sql.functions.sum("freq").as("freq"))
    val fromCounts = Vocab.topSubstringsFromCounts(merged, "word", "freq",
        minLen = 2, maxLen = 4, topN = 1000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromCounts == oneShot)
    assert(fromCounts == brute(texts, 2, 4))
  }

  test("encodeGreedy: longest match wins, unknown falls back to chars, round-trips") {
    val docs = Seq(
      (1L, "banana band"),
      (2L, "Qx!"),      // q and x not in vocab → single-char unknowns
      (3L, "")          // empty → empty encoding
    ).toDF("doc_id", "text")
    val vocab = Array("ban", "ana", "na", "an", "band")
    val got = Vocab.encodeGreedy(docs, "doc_id", "text", vocab)
      .orderBy("doc_id")
      .select("doc_id", "subwords")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toMap
    // "banana": ban + ana (longest at each step); "band" whole
    assert(got(1L) == List("ban", "ana", "band"))
    assert(got(2L) == List("q", "x"))
    assert(got(3L) == List.empty)
    // concatenating subwords reconstructs the normalized words exactly
    val joined = got(1L).mkString
    assert(joined == "bananaband")
  }

  test("encodeGreedy parity with a naive reference over random words") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    def word() = Array.fill(1 + rnd.nextInt(12))(
      alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = (1 to 60).map(i => (i.toLong, Seq.fill(1 + rnd.nextInt(6))(
      word()).mkString(" "))).toDF("doc_id", "text")
    val vocab = Array("ab", "abc", "bcd", "cd", "aa", "dd", "abcd")
    def naive(w: String): List[String] = {
      val maxLen = vocab.map(_.length).max
      var pos = 0
      val out = scala.collection.mutable.ListBuffer.empty[String]
      while (pos < w.length) {
        val l = (math.min(maxLen, w.length - pos) to 1 by -1)
          .find(k => vocab.contains(w.substring(pos, pos + k)))
        val tok = l.map(k => w.substring(pos, pos + k))
          .getOrElse(w.substring(pos, pos + 1))
        out += tok; pos += tok.length
      }
      out.toList
    }
    val got = Vocab.encodeGreedy(docs, "doc_id", "text", vocab)
      .select("doc_id", "text", "subwords")
      .collect()
    got.foreach { r =>
      val want = r.getString(1).split(" ").filter(_.nonEmpty)
        .flatMap(naive).toList
      assert(r.getSeq[String](2).toList == want,
        s"doc ${r.getLong(0)} diverged")
    }
  }

  test("topN cap, deterministic tie order, top-k physical plan") {
    val docs = Seq((1L, "aa bb cc dd ee aa bb")).toDF("id", "text")
    val top = Vocab.topSubstrings(docs, "text", minLen = 2, maxLen = 2,
      topN = 3)
    val rows = top.collect().map(r => (r.getString(0), r.getLong(1)))
    // aa/bb count 2; the third slot goes to 'cc' by token order among the 1s
    assert(rows.toSeq == Seq(("aa", 2L), ("bb", 2L), ("cc", 1L)))
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k:\n$plan")
  }
}
