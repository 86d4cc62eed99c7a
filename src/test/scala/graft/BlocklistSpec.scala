package graft

import org.apache.spark.sql.functions._

import graft.operators.Blocklist
import graft.expressions.AhoCorasick
import graft.sources.Tables

/** Aho–Corasick blocklist matching: equality against a brute-force padded
  * position scan (the oracle's form), overlap counting, whole-word
  * boundaries, nested/suffix dictionaries, and the gate-feature columns.
  */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def norm(t: String): String =
    graft.functions.TextFunctions.normalizeForDedupJvm(t)

  /** Brute reference: overlap-inclusive whole-word counts via position scan
    * over the padded normalized text — independent mechanics (no automaton).
    */
  private def brute(text: String, terms: Seq[String]): Map[String, Int] = {
    val x = " " + norm(text) + " "
    terms.map(norm).filter(_.nonEmpty).distinct.map { t =>
      val p = " " + t + " "
      t -> (0 to x.length - p.length).count(i => x.regionMatches(i, p, 0, p.length))
    }.filter(_._2 > 0).toMap
  }

  private val terms = Seq(
    "batch batch", "slow join", "window window", "fast key order",
    "the", "customer data group", "quantum flux capacitor")

  test("phraseHits equals the brute position scan on the real corpus") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val got = Blocklist.phraseHits(docs, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = docs.collect().flatMap { r =>
      brute(r.getString(1), terms).map { case (t, n) => (r.getLong(0), t) -> n.toLong }
    }.toMap
    assert(got == want)
    assert(got.nonEmpty, "fixture has no hits — corpus/terms drifted")
    // the absent term must appear nowhere
    assert(!got.keys.exists(_._2 == "quantum flux capacitor"))
  }

  test("overlapping occurrences all count; boundaries are whole-word") {
    val docs = Seq(
      (1L, "batch batch batch"),         // "batch batch" twice (overlap)
      (2L, "a window window window b"),  // "window window" twice
      (3L, "thermal theory then"),       // no whole-word "the"
      (4L, "the theory of the the"),     // "the" three times
      (5L, "Slow, JOIN!  extra"),        // normalization reaches the match
      (6L, ""), (7L, "   ")
    ).toDF("doc_id", "text")
    val got = Blocklist.phraseHits(docs, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (1L, "batch batch") -> 2L,
      (2L, "window window") -> 2L,
      (4L, "the") -> 3L,
      (5L, "slow join") -> 1L))
  }

  test("nested and suffix terms report independently (dict-suffix links)") {
    val dict = Seq("b c", "a b c", "c", "a b c d")
    val counts = AhoCorasick.build(dict.toArray).hitCounts("a b c d c")
    assert(dict.zip(counts.toSeq).toMap ==
      Map("b c" -> 1, "a b c" -> 1, "c" -> 2, "a b c d" -> 1))
  }

  test("flag adds map-only gate features consistent with phraseHits") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val flagged = Blocklist.flag(docs, "text", terms)
    assert(flagged.count() == docs.count()) // every row kept
    val byDoc = Blocklist.phraseHits(docs, "doc_id", "text", terms)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("t"), sum("n_hits").as("h"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    flagged.select("doc_id", "n_blocked_terms", "n_blocked_hits").collect()
      .foreach { r =>
        val want = byDoc.getOrElse(r.getLong(0), (0L, 0L))
        assert((r.getLong(1), r.getLong(2)) == want, s"doc ${r.getLong(0)}")
      }
    // no shuffle: the flag plan must be a single map-only stage
    val plan = flagged.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"flag shuffled:\n$plan")
  }

  test("normalization-colliding and empty terms fail loudly") {
    intercept[IllegalArgumentException] {
      Blocklist.normalizeTerms(Seq("Slow Join", "slow,join"))
    }
    intercept[IllegalArgumentException] { Blocklist.normalizeTerms(Seq("!!!")) }
  }

  /** Independent scrub reference: position-scan intervals, merge, rebuild. */
  private def bruteScrub(text: String, terms: Seq[String], mask: String)
      : String = {
    val x = norm(text)
    val px = " " + x + " "
    val spans = (for {
      t <- terms.map(norm).filter(_.nonEmpty).distinct
      p = " " + t + " "
      i <- 0 to px.length - p.length if px.regionMatches(i, p, 0, p.length)
    } yield (i, i + p.length - 2)).sortBy(_._1) // term chars in x coords
    if (spans.isEmpty) return x
    val merged = spans.tail.foldLeft(List(spans.head)) {
      case (acc @ ((s0, e0) :: rest), (s, e)) =>
        if (s <= e0) (s0, math.max(e0, e)) :: rest else (s, e) :: acc
      case (acc, se) => se :: acc
    }.reverse
    val sb = new StringBuilder
    var pos = 0
    merged.foreach { case (s, e) =>
      sb.append(x.substring(pos, s)).append(mask); pos = e
    }
    sb.append(x.substring(pos)).toString
  }

  test("scrub equals the brute interval rebuild; zero hits remain; idempotent") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Blocklist.scrubbed(col("text"), terms, "xxx").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val raw = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    raw.foreach { case (id, t) =>
      assert(got(id) == bruteScrub(t, terms, "xxx"), s"doc $id")
    }
    // the scrub output is normalized (mask is normalized-alphabet), so it
    // can feed phraseHits directly: nothing may remain, and re-scrubbing
    // must be a no-op
    val scrubbedDf = docs.select(col("doc_id"),
      Blocklist.scrubbed(col("text"), terms, "xxx").as("text"))
    assert(Blocklist.phraseHits(scrubbedDf, "doc_id", "text", terms).isEmpty)
    val twice = scrubbedDf.select(col("doc_id"),
        Blocklist.scrubbed(col("text"), terms, "xxx").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice == got)
  }

  test("scrub merges overlapping and abutting spans; clean docs unchanged") {
    val docs = Seq(
      (1L, "batch batch batch"),        // two overlapping matches -> ONE span
      (2L, "slow join the end"),        // adjacent matches: separate spans
      (3L, "clean document here"),
      (4L, "the")                       // whole text is one span
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Blocklist.scrubbed(col("text"), terms, "X").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "X")
    assert(got(2L) == "X X end") // the separating space survives
    assert(got(3L) == "clean document here")
    assert(got(4L) == "X")
  }

  test("randomized parity: automaton == brute scan on generated corpora") {
    val rng = new scala.util.Random(4242)
    val vocab = Vector("aa", "ab", "b", "ba", "c")
    def phrase(n: Int) = Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    for (round <- 1 to 20) {
      val dict = (1 to 6).map(_ => phrase(1 + rng.nextInt(3))).distinct
      val texts = (1 to 30).map(i => (i.toLong, phrase(rng.nextInt(25))))
      val got = Blocklist.phraseHits(texts.toDF("doc_id", "text"),
          "doc_id", "text", dict)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = texts.flatMap { case (id, t) =>
        brute(t, dict).map { case (term, n) => (id, term) -> n.toLong }
      }.toMap
      assert(got == want, s"round $round dict=$dict")
    }
  }
}
