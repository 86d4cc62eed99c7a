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
