package graft

import graft.operators.Dedup

/** Exact all-pairs Jaccard via prefix filtering: equality against the
  * brute-force all-pairs scan (the pruning must lose NOTHING), boundary
  * thresholds, and the integer gate.
  */
class PrefixFilterSpec extends SparkSpec {
  import spark.implicits._

  private def norm(t: String): Set[String] =
    t.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").trim
      .split("\\s+").filter(_.nonEmpty).toSet

  private def brute(texts: Seq[(Long, String)], pct: Int)
      : Set[(Long, Long, Long, Long)] = {
    val sets = texts.map { case (id, t) => id -> norm(t) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * 100L >= pct.toLong * uni
    } yield (a, b, inter, uni)).toSet
  }

  private def run(texts: Seq[(Long, String)], pct: Int)
      : Set[(Long, Long, Long, Long)] =
    Dedup.prefixFilterJaccard(texts.toDF("doc_id", "text"), "doc_id", "text",
        thresholdPct = pct)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  private val texts: Seq[(Long, String)] = Seq(
    0L -> "the quick brown fox jumps over the lazy dog",
    1L -> "the quick brown fox jumps over a lazy dog",   // near-dup of 0
    2L -> "the quick brown fox jumps over the lazy dog", // exact dup of 0
    3L -> "lazy dog sleeps",
    4L -> "completely different words entirely here",
    5L -> "words entirely different completely here",    // exact set-dup of 4
    6L -> "",
    7L -> "quick brown")

  test("prefix-filtered pairs equal the brute-force all-pairs scan") {
    for (pct <- Seq(30, 50, 60, 80, 100))
      assert(run(texts, pct) == brute(texts, pct), s"pct=$pct")
  }

  test("boundary: a pair at exactly the threshold is kept") {
    // sets {a,b,c} and {a,b,d}: inter=2, union=4 → J = 0.5 exactly
    val t = Seq(0L -> "a b c", 1L -> "a b d")
    assert(run(t, 50) == Set((0L, 1L, 2L, 4L)))
    assert(run(t, 51) == Set.empty)
  }

  test("shingle units (n=3) replay the brute shingle-set scan") {
    def shingleSet(t: String): Set[String] = {
      val ws = t.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").trim
        .split("\\s+").filter(_.nonEmpty)
      ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val bruteSh = (for {
      (a, sa) <- texts.map { case (i, t) => i -> shingleSet(t) }
        .filter(_._2.nonEmpty)
      (b, sb) <- texts.map { case (i, t) => i -> shingleSet(t) }
        .filter(_._2.nonEmpty)
      if a < b
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * 100L >= 60L * uni
    } yield (a, b, inter, uni)).toSet
    val got = Dedup.prefixFilterJaccard(texts.toDF("doc_id", "text"),
        "doc_id", "text", thresholdPct = 60, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == bruteSh)
    assert(got.nonEmpty) // docs 0/1/2 share shingles — fixture has teeth
  }

  test("containmentJoin: word units match brute containment; big docs still hit") {
    // doc 10 CONTAINS all of query 0's words but is 4x larger: Jaccard is
    // tiny, containment is 100%
    val corpus = Seq(
      10L -> "alpha beta gamma delta e1 e2 e3 e4 e5 e6 e7 e8",
      11L -> "alpha beta other words here now",
      12L -> "nothing relevant at all")
    val qs = Seq(100L -> "alpha beta gamma delta", 101L -> "missing words")
    val got = Dedup.containmentJoin(corpus.toDF("doc_id", "text"), "doc_id",
        "text", qs.toDF("qid", "qtext"), "qid", "qtext",
        thresholdPct = 50, n = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = (for {
      (q, qt) <- qs; (d, dt) <- corpus
      sq = norm(qt); sd = norm(dt)
      inter = (sq & sd).size.toLong
      if inter * 100L >= 50L * sq.size.toLong
    } yield (q, d, inter, sq.size.toLong)).toSet
    assert(got == want)
    assert(got.contains((100L, 10L, 4L, 4L))) // full containment, low Jaccard
    assert(got.contains((100L, 11L, 2L, 4L))) // exactly at the 50% boundary
    assert(got.contains((101L, 11L, 1L, 2L))) // 'words' alone reaches 50%
  }

  test("containmentJoin shingle units: planted leaked prefix is found") {
    val corpus = texts
    val qs = Seq(200L -> "the quick brown fox jumps")
    val got = Dedup.containmentJoin(corpus.toDF("doc_id", "text"), "doc_id",
        "text", qs.toDF("qid", "qtext"), "qid", "qtext",
        thresholdPct = 100, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every doc containing all 3 shingles of the query: docs 0, 1, 2
    assert(got == Set((200L, 0L), (200L, 1L), (200L, 2L)))
  }

  test("editDistanceJoin equals brute all-pairs Levenshtein, short pool included") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // mix of long strings and SHORT ones (< q*(k+1) = 6 chars) that the
    // q-gram guarantee cannot cover — the short pool must catch them
    val strs = Seq("cold rod", "cold rom", "blue rod", "cold widget",
      "old widget", "bold widget", "cat", "bat", "rat", "cart", "ace",
      "blue rodx", "xyz")
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "name")
    for (k <- Seq(1, 2)) {
      val got = Dedup.editDistanceJoin(df, "name", maxDist = k)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      val want = (for {
        a <- strs.distinct; b <- strs.distinct if a < b
        d = lev(a, b) if d <= k
      } yield (a, b, d.toLong)).toSet
      assert(got == want, s"k=$k")
    }
  }

  test("random corpora: pruning never loses a qualifying pair") {
    val rnd = new scala.util.Random(11)
    val vocab = ('a' to 't').map(_.toString)
    val corpus = (0L until 40L).map { i =>
      i -> rnd.shuffle(vocab).take(3 + rnd.nextInt(8)).mkString(" ")
    }
    for (pct <- Seq(40, 70))
      assert(run(corpus, pct) == brute(corpus, pct), s"pct=$pct")
  }
}
