package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Lexical retrieval: BM25 and TF-IDF against brute-force in-memory
  * references (same micro-grid arithmetic), positional phrase search
  * against a token-array scan (overlapping matches included), and the
  * pure-integer RRF reciprocal.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def norm(t: String): Array[String] =
    t.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").trim
      .split("\\s+").filter(_.nonEmpty)

  private val texts = Seq(
    0L -> "the quick brown fox jumps over the lazy dog",
    1L -> "the quick fox runs",
    2L -> "a lazy dog sleeps all day the dog snores",
    3L -> "quick quick quick brown foxes",
    4L -> "nothing in common here at all",
    5L -> "")
  private def docs = texts.toDF("doc_id", "text")

  test("bm25TopK matches the brute-force reference") {
    val queries = Seq(10L -> "quick fox", 11L -> "lazy dog day").toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", queries, "qid",
        "qtext", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    // brute reference with the same micro-grid formulas
    val toks = texts.map { case (id, t) => id -> norm(t) }.toMap
    val n = texts.size
    val avgdl = toks.values.map(_.length).sum.toDouble / n.toDouble
    def df(t: String) = toks.values.count(_.contains(t))
    def idfMicro(t: String) = math.floor(1e6 * StrictMath.log(
      1.0 + ((n - df(t)).toDouble + 0.5) / (df(t).toDouble + 0.5))).toLong
    def score(q: Seq[String], d: Long): Long = q.distinct.map { t =>
      val tf = toks(d).count(_ == t)
      if (tf == 0) 0L
      else math.floor(idfMicro(t).toDouble * (tf.toDouble * (1.2 + 1.0)) /
        (tf.toDouble + 1.2 * (1.0 - 0.75 + 0.75 * toks(d).length.toDouble /
          avgdl))).toLong
    }.sum
    val want = Seq(10L -> "quick fox", 11L -> "lazy dog day").flatMap {
      case (qid, qt) =>
        val q = norm(qt).toSeq
        texts.map(_._1).filter(d => q.distinct.exists(toks(d).contains))
          .map(d => (d, score(q, d)))
          .sortBy { case (d, s) => (-s, d) }.take(3).zipWithIndex
          .map { case ((d, s), i) => (qid, (i + 1).toLong, d, s) }
    }.toSet
    assert(got == want)
  }

  test("tfidfKeywords matches the brute-force reference") {
    val got = Retrieval.tfidfKeywords(docs, "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    val toks = texts.map { case (id, t) => id -> norm(t) }.toMap
    val n = texts.size
    def df(t: String) = toks.values.count(_.contains(t))
    val want = texts.map(_._1).flatMap { d =>
      toks(d).distinct.map { t =>
        val idf = math.floor(1e6 * StrictMath.log(
          n.toDouble / df(t).toDouble)).toLong
        (t, toks(d).count(_ == t).toLong * idf)
      }.sortBy { case (t, s) => (-s, t) }.take(2).zipWithIndex
        .map { case ((t, s), i) => (d, (i + 1).toLong, t, s) }
    }.toSet
    assert(got == want)
  }

  test("phraseSearch counts overlapping consecutive matches positionally") {
    val d2 = Seq(0L -> "ab ab ab cd", 1L -> "ab cd ab", 2L -> "cd cd",
      3L -> "ab").toDF("doc_id", "text")
    val phrases = Seq(20L -> "ab ab", 21L -> "ab cd", 22L -> "ab").toDF("qid", "p")
    val got = Retrieval.phraseSearch(d2, "doc_id", "text", phrases, "qid", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute: all positions p with tokens[p..p+m) == phrase (overlaps count)
    val toks = Map(0L -> Seq("ab","ab","ab","cd"), 1L -> Seq("ab","cd","ab"),
      2L -> Seq("cd","cd"), 3L -> Seq("ab"))
    val want = (for {
      (qid, ph) <- Seq(20L -> Seq("ab","ab"), 21L -> Seq("ab","cd"),
        22L -> Seq("ab"))
      (d, ts) <- toks
      c = (0 to ts.length - ph.length)
        .count(p => ts.slice(p, p + ph.length) == ph)
      if c > 0
    } yield (qid, d, c.toLong)).toSet
    assert(got == want)
  }

  test("bm25Probe over the materialized index equals inline bm25TopK and prunes buckets") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val path = java.nio.file.Files.createTempDirectory("bm25idx").toString + "/idx"
    Retrieval.writeBm25Index(docs, path, "doc_id", "text", nBuckets = 8)
    val queries = Seq(10L -> "quick fox", 11L -> "lazy dog day")
      .toDF("qid", "qtext")
    val inline = Retrieval.bm25TopK(docs, "doc_id", "text", queries, "qid",
        "qtext", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val probed = Retrieval.bm25Probe(spark, path, queries, "qid", "qtext",
      k = 4)
    val got = probed.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSet
    assert(got == inline)
    // physical pruning: the postings scan reads only the query terms'
    // bucket partitions, not the whole layout
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
    val post = scans(probed.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("postings")))
    val allBuckets = spark.read.parquet(path + "/postings")
      .select("bucket").distinct().count()
    val qBuckets = Seq("quick", "fox", "lazy", "dog", "day")
      .toDF("term").select(pmod(xxhash64(col("term")), lit(8L)))
      .distinct().count()
    assert(qBuckets < allBuckets, "fixture too small to show pruning")
    val read = post.map(_.metrics("numFiles").value).sum
    val total = spark.read.parquet(path + "/postings").inputFiles.length
    assert(read > 0 && read < total,
      s"probe read $read of $total posting files — pruning not physical?")
  }

  test("incremental drain + publish equals the one-shot index; re-drain is a no-op") {
    import org.apache.spark.sql.types._
    import graft.streaming.StreamingRetrieval
    val root = java.nio.file.Files.createTempDirectory("bm25drain").toString
    val (src, staging, idx, idx1, ckpt) = (root + "/src", root + "/staging",
      root + "/idx", root + "/one", root + "/ckpt")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val queries = Seq(10L -> "quick fox", 11L -> "lazy dog day")
      .toDF("qid", "qtext")
    def probeSet(path: String) =
      Retrieval.bm25Probe(spark, path, queries, "qid", "qtext", k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    // wave 1 (includes the token-less doc — stats must still count it),
    // then wave 2; each drain sees only the backlog since the last
    docs.filter($"doc_id" >= 3).write.mode("append").parquet(src)
    StreamingRetrieval.indexDrain(spark, src, staging, ckpt, "doc_id",
      "text", schema)
    docs.filter($"doc_id" < 3).write.mode("append").parquet(src)
    StreamingRetrieval.indexDrain(spark, src, staging, ckpt, "doc_id",
      "text", schema)
    StreamingRetrieval.publish(spark, staging, idx, nBuckets = 8)
    Retrieval.writeBm25Index(docs, idx1, "doc_id", "text", nBuckets = 8)
    assert(probeSet(idx) == probeSet(idx1))
    // checkpoint loss: a fresh checkpoint replays every file; the
    // (src_file, doc, term) keys land nothing new
    val before = spark.read.parquet(staging + "/postings").count()
    StreamingRetrieval.indexDrain(spark, src, staging, root + "/ckpt2",
      "doc_id", "text", schema)
    assert(spark.read.parquet(staging + "/postings").count() == before)
    StreamingRetrieval.publish(spark, staging, idx, nBuckets = 8)
    assert(probeSet(idx) == probeSet(idx1))
  }

  test("indexDrain rejects a doc id re-arriving in a different source file") {
    import org.apache.spark.sql.types._
    import graft.streaming.StreamingRetrieval
    val root = java.nio.file.Files.createTempDirectory("bm25clash").toString
    val (src, staging) = (root + "/src", root + "/staging")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    Seq(1L -> "quick fox", 2L -> "lazy dog").toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    StreamingRetrieval.indexDrain(spark, src, staging, root + "/ckpt1",
      "doc_id", "text", schema)
    // doc 1 re-lands in a NEW file (an update): the staging store cannot
    // represent it — the drain must fail loudly, not double-count
    Seq(1L -> "quick fox revised").toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val e = intercept[Exception] {
      StreamingRetrieval.indexDrain(spark, src, staging, root + "/ckpt2",
        "doc_id", "text", schema)
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("re-arrived")),
      chain(e).mkString(" | "))
    // the staged store is untouched by the rejected batch: doc 1 still has
    // exactly one src_file
    val nSrc = spark.read.parquet(staging + "/docs")
      .filter($"doc" === 1L).select("src_file").distinct().count()
    assert(nSrc == 1L)
  }

  test("hybridRrf: integer reciprocal sum, missing list contributes zero") {
    val a = Seq((1L, 100L, 1L), (1L, 101L, 2L)).toDF("qid", "did", "rank")
    val b = Seq((1L, 101L, 1L), (1L, 102L, 2L)).toDF("qid", "did", "rank")
    val got = Retrieval.hybridRrf(Seq(a, b), "qid", "did", "rank", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // 101: 10^9/62 + 10^9/61 (div) ; 100: 10^9/61 ; 102: 10^9/62
    val s101 = 1000000000L / 62 + 1000000000L / 61
    assert(got.toSeq == Seq((1L, 101L, s101),
      (2L, 100L, 1000000000L / 61), (3L, 102L, 1000000000L / 62)))
  }
}
