package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityFilter

class QualityFilterSpec extends SparkSpec {

  // Two disjoint planted vocabularies: "good" docs draw from aqua..dune,
  // "bad" docs from rust..grim. Train on one half, score everything — a
  // correct centroid classifier must separate the held-out half too,
  // because held-out docs reuse the training vocabulary.
  private lazy val corpus = {
    import spark.implicits._
    val goodWords = Array("aqua", "brine", "coral", "dune")
    val badWords = Array("rust", "soot", "tar", "grim")
    val docs = (0 until 40).map { i =>
      val words = if (i % 2 == 0) goodWords else badWords
      val text = Array.tabulate(12)(j => words((i + j) % 4)).mkString(" ")
      (i.toLong, text, i % 2 == 0)
    }
    docs.toDF("doc_id", "text", "label")
  }

  test("trained centroid separates planted vocabularies, including held-out docs") {
    val train = corpus.filter(col("doc_id") < 20)
    val w = QualityFilter.trainHashedCentroid(train, "text", "label",
      nBuckets = 64)
    assert(w.length == 64)
    // balanced grid: total weight mass cancels up to fixed-point truncation
    assert(math.abs(w.sum) <= 2L * w.length)
    val out = QualityFilter.scoreHashed(corpus, "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 40)
    out.foreach { case (id, score, predicted) =>
      val expected = id % 2 == 0
      assert(predicted == expected, s"doc $id score $score")
    }
  }

  test("sharded count training merged in any order equals one-shot weights") {
    val shards = Seq(
      corpus.filter(col("doc_id") < 13),
      corpus.filter(col("doc_id") >= 13 && col("doc_id") < 27),
      corpus.filter(col("doc_id") >= 27))
    val parts = shards.map(s =>
      QualityFilter.trainLabeledCounts(s, "text", "label", nBuckets = 64))
    val mergedFwd = parts.reduce(QualityFilter.mergeLabeledCounts)
    val mergedRev = parts.reverse.reduce(QualityFilter.mergeLabeledCounts)
    val oneShot = QualityFilter.trainHashedCentroid(corpus, "text", "label",
      nBuckets = 64)
    assert(QualityFilter.weightsFromCounts(mergedFwd._1, mergedFwd._2)
      .sameElements(oneShot))
    assert(QualityFilter.weightsFromCounts(mergedRev._1, mergedRev._2)
      .sameElements(oneShot))
    // the distributed row form accumulates the same state
    val rows = QualityFilter.labeledCountsBy(
        corpus.withColumn("shard", col("doc_id") % 3),
        "shard", "text", "label", nBuckets = 64)
      .groupBy("bucket")
      .agg(sum(col("g")).as("g"), sum(col("bad")).as("bad"))
      .collect()
    val g = Array.fill(64)(0L); val bad = Array.fill(64)(0L)
    rows.foreach { r =>
      g(r.getInt(0)) = r.getLong(1); bad(r.getInt(0)) = r.getLong(2)
    }
    assert(QualityFilter.weightsFromCounts(g, bad).sameElements(oneShot))
  }

  test("trainDrain accumulates one-shot counts; checkpoint loss cannot double-count") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("stream_qf")
    val src = root.resolve("incoming").toString
    val counts = root.resolve("counts").toString
    val ckpt = root.resolve("ckpt").toString
    java.nio.file.Files.createDirectories(root.resolve("incoming"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("label", BooleanType)))

    corpus.filter(col("doc_id") < 25).write.mode("append").parquet(src)
    graft.streaming.StreamingQualityFilter.trainDrain(spark, src, counts,
      ckpt, "text", "label", schema, nBuckets = 64)
    corpus.filter(col("doc_id") >= 25).write.mode("append").parquet(src)
    graft.streaming.StreamingQualityFilter.trainDrain(spark, src, counts,
      ckpt, "text", "label", schema, nBuckets = 64)

    val (g, bad) = graft.streaming.StreamingQualityFilter.loadCounts(
      spark, counts, nBuckets = 64)
    val oneShot = QualityFilter.trainHashedCentroid(corpus, "text", "label",
      nBuckets = 64)
    assert(QualityFilter.weightsFromCounts(g, bad).sameElements(oneShot))

    // checkpoint loss: a fresh checkpoint replays every file, but the
    // (src_file, bucket) key makes the replay land nothing new
    graft.streaming.StreamingQualityFilter.trainDrain(spark, src, counts,
      root.resolve("ckpt2").toString, "text", "label", schema, nBuckets = 64)
    val (g2, bad2) = graft.streaming.StreamingQualityFilter.loadCounts(
      spark, counts, nBuckets = 64)
    assert(g2.sameElements(g) && bad2.sameElements(bad))

    // a mismatched nBuckets is rejected loudly, not silently misnormalized
    intercept[IllegalArgumentException] {
      graft.streaming.StreamingQualityFilter.loadCounts(spark, counts,
        nBuckets = 16)
    }
  }

  test("tokenless and unseen-vocabulary docs score 0 / near 0") {
    import spark.implicits._
    val w = QualityFilter.trainHashedCentroid(corpus, "text", "label",
      nBuckets = 64)
    val odd = Seq((100L, ""), (101L, "   "), (102L, "!!!")).toDF("doc_id", "text")
    val out = QualityFilter.scoreHashed(odd, "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // "" and whitespace produce no tokens at all -> exact 0
    assert(out(100L) == 0L && out(101L) == 0L && out(102L) == 0L)
  }

  test("a label-free degenerate training set still yields bounded weights") {
    // all-positive labels: every bucket's negative count is the smoothing 1,
    // so weights stay on the grid and scoring cannot divide by zero
    val allPos = corpus.withColumn("label", lit(true))
    val w = QualityFilter.trainHashedCentroid(allPos, "text", "label",
      nBuckets = 32)
    assert(w.forall(v => math.abs(v) <= QualityFilter.Scale))
  }

  // ---- repetitionScreen (Gopher within-doc repetition filters) ----

  test("repetitionScreen matches hand-computed gram coverage") {
    import spark.implicits._
    // doc 1: "a b a b a" — 2-grams: (a b)x2, (b a)x2 -> top is "b a"
    //   (count tie 2/2, lexicographically largest wins); 5-gram "a b a b a"
    //   occurs once -> dup5 = 0
    // doc 2: "x y x y x y x y x y x y" (12 tokens) — 5-grams: "x y x y x" x4,
    //   "y x y x y" x4 -> dupchars = 4*9 + 4*9 = 72; n_chars = 23
    val docs = Seq(
      (1L, "a b a b a"),
      (2L, "x y x y x y x y x y x y")
    ).toDF("doc_id", "text")
    val got = QualityFilter.repetitionScreen(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getLong(1) == 5L && r1.getLong(2) == 9L)   // tokens, chars
    assert(r1.getString(3) == "b a" && r1.getLong(4) == 2L)
    assert(r1.getLong(5) == 1000L * 2 * 3 / 9)           // top coverage
    assert(r1.getLong(6) == 0L)                          // no dup 5-grams
    val r2 = got(1)
    assert(r2.getLong(1) == 12L && r2.getLong(2) == 23L)
    assert(r2.getString(3) == "x y" && r2.getLong(4) == 6L)
    assert(r2.getLong(5) == 1000L * 6 * 3 / 23)
    assert(r2.getLong(6) == 1000L * 72 / 23) // > 1000: documented overlap
  }

  test("repetitionScreen: docs shorter than the gram sizes emit zero rows, not errors") {
    import spark.implicits._
    val docs = Seq(
      (1L, "solo"),          // no 2-grams, no 5-grams
      (2L, "two words here") // 2-grams yes, 5-grams no
    ).toDF("doc_id", "text")
    val got = QualityFilter.repetitionScreen(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.length == 2)
    assert(got(0).getString(3) == "" && got(0).getLong(4) == 0L &&
      got(0).getLong(5) == 0L && got(0).getLong(6) == 0L)
    assert(got(1).getString(3) == "words here" && got(1).getLong(4) == 1L &&
      got(1).getLong(6) == 0L)
  }

  test("repetitionScreen top-gram tie-break is the largest gram (deterministic)") {
    import spark.implicits._
    // all four 2-grams distinct (count 1 each): lexicographically largest
    // ("d a") must win in BOTH engines
    val docs = Seq((1L, "a b c d a")).toDF("doc_id", "text")
    val r = QualityFilter.repetitionScreen(docs, "doc_id", "text")
      .collect()(0)
    assert(r.getString(3) == "d a" && r.getLong(4) == 1L)
  }
}
