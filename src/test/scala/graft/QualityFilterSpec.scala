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
}
