package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()

  test("bruteForceTopK returns k rows per query, ranked by cosine desc") {
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val out = Similarity.bruteForceTopK(emb, queries, "vec_id", "query_id",
      "embedding", k = 5).cache()
    val counts = out.groupBy("query_id").count().select("count")
      .collect().map(_.getLong(0))
    assert(counts.length == 3 && counts.forall(_ == 5))
    // ranked: per query the cosines are non-increasing
    val rows = out.orderBy(col("query_id"), col("cosine").desc).collect()
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val cos = g.map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // self never among neighbors
    assert(out.filter(col("query_id") === col("vec_id")).count() == 0)
  }

  test("lshTopK results are a subset of the corpus with sane scores and " +
    "reasonable recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "query_id",
        "embedding", k = 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "query_id",
        "embedding", k = 10, nBits = 4, nTables = 8)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH recall $recall too low — bucketing broken?")
  }

  test("materialized IVF index: probe equals inline ivfTopK and prunes partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = java.nio.file.Files.createTempDirectory("ivf_index").toString + "/idx"
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))

    val cents = Similarity.writeIvfIndex(emb, path, "vec_id", "embedding",
      nCentroids = 16)
    val inline = Similarity.ivfTopK(emb, queries, "vec_id", "query_id",
        "embedding", k = 5, nCentroids = 16, nProbe = 2, centers = Some(cents))
      .orderBy("query_id", "vec_id").collect().toSeq
    val probed = Similarity.ivfProbe(spark, path, cents, queries,
      "vec_id", "query_id", "embedding", k = 5, nProbe = 2)
      .orderBy("query_id", "vec_id")
    val probedRows = probed.collect().toSeq // also populates the scan metrics
    assert(probedRows == inline)

    // pruning is PHYSICAL: the probe's scan reads only the probed cell
    // partitions (at most 3 queries x 2 probes = 6 of 16), not the index
    val allFiles = spark.read.parquet(path).inputFiles.length.toLong
    assert(allFiles >= 16, s"expected >=16 partition files, got $allFiles")
    // AQE hides materialized stages behind QueryStageExec/AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scanFiles(p: SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => scanFiles(a.executedPlan)
      case q: QueryStageExec => scanFiles(q.plan)
      case f: FileSourceScanExec => f.metrics("numFiles").value
      case other => other.children.map(scanFiles).sum
    }
    val probedFiles = scanFiles(probed.queryExecution.executedPlan)
    assert(probedFiles > 0 && probedFiles <= allFiles * 6 / 16,
      s"probe read $probedFiles of $allFiles files — pruning not physical?")
  }

  test("ivfTopK with nProbe == nCentroids equals exact brute force") {
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "query_id",
      "embedding", k = 10).collect().map(key).toSet
    val ivfAll = Similarity.ivfTopK(emb, queries, "vec_id", "query_id",
      "embedding", k = 10, nCentroids = 8, nProbe = 8).collect().map(key).toSet
    assert(ivfAll == exact)
  }

  test("ivfTopK probing few cells still finds most true neighbors") {
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "query_id",
        "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "query_id",
        "embedding", k = 10, nCentroids = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("nearDupPairs finds planted identical vectors and orders ids") {
    import spark.implicits._
    val planted = Seq(
      (1000L, Array.fill(8)(0.5f)),
      (1001L, Array.fill(8)(0.5f)),            // exact dup of 1000
      (1002L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(planted, "vec_id", "embedding",
      threshold = 0.99, nBits = 4, nTables = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1000L, 1001L)))
    assert(pairs.forall { case (a, b) => a < b })
  }
}
