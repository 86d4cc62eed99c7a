package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamingDedup

/** Streaming incremental dedup: two file-landing waves drain through
  * foreachBatch; candidates accumulate across epochs, the index composes,
  * and a re-drain after the checkpoint is intact is a no-op.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def doc(words: Range, subst: Map[Int, String] = Map.empty): String =
    words.map(i => subst.getOrElse(i, s"word$i")).mkString(" ")

  test("two drains: candidates accumulate, re-drain is a no-op") {
    val root = Files.createTempDirectory("stream_dedup")
    val src = root.resolve("incoming").toString
    val index = root.resolve("index").toString
    val cands = root.resolve("cands").toString
    val ckpt = root.resolve("ckpt").toString
    Files.createDirectories(root.resolve("incoming"))

    // wave 1: two distinct docs + one near-dup pair inside the wave
    Seq((1L, doc(1 to 60)), (2L, doc(100 to 160)),
        (3L, doc(1 to 60, Map(30 -> "CHANGED"))))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    StreamingDedup.drain(spark, src, index, cands, ckpt, "doc_id", "text", schema)

    val afterWave1 = spark.read.parquet(cands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterWave1.contains((1L, 3L)), s"in-wave pair missing: $afterWave1")
    assert(!afterWave1.exists(p => p._1 == 2L || p._2 == 2L))

    // wave 2: a near-dup of a WAVE-1 doc — found via the persisted index
    Seq((10L, doc(100 to 160, Map(130 -> "ALSO"))))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    StreamingDedup.drain(spark, src, index, cands, ckpt, "doc_id", "text", schema)

    val afterWave2 = spark.read.parquet(cands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterWave2.contains((2L, 10L)), s"cross-wave pair missing: $afterWave2")
    assert(afterWave2.contains((1L, 3L)))

    // a third drain with nothing new: no growth anywhere
    val candCount = spark.read.parquet(cands).count()
    val indexCount = spark.read.parquet(index).count()
    StreamingDedup.drain(spark, src, index, cands, ckpt, "doc_id", "text", schema)
    assert(spark.read.parquet(cands).count() == candCount)
    assert(spark.read.parquet(index).count() == indexCount)
    // index holds one row per (doc, band) for all four docs
    assert(indexCount == 4 * 8)
  }

  test("streaming cluster maintenance equals one-shot clustering over all pairs") {
    val root = Files.createTempDirectory("stream_clusters")
    val src = root.resolve("incoming").toString
    val index = root.resolve("index").toString
    val cands = root.resolve("cands").toString
    val ckpt = root.resolve("ckpt").toString
    val clusters = root.resolve("clusters").toString
    Files.createDirectories(root.resolve("incoming"))

    // wave 1: pair (1,3) + loner 2
    Seq((1L, doc(1 to 60)), (2L, doc(100 to 160)),
        (3L, doc(1 to 60, Map(30 -> "CHANGED"))))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    StreamingDedup.drain(spark, src, index, cands, ckpt, "doc_id", "text",
      schema, clustersDir = Some(clusters))
    val after1 = spark.read.parquet(clusters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after1.get(1L).contains(1L) && after1.get(3L).contains(1L),
      s"wave-1 pair should cluster to min id: $after1")

    // wave 2: 10 near-dups wave-1's doc 2 (new cluster), 11 near-dups doc 3
    // (EXTENDS the {1,3} cluster through the merge path)
    Seq((10L, doc(100 to 160, Map(130 -> "ALSO"))),
        (11L, doc(1 to 60, Map(30 -> "CHANGED", 50 -> "MORE"))))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    StreamingDedup.drain(spark, src, index, cands, ckpt, "doc_id", "text",
      schema, clustersDir = Some(clusters))

    val streamed = spark.read.parquet(clusters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // one-shot reference: components over ALL accumulated candidate pairs
    val oneShot = graft.operators.Dedup.connectedComponents(
        spark.read.parquet(cands), "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == oneShot,
      s"streamed $streamed must equal one-shot $oneShot")
    assert(streamed.get(11L).contains(1L), "cross-wave extension joins {1,3}")
    assert(streamed.get(10L).contains(2L))
  }

  test("verified drain equals the one-shot LSH→verify chain and stores jaccard") {
    val root = Files.createTempDirectory("stream_dedup_verify")
    val src = root.resolve("incoming").toString
    val index = root.resolve("index").toString
    val cands = root.resolve("cands").toString
    val ckpt = root.resolve("ckpt").toString
    val clusters = root.resolve("clusters").toString
    val shingles = root.resolve("shingles").toString
    Files.createDirectories(root.resolve("incoming"))

    // docs 1/3 are true near-dups; 4/5 collide in SOME band (shared run of
    // words) but their jaccard is far below 0.5 — the verify gate must
    // drop that pair even though the candidate path finds it
    val docs = Seq(
      (1L, doc(1 to 60)),
      (2L, doc(100 to 160)),
      (3L, doc(1 to 60, Map(30 -> "CHANGED"))),
      (4L, doc(200 to 260) + " " + doc(300 to 320)),
      (5L, doc(400 to 460) + " " + doc(300 to 320)))
    def drainWave(): Unit = StreamingDedup.drain(spark, src, index, cands,
      ckpt, "doc_id", "text", schema, clustersDir = Some(clusters),
      verify = Some((shingles, 0.5)))
    docs.filter(_._1 <= 3).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    drainWave()
    docs.filter(_._1 > 3).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    drainWave()

    val drained = spark.read.parquet(cands)
    assert(drained.columns.toSet === Set("id_a", "id_b", "jaccard"))
    val pairs = drained.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // one-shot reference: bucket everything at once, verify at 0.5
    val all = docs.toDF("doc_id", "text")
    val sigs = graft.operators.Dedup.minhashSignaturesFused(all, "doc_id",
      "text", numHashes = 32, shingleN = 3)
    val rawCands = graft.operators.Dedup.lshCandidates(sigs, "doc_id",
      bands = 8, rowsPerBand = 4)
    val sh = graft.operators.Dedup.withHashedShingles(all, "doc_id", "text")
    val oneShot = rawCands
      .join(sh.select(col("doc_id").as("id_a"),
        col("shingle_hashes").as("sa")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"),
        col("shingle_hashes").as("sb")), Seq("id_b"))
      .filter(round(graft.operators.Dedup.jaccard(col("sa"), col("sb")), 4)
        >= 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === oneShot, s"drained $pairs vs one-shot $oneShot")
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.contains((4L, 5L)), "sub-threshold pair must be dropped")
    // clusters merge only VERIFIED edges
    val clustered = spark.read.parquet(clusters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clustered.get(1L).contains(1L) && clustered.get(3L).contains(1L))
    assert(!clustered.get(4L).exists(_ == clustered.getOrElse(5L, -1L)) ||
      !clustered.contains(4L) || !clustered.contains(5L),
      s"4 and 5 must not share a cluster: $clustered")
  }
}
