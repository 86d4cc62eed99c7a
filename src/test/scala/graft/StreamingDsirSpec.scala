package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.operators.Dsir
import graft.streaming.StreamingDsir

/** Streaming DSIR/perplexity scoring: document waves drain under pinned
  * model weights; the accumulated scores table equals the one-shot batch
  * scoring regardless of how the corpus was split into waves, and
  * re-drains are no-ops.
  */
class StreamingDsirSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType)))

  private def sciDoc(i: Int) = s"plasma drift field coil flux torus mode $i"
  private def webDoc(i: Int) = s"click buy cheap deal offer sale now $i"

  test("drained waves accumulate exactly the one-shot scores; re-drain no-op") {
    val all = ((1 to 20).map(i => (i.toLong, sciDoc(i))) ++
      (21 to 40).map(i => (i.toLong, webDoc(i))))
    val corpus = all.toDF("id", "text")
    val target = Dsir.trainNgramModel(
      (101 to 120).map(i => (i.toLong, sciDoc(i))).toDF("id", "text"),
      "text", nBuckets = 128)
    val raw = Dsir.trainNgramModel(corpus, "text", nBuckets = 128)
    val w = Dsir.importanceWeights(target, raw)

    val root = Files.createTempDirectory("stream_dsir")
    val src = root.resolve("incoming").toString
    val scores = root.resolve("scores").toString
    val ckpt = root.resolve("ckpt").toString
    Files.createDirectories(root.resolve("incoming"))

    // wave 1: first 25 docs; wave 2: the rest (straddles the domain split)
    all.take(25).toDF("id", "text").write.mode("append").parquet(src)
    StreamingDsir.drain(spark, src, scores, ckpt, "id", "text", schema,
      w, target)
    assert(spark.read.parquet(scores).count() == 25)

    all.drop(25).toDF("id", "text").write.mode("append").parquet(src)
    StreamingDsir.drain(spark, src, scores, ckpt, "id", "text", schema,
      w, target)

    val streamed = spark.read.parquet(scores)
      .select("id", "dsir_score", "n_feats", "ce_micro")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val oneShot = Dsir.importanceScore(corpus, "id", "text", w)
      .join(Dsir.crossEntropy(corpus, "id", "text", target), Seq("id"))
      .select("id", "dsir_score", "n_feats", "ce_micro")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(streamed == oneShot)

    // re-drain with nothing new: the scores table does not grow
    StreamingDsir.drain(spark, src, scores, ckpt, "id", "text", schema,
      w, target)
    assert(spark.read.parquet(scores).count() == 40)
  }

  test("trainDrain accumulates one-shot counts; checkpoint loss cannot double-count") {
    val all = ((1 to 30).map(i => (i.toLong, sciDoc(i))) ++
      (31 to 60).map(i => (i.toLong, webDoc(i))))
    val root = Files.createTempDirectory("stream_dsir_train")
    val src = root.resolve("incoming").toString
    val counts = root.resolve("counts").toString
    val ckpt = root.resolve("ckpt").toString
    Files.createDirectories(root.resolve("incoming"))

    all.take(25).toDF("id", "text").write.mode("append").parquet(src)
    StreamingDsir.trainDrain(spark, src, counts, ckpt, "text", schema,
      nBuckets = 128)
    all.drop(25).toDF("id", "text").write.mode("append").parquet(src)
    StreamingDsir.trainDrain(spark, src, counts, ckpt, "text", schema,
      nBuckets = 128)

    val oneShot = Dsir.trainNgramCounts(all.toDF("id", "text"), "text", 128)
    assert(StreamingDsir.loadCounts(spark, counts, 128).sameElements(oneShot))

    // checkpoint loss: the engine replays ALL files (possibly re-batched),
    // but the FILE-keyed idempotent append lands nothing — counts stay
    // exactly one-shot
    org.apache.commons.io.FileUtils.deleteDirectory(root.resolve("ckpt").toFile)
    StreamingDsir.trainDrain(spark, src, counts, ckpt, "text", schema,
      nBuckets = 128)
    assert(StreamingDsir.loadCounts(spark, counts, 128).sameElements(oneShot))
    assert(Dsir.modelFromCounts(StreamingDsir.loadCounts(spark, counts, 128))
      .sameElements(Dsir.trainNgramModel(all.toDF("id", "text"), "text", 128)))
  }
}
