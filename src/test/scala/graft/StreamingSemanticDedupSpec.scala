package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamingSemanticDedup

/** Streaming semantic dedup: embedding waves drain against a pinned-center
  * cell index; cross-wave twins surface via the index path, re-drain is a
  * no-op.
  */
class StreamingSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  // two well-separated directions in 8 dims plus per-id jitter tiny enough
  // to keep within-direction cosine ≈ 1 and cross ≈ 0
  private def vec(dir: Int, jitter: Int): Array[Float] =
    Array.tabulate(8) { i =>
      val base = if (i == dir) 1.0f else 0.0f
      base + (if (i == (jitter % 7) + 1) 1e-4f * dir else 0f)
    }

  private val centers = Array(vec(0, 0), vec(4, 0))

  test("cross-wave semantic twins surface via the persisted cell index") {
    val root = Files.createTempDirectory("stream_semdedup")
    val src = root.resolve("incoming").toString
    val index = root.resolve("index").toString
    val cands = root.resolve("cands").toString
    val ckpt = root.resolve("ckpt").toString
    Files.createDirectories(root.resolve("incoming"))

    // wave 1: one doc per direction + an in-wave twin of direction 0
    Seq((1L, vec(0, 1)), (2L, vec(4, 2)), (3L, vec(0, 1)))
      .toDF("vec_id", "embedding").write.mode("append").parquet(src)
    StreamingSemanticDedup.drain(spark, src, index, cands, ckpt,
      "vec_id", "embedding", schema, centers, threshold = 0.999)

    val afterWave1 = spark.read.parquet(cands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterWave1 == Set((1L, 3L)), s"wave-1 pairs: $afterWave1")

    // wave 2: a twin of WAVE-1's direction-4 doc — index path must find it
    Seq((10L, vec(4, 2))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(src)
    StreamingSemanticDedup.drain(spark, src, index, cands, ckpt,
      "vec_id", "embedding", schema, centers, threshold = 0.999)

    val afterWave2 = spark.read.parquet(cands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterWave2 == Set((1L, 3L), (2L, 10L)), s"wave-2 pairs: $afterWave2")

    // re-drain with nothing new: no growth in candidates or index
    val candCount = spark.read.parquet(cands).count()
    val indexCount = spark.read.parquet(index).count()
    StreamingSemanticDedup.drain(spark, src, index, cands, ckpt,
      "vec_id", "embedding", schema, centers, threshold = 0.999)
    assert(spark.read.parquet(cands).count() == candCount)
    assert(spark.read.parquet(index).count() == indexCount)
    // one index row per doc (each doc lives in exactly one cell)
    assert(indexCount == 4)
  }
}
