package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures: schema, determinism, null-blob safety") {
    val docs = Tables.documents(spark, sf0001).limit(10)
    val blobs = Multimodal.synthesizeBlobs(docs, "text")
    val out = Multimodal.extractFeatures(blobs, "blob", dim = 8)
    val fields = out.schema.fieldNames.toSet
    assert(Set("width", "height", "n_bytes", "features").subsetOf(fields))
    assert(fields.contains("doc_id")) // input columns preserved

    val rows = out.select("doc_id", "n_bytes", "features").orderBy("doc_id").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getSeq[Float](2).length == 8)
    }
    // determinism: second run produces identical features
    val again = Multimodal.extractFeatures(blobs, "blob", dim = 8)
      .select("doc_id", "features").orderBy("doc_id").collect()
    rows.zip(again).foreach { case (a, b) =>
      assert(a.getSeq[Float](2) == b.getSeq[Float](1))
    }

    val withNull = Seq((1L, null.asInstanceOf[Array[Byte]])).toDF("id", "blob")
    val nr = Multimodal.extractFeatures(withNull, "blob").head()
    assert(nr.getAs[Any]("features") == null && nr.getAs[Long]("n_bytes") == 0L)
  }

  test("sampleFrames explodes every-Nth frame indices with byte slices") {
    val docs = Tables.documents(spark, sf0001).limit(3)
    val blobs = Multimodal.synthesizeBlobs(docs, "text", repeat = 128)
    val frames = Multimodal.sampleFrames(blobs, "blob", Seq("doc_id"),
      everyNth = 5, maxFrames = 4)
    val byDoc = frames.groupBy("doc_id").count().collect()
    assert(byDoc.nonEmpty)
    // frame indices are multiples of everyNth
    val idx = frames.select("frame_index").as[Int].collect()
    assert(idx.forall(_ % 5 == 0))
    // frame bytes are bounded slices
    val lens = frames.select(length(col("frame_bytes"))).as[Int].collect()
    assert(lens.forall(l => l > 0 && l <= 1024))
  }
}
