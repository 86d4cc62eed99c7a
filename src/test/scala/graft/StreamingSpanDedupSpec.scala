package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup
import graft.streaming.StreamingSpanDedup

/** Streaming exact-substring span dedup: waves drain through foreachBatch;
  * spans flag against the persisted window-hash index (flag-forward), the
  * final batch matches the one-shot operator exactly, and a re-drain after
  * the checkpoint is intact is a no-op.
  */
class StreamingSpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def doc(words: Range, subst: Map[Int, String] = Map.empty): String =
    words.map(i => subst.getOrElse(i, s"word$i")).mkString(" ")

  test("cross-wave spans flag forward via the index; re-drain is a no-op") {
    val root = Files.createTempDirectory("stream_spans")
    val src = root.resolve("incoming").toString
    val index = root.resolve("index").toString
    val spansDir = root.resolve("spans").toString
    val ckpt = root.resolve("ckpt").toString
    Files.createDirectories(root.resolve("incoming"))

    // wave 1: a template doc + an unrelated doc — nothing repeats yet
    Seq((1L, doc(1 to 30)), (2L, doc(100 to 130)))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    StreamingSpanDedup.drain(spark, src, index, spansDir, ckpt,
      "doc_id", "text", schema, n = 4)
    // wave 1 has no duplicated windows: an empty batch result never even
    // creates the spans table
    assert(graft.operators.Populate.readIfExists(spark, spansDir)
      .map(_.count()).getOrElse(0L) == 0L)

    // wave 2: embeds wave-1's tokens 10..19 inside fresh context — the
    // repeated region flags via the INDEX (doc 1 itself is not re-read)
    Seq((10L, "zz yy " + doc(10 to 19) + " xx ww vv uu"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    StreamingSpanDedup.drain(spark, src, index, spansDir, ckpt,
      "doc_id", "text", schema, n = 4)

    val spans = spark.read.parquet(spansDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 10: shared run of 10 tokens starts at offset 2 → [2, 12)
    assert(spans == Set((10L, 2L, 12L)),
      s"flag-forward: only the wave-2 doc carries a span: $spans")

    // final-batch parity: the incremental spans for wave-2 docs equal the
    // one-shot operator over the full corpus, restricted to those docs
    val all = Seq(
      (1L, doc(1 to 30)), (2L, doc(100 to 130)),
      (10L, "zz yy " + doc(10 to 19) + " xx ww vv uu"))
      .toDF("doc_id", "text")
    val oneShot = Dedup.repeatedSpans(all, "doc_id", "text", n = 4)
      .filter(col("doc_id") === 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(oneShot == spans, s"one-shot $oneShot vs incremental $spans")

    // a third drain with nothing new: no growth anywhere
    val spanCount = spark.read.parquet(spansDir).count()
    val indexCount = spark.read.parquet(index).count()
    StreamingSpanDedup.drain(spark, src, index, spansDir, ckpt,
      "doc_id", "text", schema, n = 4)
    assert(spark.read.parquet(spansDir).count() == spanCount)
    assert(spark.read.parquet(index).count() == indexCount)
  }

  test("incrementalRepeatedSpans counts a replayed doc once (idempotent df)") {
    // doc 5's windows are already in the index (a replay after checkpoint
    // loss): the union df must count doc 5 once, so a window seen only in
    // doc 5 stays below minDf=2 and nothing is flagged
    val docs = Seq((5L, doc(1 to 12))).toDF("doc_id", "text")
    val index = Dedup.spanHashIndex(docs, "doc_id", "text", n = 4)
    val flagged = Dedup.incrementalRepeatedSpans(docs, "doc_id", "text",
      index, n = 4, minDf = 2)
    assert(flagged.count() == 0,
      "a doc probed against its own index rows must not self-flag")

    // but a genuine second doc sharing the run DOES flag against the index
    val other = Seq((6L, doc(1 to 12))).toDF("doc_id", "text")
    val spans = Dedup.incrementalRepeatedSpans(other, "doc_id", "text",
        index, n = 4, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(spans == Seq((6L, 0L, 12L)))
  }
}
