package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** The fused MinHash expression must be value-identical to the composed
  * explode→window→aggregate shape — that shape is the executable
  * specification the DuckDB oracles replay.
  */
class TextSignaturesSpec extends SparkSpec {
  import spark.implicits._

  test("fused == composed on the real corpus") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val composed = Dedup.minhashSignatures(docs, "doc_id", "text",
      numHashes = 32, shingleN = 3)
    val fused = Dedup.minhashSignaturesFused(docs, "doc_id", "text",
      numHashes = 32, shingleN = 3)
    assert(composed.count() == fused.count())
    val joined = composed.withColumnRenamed("minhash", "a")
      .join(fused.withColumnRenamed("minhash", "b"), "doc_id")
    assert(joined.count() == composed.count())
    assert(joined.filter(col("a") =!= col("b")).count() == 0)
  }

  test("fused == composed on edge cases (short, unicode, punctuation)") {
    val docs = Seq(
      (1L, ""), (2L, "one"), (3L, "two words"), (4L, "now three words"),
      (5L, "Ünïcødé tëxt — wïth Ünïcødé wörds ünd mörę"),
      (6L, "  Punct!!! heavy,,, (text)   with   [gaps]  and 42 numbers  "),
      (7L, "a a a a a a"), (8L, "x" * 300 + " y z w")
    ).toDF("doc_id", "text")
    val composed = Dedup.minhashSignatures(docs, "doc_id", "text",
        numHashes = 16, shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fused = Dedup.minhashSignaturesFused(docs, "doc_id", "text",
        numHashes = 16, shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(composed == fused)
    // docs with < 3 normalized words are absent from BOTH
    assert(!composed.contains(1L) && !composed.contains(2L) && !composed.contains(3L))
    assert(composed.contains(4L))
  }
}
