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

  // ids offset past the corpus range: the composed shapes group by id (so
  // duplicate ids would merge), the fused shapes are per-row — id
  // uniqueness is a precondition of both, not something to diff here
  private lazy val edgeDocs = {
    Seq(
      (900001L, ""), (900002L, "one"), (900003L, "two words"),
      (900004L, "now three words"),
      (900005L, "Ünïcødé tëxt — wïth Ünïcødé wörds ünd mörę"),
      (900006L, "  Punct!!! heavy,,, (text)   with   [gaps]  and 42 numbers  "),
      (900007L, "a a a a a a"), (900008L, "x" * 300 + " y z w")
    ).toDF("doc_id", "text")
  }

  test("fused == composed on edge cases (short, unicode, punctuation)") {
    val composed = Dedup.minhashSignatures(edgeDocs, "doc_id", "text",
        numHashes = 16, shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fused = Dedup.minhashSignaturesFused(edgeDocs, "doc_id", "text",
        numHashes = 16, shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(composed == fused)
    // docs with < 3 normalized words are absent from BOTH
    assert(!composed.contains(900001L) && !composed.contains(900002L) &&
      !composed.contains(900003L))
    assert(composed.contains(900004L))
  }

  test("minhash seeds are genuinely independent (no degenerate family)") {
    // REGRESSION: a narrow-offset double-hashing family (h60 + s*h28) made
    // every seed share one argmin gram — the signature was an arithmetic
    // progression and all 32 components carried ONE hash function's
    // information. Pin both symptoms away.
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val sigs = Dedup.minhashSignaturesFused(docs, "doc_id", "text",
        numHashes = 32, shingleN = 3)
      .collect().map(_.getSeq[Long](1))
    assert(sigs.length > 10)
    val arithmetic = sigs.count { s =>
      val diffs = s.sliding(2).map(p => p(1) - p(0)).toSet
      diffs.size == 1
    }
    assert(arithmetic == 0, s"$arithmetic arithmetic-progression signatures")
    // near-dup estimate behaves statistically: a pair sharing ~half its
    // shingles estimates strictly inside (0, 1) — the degenerate family
    // could only ever report 0 or 1
    import spark.implicits._
    val half = (1 to 30).map(i => s"tok$i").mkString(" ")
    val a = half + " " + (1 to 30).map(i => s"left$i").mkString(" ")
    val b = half + " " + (1 to 30).map(i => s"right$i").mkString(" ")
    val est = Dedup.minhashSignaturesFused(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text",
        numHashes = 32, shingleN = 3)
      .groupBy().pivot("doc_id").agg(first("minhash"))
      .select(Dedup.minhashJaccard("1", "2", 32).as("j"))
      .head().getDouble(0)
    assert(est > 0.05 && est < 0.95, s"estimate $est not statistical")
  }

  test("fused simhash == composed on corpus + edges") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .unionByName(edgeDocs)
    val composed = Dedup.simhashSignatures(docs, "doc_id", "text")
      .withColumnRenamed("simhash", "a")
    val fused = Dedup.simhashSignaturesFused(docs, "doc_id", "text")
      .withColumnRenamed("simhash", "b")
    val joined = composed.join(fused, "doc_id")
    assert(joined.count() == composed.count())
    assert(joined.filter(col("a") =!= col("b")).count() == 0)
  }

  test("fused winnowing == composed on corpus + edges") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .unionByName(edgeDocs)
    val composed = Dedup.winnowFingerprints(docs, "doc_id", "text")
      .withColumnRenamed("fingerprints", "a")
    val fused = Dedup.winnowFingerprintsFused(docs, "doc_id", "text")
      .withColumnRenamed("fingerprints", "b")
    assert(composed.count() == fused.count())
    val joined = composed.join(fused, "doc_id")
    assert(joined.count() == composed.count())
    assert(joined.filter(col("a") =!= col("b")).count() == 0)
  }
}
