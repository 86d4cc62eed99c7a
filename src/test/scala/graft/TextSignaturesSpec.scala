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

  test("minhash estimates track exact Jaccard (mean error bound); " +
    "a single-seed family violates the bound") {
    // Signature QUALITY pin, not value equality: across pairs spanning the
    // whole Jaccard range, the 64-hash estimate must track the exact
    // 3-shingle Jaccard within the family's statistical error
    // (se = sqrt(J(1-J)/64) <= 0.0625). The DuckDB oracle mirrors the
    // construction and so can never catch an engine-mirrored degeneracy —
    // this bound can: the r4-class single-seed family estimates only {0, 1}
    // and blows the same bound (asserted below).
    val base = (0 until 60).map(i => s"w$i")
    val docs = (0 to 9).map { j =>
      // replace the first 6*j words: exact Jaccard sweeps ~1.0 down to ~0.05
      val repl = base.zipWithIndex.map { case (w, i) => if (i < 6 * j) s"x${j}_$i" else w }
      (j.toLong, repl.mkString(" "))
    }
    def shingleSet(text: String): Set[String] =
      text.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val exactJ = docs.map { case (j, text) =>
      val a = shingleSet(docs.head._2); val b = shingleSet(text)
      j -> (a & b).size.toDouble / (a | b).size
    }.toMap

    val sigs = Dedup.minhashSignaturesFused(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        numHashes = 64, shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def estimate(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length

    val errs = (1 to 9).map { j =>
      math.abs(estimate(sigs(0L), sigs(j.toLong)) - exactJ(j.toLong))
    }
    val meanErr = errs.sum / errs.length
    assert(meanErr <= 0.06, s"mean |estimate - exact| $meanErr exceeds 0.06")
    assert(errs.max <= 0.2, s"max |estimate - exact| ${errs.max} exceeds 0.2")

    // Deliberately-degenerate control: every component the SAME seed — the
    // statistical signature of the r4 bug. Its estimates are 0/1 step
    // functions and the mean error explodes past the bound, so the bound
    // has teeth.
    val degSigs = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.HashFunctions.minhashSignature(
          graft.functions.TextFunctions.normalizeForDedup(col("text")),
          numHashes = 1, shingleN = 3).as("m1"))
      .collect().map(r => r.getLong(0) -> Seq.fill(64)(r.getSeq[Long](1).head)).toMap
    val degErrs = (1 to 9).map { j =>
      math.abs(estimate(degSigs(0L), degSigs(j.toLong)) - exactJ(j.toLong))
    }
    val degMean = degErrs.sum / degErrs.length
    assert(degMean > 0.06,
      s"single-seed family mean error $degMean passed the bound — bound is toothless")
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

  test("fused distinct-shingle SET == composed explode/window/distinct shape") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .unionByName(edgeDocs)
    for (n <- Seq(1, 3)) {
      // composed executable specification: the pre-fusion token-set shape
      val composed =
        (if (n == 1)
          docs.select(col("doc_id"),
            explode(array_distinct(filter(
              split(graft.functions.TextFunctions.normalizeForDedup(col("text")), " "),
              w => length(w) > 0))).as("t"))
        else {
          val words = docs.select(col("doc_id"),
            posexplode(split(
              graft.functions.TextFunctions.normalizeForDedup(col("text")), " "))
              .as(Seq("pos", "w")))
          val wdw = org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy("pos")
          val parts = col("w") +: (1 until n).map(k => lead(col("w"), k).over(wdw))
          words.select(col("doc_id"), concat_ws(" ", parts: _*).as("t"),
              parts.last.isNotNull.as("c"))
            .filter(col("c")).select("doc_id", "t").distinct()
        }).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val fused = docs.select(col("doc_id"),
          explode(graft.functions.TextFunctions.distinctShinglesFused(
            graft.functions.TextFunctions.normalizeForDedup(col("text")), n))
            .as("t"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(fused == composed, s"n=$n")
      assert(fused.nonEmpty)
    }
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
