package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    spark.range(n).select(col("id"),
      // 4 strata with a 4:2:1:1 skew — stratum is a pure function of id
      when(col("id") % 8 < 4, "en").when(col("id") % 8 < 6, "de")
        .when(col("id") % 8 === 6, "fr").otherwise("es").as("lang"),
      (col("id") % 16).cast("string").as("shard"))

  test("stratifiedSample hits per-stratum rates within binomial tolerance") {
    val n = 8000
    val out = Sampling.stratifiedSample(corpus(n), "lang", "id",
      rates = Map("en" -> 0.1, "de" -> 0.8), defaultRate = 0.5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // per-stratum sizes: en=4000, de=2000, fr=1000, es=1000; tolerance ~5σ
    assert(math.abs(out("en") - 400.0) < 5 * math.sqrt(4000 * 0.1 * 0.9))
    assert(math.abs(out("de") - 1600.0) < 5 * math.sqrt(2000 * 0.8 * 0.2))
    assert(math.abs(out("fr") - 500.0) < 5 * math.sqrt(1000 * 0.25))
    assert(math.abs(out("es") - 500.0) < 5 * math.sqrt(1000 * 0.25))
  }

  test("sampling is deterministic and tag-keyed draws are independent") {
    val df = corpus(2000)
    val a = Sampling.stratifiedSample(df, "lang", "id", Map(), 0.5, tag = "t1")
      .select("id").as[Long].collect().toSet
    val b = Sampling.stratifiedSample(df, "lang", "id", Map(), 0.5, tag = "t1")
      .select("id").as[Long].collect().toSet
    val c = Sampling.stratifiedSample(df, "lang", "id", Map(), 0.5, tag = "t2")
      .select("id").as[Long].collect().toSet
    assert(a == b, "same tag must reselect the identical corpus")
    // independent 50% draws overlap in ~25% of rows, not ~50%
    val overlap = (a & c).size.toDouble / 2000
    assert(overlap > 0.15 && overlap < 0.35,
      s"t1/t2 overlap $overlap should look independent (~0.25)")
  }

  test("mixtureRebalance achieves the target mixture; binding stratum kept whole") {
    val n = 8000
    val out = Sampling.mixtureRebalance(corpus(n), "lang", "id",
      weights = Map("en" -> 0.25, "de" -> 0.25, "fr" -> 0.25, "es" -> 0.25))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // equal target weights: c = min(n_s/w_s) binds at fr/es (1000 docs) →
    // every stratum should land near 1000 selected
    assert(out("fr") == 1000L, "binding stratum must be kept whole (rate 1)")
    assert(out("es") == 1000L)
    assert(math.abs(out("en") - 1000.0) < 5 * math.sqrt(1000.0))
    assert(math.abs(out("de") - 1000.0) < 5 * math.sqrt(1000.0))
  }

  test("mixtureRebalance with sizeCol targets token shares, not doc shares") {
    // en docs are 10× longer than de docs: token-weighted equal targets must
    // keep far FEWER en docs than doc-weighted ones
    val df = corpus(4000).filter(col("lang").isin("en", "de"))
      .withColumn("tokens", when(col("lang") === "en", 1000L).otherwise(100L))
    val out = Sampling.mixtureRebalance(df, "lang", "id",
      weights = Map("en" -> 0.5, "de" -> 0.5), sizeCol = Some("tokens"))
    val toks = out.groupBy("lang").agg(sum("tokens").as("t"))
      .as[(String, Long)].collect().toMap
    // token masses: en = 2000 docs × 1000, de = 1000 × 100; binding stratum
    // de (smaller token mass per weight) kept whole; en sampled to ≈100k toks
    assert(toks("de") == 100000L, "binding stratum kept whole in token space")
    assert(math.abs(toks("en") - 100000.0) < 5 * math.sqrt(100) * 1000,
      s"en token mass ${toks("en")} should target de's 100k")
    // doc-weighted rebalance on the same input keeps ~10× more en tokens
    val docWeighted = Sampling.mixtureRebalance(df, "lang", "id",
      weights = Map("en" -> 0.5, "de" -> 0.5))
      .filter(col("lang") === "en").agg(sum("tokens")).as[Long].head()
    assert(docWeighted > 5 * toks("en"),
      "doc-count weighting over-keeps the long-doc stratum")
  }

  test("mixtureRebalance drops strata without a weight") {
    val out = Sampling.mixtureRebalance(corpus(800), "lang", "id",
      weights = Map("en" -> 1.0, "de" -> 1.0))
      .select("lang").distinct().as[String].collect().toSet
    assert(out == Set("en", "de"))
  }

  test("sequencePack: contiguous token layout, bounded offsets, span counts") {
    val toks = corpus(500)
      .select(col("id"), col("shard"), (col("id") % 300 + 1).cast("int").as("n_tokens"))
    val seqLen = 128
    val packed = Sampling.sequencePack(toks, "shard", "id", "n_tokens", seqLen)
      .select("id", "shard", "n_tokens", "seq_id", "seq_offset", "n_seqs")
      .as[(Long, String, Int, Long, Long, Long)].collect()

    assert(packed.length == 500, "packing drops nothing")
    packed.foreach { case (id, _, nt, seqId, off, nSeqs) =>
      assert(off >= 0 && off < seqLen, s"doc $id offset $off out of range")
      assert(seqId >= 0 && nSeqs >= 1)
      // span math: a doc starting at offset `off` with nt tokens covers
      // exactly ceil((off + max(nt,1)) / seqLen) sequences from seq_id
      val expectSpan =
        (off + math.max(nt, 1) + seqLen - 1) / seqLen
      assert(nSeqs == expectSpan, s"doc $id: n_seqs $nSeqs != $expectSpan")
    }
    // per shard: starts are contiguous (each doc starts where the previous
    // ended) — the invariant that makes the packing a valid token stream
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._1)
      ordered.sliding(2).foreach {
        case Array((_, _, nt, s1, o1, _), (_, _, _, s2, o2, _)) =>
          val endPrev = s1 * seqLen + o1 + nt
          assert(s2 * seqLen + o2 == endPrev, "token stream must be contiguous")
        case _ => ()
      }
    }
  }

  test("shardByTokens: distributed prefix sum equals the single-window cumsum") {
    val toks = corpus(2000)
      .select(col("id"), (col("id") % 97 + 1).cast("long").as("n_tokens"))
    val target = 500L
    val out = Sampling.shardByTokens(toks, "id", "n_tokens", target,
      nRanges = 8)
      .select("id", "n_tokens", "token_start", "shard")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 2000, "sharding drops nothing")
    // exact equivalence with the sequential scan (what one window computes)
    var cum = 0L
    out.foreach { case (id, nt, start, shard) =>
      assert(start == cum, s"doc $id token_start $start != $cum")
      assert(shard == start / target, s"doc $id shard mismatch")
      cum += nt
    }
    // shard token totals are bounded by target + one straddling doc
    val maxDoc = out.map(_._2).max
    out.groupBy(_._4).values.foreach { docs =>
      val total = docs.map(_._2).sum
      assert(total <= target + maxDoc)
    }
    // shard ids are dense and nondecreasing in doc order
    assert(out.map(_._4).sliding(2).forall {
      case Array(a, b) => b >= a && b - a <= 1; case _ => true
    })
  }

  test("temperatureRebalance flattens toward n^alpha; smallest stratum kept whole") {
    val df = corpus(8000) // en:4000 de:2000 fr:1000 es:1000
    // alpha = 1: identity — every row kept (all rates exactly 1)
    assert(Sampling.temperatureRebalance(df, "lang", "id", alpha = 1.0)
      .count() == 8000)
    // alpha = 0.5: kept_s = n_s * sqrt(n_min/n_s) = sqrt(n_min * n_s)
    val out = Sampling.temperatureRebalance(df, "lang", "id", alpha = 0.5)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("fr") == 1000 && counts("es") == 1000,
      "rate-1 strata must be kept whole, deterministically")
    def within(actual: Long, expect: Double): Boolean =
      math.abs(actual - expect) <= 4 * math.sqrt(expect)
    assert(within(counts("en"), 2000), s"en kept ${counts("en")}")
    assert(within(counts("de"), math.sqrt(1000.0 * 2000)), s"de kept ${counts("de")}")
  }

  test("exactKPerStratum keeps exactly min(k, n) rows per stratum, rank-limited") {
    val df = corpus(4000) // en:2000 de:1000 fr:500 es:500
    val out = Sampling.exactKPerStratum(df, "lang", "id", k = 700)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 700L, "de" -> 700L, "fr" -> 500L, "es" -> 500L))
    // deterministic: same call selects the identical id set
    val ids1 = out.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.exactKPerStratum(df, "lang", "id", k = 700)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // a different tag draws an (almost surely) different set
    val ids3 = Sampling.exactKPerStratum(df, "lang", "id", k = 700, tag = "v2")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 != ids3)
    // the rank filter plans as a group-limit, not a full stratum sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("weightedSampleK: inclusion tracks weight, deterministic, top-k plan") {
    import spark.implicits._
    // 400 light rows (w=1) vs 400 heavy rows (w=20): the heavy half must
    // dominate a k=100 draw (E-S inclusion ∝ weight for k ≪ n)
    val df = ((1 to 400).map(i => (i.toLong, 1L)) ++
      (401 to 800).map(i => (i.toLong, 20L))).toDF("id", "w")
    val picked = Sampling.weightedSampleK(df, "id", "w", k = 100)
      .select("id").as[Long].collect().toSet
    assert(picked.size == 100)
    val heavy = picked.count(_ > 400)
    assert(heavy >= 80, s"heavy-weight rows got only $heavy of 100 slots")
    // deterministic re-run; equal weights ≈ uniform (straddles both halves)
    assert(Sampling.weightedSampleK(df, "id", "w", k = 100)
      .select("id").as[Long].collect().toSet == picked)
    val uni = Sampling.weightedSampleK(
        df.withColumn("w", lit(7L)), "id", "w", k = 100)
      .select("id").as[Long].collect().toSet
    val uniHeavy = uni.count(_ > 400)
    assert(uniHeavy >= 30 && uniHeavy <= 70, s"uniform draw came out $uniHeavy")
    // null/zero/negative weights carry no mass; k >= n keeps all positives
    val edge = Seq((1L, Some(5L)), (2L, None), (3L, Some(0L)), (4L, Some(-3L)))
      .toDF("id", "w")
    assert(Sampling.weightedSampleK(edge, "id", "w", k = 10)
      .select("id").as[Long].collect().toSeq == Seq(1L))
    // plans as a per-task top-k frontier, no window operator
    val plan = Sampling.weightedSampleK(df, "id", "w", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k:\n$plan")
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
    // mergeable like bottomK: keys are per-row pure functions, so per-shard
    // samples trim-union into the whole-corpus sample
    val whole = picked
    val merged = Sampling.weightedSampleK(
        Sampling.weightedSampleK(df.filter(col("id") <= 400), "id", "w", 100)
          .union(Sampling.weightedSampleK(df.filter(col("id") > 400),
            "id", "w", 100)),
        "id", "w", 100)
      .select("id").as[Long].collect().toSet
    assert(merged == whole)
  }

  test("weightedSampleKPerGroup: equal budgets, weight skew within, partial limit") {
    import spark.implicits._
    // two groups; within each, heavy rows carry 20× the weight
    val df = (1 to 800).map { i =>
      val g = if (i <= 400) "a" else "b"
      val w = if (i % 2 == 0) 20L else 1L
      (i.toLong, g, w)
    }.toDF("id", "g", "w")
    val got = Sampling.weightedSampleKPerGroup(df, "g", "id", "w", k = 50)
      .select("id", "g").as[(Long, String)].collect()
    assert(got.count(_._2 == "a") == 50 && got.count(_._2 == "b") == 50)
    val heavy = got.count(_._1 % 2 == 0)
    assert(heavy >= 80, s"heavy rows got only $heavy of 100 slots")
    // deterministic; selection within a group matches the solo draw on it
    val soloA = Sampling.weightedSampleK(df.filter(col("g") === "a"),
        "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    assert(got.filter(_._2 == "a").map(_._1).toSet == soloA)
    // rank-limit evaluated as a Partial WindowGroupLimit before the shuffle
    val plan = Sampling.weightedSampleKPerGroup(df, "g", "id", "w", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected group limit:\n$plan")
    assert(plan.contains("Partial"), s"expected partial mode:\n$plan")
  }

  test("sampling filters contain no shuffle (pure per-row gate)") {
    val plan = Sampling.stratifiedSample(corpus(100), "lang", "id", Map("en" -> 0.2), 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stratified sample must not shuffle:\n$plan")
  }

  test("exportTokenShards lays docs end-to-end as little-endian u16 per shard") {
    val dir = java.nio.file.Files.createTempDirectory("tok-export").toString
    // two shards; shard 0's docs arrive out of order across partitions
    val df = Seq(
      (0L, 0L, Seq(1L, 258L)),        // shard 0, first:  0x0001, 0x0102
      (1L, 0L, Seq(65535L)),          // shard 0, second: 0xFFFF
      (2L, 1L, Seq(7L, 8L, 9L))       // shard 1
    ).toDF("doc_id", "shard", "toks")
    Sampling.exportTokenShards(df.repartition(3), "shard", "doc_id", "toks", dir)

    def bytes(f: String) =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, f))
    // doc 0 (ids 1, 258) then doc 1 (id 65535), each id 2 bytes LE
    assert(bytes("shard-0.bin").toSeq ==
      Seq[Byte](1, 0, 2, 1, -1, -1))
    assert(bytes("shard-1.bin").toSeq == Seq[Byte](7, 0, 8, 0, 9, 0))

    // the engine's own u16 source reads the export back: row_index is the
    // token's offset within its shard — loader addressing for free
    val back = spark.read.format("graft-clock")
      .option("format", "u16").option("channels", "1")
      .load(dir + "/*.bin")
      .select(col("file"), col("row_index"), col("samples")(0).cast("long"))
      .collect().map(r => (r.getString(0).split('/').last, r.getLong(1), r.getLong(2)))
    assert(back.filter(_._1 == "shard-0.bin").sortBy(_._2).map(_._3).toSeq ==
      Seq(1L, 258L, 65535L))
    assert(back.filter(_._1 == "shard-1.bin").sortBy(_._2).map(_._3).toSeq ==
      Seq(7L, 8L, 9L))

    // ids outside u16 fail loudly — never a silent truncation
    val over = Seq((0L, 0L, Seq(65536L))).toDF("doc_id", "shard", "toks")
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    val ex = intercept[Exception] {
      Sampling.exportTokenShards(over, "shard", "doc_id", "toks",
        java.nio.file.Files.createTempDirectory("tok-export-bad").toString)
    }
    assert(messages(ex).contains("u16"))

    // a null ELEMENT inside the id array fails loudly too — boxed access
    // would otherwise unbox it to token id 0 and silently corrupt the shard
    val nullElem = Seq((0L, 0L, Seq[java.lang.Long](1L, null, 3L)))
      .toDF("doc_id", "shard", "toks")
    val exNull = intercept[Exception] {
      Sampling.exportTokenShards(nullElem, "shard", "doc_id", "toks",
        java.nio.file.Files.createTempDirectory("tok-export-null").toString)
    }
    assert(messages(exNull).contains("null token id"))

    // array<int> input exports identically (cast, not ClassCastException)
    val intDir = java.nio.file.Files.createTempDirectory("tok-export-int").toString
    Sampling.exportTokenShards(
      Seq((0L, 0L, Seq(1, 258))).toDF("doc_id", "shard", "toks"),
      "shard", "doc_id", "toks", intDir)
    assert(bytesAt(intDir, "shard-0.bin").toSeq == Seq[Byte](1, 0, 2, 1))
  }

  private def bytesAt(dir: String, f: String) =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, f))

  // ---- token-window chunking ----

  /** Driver replay of the pinned chunking semantics. */
  private def bruteChunks(text: String, maxT: Int, ov: Int)
      : Seq[(Long, String, Long)] = {
    val ws = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val step = maxT - ov
    if (ws.isEmpty) return Nil
    Iterator.from(0).map(_ * step)
      .takeWhile(s => s < ws.size && (s == 0 || s - step + maxT < ws.size))
      .zipWithIndex
      .map { case (s, i) =>
        (i.toLong, ws.slice(s, s + maxT).mkString(" "),
          math.min(maxT, ws.size - s).toLong)
      }.toSeq
  }

  test("chunkByTokens equals the driver replay on the real corpus; map-only plan") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val chunked = Sampling.chunkByTokens(docs, "doc_id", "text",
      maxTokens = 32, overlap = 8)
    val got = chunked.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    val want = docs.collect().flatMap { r =>
      bruteChunks(r.getString(1), 32, 8).map { case (cid, t, n) =>
        (r.getLong(0), cid) -> (t, n)
      }
    }.toMap
    assert(got == want)
    assert(got.keys.exists(_._2 >= 2), "no doc produced 3+ chunks — fixture toothless")
    // chunking must never shuffle
    val plan = chunked.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking shuffled:\n$plan")
  }

  test("chunkByTokens: reconstruction, tail suppression, degenerate docs") {
    import spark.implicits._
    val words56 = (1 to 56).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words56), (2L, "a b c"), (3L, "   "), (4L, ""))
      .toDF("doc_id", "text")
    val got = Sampling.chunkByTokens(docs, "doc_id", "text", 32, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    // doc 1: starts 0, 24; start 48 suppressed (prev chunk reaches 56)
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L))
    assert(d1(0)._4 == 32 && d1(1)._4 == 32)
    // overlap-dropped concatenation reconstructs the document exactly
    val rebuilt = (d1(0)._3.split(" ") ++ d1(1)._3.split(" ").drop(8)).toSeq
    assert(rebuilt == (1 to 56).map(i => s"w$i"))
    // short doc: one chunk, whole text; empty/whitespace docs: nothing
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "a b c", 3L)))
    assert(!got.exists(r => r._1 == 3L || r._1 == 4L))
  }
}
