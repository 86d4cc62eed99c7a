package graft

import scala.collection.mutable

import org.apache.spark.sql.functions.sum

import graft.functions.TextFunctions
import graft.operators.Vocab
import graft.operators.Vocab.BpeMerge

/** BPE merge-rule training + encoding: differential against a driver-side
  * reference implementation (word-type counts, argmax with the (count desc,
  * pair asc) tie rule, leftmost non-overlapping merge that never rescans a
  * token it just produced) on fixed corpora with planted overlap/tie cases
  * and on seeded random corpora.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- driver-side reference ------------------------------------------

  private def refMergePass(syms: List[String], a: String, b: String)
      : List[String] = {
    val out = mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refWords(texts: Seq[String]): Seq[String] =
    texts.flatMap(t =>
      TextFunctions.normalizeForDedupJvm(t).split(" ").filter(_.nonEmpty))

  private def refTrain(texts: Seq[String], nMerges: Int): Seq[BpeMerge] = {
    var wt: Map[String, (List[String], Long)] = refWords(texts)
      .filter(_.length >= 2)
      .groupBy(identity)
      .map { case (w, ws) =>
        w -> (w.map(_.toString).toList, ws.size.toLong)
      }
    val merges = mutable.ArrayBuffer.empty[BpeMerge]
    var r = 1
    var drained = false
    while (r <= nMerges && !drained) {
      val counts = mutable.Map.empty[(String, String), Long]
      wt.values.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) drained = true
      else {
        val ((a, b), c) = counts.toSeq
          .sortBy { case ((l, rr), cc) => (-cc, l, rr) }.head
        merges += BpeMerge(r, a, b, c)
        wt = wt.map { case (w, (syms, f)) => w -> (refMergePass(syms, a, b), f) }
        r += 1
      }
    }
    merges.toSeq
  }

  private def refEncode(text: String, merges: Seq[BpeMerge]): List[String] =
    refWords(Seq(text)).toList.flatMap { w =>
      var syms = w.map(_.toString).toList
      merges.sortBy(_.step).foreach { m =>
        if (syms.length > 1) syms = refMergePass(syms, m.left, m.right)
      }
      syms
    }

  // ---- fixed corpora ---------------------------------------------------

  test("trainBpe matches reference incl. overlap runs and count ties") {
    // "aaaa" plants overlapping (a,a) pairs (3 occurrences, 2 mergeable);
    // "xy"/"yx" plants a count tie broken on the pair strings
    val texts = Seq("low lower lowest aaaa", "low lower xy yx", "aaaa xy yx")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Vocab.trainBpe(docs, "text", nMerges = 10)
    assert(got == refTrain(texts, 10))
  }

  test("trainBpe stops early when every word is fully merged") {
    val texts = Seq("ab ab ab", "ab")
    val docs = texts.map(Tuple1(_)).toDF("text")
    val got = Vocab.trainBpe(docs, "text", nMerges = 50)
    // "ab" needs exactly one merge; afterwards no pairs remain
    assert(got == Seq(BpeMerge(1, "a", "b", 4L)))
  }

  test("encodeBpe matches reference and round-trips the normalized text") {
    val texts = Seq("low lower lowest aaaa", "low lower xy yx", "aaaa xy yx",
      "unseen wordz")
    val train = texts.take(3)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Vocab.trainBpe(
      docs.filter($"doc_id" < 3), "text", nMerges = 6)
    assert(merges == refTrain(train, 6))
    val got = Vocab.encodeBpe(docs, "doc_id", "text", merges)
      .orderBy("doc_id").select("doc_id", "text", "subwords")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toList))
    got.foreach { case (_, text, subwords) =>
      assert(subwords == refEncode(text, merges))
      // concatenation reconstructs the normalized words exactly
      assert(subwords.mkString == TextFunctions.normalizeForDedupJvm(text)
        .split(" ").filter(_.nonEmpty).mkString)
    }
  }

  test("trainBpeFromCounts over merged shard counts equals one-shot training") {
    val texts = Seq("low lower lowest aaaa", "low lower xy yx", "aaaa xy yx")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val oneShot = Vocab.trainBpe(docs, "text", nMerges = 6)
    // shard-wise counts merged by plain summation
    val merged = (0 until 3).map(i =>
        Vocab.wordCounts(docs.filter($"doc_id" === i.toLong), "text"))
      .reduce(_ unionByName _)
      .groupBy("word").agg(sum($"freq").as("freq"))
    assert(Vocab.trainBpeFromCounts(merged, "word", "freq", 6) == oneShot)
  }

  test("StreamingVocab drain accumulates one-shot counts; checkpoint loss cannot double-count") {
    import org.apache.spark.sql.types._
    val texts = (1 to 30).map(i => s"banana band bandana split $i") ++
      (31 to 60).map(i => s"tartan tarpit tar pit $i")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("stream_vocab")
    val src = root.resolve("incoming").toString
    val counts = root.resolve("counts").toString
    val ckpt = root.resolve("ckpt").toString
    java.nio.file.Files.createDirectories(root.resolve("incoming"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    docs.filter($"doc_id" < 25).write.mode("append").parquet(src)
    graft.streaming.StreamingVocab.trainDrain(spark, src, counts, ckpt,
      "text", schema)
    docs.filter($"doc_id" >= 25).write.mode("append").parquet(src)
    graft.streaming.StreamingVocab.trainDrain(spark, src, counts, ckpt,
      "text", schema)

    val loaded = graft.streaming.StreamingVocab.loadWordCounts(spark, counts)
    val loadedSum = loaded.agg(sum($"freq")).head.getLong(0) // pre-replay
    val oneShot = Vocab.trainBpe(docs, "text", nMerges = 8)
    assert(Vocab.trainBpeFromCounts(loaded, "word", "freq", 8) == oneShot)

    // checkpoint loss: a fresh checkpoint replays every file, but the
    // (src_file, word) key makes the replay land nothing new
    graft.streaming.StreamingVocab.trainDrain(spark, src, counts,
      root.resolve("ckpt2").toString, "text", schema)
    val reloaded = graft.streaming.StreamingVocab.loadWordCounts(spark, counts)
    assert(Vocab.trainBpeFromCounts(reloaded, "word", "freq", 8) == oneShot)
    assert(reloaded.agg(sum($"freq")).head.getLong(0) == loadedSum)
  }

  test("encodeDrain tokenizes waves under pinned merges; re-drain is a no-op") {
    import org.apache.spark.sql.types._
    val texts = (1 to 30).map(i => s"banana band bandana split $i") ++
      (31 to 60).map(i => s"tartan tarpit tar pit $i")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Vocab.trainBpe(docs, "text", nMerges = 6)
    val root = java.nio.file.Files.createTempDirectory("stream_encode")
    val src = root.resolve("incoming").toString
    val tokens = root.resolve("tokens").toString
    val ckpt = root.resolve("ckpt").toString
    java.nio.file.Files.createDirectories(root.resolve("incoming"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    docs.filter($"doc_id" < 25).write.mode("append").parquet(src)
    graft.streaming.StreamingVocab.encodeDrain(spark, src, tokens, ckpt,
      "doc_id", "text", schema, merges)
    assert(spark.read.parquet(tokens).count() == 25)
    docs.filter($"doc_id" >= 25).write.mode("append").parquet(src)
    graft.streaming.StreamingVocab.encodeDrain(spark, src, tokens, ckpt,
      "doc_id", "text", schema, merges)

    val streamed = spark.read.parquet(tokens)
      .collect().map(r => (r.getLong(0),
        (r.getSeq[String](1).toList, r.getLong(2)))).toMap
    val oneShot = Vocab.encodeBpe(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0),
        (r.getSeq[String](2).toList, r.getSeq[String](2).size.toLong))).toMap
    assert(streamed == oneShot)

    // re-drain with nothing new: the tokens table does not grow
    graft.streaming.StreamingVocab.encodeDrain(spark, src, tokens, ckpt,
      "doc_id", "text", schema, merges)
    assert(spark.read.parquet(tokens).count() == 60)
  }

  // ---- randomized parity ----------------------------------------------

  test("trainBpe + encodeBpe parity with reference on random corpora") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 4).foreach { _ =>
      // small alphabet → dense pair collisions, overlaps, and ties
      val texts = Seq.fill(12)(
        Seq.fill(1 + rnd.nextInt(8))(
          Seq.fill(1 + rnd.nextInt(6))("abc".charAt(rnd.nextInt(3))).mkString)
          .mkString(" "))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val n = 1 + rnd.nextInt(12)
      val merges = Vocab.trainBpe(docs, "text", nMerges = n)
      assert(merges == refTrain(texts, n),
        s"merge sequence diverged for corpus $texts")
      val got = Vocab.encodeBpe(docs, "doc_id", "text", merges)
        .orderBy("doc_id").select("text", "subwords").collect()
        .map(r => (r.getString(0), r.getSeq[String](1).toList))
      got.foreach { case (text, subwords) =>
        assert(subwords == refEncode(text, merges))
      }
    }
  }
}
