package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Populate}

/** Incremental near-dup over a persisted LSH bucket index: batches are
  * bucketed once, checked against the corpus index without re-hashing the
  * corpus, and appended idempotently so ingest epochs compose.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def doc(words: Range, subst: Map[Int, String] = Map.empty): String =
    words.map(i => subst.getOrElse(i, s"word$i")).mkString(" ")

  test("batches check against the index, pair within themselves, and compose") {
    val indexPath = java.nio.file.Files
      .createTempDirectory("lsh_index").toString + "/buckets"

    // corpus: three distinct docs
    val corpus = Seq(
      (1L, doc(1 to 60)),
      (2L, doc(100 to 160)),
      (3L, doc(200 to 260))).toDF("doc_id", "text")
    val corpusBuckets = Dedup.lshBuckets(corpus, "doc_id", "text")
    assert(Populate.appendIdempotent(corpusBuckets, indexPath, Seq("doc_id", "band")) > 0)

    // batch 1: near-dup of corpus doc 1, a new-vs-new near-dup pair, one unrelated
    val batch1 = Seq(
      (10L, doc(1 to 60, Map(30 -> "CHANGED"))),
      (11L, doc(300 to 360)),
      (12L, doc(300 to 360, Map(330 -> "CHANGED"))),
      (13L, doc(400 to 460))).toDF("doc_id", "text")
    val b1 = Dedup.lshBuckets(batch1, "doc_id", "text")
    val cands1 = Dedup.incrementalCandidates(b1,
        spark.read.parquet(indexPath), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands1.contains((1L, 10L)), s"corpus-vs-new pair missing: $cands1")
    assert(cands1.contains((11L, 12L)), s"new-vs-new pair missing: $cands1")
    assert(!cands1.exists(p => p._1 == 13L || p._2 == 13L), s"unrelated doc paired: $cands1")
    assert(!cands1.contains((1L, 2L)), "corpus-vs-corpus pairs must not reappear")

    // appending the batch is idempotent
    assert(Populate.appendIdempotent(b1, indexPath, Seq("doc_id", "band")) > 0)
    assert(Populate.appendIdempotent(b1, indexPath, Seq("doc_id", "band")) == 0)

    // batch 2 pairs against a BATCH-1 doc through the updated index
    val batch2 = Seq((20L, doc(300 to 360, Map(340 -> "ALSO")))).toDF("doc_id", "text")
    val cands2 = Dedup.incrementalCandidates(Dedup.lshBuckets(batch2, "doc_id", "text"),
        spark.read.parquet(indexPath), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands2.contains((11L, 20L)) && cands2.contains((12L, 20L)),
      s"epoch composition broken: $cands2")

    // REPROCESSING after a checkpoint loss: batch 1's docs are already in
    // the index, so its in-batch pairs come back via the corpus path — they
    // must arrive CANONICALIZED (id_a < id_b) or the idempotent append
    // would treat the reversed orientation as a new pair
    val reprocessed = Dedup.incrementalCandidates(b1,
        spark.read.parquet(indexPath), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(reprocessed.forall { case (a, b) => a < b },
      s"non-canonical pair orientation: ${reprocessed.toSeq}")
    assert(reprocessed.toSet.contains((11L, 12L)))
    assert(!reprocessed.toSet.contains((12L, 11L)))
  }

  test("incremental composes: split ingestion finds exactly the one-shot pairs") {
    // seeded random corpus with planted near-dups scattered across the split
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 80).map(i => s"w$i")
    def randDoc() = Seq.fill(50)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (1L to 20L).map(i => (i, randDoc()))
    val nearDups = bases.take(6).map { case (i, t) =>
      val words = t.split(' '); words(25) = "MUTATED"
      (i + 1000L, words.mkString(" "))
    }
    val all = (bases ++ nearDups).toList
    val oneShot = Dedup.lshCandidates(
        Dedup.minhashSignaturesFused(all.toDF("doc_id", "text"), "doc_id", "text",
          numHashes = 32, shingleN = 3), "doc_id", bands = 8, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // split: first 13 docs become the index, the rest arrive as a batch
    val (corpus, batch) = all.splitAt(13)
    val ixBuckets = Dedup.lshBuckets(corpus.toDF("doc_id", "text"), "doc_id", "text")
    val newBuckets = Dedup.lshBuckets(batch.toDF("doc_id", "text"), "doc_id", "text")
    val incremental = Dedup.incrementalCandidates(newBuckets, ixBuckets, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ixInternal = Dedup.lshCandidates(
        Dedup.minhashSignaturesFused(corpus.toDF("doc_id", "text"), "doc_id", "text",
          numHashes = 32, shingleN = 3), "doc_id", bands = 8, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // incremental(batch | index) + pairs already internal to the index
    // reconstruct the one-shot candidate set exactly
    assert((incremental ++ ixInternal) == oneShot,
      s"composability broken:\n one-shot=$oneShot\n split=${incremental ++ ixInternal}")
    assert(oneShot.nonEmpty) // the planted near-dups actually collide
  }

  test("flooded index buckets are capped by document frequency") {
    val text = doc(1 to 40)
    // six identical corpus docs share every bucket
    val corpusBuckets = Dedup.lshBuckets(
      (1L to 6L).map(i => (i, text)).toDF("doc_id", "text"), "doc_id", "text")
    val batch = Dedup.lshBuckets(
      Seq((100L, doc(1 to 40, Map(20 -> "CHANGED")))).toDF("doc_id", "text"),
      "doc_id", "text")
    // cap below the flood: no candidates from the boilerplate buckets
    assert(Dedup.incrementalCandidates(batch, corpusBuckets, "doc_id",
      maxBucket = 5).count() == 0)
    // generous cap: the near-dup pairs surface
    val found = Dedup.incrementalCandidates(batch, corpusBuckets, "doc_id",
        maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == (1L to 6L).map(i => (i, 100L)).toSet, s"got $found")
  }
}
