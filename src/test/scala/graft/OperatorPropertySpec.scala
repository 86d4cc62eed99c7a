package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, IntervalJoin, Sessionize}

/** Randomized differential tests: each operator vs a brute-force in-memory
  * reference implementation over seeded random datasets (the reference repo
  * has no property tests — SURVEY.md §5; these close that gap for the
  * operators whose edge cases fixed fixtures can miss: ties, empty groups,
  * boundary-straddling intervals).
  */
class OperatorPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private def t(ms: Long) = new Timestamp(1700000000000L + ms)

  test("AsOfJoin.backward matches brute-force as-of over random data (5 trials)") {
    for (trial <- 1 to 5) {
      val keys = Seq("a", "b", "c")
      val left = (1 to 40).map(i =>
        (keys(rnd.nextInt(3)), t(rnd.nextInt(1000) * 1000L), i))
      val right = (1 to 25).map(i =>
        (keys(rnd.nextInt(3)), t(rnd.nextInt(1000) * 1000L), s"v$i"))

      val expected = left.map { case (k, lt, id) =>
        val candidates = right.filter(r => r._1 == k && !r._2.after(lt))
        val best = if (candidates.isEmpty) None
        else Some(candidates.maxBy(r => (r._2.getTime, r._3))._3)
        (k, id, best)
      }.toSet

      // tie-break determinism: brute force picks max value on equal rt; the
      // window form picks the LAST in (time, arrival) order — make right
      // times unique per key to keep the property well-defined
      val rightU = right.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq

      val expectedU = left.map { case (k, lt, id) =>
        val candidates = rightU.filter(r => r._1 == k && !r._2.after(lt))
        val best = if (candidates.isEmpty) None
        else Some(candidates.maxBy(_._2.getTime)._3)
        (k, id, best)
      }.toSet

      val got = AsOfJoin.backward(
        left.toDF("k", "lt", "id"), rightU.toDF("k", "rt", "v"),
        "lt", "rt", keys = Seq("k"), valueCols = Seq("v"))
        .select("k", "id", "v").collect()
        .map(r => (r.getString(0), r.getInt(1), Option(r.getString(2)))).toSet
      assert(got == expectedU, s"trial $trial")
    }
  }

  test("zarr write→read is the identity over random arrays, dtypes, chunkings (8 trials)") {
    for (trial <- 1 to 8) {
      val nRows = 1 + rnd.nextInt(40)
      val nCols = 1 + rnd.nextInt(6)
      val (dtype, gen): (String, () => Double) = rnd.nextInt(4) match {
        case 0 => ("<u2", () => rnd.nextInt(65536).toDouble)
        case 1 => ("<i2", () => (rnd.nextInt(65536) - 32768).toDouble)
        case 2 => ("<f4", () => rnd.nextFloat().toDouble)
        case _ => ("<f8", () => rnd.nextDouble())
      }
      val comp = Seq(None, Some("zlib"), Some("gzip"))(rnd.nextInt(3))
      val chunkRows = 1 + rnd.nextInt(nRows + 3) // exercises edge chunks
      val data = Array.fill(nRows, nCols)(gen())

      val store = java.nio.file.Files
        .createTempDirectory(s"graft-zarr-prop$trial").toString + "/a.zarr"
      graft.sources.ZarrSource.write(spark, store, data, dtype, chunkRows, comp)
      val back = graft.sources.ZarrSource.read(spark, store)
        .orderBy("row_index").collect()
        .map(_.getSeq[Double](2).toArray)

      assert(back.length == nRows, s"trial $trial: rows")
      for (r <- 0 until nRows; c <- 0 until nCols) {
        val tol = if (dtype == "<f4") 1e-7 * math.max(1.0, math.abs(data(r)(c))) else 0.0
        assert(math.abs(back(r)(c) - data(r)(c)) <= tol,
          s"trial $trial ($dtype, chunk $chunkRows, $comp) at ($r,$c)")
      }
    }
  }

  test("AVI build→parse round-trips counts, dims, and stride sampling (8 trials)") {
    def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(15)
      val w = 8 + rnd.nextInt(50)
      val h = 8 + rnd.nextInt(30)
      val stride = 1 + rnd.nextInt(6)
      val avi = graft.sources.AviMjpeg.build(
        (0 until n).map(i => jpeg(w, h, i * 1234567)), w, h,
        fps = 1 + rnd.nextInt(99))
      val (info, frames) = graft.sources.AviMjpeg.parseBytes(avi, stride).get
      assert(info.width == w && info.height == h && info.totalFrames == n,
        s"trial $trial header")
      assert(frames.map(_.index) == (0L until n by stride).toVector,
        s"trial $trial stride")
      frames.foreach { f =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(f.jpeg))
        assert(img != null && img.getWidth == w && img.getHeight == h,
          s"trial $trial frame decode")
      }
    }
  }

  test("WAV build→decode round-trips header metadata over random shapes (8 trials)") {
    for (trial <- 1 to 8) {
      val ch = 1 + rnd.nextInt(2)
      val nFrames = 1 + rnd.nextInt(500)
      val rate = Seq(8000, 16000, 44100)(rnd.nextInt(3))
      val samples = Array.fill(nFrames * ch)((rnd.nextInt(65536) - 32768).toShort)
      val wav = graft.operators.Multimodal.buildWavPcm16(samples, rate, ch)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      try {
        assert(in.getFormat.getChannels == ch && in.getFrameLength == nFrames.toLong
          && in.getFormat.getSampleRate == rate.toFloat, s"trial $trial")
      } finally in.close()
    }
  }

  test("overlapBucketed matches brute-force overlap across bucket widths (5 trials)") {
    for (trial <- 1 to 5) {
      val left = (1 to 30).map { i =>
        val s = rnd.nextInt(2000).toLong; (i.toLong, s, s + rnd.nextInt(300))
      }
      val right = (1 to 30).map { i =>
        val s = rnd.nextInt(2000).toLong; (i.toLong, s, s + rnd.nextInt(300))
      }
      val expected = (for {
        (li, ls, le) <- left
        (ri, rs, re) <- right
        if ls <= re && rs <= le
      } yield (li, ri)).toSet

      val width = Seq(7L, 64L, 1024L)(trial % 3) // incl. widths ≪ and ≫ interval size
      val got = IntervalJoin.overlapBucketed(
        left.toDF("lid", "ls", "le"), right.toDF("rid", "rs", "re"),
        "ls", "le", "rs", "re", bucketWidth = width,
        leftKeys = Seq("lid"), rightKeys = Seq("rid"))
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"trial $trial width $width")
    }
  }

  test("Sessionize.byGap matches brute-force sessionization (5 trials)") {
    for (trial <- 1 to 5) {
      val events = (1 to 50).map(i => ("u", t(rnd.nextInt(100000) * 1000L)))
        .distinct.sortBy(_._2.getTime)
      val gapS = 60L + rnd.nextInt(600)

      var sid = -1L; var prev: Option[Long] = None
      val expected = events.map { case (k, ts) =>
        if (prev.forall(p => ts.getTime - p > gapS * 1000)) sid += 1
        prev = Some(ts.getTime)
        (ts, sid)
      }.toMap

      val got = Sessionize.byGap(events.toDF("k", "ts"), "ts", Seq("k"), gapS)
        .select("ts", "session_id").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(got == expected, s"trial $trial gap $gapS")
    }
  }

  test("shardByTokens matches the sequential scan over random sizes and range counts (5 trials)") {
    for (trial <- 1 to 5) {
      val n = 200 + rnd.nextInt(1800)
      val target = 50L + rnd.nextInt(2000)
      val ranges = 1 + rnd.nextInt(16)
      val sizes = Array.fill(n)(rnd.nextInt(500).toLong) // zero-token docs included
      val df = sizes.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toSeq.toDF("id", "n_tokens")
      val out = graft.operators.Sampling
        .shardByTokens(df, "id", "n_tokens", target, nRanges = ranges)
        .select("id", "token_start", "shard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      assert(out.length == n, s"trial $trial dropped rows")
      var cum = 0L
      out.foreach { case (id, start, shard) =>
        assert(start == cum, s"trial $trial (n=$n target=$target " +
          s"ranges=$ranges): doc $id start $start != $cum")
        assert(shard == start / target)
        cum += sizes(id.toInt)
      }
    }
  }

  test("repeatedSpans matches brute-force span extraction over random tiny-vocab docs (5 trials)") {
    // 3-word vocab forces heavy window collisions: adjacency merges,
    // multi-span docs, and df just at/below the gate all occur naturally
    for (trial <- 1 to 5) {
      val n = 3
      val minDf = 2 + rnd.nextInt(2) // 2 or 3
      val vocab = Seq("alpha", "beta", "gamma")
      val docs = (1L to 8L).map { id =>
        val len = 5 + rnd.nextInt(16)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }

      val windows = docs.flatMap { case (id, text) =>
        val ws = text.split(" ").toSeq
        (0 to ws.length - n).map(p => (id, p, ws.slice(p, p + n).mkString(" ")))
      }
      val df = windows.groupBy(_._3).map { case (s, occ) =>
        s -> occ.map(_._1).distinct.size
      }
      val expected = windows.filter(w => df(w._3) >= minDf)
        .groupBy(_._1).flatMap { case (id, ps) =>
          val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
          ps.map(_._2).sorted.foreach { p =>
            if (spans.nonEmpty && p <= spans.last._2) {
              val (s0, e0) = spans.last
              spans(spans.length - 1) = (s0, math.max(e0, p + n))
            } else spans += ((p, p + n))
          }
          spans.map { case (s0, e0) => (id, s0.toLong, e0.toLong) }
        }.toSet

      val got = graft.operators.Dedup.repeatedSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text", n = n, minDf = minDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"trial $trial (minDf=$minDf)")
    }
  }

  test("hashed-centroid classifier scores are invariant to doc order and partitioning (3 trials)") {
    for (trial <- 1 to 3) {
      val docs = (0 until 120).map { i =>
        val words = Array.tabulate(5 + rnd.nextInt(20))(j =>
          s"w${rnd.nextInt(50)}")
        (i.toLong, words.mkString(" "), i % 3 == 0)
      }.toSeq.toDF("doc_id", "text", "label")
      val w1 = graft.operators.QualityFilter
        .trainHashedCentroid(docs, "text", "label", nBuckets = 128)
      val w2 = graft.operators.QualityFilter
        .trainHashedCentroid(docs.repartition(13).orderBy(col("doc_id").desc),
          "text", "label", nBuckets = 128)
      assert(w1.toSeq == w2.toSeq,
        s"trial $trial: training depends on layout")
      val s1 = graft.operators.QualityFilter
        .scoreHashed(docs, "doc_id", "text", w1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val s2 = graft.operators.QualityFilter
        .scoreHashed(docs.repartition(7), "doc_id", "text", w1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(s1 == s2, s"trial $trial: scoring depends on layout")
    }
  }

  test("DSIR training/scoring invariant to layout; random split merges == one-shot (3 trials)") {
    import graft.operators.Dsir
    for (trial <- 1 to 3) {
      val docs = (0 until 150).map { i =>
        val words = Array.tabulate(3 + rnd.nextInt(25))(_ =>
          s"w${rnd.nextInt(60)}")
        (i.toLong, words.mkString(" "))
      }.toSeq.toDF("id", "text")
      // layout invariance: counts don't depend on order or partitioning
      val c1 = Dsir.trainNgramCounts(docs, "text", nBuckets = 128)
      val c2 = Dsir.trainNgramCounts(
        docs.repartition(11).orderBy(col("id").desc), "text", nBuckets = 128)
      assert(c1.sameElements(c2), s"trial $trial: counts depend on layout")
      // random split points: merged shard counts == one-shot
      val cut1 = rnd.nextInt(70)
      val cut2 = cut1 + 1 + rnd.nextInt(149 - cut1)
      val merged = Seq(
        docs.filter(col("id") < cut1),
        docs.filter(col("id") >= cut1 && col("id") < cut2),
        docs.filter(col("id") >= cut2))
        .map(p => Dsir.trainNgramCounts(p, "text", nBuckets = 128))
        .reduce(Dsir.mergeNgramCounts)
      assert(merged.sameElements(c1),
        s"trial $trial: merge at ($cut1, $cut2) diverged")
      // scoring invariant to partitioning
      val model = Dsir.modelFromCounts(c1)
      val w = Dsir.importanceWeights(model, model)
      val s1 = Dsir.scoreAndCrossEntropy(docs, "id", "text", w, model)
        .select("id", "n_feats", "ce_micro").collect()
        .map(r => r.getLong(0) -> (r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
      val s2 = Dsir.scoreAndCrossEntropy(docs.repartition(7), "id", "text",
          w, model)
        .select("id", "n_feats", "ce_micro").collect()
        .map(r => r.getLong(0) -> (r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
      assert(s1 == s2, s"trial $trial: scoring depends on layout")
    }
  }

  test("SQ8/PQ quantizers vs in-memory references over random shapes (4 trials)") {
    import graft.operators.Similarity
    for (trial <- 1 to 4) {
      val dim = Seq(4, 8, 12, 16)(trial - 1)
      val n = 40 + rnd.nextInt(40)
      val vecs = (0 until n).map(i =>
        (i.toLong, Array.fill(dim)((rnd.nextGaussian() * 3).toFloat)))
      val df = vecs.toDF("id", "v")
      // SQ8: codes within [0,255]; decode error ≤ half a step, per dim
      val (mins, maxs) = Similarity.sqTrain(df, "v")
      val decoded = df.select(col("id"), Similarity.sqDecode(
          Similarity.sqEncode(col("v"), mins, maxs), mins, maxs).as("d"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      vecs.foreach { case (id, v) =>
        v.indices.foreach { j =>
          val step = (maxs(j) - mins(j)) / 255.0
          val err = math.abs(v(j).toDouble - decoded(id)(j))
          assert(err <= step / 2 + 1e-9,
            s"trial $trial id $id dim $j: err $err > ${step / 2}")
        }
      }
      // PQ: codes equal an in-memory argmin over the same codebooks
      val m = Seq(2, 4, 3, 4)(trial - 1)
      if (dim % m == 0) {
        val books = Similarity.pqTrain(df, "id", "v", m, k = 8)
        val sub = dim / m
        val got = df.select(col("id"),
            Similarity.pqEncode(col("v"), books).as("c"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
        vecs.foreach { case (id, v) =>
          val want = (0 until m).map { mi =>
            val vs = v.slice(mi * sub, (mi + 1) * sub)
            val dists = books(mi).map { c =>
              val cc = c.indices.foldLeft(0.0)((a, j) =>
                a + c(j).toDouble * c(j).toDouble)
              val dot = c.indices.foldLeft(0.0)((a, j) =>
                a + vs(j).toDouble * c(j).toDouble)
              cc - 2.0 * dot
            }
            dists.indexOf(dists.min)
          }
          assert(got(id) == want, s"trial $trial id $id: ${got(id)} != $want")
        }
      }
    }
  }

  test("pointInInterval half-open semantics hold on random boundaries (3 trials)") {
    for (trial <- 1 to 3) {
      val points = (1 to 40).map(i => (i.toLong, t(rnd.nextInt(500) * 1000L)))
      val ivs = (1 to 10).map { i =>
        val s = rnd.nextInt(400) * 1000L
        (i.toLong, t(s), if (rnd.nextBoolean()) Some(t(s + rnd.nextInt(200) * 1000L)) else None)
      }
      val expected = (for {
        (pid, p) <- points
        (iid, s, eOpt) <- ivs
        if !p.before(s) && eOpt.forall(e => p.before(e))
      } yield (pid, iid)).toSet

      val got = IntervalJoin.pointInInterval(
        points.toDF("pid", "p"), ivs.toDF("iid", "s", "e"),
        point = col("p"), start = col("s"), end = col("e"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"trial $trial")
    }
  }
}
