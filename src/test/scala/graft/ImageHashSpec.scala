package graft

import org.apache.spark.sql.functions._

import graft.expressions.ImageHash
import graft.operators.{Dedup, Multimodal}

/** Perceptual dHash: golden bits, loud geometry errors, and the banded
  * Hamming join against brute-force enumeration.
  */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  test("dhash64 golden: known gradients set exactly the expected bits") {
    // 9x8 image, one pixel per block: row r is [r, r+1, ..., r+8] so every
    // left<right comparison fails -> gradient bits all 0
    val inc = Array.tabulate(8, 9)((r, c) => (r + c).toByte).flatten
    assert(ImageHash.dhash64(inc, 9, 8) === 0L)
    // decreasing rows -> every comparison succeeds -> all 64 bits set
    val dec = Array.tabulate(8, 9)((r, c) => (100 - c).toByte).flatten
    assert(ImageHash.dhash64(dec, 9, 8) === -1L)
    // single descending step in row 0 between cols 3 and 4 -> only bit 3
    val one = Array.tabulate(8, 9)((r, c) =>
      if (r == 0) (if (c <= 3) 9 else if (c == 4) 1 else c + 20).toByte
      else c.toByte).flatten
    assert(ImageHash.dhash64(one, 9, 8) === 8L)
    // 255 must compare as unsigned (not -1): a 255 left of a 0 sets the bit
    val unsigned = Array.tabulate(8, 9)((r, c) =>
      (if (c == 0) 255 else 0).toByte).flatten
    assert((ImageHash.dhash64(unsigned, 9, 8) & 1L) === 1L)
  }

  test("dhash64 is block-sum based: equal-mean blocks hash alike") {
    // 18x16 (2x2-pixel blocks): a checkerboard block has the same SUM as a
    // flat block of the mean -> identical hashes
    val flat = Array.tabulate(16, 18)((r, c) => 50.toByte).flatten
    val checker = Array.tabulate(16, 18)((r, c) =>
      (if ((r + c) % 2 == 0) 40 else 60).toByte).flatten
    assert(ImageHash.dhash64(flat, 18, 16) ===
      ImageHash.dhash64(checker, 18, 16))
  }

  test("geometry violations fail loudly") {
    assert(intercept[IllegalArgumentException](
      ImageHash.dhash64(new Array[Byte](100), 10, 10))
      .getMessage.contains("width % 9"))
    assert(intercept[IllegalArgumentException](
      ImageHash.dhash64(new Array[Byte](10), 9, 8))
      .getMessage.contains("bytes"))
  }

  test("hammingNearDup(64-bit) equals brute force incl. negative hashes") {
    val rnd = new scala.util.Random(77)
    // hashes with the sign bit often set — the shiftrightunsigned case
    val rows = (0L until 80L).map { i =>
      val base = rnd.nextLong()
      (i, if (i % 4 == 0) base | Long.MinValue else base)
    }
    // plant near pairs: ids 70/71 differ in 2 bits, 72/73 in 6 (excluded)
    val planted = rows.dropRight(4) ++ Seq(
      (76L, 0x0F0F0F0F0F0F0F0FL), (77L, 0x0F0F0F0F0F0F0F0CL),
      (78L, 0x7777000011112222L), (79L, 0x8888000011112222L))
    val got = Dedup.hammingNearDup(planted.toDF("id", "h"), "id", "h",
        bits = 64, maxHamming = 4, nBands = 4)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val byId = planted.toMap
    val want = (for {
      (a, ha) <- planted; (b, hb) <- planted if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
      // candidates only when some 16-bit band matches (banding recall rule)
      shares = (0 until 4).exists(i =>
        ((ha >>> (16 * i)) & 0xFFFF) == ((hb >>> (16 * i)) & 0xFFFF))
      if shares
    } yield (a, b, d)).toSet
    assert(got === want)
    assert(got.contains((76L, 77L, 2)), "planted 2-bit pair found")
    assert(!got.exists(p => p._1 == 78L && p._2 == 79L),
      "6-bit pair excluded by the Hamming gate")
  }

  test("audio energyHash64: golden envelopes and loud geometry") {
    import graft.expressions.AudioHash
    def pcm(samples: Seq[Int]): Array[Byte] = {
      val out = new Array[Byte](samples.size * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        out(2 * i) = (s & 0xFF).toByte
        out(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      out
    }
    // strictly decreasing per-frame amplitude -> all 64 bits set
    val dec = (0 until 65).flatMap(f => Seq.fill(4)(1000 - f * 10))
    assert(AudioHash.energyHash64(pcm(dec)) === -1L)
    // strictly increasing -> no bits
    val inc = (0 until 65).flatMap(f => Seq.fill(4)(f * 10))
    assert(AudioHash.energyHash64(pcm(inc)) === 0L)
    // negative samples: energy is amplitude-sign-free (s squared)
    val neg = dec.map(-_)
    assert(AudioHash.energyHash64(pcm(neg)) === -1L)
    // single louder frame k flips exactly bits k-1 (rise into k is NOT
    // set: E(k-1) < E(k)) vs the flat baseline
    val flat = Seq.fill(65 * 4)(100)
    val spike = flat.updated(10 * 4, 30000)
    val base = AudioHash.energyHash64(pcm(flat))
    val spiked = AudioHash.energyHash64(pcm(spike))
    assert(java.lang.Long.bitCount(base ^ spiked) === 1)
    assert(((spiked >> 10) & 1L) === 1L, "E(10) > E(11) bit set")
    assert(intercept[IllegalArgumentException](
      AudioHash.energyHash64(new Array[Byte](2 * 64)))
      .getMessage.contains("% 65"))
    assert(intercept[IllegalArgumentException](
      AudioHash.energyHash64(new Array[Byte](3)))
      .getMessage.contains("even"))
  }

  test("videoNearDup equals brute aligned-frame enumeration") {
    val rnd = new scala.util.Random(13)
    val nVids = 40; val nFrames = 5
    val vids = (0L until nVids.toLong).map { v =>
      v -> Array.fill(nFrames)(rnd.nextLong())
    }
    // plant: 30/31 identical except 1 bit in one frame; 32/33 far apart
    val base = Array.fill(nFrames)(rnd.nextLong())
    val close = base.clone(); close(2) = base(2) ^ 4L
    val planted = vids.dropRight(4) ++
      Seq(36L -> base, 37L -> close, 38L -> base.map(~_), 39L -> base.map(_ ^ -1L >>> 8))
    val frames = planted.flatMap { case (v, hs) =>
      hs.zipWithIndex.map { case (h, f) => (v, f.toLong, h) }
    }
    val got = Multimodal.videoNearDup(frames.toDF("id", "f", "h"),
        "id", "f", "h", maxTotalHamming = 8, nBands = 4)
      .select("id_a", "id_b", "total_hamming")
      .as[(Long, Long, Int)].collect().toSet
    val byId = planted.toMap
    val want = (for {
      (a, ha) <- planted; (b, hb) <- planted if a < b
      tot = ha.zip(hb).map(p => java.lang.Long.bitCount(p._1 ^ p._2)).sum
      if tot <= 8
      shares = ha.zip(hb).exists { case (x, y) =>
        (0 until 4).exists(i =>
          ((x >>> (16 * i)) & 0xFFFF) == ((y >>> (16 * i)) & 0xFFFF))
      }
      if shares
    } yield (a, b, tot)).toSet
    assert(got === want)
    assert(got.contains((36L, 37L, 1)), "planted near pair found")
    assert(!got.exists(p => p._1 == 36L && p._2 == 38L),
      "complement video excluded")
  }

  test("Multimodal.dhash64 column ≡ the JVM kernel") {
    val imgs = (0 until 20).map { i =>
      val px = Array.tabulate(16 * 18)(j => ((i * 31 + j * 7) % 256).toByte)
      (i.toLong, px)
    }
    val got = imgs.toDF("id", "px")
      .select(col("id"), Multimodal.dhash64(col("px"), 18, 16).as("h"))
      .as[(Long, Long)].collect().toMap
    imgs.foreach { case (i, px) =>
      assert(got(i) === ImageHash.dhash64(px, 18, 16))
    }
  }
}
