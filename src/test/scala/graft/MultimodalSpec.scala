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

  test("extractFeatures decodes real images via ImageIO: true dims + luminance histogram") {
    import java.awt.image.BufferedImage
    def encoded(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val whitePng = encoded("png", 37, 23, 0xFFFFFF) // luma 255 → top bucket
    val blackBmp = encoded("bmp", 5, 9, 0x000000)   // luma 0 → bottom bucket
    val textBlob = "not an image at all, just opaque bytes".getBytes("UTF-8")
    // PNG magic followed by garbage: decode fails, row must survive via the
    // opaque-blob fallback rather than throwing or dropping
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 42, 42, 42, 42)

    val df = Seq((1L, whitePng), (2L, blackBmp), (3L, textBlob), (4L, corrupt))
      .toDF("id", "blob")
    val out = Multimodal.extractFeatures(df, "blob", dim = 8)
      .select("id", "width", "height", "features").orderBy("id").collect()

    assert(out(0).getInt(1) == 37 && out(0).getInt(2) == 23)
    val whiteFeats = out(0).getSeq[Float](3)
    assert(math.abs(whiteFeats.sum - 1.0f) < 1e-5)
    assert(whiteFeats(7) == 1.0f) // all-white image: all mass in the top bucket
    assert(out(1).getInt(1) == 5 && out(1).getInt(2) == 9)
    assert(out(1).getSeq[Float](3)(0) == 1.0f)

    // non-image blob: deterministic opaque kernel, dims from the byte hash —
    // the audio/video wire contract is unchanged by the ImageIO path
    val hh = java.util.Arrays.hashCode(textBlob)
    assert(out(2).getInt(1) == 64 + math.floorMod(hh, 1024))
    assert(out(2).getInt(2) == 64 + math.floorMod(hh >> 10, 1024))
    // corrupt image falls back the same way (no exception, no dropped row)
    val ch = java.util.Arrays.hashCode(corrupt)
    assert(out(3).getInt(1) == 64 + math.floorMod(ch, 1024))
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

  private def encodedImage(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("thumbnails: real downscale + JPEG re-encode, round-trip decodable") {
    val bigPng = encodedImage("png", 200, 100, 0x3366CC)
    val smallBmp = encodedImage("bmp", 16, 8, 0xCC3366) // under maxDim: kept as-is
    val textBlob = "opaque non-image bytes".getBytes("UTF-8")
    val df = Seq((1L, bigPng), (2L, smallBmp), (3L, textBlob),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "blob")

    val out = Multimodal.thumbnails(df, "blob", maxDim = 64, format = "jpg")
      .select("id", "thumbnail").orderBy("id").collect()

    val t1 = out(0).getAs[Array[Byte]](1)
    assert(t1 != null && t1.length >= 3 &&
      (t1(0) & 0xFF) == 0xFF && (t1(1) & 0xFF) == 0xD8, "JPEG magic expected")
    val dec1 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(t1))
    assert(dec1.getWidth == 64 && dec1.getHeight == 32,
      "200x100 scaled so the longer edge is 64, aspect preserved")

    val dec2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1).getAs[Array[Byte]](1)))
    assert(dec2.getWidth == 16 && dec2.getHeight == 8, "no upscaling")

    assert(out(2).getAs[Array[Byte]](1) == null, "non-image → null thumbnail")
    assert(out(3).getAs[Array[Byte]](1) == null, "null blob → null thumbnail")
  }

  test("audioFeatures decodes real WAV PCM via javax.sound: header + RMS envelope") {
    // constant-amplitude mono: every RMS bucket = |a|/32768
    val a: Short = 16384
    val mono = Multimodal.buildWavPcm16(Array.fill(800)(a), sampleRate = 8000)
    // stereo: L constant, R zero → pooled RMS = a/32768/sqrt(2)
    val stereo = Multimodal.buildWavPcm16(
      Array.tabulate(400)(i => if (i % 2 == 0) a else 0: Short),
      sampleRate = 16000, channels = 2)
    val notAudio = "definitely not a wav".getBytes("UTF-8")
    val df = Seq((1L, mono), (2L, stereo), (3L, notAudio),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "blob")

    val out = Multimodal.audioFeatures(df, "blob", dim = 4)
      .orderBy("id").collect()

    val m = out(0)
    assert(m.getAs[Int]("sample_rate") == 8000 && m.getAs[Int]("channels") == 1)
    assert(m.getAs[Int]("bits") == 16 && m.getAs[Long]("n_frames") == 800L)
    assert(math.abs(m.getAs[Double]("duration_sec") - 0.1) < 1e-9)
    val mf = m.getSeq[Float](m.fieldIndex("features"))
    assert(mf.length == 4)
    mf.foreach(v => assert(math.abs(v - a / 32768.0) < 1e-4))

    val st = out(1)
    assert(st.getAs[Int]("channels") == 2 && st.getAs[Long]("n_frames") == 200L)
    val sf = st.getSeq[Float](st.fieldIndex("features"))
    sf.foreach(v => assert(math.abs(v - a / 32768.0 / math.sqrt(2)) < 1e-4))

    // non-audio and null blobs keep their rows with null audio fields
    assert(out(2).getAs[Any]("sample_rate") == null)
    assert(out(2).getAs[Long]("n_bytes") == notAudio.length.toLong)
    assert(out(3).getAs[Any]("sample_rate") == null)
    assert(out(3).getAs[Long]("n_bytes") == 0L)
  }

  test("a crafted WAV size field near Int.MaxValue yields the null-row fallback") {
    // corrupt a valid WAV's fmt-chunk size so pos+8+size wraps negative in
    // Int arithmetic — the direct parser must fall through to the null-row
    // path (P5), not die on an out-of-bounds read
    val wav = Multimodal.buildWavPcm16(Array.fill(100)(1000: Short), 8000)
    val evil = wav.clone()
    val size = 0x7FFFFFF0
    evil(16) = (size & 0xFF).toByte
    evil(17) = ((size >> 8) & 0xFF).toByte
    evil(18) = ((size >> 16) & 0xFF).toByte
    evil(19) = ((size >> 24) & 0xFF).toByte

    val df = Seq((1L, evil)).toDF("id", "blob")
    val out = Multimodal.audioFeatures(df, "blob", dim = 4).collect()
    assert(out.length == 1, "the row survives")
    assert(out(0).getAs[Any]("sample_rate") == null, "null audio fields")
    assert(out(0).getAs[Long]("n_bytes") == evil.length.toLong)
  }

  test("WavStreamWriter streams batches byte-identically to the one-shot builder") {
    val samples = Array.tabulate(600)(i => ((i * 211) % 30000 - 15000).toShort)
    val oneShot = Multimodal.buildWavPcm16(samples, sampleRate = 8000, channels = 2)

    val bos = new java.io.ByteArrayOutputStream()
    val w = new Multimodal.WavStreamWriter(bos, sampleRate = 8000,
      channels = 2, totalFrames = 300)
    samples.grouped(64).foreach(w.writeSamples) // ragged batches, whole frames
    w.finish()
    assert(java.util.Arrays.equals(bos.toByteArray, oneShot))

    // a truncated export cannot masquerade as complete
    val short = new Multimodal.WavStreamWriter(
      new java.io.ByteArrayOutputStream(), 8000, 2, totalFrames = 300)
    short.writeSamples(samples.take(100))
    val ex = intercept[IllegalArgumentException](short.finish())
    assert(ex.getMessage.contains("truncated"))
    // and over-writing the declared count fails at the batch, not at finish
    val over = new Multimodal.WavStreamWriter(
      new java.io.ByteArrayOutputStream(), 8000, 1, totalFrames = 10)
    intercept[IllegalArgumentException](over.writeSamples(new Array[Short](11)))

    // a frame count whose byte size wraps Long must fail the constructor
    // BEFORE any header bytes land — not emit a wrapped u32 size field
    val sink = new java.io.ByteArrayOutputStream()
    val huge = intercept[IllegalArgumentException] {
      new Multimodal.WavStreamWriter(sink, 8000, 2,
        totalFrames = Long.MaxValue / 2)
    }
    assert(huge.getMessage.contains("u32"))
    assert(sink.size() == 0, "no header bytes written on rejection")
  }

  test("buildWavPcm16 is byte-deterministic with a canonical 44-byte header") {
    val s = Array.tabulate(10)(i => (i * 1000).toShort)
    val w1 = Multimodal.buildWavPcm16(s, 44100)
    val w2 = Multimodal.buildWavPcm16(s, 44100)
    assert(java.util.Arrays.equals(w1, w2))
    assert(w1.length == 44 + 20)
    assert(new String(w1.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(w1.slice(8, 12), "US-ASCII") == "WAVE")
    // decodable by the JDK itself
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(w1))
    assert(in.getFormat.getSampleRate == 44100f && in.getFrameLength == 10L)
  }

  test("exportBlobs writes one decodable file per row from executor tasks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString
    val df = Seq((7L, encodedImage("png", 12, 5, 0x112233)),
      (8L, encodedImage("png", 3, 4, 0x445566)),
      (9L, null.asInstanceOf[Array[Byte]])).toDF("id", "blob")
    Multimodal.exportBlobs(df.repartition(2), "id", "blob", dir, "png")

    val f7 = new java.io.File(dir, "7.png")
    val f8 = new java.io.File(dir, "8.png")
    assert(f7.exists && f8.exists)
    assert(!new java.io.File(dir, "9.png").exists, "null blob skipped")
    val img = javax.imageio.ImageIO.read(f7)
    assert(img.getWidth == 12 && img.getHeight == 5)

    // an id that would escape the export dir fails loudly — same guard as
    // the AVI container sink
    val escDir = java.nio.file.Files.createTempDirectory("graft-export-esc")
    val escapey = Seq(("../pwn", encodedImage("png", 2, 2, 1))).toDF("id", "blob")
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    val ex = intercept[Exception] {
      Multimodal.exportBlobs(escapey, "id", "blob", escDir.toString, "png")
    }
    assert(messages(ex).contains("safe file name"))
    assert(!java.nio.file.Files.exists(escDir.getParent.resolve("pwn.png")))
  }
}
