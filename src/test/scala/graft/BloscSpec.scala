package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import graft.sources.{Blosc, ZarrSource}

import scala.util.Random

/** Blosc1 codec + blosc-compressed zarr stores (VERDICT r9 "missing #1").
  *
  * The frame layout is pinned byte-for-byte against the public c-blosc
  * header spec (golden-header test), round-tripped across every supported
  * inner codec × typesize × shuffle × block shape (including the split-
  * stream path byte-shuffled lz4 takes and the memcpy fallback), and driven
  * end-to-end through both zarr writers and the [[ZarrSource]] reader.
  */
class BloscSpec extends SparkSpec {

  private def le32(a: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(a, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  // deterministic compressible payload: whole u16 elements with a slow ramp
  private def ramp(nElems: Int, typesize: Int): Array[Byte] = {
    val out = new Array[Byte](nElems * typesize)
    var i = 0
    while (i < nElems) {
      var p = 0
      while (p < typesize) {
        out(i * typesize + p) = (if (p == 0) (i / 7) % 251 else p).toByte
        p += 1
      }
      i += 1
    }
    out
  }

  test("golden header: field positions and values per the c-blosc spec") {
    val raw = ramp(4096, 2) // 8192 bytes, compressible
    val frame = Blosc.compress(raw, typesize = 2, cname = "lz4")
    assert((frame(0) & 0xFF) == 2, "format version byte")
    val flags = frame(2) & 0xFF
    assert((flags & 0x1) == 1, "byte-shuffle flag set")
    assert((flags & 0x2) == 0, "not a memcpy frame")
    assert((flags >>> 5) == Blosc.CodecLz4, "codec code in bits 5-7")
    assert((frame(3) & 0xFF) == 2, "typesize byte")
    assert(le32(frame, 4) == 8192, "nbytes LE at 4")
    assert(le32(frame, 12) == frame.length, "cbytes == frame length")
    val blocksize = le32(frame, 8)
    assert(blocksize > 0 && blocksize % 2 == 0 && blocksize <= 8192)
    // one block here -> offset table is a single entry pointing past itself
    assert(le32(frame, 16) == 20, "first block offset is frame-relative")
    assert(frame.length < 8192 + 16, "compressible input actually compressed")
  }

  test("round-trip matrix: codec x typesize x shuffle mode x block shape") {
    val rnd = new Random(42)
    for {
      cname <- Seq("lz4", "lz4hc", "zstd", "zlib", "snappy")
      typesize <- Seq(1, 2, 4, 8)
      mode <- Seq("none", "byte", "bit")
      nElems <- Seq(1, 100, 4096, 40000) // sub-block .. multi-block
    } {
      val raw = ramp(nElems, typesize)
      val frame = Blosc.compress(raw, typesize, cname,
        shuffle = mode == "byte", bitShuffle = mode == "bit")
      val back = Blosc.decompress(frame)
      assert(back.sameElements(raw),
        s"round-trip mismatch: $cname ts=$typesize mode=$mode n=$nElems")
      assert(Blosc.decompressedSize(frame) == raw.length)
    }
    // small custom blocksizes force many blocks + the ragged last block
    for (bs <- Seq(64, 1000, 4096)) {
      val raw = ramp(10000, 4)
      val frame = Blosc.compress(raw, 4, "lz4", blocksize = bs)
      assert(Blosc.decompress(frame).sameElements(raw), s"blocksize=$bs")
    }
    // incompressible random bytes fall back to the 16-byte-overhead memcpy
    val noise = new Array[Byte](5000)
    rnd.nextBytes(noise)
    val frame = Blosc.compress(noise, 2, "lz4")
    assert(frame.length == noise.length + 16, "memcpy frame is raw + header")
    assert((frame(2) & 0x2) != 0, "memcpy flag set")
    assert(Blosc.decompress(frame).sameElements(noise))
  }

  test("split streams: byte-shuffled lz4 full blocks carry one stream per " +
    "byte plane; zstd never splits") {
    val raw = ramp(4096, 4) // 16 KiB, one full block at default blocksize
    val lz4Frame = Blosc.compress(raw, 4, "lz4", shuffle = true)
    // block layout: [int32 csize][payload] x 4 planes — walk and count
    val nblocks = 1
    var off = le32(lz4Frame, 16)
    var streams = 0
    while (off < lz4Frame.length) {
      val csize = le32(lz4Frame, off)
      assert(csize > 0 && off + 4 + csize <= lz4Frame.length)
      off += 4 + csize
      streams += 1
    }
    assert(streams == 4, s"expected 4 split streams, found $streams")
    assert(Blosc.decompress(lz4Frame).sameElements(raw))

    val zstdFrame = Blosc.compress(raw, 4, "zstd", shuffle = true)
    off = le32(zstdFrame, 16)
    streams = 0
    while (off < zstdFrame.length) {
      val csize = le32(zstdFrame, off)
      off += 4 + csize
      streams += 1
    }
    assert(streams == 1, s"zstd block must be a single stream, got $streams")
    assert(Blosc.decompress(zstdFrame).sameElements(raw))
  }

  test("bit-shuffle filter: golden bit-plane layout per the bitshuffle spec") {
    // 8 elements of typesize 1, values 0..7, one block, stream stored raw
    // (csize == neblock). Output byte b packs — at bit j — bit b of element
    // j: b=0 -> 0xAA (odd j), b=1 -> 0xCC, b=2 -> 0xF0, b>=3 -> 0.
    val shuffled = Array(0xAA, 0xCC, 0xF0, 0, 0, 0, 0, 0).map(_.toByte)
    val frame = ByteBuffer.allocate(16 + 4 + 4 + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    frame.put(2.toByte).put(1.toByte)
      .put((0x4 | (Blosc.CodecLz4 << 5)).toByte) // bit-shuffle, lz4
      .put(1.toByte) // typesize
      .putInt(8).putInt(8).putInt(32) // nbytes, blocksize, cbytes
      .putInt(20) // block offset
      .putInt(8) // csize == neblock -> raw stream
      .put(shuffled)
    assert(Blosc.decompress(frame.array())
      .sameElements((0 until 8).map(_.toByte)))
    // and the forward path round-trips and sets the flag (a compressible
    // input — 8 raw bytes would fall back to the memcpy frame)
    val rampBytes = Array.tabulate(4096)(i => (i / 16).toByte)
    val enc = Blosc.compress(rampBytes, 1, "lz4",
      shuffle = false, bitShuffle = true)
    assert((enc(2) & 0x4) != 0 && (enc(2) & 0x1) == 0, "bit-shuffle flag")
    assert(Blosc.decompress(enc).sameElements(rampBytes))
    // multi-byte elements: plane-major rows — byte t of the u16 elements
    // lands in rows 8t..8t+7; spot-check the plane split survives encode
    val u16 = Array.tabulate(32)(i => Seq((i % 7).toByte, (i / 7).toByte))
      .flatten.toArray
    val enc2 = Blosc.compress(u16, 2, "zstd", shuffle = false,
      bitShuffle = true)
    assert(Blosc.decompress(enc2).sameElements(u16))
    // ragged tail: 13 elements of typesize 3 -> 8 shuffled + 5 raw leftover
    val odd = Array.tabulate(39)(i => (i * 5 % 97).toByte)
    val enc3 = Blosc.compress(odd, 3, "lz4", shuffle = false,
      bitShuffle = true)
    assert(Blosc.decompress(enc3).sameElements(odd))
  }

  test("fuzz: random payloads round-trip across random configurations") {
    val rnd = new Random(1234)
    val cnames = Seq("blosclz", "lz4", "lz4hc", "zstd", "zlib", "snappy")
    for (trial <- 1 to 60) {
      val typesize = Seq(1, 2, 3, 4, 5, 8, 16)(rnd.nextInt(7))
      val nElems = 1 + rnd.nextInt(9000)
      val raw = new Array[Byte](nElems * typesize)
      // mixed compressibility: runs of structure with noise bursts
      var i = 0
      while (i < raw.length) {
        if (rnd.nextInt(4) == 0) raw(i) = rnd.nextInt(256).toByte
        else raw(i) = ((i / 17) % 251).toByte
        i += 1
      }
      val mode = rnd.nextInt(3) // none / byte / bit
      val frame = Blosc.compress(raw, typesize, cnames(rnd.nextInt(6)),
        clevel = 1 + rnd.nextInt(9),
        shuffle = mode == 1, bitShuffle = mode == 2,
        blocksize = if (rnd.nextBoolean()) 0 else 256 + rnd.nextInt(8192))
      assert(Blosc.decompress(frame).sameElements(raw),
        s"trial $trial: ts=$typesize n=$nElems mode=$mode")
      assert(Blosc.decompressedSize(frame) == raw.length)
    }
  }

  test("unsupported variants are rejected loudly, not misdecoded") {
    val ok = Blosc.compress(ramp(256, 2), 2, "lz4")
    // both shuffle flags at once is malformed
    val bitShuffled = ok.clone(); bitShuffled(2) = (bitShuffled(2) | 0x4).toByte
    val e1 = intercept[IllegalArgumentException](Blosc.decompress(bitShuffled))
    assert(e1.getMessage.contains("both byte-shuffle and bit-shuffle"))
    // lz4 streams relabeled as blosclz (codec bits 0) are garbage under
    // the blosclz instruction walk — size validation fails them loudly
    // (blosclz itself round-trips: BloscLzSpec + the fuzz above)
    val bloscLz = ok.clone(); bloscLz(2) = (bloscLz(2) & 0x1F).toByte
    intercept[IllegalArgumentException](Blosc.decompress(bloscLz))
    // truncated frame: declared cbytes no longer matches
    val e3 = intercept[IllegalArgumentException](
      Blosc.decompress(ok.dropRight(1)))
    assert(e3.getMessage.contains("cbytes"))
    // an unknown cname still fails loudly
    assert(intercept[IllegalArgumentException](
      Blosc.compress(ramp(16, 2), 2, "lzham")).getMessage
      .contains("lzham"))
  }

  test("zarr round-trip: blosc store through driver writer, distributed " +
    "writer, and reader; numcodecs-style header accepted") {
    val data = Array.tabulate(300, 4)((r, c) => ((r * 31 + c * 13) % 4096).toDouble)
    for (comp <- Seq("blosc", "blosc:zstd")) {
      val store = Files.createTempDirectory(s"blosc_zarr").toString + "/amp.zarr"
      ZarrSource.write(spark, store, data, dtype = "<u2", chunkRows = 64,
        compressor = Some(comp))
      val back = ZarrSource.read(spark, store)
        .orderBy("row_index").collect()
      assert(back.length == 300, comp)
      assert(back.zipWithIndex.forall { case (row, r) =>
        row.getSeq[Double](2) == data(r).toSeq }, s"$comp payload mismatch")
      // chunk files are genuine blosc frames
      val chunk0 = Files.readAllBytes(
        java.nio.file.Paths.get(store, "0.0"))
      val h = Blosc.readHeader(chunk0)
      assert(h.nbytes == 64 * 4 * 2 && h.typesize == 2)
    }

    // distributed writer x driver writer: byte-identical stores
    val dfIn = ZarrSource.read(spark,
      { val s = Files.createTempDirectory("blosc_src").toString + "/a.zarr"
        ZarrSource.write(spark, s, data, dtype = "<u2", chunkRows = 64,
          compressor = Some("blosc")); s })
    val distStore = Files.createTempDirectory("blosc_dist").toString + "/a.zarr"
    ZarrSource.writeDistributed(dfIn, distStore, chunkRows = 64,
      dtype = "<u2", compressor = Some("blosc"))
    val driverStore = Files.createTempDirectory("blosc_drv").toString + "/a.zarr"
    ZarrSource.write(spark, driverStore, data, dtype = "<u2", chunkRows = 64,
      compressor = Some("blosc"))
    for (ci <- 0 until 5) {
      val a = Files.readAllBytes(java.nio.file.Paths.get(distStore, s"$ci.0"))
      val b = Files.readAllBytes(java.nio.file.Paths.get(driverStore, s"$ci.0"))
      assert(a.sameElements(b), s"chunk $ci differs between writers")
    }

    // a numcodecs-shaped .zarray header (the exact JSON zarr-python emits)
    // parses — byte- OR bit-shuffled — and the blosclz cname parses too
    val meta = ZarrSource.parseMeta(
      """{"zarr_format": 2, "shape": [300, 4], "chunks": [64, 4],
        | "dtype": "<u2", "order": "C", "fill_value": 0, "filters": null,
        | "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5,
        | "shuffle": 1, "blocksize": 0}}""".stripMargin)
    assert(meta.compressor.contains("blosc"))
    val metaBit = ZarrSource.parseMeta(
      """{"zarr_format": 2, "shape": [8], "chunks": [8], "dtype": "<u2",
        | "order": "C", "fill_value": 0, "filters": null,
        | "compressor": {"id": "blosc", "cname": "lz4", "shuffle": 2}}"""
        .stripMargin)
    assert(metaBit.compressor.contains("blosc"))
    assert(ZarrSource.parseMeta(
      """{"zarr_format": 2, "shape": [8], "chunks": [8], "dtype": "<u2",
        | "order": "C", "fill_value": 0, "filters": null,
        | "compressor": {"id": "blosc", "cname": "blosclz"}}""".stripMargin)
      .compressor.contains("blosc"))
  }

  test("bit-shuffled zarr store round-trips through writer and reader") {
    val data = Array.tabulate(300, 4)((r, c) => ((r * 41 + c * 11) % 4096).toDouble)
    val store = Files.createTempDirectory("blosc_zarr_bit").toString + "/a.zarr"
    ZarrSource.write(spark, store, data, dtype = "<u2", chunkRows = 64,
      compressor = Some("blosc:lz4:bit"))
    val zarray = new String(Files.readAllBytes(
      java.nio.file.Paths.get(store, ".zarray")), "UTF-8")
    assert(zarray.contains("\"shuffle\": 2"), "header declares shuffle=2")
    val got = ZarrSource.read(spark, store)
      .orderBy("row_index")
      .select("channels").collect().map(_.getSeq[Double](0))
    assert(got.length == 300)
    for (r <- 0 until 300; c <- 0 until 4)
      assert(got(r)(c) == data(r)(c), s"($r,$c)")
  }
}
