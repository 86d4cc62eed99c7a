package graft

import graft.sources.Mp4

/** ISO-BMFF sample-index source: builder↔parser round trip against the
  * closed form, remainder-chunk handling, range-pruned payload reads,
  * unknown-box skipping, and loud corrupt-container failures.
  */
class Mp4Spec extends SparkSpec {

  private def size1(i: Int) = 20 + ((7 * i + 3) % 13)
  private def size2(i: Int) = 20 + ((7 * i + 6) % 13)
  private def payload(t: Int, i: Int, k: Int): Byte =
    ((i * 31 + k * 7 + t * 11) % 256).toByte

  private def tracks = Seq(
    Mp4.TrackSpec(1, 90000L, 3750L, Array.tabulate(24)(size1), 5),
    Mp4.TrackSpec(2, 90000L, 5625L, Array.tabulate(16)(size2), 6))

  private def fixture(): String = {
    val path = java.nio.file.Files.createTempDirectory("graft-mp4")
      .toString + "/f.mp4"
    Mp4.build(path, tracks, payload)
    path
  }

  test("sample table matches the closed form; chunks are contiguous and remainder-sized") {
    val path = fixture()
    val rows = Mp4.sampleTable(spark, path)
      .orderBy("track_id", "sample_index").collect()
    assert(rows.length == 40)
    // closed-form sizes and dts
    rows.foreach { r =>
      val (t, i) = (r.getInt(0), r.getInt(1))
      val expSize = if (t == 1) size1(i) else size2(i)
      val expDelta = if (t == 1) 3750L else 5625L
      assert(r.getInt(5) == expSize, s"size($t,$i)")
      assert(r.getLong(2) == i * expDelta, s"dts($t,$i)")
      assert(r.getLong(3) == 90000L)
    }
    // offsets: contiguous inside a chunk, monotone across the file,
    // chunk boundaries where the spc run says (track1: 5,5,5,5,4)
    val t1 = rows.filter(_.getInt(0) == 1)
    (1 until 24).foreach { i =>
      val prevEnd = t1(i - 1).getLong(4) + t1(i - 1).getInt(5)
      if (i % 5 == 0) assert(t1(i).getLong(4) == prevEnd,
        "track chunks are written back-to-back by the builder")
      else assert(t1(i).getLong(4) == prevEnd, s"contiguous at $i")
    }
    // track 2's first chunk starts after track 1's bytes end
    val t2 = rows.filter(_.getInt(0) == 2)
    assert(t2.head.getLong(4) ==
      t1.last.getLong(4) + t1.last.getInt(5))
  }

  test("range-pruned payload read returns exactly the slice, byte-identical") {
    val path = fixture()
    val got = Mp4.readSamples(spark, path, trackId = 1, fromIndex = 5,
        toIndex = 12)
      .orderBy("sample_index").collect()
    assert(got.map(_.getInt(1)).toSeq == (5 to 12).toSeq)
    got.foreach { r =>
      val i = r.getInt(1)
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(bytes.length == size1(i))
      bytes.zipWithIndex.foreach { case (b, k) =>
        assert(b == payload(1, i, k), s"byte ($i, $k)")
      }
    }
    // full-track read of the second track too (remainder chunk covered)
    val all2 = Mp4.readSamples(spark, path, 2, 0, 15)
      .orderBy("sample_index").collect()
    assert(all2.length == 16)
    assert(all2.last.getAs[Array[Byte]]("payload").toSeq ==
      Array.tabulate(size2(15))(k => payload(2, 15, k)).toSeq)
  }

  test("unknown top-level and stbl-level boxes are skipped by size") {
    val path = fixture()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    try in.readFully(0, bytes) finally in.close()
    // splice a 16-byte 'free' box between ftyp and moov: parseTables
    // must skip it (offsets in stco shift, so only the TABLE is checked)
    val ftypLen = ((bytes(0) & 0xFF) << 24) | ((bytes(1) & 0xFF) << 16) |
      ((bytes(2) & 0xFF) << 8) | (bytes(3) & 0xFF)
    val free = Array[Byte](0, 0, 0, 16, 'f', 'r', 'e', 'e',
      0, 0, 0, 0, 0, 0, 0, 0)
    val spliced = bytes.take(ftypLen) ++ free ++ bytes.drop(ftypLen)
    val tables = Mp4.parseTables(spliced)
    assert(tables.map(_.trackId).sorted == Seq(1, 2))
    assert(tables.find(_.trackId == 1).get.sizes.toSeq ==
      Array.tabulate(24)(size1).toSeq)
  }

  test("stss: sync flags, seek snap, and the absent-box all-sync default") {
    val path = java.nio.file.Files.createTempDirectory("graft-mp4-ss")
      .toString + "/s.mp4"
    Mp4.build(path, Seq(
      Mp4.TrackSpec(1, 90000L, 3750L, Array.tabulate(14)(size1), 4,
        syncEvery = 3),
      Mp4.TrackSpec(2, 90000L, 5625L, Array.tabulate(6)(size2), 6)),
      payload)
    val table = Mp4.sampleTable(spark, path)
      .orderBy("track_id", "sample_index").collect()
    table.filter(_.getInt(0) == 1).foreach { r =>
      assert(r.getBoolean(6) == (r.getInt(1) % 3 == 0),
        s"sync flag at ${r.getInt(1)}")
    }
    // track 2 wrote NO stss -> every sample sync (the spec's default)
    assert(table.filter(_.getInt(0) == 2).forall(_.getBoolean(6)))
    // seek semantics: a read from sample 7 must widen to keyframe 6
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    val t1 = Mp4.parseTables(bytes).find(_.trackId == 1).get
    assert(Mp4.snapToSync(t1, 7) == 6 && Mp4.snapToSync(t1, 6) == 6 &&
      Mp4.snapToSync(t1, 2) == 0)
    val widened = Mp4.readSamples(spark, path, 1, 7, 10, fromSync = true)
      .orderBy("sample_index").collect().map(_.getInt(1))
    assert(widened.toSeq == (6 to 10).toSeq)
    val exact = Mp4.readSamples(spark, path, 1, 7, 10)
      .collect().map(_.getInt(1)).sorted
    assert(exact.toSeq == (7 to 10).toSeq)
  }

  test("corrupt containers fail loudly, not silently") {
    val path = fixture()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    // truncated mid-box
    intercept[IllegalArgumentException] {
      Mp4.parseTables(bytes.take(len - 7))
    }
    // no moov at all
    intercept[IllegalArgumentException] {
      Mp4.parseTables(bytes.take(
        ((bytes(0) & 0xFF) << 24) | ((bytes(1) & 0xFF) << 16) |
          ((bytes(2) & 0xFF) << 8) | (bytes(3) & 0xFF)))
    }
  }
}
