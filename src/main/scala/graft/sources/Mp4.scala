package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ISO-BMFF (MP4) SAMPLE-INDEX source — the container half of the MP4
  * story, pure-JVM from the PUBLIC box grammar (ISO/IEC 14496-12: every
  * box is `[u32 size][4cc type][payload]`, containers nest, the sample
  * tables live under `moov/trak/mdia/minf/stbl`). Codec DECODE (H.264
  * etc.) stays a documented stub — there is no JDK decoder — but
  * everything a 100 TB video pipeline needs BEFORE decode is real here:
  * per-sample `(track, index, dts, offset, size)` derived from
  * stts/stsc/stsz/stco, frame-range pruning that reads only the chunks
  * it needs, and distributed positioned payload reads (the
  * [[AviMjpeg]]/[[ZarrSource]] discipline applied to the MP4 grammar).
  *
  * Parsed boxes: `moov/trak/mdia/minf/stbl` recursion, `tkhd` (track id),
  * `mdhd` (timescale), `stts` (decode deltas), `stsc` (sample→chunk
  * runs; the final chunk takes the remainder, as real muxers emit),
  * `stsz` (sizes), `stco` (chunk offsets). Unknown boxes skip by size —
  * exactly how real demuxers stay forward-compatible.
  *
  * Scale shape: the moov IS the container's metadata — KBs to a few MB
  * per file (4 bytes/sample), the `.zarray`/parquet-footer class — so it
  * parses once on the driver; the per-sample table then materializes
  * DISTRIBUTIVELY, one task span per chunk (chunk descriptors are
  * |chunks|-sized), and payload reads open one positioned FS stream per
  * partition. A sample-range restriction prunes to the chunks that
  * overlap it BEFORE any mdat byte is touched.
  */
object Mp4 {

  /** Builder track spec: constant decode delta, per-sample sizes,
    * constant samples-per-chunk (the final chunk takes the remainder).
    * `syncEvery = 1` means every sample is a sync point and the stss box
    * is OMITTED — the spec's convention (no stss ⇒ all samples sync),
    * which real all-intra files use.
    */
  case class TrackSpec(trackId: Int, timescale: Long, delta: Long,
                       sizes: Array[Int], samplesPerChunk: Int,
                       syncEvery: Int = 1) {
    require(trackId > 0 && timescale > 0 && delta > 0 &&
      samplesPerChunk > 0 && sizes.nonEmpty && syncEvery > 0,
      "degenerate track spec")
  }

  /** One sample's location and timing, fully resolved. `sync` = decode
    * can START here (stss membership; everything sync when stss absent).
    */
  case class SampleMeta(trackId: Int, index: Int, dts: Long, offset: Long,
                        size: Int, sync: Boolean)

  /** A track's raw stbl tables as parsed. `stss` is the 1-BASED sync
    * sample list, None when the box is absent (⇒ all samples sync).
    */
  case class TrackTables(trackId: Int, timescale: Long,
                         stts: Array[(Long, Long)], sizes: Array[Int],
                         stsc: Array[(Long, Long)], stco: Array[Long],
                         stss: Option[Array[Long]])

  // ---- builder (fixture writer twin — the AviMjpeg.build discipline) ----

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    require(tpe.length == 4, s"box type must be a 4cc: $tpe")
    be32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload
  }

  private def fullBox(tpe: String, body: Array[Byte]): Array[Byte] =
    box(tpe, Array[Byte](0, 0, 0, 0) ++ body) // version 0, flags 0

  private def concat(bs: Array[Byte]*): Array[Byte] = {
    val o = new ByteArrayOutputStream(); bs.foreach(o.write); o.toByteArray
  }

  private def chunkCounts(n: Int, perChunk: Int): Seq[Int] = {
    val full = n / perChunk
    val rem = n % perChunk
    Seq.fill(full)(perChunk) ++ (if (rem > 0) Seq(rem) else Nil)
  }

  private def trakBox(t: TrackSpec, chunkOffsets: Seq[Long]): Array[Byte] = {
    val tkhd = fullBox("tkhd", concat(be32(0), be32(0), be32(t.trackId),
      Array.fill[Byte](68)(0))) // creation/modification/id + canonical tail
    val mdhd = fullBox("mdhd", concat(be32(0), be32(0), be32(t.timescale),
      be32(t.delta * t.sizes.length), be32(0x55C40000L))) // und language
    val hdlr = fullBox("hdlr", concat(be32(0),
      "vide".getBytes("US-ASCII"), Array.fill[Byte](13)(0)))
    val stsd = fullBox("stsd", concat(be32(1),
      box("gfts", Array.fill[Byte](8)(0)))) // opaque sample description
    val stts = fullBox("stts", concat(be32(1),
      be32(t.sizes.length.toLong), be32(t.delta)))
    val stsc = fullBox("stsc", concat(be32(1),
      be32(1), be32(t.samplesPerChunk.toLong), be32(1)))
    val stsz = fullBox("stsz", concat(be32(0),
      be32(t.sizes.length.toLong),
      concat(t.sizes.map(s => be32(s.toLong)): _*)))
    val stco = fullBox("stco", concat(be32(chunkOffsets.length.toLong),
      concat(chunkOffsets.map(be32): _*)))
    val syncSamples = // 1-based, every syncEvery-th starting at sample 1
      (0 until t.sizes.length).filter(_ % t.syncEvery == 0)
        .map(i => (i + 1).toLong)
    val stss =
      if (t.syncEvery == 1) Array.emptyByteArray // all sync: omit stss
      else fullBox("stss", concat(be32(syncSamples.length.toLong),
        concat(syncSamples.map(be32): _*)))
    val stbl = box("stbl", concat(stsd, stts, stsc, stsz, stco, stss))
    val minf = box("minf", stbl)
    val mdia = box("mdia", concat(mdhd, hdlr, minf))
    box("trak", concat(tkhd, mdia))
  }

  /** Write a minimal-but-valid MP4: ftyp + moov(trak per spec) + one
    * mdat holding each track's chunks in track order. `payload(track,
    * sampleIdx, byteIdx)` fills sample bytes deterministically (the
    * byte-deterministic writer-twin discipline — oracles replay it).
    */
  def build(path: String, tracks: Seq[TrackSpec],
            payload: (Int, Int, Int) => Byte): Unit = {
    require(tracks.nonEmpty, "need at least one track")
    val ftyp = box("ftyp", concat("isom".getBytes("US-ASCII"), be32(0),
      "isom".getBytes("US-ASCII")))
    val mvhd = fullBox("mvhd", concat(be32(0), be32(0), be32(1000),
      be32(0), Array.fill[Byte](80)(0)))
    def moovFor(offsets: Map[Int, Seq[Long]]): Array[Byte] =
      box("moov", concat((mvhd +: tracks.map(t =>
        trakBox(t, offsets(t.trackId)))): _*))
    // stco holds absolute offsets, which depend on moov's own size —
    // but moov's SIZE does not depend on the offset VALUES (fixed u32
    // slots), so: size a zero-offset moov, then fill real offsets
    val zeroOffsets = tracks.map(t => t.trackId ->
      chunkCounts(t.sizes.length, t.samplesPerChunk).map(_ => 0L)).toMap
    val moovLen = moovFor(zeroOffsets).length
    var cursor = ftyp.length.toLong + moovLen + 8L // + mdat header
    val realOffsets = tracks.map { t =>
      val counts = chunkCounts(t.sizes.length, t.samplesPerChunk)
      var i = 0
      val offs = counts.map { c =>
        val o = cursor
        cursor += t.sizes.slice(i, i + c).map(_.toLong).sum
        i += c
        o
      }
      t.trackId -> offs
    }.toMap
    val data = new ByteArrayOutputStream()
    tracks.foreach { t =>
      var i = 0
      t.sizes.foreach { sz =>
        var k = 0
        while (k < sz) { data.write(payload(t.trackId, i, k)); k += 1 }
        i += 1
      }
    }
    val bytes = concat(ftyp, moovFor(realOffsets),
      box("mdat", data.toByteArray))
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  // ---- parser ----

  private def u32(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xFFL) << 24) | ((b(at + 1) & 0xFFL) << 16) |
      ((b(at + 2) & 0xFFL) << 8) | (b(at + 3) & 0xFFL)

  private def boxType(b: Array[Byte], at: Int): String =
    new String(b, at + 4, 4, "US-ASCII")

  /** Children (type, payloadStart, payloadEnd) of a container span. */
  private def children(b: Array[Byte], from: Int,
                       until: Int): Seq[(String, Int, Int)] = {
    var at = from
    val out = Seq.newBuilder[(String, Int, Int)]
    while (at < until) {
      require(until - at >= 8, s"truncated box header at $at")
      val size = u32(b, at)
      require(size >= 8 && at + size <= until,
        s"corrupt box size $size at $at (container ends $until)")
      out += ((boxType(b, at), at + 8, at + size.toInt))
      at += size.toInt
    }
    out.result()
  }

  private def child(b: Array[Byte], from: Int, until: Int,
                    tpe: String): (Int, Int) =
    children(b, from, until).find(_._1 == tpe)
      .map(c => (c._2, c._3))
      .getOrElse(throw new IllegalArgumentException(
        s"required box '$tpe' not found"))

  /** Parse the moov's sample tables. Fails loudly on missing/corrupt
    * boxes — a silently-wrong sample table poisons everything after it.
    */
  def parseTables(fileBytes: Array[Byte]): Seq[TrackTables] = {
    val top = children(fileBytes, 0, fileBytes.length)
    val (moovFrom, moovUntil) = top.find(_._1 == "moov")
      .map(c => (c._2, c._3))
      .getOrElse(throw new IllegalArgumentException("no moov box"))
    children(fileBytes, moovFrom, moovUntil).filter(_._1 == "trak")
      .map { case (_, tFrom, tUntil) =>
        val (tkFrom, _) = child(fileBytes, tFrom, tUntil, "tkhd")
        val trackId = u32(fileBytes, tkFrom + 12).toInt // v0: after flags+times
        val (mdFrom, mdUntil) = child(fileBytes, tFrom, tUntil, "mdia")
        val (mhFrom, _) = child(fileBytes, mdFrom, mdUntil, "mdhd")
        val timescale = u32(fileBytes, mhFrom + 12)
        val (miFrom, miUntil) = child(fileBytes, mdFrom, mdUntil, "minf")
        val (sbFrom, sbUntil) = child(fileBytes, miFrom, miUntil, "stbl")
        def full(tpe: String): Int =
          child(fileBytes, sbFrom, sbUntil, tpe)._1 + 4 // skip ver/flags
        val st = full("stts")
        val stts = Array.tabulate(u32(fileBytes, st).toInt)(i =>
          (u32(fileBytes, st + 4 + 8 * i), u32(fileBytes, st + 8 + 8 * i)))
        val ssAt = full("stsz")
        val fixedSize = u32(fileBytes, ssAt)
        val nSamples = u32(fileBytes, ssAt + 4).toInt
        val sizes =
          if (fixedSize != 0) Array.fill(nSamples)(fixedSize.toInt)
          else Array.tabulate(nSamples)(i =>
            u32(fileBytes, ssAt + 8 + 4 * i).toInt)
        val scAt = full("stsc")
        val stsc = Array.tabulate(u32(fileBytes, scAt).toInt)(i =>
          (u32(fileBytes, scAt + 4 + 12 * i),
            u32(fileBytes, scAt + 8 + 12 * i)))
        val coAt = full("stco")
        val stco = Array.tabulate(u32(fileBytes, coAt).toInt)(i =>
          u32(fileBytes, coAt + 4 + 4 * i))
        val stss = children(fileBytes, sbFrom, sbUntil)
          .find(_._1 == "stss").map { case (_, from, _) =>
            val at = from + 4
            Array.tabulate(u32(fileBytes, at).toInt)(i =>
              u32(fileBytes, at + 4 + 4 * i))
          }
        TrackTables(trackId, timescale, stts, sizes, stsc, stco, stss)
      }
  }

  /** The sync sample (keyframe) a decode targeting `fromIndex` must
    * actually START at: the largest sync index ≤ fromIndex (0 when the
    * track has no sync point at or before it — a malformed but seen-in-
    * the-wild shape; decode from the top). stss absent ⇒ every sample
    * is sync ⇒ the snap is the identity.
    */
  def snapToSync(t: TrackTables, fromIndex: Int): Int = t.stss match {
    case None => fromIndex
    case Some(ss) =>
      ss.filter(_ - 1 <= fromIndex).lastOption.map(v => (v - 1).toInt)
        .getOrElse(0)
  }

  /** Resolve a track's tables to per-sample metadata (pure arithmetic:
    * stsc runs give each chunk's sample count — the final chunk takes
    * the remainder — offsets accumulate inside chunks, dts accumulates
    * stts deltas).
    */
  def resolve(t: TrackTables): Seq[SampleMeta] = {
    val perChunk = Array.tabulate(t.stco.length) { c =>
      val run = t.stsc.filter(_._1 <= c + 1).lastOption
        .getOrElse(throw new IllegalArgumentException("empty stsc"))
      run._2.toInt
    }
    val deltas = t.stts.flatMap { case (n, d) => Seq.fill(n.toInt)(d) }
    require(deltas.length == t.sizes.length,
      s"stts covers ${deltas.length} samples, stsz has ${t.sizes.length}")
    val syncSet = t.stss.map(_.map(v => (v - 1).toInt).toSet)
    val out = Seq.newBuilder[SampleMeta]
    var sample = 0
    var dts = 0L
    var chunk = 0
    while (sample < t.sizes.length) {
      require(chunk < t.stco.length,
        "stco exhausted before all samples were placed")
      var off = t.stco(chunk)
      val inChunk = math.min(perChunk(chunk), t.sizes.length - sample)
      var j = 0
      while (j < inChunk) {
        out += SampleMeta(t.trackId, sample, dts, off, t.sizes(sample),
          syncSet.forall(_.contains(sample)))
        off += t.sizes(sample)
        dts += deltas(sample)
        sample += 1
        j += 1
      }
      chunk += 1
    }
    out.result()
  }

  private def readAll(spark: SparkSession, path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    buf
  }

  /** The per-sample index as a DataFrame — NO mdat byte is read (the
    * moov is the whole input, parquet-footer class). Columns:
    * `(track_id, sample_index, dts_ticks, timescale, offset, size)`.
    */
  def sampleTable(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val tables = parseTables(readAll(spark, path))
    val metas = tables.flatMap(t =>
      resolve(t).map(m => (m.trackId, m.index, m.dts, t.timescale,
        m.offset, m.size, m.sync)))
    spark.createDataset(metas).toDF("track_id", "sample_index",
      "dts_ticks", "timescale", "offset", "size", "is_sync")
  }

  /** Sample payloads for an index range (both ends inclusive) — the
    * frame-slice read. Chunks that do not overlap the range are pruned
    * BEFORE any byte is read; each partition opens one positioned FS
    * stream. Payload stays an opaque binary column (codec decode is the
    * documented stub — there is no JDK H.264 decoder).
    */
  def readSamples(spark: SparkSession, path: String, trackId: Int,
                  fromIndex: Int, toIndex: Int,
                  fromSync: Boolean = false): DataFrame = {
    import spark.implicits._
    require(fromIndex <= toIndex, "empty sample range")
    val tables = parseTables(readAll(spark, path))
    val track = tables.find(_.trackId == trackId)
      .getOrElse(throw new IllegalArgumentException(
        s"track $trackId not present"))
    // fromSync: a codec can only START at a sync sample, so a real
    // frame-slice read widens back to the previous keyframe (stss)
    val lo = if (fromSync) snapToSync(track, fromIndex) else fromIndex
    val wanted = resolve(track)
      .filter(m => m.index >= lo && m.index <= toIndex)
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    spark.createDataset(wanted.map(m =>
        (m.trackId, m.index, m.dts, m.offset, m.size)))
      .repartition(math.max(1, math.min(wanted.size / 64 + 1, 32)))
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(conf.value)
          val in = fs.open(p)
          val out = it.map { case (tid, idx, dts, off, sz) =>
            val buf = new Array[Byte](sz)
            in.readFully(off, buf)
            (tid, idx, dts, buf)
          }
          new Iterator[(Int, Int, Long, Array[Byte])] {
            def hasNext: Boolean = {
              val h = out.hasNext; if (!h) in.close(); h
            }
            def next(): (Int, Int, Long, Array[Byte]) = out.next()
          }
        }
      }
      .toDF("track_id", "sample_index", "dts_ticks", "payload")
  }
}
