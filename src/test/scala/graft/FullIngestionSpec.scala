package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Populate
import graft.pipelines.CameraQC
import graft.sources.BronzeIngest

/** One chained end-to-end ingestion test through the REAL entry points —
  * the Spark analogue of the reference's golden-dataset run
  * (`tests/dj_pipeline/test_full_ingestion.py:93-161`): synthetic file tree
  * → discoverChunkFiles → epochsWithClosure → chunksForEpochs →
  * Populate.appendIdempotent → CameraQC, asserting counts at every stage.
  *
  * Each stage consumes the previous stage's OUTPUT (not a re-built fixture),
  * so a contract drift between any two stages fails here even when every
  * per-stage spec stays green.
  */
class FullIngestionSpec extends SparkSpec {
  import spark.implicits._

  // Tree per FIXTURES.md §1: <root>/<epoch_dir>/<Device>/<Device>_<Stream>_<ts>.csv
  // Three epochs; the first two are closed by their successor, the last stays
  // open. 10 fps video metadata, 60 frames per chunk file; one chunk has a
  // planted hw_counter jump of +3 (= 2 dropped frames).
  private val FramesPerFile = 60
  private val Fps = 10.0
  private val epochChunks: Seq[(String, Seq[String])] = Seq(
    "2024-01-01T00-00-00" -> Seq(
      "2024-01-01T00-00-00", "2024-01-01T01-00-00", "2024-01-01T02-00-00"),
    "2024-01-01T02-30-00" -> Seq(
      "2024-01-01T02-30-00", "2024-01-01T03-00-00", "2024-01-01T04-00-00"),
    "2024-01-01T05-00-00" -> Seq("2024-01-01T05-00-00"))
  private val droppedChunk = "2024-01-01T01-00-00"

  // parse epoch-dir names as UTC explicitly (the session timezone) — JVM
  // default-zone parsing would break the absolute-epoch assertions on any
  // non-UTC machine
  private def tsMicros(dirName: String): Long = {
    val iso = dirName.substring(0, 10) + "T" +
      dirName.substring(11).replace('-', ':')
    java.time.LocalDateTime.parse(iso)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
  }

  private lazy val root: Path = {
    val dir = Files.createTempDirectory("ingest_tree")
    for ((epochDir, chunks) <- epochChunks; chunkTs <- chunks) {
      val deviceDir = dir.resolve(epochDir).resolve("CameraTop")
      Files.createDirectories(deviceDir)
      val t0 = tsMicros(chunkTs)
      var counter = 1000L
      val lines = (0 until FramesPerFile).map { i =>
        // plant the counter jump mid-file in exactly one chunk
        counter += (if (chunkTs == droppedChunk && i == 30) 3 else if (i > 0) 1 else 0)
        val t = t0 + (i * 1e6 / Fps).toLong
        s"$t,$counter,${t * 1000L},${i}"
      }
      Files.write(deviceDir.resolve(s"CameraTop_Video_$chunkTs.csv"),
        ("time_us,hw_counter,hw_timestamp,frame\n" + lines.mkString("\n")).getBytes)
    }
    dir
  }

  test("full chain: discover → epochs → chunks → populate → CameraQC") {
    val nFiles = epochChunks.map(_._2.size).sum // 7

    // Stage 1: chunk-file discovery over the tree (S2).
    val discovered = BronzeIngest.discoverChunkFiles(
      spark, root.resolve("*/*/*").toString).cache()
    assert(discovered.count() == nFiles)
    assert(discovered.select("device").distinct().as[String].collect()
      .sameElements(Array("CameraTop")))
    assert(discovered.select("stream").distinct().as[String].collect()
      .sameElements(Array("Video")))
    assert(discovered.select("epoch_start").distinct().count() == 3)
    assert(discovered.filter(col("chunk_start").isNull ||
      col("epoch_start").isNull).count() == 0)

    // Stage 2: epoch closure from the DISCOVERED epoch starts (W6).
    val epochs = BronzeIngest.epochsWithClosure(
      discovered.select("epoch_dir", "epoch_start").distinct()
        .withColumn("experiment", lit("exp0"))).cache()
    assert(epochs.count() == 3)
    val closed = epochs.filter(col("epoch_end").isNotNull).cache()
    assert(closed.count() == 2)
    val ep1 = closed.orderBy("epoch_start")
      .select(col("epoch_end").cast("long"), col("epoch_duration_s")).head()
    assert(ep1.getLong(0) == tsMicros("2024-01-01T02-30-00") / 1000000L)
    assert(ep1.getDouble(1) == 9000.0)

    // Stage 3: hourly chunk table covering the closed epochs (§2.9).
    val chunks = BronzeIngest.chunksForEpochs(closed).cache()
    assert(chunks.count() == 6)
    // first epoch: final chunk truncated by the closing epoch
    val ep1Ends = chunks.filter(col("epoch_start") ===
        timestamp_micros(lit(tsMicros("2024-01-01T00-00-00"))))
      .orderBy("chunk_start").select(col("chunk_end").cast("long")).as[Long].collect()
    assert(ep1Ends.last == tsMicros("2024-01-01T02-30-00") / 1000000L)
    // second epoch: first chunk starts at the (mid-hour) epoch start
    val ep2Starts = chunks.filter(col("epoch_start") ===
        timestamp_micros(lit(tsMicros("2024-01-01T02-30-00"))))
      .orderBy("chunk_start").select(col("chunk_start").cast("long")).as[Long].collect()
    assert(ep2Starts.head == tsMicros("2024-01-01T02-30-00") / 1000000L)

    // Stage 4: idempotent catalog populate (§2.9/J7).
    val table = Files.createTempDirectory("chunk_catalog").toString + "/chunks"
    val pk = Seq("experiment", "epoch_start", "chunk_start")
    assert(Populate.appendIdempotent(chunks, table, pk) == 6)
    assert(Populate.appendIdempotent(chunks, table, pk) == 0) // rerun: no dupes
    assert(spark.read.parquet(table).count() == 6)

    // Stage 5: CameraQC over the DISCOVERED files' contents (S7 + §7.3).
    val schema = StructType(Seq(
      StructField("time_us", LongType), StructField("hw_counter", LongType),
      StructField("hw_timestamp", LongType), StructField("frame", LongType)))
    val paths = discovered.select("path").as[String].collect()
    val meta = spark.read.schema(schema).option("header", "true").csv(paths: _*)
      .withColumn("time", timestamp_micros(col("time_us")))
      .withColumn("epoch_dir", element_at(split(input_file_name(), "/"), -3))
    val deltas = CameraQC.frameDeltas(meta, keys = Seq("epoch_dir"))
    val qc = CameraQC.summary(deltas, keys = Seq("epoch_dir"), nominalFps = Fps)
      .cache()
    assert(qc.count() == 3) // one summary row per epoch
    assert(qc.agg(sum("sample_count")).as[Long].head() == nFiles.toLong * FramesPerFile)
    assert(qc.agg(sum("drop_count")).as[Long].head() == 2) // the planted jump
    val dropRow = qc.filter(col("epoch_dir") === "2024-01-01T00-00-00").head()
    assert(dropRow.getAs[Long]("drop_count") == 2)
    assert(qc.filter(col("epoch_dir") =!= "2024-01-01T00-00-00")
      .agg(sum("drop_count")).as[Long].head() == 0)
  }
}
