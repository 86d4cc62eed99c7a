package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.BronzeIngest

/** Bronze ingest over synthetic fixture files following FIXTURES.md §1
  * recipes (HarpSync CSV 1 Hz with ONIX 1000 ticks/s; staggered Bno055
  * binaries; epoch-dir path layout).
  */
class BronzeIngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: Path = Files.createTempDirectory("bronze_fixtures")

  private def writeF32(path: Path, rows: Int, cols: Int, f: (Int, Int) => Float): Unit = {
    val buf = ByteBuffer.allocate(rows * cols * 4).order(ByteOrder.LITTLE_ENDIAN)
    for (r <- 0 until rows; c <- 0 until cols) buf.putFloat(f(r, c))
    Files.write(path, buf.array())
  }

  private def writeU64(path: Path, values: Seq[Long]): Unit = {
    val buf = ByteBuffer.allocate(values.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(buf.putLong)
    Files.write(path, buf.array())
  }

  private def writeU16(path: Path, rows: Int, cols: Int, f: (Int, Int) => Int): Unit = {
    val buf = ByteBuffer.allocate(rows * cols * 2).order(ByteOrder.LITTLE_ENDIAN)
    for (r <- 0 until rows; c <- 0 until cols) buf.putShort(f(r, c).toShort)
    Files.write(path, buf.array())
  }

  test("flatBinaryF32 decodes little-endian rows in order") {
    val p = dir.resolve("Dev_Bno055_Euler_0.bin")
    writeF32(p, rows = 5, cols = 3, (r, c) => r * 10.0f + c)
    val df = BronzeIngest.flatBinaryF32(spark, p.toString, Seq("x", "y", "z"))
    val rows = df.orderBy("row_index").select("x", "y", "z").collect()
    assert(rows.length == 5)
    assert(rows(0).getFloat(0) == 0.0f && rows(4).getFloat(2) == 42.0f)
  }

  test("flatBinaryU64 decodes ONIX clock ticks") {
    val p = dir.resolve("Dev_Bno055_Clock_0.bin")
    writeU64(p, Seq(100L, 200L, 300L))
    val ticks = BronzeIngest.flatBinaryU64(spark, p.toString)
      .orderBy("row_index").select("clock").as[Long].collect()
    assert(ticks.sameElements(Array(100L, 200L, 300L)))
  }

  test("flatBinaryU16 reshapes to channel arrays and applies gain/offset") {
    val p = dir.resolve("Dev_ProbeA_AmplifierData_0.bin")
    writeU16(p, rows = 4, cols = 4, (r, c) => r * 4 + c + 60000) // exercises uint16 > 32767
    val df = BronzeIngest.flatBinaryU16(spark, p.toString, nChannels = 4,
      gain = 2.0, offset = -1.0)
    val first = df.orderBy("row_index").select("samples").head().getSeq[Double](0)
    assert(first.length == 4)
    assert(first.head == 60000 * 2.0 - 1.0) // unsigned decode, not negative
  }

  test("clockFileStats + flatBinaryU64Range: out-of-range files are pruned, never decoded") {
    val pruneDir = Files.createTempDirectory("clock_prune")
    // four disjoint clock files: [k*1000, k*1000+900] in steps of 100
    for (k <- 0 until 4)
      writeU64(pruneDir.resolve(s"Dev_Clock_$k.bin"),
        (0 until 10).map(i => k * 1000L + i * 100L))
    val glob = pruneDir.resolve("*.bin").toString

    val stats = BronzeIngest.clockFileStats(spark, glob)
      .orderBy("clock_min").collect()
    assert(stats.length == 4)
    assert(stats.forall(_.getLong(1) == 10)) // n_rows
    assert(stats(1).getLong(2) == 1000L && stats(1).getLong(3) == 1900L)

    // [1500, 2500] intersects only files 1 and 2. sliceRows=false returns
    // survivors WHOLE, so a non-pruning implementation would return 40 rows
    // (all four files) — 20 proves the other two files were never decoded.
    val whole = BronzeIngest.flatBinaryU64Range(spark, glob, 1500L, 2500L,
      sliceRows = false).cache()
    assert(whole.count() == 20)
    val decodedFiles = whole.select("file").distinct().as[String].collect()
      .map(p => p.substring(p.lastIndexOf('/') + 1)).sorted
    assert(decodedFiles.sameElements(Array("Dev_Clock_1.bin", "Dev_Clock_2.bin")))

    // sliceRows=true adds the exact row predicate: 1500..1900 + 2000..2500
    val sliced = BronzeIngest.flatBinaryU64Range(spark, glob, 1500L, 2500L)
      .select("clock").as[Long].collect().sorted
    assert(sliced.sameElements((1500L to 1900L by 100) ++ (2000L to 2500L by 100)))

    // an interval past every file decodes nothing and still returns the schema
    assert(BronzeIngest.flatBinaryU64Range(spark, glob, 10000L, 20000L).count() == 0)
  }

  test("harpSyncCsv + syncModels: one row per file, slope 1/1000, r2=1") {
    // FIXTURES.md §1.1: 60 rows @1 Hz, ONIX 1000 ticks/s, harp_time lags 1 s.
    for (n <- 0 until 2) {
      val rows = (0 until 60).map { i =>
        val harp = 3.7e9 + n * 60 + i
        s"${harp},${60000 * n + 1 + 1000 * i},${i},${harp - 1.0}"
      }
      Files.write(dir.resolve(s"Dev_HarpSync_2024-01-0${n + 1}T00-00-00.csv"),
        ("aeon_time,clock,hub_clock,harp_time\n" + rows.mkString("\n")).getBytes)
    }
    val hs = BronzeIngest.harpSyncCsv(spark,
      dir.resolve("Dev_HarpSync_*.csv").toString)
    assert(hs.count() == 120)
    assert(hs.schema("time").dataType.typeName == "timestamp")

    val models = BronzeIngest.syncModels(hs).cache()
    assert(models.count() == 2)
    val m = models.select("n_samples", "model.slope", "model.r2",
      "clock_start", "clock_end").collect()
    m.foreach { r =>
      assert(r.getLong(0) == 60)
      assert(math.abs(r.getDouble(1) - 0.001) < 1e-9, s"slope ${r.getDouble(1)}")
      assert(r.getDouble(2) > 0.999999)
      assert(r.getLong(3) < r.getLong(4)) // bounds monotonic (FIXTURES.md §4)
    }
  }

  test("imuMerge aligns clock + 4 sensors positionally into 13 IMU columns") {
    val imuDir = Files.createTempDirectory("imu")
    for (chunk <- 0 until 2) {
      writeU64(imuDir.resolve(s"Dev_Bno055_Clock_$chunk.bin"),
        (0 until 10).map(i => chunk * 90000L + 15000L + i * 100L))
      for (name <- Seq("Euler", "GravityVector", "LinearAcceleration"))
        writeF32(imuDir.resolve(s"Dev_Bno055_${name}_$chunk.bin"), 10, 3,
          (r, c) => chunk * 100.0f + r + c * 0.1f)
      writeF32(imuDir.resolve(s"Dev_Bno055_Quaternion_$chunk.bin"), 10, 4,
        (r, c) => chunk * 100.0f + r + c * 0.1f)
    }
    val merged = BronzeIngest.imuMerge(
      BronzeIngest.flatBinaryU64(spark, imuDir.resolve("*Clock*.bin").toString),
      BronzeIngest.flatBinaryF32(spark, imuDir.resolve("*Euler*.bin").toString, Seq("x", "y", "z")),
      BronzeIngest.flatBinaryF32(spark, imuDir.resolve("*GravityVector*.bin").toString, Seq("x", "y", "z")),
      BronzeIngest.flatBinaryF32(spark, imuDir.resolve("*LinearAcceleration*.bin").toString, Seq("x", "y", "z")),
      BronzeIngest.flatBinaryF32(spark, imuDir.resolve("*Quaternion*.bin").toString, Seq("w", "x", "y", "z")))
      .cache()
    assert(merged.count() == 20)
    val imuCols = Seq("euler_x", "euler_y", "euler_z", "gravity_x", "gravity_y",
      "gravity_z", "linear_acceleration_x", "linear_acceleration_y",
      "linear_acceleration_z", "quaternion_w", "quaternion_x", "quaternion_y",
      "quaternion_z")
    imuCols.foreach(c => assert(merged.columns.contains(c), s"missing $c"))
    // alignment: row r of chunk k pairs clock 90000k+15000+100r with euler k*100+r
    val r0 = merged.filter(col("chunk_index") === 1 && col("euler_x") === 105.0f)
      .select("clock").as[Long].head()
    assert(r0 == 90000L + 15000L + 500L)
  }

  test("discoverChunkFiles parses device/stream/chunk/epoch from the path layout") {
    val root = Files.createTempDirectory("raw")
    val epochDir = root.resolve("exp0/2026-04-15T09-03-01/CameraTop")
    Files.createDirectories(epochDir)
    Files.write(epochDir.resolve("CameraTop_Video_2026-04-15T10-00-00.csv"),
      "time,hw_counter\n1,2\n".getBytes)
    val files = BronzeIngest.discoverChunkFiles(spark,
      root.resolve("*/*/*/*.csv").toString)
    val r = files.select("device", "stream", "chunk_start", "epoch_start").head()
    assert(r.getString(0) == "CameraTop")
    assert(r.getString(1) == "Video")
    assert(r.getTimestamp(2) == Timestamp.valueOf("2026-04-15 10:00:00"))
    assert(r.getTimestamp(3) == Timestamp.valueOf("2026-04-15 09:03:01"))
  }

  test("epochsWithClosure: epoch N-1 closes at epoch N's start; last stays open") {
    val epochs = Seq(
      ("e", Timestamp.valueOf("2024-01-01 09:00:00")),
      ("e", Timestamp.valueOf("2024-01-01 12:30:00")),
      ("e", Timestamp.valueOf("2024-01-02 00:00:00"))
    ).toDF("experiment", "epoch_start")
    val closed = BronzeIngest.epochsWithClosure(epochs)
      .orderBy("epoch_start").collect()
    assert(closed(0).getAs[Timestamp]("epoch_end") == Timestamp.valueOf("2024-01-01 12:30:00"))
    assert(closed(0).getAs[Double]("epoch_duration_s") == 12600.0)
    assert(closed(2).getAs[Timestamp]("epoch_end") == null)
  }

  test("chunksForEpochs emits hour-aligned chunks, first/last capped to the epoch") {
    val epochs = Seq(
      ("e", Timestamp.valueOf("2024-01-01 09:30:00"), Timestamp.valueOf("2024-01-01 11:15:00"))
    ).toDF("experiment", "epoch_start", "epoch_end")
    val chunks = BronzeIngest.chunksForEpochs(epochs)
      .orderBy("chunk_start")
      .select("chunk_start", "chunk_end").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1)))
    assert(chunks.toSeq == Seq(
      (Timestamp.valueOf("2024-01-01 09:30:00"), Timestamp.valueOf("2024-01-01 10:00:00")),
      (Timestamp.valueOf("2024-01-01 10:00:00"), Timestamp.valueOf("2024-01-01 11:00:00")),
      (Timestamp.valueOf("2024-01-01 11:00:00"), Timestamp.valueOf("2024-01-01 11:15:00"))))
  }
}
