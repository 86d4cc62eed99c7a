package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.functions.TimeFunctions

class TimeFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("HARP epoch offset matches 1904-01-01T00:00:00Z") {
    assert(Instant.parse("1904-01-01T00:00:00Z").getEpochSecond ==
      TimeFunctions.HarpEpochOffsetSeconds)
  }

  test("harp<->instant roundtrip (Scala side)") {
    val i = Instant.parse("2024-03-01T12:34:56.123456Z")
    val h = TimeFunctions.instantToHarp(i)
    assert(TimeFunctions.harpToInstant(h) == i)
  }

  test("harpToTimestamp/timestampToHarp roundtrip (column side)") {
    val df = Seq("2024-03-01 12:34:56.123456", "1904-01-01 00:00:00")
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    val rt = df.select(
      TimeFunctions.harpToTimestamp(TimeFunctions.timestampToHarp(col("ts"))).as("rt"),
      col("ts")).collect()
    rt.foreach(r => assert(r.getTimestamp(0) == r.getTimestamp(1)))
  }

  test("harp zero is the 1904 epoch") {
    val ts = spark.range(1)
      .select(TimeFunctions.harpToTimestamp(lit(0.0)).as("ts"))
      .head().getTimestamp(0)
    assert(ts == Timestamp.from(Instant.parse("1904-01-01T00:00:00Z")))
  }

  test("chunkStart floors to the hour; chunkEnd is next hour, cappable") {
    val df = Seq("2024-03-01 12:34:56.789").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val r = df.select(
      TimeFunctions.chunkStart(col("ts")).as("cs"),
      TimeFunctions.chunkEnd(col("ts")).as("ce"),
      TimeFunctions.chunkEnd(col("ts"),
        Some(lit("2024-03-01 12:45:00").cast("timestamp"))).as("capped")).head()
    assert(r.getTimestamp(0) == Timestamp.valueOf("2024-03-01 12:00:00"))
    assert(r.getTimestamp(1) == Timestamp.valueOf("2024-03-01 13:00:00"))
    assert(r.getTimestamp(2) == Timestamp.valueOf("2024-03-01 12:45:00"))
  }

  test("epoch dir name parsing: both reference formats, Scala and column") {
    assert(TimeFunctions.parseEpochDirNameScala("2026-04-15T09-03-01")
      .exists(_.toString == "2026-04-15T09:03:01"))
    assert(TimeFunctions.parseEpochDirNameScala("2026-04-15T090301Z")
      .exists(_.toString == "2026-04-15T09:03:01"))
    assert(TimeFunctions.parseEpochDirNameScala("garbage").isEmpty)

    val parsed = Seq("2026-04-15T09-03-01", "2026-04-15T090301Z")
      .toDF("name")
      .select(TimeFunctions.parseEpochDirName(col("name")).as("ts"))
      .collect().map(_.getTimestamp(0))
    assert(parsed.forall(_ == Timestamp.valueOf("2026-04-15 09:03:01")))
  }

  test("onixToTimestamp applies slope/intercept then HARP conversion") {
    // slope=1e-3 s/tick, intercept=harp seconds of 2024-01-01.
    val harp2024 = TimeFunctions.instantToHarp(Instant.parse("2024-01-01T00:00:00Z"))
    val ts = spark.range(1).select(
      TimeFunctions.onixToTimestamp(lit(2000L), lit(1e-3), lit(harp2024)).as("ts"))
      .head().getTimestamp(0)
    assert(ts == Timestamp.from(Instant.parse("2024-01-01T00:00:02Z")))
  }
}
