package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

/** The V2 clock-binary source: pushdown reaches the scan, files outside the
  * pushed range are skipped on stats alone, pruned columns are not
  * materialized, and results match the reader-function path.
  */
class ClockBinarySourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: Path = {
    val d = Files.createTempDirectory("clock_v2")
    for (k <- 0 until 4) {
      val values = (0 until 10).map(i => k * 1000L + i * 100L)
      val buf = ByteBuffer.allocate(values.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      values.foreach(buf.putLong)
      Files.write(d.resolve(s"Dev_Clock_$k.bin"), buf.array())
    }
    d
  }
  private lazy val glob = dir.resolve("*.bin").toString

  private def readClock = spark.read.format("graft-clock").load(glob)

  test("unfiltered scan decodes every file and row") {
    assert(readClock.count() == 40)
    val r = readClock.orderBy("file", "row_index")
      .select("clock").as[Long].collect()
    assert(r.head == 0L && r.last == 3900L)
  }

  test("clock range filter is pushed to the scan and rows match") {
    val df = readClock.filter(col("clock").between(1500L, 2500L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("clockRange=[1500,2500]"), s"pushdown missing in:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(clock,1500"), "PushedFilters not shown")
    val clocks = df.select("clock").as[Long].collect().sorted
    assert(clocks.sameElements((1500L to 1900L by 100) ++ (2000L to 2500L by 100)))
  }

  test("equality filter prunes to one file, one row") {
    val df = readClock.filter(col("clock") === 2000L)
    assert(df.queryExecution.executedPlan.toString.contains("clockRange=[2000,2000]"))
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("row_index") == 0L)
  }

  test("column pruning: clock-only projection still correct") {
    val only = readClock.select("clock").filter(col("clock") >= 3000L)
    assert(only.as[Long].collect().sorted.sameElements(3000L to 3900L by 100))
  }

  test("matches the reader-function path exactly") {
    val viaV2 = readClock.filter(col("clock").between(1500L, 2500L))
      .select("file", "row_index", "clock").orderBy("clock")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val viaFn = graft.sources.BronzeIngest
      .flatBinaryU64Range(spark, glob, 1500L, 2500L)
      .select("file", "row_index", "clock").orderBy("clock")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(viaV2.sameElements(viaFn))
  }

  test("an interval past every file returns empty without error") {
    assert(readClock.filter(col("clock") > 99999L).count() == 0)
  }

  test("loading a directory reads its files (no silent empty scan)") {
    val df = spark.read.format("graft-clock").load(dir.toString)
    assert(df.count() == 40)
  }
}
