package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Layout

class LayoutExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("writeChunked + readRange: partition pruning shrinks the scanned file set") {
    val dir = Files.createTempDirectory("layout").resolve("events").toString
    val rows = (0 until 96).map { h =>
      (h.toLong, Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(h * 3600L)), h * 1.0)
    }
    Layout.writeChunked(rows.toDF("id", "ts", "v"), dir, "ts")

    val all = spark.read.parquet(dir)
    val slice = Layout.readRange(spark, dir, "ts",
      "2024-01-02 06:00:00", "2024-01-02 18:00:00")

    assert(slice.count() == 12)
    // the pruning is physical: the executed scan's numFiles metric counts
    // only the partitions surviving the partition filters (inputFiles would
    // list the whole base relation regardless of pushdown)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      import org.apache.spark.sql.execution.FileSourceScanExec
      val scans = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f }
      scans.map(_.metrics("numFiles").value).sum
    }
    val allFiles = all.inputFiles.length.toLong
    assert(allFiles == 96)
    val sliceFiles = scannedFiles(slice)
    assert(sliceFiles == 12, // exactly the 12 intersecting hourly partitions
      s"pruning ineffective: $sliceFiles of $allFiles files")
    // boundary exactness: a range not aligned to partition edges still masks rows
    val partial = Layout.readRange(spark, dir, "ts",
      "2024-01-02 06:30:00", "2024-01-02 07:30:00")
    assert(partial.count() == 1)
  }

  test("assignDenseIds equals global row_number without a global window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(77)
    val rows = (1 to 5000).map(i => (i.toLong, rnd.nextInt(1000)))
    val df = rows.toDF("k", "v").repartition(13) // scrambled input layout
    val out = graft.sources.Layout.assignDenseIds(df, Seq("v", "k"),
      numRanges = 8)
    val got = out.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val want = rows.sortBy { case (k, v) => (v, k) }.zipWithIndex
      .map { case ((k, v), i) => (k, v) -> i.toLong }.toMap
    assert(got == want)
    // the plan must not contain a single-partition (empty-key) window —
    // every WindowExec partitions on __pid
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") ||
      "windowspecdefinition\\(__pid".r.findFirstIn(plan.toLowerCase).isDefined ||
      plan.contains("__pid"), s"global window suspected:\n$plan")
    // ids are dense 0..n-1 by construction
    assert(got.values.toSeq.sorted == (0L until 5000L))
  }

  test("GraftExtensions registers vec_dot/vec_cosine for SQL") {
    // getOrCreate() returns the shared test session (no extensions) unless
    // the active/default session is cleared first; the new session reuses
    // the same SparkContext but gets its own state with extensions applied.
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import ext.implicits._
      Seq((Array(1.0f, 2.0f), Array(2.0f, 3.0f))).toDF("a", "b")
        .createOrReplaceTempView("vecs")
      val r = ext.sql("SELECT vec_dot(a, b) AS d, vec_cosine(a, a) AS c FROM vecs").head()
      assert(r.getDouble(0) == 8.0)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
      val h = ext.sql(
        "SELECT portable_hash60('abc') AS a, portable_hash28('abc') AS b").head()
      assert(h.getLong(0) == 648541476951500027L && h.getLong(1) == 14063167L)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
