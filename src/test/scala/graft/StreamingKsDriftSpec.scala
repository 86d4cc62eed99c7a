package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Checks
import graft.streaming.StreamingKsDrift

/** Drained ≡ one-shot for the incremental KS cell store, and the
  * file-keyed idempotency that makes replays no-ops instead of double
  * counts.
  */
class StreamingKsDriftSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType),
    StructField("base", BooleanType)))

  private def rows(seed: Int, n: Int): Seq[(String, Long, Boolean)] = {
    val rng = new scala.util.Random(seed)
    Seq.tabulate(n) { i =>
      (s"g${i % 2}", (rng.nextInt(12) + (if (i % 3 == 0) 2 else 0)).toLong,
        rng.nextBoolean())
    }
  }

  private def sorted(df: DataFrame) =
    df.orderBy("k").collect().map(_.toSeq).toSeq

  test("multi-wave drain report equals the one-shot statistic") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-ksdrift").toString
    val (src, cells, ckpt) = (root + "/src", root + "/cells",
      root + "/ckpt")
    val all = rows(11, 300)
    def wave(): Unit = StreamingKsDrift.drain(spark, src, cells, ckpt,
      Seq("k"), "v", "base", schema)
    all.grouped(100).foreach { w =>
      w.toDF("k", "v", "base").write.mode("append").parquet(src)
      wave()
    }
    val drained = StreamingKsDrift.report(spark, cells, Seq("k")).get
    val oneShot = Checks.ksDrift(all.toDF("k", "v", "base"), Seq("k"),
      "v", "base")
    assert(sorted(drained) == sorted(oneShot))
    assert(sorted(drained).nonEmpty)
    // the SAME store's second derived report: drained binned == one-shot
    val binnedDrained = StreamingKsDrift.reportBinned(spark, cells,
        Seq("k"), nBins = 4).get
      .orderBy("k", "bin").collect().map(_.toSeq).toSeq
    val binnedOneShot = graft.operators.Checks.binnedDrift(
        all.toDF("k", "v", "base"), Seq("k"), "v", "base", nBins = 4)
      .orderBy("k", "bin").collect().map(_.toSeq).toSeq
    assert(binnedDrained == binnedOneShot)
  }

  test("a replay through a FRESH checkpoint is a keyed no-op (file-keyed cells)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-ksdrift-replay").toString
    val (src, cells) = (root + "/src", root + "/cells")
    val all = rows(23, 200)
    all.toDF("k", "v", "base").write.mode("append").parquet(src)
    StreamingKsDrift.drain(spark, src, cells, root + "/ckpt1",
      Seq("k"), "v", "base", schema)
    val before = sorted(StreamingKsDrift.report(spark, cells,
      Seq("k")).get)
    val cellCount = spark.read.parquet(cells).count()
    // checkpoint lost: the whole backlog replays — cells keyed on
    // (src_file, k, v) make every re-derived row a no-op append
    StreamingKsDrift.drain(spark, src, cells, root + "/ckpt2",
      Seq("k"), "v", "base", schema)
    assert(spark.read.parquet(cells).count() == cellCount)
    assert(sorted(StreamingKsDrift.report(spark, cells,
      Seq("k")).get) == before)
  }

  test("report on a never-drained store is None") {
    val empty = java.nio.file.Files
      .createTempDirectory("graft-ksdrift-empty").toString + "/cells"
    assert(StreamingKsDrift.report(spark, empty, Seq("k")).isEmpty)
  }
}
