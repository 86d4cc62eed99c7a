package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.IncrementalPopulate

class IncrementalPopulateSpec extends SparkSpec {
  import spark.implicits._

  test("drain processes backlog, is idempotent across re-runs, and picks up new files") {
    val root = Files.createTempDirectory("incpop")
    val src = root.resolve("bronze").toString
    val tgt = root.resolve("silver").toString
    val chk1 = root.resolve("chk1").toString

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))

    // Batch 1 lands in bronze.
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      .write.mode("append").parquet(src)

    def make(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("v2", col("v") * 2)

    IncrementalPopulate.drain(spark, src, tgt, chk1, Seq("id"), schema)(make)
    assert(spark.read.parquet(tgt).count() == 2)

    // Re-run with a FRESH checkpoint: the target-table anti-join alone must
    // prevent duplicates (checkpoint loss is survivable).
    val chk2 = root.resolve("chk2").toString
    IncrementalPopulate.drain(spark, src, tgt, chk2, Seq("id"), schema)(make)
    assert(spark.read.parquet(tgt).count() == 2)

    // Batch 2 lands; same checkpoint drains only the delta.
    Seq((2L, 2.0), (3L, 3.0)).toDF("id", "v")
      .write.mode("append").parquet(src)
    IncrementalPopulate.drain(spark, src, tgt, chk1, Seq("id"), schema)(make)
    val rows = spark.read.parquet(tgt).orderBy("id")
      .select("id", "v2").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 2.0), (2L, 4.0), (3L, 6.0)))
  }
}
