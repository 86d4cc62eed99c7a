package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, SketchFunctions}
import graft.operators.Sketch

/** The sketches under Structured Streaming.
  *
  * `Sketch.countMin` and `kmvMinHashes` are plain aggregations, so the SAME
  * code runs over `readStream` input — no streaming twin needed (unlike the
  * dedup family, whose incremental forms required custom state). What these
  * specs pin is the property that makes that worth doing at all: the
  * streaming state is the SKETCH, not the data — ≤ depth·width counter rows
  * / one O(k) buffer per scope, regardless of how many rows flow through —
  * and a multi-batch drain converges to exactly the one-shot batch answer
  * (the aggregates' merge rule applied by the state store across batches).
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming count-min over batches == batch sketch; state bounded by depth*width") {
    implicit val sqlCtx = spark.sqlContext
    val (depth, width) = (3, 16)
    val keys = (1 to 400).map(i => s"user${i % 57}")
    val mem = MemoryStream[String]
    val q = Sketch.countMin(mem.toDF().toDF("k"), "k", depth, width)
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode("complete").start()
    try {
      keys.grouped(150).foreach { batch =>
        mem.addData(batch); q.processAllAvailable()
      }
      val streamed = spark.table("cm_stream")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batchSketch = Sketch.countMin(keys.toDF("k"), "k", depth, width)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batchSketch)
      // the state operator holds the sketch, nothing else
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= depth.toLong * width,
        s"state must be the sketch (<= ${depth * width} rows), got $stateRows")
    } finally q.stop()
  }

  test("streaming kmv per scope over batches == one-shot batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val k = 16
    val rows = (1 to 900).map(i => (s"src${i % 3}", s"doc-${i % 211}"))
    val mem = MemoryStream[(String, String)]
    val sketched = mem.toDF().toDF("scope", "v")
      .select(col("scope"), HashFunctions.portableHash60(col("v")).as("h"))
      .groupBy("scope")
      .agg(SketchFunctions.kmvMinHashes(col("h"), k).as("sk"))
    val q = sketched.writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      rows.grouped(250).foreach { batch =>
        mem.addData(batch); q.processAllAvailable()
      }
      val streamed = spark.table("kmv_stream")
        .select(col("scope"), col("sk"),
          SketchFunctions.kmvEstimate(col("sk"), k).as("est"))
        .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getDouble(2)))
        .sortBy(_._1)
      val batched = rows.toDF("scope", "v")
        .select(col("scope"), HashFunctions.portableHash60(col("v")).as("h"))
        .groupBy("scope")
        .agg(SketchFunctions.kmvMinHashes(col("h"), k).as("sk"))
        .select(col("scope"), col("sk"),
          SketchFunctions.kmvEstimate(col("sk"), k).as("est"))
        .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getDouble(2)))
        .sortBy(_._1)
      assert(streamed.toSeq == batched.toSeq)
      // each scope keeps exactly k mins (211 distinct docs >> k), all sorted
      streamed.foreach { case (_, sk, est) =>
        assert(sk.size == k && sk == sk.sorted && est > 0.0)
      }
    } finally q.stop()
  }
}
