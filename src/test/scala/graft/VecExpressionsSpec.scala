package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

class VecExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("VecDot/VecCosine agree with hand computation, incl. mixed float/double") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0, 4.0, 4.0))).toDF("f", "d")
    val r = df.select(
      VectorFunctions.dot(col("f"), col("f")).as("ff"),
      VectorFunctions.dot(col("f"), col("d")).as("fd"),
      VectorFunctions.cosine(col("f"), col("d")).as("cos")).head()
    assert(r.getDouble(0) == 9.0)
    assert(r.getDouble(1) == 18.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("VecCosine: zero vector yields null; null input yields null") {
    val df = Seq(
      (Some(Array(1.0f, 1.0f)), Some(Array(0.0f, 0.0f))),
      (None, Some(Array(1.0f, 1.0f)))
    ).toDF("a", "b")
    val rows = df.select(VectorFunctions.cosine(col("a"), col("b"))).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("codegen and interpreted paths agree") {
    val vecs = (1 to 50).map(i =>
      (i.toLong, Array.tabulate(16)(j => ((i * 31 + j * 7) % 13 - 6).toFloat)))
    val df = vecs.toDF("id", "v").cache()
    val a = df.select(col("id").as("ia"), col("v").as("va"))
    val b = df.select(col("id").as("ib"), col("v").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"), VectorFunctions.cosine(col("va"), col("vb")).as("c"))

    val withCodegen = pairs.collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = pairs.collect()
      assert(withCodegen.length == interpreted.length)
      withCodegen.zip(interpreted).foreach { case (x, y) =>
        assert(x.getDouble(2) == y.getDouble(2))
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("the scoring plan stays inside whole-stage codegen") {
    // parquet-backed source: a local Seq would constant-fold to LocalTableScan
    val df = graft.sources.Tables.embeddings(spark, sf0001)
    val plan = df.select(VectorFunctions.cosine(col("embedding"), col("embedding")).as("c"))
      .queryExecution.executedPlan.toString
    // '*(n)' marks a WholeStageCodegen span; the projection with vec_cosine
    // must carry it (a CodegenFallback expression would break the span).
    assert(plan.linesIterator.exists(l =>
      l.contains("vec_cosine") && l.trim.startsWith("*(")),
      s"vec_cosine projection not codegen'd in:\n$plan")
  }

  test("simhashBuckets fused kernel equals the composed per-table formulation") {
    val vecs = (1 to 40).map(i =>
      (i.toLong, Array.tabulate(16)(j => ((i * 31 + j * 7) % 13 - 6).toFloat)))
    val df = vecs.toDF("id", "v")
    val nTables = 3; val nBits = 10; val dim = 16
    val fused = df.select(col("id"),
      VectorFunctions.simhashBuckets(col("v"), nTables, nBits, seed = 42, dim = dim)
        .as("sigs"))
      .select(col("id"), posexplode(col("sigs")).as(Seq("t", "sig")))
    val composed = df.select(col("id"),
      posexplode(array((0 until nTables).map(t =>
        VectorFunctions.simhashBucket(col("v"), nBits, seed = 42 + t, dim = dim)): _*))
        .as(Seq("t", "sig")))
    assert(fused.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ==
      composed.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)

    // interpreted path agrees with codegen
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(fused.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ==
        composed.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("hyperplanes are deterministic per seed and differ across seeds") {
    val p1 = VectorFunctions.hyperplanes(4, 8, seed = 42)
    val p2 = VectorFunctions.hyperplanes(4, 8, seed = 42)
    val p3 = VectorFunctions.hyperplanes(4, 8, seed = 43)
    assert(p1.flatten.toSeq == p2.flatten.toSeq)
    assert(p1.flatten.toSeq != p3.flatten.toSeq)
    assert(p1.flatten.forall(v => v >= -1.0f && v <= 1.0f))
  }
}
