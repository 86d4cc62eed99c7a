package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, SketchFunctions}
import graft.operators.Sketch

/** KMV distinct-count sketch + count-min sketch.
  *
  * The q117/q118 oracles replay the same md5 construction, so they cannot
  * catch a degenerate DESIGN — these specs pin the sketch properties the
  * mirror is blind to: agreement with the plain-plan computation across a
  * real partial/merge path, merge associativity, estimator accuracy on
  * cardinalities far above k, and the count-min one-sided error bound.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def hashedIds(n: Int, tag: String) =
    spark.range(n).select(
      HashFunctions.portableHash60(concat(lit(tag), col("id"))).as("h"))

  test("hllDistinct: ~6.5% standard error at m=256, duplicate-blind, small-range exact-ish") {
    import graft.operators.Sketch
    // 5000 distinct values, every row duplicated, shuffled across 7
    // partitions — the estimate must be duplicate-blind and inside 4
    // standard errors (1.04/sqrt(256) ≈ 6.5% → bound 26%; actual is far
    // tighter, but the bound must never flake)
    val vals = spark.range(5000).select(lit("g").as("g"),
      concat(lit("v"), col("id")).as("v"))
    val once = Sketch.hllDistinct(vals.repartition(7), Seq("g"), "v")
      .select("est_micro").head().getLong(0)
    val twice = Sketch.hllDistinct(vals.union(vals).repartition(7),
      Seq("g"), "v").select("est_micro").head().getLong(0)
    assert(once == twice, "duplicates must not move the estimate")
    val est = once.toDouble / 1e6
    assert(math.abs(est - 5000.0) / 5000.0 < 0.26, s"estimate $est")
    // small range: 12 distinct -> linear counting, within one count
    val tiny = spark.range(12).select(lit("g").as("g"),
      concat(lit("t"), col("id")).as("v"))
    val estTiny = Sketch.hllDistinct(tiny, Seq("g"), "v")
      .select("est_micro").head().getLong(0).toDouble / 1e6
    assert(math.abs(estTiny - 12.0) < 1.0, s"tiny estimate $estTiny")
    // grouped: two groups with different cardinalities, keyed output
    val grouped = spark.range(3000).select(
      when(col("id") < 1000, "small").otherwise("big").as("g"),
      concat(lit("x"), col("id")).as("v"))
    val byG = Sketch.hllDistinct(grouped, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(3) / 1e6).toMap
    assert(math.abs(byG("small") - 1000) / 1000.0 < 0.26)
    assert(math.abs(byG("big") - 2000) / 2000.0 < 0.26)
  }

  test("kmv agg == sort-distinct-limit-k, through a distributed merge path") {
    val k = 32
    // repartition(7) forces partial buffers + serialize/merge on every path;
    // duplicate rows (union with itself) exercise distinctness
    val df = hashedIds(5000, "a")
    val both = df.union(df).repartition(7)
    val viaAgg = both.agg(SketchFunctions.kmvMinHashes(col("h"), k))
      .head.getSeq[Long](0)
    val viaSort = df.distinct().orderBy("h").limit(k)
      .as[Long].collect().toSeq
    assert(viaAgg == viaSort)
    assert(viaAgg.size == k && viaAgg == viaAgg.sorted && viaAgg.distinct == viaAgg)
  }

  test("kmv merge rule: sketch(A union B) == trim(sketch(A) union sketch(B))") {
    val k = 16
    val a = hashedIds(2000, "x")
    val b = hashedIds(3000, "y")
    val direct = a.union(b).agg(SketchFunctions.kmvMinHashes(col("h"), k))
      .head.getSeq[Long](0)
    val merged = a.agg(SketchFunctions.kmvMinHashes(col("h"), k).as("sk"))
      .union(b.agg(SketchFunctions.kmvMinHashes(col("h"), k).as("sk")))
      .select(explode(col("sk")).as("h"))
      .agg(SketchFunctions.kmvMinHashes(col("h"), k))
      .head.getSeq[Long](0)
    assert(merged == direct)
  }

  test("kmv estimate: exact below k, within 3·n/sqrt(k) above it") {
    val k = 256
    // below k: the sketch IS the distinct set
    val small = hashedIds(100, "s")
      .agg(SketchFunctions.kmvEstimate(
        SketchFunctions.kmvMinHashes(col("h"), k), k))
      .head.getDouble(0)
    assert(small == 100.0d)
    // far above k: standard KMV relative error ~ 1/sqrt(k)
    val n = 50000
    val est = hashedIds(n, "t")
      .agg(SketchFunctions.kmvEstimate(
        SketchFunctions.kmvMinHashes(col("h"), k), k))
      .head.getDouble(0)
    assert(math.abs(est - n) < 3.0 * n / math.sqrt(k.toDouble),
      s"estimate $est too far from $n")
  }

  test("kmv ignores nulls and keeps per-group state separate") {
    val df = Seq((0, Some(10L)), (0, None), (0, Some(3L)), (1, Some(7L)))
      .toDF("g", "h")
    val out = df.groupBy("g")
      .agg(SketchFunctions.kmvMinHashes(col("h"), 4).as("sk"))
      .orderBy("g").as[(Int, Seq[Long])].collect()
    assert(out.toSeq == Seq((0, Seq(3L, 10L)), (1, Seq(7L))))
  }

  test("count-min: one-sided error with the bucket-collision bound") {
    val depth = 4
    val width = 64
    // zipfian-ish: key i appears (200 - i) times, i in [0, 100)
    val rows = (0 until 100).flatMap(i => Seq.fill(200 - i)(i.toLong))
    val df = rows.toDF("key")
    val exact = df.groupBy("key").agg(count(lit(1)).as("n"))
    val est = Sketch.cmLookup(
      Sketch.countMin(df, "key", depth, width),
      df.select("key").distinct(), "key", depth, width)
    val joined = est.join(exact, Seq("key"))
      .select("key", "cm_est", "n").as[(Long, Long, Long)].collect()
    assert(joined.length == 100)
    val total = rows.size
    joined.foreach { case (key, cmEst, n) =>
      assert(cmEst >= n, s"count-min UNDER-estimated key $key: $cmEst < $n")
      // classic bound: overshoot < 2·total/width per seed, min over seeds
      assert(cmEst - n < 2L * total / width,
        s"key $key overshoot ${cmEst - n} breaks the 2N/w bound")
    }
    // never-seen probes estimate low (usually 0; bounded by collisions)
    val cold = Sketch.cmLookup(
      Sketch.countMin(df, "key", depth, width),
      Seq(100000L).toDF("key"), "key", depth, width)
      .head.getLong(1)
    assert(cold < 2L * total / width)
  }

  test("count-min weighted variant counts mass, not rows") {
    val df = Seq((1L, 10L), (1L, 5L), (2L, 7L)).toDF("key", "w")
    val sketch = Sketch.countMin(df, "key", depth = 3, width = 1024,
      weight = col("w"))
    val est = Sketch.cmLookup(sketch, df.select("key").distinct(), "key",
      depth = 3, width = 1024)
      .orderBy("key").as[(Long, Long)].collect().toSeq
    assert(est.head._2 >= 15L && est(1)._2 >= 7L)
  }

  test("SQL frontend builds the same sketch as the Column API") {
    GraftFunctions.register(spark)
    hashedIds(1000, "q").createOrReplaceTempView("sketch_spec_h")
    val sql = spark.sql(
      """SELECT graft_kmv_estimate(graft_kmv_minhashes(h, 64), 64) AS est
        |FROM sketch_spec_h""".stripMargin).head.getDouble(0)
    val col0 = hashedIds(1000, "q")
      .agg(SketchFunctions.kmvEstimate(
        SketchFunctions.kmvMinHashes(col("h"), 64), 64))
      .head.getDouble(0)
    assert(sql == col0)
  }

  test("bottomKSample: mergeable, deterministic, rank-limit pushed down") {
    val df = (1 to 500).map(i => (i.toLong, i * 3 % 101)).toDF("id", "v")
    val whole = Sketch.bottomKSample(df, "id", 40)
      .select("id").as[Long].collect().toSet
    assert(whole.size == 40)
    // merge rule: bottomK(A ∪ B) == trimK(bottomK(A) ∪ bottomK(B))
    val a = df.filter(col("id") <= 250)
    val b = df.filter(col("id") > 250)
    val merged = Sketch.bottomKSample(
        Sketch.bottomKSample(a, "id", 40).union(Sketch.bottomKSample(b, "id", 40)),
        "id", 40)
      .select("id").as[Long].collect().toSet
    assert(merged == whole)
    // identical across re-runs and sub-k inputs keep everything
    assert(Sketch.bottomKSample(df, "id", 40).select("id").as[Long].collect().toSet == whole)
    assert(Sketch.bottomKSample(df.limit(7), "id", 40).count() == 7)
    // must plan as a per-task bottom-k frontier (TakeOrderedAndProject) —
    // never a full global sort of the corpus, and never a WindowExec (a
    // single-partition global window would drag every row to one task)
    val plan = Sketch.bottomKSample(df, "id", 40).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a top-k plan:\n$plan")
    assert(!plan.contains("Window"), s"expected no window operator:\n$plan")
  }

  test("bottomKSamplePerGroup: equal budgets, per-group merge rule, partial group limit") {
    val df = (1 to 600).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    val got = Sketch.bottomKSamplePerGroup(df, "g", "id", 20)
      .select("g", "id").as[(String, Long)].collect()
    // every group keeps exactly k; the selection matches a whole-corpus
    // per-group bottom-k done independently per group
    val byG = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byG.keySet == Set("g0", "g1", "g2") && byG.values.forall(_.size == 20))
    byG.foreach { case (g, ids) =>
      val solo = Sketch.bottomKSample(df.filter(col("g") === g), "id", 20)
        .select("id").as[Long].collect().toSet
      assert(ids == solo, s"group $g differs from its standalone bottom-k")
    }
    // merge rule holds per group across a disjoint split
    val a = df.filter(col("id") % 2 === 0)
    val b = df.filter(col("id") % 2 === 1)
    val merged = Sketch.bottomKSamplePerGroup(
        Sketch.bottomKSamplePerGroup(a, "g", "id", 20)
          .union(Sketch.bottomKSamplePerGroup(b, "g", "id", 20)),
        "g", "id", 20)
      .select("g", "id").as[(String, Long)].collect()
    assert(merged.toSet == got.toSet)
    // the rank filter must run as a PARTIAL WindowGroupLimit before the
    // exchange — each task forwards <= k rows per group, never its input
    val plan = Sketch.bottomKSamplePerGroup(df, "g", "id", 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"expected a partial window group limit:\n$plan")
  }

  test("kmvOverlap: exact regime degenerates to true set algebra") {
    import graft.operators.Sketch
    val k = 64
    // universes below k: sketches keep everything, estimates must be exact
    def tagged(tag: String, ids: Seq[Int]) =
      ids.toDF("id").select(lit(tag).as("g"),
        HashFunctions.portableHash60(concat(lit("u"), col("id"))).as("h"))
    val a = tagged("a", 1 to 30)
    val b = tagged("b", 21 to 45) // overlap 21..30 (10), union 45
    val sketches = a.union(b).groupBy("g")
      .agg(SketchFunctions.kmvMinHashes(col("h"), k).as("sk"))
    val row = Sketch.kmvOverlap(sketches, "g", "sk", k).head
    assert(row.getLong(2) == 30 && row.getLong(3) == 25) // n_a, n_b
    assert(row.getLong(4) == 10)                         // n_both exact
    assert(row.getDouble(5) == 45.0)                     // union exact
    assert(row.getDouble(6) == 10.0)                     // inter exact
    assert(row.getLong(7) == (1000000L * 10) / 45)       // floor(1e6·J)
  }

  test("kmvOverlap: union_est equals the one-shot union sketch's estimate") {
    import graft.operators.Sketch
    val k = 32
    val a = hashedIds(4000, "p").withColumn("g", lit("a"))
    val b = hashedIds(6000, "q").withColumn("g", lit("b"))
    val sketches = a.union(b).groupBy("g")
      .agg(SketchFunctions.kmvMinHashes(col("h"), k).as("sk"))
    val pairUnionEst = Sketch.kmvOverlap(sketches, "g", "sk", k)
      .head.getDouble(5)
    val oneShot = a.union(b)
      .agg(SketchFunctions.kmvEstimate(
        SketchFunctions.kmvMinHashes(col("h"), k), k))
      .head.getDouble(0)
    assert(pairUnionEst == oneShot) // trimK(K_A ∪ K_B) IS the union sketch
  }

  test("kmvOverlap: estimator regime tracks true overlap on random universes") {
    import graft.operators.Sketch
    val k = 512
    // shared core of 5000 ids + disjoint tails of 5000 each:
    // |A| = |B| = 10000, inter = 5000, union = 15000, J = 1/3
    def part(tag: String, shared: Boolean) = {
      val own = hashedIds(5000, tag)
      val core = hashedIds(5000, "core")
      (if (shared) own.union(core) else own).withColumn("g", lit(tag))
    }
    val sketches = part("aa", shared = true).union(part("bb", shared = true))
      .groupBy("g").agg(SketchFunctions.kmvMinHashes(col("h"), k).as("sk"))
    val row = Sketch.kmvOverlap(sketches, "g", "sk", k).head
    val (unionEst, interEst, jMicro) =
      (row.getDouble(5), row.getDouble(6), row.getLong(7))
    // KMV σ ≈ n/√k ≈ 4.4%; assert within ~4σ
    assert(math.abs(unionEst - 15000) < 4 * 15000 / math.sqrt(k.toDouble),
      s"union $unionEst")
    assert(math.abs(interEst - 5000) < 5000 * 0.35, s"inter $interEst")
    assert(math.abs(jMicro - 333333L) < 110000L, s"jaccard $jMicro")
  }

  test("sampleQuantiles: exact lower order statistics of the driver-replayed sample") {
    val df = (1 to 300).map(i => (i.toLong, (i * 7919L) % 997)).toDF("id", "v")
    val got = Sketch.sampleQuantiles(df, "id", "v", k = 50,
        qs = Seq(0.0, 0.5, 0.9, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // independent driver-side replay: md5 bottom-k, sort values, index
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val sample = (1 to 300).map(i => (h60(s"bottomk:$i"), i.toLong))
      .sortBy(identity).take(50)
      .map { case (_, id) => (id * 7919L) % 997 }.sorted
    Seq(0.0, 0.5, 0.9, 1.0).foreach { q =>
      val want = sample(math.floor(q * (sample.size - 1)).toInt)
      assert(got(q) == want, s"q=$q")
    }
    // empty input: one row per q, null values, no index error
    val empty = Sketch.sampleQuantiles(df.filter(col("id") < 0), "id", "v",
        k = 50, qs = Seq(0.5, 0.9)).collect()
    assert(empty.length == 2 && empty.forall(_.isNullAt(1)))
  }
}
