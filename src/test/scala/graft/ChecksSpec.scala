package graft

import org.apache.spark.sql.functions._

import graft.operators.Checks
import graft.operators.Checks.{Accepted, InRange, NotNull}

/** Data-quality constraint suite: counts against driver-computed truth,
  * null semantics, the one-scan fusion guarantee, and empty-table edges.
  */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(10L), Some("A")),
    (2L, Some(60L), Some("N")),
    (3L, None, Some("R")),
    (4L, Some(5L), None),
    (4L, Some(50L), Some("X")) // duplicate id
  ).toDF("id", "qty", "flag")

  test("row-level checks count violations exactly; nulls violate range/accepted") {
    val rep = Checks.report(df, Seq(
        NotNull("qty"), InRange("qty", 1, 50), Accepted("flag", Seq("A", "N", "R"))))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(rep(("not_null", "qty")) == ((5L, 1L, false)))
    assert(rep(("in_range", "qty")) == ((5L, 2L, false))) // 60 out, null out
    assert(rep(("accepted_values", "flag")) == ((5L, 2L, false))) // X, null
  }

  test("the row-level suite is ONE scan regardless of check count") {
    val rep = Checks.report(df, Seq(
      NotNull("id"), NotNull("qty"), NotNull("flag"),
      InRange("qty", 1, 50), InRange("id", 0, 100),
      Accepted("flag", Seq("A", "N", "R"))))
    val plan = rep.queryExecution.executedPlan.toString
    val scans = "LocalTableScan|Scan ".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan for six checks:\n$plan")
  }

  test("unique counts rows beyond the first per key; passes on distinct keys") {
    val u = Checks.unique(df, "id").head
    assert((u.getLong(2), u.getLong(3), u.getBoolean(4)) == ((5L, 1L, false)))
    val ok = Checks.unique(df.select("qty").distinct(), "qty").head
    assert(ok.getBoolean(4))
  }

  test("refIntegrity counts orphans; null children are not orphans") {
    val parent = Seq(1L, 2L, 3L).toDF("pid")
    val child = Seq(Some(1L), Some(2L), Some(9L), Some(9L), None).toDF("cid")
    val r = Checks.refIntegrity(child, "cid", parent, "pid").head
    assert((r.getLong(2), r.getLong(3), r.getBoolean(4)) == ((5L, 2L, false)))
  }

  test("StreamingChecks drain rolls up to the one-shot report; replay lands nothing") {
    import org.apache.spark.sql.types._
    val rows = (1 to 60).map(i =>
      (i.toLong, if (i % 7 == 0) None else Some(i.toLong % 55),
        if (i % 11 == 0) "X" else "A"))
    val data = rows.toDF("id", "qty", "flag")
    val checks = Seq(NotNull("qty"), InRange("qty", 1, 50),
      Accepted("flag", Seq("A", "N")))
    val root = java.nio.file.Files.createTempDirectory("stream_checks")
    val src = root.resolve("incoming").toString
    val state = root.resolve("state").toString
    val ckpt = root.resolve("ckpt").toString
    java.nio.file.Files.createDirectories(root.resolve("incoming"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("qty", LongType), StructField("flag", StringType)))

    data.filter(col("id") <= 30).write.mode("append").parquet(src)
    graft.streaming.StreamingChecks.reportDrain(spark, src, state, ckpt,
      checks, schema)
    data.filter(col("id") > 30).write.mode("append").parquet(src)
    graft.streaming.StreamingChecks.reportDrain(spark, src, state, ckpt,
      checks, schema)

    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val drained = asMap(
      graft.streaming.StreamingChecks.loadReport(spark, state))
    val oneShot = asMap(Checks.report(data, checks))
    assert(drained == oneShot)
    assert(oneShot.values.exists(!_._3), "no failing check — fixture toothless")

    // checkpoint loss: full replay keyed on (src_file, check, column)
    // lands nothing new
    graft.streaming.StreamingChecks.reportDrain(spark, src, state,
      root.resolve("ckpt2").toString, checks, schema)
    assert(asMap(
      graft.streaming.StreamingChecks.loadReport(spark, state)) == oneShot)
    // empty state reads as an empty report
    assert(graft.streaming.StreamingChecks.loadReport(spark,
      root.resolve("nowhere").toString).isEmpty)
  }

  test("profile reports per-column nulls and distincts in one pass") {
    val p = Checks.profile(df)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(p("id") == (("bigint", 5L, 0L, 4L)))    // 1,2,3,4,4
    assert(p("qty") == (("bigint", 5L, 1L, 4L)))   // 10,60,5,50; one null
    assert(p("flag") == (("string", 5L, 1L, 4L)))  // A,N,R,X; one null
    // column subset honors order and selection
    assert(Checks.profile(df, Seq("qty")).collect().map(_.getString(0))
      .toSeq == Seq("qty"))
  }

  test("suite unions share one schema; empty table reports zero rows, passing") {
    val empty = spark.emptyDataFrame.select(lit(1L).as("id")).filter(lit(false))
    val s = Checks.suite(
      Checks.report(empty, Seq(NotNull("id"))),
      Checks.unique(empty, "id"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toMap
    assert(s("not_null") == ((0L, 0L, true)))
    assert(s("unique") == ((0L, 0L, true)))
  }

  // ---- ksDrift (exact two-sample Kolmogorov–Smirnov) ----

  test("ksDrift matches the hand case and ECDF ties merge before the sup") {
    import spark.implicits._
    // key "a": baseline {1,2,2}, other {2,3}: distinct values 1,2,3
    //   v=1: c1=1 c2=0 -> |1*2 - 0*3| = 2
    //   v=2: c1=3 c2=1 -> |3*2 - 1*3| = 3   (mid-tie eval would claim 4)
    //   v=3: c1=3 c2=2 -> |6 - 6| = 0       -> ks_num = 3, den = 6
    val df = Seq(
      ("a", 1L, true), ("a", 2L, true), ("a", 2L, true),
      ("a", 2L, false), ("a", 3L, false)
    ).toDF("k", "v", "base")
    val r = Checks.ksDrift(df, Seq("k"), "v", "base").collect()(0)
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L) // n1, n2
    assert(r.getBoolean(3))
    assert(r.getLong(4) == 3L && r.getLong(5) == 6L) // ks_num, ks_den
    assert(r.getLong(6) == 1000L * 3 / 6)
  }

  test("ksDrift equals the brute ECDF sup on random samples; identical samples give 0") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(600) { i =>
      (s"g${i % 3}", (rng.nextInt(15) - (if (i % 2 == 0) 0 else 3)).toLong,
        i % 2 == 0)
    }
    val got = Checks.ksDrift(rows.toDF("k", "v", "base"), Seq("k"), "v",
        "base")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(4))).toMap
    got.foreach { case (k, (n1, n2, ksNum)) =>
      val mine = rows.filter(_._1 == k)
      val b = mine.filter(_._3).map(_._2)
      val o = mine.filterNot(_._3).map(_._2)
      assert(n1 == b.size && n2 == o.size)
      val brute = (b ++ o).distinct.map { v =>
        math.abs(b.count(_ <= v).toLong * o.size -
          o.count(_ <= v).toLong * b.size)
      }.max
      assert(ksNum == brute, s"key $k")
    }
    // a sample against an identical copy of itself: sup gap exactly 0
    val vals = Seq.tabulate(20)(i => (i % 7).toLong)
    val same = vals.map(("x", _, true)) ++ vals.map(("x", _, false))
    val r0 = Checks.ksDrift(same.toDF("k", "v", "base"), Seq("k"), "v",
      "base").collect()(0)
    assert(r0.getLong(4) == 0L && r0.getLong(6) == 0L)
  }

  test("binnedDrift: baseline deciles cut, both sides re-bin by value; ties and nulls") {
    import spark.implicits._
    // baseline 1..10, 2 bins -> cut = 5 (max of rank-bin 0)
    // comparison: 3 -> bin 0; 5 -> bin 0 (cut < v is strict); 6, 100 -> bin 1
    val rows =
      (1L to 10L).map(v => ("k", Some(v), true)) ++
        Seq(("k", Some(3L), false), ("k", Some(5L), false),
          ("k", Some(6L), false), ("k", Some(100L), false),
          ("k", None, false)) // null -> bin -1
    val df = rows.toDF("k", "v", "base")
    val got = Checks.binnedDrift(df, Seq("k"), "v", "base", nBins = 2)
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(got.toSeq == Seq(
      (-1L, 0L, 1L, 0L, 200L),
      (0L, 5L, 2L, 500L, 400L),
      (1L, 5L, 2L, 500L, 400L)))
  }

  test("binnedDrift: all-tied baseline degenerates to one populated bin consistently") {
    import spark.implicits._
    val rows = Seq.fill(4)(("k", 1L, true)) ++
      Seq(("k", 1L, false), ("k", 2L, false))
    val got = Checks.binnedDrift(rows.toDF("k", "v", "base"), Seq("k"),
        "v", "base", nBins = 2)
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // cut = 1 (the only value); v=1 -> bin 0, v=2 -> bin 1 on BOTH sides
    assert(got.toSeq == Seq((0L, 4L, 1L), (1L, 0L, 1L)))
  }

  test("binnedDrift totals reconcile per key on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val rows = Seq.tabulate(500) { i =>
      (s"g${i % 2}", rng.nextInt(40).toLong, rng.nextBoolean())
    }
    val got = Checks.binnedDrift(rows.toDF("k", "v", "base"), Seq("k"),
      "v", "base", nBins = 5).collect()
    Seq("g0", "g1").foreach { k =>
      val mine = got.filter(_.getString(0) == k)
      assert(mine.map(_.getLong(2)).sum ==
        rows.count(r => r._1 == k && r._3), s"$k n_base total")
      assert(mine.map(_.getLong(3)).sum ==
        rows.count(r => r._1 == k && !r._3), s"$k n_comp total")
      assert(mine.map(_.getLong(1)).forall(b => b >= 0 && b < 5))
      // floor shares sum to at most 1000 and within nBins of it
      val bs = mine.map(_.getLong(4)).sum
      assert(bs <= 1000 && bs > 1000 - 5)
    }
  }

  test("binnedDriftFromCells equals binnedDrift on null-free data (weighted rank replay)") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    // heavy ties so the weighted-rank path actually differs from a
    // naive distinct-value rank
    val rows = Seq.tabulate(400) { i =>
      (s"g${i % 2}", rng.nextInt(9).toLong, rng.nextBoolean())
    }
    val df = rows.toDF("k", "v", "base")
    val cells = df.groupBy(col("k"), col("v").as("__v"))
      .agg(sum(when(col("base"), 1L).otherwise(0L)).as("__k1"),
        sum(when(col("base"), 0L).otherwise(1L)).as("__k2"))
    val a = Checks.binnedDrift(df, Seq("k"), "v", "base", nBins = 4)
      .orderBy("k", "bin").collect().map(_.toSeq).toSeq
    val b = Checks.binnedDriftFromCells(cells, Seq("k"), nBins = 4)
      .orderBy("k", "bin").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("ksDrift excludes NULL values from both samples (engines disagree on null order)") {
    import spark.implicits._
    val withNulls = Seq(
      ("k", Some(1L), true), ("k", None, true), ("k", Some(3L), true),
      ("k", Some(2L), false), ("k", None, false)
    ).toDF("k", "v", "base")
    val clean = withNulls.filter(col("v").isNotNull)
    val a = Checks.ksDrift(withNulls, Seq("k"), "v", "base")
      .collect()(0)
    val b = Checks.ksDrift(clean, Seq("k"), "v", "base").collect()(0)
    assert(a.toSeq == b.toSeq)
    assert(a.getLong(1) == 2L && a.getLong(2) == 1L) // null rows dropped
  }

  test("ksDrift flags one-sided keys instead of dropping them; guards fire") {
    import spark.implicits._
    val df = Seq(("only1", 5L, true), ("only1", 6L, true),
      ("both", 1L, true), ("both", 2L, false)).toDF("k", "v", "base")
    val got = Checks.ksDrift(df, Seq("k"), "v", "base")
      .collect().map(r => r.getString(0) -> (r.getBoolean(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap
    assert(got("only1") == ((false, 0L, 0L, 0L)))
    assert(got("both")._1)
    intercept[IllegalArgumentException] {
      Checks.ksDrift(df, Seq.empty, "v", "base")
    }
    intercept[IllegalArgumentException] {
      Checks.ksDrift(df.withColumn("v", col("v").cast("double")),
        Seq("k"), "v", "base")
    }
  }
}
