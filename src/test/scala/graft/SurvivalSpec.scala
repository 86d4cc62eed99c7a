package graft

import org.apache.spark.sql.functions._

import graft.operators.Survival

/** Kaplan–Meier life table: hand-computed fixture, brute-force at-risk
  * parity on random durations, censor-rule edge, and the integral-duration
  * / keyed-strata guards.
  */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("life table matches the hand-computed fixture (events, censors, ties)") {
    // arm "a": durations 2(ev), 2(cens), 5(ev), 7(cens)  — tie at t=2
    // arm "b": durations 1(ev), 1(ev), 4(cens)
    val df = Seq(
      ("a", 2L, true), ("a", 2L, false), ("a", 5L, true), ("a", 7L, false),
      ("b", 1L, true), ("b", 1L, true), ("b", 4L, false)
    ).toDF("arm", "dur", "ended")
    val got = Survival.kmLifeTable(df, Seq("arm"), "dur", "ended")
      .orderBy("arm", "duration")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      ("a", 2L, 4L, 1L, 1L), // all 4 at risk; one event, one censor at 2
      ("a", 5L, 2L, 1L, 0L),
      ("a", 7L, 1L, 0L, 1L), // censor-only time still rows (n_event = 0)
      ("b", 1L, 3L, 2L, 0L), // tied events both counted at t=1
      ("b", 4L, 1L, 0L, 1L)))
  }

  test("n_risk equals the brute at-risk count on random durations") {
    val rng = new scala.util.Random(42)
    val rows = Seq.tabulate(400) { i =>
      (s"g${i % 3}", (rng.nextInt(20) + 1).toLong, rng.nextBoolean())
    }
    val df = rows.toDF("g", "dur", "ended")
    val table = Survival.kmLifeTable(df, Seq("g"), "dur", "ended").collect()
    assert(table.nonEmpty)
    table.foreach { r =>
      val (g, t) = (r.getString(0), r.getLong(1))
      val brute = rows.count { case (rg, rd, _) => rg == g && rd >= t }
      assert(r.getLong(2) == brute, s"n_risk($g, $t)")
      val evAt = rows.count { case (rg, rd, re) => rg == g && rd == t && re }
      val cnAt = rows.count { case (rg, rd, re) => rg == g && rd == t && !re }
      assert(r.getLong(3) == evAt && r.getLong(4) == cnAt)
    }
    // every subject appears exactly once across its arm's table
    val total = table.map(r => r.getLong(3) + r.getLong(4)).sum
    assert(total == rows.length)
  }

  test("global form runs unkeyed; keyed form requires strata") {
    val df = Seq((3L, true), (3L, true), (9L, false)).toDF("dur", "ended")
    val got = Survival.kmLifeTableGlobal(df, "dur", "ended")
      .orderBy("duration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((3L, 3L, 2L, 0L), (9L, 1L, 0L, 1L)))
    val e = intercept[IllegalArgumentException] {
      Survival.kmLifeTable(df, Seq.empty, "dur", "ended")
    }
    assert(e.getMessage.contains("kmLifeTableGlobal"))
  }

  test("float durations are rejected loudly (no engine-dependent grid)") {
    val df = Seq((1.5, true)).toDF("dur", "ended")
    val e = intercept[IllegalArgumentException] {
      Survival.kmLifeTable(df, Seq("ended"), "dur", "ended")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("logRank matches the hand-computed fixture (censoring in risk sets only)") {
    // arm 1: durations 1(ev), 3(ev), 5(CENSORED); arm 0: 2(ev), 4(ev)
    // per event time (n, n1, d, d1):
    //   t=1: (5,3,1,1) e1=600000 v=240000    t=2: (4,2,1,0) e1=500000 v=250000
    //   t=3: (3,2,1,1) e1=666666 v=222222    t=4: (2,1,1,0) e1=500000 v=250000
    //   t=5: d=0 -> excluded
    val df = Seq(
      (1L, 1L, true), (1L, 3L, true), (1L, 5L, false),
      (0L, 2L, true), (0L, 4L, true)
    ).toDF("arm", "dur", "ended")
    val r = Survival.logRank(df, "arm", "dur", "ended").collect()(0)
    assert(r.getLong(0) == 2L, "o1")
    assert(r.getLong(1) == 600000L + 500000L + 666666L + 500000L, "e1_micro")
    assert(r.getLong(2) == 240000L + 250000L + 222222L + 250000L, "v_micro")
  }

  test("logRank under H0 (identical arms) gives O1 ~ E1 on the micro grid") {
    val durs = Seq(2L, 3L, 3L, 7L, 11L, 11L, 13L)
    val rows = durs.map((1L, _, true)) ++ durs.map((0L, _, true))
    val r = Survival.logRank(rows.toDF("arm", "dur", "ended"),
      "arm", "dur", "ended").collect()(0)
    // identical arms: E1 = O1 exactly up to the per-term floor (< 1 micro
    // per event time); V strictly positive
    assert(math.abs(r.getLong(0) * 1000000L - r.getLong(1)) <=
      durs.distinct.size)
    assert(r.getLong(2) > 0L)
    // keyed form: two copies under different keys reproduce the same row
    val keyed = (rows.map { case (a, t, e) => ("x", a, t, e) } ++
      rows.map { case (a, t, e) => ("y", a, t, e) })
      .toDF("k", "arm", "dur", "ended")
    val kr = Survival.logRank(keyed, "arm", "dur", "ended", keys = Seq("k"))
      .orderBy("k").collect()
    assert(kr.length == 2)
    kr.foreach { row =>
      assert(row.getLong(1) == r.getLong(0) &&
        row.getLong(2) == r.getLong(1) && row.getLong(3) == r.getLong(2))
    }
  }

  test("logRank rejects a non-integral arm column") {
    val df = Seq(("a", 1L, true)).toDF("arm", "dur", "ended")
    val e = intercept[IllegalArgumentException] {
      Survival.logRank(df, "arm", "dur", "ended")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("observedEnd censors exactly at the gap boundary") {
    val df = Seq(
      (1L, 100L), // 100 + 50 <= 150 : proven closed
      (2L, 101L)  // 101 + 50 > 150  : could still be open -> censored
    ).toDF("id", "end_us")
    val got = df.withColumn("ended",
        Survival.observedEnd(col("end_us"), lit(150L), gapUs = 50L))
      .orderBy("id").collect().map(_.getBoolean(2))
    assert(got.toSeq == Seq(true, false))
  }
}
