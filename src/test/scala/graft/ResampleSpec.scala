package graft

import graft.operators.Resample

/** Linear-grid resampling against a driver replay of the pinned integer
  * semantics — duplicate timestamps, exact grid hits, spans shorter than one
  * step, NEGATIVE values (where `div`'s truncation-toward-zero matters; the
  * DuckDB oracle only sees positive data), and absolute grid alignment.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private val Step = 1000000L // 1 s grid

  /** The operator's contract, replayed in BigInt (truncation division —
    * Scala `/` on BigInt, same as Spark's `div`). */
  private def brute(rows: Seq[(String, Long, Double)])
      : Map[(String, Long), Long] = {
    val snapped = rows.map { case (k, t, v) =>
      (k, t, BigInt(math.floor(v * 1000000).toLong))
    }
    val samples = snapped.groupBy(r => (r._1, r._2)).map { case ((k, t), g) =>
      (k, t, g.map(_._3).sum / g.size)
    }.toSeq
    samples.groupBy(_._1).flatMap { case (k, g) =>
      val byT = g.map(r => r._2 -> r._3).sortBy(_._1)
      val tmin = byT.head._1; val tmax = byT.last._1
      val g0 = ((tmin + Step - 1) / Step) * Step
      val g1 = (tmax / Step) * Step
      (g0 to g1 by Step).map { t =>
        val (t0, v0) = byT.filter(_._1 <= t).last
        val nxt = byT.find(_._1 > t) // engine: tied sample goes backward only
        val (t1, v1) = nxt.getOrElse((t0, v0))
        val v = if (t1 == t0) v0
          else (v0 * (t1 - t) + v1 * (t - t0)) / (t1 - t0)
        (k, t) -> v.toLong
      }
    }
  }

  private def run(rows: Seq[(String, Long, Double)])
      : Map[(String, Long), Long] = {
    import org.apache.spark.sql.functions.{col, timestamp_micros, unix_micros}
    Resample.linearGrid(
      rows.toDF("key", "tus", "value")
        .withColumn("ts", timestamp_micros(col("tus"))),
      "key", "ts", "value", Step)
      .select(col("key"), unix_micros(col("grid_ts")).as("t"),
        col("value_micro"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
  }

  test("linearGrid equals the BigInt replay on random irregular series") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val rows = (1 to 120).map { _ =>
        (s"k${rnd.nextInt(3)}",
          rnd.nextLong(20L * Step),
          (rnd.nextDouble() - 0.5) * 200.0) // negatives included
      }
      assert(run(rows) == brute(rows), s"trial $trial")
    }
  }

  test("exact grid hit returns the sample value; duplicates collapse to micro-mean") {
    val rows = Seq(
      ("a", 0L, 10.0), ("a", 0L, 11.0), // dup at t=0: mean 10.5
      ("a", 2 * Step, 30.0))
    val got = run(rows)
    assert(got(("a", 0L)) == 10500000L)
    assert(got(("a", Step)) == (10500000L + 30000000L) / 2)
    assert(got(("a", 2 * Step)) == 30000000L)
  }

  test("midpoint interpolation is the exact integer weighted form") {
    // v0=1.0 at t=0, v1=2.0 at t=3s: grid t=1s → (1e6*2 + 2e6*1) div 3
    val rows = Seq(("a", 0L, 1.0), ("a", 3 * Step, 2.0))
    val got = run(rows)
    assert(got(("a", Step)) == (1000000L * 2 + 2000000L * 1) / 3)
    assert(got(("a", 2 * Step)) == (1000000L * 1 + 2000000L * 2) / 3)
  }

  test("a key spanning less than one step emits nothing; others are unaffected") {
    val rows = Seq(
      ("tiny", Step / 2, 1.0), ("tiny", Step / 2 + 10, 2.0),
      ("ok", 0L, 5.0), ("ok", Step, 6.0))
    val got = run(rows)
    assert(!got.keys.exists(_._1 == "tiny"))
    assert(got.keys.count(_._1 == "ok") == 2)
  }

  test("grid is absolute-aligned, not min-anchored") {
    // samples at 0.5s..2.5s: grid points at 1s and 2s (t ≡ 0 mod step)
    val rows = Seq(("a", Step / 2, 0.0), ("a", 5 * Step / 2, 4.0))
    assert(run(rows).keySet == Set(("a", Step), ("a", 2 * Step)))
  }
}
