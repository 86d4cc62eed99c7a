package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.StatsFunctions
import graft.operators.Resample

/** OHLC bar downsampling and rolling integer-rational trend slope. */
class BarsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ohlcBars: open/close by time+tie order, high/low/sum exact") {
    val rows = Seq(
      // one user, one day bucket: open=30 (earliest), close=10 (latest),
      // equal-timestamp pair ordered by the tie column
      ("u", ts("2024-01-01 00:00:05"), 2L, 40L),
      ("u", ts("2024-01-01 00:00:05"), 1L, 30L),
      ("u", ts("2024-01-01 10:00:00"), 3L, 5L),
      ("u", ts("2024-01-01 23:59:59"), 4L, 10L),
      // next day: single row — open=high=low=close
      ("u", ts("2024-01-02 01:00:00"), 5L, 7L)
    ).toDF("k", "ts", "tie", "vm")
    val got = Resample.ohlcBars(rows, Seq("k"), "ts", "tie", "vm",
        86400L * 1000000L)
      .orderBy("bucket_start_us")
      .select("open_micro", "high_micro", "low_micro", "close_micro",
        "n_rows", "sum_micro")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((30L, 40L, 5L, 10L, 4L, 85L), (7L, 7L, 7L, 7L, 1L, 7L)))
  }

  test("ohlcBars plans as one aggregate — no window exec") {
    val rows = Seq(("u", ts("2024-01-01 00:00:05"), 1L, 30L))
      .toDF("k", "ts", "tie", "vm")
    val plan = Resample.ohlcBars(rows, Seq("k"), "ts", "tie", "vm",
      3600L * 1000000L).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window pass:\n$plan")
  }

  test("rollingSlope num/den equal the brute OLS on the trailing frame") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 120).map { i =>
      ("k" + (i % 2), new Timestamp(1700000000000L + i * 1000L), i.toLong,
        (rnd.nextInt(4000) - 1500).toLong)
    }
    val w = Window.partitionBy(col("k")).orderBy(unix_micros(col("ts")), col("tie"))
    val frame = w.rowsBetween(-9, Window.currentRow)
    val got = rows.toDF("k", "ts", "tie", "vm")
      .withColumn("x", row_number().over(w).cast("long"))
      .withColumn("t", StatsFunctions.rollingSlope(col("x"), col("vm"), frame))
      .select(col("k"), col("tie"), col("t.num"), col("t.den"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    for (key <- Seq("k0", "k1")) {
      val ys = rows.filter(_._1 == key).sortBy(_._3).map(_._4)
      ys.indices.foreach { i =>
        val lo = math.max(0, i - 9)
        val xs = (lo to i).map(j => (j + 1).toLong) // row_number is 1-based
        val yw = (lo to i).map(ys)
        val n = xs.size.toLong
        val num = n * (xs, yw).zipped.map(_ * _).sum - xs.sum * yw.sum
        val den = n * xs.map(x => x * x).sum - xs.sum * xs.sum
        val tie = rows.filter(_._1 == key).sortBy(_._3).apply(i)._3
        assert(got((key, tie)) === ((num, den)), s"$key row $i")
      }
    }
  }
}
