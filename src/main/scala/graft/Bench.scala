package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): run every declared query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Each query materializes through the `noop` sink — unlike `count()`,
  * Catalyst cannot prune columns or drop sorts under it, so the timing covers
  * the full declared plan. One warmup query first so JVM/codegen startup isn't
  * billed to the first query measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the library's own session defaults (GraftSession) — benchmark what
    // users actually run
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Warmup: JVM + codegen + parquet footer caches. A warmup failure is
    // tolerable (the timed loop will surface it); a timed-loop failure is NOT
    // hidden — it records -1 and a nonzero exit, never a near-zero "win".
    try run(SparkEntry.queries("q01_pricing_summary")) catch { case _: Throwable => () }

    // Fixed per-job cost of this local harness (scheduling + noop commit),
    // measured on a one-row in-memory plan and reported separately so the
    // per-query numbers can be read as overhead + marginal compute.
    val overhead = {
      val probe = (s: SparkSession, _: String) => s.range(1).toDF("id")
      run(probe)
      val trials = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(probe); (System.nanoTime() - t0) / 1e9
      }
      trials.min
    }

    // Optional args filter to specific query names (local iteration).
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }

    // Each query is timed SPARK_GRAFT_BENCH_REPEAT times (default 2): the
    // first pass is the COLD number (`queries`, round-over-round
    // comparable with earlier rounds' single-pass runs), the min across
    // passes the STEADY-STATE number (`queries_warm`, plan/codegen caches
    // warm) — reporting both per round keeps host variance from
    // dominating cross-round reads. REPEAT=1 skips the warm pass.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "2").toInt.max(1)

    var failures = List.empty[String]
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        run(fn)
        val cold = (System.nanoTime() - t0) / 1e9
        val warm = (2 to repeat).foldLeft(cold) { (acc, _) =>
          val t = System.nanoTime(); run(fn)
          math.min(acc, (System.nanoTime() - t) / 1e9)
        }
        name -> (cold, warm)
      } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAILURE $name: ${e.getClass.getName}: ${e.getMessage}")
          failures ::= name
          name -> (-1.0, -1.0)
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v._1 }
      .mkString("{", ",", "}")
    val qsWarm = results.map { case (k, v) => "\"" + k + "\":" + v._2 }
      .mkString("{", ",", "}")
    val errs = failures.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val totalWarm = results.map(_._2._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""queries_warm":$qsWarm,"total_warm":$totalWarm,""" +
      s""""errors":$errs,"overhead_sec_per_query":$overhead,"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
