package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart,
  SparkListenerStageCompleted}

/** Per-job/per-stage wall-clock profiler for one declared query — the
  * measurement companion of [[ExplainQ]] (guide §1: find where the time
  * goes before touching anything). Runs the query through the noop sink
  * and prints every Spark stage it spawned: wall ms, executor cpu, task
  * count, shuffle bytes, stage name. Queries that spawn many driver-side
  * actions (the streaming drain twins) are opaque to a single plan dump;
  * this shows which of their dozens of jobs carry the seconds.
  *
  * Usage: runMain graft.ProfileQ <sfDir> <queryName> [repeat]
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val repeat = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class St(id: Int, ms: Long, cpuMs: Long, tasks: Int,
                        shufRead: Long, shufWrite: Long, input: Long,
                        spill: Long, name: String, runMs: Long = 0,
                        deserMs: Long = 0, gcMs: Long = 0)
    val stages = scala.collection.concurrent.TrieMap.empty[Int, St]
    val jobSpans = scala.collection.concurrent.TrieMap.empty[Int, (Long, Long, String)]
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    @volatile var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (collecting) {
        val site = Option(e.properties).flatMap(p =>
          Option(p.getProperty("callSite.short"))
            .orElse(Option(p.getProperty("spark.job.description")))).getOrElse("?")
        starts(e.jobId) = (e.time, site)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (collecting) {
        starts.get(e.jobId).foreach { case (t0, site) =>
          jobSpans(e.jobId) = (t0, e.time, site)
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = e.stageInfo
          val m = si.taskMetrics
          val ms = (for (a <- si.completionTime; b <- si.submissionTime)
            yield a - b).getOrElse(-1L)
          stages(si.stageId) = St(si.stageId, ms, m.executorCpuTime / 1000000,
            si.numTasks, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead,
            m.memoryBytesSpilled, si.name.takeWhile(_ != '\n').take(90),
            m.executorRunTime, m.executorDeserializeTime, m.jvmGCTime)
        }
    })

    val fn = SparkEntry.queries(name)
    // warmup run (codegen, parquet footers)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    (1 to repeat).foreach { r =>
      stages.clear(); jobSpans.clear(); starts.clear()
      collecting = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      Thread.sleep(300)
      // union of job spans vs wall: the uncovered remainder is driver-side
      // work (Catalyst analysis/optimization, FS metadata, codegen) — the
      // drain twins spawn ~100 actions per query, so this split decides
      // whether to attack task time or action count (guide §7.3)
      val spans = jobSpans.values.toSeq.map { case (a, b, _) => (a, b) }
        .sortBy(_._1)
      val covered = spans.foldLeft((0L, 0L)) { case ((acc, hi), (a, b)) =>
        val lo = math.max(a, hi); (acc + math.max(0L, b - lo), math.max(hi, b))
      }._1
      println(f"== $name run $r: wall $wall%.2f s, ${jobSpans.size} jobs, " +
        f"${stages.size} stages, job-covered ${covered / 1000.0}%.2f s, " +
        f"driver-gap ${wall - covered / 1000.0}%.2f s ==")
      def mb(b: Long) = f"${b / 1048576.0}%.1f"
      stages.values.toSeq.sortBy(-_.ms).take(25).foreach { s =>
        println(f"  stage ${s.id}%4d ${s.ms}%6d ms cpu ${s.cpuMs}%6d run ${s.runMs}%6d " +
          f"deser ${s.deserMs}%5d gc ${s.gcMs}%4d tasks ${s.tasks}%3d " +
          f"in ${mb(s.input)}%7s sr ${mb(s.shufRead)}%7s " +
          f"sw ${mb(s.shufWrite)}%7s spill ${mb(s.spill)}%6s  ${s.name}")
      }
      val jobs = jobSpans.toSeq.sortBy { case (_, (a, b, _)) => a - b }.take(12)
      jobs.foreach { case (id, (a, b, site)) =>
        println(f"  job $id%4d ${b - a}%6d ms  $site")
      }
    }
    spark.stop()
  }
}
