package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-oriented defaults every graft job uses.
  *
  * Local testing runs `local[32]` in one JVM, but every config here is chosen
  * so the same plan shape survives a 1000-executor cluster: AQE on (runtime
  * re-plan, skew-join splitting, partition coalescing), broadcast threshold
  * generous enough that all dimension tables (region/nation/supplier/devices/
  * sync-models) broadcast, and shuffle partitions sized for the local core
  * count rather than the 200 default.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // runtime filters: at cluster scale a selective dimension-side
      // predicate injects a bloom filter into the fact-side scan (the
      // dynamic analogue of the static partition pruning Layout gives) —
      // off by default in OSS Spark, a pure win for the star-shaped joins
      // here (J1/J3/J9: dims are small, facts are the 100 TB side)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    // media kernels: in-memory ImageIO streams (the default disk cache
    // creates a temp file per encode/decode — thousands of filesystem ops
    // per task on blob media). JVM-global; local-mode executors share it.
    // Cluster deployments set the same via a small executor plugin or rely
    // on graft.operators.Multimodal's own initializer.
    javax.imageio.ImageIO.setUseCache(false)
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
