package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Populate, Survival}

/** Streaming/incremental twin of the q256 Kaplan–Meier pipeline (the
  * drain discipline applied to survival analysis): event files land in
  * chronological waves; each micro-batch extends or closes per-key
  * gap-sessions against a persisted one-row-per-key OPEN-session state,
  * appends newly-CLOSED subjects idempotently (a closed session never
  * revises — its row key is `(key, start_us)`, so replays are keyed
  * no-ops), and the report classifies the still-open state rows against
  * the drained observation edge with the same `end + gap <= edge` rule
  * the one-shot query uses. Drained report ≡ one-shot
  * `Survival.kmLifeTable` row-for-row (StreamingSurvivalSpec; q264's
  * oracle is q256's SQL verbatim).
  *
  * Wave contract (the [[StreamingResample]] rules): batches are
  * chronological per key; a row at or before the key's persisted last
  * event is LATE and dropped — which also makes re-delivered batches
  * no-ops. Within a batch, same-µs duplicates collapse to their max arm
  * flag (a session's arm is the max over its events, so this loses
  * nothing).
  *
  * At 100 TB: state is one logical row per key (appended, read as
  * latest-per-key, compactable); per-wave work is one keyed window over
  * (state ∪ batch) — cost scales with the batch, not the corpus; the
  * subjects table carries one row per closed session.
  */
object StreamingSurvival {

  /** Drain newly-landed event files into the closed-subjects table.
    * `armCol` is a 0/1 long column (e.g. is-purchase) whose per-session
    * max is the stratum. Returns once the backlog is drained.
    */
  def drain(spark: SparkSession, sourceDir: String, subjectsDir: String,
            stateDir: String, checkpointDir: String, keyCol: String,
            tsCol: String, armCol: String,
            schema: org.apache.spark.sql.types.StructType,
            gapUs: Long): Unit = {
    require(gapUs > 0, "gapUs must be > 0")
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "64")
      .parquet(sourceDir)
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ev = batch.select(col(keyCol).as("key"),
            unix_micros(col(tsCol)).as("us"),
            col(armCol).cast("long").as("arm"))
          .groupBy("key", "us").agg(max(col("arm")).as("arm"))
        val state = Populate.readIfExists(spark, stateDir).map(latestPerKey)
        val (kept, withState) = state match {
          case None => (ev, ev.withColumn("__start", lit(null)
            .cast("long")).withColumn("__isState", lit(false)))
          case Some(st) =>
            val k = ev.join(st.select(col("key"),
                col("last_us").as("__st_last")), Seq("key"), "left")
              .filter(col("__st_last").isNull || col("us") > col("__st_last"))
              .select("key", "us", "arm")
            // pseudo-row: the open session's tail, carrying its start —
            // only for keys touched this wave (others stay open as-is)
            val carried = st.join(k.select("key").distinct(), Seq("key"))
              .select(col("key"), col("last_us").as("us"), col("arm"),
                col("start_us").as("__start"), lit(true).as("__isState"))
            (k, k.withColumn("__start", lit(null).cast("long"))
              .withColumn("__isState", lit(false)).unionByName(carried))
        }
        val w = Window.partitionBy("key").orderBy("us")
        val wRun = w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        // cache: BOTH appends (closed subjects, new state) consume the
        // same islands — uncached, each appendIdempotent action would
        // re-read the state parquet and re-run the session window
        val islands = withState
          .withColumn("__prev", lag(col("us"), 1).over(w))
          .withColumn("__new", when(col("__prev").isNull ||
            col("us") - col("__prev") > gapUs, 1L).otherwise(0L))
          .withColumn("__sid", sum(col("__new")).over(wRun))
          .groupBy("key", "__sid")
          .agg(min(coalesce(col("__start"), col("us"))).as("start_us"),
            max(col("us")).as("last_us"), max(col("arm")).as("arm"))
          .persist()
        try {
          val lastSid = islands.groupBy("key")
            .agg(max(col("__sid")).as("__sid"))
          val closed = islands.join(lastSid, Seq("key", "__sid"),
            "left_anti")
          Populate.appendIdempotent(
            closed.select("key", "start_us", "last_us", "arm"),
            subjectsDir, Seq("key", "start_us"))
          val open = islands.join(lastSid, Seq("key", "__sid"))
          Populate.appendIdempotent(
            open.select("key", "start_us", "last_us", "arm"),
            stateDir, Seq("key", "last_us"))
        } finally islands.unpersist()
        ()
      }
      .start()
    query.awaitTermination()
  }

  /** The drained life table: closed subjects are observed events; the
    * open state rows classify against the drained edge (max last event
    * across keys) with the one-shot censor rule. `None` before any
    * drain.
    */
  def report(spark: SparkSession, subjectsDir: String, stateDir: String,
             gapUs: Long): Option[DataFrame] =
    Populate.readIfExists(spark, stateDir).map { raw =>
      val st = latestPerKey(raw)
      val closed = Populate.readIfExists(spark, subjectsDir)
        .getOrElse(st.limit(0))
      val subjects = closed.withColumn("__open", lit(false))
        .unionByName(st.withColumn("__open", lit(true)))
      val edge = broadcast(subjects.agg(max(col("last_us")).as("__edge")))
      val marked = subjects.crossJoin(edge)
        .withColumn("duration_s",
          expr("(last_us - start_us) div 1000000"))
        .withColumn("ended", !col("__open") ||
          Survival.observedEnd(col("last_us"), col("__edge"), gapUs))
        .withColumn("purchased", col("arm"))
      Survival.kmLifeTable(marked, Seq("purchased"), "duration_s", "ended")
    }

  /** Latest open-session row per key (ties on last_us broken by the
    * larger start — equal-last replays write identical rows anyway).
    */
  private def latestPerKey(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("key")
      .orderBy(col("last_us").desc, col("start_us").desc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select("key", "start_us", "last_us", "arm")
  }
}
