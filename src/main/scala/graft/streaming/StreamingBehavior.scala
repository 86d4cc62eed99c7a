package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel matching — [[graft.operators.Behavior.funnel]]'s
  * incremental twin: per-user running (anchors, completions) maintained
  * with `flatMapGroupsWithState`, so a live event stream reports funnel
  * conversion without ever re-scanning history.
  *
  * State per user: the pending (incomplete, unexpired) anchor chains —
  * each `(anchorUs, lastUs, nextStepIdx)` — plus the two running counts.
  * The state is BOUNDED by the funnel window regardless of stream length:
  * an anchor older than `windowSec` can never complete and is dropped the
  * moment a later event arrives.
  *
  * Semantics match the batch operator exactly (spec-pinned across
  * arbitrary wave splits): events process in (ts, type) order; a chain
  * advances on the FIRST event of its needed step STRICTLY later than its
  * last matched timestamp (ties cannot advance — the batch walk's
  * value-RANGE frame excludes equal timestamps), and completion requires
  * the whole chain inside `windowSec` of the anchor (inclusive). Late
  * rows arriving AFTER a later-ts batch can undercount — the same
  * append-mode late-data caveat the StreamOps twins document; a watermark
  * bounds it in production.
  *
  * Output (Update mode): one `(userCol, n_anchors, n_completed,
  * conversion_pct)` row per touched user per batch — counts are
  * monotone, so the latest row is the truth. Works in batch mode too
  * (state starts empty, one group pass).
  */
object StreamingBehavior {

  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowSec: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(windowSec > 0, "windowSec must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val nSteps = steps.size
    val windowUs = windowSec * 1000000L
    // Key the state on the RAW value rendered as string — NOT cast("long"):
    // a long cast turns non-integral ids (strings, UUIDs) into null and
    // silently collapses all such users into one shared funnel state. The
    // string form is a faithful group identity for any key type; the output
    // column is cast back to the input's type below, so integral callers
    // see an unchanged schema.
    val userType = events.schema(events.schema.fieldIndex(userCol)).dataType
    val rows = events.select(col(userCol).cast("string"),
      unix_micros(col(tsCol).cast("timestamp")), col(typeCol).cast("string"))
      .as[(String, Long, String)]
    val out = rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(Long, Long, Int)], Long, Long),
        (String, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: String, it: Iterator[(String, Long, String)],
         state: GroupState[(Seq[(Long, Long, Int)], Long, Long)]) =>
          var (pending, anchors, completed) =
            if (state.exists) state.get
            else (Seq.empty[(Long, Long, Int)], 0L, 0L)
          it.toSeq.sortBy(e => (e._2, e._3)).foreach { case (_, us, tp) =>
            // expired chains can never complete once a later event exists
            pending = pending.filter { case (a, _, _) => a + windowUs >= us }
            stepIdx.get(tp) match {
              case Some(0) =>
                anchors += 1
                pending = pending :+ ((us, us, 1))
              case Some(k) =>
                // strictly-later rule: equal timestamps cannot advance
                val (adv, keep) = pending.partition { case (_, last, idx) =>
                  idx == k && us > last
                }
                val stepped = adv.map { case (a, _, _) => (a, us, k + 1) }
                val (done, cont) = stepped.partition(_._3 == nSteps)
                completed += done.size
                pending = keep ++ cont
              case None => ()
            }
          }
          state.update((pending, anchors, completed))
          Iterator((user, anchors, completed))
      }
    // a user can surface before its first anchor (a batch of non-anchor
    // events) — conversion is 0 there, not a division error
    out.toDF(userCol, "n_anchors", "n_completed")
      .withColumn(userCol, col(userCol).cast(userType))
      .withColumn("conversion_pct",
        when(col("n_anchors") > 0,
          expr("100 * n_completed div n_anchors")).otherwise(0L))
  }
}
