package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream behavioral analytics — ordered-sequence (funnel) matching
  * and cohort retention over the `events` table: the product-analytics
  * operators (Amplitude/Mixpanel-class) a general analytics engine owes
  * its event stream.
  */
object Behavior {

  /** Funnel completion per user: for each occurrence of `steps.head`, did
    * the remaining steps occur IN ORDER afterwards, all within `windowSec`
    * of the anchor? Output: `(userCol, n_anchors, n_completed,
    * conversion_pct)` — one row per user with ≥ 1 anchor;
    * `conversion_pct = 100·completed div anchors` (integer).
    *
    * Semantics: an anchor completes iff SOME ordered chain exists. The
    * implementation walks FIRST-next occurrences (next `steps(1)` after
    * the anchor, then next `steps(2)` after that, …), which is equivalent:
    * any qualifying chain implies the first-next chain qualifies (each
    * first-next timestamp is ≤ its counterpart in any other chain) — so an
    * independent exists-any oracle must agree.
    *
    * Scale shape: per-event "next occurrence of step k" columns come from
    * ONE descending-time window pass per user (running `min` over each
    * step's timestamps — no self-join explosion); the chain then folds
    * with one (user, ts) equi-join per step to read the next pointer AT
    * the previous step's row. Shuffles: one window partition by user +
    * (steps−2) narrow joins.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             windowSec: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(windowSec > 0, "windowSec must be positive")
    val ev = events.select(col(userCol),
      unix_micros(col(tsCol)).as("__us"), col(typeCol))
    // RANGE frame on the integer micros in DESCENDING order: "1 preceding"
    // = values strictly greater — VALUE-based strictly-later semantics, so
    // timestamp ties cannot make the pointer depend on row order
    val w = Window.partitionBy(userCol)
      .orderBy(col("__us").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val withNext = steps.tail.foldLeft(ev) {
      case (df, st) =>
        df.withColumn(s"__next_$st",
          min(when(col(typeCol) === st, col("__us"))).over(w))
    }
    // fold the chain: anchors carry the micros of step k (as __cur); each
    // round joins the step-k rows to read THEIR next-(k+1) pointer
    // (distinct — equal-ts rows carry equal pointers, never fan out)
    val anchors = withNext.filter(col(typeCol) === steps.head)
      .select(col(userCol), col("__us").as("__anchor"),
        col(s"__next_${steps(1)}").as("__cur"))
    val chained = steps.tail.drop(1).foldLeft(anchors) {
      case (df, st) =>
        val prevStep = steps(steps.indexOf(st) - 1)
        df.join(
            withNext.filter(col(typeCol) === prevStep)
              .select(col(userCol), col("__us").as("__cur"),
                col(s"__next_$st").as("__n")).distinct(),
            Seq(userCol, "__cur"), "left")
          .withColumn("__cur", col("__n")).drop("__n")
    }
    chained
      .withColumn("__done", col("__cur").isNotNull &&
        col("__cur") - col("__anchor") <= lit(windowSec * 1000000L))
      .groupBy(userCol)
      .agg(count(lit(1)).as("n_anchors"),
        sum(when(col("__done"), 1L).otherwise(0L)).as("n_completed"))
      .withColumn("conversion_pct",
        expr("100 * n_completed div n_anchors"))
  }

  /** First-order Markov transition matrix of event types: consecutive
    * event pairs per user in time order, counted globally —
    * `(from_type, to_type, n, prob_micro)` with
    * `prob_micro = 10⁶·n div Σ_to n` (integer, row-normalized). Ordering
    * ties break on the type string, so equal-timestamp events cannot make
    * the sequence engine-dependent.
    *
    * Scale shape: one user-keyed window pass (`lead`), one
    * type-pair aggregate (|types|² rows); the row normalization is a
    * window over the tiny aggregated matrix.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol)
      .orderBy(unix_micros(col(tsCol)), col(typeCol))
    events.select(col(userCol), col(tsCol), col(typeCol))
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot",
        sum("n").over(Window.partitionBy("from_type")))
      .withColumn("prob_micro", expr("1000000 * n div __tot"))
      .select("from_type", "to_type", "n", "prob_micro")
  }

  /** Daily cohort retention: users cohorted by their FIRST event's date;
    * one row per (cohort_date, day_offset) with the distinct users active
    * that day — offset 0 is the cohort itself, so `active_users =
    * cohort_size` there. Output: `(cohort_date, day_offset, active_users,
    * cohort_size)`.
    *
    * Scale shape: first-event dates are one user-keyed aggregate; the
    * (user, day) activity grid is a distinct over date-truncated events;
    * the retention matrix is |cohorts|·|days| rows. The user-keyed join
    * reuses the aggregate's partitioning.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val firstDay = events.groupBy(userCol)
      .agg(min(to_date(col(tsCol))).as("cohort_date"))
    val active = events.select(col(userCol), to_date(col(tsCol)).as("__day"))
      .distinct()
    val grid = active.join(firstDay, Seq(userCol))
      .select(col("cohort_date"),
        datediff(col("__day"), col("cohort_date")).cast("long")
          .as("day_offset"),
        col(userCol))
      .groupBy("cohort_date", "day_offset")
      .agg(count(lit(1)).as("active_users"))
    val sizes = firstDay.groupBy("cohort_date")
      .agg(count(lit(1)).as("cohort_size"))
    grid.join(sizes, Seq("cohort_date"))
      .select("cohort_date", "day_offset", "active_users", "cohort_size")
  }
}
