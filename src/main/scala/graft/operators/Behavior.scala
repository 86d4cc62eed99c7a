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

  /** Ordered-sequence EPISODE extraction (the MATCH_RECOGNIZE / CEP
    * analogue of [[funnel]]): one output row per final-stage event whose
    * backward last-occurrence chain completes — the most recent
    * `stages(k-2)` row before it THAT ITSELF COMPLETES a prefix chain, the
    * most recent qualifying `stages(k-3)` row before that, …, down to
    * `stages.head`, all within `windowSec` of the anchor (stage-0)
    * timestamp. Where [[funnel]] answers "did SOME chain
    * complete per anchor", this emits the matched rows themselves, plus
    * `n_blockers` — how many `blocker`-type events sit strictly between
    * the stage-0 row and the final row (row order), so callers can demand
    * clean episodes (`n_blockers = 0`) or study interrupted ones.
    *
    * Determinism: rows order by `(µs(tsCol), tieCol)` per user, so equal
    * timestamps cannot flip which occurrence is "most recent"; the blocker
    * count is a running-sum DIFFERENCE (count at final row minus count
    * carried from the stage-0 row), never a per-episode range scan.
    *
    * Output: `(userCol, <stage>_us … one long column per stage, n_blockers,
    * carryCols… from the final row)`.
    *
    * Scale shape: ONE user-keyed shuffle. The running blocker count and
    * every per-stage carry column are window expressions over the same
    * `(user) ordered by (µs, tie)` spec — Catalyst plans them as chained
    * WindowExecs on one sort, no self-joins, no per-episode scans. Stage k
    * carries k+2 longs, so state is O(stages²) columns, not O(rows).
    */
  def matchEpisodes(events: DataFrame, userCol: String, tsCol: String,
                    tieCol: String, typeCol: String, stages: Seq[String],
                    blocker: String, windowSec: Long,
                    carryCols: Seq[String] = Nil): DataFrame = {
    require(stages.size >= 2, "an episode needs at least two stages")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    require(!stages.contains(blocker), "the blocker cannot also be a stage")
    require(windowSec > 0, "windowSec must be positive")
    val base = events.select(
      Seq(col(userCol), unix_micros(col(tsCol)).as("__us"),
        col(tieCol).as("__tie"), col(typeCol).as("__ty")) ++
        carryCols.map(col): _*)
    val ord = Window.partitionBy(userCol).orderBy(col("__us"), col("__tie"))
    val wInc = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrec = ord.rowsBetween(Window.unboundedPreceding, -1)
    // every carry for stage i fires under the SAME gate (stage-i row whose
    // prefix chain is complete), so all carried columns land from one row —
    // an ungated ignoreNulls `last` could mix the latest stage-i row's own
    // µs with an EARLIER row's prefix when the latest row has none
    def carry(gate: org.apache.spark.sql.Column,
              what: org.apache.spark.sql.Column) =
      last(when(gate, what), ignoreNulls = true).over(wPrec)
    // running blocker count, inclusive of the current row (no stage row is
    // a blocker, so at stage rows inclusive == strictly-before)
    var df = base.withColumn("__cb",
      sum(when(col("__ty") === blocker, 1L).otherwise(0L)).over(wInc))
    // stage 0 carries its own µs + the blocker count as of its row
    val g0 = col("__ty") === stages(0)
    df = df
      .withColumn("__c0_us0", carry(g0, col("__us")))
      .withColumn("__c0_cb", carry(g0, col("__cb")))
    // stage i re-carries the whole prefix chain as seen AT its own row —
    // "most recent stage-i row that itself completes a prefix chain"
    for (i <- 1 until stages.size - 1) {
      val gi = col("__ty") === stages(i) && col(s"__c${i - 1}_us0").isNotNull
      for (j <- 0 until i)
        df = df.withColumn(s"__c${i}_us$j",
          carry(gi, col(s"__c${i - 1}_us$j")))
      df = df
        .withColumn(s"__c${i}_us$i", carry(gi, col("__us")))
        .withColumn(s"__c${i}_cb", carry(gi, col(s"__c${i - 1}_cb")))
    }
    val k = stages.size
    val pfx = s"__c${k - 2}"
    val stageUs = (0 until k - 1).map(j => col(s"${pfx}_us$j")) :+ col("__us")
    df.filter(col("__ty") === stages.last &&
        col(s"${pfx}_us0").isNotNull &&
        col("__us") - col(s"${pfx}_us0") <= lit(windowSec * 1000000L))
      .select(Seq(col(userCol)) ++
        stages.zip(stageUs).map { case (st, c) => c.as(s"${st}_us") } ++
        Seq((col("__cb") - col(s"${pfx}_cb")).as("n_blockers")) ++
        carryCols.map(col): _*)
  }

  /** Threshold-crossing BURST detection (the spike/bout-detection shape:
    * amplitude threshold crossings grouped into bursts by inactivity gap).
    * A crossing is a row whose value reaches `threshold` while the
    * previous row's value (per key, ordered by `(µs(tsCol), tieCol)`) was
    * below it — a key's first row is never a crossing. Crossings closer
    * than `gapSeconds` chain into one burst ([[Sessionize.byGap]]
    * gaps-and-islands); one output row per burst:
    * `(keyCol, burst_id, n_crossings, burst_start, burst_end,
    * peak_value)` with `peak_value = round(max(value at crossings), 4)`.
    *
    * Scale shape: one keyed window pass for the lag + one keyed
    * sessionization window + one aggregate — all on the same key, one
    * shuffle; no self-joins, nothing global.
    */
  def thresholdBursts(df: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, valueCol: String, threshold: Double,
                      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val w = Window.partitionBy(keyCol)
      .orderBy(unix_micros(col(tsCol)), col(tieCol))
    val crossings = df
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .filter(col("__prev").isNotNull && col("__prev") < threshold &&
        col(valueCol) >= threshold)
      .select(col(keyCol), col(tsCol), col(valueCol))
    Sessionize.byGap(crossings, tsCol, Seq(keyCol), gapSeconds)
      .groupBy(col(keyCol), col("session_id").as("burst_id"))
      .agg(count(lit(1)).as("n_crossings"),
        min(col(tsCol)).as("burst_start"),
        max(col(tsCol)).as("burst_end"),
        round(max(col(valueCol)), 4).as("peak_value"))
  }

  /** Multi-touch conversion attribution over a lookback window (the
    * marketing-analytics staple): for every conversion event, the FIRST
    * and LAST touch events within `[conv_us - windowSec, conv_us]` plus
    * the touch count — first-touch / last-touch / linear credit models all
    * read off this one row.
    *
    * Semantics are RANGE-frame based (per key, ordered by epoch-micros):
    * peers at the conversion's own timestamp count as touches — a range
    * frame is tie-order-insensitive, so results are deterministic without
    * a tie column, and the count and the picked touches see exactly the
    * same window. First/last picks are lexicographic struct min/max over
    * `(us, tieCol)` inside the aggregate.
    *
    * Output: one row per conversion with ≥1 in-window touch —
    * `(keyCol, tieCol, conv_us, n_touches, first_touch_type,
    * first_touch_us, last_touch_type, last_touch_us)`.
    *
    * Scale shape: ONE keyed shuffle; three window expressions share the
    * same range frame over one sort, no joins, no per-conversion scans.
    */
  def attribution(events: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, typeCol: String, touchTypes: Seq[String],
                  conversionType: String, windowSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(conversionType),
      "the conversion type cannot also be a touch type")
    require(windowSec > 0, "windowSec must be positive")
    val w = Window.partitionBy(keyCol)
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSec * 1000000L, 0L)
    val isTouch = col(typeCol).isin(touchTypes.map(x => x: Any): _*)
    val touchStruct = when(isTouch, struct(
      unix_micros(col(tsCol)).as("u"), col(tieCol).as("i"),
      col(typeCol).as("t")))
    events
      .withColumn("__lt", max(touchStruct).over(w))
      .withColumn("__ft", min(touchStruct).over(w))
      .withColumn("__nt", sum(isTouch.cast("long")).over(w))
      .filter(col(typeCol) === conversionType && col("__nt") > 0)
      .select(col(keyCol), col(tieCol),
        unix_micros(col(tsCol)).as("conv_us"),
        col("__nt").as("n_touches"),
        col("__ft.t").as("first_touch_type"),
        col("__ft.u").as("first_touch_us"),
        col("__lt.t").as("last_touch_type"),
        col("__lt.u").as("last_touch_us"))
  }

  /** One-sided CUSUM change detection (Page 1954) per key: the running
    * statistic `S_i = max(0, S_{i-1} + (x_i - drift))` with an alarm
    * wherever `S_i >= threshold` — the standard sequential detector for a
    * sustained upward mean shift (the reference's QC concern: a camera
    * dropping frames, a sensor drifting hot — `aeon/dj_pipeline/qc.py`
    * flags exactly such sustained deviations).
    *
    * The recursion is NOT computed sequentially: `S_i` has the closed form
    * `P_i - min(0, min_{j<=i} P_j)` where `P` is the plain prefix sum of
    * `(x - drift)` — so the whole detector is two running-window
    * aggregates over ONE keyed sort (prefix sum + running min), fully
    * codegen'd, one shuffle, no per-key sequential state anywhere.
    * CusumSpec pins the identity against the literal fold.
    *
    * All arithmetic is exact longs: `valueMicro` is the signal in integer
    * micros (callers snap doubles with `floor(value*1e6)`), `driftMicro` /
    * `thresholdMicro` likewise. Output: every input row (keyCol, tsCol,
    * tieCol order) with `s_micro` and `alarm`; callers filter `alarm` for
    * changepoints.
    */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
            valueMicroCol: String, driftMicro: Long,
            thresholdMicro: Long): DataFrame = {
    require(thresholdMicro > 0, "thresholdMicro must be positive")
    val w = Window.partitionBy(keyCol)
      .orderBy(unix_micros(col(tsCol)), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__d", col(valueMicroCol) - lit(driftMicro))
      .withColumn("__p", sum(col("__d")).over(w))
      .withColumn("__m", min(col("__p")).over(w))
      .withColumn("s_micro", col("__p") - least(lit(0L), col("__m")))
      .withColumn("alarm", col("s_micro") >= lit(thresholdMicro))
      .drop("__d", "__p", "__m")
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

  /** CONVERSION-PATH analysis — the Sankey/"top paths to purchase"
    * report, the discovery complement of [[funnel]] (which EVALUATES one
    * declared pattern) and [[transitionMatrix]] (which is memoryless
    * pairwise): per session, the ordered event-type prefix up to and
    * including the FIRST `targetType` event (or the whole session if it
    * never converts), capped at `maxSteps` steps; grouped into
    * `(path, n_sessions, n_converted)`.
    *
    * The cap is load-bearing at scale: an uncapped path column is
    * unbounded per-session state and an unbounded group-key domain —
    * every public path-analysis tool caps (and so does the Sankey it
    * feeds). Steps beyond the cap of a converting session mean the
    * conversion is NOT inside the kept prefix; such sessions count in
    * `n_sessions` of their truncated path with `converted = false` —
    * "did not convert within `maxSteps` steps", the report's actual
    * question.
    *
    * Exactness: rank ties break on `tieCol`; the path string joins types
    * with `>` (types must not contain `>`), so any engine replays the
    * same strings. Scale shape: one session-keyed window pass (rank +
    * first-target rank), one session-keyed aggregate building the capped
    * path (bounded collect: ≤ maxSteps elements), one path-keyed count
    * aggregate with map-side partials.
    */
  def conversionPaths(sessions: DataFrame, sessionCols: Seq[String],
                      tsCol: String, tieCol: String, typeCol: String,
                      targetType: String, maxSteps: Int): DataFrame = {
    require(sessionCols.nonEmpty, "conversionPaths needs session keys")
    require(maxSteps >= 1, s"maxSteps must be >= 1 (got $maxSteps)")
    val g = sessionCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(tsCol), col(tieCol))
    val ranked = sessions
      .withColumn("__rk", row_number().over(w))
      .withColumn("__tgt", min(when(col(typeCol) === targetType,
        col("__rk"))).over(Window.partitionBy(g: _*)))
    val kept = ranked.filter(col("__rk") <= least(
      coalesce(col("__tgt"), lit(Long.MaxValue)), lit(maxSteps.toLong)))
    val perSession = kept
      .groupBy(g: _*)
      .agg(
        array_join(transform(array_sort(collect_list(
          struct(col("__rk"), col(typeCol).as("t")))), x => x("t")), ">")
          .as("path"),
        max((col(typeCol) === targetType).cast("long")).as("__conv"))
    perSession.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("__conv")).as("n_converted"))
  }
}
