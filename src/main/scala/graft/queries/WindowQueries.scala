package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, IntervalJoin, Sessionize}
import graft.functions.{HashFunctions, StatsFunctions}
import graft.sources.Tables

/** Window + advanced-join pack — SURVEY.md §2.5 (W1-W7), §2.3 J3/J4/J5,
  * §2.4 A2/A7/A8. All windows partition by `user_id`, so the single shuffle
  * is keyed and scales with the user cardinality; no global windows in the
  * hot path.
  */
object WindowQueries {

  type Q = (SparkSession, String) => DataFrame

  private def wUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  val queries: Map[String, Q] = Map(
    // W1: lag-difference (reference CameraQC frame deltas, qc.py:92-99).
    "q20_lag_delta" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(wUser))
            .as("dt_micros"),
          round(col("value") - lag(col("value"), 1).over(wUser), 6).as("dvalue"))
        .orderBy("user_id", "ts", "event_id")
    }),

    // W2: running sum (qc.py:99 cumulative dropped frames).
    "q21_running_sum" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          round(sum(col("value")).over(
            wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
            .as("running_value"))
        .orderBy("user_id", "ts", "event_id")
    }),

    // W3: time-range trailing window (tracking.py:319 rolling("1s")) —
    // trailing 1 hour here; RANGE frame over epoch-micros so peers at equal
    // timestamps are handled identically in both engines.
    "q22_range_rolling" -> ((s, d) => {
      val wRange = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          round(sum(col("value")).over(wRange), 4).as("trailing_1h_value"),
          count(lit(1)).over(wRange).as("trailing_1h_events"))
        .orderBy("user_id", "ts", "event_id")
    }),

    // W5: top-1 per group (dj.Top(limit=1), ephys.py:788-790).
    "q23_latest_per_user" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy("user_id")
    }),

    // W6: look-back epoch closure (acquisition.py:253-304): each signup opens
    // an epoch; end = next signup, duration capped at 7 days (lead + least).
    "q24_epoch_closure" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      Tables.events(s, d)
        .filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("epoch_start"),
          least(lead(col("ts"), 1).over(w),
            col("ts") + expr("INTERVAL 7 DAYS")).as("epoch_end"))
        .orderBy("user_id", "epoch_start")
    }),

    // W7: sessionization by inactivity gap (tracking.py:318-323 pattern),
    // 30-minute gap; per-session aggregates.
    "q25_sessionize" -> ((s, d) => {
      Sessionize.byGap(Tables.events(s, d), "ts", Seq("user_id"), gapSeconds = 1800)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          round(sum(col("value")), 4).as("session_value"))
        .orderBy("user_id", "session_id")
    }),

    // J5: as-of join — each purchase matched to the user's most recent
    // at-or-before signup (pandas merge_asof / reindex-pad semantics).
    "q26_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"))
      AsOfJoin.backward(purchases, signups, "ts", "signup_ts", keys = Seq("user_id"))
        .select("event_id", "user_id", "ts", "value", "signup_ts")
        .orderBy("user_id", "ts", "event_id")
    }),

    // J4: interval-overlap join via bucket decomposition — purchases within
    // ±5 min of an error by the same user (onix_imu.py:131-133 semantics).
    "q27_interval_overlap" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          (unix_micros(col("ts")) - 300L * 1000000L).as("win_start"),
          (unix_micros(col("ts")) + 300L * 1000000L).as("win_end"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          unix_micros(col("ts")).as("p_start"), unix_micros(col("ts")).as("p_end"))
        .withColumnRenamed("p_user", "user_id")
      IntervalJoin.overlapBucketed(
        errors, purchases, "win_start", "win_end", "p_start", "p_end",
        bucketWidth = 600L * 1000000L,
        leftKeys = Seq("error_id"), rightKeys = Seq("purchase_id"),
        equiKeys = Seq("user_id"))
        .select("error_id", "purchase_id", "user_id")
        .orderBy("error_id", "purchase_id")
    }),

    // A8: per-group regression aggregate (HarpSync sync model,
    // schema/ephys.py:35-71): value ~ seconds-since-epoch-start per user.
    "q28_regression" -> ((s, d) => {
      val x = unix_micros(col("ts")).cast("double") / 1e6
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(StatsFunctions.regression(col("value"), x).as("model"))
        .select(col("user_id"),
          round(col("model.slope") * 1e6, 6).as("slope_per_mega_s"),
          round(col("model.r2"), 6).as("r2"),
          col("model.n").as("n"))
        .orderBy("user_id")
    }),

    // A3/A4: summary stats incl. median-diff sampling rate (stats.py:14-39).
    "q29_stream_stats" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("__diff",
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).cast("double"))
        .groupBy(col("event_type"))
        .agg(
          count(col("value")).as("count"),
          round(min(col("value")), 4).as("min"),
          round(max(col("value")), 4).as("max"),
          round(avg(col("value")), 4).as("mean"),
          round(lit(1e6) / percentile(col("__diff"), lit(0.5)), 10).as("rate_hz"))
        .orderBy("event_type")
    }),

    // A7: config-equality hash aggregate (load_metadata.py:780-788,
    // hashing.py:7-13): MD5 over sorted per-user event-type counts.
    "q30_config_hash" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(HashFunctions.configHash(col("event_type"), col("n")).as("config_hash"))
        .orderBy("user_id")
    }),

    // A2: bidirectional frontier (spike_sorting.py:1276-1299): per user the
    // processed window is [min,max] of purchase times; count candidate events
    // outside it on each side.
    "q31_frontier" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val frontier = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      ev.join(frontier, Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts") < col("lo"), 1L).otherwise(0L)).as("n_before"),
          sum(when(col("ts") > col("hi"), 1L).otherwise(0L)).as("n_after"))
        .orderBy("user_id")
    }),

    // Ordered-sequence FUNNEL (view → click → purchase within 24 h of the
    // view): first-next pointer walk off ONE descending value-RANGE window
    // per user — equivalent to exists-any-chain (the oracle IS the
    // independent exists-any formulation), no self-join explosion.
    "q32_funnel" -> ((s, d) => {
      graft.operators.Behavior.funnel(Tables.events(s, d), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"),
          windowSec = 24L * 3600L)
        .orderBy("user_id")
    }),

    // Shannon entropy of each user's event-type mix (behavioral
    // diversity), order-proof: H = ln N − (Σ n·ln n)/N with EVERY term
    // snapped to the micro grid BEFORE the sum — Σ floor(10⁶·n·ln n) is
    // an integer sum (order-independent), the division is integer `div`,
    // and ln is called once per (user, type) count plus once per user.
    "q36_user_entropy" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        .withColumn("__term",
          floor(lit(1e6) * col("n").cast("double") *
            log(col("n").cast("double"))).cast("long"))
        .groupBy("user_id")
        .agg(sum("n").as("n_events"), sum("__term").as("__s"))
        .select(col("user_id"), col("n_events"),
          (floor(lit(1e6) * log(col("n_events").cast("double")))
            .cast("long") - expr("__s div n_events")).as("entropy_micro"))
        .orderBy("user_id")
    }),

    // Running DISTINCT-user count by day via the first-seen trick:
    // distinct-to-hour(h) = count of users whose FIRST event hour <= h —
    // one user-keyed aggregate + a running sum over the CALENDAR-scale
    // (hour, n_new) axis (the only global window, calendar-bounded at
    // any SF; never over events). Hours with no new users are absent.
    "q35_cumulative_distinct" -> ((s, d) => {
      val firstHour = Tables.events(s, d).groupBy("user_id")
        .agg(min(date_trunc("hour", col("ts"))).as("hour"))
      firstHour.groupBy("hour").agg(count(lit(1)).as("n_new"))
        .withColumn("cum_users", sum("n_new").over(
          Window.orderBy("hour")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("hour")
    }),

    // First-order Markov transition matrix of event types: one user-keyed
    // lead pass (ties break on the type string), |types|² aggregate,
    // integer row normalization (10⁶·n div row-total).
    "q34_transitions" -> ((s, d) => {
      graft.operators.Behavior.transitionMatrix(Tables.events(s, d),
          "user_id", "ts", "event_type")
        .orderBy("from_type", "to_type")
    }),

    // Daily cohort retention: users cohorted by first-event date, one row
    // per (cohort_date, day_offset) — all date/integer arithmetic.
    "q33_cohort_retention" -> ((s, d) => {
      graft.operators.Behavior.cohortRetention(Tables.events(s, d),
          "user_id", "ts")
        .orderBy("cohort_date", "day_offset")
    }),

    // Regular-rate resampling (the interpolating cousin of q26's as-of
    // pad): each event_type's irregular value series lands on the absolute
    // 1-hour grid by micro-integer linear interpolation — one keyed window
    // sort brackets every grid point in both directions at once.
    "q174_resample_interp" -> ((s, d) => {
      graft.operators.Resample.linearGrid(Tables.events(s, d), "event_type",
          "ts", "value", stepMicros = 3600L * 1000000L)
        .withColumnRenamed("key", "event_type")
        .orderBy("event_type", "grid_ts")
    }),

    // Resampling from a STREAMING DRAIN (q174's incremental twin, the
    // q142 discipline): the event stream lands in two chronological
    // waves, each drained against the persisted per-key last-sample state
    // (grid points close as their forward bracket arrives; the corpus is
    // never re-read). Oracle = q174's verbatim — drained ≡ one-shot is
    // the contract; the cross-wave brackets (state sample ↔ first wave-2
    // sample) are exactly the rows that break if the state plumbing is
    // wrong.
    // Ordered-sequence EPISODE extraction (the MATCH_RECOGNIZE/CEP row-
    // emitting cousin of q32's funnel): every purchase whose backward
    // last-occurrence chain purchase→click→view completes within 24 h of
    // the view, with the count of error events strictly between the view
    // and the purchase (running-sum difference — no per-episode scan).
    // One user-keyed shuffle; the carries are chained window expressions
    // over one sort.
    "q196_match_episodes" -> ((s, d) => {
      graft.operators.Behavior.matchEpisodes(Tables.events(s, d),
          "user_id", "ts", "event_id", "event_type",
          Seq("view", "click", "purchase"), blocker = "error",
          windowSec = 24L * 3600L, carryCols = Seq("event_id"))
        .withColumnRenamed("event_id", "purchase_event_id")
        .orderBy("user_id", "purchase_us", "purchase_event_id")
    }),

    // Threshold-crossing BURST detection (the spike/bout-detection shape
    // over an irregular signal): upward crossings of value ≥ 15 per user,
    // crossings within 6 h of each other chained into one burst; per-burst
    // count/extent/peak. One keyed shuffle end-to-end (lag + gaps-and-
    // islands + aggregate all on user_id).
    "q197_threshold_bursts" -> ((s, d) => {
      graft.operators.Behavior.thresholdBursts(Tables.events(s, d),
          "user_id", "ts", "event_id", "value", threshold = 15.0,
          gapSeconds = 6L * 3600L)
        .orderBy("user_id", "burst_id")
    }),

    // Interval-set UNION (coalesce): view events open half-open validity
    // spans of `value` hours; overlapping/touching spans per user merge
    // into maximal intervals (gaps-and-islands on running max(end) — one
    // keyed shuffle, no self-join, cost independent of overlap depth).
    "q200_interval_union" -> ((s, d) => {
      val iv = Tables.events(s, d)
        .filter(col("event_type") === "view" && col("value") > 0)
        .select(col("user_id"), unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) +
            floor(col("value") * 3600).cast("long") * 1000000L).as("e_us"))
      graft.operators.Intervals.merge(iv, Seq("user_id"), "s_us", "e_us")
        .orderBy("user_id", "interval_id")
    }),

    // Interval-set INTERSECTION: spans where a view validity interval AND
    // a click validity interval are simultaneously active, per user — the
    // ±1 delta sweep (two running sums over one keyed sort), with adjacent
    // live slices coalesced. The SET-algebra complement to J4's pairing
    // interval join.
    "q201_interval_intersect" -> ((s, d) => {
      def iv(t: String) = Tables.events(s, d)
        .filter(col("event_type") === t && col("value") > 0)
        .select(col("user_id"), unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) +
            floor(col("value") * 3600).cast("long") * 1000000L).as("e_us"))
      graft.operators.Intervals.intersect(iv("view"), iv("click"),
          Seq("user_id"), "s_us", "e_us")
        .orderBy("user_id", "interval_id")
    }),

    // One-sided CUSUM changepoint alarms (Page's sequential detector for a
    // sustained upward mean shift), drift 55.0, threshold 200.0, exact
    // integer micros: the per-key recursion computed via its closed form
    // (prefix sum minus clamped running min) — two running windows over
    // one keyed sort, no sequential state.
    "q202_cusum_alarms" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
      graft.operators.Behavior.cusum(ev, "user_id", "ts", "event_id", "vm",
          driftMicro = 55000000L, thresholdMicro = 200000000L)
        .filter(col("alarm"))
        .select("user_id", "ts", "event_id", "s_micro")
        .orderBy("user_id", "ts", "event_id")
    }),

    // OHLC bar downsampling: per (user, UTC day) open/high/low/close/
    // count/sum in exact micros — open/close picked by lexicographic
    // struct min/max INSIDE the aggregate (no window pass), so the whole
    // operator is one partial-aggregated keyed shuffle.
    "q203_ohlc_bars" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
      graft.operators.Resample.ohlcBars(ev, Seq("user_id"), "ts",
          "event_id", "vm", bucketMicros = 86400L * 1000000L)
        .orderBy("user_id", "bucket_start_us")
    }),

    // Rolling 20-row OLS trend per user as the exact integer rational
    // (num, den): five window sums over one trailing frame, zero floats —
    // slope comparisons without ulp hazards, division deferred to the
    // presentation edge.
    "q204_rolling_slope" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
      val frame = w.rowsBetween(-19, Window.currentRow)
      Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
        .withColumn("x", row_number().over(w).cast("long"))
        .withColumn("__t", StatsFunctions.rollingSlope(col("x"), col("vm"), frame))
        .filter(col("__t.n") >= 2)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("__t.num").as("slope_num"), col("__t.den").as("slope_den"),
          col("__t.n").as("n_window"))
        .orderBy("user_id", "ts", "event_id")
    }),

    // Cohort LTV curve: users cohorted by first-event day (q33's rule);
    // cumulative purchase revenue per cohort by age-in-days, exact micros
    // with the cumulative sum per cohort over one keyed sort — the
    // revenue companion to q33's retention counts.
    "q222_cohort_ltv" -> ((s, d) => {
      val day = 86400000000L
      val us = unix_micros(col("ts"))
      val ev = Tables.events(s, d)
      val cohort = ev.groupBy("user_id")
        .agg(expr(s"min(unix_micros(ts)) div $day").as("cohort_day"))
      val rev = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr(s"unix_micros(ts) div $day").as("d"),
          floor(col("value") * 1000000).cast("long").as("vm"))
      val byAge = rev.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("d") - col("cohort_day")).as("age_days"))
        .agg(sum(col("vm")).as("revenue_micro"))
      val wc = Window.partitionBy(col("cohort_day")).orderBy(col("age_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byAge
        .withColumn("cum_revenue_micro", sum(col("revenue_micro")).over(wc))
        .orderBy("cohort_day", "age_days")
    }),

    // Funnel step drop-off: users reaching each prefix of view → click →
    // purchase within the q32 window — the step table every funnel chart
    // renders; three bounded driver counts (one long each), percentages
    // as integer div of the step-1 base.
    "q220_funnel_steps" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val base = ev.filter(col("event_type") === "view")
        .select("user_id").distinct().count()
      def reached(steps: Seq[String]) =
        graft.operators.Behavior.funnel(ev, "user_id", "ts", "event_type",
            steps, windowSec = 86400L)
          .filter(col("n_completed") > 0).count()
      import s.implicits._
      Seq((1L, "view", base),
          (2L, "click", reached(Seq("view", "click"))),
          (3L, "purchase", reached(Seq("view", "click", "purchase"))))
        .toDF("step", "step_type", "n_users")
        .withColumn("pct_of_first", expr(s"(100 * n_users) div ${base}L"))
        .orderBy("step")
    }),

    // 2×2 chi-square independence test (contains-click? ×
    // contains-purchase? over 30-min sessions) as an EXACT rational:
    // χ²·10⁶ = 10⁶·N·(ad−bc)² div ((a+b)(c+d)(a+c)(b+d)) — the numerator
    // squares overflow BIGINT, so the one statistic runs in
    // DECIMAL(38,0) and snaps to an integer micro at the end. Session
    // flags + one aggregate, one row out.
    "q221_chi_square" -> ((s, d) => {
      val flags = Sessionize.byGap(Tables.events(s, d), "ts",
          Seq("user_id"), gapSeconds = 1800)
        .groupBy("user_id", "session_id")
        .agg(max((col("event_type") === "click").cast("long")).as("e"),
          max((col("event_type") === "purchase").cast("long")).as("c"))
      flags.agg(
          sum(when(col("e") === 1 && col("c") === 1, 1L).otherwise(0L)).as("a"),
          sum(when(col("e") === 1 && col("c") === 0, 1L).otherwise(0L)).as("b"),
          sum(when(col("e") === 0 && col("c") === 1, 1L).otherwise(0L)).as("c"),
          sum(when(col("e") === 0 && col("c") === 0, 1L).otherwise(0L)).as("d"))
        .withColumn("n_users", col("a") + col("b") + col("c") + col("d"))
        .withColumn("chi2_micro", expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * n_users
            |  * CAST((a*d - b*c) AS DECIMAL(38,0))
            |  * CAST((a*d - b*c) AS DECIMAL(38,0)))
            | div (CAST((a+b) AS DECIMAL(38,0)) * (c+d) * (a+c) * (b+d))
            | AS BIGINT)""".stripMargin))
    }),

    // Market-basket association over 30-min sessions: for every unordered
    // event-type pair, co-occurrence support and LIFT as an exact integer
    // micro (lift = n_ab·N / (n_a·n_b)) — the association-rules family on
    // q25's sessionization; the pair join is per-session over the DISTINCT
    // type set, so expansion is bounded by the type vocabulary², never by
    // event volume.
    "q219_market_basket" -> ((s, d) => {
      val m = Sessionize.byGap(Tables.events(s, d), "ts", Seq("user_id"),
          gapSeconds = 1800)
        .select("user_id", "session_id", "event_type").distinct()
      val nSessions = m.select("user_id", "session_id").distinct().count()
      val singles = m.groupBy(col("event_type").as("t"))
        .agg(count(lit(1)).as("n_t"))
      val pairs = m.select(col("user_id"), col("session_id"),
          col("event_type").as("type_a"))
        .join(m.select(col("user_id"), col("session_id"),
          col("event_type").as("type_b")), Seq("user_id", "session_id"))
        .filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_ab"))
      pairs
        .join(singles.select(col("t").as("type_a"), col("n_t").as("n_a")),
          Seq("type_a"))
        .join(singles.select(col("t").as("type_b"), col("n_t").as("n_b")),
          Seq("type_b"))
        .withColumn("n_sessions", lit(nSessions))
        .withColumn("lift_micro",
          expr("(1000000 * n_ab * n_sessions) div (n_a * n_b)"))
        .select("type_a", "type_b", "n_ab", "n_a", "n_b", "n_sessions",
          "lift_micro")
        .orderBy("type_a", "type_b")
    }),

    // Peri-event time histogram (the PSTH/PETH — THE alignment analysis of
    // the reference's domain): error events aligned around each purchase
    // within ±6 h, counted per 1-h offset bin, rate as exact integer
    // events-per-1000-triggers. The pair join is the bucketed interval
    // join (J4) with a same-user equi key — never a time cross join; the
    // +win shift keeps the bin division on nonnegative values so floor ≡
    // truncate on every engine.
    "q217_peth" -> ((s, d) => {
      val win = 6L * 3600L * 1000000L
      val binW = 3600L * 1000000L
      val ev = Tables.events(s, d)
      val trig = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("trig_id"), col("user_id"),
          unix_micros(col("ts")).as("t_us"))
        .withColumn("w_start", col("t_us") - win)
        .withColumn("w_end", col("t_us") + win)
      val obs = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("obs_id"), col("user_id"),
          unix_micros(col("ts")).as("e_us"))
        .withColumn("e_end", col("e_us"))
      val nTrig = trig.count() // one driver long — bounded by design
      IntervalJoin.overlapBucketed(trig, obs, "w_start", "w_end",
          "e_us", "e_end", bucketWidth = 2 * win,
          leftKeys = Seq("trig_id"), rightKeys = Seq("obs_id"),
          equiKeys = Seq("user_id"))
        .withColumn("off", col("e_us") - col("t_us"))
        .filter(col("off") >= -win && col("off") < win)
        .withColumn("bin",
          expr(s"(off + $win) div $binW") - lit(win / binW))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_events"))
        .withColumn("n_triggers", lit(nTrig))
        .withColumn("events_per_ktrigger",
          expr("(1000 * n_events) div n_triggers"))
        .orderBy("bin")
    }),

    // Sample autocorrelation of each event type's hourly count series at
    // lags 1–3, as exact integer rationals (num, den_x, den_y) — the
    // correlogram statistic with every float deferred to the presentation
    // edge; the regular grid makes the lag join an EQUI join. Internals
    // run DECIMAL(38,0); the emitted statistics snap to BIGINT with a
    // loud range guard (VERDICT r11 #1 — values ≤ ~1.6e17 at sf0.1).
    "q215_acf_hourly" -> ((s, d) => {
      import graft.functions.StatsFunctions.snapLong
      val series = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("idx"))
        .agg(count(lit(1)).as("v"))
      graft.operators.Correlate.autocorr(series, Seq("event_type"),
          "idx", "v", lags = Seq(1, 2, 3))
        .select(col("event_type"), col("lag"), col("n"),
          snapLong(col("num")).as("num"),
          snapLong(col("den_x")).as("den_x"),
          snapLong(col("den_y")).as("den_y"))
        .orderBy("event_type", "lag")
    }),

    // Cross-correlation between the view and click hourly count series at
    // lags −3…3 (one global series pair — presentation-edge scale, the
    // constant key is explicit).
    "q216_crosscorr_hourly" -> ((s, d) => {
      def series(t: String) = Tables.events(s, d)
        .filter(col("event_type") === t)
        .groupBy(expr("unix_micros(ts) div 3600000000").as("idx"))
        .agg(count(lit(1)).as("v"))
        .withColumn("pair", lit("view~click"))
      graft.operators.Correlate.pearsonAtLags(series("view"),
          series("click"), Seq("pair"), "idx", "v",
          lags = Seq(-3, -2, -1, 0, 1, 2, 3))
        .select(col("pair"), col("lag"), col("n"),
          graft.functions.StatsFunctions.snapLong(col("num")).as("num"),
          graft.functions.StatsFunctions.snapLong(col("den_x")).as("den_x"),
          graft.functions.StatsFunctions.snapLong(col("den_y")).as("den_y"))
        .orderBy("lag")
    }),

    // Sliding 7-day distinct active users per day WITHOUT a sliding
    // distinct: each (user, day) pair contributes itself to the 7 window
    // ends it can satisfy (map-only ×7 explode), dedup, count — bounded
    // expansion instead of a per-day distinct scan; window ends clipped
    // to days present in the data.
    "q213_sliding_active_users" -> ((s, d) => {
      val day = 86400L * 1000000L
      val us = unix_micros(col("ts"))
      val ud = Tables.events(s, d)
        .select(col("user_id"), (us - pmod(us, lit(day))).as("d"))
        .distinct()
      val days = ud.select(col("d").as("b")).distinct()
      ud.withColumn("b", explode(sequence(col("d"), col("d") + 6L * day,
          lit(day))))
        .select("user_id", "b").distinct()
        .join(days, Seq("b"), "left_semi")
        .groupBy(col("b").as("window_end_day_us"))
        .agg(count(lit(1)).as("active_users_7d"))
        .orderBy("window_end_day_us")
    }),

    // Top-20 event-type PATHS (consecutive trigrams per user, two lags
    // over one keyed sort) — the order-2 sequence signal next to q34's
    // order-1 Markov transitions; ties broken lexicographically so the
    // global TakeOrderedAndProject is deterministic.
    "q214_event_trigrams" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
      Tables.events(s, d)
        .withColumn("t0", lag(col("event_type"), 2).over(w))
        .withColumn("t1", lag(col("event_type"), 1).over(w))
        .filter(col("t0").isNotNull)
        .groupBy(col("t0"), col("t1"), col("event_type").as("t2"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t0"), col("t1"), col("t2"))
        .limit(20)
    }),

    // Covered time per (user, UTC day) from the q200 interval set — merge,
    // split each merged span across the day grid (map-only sequence
    // explode bounded by covered time), sum per-bucket overlap. The
    // duty-cycle / time-in-ROI shape.
    "q209_daily_coverage" -> ((s, d) => {
      val iv = Tables.events(s, d)
        .filter(col("event_type") === "view" && col("value") > 0)
        .select(col("user_id"), unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) +
            floor(col("value") * 3600).cast("long") * 1000000L).as("e_us"))
      graft.operators.Intervals.coverageByBucket(iv, Seq("user_id"),
          "s_us", "e_us", bucketMicros = 86400L * 1000000L)
        .orderBy("user_id", "bucket_start_us")
    }),

    // Multi-touch attribution over a 3-day lookback: every purchase with
    // its first/last touch (view/click/signup) and in-window touch count
    // — one keyed shuffle, three window expressions on one RANGE frame
    // (tie-order-insensitive by construction).
    "q206_attribution" -> ((s, d) => {
      graft.operators.Behavior.attribution(Tables.events(s, d),
          "user_id", "ts", "event_id", "event_type",
          touchTypes = Seq("view", "click", "signup"),
          conversionType = "purchase", windowSec = 3L * 86400L)
        .orderBy("user_id", "conv_us", "event_id")
    }),

    // Streaming/incremental twin of q197's burst detection (the drain
    // discipline): events land in two chronological waves; bursts chain
    // across the wave boundary through persisted per-key state, and the
    // drained table equals the one-shot row-for-row (micros form).
    "q205_bursts_from_drain" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
        .select("user_id", "ts", "event_id", "vm")
      val root = java.nio.file.Files
        .createTempDirectory("graft-bursts-q205").toString
      val (src, bursts, state, ckpt) =
        (root + "/src", root + "/bursts", root + "/state", root + "/ckpt")
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("event_id", LongType), StructField("vm", LongType)))
      val pivot = lit("2024-01-15 00:00:00").cast("timestamp")
      ev.filter(col("ts") < pivot).write.mode("append").parquet(src)
      graft.streaming.StreamingBehavior.burstDrain(s, src, bursts, state,
        ckpt, "user_id", "ts", "event_id", "vm", schema,
        thresholdMicro = 15000000L, gapSeconds = 6L * 3600L)
      ev.filter(col("ts") >= pivot).write.mode("append").parquet(src)
      graft.streaming.StreamingBehavior.burstDrain(s, src, bursts, state,
        ckpt, "user_id", "ts", "event_id", "vm", schema,
        thresholdMicro = 15000000L, gapSeconds = 6L * 3600L)
      graft.streaming.StreamingBehavior.loadBursts(s, bursts, state)
        .withColumnRenamed("key", "user_id")
        .orderBy("user_id", "burst_id")
    }),

    // Streaming/incremental twin of q202's CUSUM: the closed form's state
    // is just (prefix sum, prefix min) per key — three carried longs —
    // so change detection drains waves with O(1) state and never re-reads
    // the corpus. Oracle = the one-shot closed-form replay.
    "q212_cusum_from_drain" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
        .select("user_id", "ts", "event_id", "vm")
      val root = java.nio.file.Files
        .createTempDirectory("graft-cusum-q212").toString
      val (src, alarms, state, ckpt) =
        (root + "/src", root + "/alarms", root + "/state", root + "/ckpt")
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("event_id", LongType), StructField("vm", LongType)))
      val pivot = lit("2024-01-15 00:00:00").cast("timestamp")
      ev.filter(col("ts") < pivot).write.mode("append").parquet(src)
      graft.streaming.StreamingCusum.drain(s, src, alarms, state, ckpt,
        "user_id", "ts", "event_id", "vm", schema,
        driftMicro = 55000000L, thresholdMicro = 200000000L)
      ev.filter(col("ts") >= pivot).write.mode("append").parquet(src)
      graft.streaming.StreamingCusum.drain(s, src, alarms, state, ckpt,
        "user_id", "ts", "event_id", "vm", schema,
        driftMicro = 55000000L, thresholdMicro = 200000000L)
      graft.streaming.StreamingCusum.loadAlarms(s, alarms)
        .withColumnRenamed("key", "user_id")
        .withColumnRenamed("tie", "event_id")
        .orderBy("user_id", "us", "event_id")
    }),

    // Streaming/incremental twin of q196's episode extraction (VERDICT
    // r10 #5): events land in two chronological waves; the per-user carry
    // chains — exactly the batch operator's gated last-occurrence state,
    // O(stages²) longs per key — compose across the wave boundary through
    // a persisted state row, and the drained table equals the one-shot
    // row-for-row. Oracle = q196's verbatim; the cross-wave episodes
    // (view/click in wave 1, purchase in wave 2) are the rows that break
    // if the carry seeding is wrong.
    "q223_episodes_from_drain" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val ev = Tables.events(s, d)
        .select("user_id", "ts", "event_id", "event_type")
      val root = java.nio.file.Files
        .createTempDirectory("graft-episodes-q223").toString
      val (src, out, state, ckpt) =
        (root + "/src", root + "/episodes", root + "/state", root + "/ckpt")
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("event_id", LongType),
        StructField("event_type", StringType)))
      val pivot = lit("2024-01-15 00:00:00").cast("timestamp")
      def wave(): Unit =
        graft.streaming.StreamingEpisodes.episodeDrain(s, src, out, state,
          ckpt, "user_id", "ts", "event_id", "event_type", schema,
          stages = Seq("view", "click", "purchase"), blocker = "error",
          windowSec = 24L * 3600L)
      ev.filter(col("ts") < pivot).write.mode("append").parquet(src)
      wave()
      ev.filter(col("ts") >= pivot).write.mode("append").parquet(src)
      wave()
      graft.streaming.StreamingEpisodes.loadEpisodes(s, out)
        .withColumnRenamed("key", "user_id")
        .withColumnRenamed("tie", "purchase_event_id")
        .orderBy("user_id", "purchase_us", "purchase_event_id")
    }),

    // Streaming/incremental twin of q206's multi-touch attribution
    // (VERDICT r10 #5): the state is the lookback window itself — per-key
    // touches within 3 days of the frontier — so cross-wave conversions
    // (purchase in wave 2 attributed to wave-1 touches) read the buffer,
    // never the corpus. Oracle = q206's verbatim.
    "q224_attribution_from_drain" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val ev = Tables.events(s, d)
        .select("user_id", "ts", "event_id", "event_type")
      val root = java.nio.file.Files
        .createTempDirectory("graft-attrib-q224").toString
      val (src, out, touches, frontier, ckpt) = (root + "/src",
        root + "/attributed", root + "/touches", root + "/frontier",
        root + "/ckpt")
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("event_id", LongType),
        StructField("event_type", StringType)))
      val pivot = lit("2024-01-15 00:00:00").cast("timestamp")
      def wave(): Unit =
        graft.streaming.StreamingAttribution.attributionDrain(s, src, out,
          touches, frontier, ckpt, "user_id", "ts", "event_id",
          "event_type", schema, touchTypes = Seq("view", "click", "signup"),
          conversionType = "purchase", windowSec = 3L * 86400L)
      ev.filter(col("ts") < pivot).write.mode("append").parquet(src)
      wave()
      ev.filter(col("ts") >= pivot).write.mode("append").parquet(src)
      wave()
      graft.streaming.StreamingAttribution.loadAttributed(s, out)
        .withColumnRenamed("key", "user_id")
        .withColumnRenamed("tie", "event_id")
        .orderBy("user_id", "conv_us", "event_id")
    }),

    // The q196 episode operator through the SQL FRONTEND (VERDICT r10 #7
    // — the SQL surface keeps pace with the Scala API): the same gated
    // last-occurrence carry chain written as spark.sql() window text;
    // oracle = q196's verbatim, so SQL ≡ Scala ≡ DuckDB three ways.
    "q225_sql_episodes" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("graft_sql_events")
      s.sql("""WITH base AS (
          SELECT user_id, unix_micros(ts) AS us, event_id, event_type
          FROM graft_sql_events),
        cb AS (SELECT *,
            sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
          FROM base),
        c0 AS (SELECT *,
            last(CASE WHEN event_type = 'view' THEN us END, true)
              OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c0_us0,
            last(CASE WHEN event_type = 'view' THEN cb END, true)
              OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c0_cb
          FROM cb),
        c1 AS (SELECT *,
            last(CASE WHEN event_type = 'click' AND c0_us0 IS NOT NULL
              THEN c0_us0 END, true)
              OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c1_us0,
            last(CASE WHEN event_type = 'click' AND c0_us0 IS NOT NULL
              THEN us END, true)
              OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c1_us1,
            last(CASE WHEN event_type = 'click' AND c0_us0 IS NOT NULL
              THEN c0_cb END, true)
              OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c1_cb
          FROM c0)
        SELECT user_id, c1_us0 AS view_us, c1_us1 AS click_us,
          us AS purchase_us, cb - c1_cb AS n_blockers,
          event_id AS purchase_event_id
        FROM c1
        WHERE event_type = 'purchase' AND c1_us0 IS NOT NULL
          AND us - c1_us0 <= 86400000000
        ORDER BY user_id, purchase_us, purchase_event_id""")
    }),

    // HAMPEL FILTER (rolling robust despiking): per user, the value series
    // in integer micros, outliers = rows whose doubled deviation from the
    // centered-11-row doubled median exceeds 3× the doubled MAD — the
    // q162 exact-integer discipline made WINDOWED (one keyed shuffle, the
    // per-row order statistics from one bounded collected array).
    "q227_hampel_filter" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
        .select(col("user_id"), col("ts"), col("event_id"), col("vm"))
      graft.operators.Robust.hampelFilter(ev, "user_id", "ts", "event_id",
          "vm", half = 5, k = 3)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("vm"), col("med2"), col("mad2"),
          col("is_outlier"))
        .orderBy("user_id", "us", "event_id")
    }),

    // Exact SPEARMAN trend test per event type: rank correlation of value
    // (micros) against event time — the robust monotone-trend detector,
    // tie-doubled ranks, DECIMAL(38,0) rank products internally; emitted
    // statistics snapped to BIGINT with a loud range guard (VERDICT r11
    // #1 — den ≤ ~5.4e12 at sf0.01, ~1.6e17 projected at sf0.1).
    "q231_spearman_trend" -> ((s, d) => {
      import graft.functions.StatsFunctions.snapLong
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
        .withColumn("us", unix_micros(col("ts")))
      graft.operators.Correlate.spearman(ev, Seq("event_type"), "us", "vm")
        .select(col("event_type"), col("n"),
          snapLong(col("num")).as("num"),
          snapLong(col("den_x")).as("den_x"),
          snapLong(col("den_y")).as("den_y"))
        .orderBy("event_type")
    }),

    // INTER-EVENT-INTERVAL histogram per event type (the ISI/correlogram
    // cousin of q215's ACF — the reference's spike-train statistic over
    // the behavior stream): per-type consecutive gaps bucketed to
    // 10-minute bins, pure integer lag + floor-div, one keyed sort.
    "q245_interval_histogram" -> ((s, d) => {
      val w = Window.partitionBy("event_type")
        .orderBy(unix_micros(col("ts")), col("event_id"))
      Tables.events(s, d)
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("event_type"),
          expr("gap_us div 600000000").as("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("gap_us")).as("min_gap_us"),
          max(col("gap_us")).as("max_gap_us"))
        .orderBy("event_type", "bin")
    }),

    // EXACT GINI of per-user event counts per type (the inequality-of-
    // usage screen — the same statistic curation runs on tokens-per-
    // source): G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over ranked counts,
    // reported as the exact integer pair (gini_num, gini_den) with the
    // rank-weighted sum in DECIMAL(38,0) (Σ i·x is O(n²·x̄) — the q230
    // discipline), snapped to BIGINT at the emit edge with a loud range
    // guard (VERDICT r11 #1). Ties ranked deterministically by
    // (count, user_id): any total order over equal counts yields the
    // same Σ i·x sum.
    "q246_gini" -> ((s, d) => {
      import graft.functions.StatsFunctions.snapLong
      val counts = Tables.events(s, d)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("x"), col("user_id"))
      counts
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_x"),
          sum((col("i").cast("decimal(38,0)") * col("x"))
            .cast("decimal(38,0)")).cast("decimal(38,0)").as("__ix"))
        .select(col("event_type"), col("n"), col("sum_x"),
          snapLong((lit(2L).cast("decimal(38,0)") * col("__ix") -
            (col("n") + 1L).cast("decimal(38,0)") * col("sum_x"))
            .cast("decimal(38,0)")).as("gini_num"),
          snapLong((col("n").cast("decimal(38,0)") * col("sum_x"))
            .cast("decimal(38,0)")).as("gini_den"))
        .orderBy("event_type")
    }),

    // WALD–WOLFOWITZ runs test inputs per event type (randomness QC for
    // a sensor series): each value classed against the type's doubled
    // median (above / below, exact-median rows excluded as the classic
    // test prescribes), runs counted as sign changes + 1 per type — all
    // exact integers, one median pass + one keyed window.
    "q243_runs_test" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
      val med = graft.operators.Robust.madSummary(ev, Seq("event_type"),
          "vm").select(col("event_type"), col("med2"))
      val w = Window.partitionBy("event_type")
        .orderBy(unix_micros(col("ts")), col("event_id"))
      val classed = ev.join(med, Seq("event_type"))
        .filter(lit(2L) * col("vm") =!= col("med2"))
        .withColumn("above", lit(2L) * col("vm") > col("med2"))
      classed
        .withColumn("__prev", lag(col("above"), 1).over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("above"), 1L).otherwise(0L)).as("n_above"),
          sum(when(!col("above"), 1L).otherwise(0L)).as("n_below"),
          (sum(when(col("__prev").isNotNull &&
            col("__prev") =!= col("above"), 1L).otherwise(0L)) + 1L)
            .as("n_runs"))
        .orderBy("event_type")
    }),

    // TRAILING (causal) Hampel — the live-QC form of q227: the window is
    // the current row plus the 10 before it, so the statistic is final
    // the moment a sample arrives (what the q239 drain exploits).
    "q238_hampel_trailing" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
        .select(col("user_id"), col("ts"), col("event_id"), col("vm"))
      graft.operators.Robust.hampelFilterTrailing(ev, "user_id", "ts",
          "event_id", "vm", window = 11, k = 3)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("vm"), col("med2"), col("mad2"),
          col("is_outlier"))
        .orderBy("user_id", "us", "event_id")
    }),

    // Streaming/incremental twin of q238 (the drain discipline): waves
    // despike their NEW rows against a persisted per-key tail buffer of
    // the last 10 samples — the trailing window is causal, so the buffer
    // IS the operator's whole memory and nothing revises. Oracle = q238's
    // verbatim; the wave-boundary rows (windows straddling the pivot) are
    // the ones that break if the buffer plumbing is wrong.
    "q239_hampel_from_drain" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
        .select("user_id", "ts", "event_id", "vm")
      val root = java.nio.file.Files
        .createTempDirectory("graft-hampel-q239").toString
      val (src, out, buf, ckpt) =
        (root + "/src", root + "/scored", root + "/buffer", root + "/ckpt")
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("event_id", LongType), StructField("vm", LongType)))
      val pivot = lit("2024-01-15 00:00:00").cast("timestamp")
      def wave(): Unit =
        graft.streaming.StreamingHampel.drain(s, src, out, buf, ckpt,
          "user_id", "ts", "event_id", "vm", schema, window = 11, k = 3)
      ev.filter(col("ts") < pivot).write.mode("append").parquet(src)
      wave()
      ev.filter(col("ts") >= pivot).write.mode("append").parquet(src)
      wave()
      graft.streaming.StreamingHampel.loadScored(s, out)
        .withColumnRenamed("key", "user_id")
        .withColumnRenamed("tie", "event_id")
        .orderBy("user_id", "us", "event_id")
    }),

    // SEASONAL-BASELINE anomaly summary: the robust (median/MAD) profile
    // of `value` per (event_type, hour-of-day) — the despiking baseline a
    // QC pass compares live hours against; exact doubled-integer order
    // statistics (q162's discipline on a seasonal key).
    "q229_seasonal_baseline" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
        .withColumn("hod", hour(col("ts")).cast("long"))
      graft.operators.Robust.madSummary(ev, Seq("event_type", "hod"), "vm",
          k = 3)
        .orderBy("event_type", "hod")
    }),

    // The q206 attribution operator through the SQL FRONTEND: the same
    // three window expressions on one RANGE frame, as spark.sql() text;
    // oracle = q206's verbatim.
    "q226_sql_attribution" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("graft_sql_events")
      s.sql("""WITH b AS (
          SELECT user_id, event_id, event_type, unix_micros(ts) AS us,
            event_type IN ('view', 'click', 'signup') AS is_touch
          FROM graft_sql_events),
        w AS (SELECT *,
            max(CASE WHEN is_touch
                THEN struct(us, event_id, event_type) END)
              OVER (PARTITION BY user_id ORDER BY us
                RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW) AS lt,
            min(CASE WHEN is_touch
                THEN struct(us, event_id, event_type) END)
              OVER (PARTITION BY user_id ORDER BY us
                RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW) AS ft,
            sum(CASE WHEN is_touch THEN 1L ELSE 0L END)
              OVER (PARTITION BY user_id ORDER BY us
                RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW) AS nt
          FROM b)
        SELECT user_id, event_id, us AS conv_us, nt AS n_touches,
          ft.event_type AS first_touch_type, ft.us AS first_touch_us,
          lt.event_type AS last_touch_type, lt.us AS last_touch_us
        FROM w WHERE event_type = 'purchase' AND nt > 0
        ORDER BY user_id, conv_us, event_id""")
    }),

    "q183_resample_from_drain" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val ev = Tables.events(s, d).select("event_type", "ts", "value")
      val root = java.nio.file.Files
        .createTempDirectory("graft-resample-q183").toString
      val (src, grid, state, ckpt) =
        (root + "/src", root + "/grid", root + "/state", root + "/ckpt")
      val schema = StructType(Seq(
        StructField("event_type", StringType),
        StructField("ts", TimestampType), StructField("value", DoubleType)))
      val pivot = lit("2024-01-15 00:00:00").cast("timestamp")
      val step = 3600L * 1000000L
      ev.filter(col("ts") < pivot).write.mode("append").parquet(src)
      graft.streaming.StreamingResample.drain(s, src, grid, state, ckpt,
        "event_type", "ts", "value", schema, step)
      ev.filter(col("ts") >= pivot).write.mode("append").parquet(src)
      graft.streaming.StreamingResample.drain(s, src, grid, state, ckpt,
        "event_type", "ts", "value", schema, step)
      graft.streaming.StreamingResample.loadGrid(s, grid)
        .withColumnRenamed("key", "event_type")
        .orderBy("event_type", "grid_ts")
    }),

    // KAPLAN–MEIER life table over session durations (time-to-quiet, the
    // reference's time-in-patch shape): q25's gap-sessions become subjects
    // with integer-second durations, RIGHT-CENSORED when the session's
    // last activity sits within the 1800 s gap of the observation edge
    // (the sessionizer cannot have proven such a session closed).
    // Stratified by whether the session converted (contains a purchase) —
    // the classic two-arm survival comparison. Exact integer sufficient
    // statistics only (n_risk / n_event / n_censored per distinct
    // duration); S(t) and Greenwood variance are presentation-edge floats
    // derived from these (the q246 num/den discipline).
    "q256_km_lifetable" -> ((s, d) => {
      graft.operators.Survival.kmLifeTable(kmSubjects(s, d),
          Seq("purchased"), "duration_s", "ended")
        .orderBy("purchased", "duration")
    }),

    // LOG-RANK test between q256's two arms (converted vs not): O1 /
    // E1·10⁶ / V·10⁶ as exact integers, each rational term floored on the
    // micro grid independently (the BM25 idf_micro discipline), products
    // in DECIMAL(38,0) snapped per term (the q221 chi-square pattern).
    // One row out; χ² = (O1 − E1)²/V is the caller's one float.
    "q259_logrank" -> ((s, d) => {
      graft.operators.Survival.logRank(kmSubjects(s, d), "purchased",
        "duration_s", "ended")
    }),

    // TWO-SAMPLE KS distribution drift per event type: did the value
    // distribution move between the first and second half of the
    // recording? Exact rational sup-gap |c1·n2 − c2·n1| evaluated at
    // distinct micro-grid values (ECDF steps), DECIMAL(38,0) products
    // snapped at the edge; ks_permille is the always-in-Long consumer
    // form. The distribution companion of q168's row-level drift report.
    "q260_ks_drift" -> ((s, d) => {
      val pivot = lit("2024-01-15 00:00:00").cast("timestamp")
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
        .withColumn("baseline", col("ts") < pivot)
      graft.operators.Checks.ksDrift(ev, Seq("event_type"), "vm",
          "baseline")
        .orderBy("event_type")
    }),

    // Streaming/incremental twin of q260 (the drain discipline): waves of
    // sample files reduce to per-(file, key, value) side-count cells,
    // appended idempotently; the drained report is the one-shot statistic
    // over the merged cells. Oracle = q260's SQL verbatim.
    "q261_ks_from_drain" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val pivot = lit("2024-01-15 00:00:00").cast("timestamp")
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
        .withColumn("baseline", col("ts") < pivot)
        .select("event_type", "vm", "baseline")
      val root = java.nio.file.Files
        .createTempDirectory("graft-ks-q261").toString
      val (src, cells, ckpt) = (root + "/src", root + "/cells",
        root + "/ckpt")
      val schema = StructType(Seq(
        StructField("event_type", StringType),
        StructField("vm", LongType),
        StructField("baseline", BooleanType)))
      def wave(): Unit = graft.streaming.StreamingKsDrift.drain(s, src,
        cells, ckpt, Seq("event_type"), "vm", "baseline", schema)
      ev.filter(col("baseline")).write.mode("append").parquet(src)
      wave()
      ev.filter(!col("baseline")).write.mode("append").parquet(src)
      wave()
      graft.streaming.StreamingKsDrift.report(s, cells, Seq("event_type"))
        .get.orderBy("event_type")
    }),

    // Streaming/incremental twin of q256 (the drain discipline): event
    // waves extend/close per-user gap-sessions against a one-row-per-key
    // open-session state; closed subjects append idempotently, the
    // report censors the open tail against the drained edge with the
    // one-shot rule. Oracle = q256's SQL verbatim — the wave-boundary
    // sessions (straddling the pivot) are the rows that break if the
    // carry plumbing is wrong.
    "q264_km_from_drain" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val pivot = lit("2024-01-15 00:00:00").cast("timestamp")
      val gapUs = 1800L * 1000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("is_purchase"))
      val root = java.nio.file.Files
        .createTempDirectory("graft-km-q264").toString
      val (src, subjects, state, ckpt) = (root + "/src",
        root + "/subjects", root + "/state", root + "/ckpt")
      val schema = StructType(Seq(
        StructField("user_id", LongType),
        StructField("ts", TimestampType),
        StructField("is_purchase", LongType)))
      def wave(): Unit = graft.streaming.StreamingSurvival.drain(s, src,
        subjects, state, ckpt, "user_id", "ts", "is_purchase", schema,
        gapUs)
      ev.filter(col("ts") < pivot).write.mode("append").parquet(src)
      wave()
      ev.filter(col("ts") >= pivot).write.mode("append").parquet(src)
      wave()
      graft.streaming.StreamingSurvival.report(s, subjects, state, gapUs)
        .get.orderBy("purchased", "duration")
    }),

    // CONVERSION-PATH report (the Sankey input): per 30-min session, the
    // ordered event-type prefix up to the first purchase, capped at 8
    // steps; top paths with session/conversion counts. The discovery
    // complement of q32's declared funnel and q33's pairwise transitions.
    "q265_conversion_paths" -> ((s, d) => {
      val sess = Sessionize.byGap(Tables.events(s, d), "ts",
        Seq("user_id"), gapSeconds = 1800)
      graft.operators.Behavior.conversionPaths(sess,
          Seq("user_id", "session_id"), "ts", "event_id", "event_type",
          targetType = "purchase", maxSteps = 8)
        .orderBy("path")
    }),

    // PSI-STYLE binned drift table (q260's interpretable companion): the
    // first half's per-type value deciles define the cut values, both
    // halves re-bin by the same `#cuts < v` rule, exact counts +
    // floor-div per-mille shares per bin; PSI itself is the presentation
    // edge's float.
    "q266_binned_drift" -> ((s, d) => {
      val pivot = lit("2024-01-15 00:00:00").cast("timestamp")
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
        .withColumn("baseline", col("ts") < pivot)
      graft.operators.Checks.binnedDrift(ev, Seq("event_type"), "vm",
          "baseline", nBins = 10)
        .orderBy("event_type", "bin")
    }),

    // The PSI report from the SAME drained cell store as q261 — one
    // persisted drift state, two derived reports (KS sup + binned
    // shares). Oracle = q266's SQL verbatim (events carry no null
    // values, so the store's no-null contract is invisible here).
    "q268_binned_from_drain" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val pivot = lit("2024-01-15 00:00:00").cast("timestamp")
      val ev = Tables.events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
        .withColumn("baseline", col("ts") < pivot)
        .select("event_type", "vm", "baseline")
      val root = java.nio.file.Files
        .createTempDirectory("graft-ks-q268").toString
      val (src, cells, ckpt) = (root + "/src", root + "/cells",
        root + "/ckpt")
      val schema = StructType(Seq(
        StructField("event_type", StringType),
        StructField("vm", LongType),
        StructField("baseline", BooleanType)))
      def wave(): Unit = graft.streaming.StreamingKsDrift.drain(s, src,
        cells, ckpt, Seq("event_type"), "vm", "baseline", schema)
      ev.filter(col("baseline")).write.mode("append").parquet(src)
      wave()
      ev.filter(!col("baseline")).write.mode("append").parquet(src)
      wave()
      graft.streaming.StreamingKsDrift.reportBinned(s, cells,
          Seq("event_type"), nBins = 10)
        .get.orderBy("event_type", "bin")
    })
  )

  /** SHARED subject construction for the survival pair q256/q259 (the
    * log-rank statistic is DEFINED over the life table's arms — one
    * builder makes that contract structural instead of two copies that
    * could drift): q25's 30-min gap-sessions as subjects with
    * integer-second durations, conversion arm (contains-purchase), and
    * the gap-rule censor flag against the global observation edge.
    */
  private def kmSubjects(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Survival
    val gapUs = 1800L * 1000000L
    val ev = Tables.events(s, d)
    val sess = Sessionize.byGap(ev, "ts", Seq("user_id"),
        gapSeconds = 1800)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("dur_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchased"))
    val edge = ev.agg(max(unix_micros(col("ts"))).as("edge_us"))
    sess.crossJoin(broadcast(edge))
      .withColumn("duration_s", expr("dur_us div 1000000"))
      .withColumn("ended",
        Survival.observedEnd(col("end_us"), col("edge_us"), gapUs))
  }

  /** Events arrive with ns-precision timestamps; the engine reads them at the
    * µs fetch-edge contract, so every oracle goes through this µs-cast CTE.
    */
  private val EV =
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
       event_type, value, props FROM events)"""

  val oracles: Map[String, String] = Map(
    // INDEPENDENT exists-any-ordered-chain formulation — the engine's
    // first-next pointer walk must land the identical completion set.
    "q32_funnel" -> s"""$EV,
       us AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM ev),
       anchors AS (SELECT user_id, us FROM us WHERE event_type = 'view'),
       done AS (
         SELECT a.user_id, a.us,
           EXISTS (SELECT 1 FROM us c, us p
             WHERE c.user_id = a.user_id AND c.event_type = 'click'
               AND c.us > a.us
               AND p.user_id = a.user_id AND p.event_type = 'purchase'
               AND p.us > c.us AND p.us - a.us <= 86400000000) AS ok
         FROM anchors a)
       SELECT user_id, CAST(count(*) AS BIGINT) AS n_anchors,
         CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_completed,
         CAST(100 * sum(CASE WHEN ok THEN 1 ELSE 0 END) // count(*)
           AS BIGINT) AS conversion_pct
       FROM done GROUP BY user_id ORDER BY user_id""",
    // Mirror of the engine's gated backward-carry formulation: the same
    // running blocker count and per-stage last_value carries (each gated
    // on prefix completeness so all columns land from ONE row), so any
    // divergence in tie-handling or gating shows as a hash mismatch.
    "q196_match_episodes" -> s"""$EV,
       base AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
                FROM ev),
       cb AS (SELECT *, sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
         FROM base),
       c0 AS (SELECT *,
           last_value(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
             OVER wp AS c0_us0,
           last_value(CASE WHEN event_type = 'view' THEN cb END IGNORE NULLS)
             OVER wp AS c0_cb
         FROM cb WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       c1 AS (SELECT *,
           last_value(CASE WHEN event_type = 'click' AND c0_us0 IS NOT NULL
             THEN c0_us0 END IGNORE NULLS) OVER wp AS c1_us0,
           last_value(CASE WHEN event_type = 'click' AND c0_us0 IS NOT NULL
             THEN us END IGNORE NULLS) OVER wp AS c1_us1,
           last_value(CASE WHEN event_type = 'click' AND c0_us0 IS NOT NULL
             THEN c0_cb END IGNORE NULLS) OVER wp AS c1_cb
         FROM c0 WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       SELECT user_id, c1_us0 AS view_us, c1_us1 AS click_us,
         us AS purchase_us, CAST(cb - c1_cb AS BIGINT) AS n_blockers,
         event_id AS purchase_event_id
       FROM c1
       WHERE event_type = 'purchase' AND c1_us0 IS NOT NULL
         AND us - c1_us0 <= 86400000000
       ORDER BY user_id, purchase_us, purchase_event_id""",
    "q197_threshold_bursts" -> s"""$EV,
       base AS (SELECT user_id, ts, event_id, value, epoch_us(ts) AS us
                FROM ev),
       cr AS (SELECT user_id, ts, us, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY us, event_id)
             AS prev
         FROM base),
       x AS (SELECT user_id, ts, us, value FROM cr
             WHERE prev IS NOT NULL AND prev < 15.0 AND value >= 15.0),
       flagged AS (SELECT *,
           CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w > 21600000000
                THEN 1 ELSE 0 END AS ns
         FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       sess AS (SELECT *,
           CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
             AS BIGINT) AS burst_id
         FROM flagged)
       SELECT user_id, burst_id, CAST(count(*) AS BIGINT) AS n_crossings,
         min(ts) AS burst_start, max(ts) AS burst_end,
         round(max(value), 4) AS peak_value
       FROM sess GROUP BY user_id, burst_id
       ORDER BY user_id, burst_id""",
    // Same gaps-and-islands formulation (running max(end) over preceding
    // rows); half-open semantics live in the strict `s > pmax` comparison.
    "q200_interval_union" -> s"""$EV,
       iv AS (SELECT user_id, epoch_us(ts) AS s,
           epoch_us(ts) + CAST(floor(value*3600) AS BIGINT)*1000000 AS e
         FROM ev WHERE event_type = 'view' AND value > 0),
       m AS (SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM iv),
       f AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END
           AS nw FROM m),
       g AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS gid
         FROM f)
       SELECT user_id, CAST(gid AS BIGINT) AS interval_id, min(s) AS start_us,
         max(e) AS end_us, CAST(count(*) AS BIGINT) AS n_merged
       FROM g GROUP BY user_id, gid ORDER BY user_id, interval_id""",
    // The identical delta sweep: per-(user, t) aggregated ±1 deltas, two
    // running sums, live slices [t, next_t) where both sides are active,
    // then the union-merge pass to coalesce adjacent slices.
    "q201_interval_intersect" -> s"""$EV,
       a AS (SELECT user_id, epoch_us(ts) AS s,
           epoch_us(ts) + CAST(floor(value*3600) AS BIGINT)*1000000 AS e
         FROM ev WHERE event_type = 'view' AND value > 0),
       b AS (SELECT user_id, epoch_us(ts) AS s,
           epoch_us(ts) + CAST(floor(value*3600) AS BIGINT)*1000000 AS e
         FROM ev WHERE event_type = 'click' AND value > 0),
       d AS (
         SELECT user_id, s AS t, 1 AS da, 0 AS db FROM a
         UNION ALL SELECT user_id, e, -1, 0 FROM a
         UNION ALL SELECT user_id, s, 0, 1 FROM b
         UNION ALL SELECT user_id, e, 0, -1 FROM b),
       g AS (SELECT user_id, t, sum(da) AS da, sum(db) AS db
             FROM d GROUP BY 1, 2),
       sw AS (SELECT *,
           sum(da) OVER (PARTITION BY user_id ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS aa,
           sum(db) OVER (PARTITION BY user_id ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ab,
           lead(t) OVER (PARTITION BY user_id ORDER BY t) AS nt
         FROM g),
       seg AS (SELECT user_id, t AS s, nt AS e FROM sw
               WHERE nt IS NOT NULL AND aa > 0 AND ab > 0),
       m AS (SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         FROM seg),
       f AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END
           AS nw FROM m),
       gg AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS gid
         FROM f)
       SELECT user_id, CAST(gid AS BIGINT) AS interval_id,
         min(s) AS start_us, max(e) AS end_us
       FROM gg GROUP BY user_id, gid ORDER BY user_id, interval_id""",
    // Same closed form (S = P - min(0, running_min(P))) replayed window
    // for window, all integer micros.
    "q202_cusum_alarms" -> s"""$EV,
       b AS (SELECT user_id, ts, event_id, epoch_us(ts) AS us,
           CAST(floor(value*1000000) AS BIGINT) - 55000000 AS d
         FROM ev),
       p AS (SELECT *, sum(d) OVER (PARTITION BY user_id
           ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pf
         FROM b),
       m AS (SELECT *, min(pf) OVER (PARTITION BY user_id
           ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
         FROM p)
       SELECT user_id, ts, event_id,
         CAST(pf - least(0, mn) AS BIGINT) AS s_micro
       FROM m WHERE pf - least(0, mn) >= 200000000
       ORDER BY user_id, ts, event_id""",
    // Open/close via first/last row_number flags inside each bucket — an
    // independent mechanic from the engine's struct-ordering argmin/argmax.
    "q203_ohlc_bars" -> s"""$EV,
       b AS (SELECT user_id, epoch_us(ts) AS us, event_id,
           CAST(floor(value*1000000) AS BIGINT) AS vm,
           epoch_us(ts) - epoch_us(ts) % 86400000000 AS bkt
         FROM ev),
       r AS (SELECT *,
           row_number() OVER (PARTITION BY user_id, bkt
             ORDER BY us, event_id) AS ra,
           row_number() OVER (PARTITION BY user_id, bkt
             ORDER BY us DESC, event_id DESC) AS rd
         FROM b)
       SELECT user_id, bkt AS bucket_start_us,
         max(CASE WHEN ra = 1 THEN vm END) AS open_micro,
         max(vm) AS high_micro, min(vm) AS low_micro,
         max(CASE WHEN rd = 1 THEN vm END) AS close_micro,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(vm) AS BIGINT) AS sum_micro
       FROM r GROUP BY user_id, bkt
       ORDER BY user_id, bucket_start_us""",
    // Identical five-sum formulation over the same trailing frame.
    "q204_rolling_slope" -> s"""$EV,
       b AS (SELECT user_id, ts, event_id, epoch_us(ts) AS us,
           CAST(floor(value*1000000) AS BIGINT) AS vm
         FROM ev),
       x AS (SELECT *, CAST(row_number() OVER
           (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS x
         FROM b),
       s AS (SELECT user_id, ts, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n,
           CAST(sum(x) OVER w AS BIGINT) AS sx,
           CAST(sum(vm) OVER w AS BIGINT) AS sy,
           CAST(sum(x*vm) OVER w AS BIGINT) AS sxy,
           CAST(sum(x*x) OVER w AS BIGINT) AS sxx
         FROM x WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
       SELECT user_id, ts, event_id, n*sxy - sx*sy AS slope_num,
         n*sxx - sx*sx AS slope_den, n AS n_window
       FROM s WHERE n >= 2 ORDER BY user_id, ts, event_id""",
    // Same cohort rule and cumulative replay.
    "q222_cohort_ltv" -> s"""$EV,
       cohort AS (SELECT user_id,
           min(epoch_us(ts)) // 86400000000 AS cohort_day
         FROM ev GROUP BY user_id),
       rev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
           CAST(floor(value*1000000) AS BIGINT) AS vm
         FROM ev WHERE event_type = 'purchase'),
       byage AS (
         SELECT c.cohort_day, r.d - c.cohort_day AS age_days,
           CAST(sum(r.vm) AS BIGINT) AS revenue_micro
         FROM rev r JOIN cohort c ON c.user_id = r.user_id
         GROUP BY 1, 2)
       SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
         CAST(age_days AS BIGINT) AS age_days, revenue_micro,
         CAST(sum(revenue_micro) OVER (PARTITION BY cohort_day
           ORDER BY age_days
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_revenue_micro
       FROM byage ORDER BY cohort_day, age_days""",
    // q32's EXISTS ordered-chain formulation per prefix.
    "q220_funnel_steps" -> s"""$EV,
       us AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM ev),
       s1 AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n
              FROM us WHERE event_type = 'view'),
       r2 AS (SELECT CAST(count(DISTINCT a.user_id) AS BIGINT) AS n
         FROM us a WHERE a.event_type = 'view' AND EXISTS (
           SELECT 1 FROM us c WHERE c.user_id = a.user_id
             AND c.event_type = 'click' AND c.us > a.us
             AND c.us - a.us <= 86400000000)),
       r3 AS (SELECT CAST(count(DISTINCT a.user_id) AS BIGINT) AS n
         FROM us a WHERE a.event_type = 'view' AND EXISTS (
           SELECT 1 FROM us c, us p WHERE c.user_id = a.user_id
             AND c.event_type = 'click' AND c.us > a.us
             AND p.user_id = a.user_id AND p.event_type = 'purchase'
             AND p.us > c.us AND p.us - a.us <= 86400000000)),
       steps AS (
         SELECT 1 AS step, 'view' AS step_type, (SELECT n FROM s1) AS n_users
         UNION ALL
         SELECT 2, 'click', (SELECT n FROM r2)
         UNION ALL
         SELECT 3, 'purchase', (SELECT n FROM r3))
       SELECT CAST(step AS BIGINT) AS step, step_type, n_users,
         CAST((100 * n_users) // (SELECT n FROM s1) AS BIGINT)
           AS pct_of_first
       FROM steps ORDER BY step""",
    // Same session contingency counts; HUGEINT carries the squared term.
    "q221_chi_square" -> s"""$EV,
       st AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM ev),
       fl AS (SELECT *,
           CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w
                  > 1800000000 THEN 1 ELSE 0 END AS ns
         FROM st WINDOW w AS (PARTITION BY user_id ORDER BY us)),
       sess AS (SELECT user_id, event_type,
           sum(ns) OVER (PARTITION BY user_id ORDER BY us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS sid
         FROM fl),
       f AS (SELECT user_id, sid,
           max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS e,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
         FROM sess GROUP BY user_id, sid),
       t AS (SELECT
           CAST(sum(CASE WHEN e = 1 AND c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
           CAST(sum(CASE WHEN e = 1 AND c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
           CAST(sum(CASE WHEN e = 0 AND c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(sum(CASE WHEN e = 0 AND c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
         FROM f)
       SELECT a, b, c, d, a+b+c+d AS n_users,
         CAST((CAST(1000000 AS HUGEINT) * (a+b+c+d)
             * CAST(a*d - b*c AS HUGEINT) * CAST(a*d - b*c AS HUGEINT))
           // (CAST(a+b AS HUGEINT) * (c+d) * (a+c) * (b+d)) AS BIGINT)
           AS chi2_micro
       FROM t""",
    // q25's gaps-and-islands replay, then distinct type sets per session
    // and the same lift arithmetic.
    "q219_market_basket" -> s"""$EV,
       st AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM ev),
       fl AS (SELECT *,
           CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w
                  > 1800000000 THEN 1 ELSE 0 END AS ns
         FROM st WINDOW w AS (PARTITION BY user_id ORDER BY us)),
       sess AS (SELECT user_id, event_type,
           sum(ns) OVER (PARTITION BY user_id ORDER BY us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS sid
         FROM fl),
       m AS (SELECT DISTINCT user_id, sid, event_type FROM sess),
       nsx AS (SELECT CAST(count(*) AS BIGINT) AS n FROM
               (SELECT DISTINCT user_id, sid FROM m)),
       si AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
              FROM m GROUP BY 1),
       pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_ab
         FROM m a JOIN m b ON a.user_id = b.user_id AND a.sid = b.sid
           AND a.event_type < b.event_type
         GROUP BY 1, 2)
       SELECT pr.type_a, pr.type_b, pr.n_ab, sa.n_t AS n_a, sb.n_t AS n_b,
         (SELECT n FROM nsx) AS n_sessions,
         CAST((1000000 * pr.n_ab * (SELECT n FROM nsx))
           // (sa.n_t * sb.n_t) AS BIGINT) AS lift_micro
       FROM pr JOIN si sa ON sa.event_type = pr.type_a
         JOIN si sb ON sb.event_type = pr.type_b
       ORDER BY type_a, type_b""",
    // Plain same-user pair join replay (the bucket decomposition is the
    // engine's scale device, not a semantic); same shifted bin rule.
    "q217_peth" -> s"""$EV,
       tr AS (SELECT event_id AS trig_id, user_id, epoch_us(ts) AS t
              FROM ev WHERE event_type = 'purchase'),
       ob AS (SELECT event_id AS obs_id, user_id, epoch_us(ts) AS e
              FROM ev WHERE event_type = 'error'),
       nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tr),
       pairs AS (
         SELECT t, e FROM tr JOIN ob USING (user_id)
         WHERE e - t >= -21600000000 AND e - t < 21600000000),
       b AS (SELECT ((e - t + 21600000000) // 3600000000) - 6 AS bin
             FROM pairs)
       SELECT CAST(bin AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n_events,
         (SELECT n FROM nt) AS n_triggers,
         CAST((1000 * count(*)) // (SELECT n FROM nt) AS BIGINT)
           AS events_per_ktrigger
       FROM b GROUP BY bin ORDER BY bin""",
    // Same overlap-pair sums; // floors match because nothing divides.
    "q215_acf_hourly" -> s"""$EV,
       series AS (SELECT event_type, epoch_us(ts) // 3600000000 AS idx,
           CAST(count(*) AS BIGINT) AS v
         FROM ev GROUP BY 1, 2),
       pairs AS (
         SELECT a.event_type, l.lag, a.v AS x, b.v AS y
         FROM series a
           JOIN (SELECT unnest([1, 2, 3]) AS lag) l ON true
           JOIN series b ON b.event_type = a.event_type
             AND b.idx = a.idx + l.lag)
       SELECT event_type, CAST(lag AS BIGINT) AS lag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS BIGINT) AS num,
         CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS BIGINT) AS den_x,
         CAST(count(*) * sum(y*y) - sum(y) * sum(y) AS BIGINT) AS den_y
       FROM pairs GROUP BY event_type, lag HAVING count(*) >= 2
       ORDER BY event_type, lag""",
    "q216_crosscorr_hourly" -> s"""$EV,
       sa AS (SELECT epoch_us(ts) // 3600000000 AS idx,
           CAST(count(*) AS BIGINT) AS v
         FROM ev WHERE event_type = 'view' GROUP BY 1),
       sb AS (SELECT epoch_us(ts) // 3600000000 AS idx,
           CAST(count(*) AS BIGINT) AS v
         FROM ev WHERE event_type = 'click' GROUP BY 1),
       pairs AS (
         SELECT l.lag, a.v AS x, b.v AS y
         FROM sa a
           JOIN (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag) l ON true
           JOIN sb b ON b.idx = a.idx + l.lag)
       SELECT 'view~click' AS pair, CAST(lag AS BIGINT) AS lag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS BIGINT) AS num,
         CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS BIGINT) AS den_x,
         CAST(count(*) * sum(y*y) - sum(y) * sum(y) AS BIGINT) AS den_y
       FROM pairs GROUP BY lag HAVING count(*) >= 2
       ORDER BY lag""",
    // Same contribute-to-7-window-ends formulation.
    "q213_sliding_active_users" -> s"""$EV,
       ud AS (SELECT DISTINCT user_id,
           epoch_us(ts) - epoch_us(ts) % 86400000000 AS d
         FROM ev),
       days AS (SELECT DISTINCT d FROM ud),
       x AS (SELECT DISTINCT user_id, d + 86400000000 * i AS b
             FROM ud, unnest(generate_series(0, 6)) t(i))
       SELECT b AS window_end_day_us,
         CAST(count(*) AS BIGINT) AS active_users_7d
       FROM x JOIN days ON days.d = x.b
       GROUP BY b ORDER BY window_end_day_us""",
    // Two lags over the same keyed order; ties resolved by name.
    "q214_event_trigrams" -> s"""$EV,
       b AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
         FROM ev),
       l AS (SELECT user_id, event_type AS t2,
           lag(event_type, 2) OVER w AS t0, lag(event_type, 1) OVER w AS t1
         FROM b WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
       SELECT t0, t1, t2, CAST(count(*) AS BIGINT) AS n
       FROM l WHERE t0 IS NOT NULL
       GROUP BY t0, t1, t2
       ORDER BY n DESC, t0, t1, t2 LIMIT 20""",
    // The q200 merge replay, then the same grid split via
    // generate_series and per-bucket overlap sums.
    "q209_daily_coverage" -> s"""$EV,
       iv AS (SELECT user_id, epoch_us(ts) AS s,
           epoch_us(ts) + CAST(floor(value*3600) AS BIGINT)*1000000 AS e
         FROM ev WHERE event_type = 'view' AND value > 0),
       m AS (SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM iv),
       f AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END
           AS nw FROM m),
       g AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS gid
         FROM f),
       mg AS (SELECT user_id, min(s) AS s, max(e) AS e
              FROM g GROUP BY user_id, gid),
       split AS (
         SELECT user_id,
           unnest(generate_series(s - s % 86400000000,
             (e - 1) - (e - 1) % 86400000000, 86400000000)) AS b,
           s, e
         FROM mg)
       SELECT user_id, b AS bucket_start_us,
         CAST(sum(least(e, b + 86400000000) - greatest(s, b)) AS BIGINT)
           AS covered_us
       FROM split GROUP BY user_id, b
       ORDER BY user_id, bucket_start_us""",
    // Same range-frame formulation; struct min/max pick the touches.
    "q206_attribution" -> s"""$EV,
       b AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
           event_type IN ('view','click','signup') AS is_touch
         FROM ev),
       w AS (SELECT *,
           max(CASE WHEN is_touch
               THEN {'u': us, 'i': event_id, 't': event_type} END)
             OVER win AS lt,
           min(CASE WHEN is_touch
               THEN {'u': us, 'i': event_id, 't': event_type} END)
             OVER win AS ft,
           sum(CASE WHEN is_touch THEN 1 ELSE 0 END) OVER win AS nt
         FROM b WINDOW win AS (PARTITION BY user_id ORDER BY us
           RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW))
       SELECT user_id, event_id, us AS conv_us,
         CAST(nt AS BIGINT) AS n_touches,
         ft.t AS first_touch_type, ft.u AS first_touch_us,
         lt.t AS last_touch_type, lt.u AS last_touch_us
       FROM w WHERE event_type = 'purchase' AND nt > 0
       ORDER BY user_id, conv_us, event_id""",
    // drained ≡ one-shot is the contract: q196's oracle verbatim.
    "q223_episodes_from_drain" -> s"""$EV,
       base AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
                FROM ev),
       cb AS (SELECT *, sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
         FROM base),
       c0 AS (SELECT *,
           last_value(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
             OVER wp AS c0_us0,
           last_value(CASE WHEN event_type = 'view' THEN cb END IGNORE NULLS)
             OVER wp AS c0_cb
         FROM cb WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       c1 AS (SELECT *,
           last_value(CASE WHEN event_type = 'click' AND c0_us0 IS NOT NULL
             THEN c0_us0 END IGNORE NULLS) OVER wp AS c1_us0,
           last_value(CASE WHEN event_type = 'click' AND c0_us0 IS NOT NULL
             THEN us END IGNORE NULLS) OVER wp AS c1_us1,
           last_value(CASE WHEN event_type = 'click' AND c0_us0 IS NOT NULL
             THEN c0_cb END IGNORE NULLS) OVER wp AS c1_cb
         FROM c0 WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       SELECT user_id, c1_us0 AS view_us, c1_us1 AS click_us,
         us AS purchase_us, CAST(cb - c1_cb AS BIGINT) AS n_blockers,
         event_id AS purchase_event_id
       FROM c1
       WHERE event_type = 'purchase' AND c1_us0 IS NOT NULL
         AND us - c1_us0 <= 86400000000
       ORDER BY user_id, purchase_us, purchase_event_id""",
    // drained ≡ one-shot is the contract: q206's oracle verbatim.
    "q224_attribution_from_drain" -> s"""$EV,
       b AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
           event_type IN ('view','click','signup') AS is_touch
         FROM ev),
       w AS (SELECT *,
           max(CASE WHEN is_touch
               THEN {'u': us, 'i': event_id, 't': event_type} END)
             OVER win AS lt,
           min(CASE WHEN is_touch
               THEN {'u': us, 'i': event_id, 't': event_type} END)
             OVER win AS ft,
           sum(CASE WHEN is_touch THEN 1 ELSE 0 END) OVER win AS nt
         FROM b WINDOW win AS (PARTITION BY user_id ORDER BY us
           RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW))
       SELECT user_id, event_id, us AS conv_us,
         CAST(nt AS BIGINT) AS n_touches,
         ft.t AS first_touch_type, ft.u AS first_touch_us,
         lt.t AS last_touch_type, lt.u AS last_touch_us
       FROM w WHERE event_type = 'purchase' AND nt > 0
       ORDER BY user_id, conv_us, event_id""",
    // Tie-doubled ranks on both axes, HUGEINT products snapped to the
    // same BIGINT triple the engine emits.
    "q231_spearman_trend" -> s"""$EV,
       b AS (SELECT event_type, epoch_us(ts) AS us,
           CAST(floor(value * 1000000) AS BIGINT) AS vm
         FROM ev),
       r AS (SELECT event_type,
           CAST(2 * rank() OVER (PARTITION BY event_type ORDER BY us)
             + count(*) OVER (PARTITION BY event_type, us) - 1
             AS HUGEINT) AS rx,
           CAST(2 * rank() OVER (PARTITION BY event_type ORDER BY vm)
             + count(*) OVER (PARTITION BY event_type, vm) - 1
             AS HUGEINT) AS ry
         FROM b),
       g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           sum(rx) AS sx, sum(ry) AS sy, sum(rx * ry) AS sxy,
           sum(rx * rx) AS sxx, sum(ry * ry) AS syy
         FROM r GROUP BY event_type HAVING count(*) >= 2)
       SELECT event_type, n,
         CAST(n * sxy - sx * sy AS BIGINT) AS num,
         CAST(n * sxx - sx * sx AS BIGINT) AS den_x,
         CAST(n * syy - sy * sy AS BIGINT) AS den_y
       FROM g ORDER BY event_type""",
    // Same lag + floor-div binning.
    "q245_interval_histogram" -> s"""$EV,
       g AS (SELECT event_type,
           epoch_us(ts) - lag(epoch_us(ts))
             OVER (PARTITION BY event_type ORDER BY epoch_us(ts), event_id)
             AS gap_us
         FROM ev)
       SELECT event_type, CAST(gap_us // 600000000 AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(min(gap_us) AS BIGINT) AS min_gap_us,
         CAST(max(gap_us) AS BIGINT) AS max_gap_us
       FROM g WHERE gap_us IS NOT NULL
       GROUP BY event_type, gap_us // 600000000
       ORDER BY event_type, bin""",
    // Same ranked-sum formula in HUGEINT, snapped to the BIGINT pair.
    "q246_gini" -> s"""$EV,
       c AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
             FROM ev GROUP BY 1, 2),
       r AS (SELECT *,
           CAST(row_number() OVER (PARTITION BY event_type
             ORDER BY x, user_id) AS HUGEINT) AS i
         FROM c)
       SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sum_x,
         CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS BIGINT)
           AS gini_num,
         CAST(count(*) * sum(x) AS BIGINT) AS gini_den
       FROM r GROUP BY event_type ORDER BY event_type""",
    // Doubled-median classing + lag-based run counting, q162's median.
    "q243_runs_test" -> s"""$EV,
       vals AS (SELECT event_type, epoch_us(ts) AS us, event_id,
           CAST(floor(value * 1000000) AS BIGINT) AS vm
         FROM ev),
       r1 AS (SELECT event_type, vm,
           row_number() OVER (PARTITION BY event_type ORDER BY vm) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
         FROM vals),
       med AS (SELECT event_type,
           CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN vm ELSE 0 END) +
             sum(CASE WHEN rn = n // 2 + 1 THEN vm ELSE 0 END) AS BIGINT)
             AS med2
         FROM r1 GROUP BY event_type),
       classed AS (
         SELECT v.event_type, v.us, v.event_id, 2 * v.vm > m.med2 AS above
         FROM vals v JOIN med m USING (event_type)
         WHERE 2 * v.vm <> m.med2),
       lagged AS (
         SELECT *, lag(above)
             OVER (PARTITION BY event_type ORDER BY us, event_id) AS prev
         FROM classed)
       SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
         CAST(sum(CASE WHEN NOT above THEN 1 ELSE 0 END) AS BIGINT)
           AS n_below,
         CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> above
           THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs
       FROM lagged GROUP BY event_type ORDER BY event_type""",
    // q227's replay on the trailing frame (10 preceding .. current).
    "q238_hampel_trailing" -> s"""$EV,
       b AS (SELECT user_id, epoch_us(ts) AS us, event_id,
           CAST(floor(value * 1000000) AS BIGINT) AS vm
         FROM ev),
       lw AS (SELECT *, list_sort(list(vm)
           OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)) AS ls
         FROM b),
       m AS (SELECT *, len(ls) AS n,
           CAST(ls[(len(ls) + 1) // 2] + ls[len(ls) // 2 + 1] AS BIGINT)
             AS med2
         FROM lw),
       dv AS (SELECT *, list_sort(list_transform(ls,
           x -> abs(2 * x - med2))) AS ds FROM m)
       SELECT user_id, us, event_id, vm, med2,
         CAST(ds[(n + 1) // 2] + ds[n // 2 + 1] AS BIGINT) AS mad2,
         abs(2 * vm - med2) > 3 * (ds[(n + 1) // 2] + ds[n // 2 + 1])
           AS is_outlier
       FROM dv ORDER BY user_id, us, event_id""",
    // drained ≡ one-shot is the contract: q238's oracle verbatim.
    "q239_hampel_from_drain" -> s"""$EV,
       b AS (SELECT user_id, epoch_us(ts) AS us, event_id,
           CAST(floor(value * 1000000) AS BIGINT) AS vm
         FROM ev),
       lw AS (SELECT *, list_sort(list(vm)
           OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)) AS ls
         FROM b),
       m AS (SELECT *, len(ls) AS n,
           CAST(ls[(len(ls) + 1) // 2] + ls[len(ls) // 2 + 1] AS BIGINT)
             AS med2
         FROM lw),
       dv AS (SELECT *, list_sort(list_transform(ls,
           x -> abs(2 * x - med2))) AS ds FROM m)
       SELECT user_id, us, event_id, vm, med2,
         CAST(ds[(n + 1) // 2] + ds[n // 2 + 1] AS BIGINT) AS mad2,
         abs(2 * vm - med2) > 3 * (ds[(n + 1) // 2] + ds[n // 2 + 1])
           AS is_outlier
       FROM dv ORDER BY user_id, us, event_id""",
    // Windowed doubled-median/MAD replay: list() over the same centered
    // row frame, sorted, then the q162 order-statistic arithmetic.
    "q227_hampel_filter" -> s"""$EV,
       b AS (SELECT user_id, epoch_us(ts) AS us, event_id,
           CAST(floor(value * 1000000) AS BIGINT) AS vm
         FROM ev),
       lw AS (SELECT *, list_sort(list(vm)
           OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)) AS ls
         FROM b),
       m AS (SELECT *, len(ls) AS n,
           CAST(ls[(len(ls) + 1) // 2] + ls[len(ls) // 2 + 1] AS BIGINT)
             AS med2
         FROM lw),
       dv AS (SELECT *, list_sort(list_transform(ls,
           x -> abs(2 * x - med2))) AS ds FROM m)
       SELECT user_id, us, event_id, vm, med2,
         CAST(ds[(n + 1) // 2] + ds[n // 2 + 1] AS BIGINT) AS mad2,
         abs(2 * vm - med2) > 3 * (ds[(n + 1) // 2] + ds[n // 2 + 1])
           AS is_outlier
       FROM dv ORDER BY user_id, us, event_id""",
    // q162's two-pass doubled-median arithmetic on the seasonal key.
    "q229_seasonal_baseline" -> s"""$EV,
       vals AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
           CAST(floor(value * 1000000) AS BIGINT) AS v
         FROM ev),
       r1 AS (SELECT event_type, hod, v,
           row_number() OVER (PARTITION BY event_type, hod ORDER BY v) AS rn,
           count(*) OVER (PARTITION BY event_type, hod) AS n
         FROM vals),
       med AS (SELECT event_type, hod,
           CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN v ELSE 0 END) +
             sum(CASE WHEN rn = n // 2 + 1 THEN v ELSE 0 END) AS BIGINT)
             AS med2
         FROM r1 GROUP BY event_type, hod),
       dev AS (SELECT v.event_type, v.hod, v.v,
           abs(2 * v.v - m.med2) AS d2, m.med2
         FROM vals v JOIN med m USING (event_type, hod)),
       r2 AS (SELECT event_type, hod, d2,
           row_number() OVER (PARTITION BY event_type, hod ORDER BY d2) AS rn,
           count(*) OVER (PARTITION BY event_type, hod) AS n
         FROM dev),
       mad AS (SELECT event_type, hod,
           CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN d2 ELSE 0 END) +
             sum(CASE WHEN rn = n // 2 + 1 THEN d2 ELSE 0 END) AS BIGINT)
             AS mad2
         FROM r2 GROUP BY event_type, hod)
       SELECT d.event_type, d.hod, CAST(count(*) AS BIGINT) AS n,
         max(d.med2) AS med2, max(m.mad2) AS mad2,
         CAST(sum(CASE WHEN d.d2 > 3 * m.mad2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
       FROM dev d JOIN mad m USING (event_type, hod)
       GROUP BY d.event_type, d.hod ORDER BY d.event_type, d.hod""",
    // SQL-frontend twins: the oracle text is the q196/q206 SQL verbatim.
    "q225_sql_episodes" -> s"""$EV,
       base AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
                FROM ev),
       cb AS (SELECT *, sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
         FROM base),
       c0 AS (SELECT *,
           last_value(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
             OVER wp AS c0_us0,
           last_value(CASE WHEN event_type = 'view' THEN cb END IGNORE NULLS)
             OVER wp AS c0_cb
         FROM cb WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       c1 AS (SELECT *,
           last_value(CASE WHEN event_type = 'click' AND c0_us0 IS NOT NULL
             THEN c0_us0 END IGNORE NULLS) OVER wp AS c1_us0,
           last_value(CASE WHEN event_type = 'click' AND c0_us0 IS NOT NULL
             THEN us END IGNORE NULLS) OVER wp AS c1_us1,
           last_value(CASE WHEN event_type = 'click' AND c0_us0 IS NOT NULL
             THEN c0_cb END IGNORE NULLS) OVER wp AS c1_cb
         FROM c0 WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       SELECT user_id, c1_us0 AS view_us, c1_us1 AS click_us,
         us AS purchase_us, CAST(cb - c1_cb AS BIGINT) AS n_blockers,
         event_id AS purchase_event_id
       FROM c1
       WHERE event_type = 'purchase' AND c1_us0 IS NOT NULL
         AND us - c1_us0 <= 86400000000
       ORDER BY user_id, purchase_us, purchase_event_id""",
    "q226_sql_attribution" -> s"""$EV,
       b AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
           event_type IN ('view','click','signup') AS is_touch
         FROM ev),
       w AS (SELECT *,
           max(CASE WHEN is_touch
               THEN {'u': us, 'i': event_id, 't': event_type} END)
             OVER win AS lt,
           min(CASE WHEN is_touch
               THEN {'u': us, 'i': event_id, 't': event_type} END)
             OVER win AS ft,
           sum(CASE WHEN is_touch THEN 1 ELSE 0 END) OVER win AS nt
         FROM b WINDOW win AS (PARTITION BY user_id ORDER BY us
           RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW))
       SELECT user_id, event_id, us AS conv_us,
         CAST(nt AS BIGINT) AS n_touches,
         ft.t AS first_touch_type, ft.u AS first_touch_us,
         lt.t AS last_touch_type, lt.u AS last_touch_us
       FROM w WHERE event_type = 'purchase' AND nt > 0
       ORDER BY user_id, conv_us, event_id""",
    // q202's closed-form replay, emitting epoch-micros — the drain's
    // carried (pf, mn) state must land identical alarms.
    "q212_cusum_from_drain" -> s"""$EV,
       b AS (SELECT user_id, event_id, epoch_us(ts) AS us,
           CAST(floor(value*1000000) AS BIGINT) - 55000000 AS d
         FROM ev),
       p AS (SELECT *, sum(d) OVER (PARTITION BY user_id
           ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pf
         FROM b),
       m AS (SELECT *, min(pf) OVER (PARTITION BY user_id
           ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
         FROM p)
       SELECT user_id, us, event_id,
         CAST(pf - least(0, mn) AS BIGINT) AS s_micro
       FROM m WHERE pf - least(0, mn) >= 200000000
       ORDER BY user_id, us, event_id""",
    // Oracle = the one-shot gaps-and-islands replay in micros (q197's
    // discipline); the drain's wave split and carried state must land the
    // identical burst table.
    "q205_bursts_from_drain" -> s"""$EV,
       b AS (SELECT user_id, epoch_us(ts) AS us, event_id,
           CAST(floor(value*1000000) AS BIGINT) AS vm
         FROM ev),
       cr AS (SELECT *, lag(vm) OVER (PARTITION BY user_id
           ORDER BY us, event_id) AS prev
         FROM b),
       x AS (SELECT user_id, us, event_id, vm FROM cr
             WHERE prev IS NOT NULL AND prev < 15000000
               AND vm >= 15000000),
       flagged AS (SELECT *,
           CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w > 21600000000
                THEN 1 ELSE 0 END AS ns
         FROM x WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       sess AS (SELECT *,
           CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
             AS BIGINT) AS burst_id
         FROM flagged)
       SELECT user_id, burst_id, CAST(count(*) AS BIGINT) AS n_crossings,
         min(us) AS burst_start_us, max(us) AS burst_end_us,
         max(vm) AS peak_micro
       FROM sess GROUP BY user_id, burst_id
       ORDER BY user_id, burst_id""",
    "q36_user_entropy" -> s"""$EV,
       c AS (
         SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
         FROM ev GROUP BY 1, 2),
       t AS (
         SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(CAST(1000000.0 AS DOUBLE) *
             CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS BIGINT))
             AS BIGINT) AS s
         FROM c GROUP BY 1)
       SELECT user_id, n_events,
         CAST(floor(CAST(1000000.0 AS DOUBLE) *
           ln(CAST(n_events AS DOUBLE))) AS BIGINT) - s // n_events
           AS entropy_micro
       FROM t ORDER BY user_id""",
    "q35_cumulative_distinct" -> s"""$EV,
       fd AS (SELECT user_id, min(date_trunc('hour', ts)) AS hour
              FROM ev GROUP BY user_id),
       pd AS (SELECT hour, CAST(count(*) AS BIGINT) AS n_new
              FROM fd GROUP BY hour)
       SELECT hour, n_new,
         CAST(sum(n_new) OVER (ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_users
       FROM pd ORDER BY hour""",
    "q34_transitions" -> s"""$EV,
       seq AS (
         SELECT user_id, event_type,
           lead(event_type) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_type) AS nxt
         FROM ev),
       cnt AS (
         SELECT event_type AS from_type, nxt AS to_type,
           CAST(count(*) AS BIGINT) AS n
         FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2)
       SELECT from_type, to_type, n,
         CAST(1000000 * n // sum(n) OVER (PARTITION BY from_type)
           AS BIGINT) AS prob_micro
       FROM cnt ORDER BY from_type, to_type""",
    // Independent bracketing: DuckDB's native ASOF joins (backward for t0,
    // forward for t1) against the engine's single union-timeline window —
    // different mechanics, identical pinned arithmetic. At an exact grid
    // hit the two sides pick DIFFERENT t1 (engine: next later sample;
    // oracle: the tied sample) yet both degenerate to v0.
    "q174_resample_interp" -> s"""$EV,
       samp AS (
         SELECT event_type AS key, epoch_us(ts) AS t,
           CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) // count(*)
             AS BIGINT) AS v
         FROM ev GROUP BY 1, 2),
       rng AS (SELECT key, min(t) AS tmin, max(t) AS tmax
               FROM samp GROUP BY key),
       grid AS (
         SELECT key, unnest(generate_series(
           ((tmin + 3599999999) // 3600000000) * 3600000000,
           (tmax // 3600000000) * 3600000000,
           3600000000)) AS t
         FROM rng
         WHERE ((tmin + 3599999999) // 3600000000) * 3600000000
             <= (tmax // 3600000000) * 3600000000),
       prev AS (
         SELECT g.key, g.t, s.t AS t0, s.v AS v0
         FROM grid g ASOF JOIN samp s
           ON g.key = s.key AND g.t >= s.t),
       nxt AS (
         SELECT g.key, g.t, s.t AS t1, s.v AS v1
         FROM grid g ASOF LEFT JOIN samp s
           ON g.key = s.key AND g.t <= s.t)
       SELECT p.key AS event_type, make_timestamp(p.t) AS grid_ts,
         CASE WHEN coalesce(n.t1, p.t0) = p.t0 THEN p.v0
           ELSE CAST((CAST(p.v0 AS HUGEINT) * (n.t1 - p.t)
             + CAST(n.v1 AS HUGEINT) * (p.t - p.t0))
             // (n.t1 - p.t0) AS BIGINT)
         END AS value_micro
       FROM prev p JOIN nxt n ON n.key = p.key AND n.t = p.t
       ORDER BY event_type, grid_ts""",
    // drained ≡ one-shot: the oracle is q174's replay verbatim
    "q183_resample_from_drain" -> s"""$EV,
       samp AS (
         SELECT event_type AS key, epoch_us(ts) AS t,
           CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) // count(*)
             AS BIGINT) AS v
         FROM ev GROUP BY 1, 2),
       rng AS (SELECT key, min(t) AS tmin, max(t) AS tmax
               FROM samp GROUP BY key),
       grid AS (
         SELECT key, unnest(generate_series(
           ((tmin + 3599999999) // 3600000000) * 3600000000,
           (tmax // 3600000000) * 3600000000,
           3600000000)) AS t
         FROM rng
         WHERE ((tmin + 3599999999) // 3600000000) * 3600000000
             <= (tmax // 3600000000) * 3600000000),
       prev AS (
         SELECT g.key, g.t, s.t AS t0, s.v AS v0
         FROM grid g ASOF JOIN samp s
           ON g.key = s.key AND g.t >= s.t),
       nxt AS (
         SELECT g.key, g.t, s.t AS t1, s.v AS v1
         FROM grid g ASOF LEFT JOIN samp s
           ON g.key = s.key AND g.t <= s.t)
       SELECT p.key AS event_type, make_timestamp(p.t) AS grid_ts,
         CASE WHEN coalesce(n.t1, p.t0) = p.t0 THEN p.v0
           ELSE CAST((CAST(p.v0 AS HUGEINT) * (n.t1 - p.t)
             + CAST(n.v1 AS HUGEINT) * (p.t - p.t0))
             // (n.t1 - p.t0) AS BIGINT)
         END AS value_micro
       FROM prev p JOIN nxt n ON n.key = p.key AND n.t = p.t
       ORDER BY event_type, grid_ts""",
    "q33_cohort_retention" -> s"""$EV,
       fd AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
              FROM ev GROUP BY user_id),
       act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM ev),
       grid AS (
         SELECT f.cohort_date,
           CAST(date_diff('day', f.cohort_date, a.day) AS BIGINT)
             AS day_offset,
           CAST(count(*) AS BIGINT) AS active_users
         FROM act a JOIN fd f USING (user_id) GROUP BY 1, 2),
       sz AS (SELECT cohort_date, CAST(count(*) AS BIGINT) AS cohort_size
              FROM fd GROUP BY 1)
       SELECT g.cohort_date, g.day_offset, g.active_users, s.cohort_size
       FROM grid g JOIN sz s USING (cohort_date)
       ORDER BY cohort_date, day_offset""",
    "q20_lag_delta" -> s"""$EV
       SELECT event_id, user_id, ts, value,
         epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS dt_micros,
         round(value - lag(value, 1) OVER w, 6) AS dvalue
       FROM ev
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ORDER BY user_id, ts, event_id""",
    "q21_running_sum" -> s"""$EV
       SELECT event_id, user_id, ts,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
       FROM ev
       ORDER BY user_id, ts, event_id""",
    "q22_range_rolling" -> s"""$EV
       SELECT event_id, user_id, ts,
         round(sum(value) OVER w, 4) AS trailing_1h_value,
         count(*) OVER w AS trailing_1h_events
       FROM ev
       WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
       ORDER BY user_id, ts, event_id""",
    "q23_latest_per_user" -> s"""$EV
       SELECT user_id, event_id, ts, event_type, value FROM (
         SELECT *, row_number() OVER (PARTITION BY user_id
           ORDER BY ts DESC, event_id DESC) AS rn
         FROM ev) WHERE rn = 1
       ORDER BY user_id""",
    "q24_epoch_closure" -> s"""$EV
       SELECT user_id, ts AS epoch_start,
         least(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts),
               ts + INTERVAL 7 DAY) AS epoch_end
       FROM ev WHERE event_type = 'signup'
       ORDER BY user_id, epoch_start""",
    "q25_sessionize" -> s"""$EV,
       flagged AS (
         SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS new_session
         FROM ev
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       ), sessions AS (
         SELECT user_id, ts, value,
           CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT)
             AS session_id
         FROM flagged)
       SELECT user_id, session_id, count(*) AS n_events,
         min(ts) AS session_start, max(ts) AS session_end,
         round(sum(value), 4) AS session_value
       FROM sessions GROUP BY user_id, session_id
       ORDER BY user_id, session_id""",
    "q26_asof_join" ->
      """SELECT p.event_id, p.user_id, p.ts, p.value, s.signup_ts
       FROM (SELECT event_id, user_id, ts, value FROM events
             WHERE event_type = 'purchase') p
       ASOF LEFT JOIN
            (SELECT user_id, ts AS signup_ts FROM events
             WHERE event_type = 'signup') s
         ON p.user_id = s.user_id AND s.signup_ts <= p.ts
       ORDER BY p.user_id, p.ts, p.event_id""",
    "q27_interval_overlap" ->
      """SELECT e.event_id AS error_id, p.event_id AS purchase_id, e.user_id
       FROM events e JOIN events p
         ON e.user_id = p.user_id
        AND e.event_type = 'error' AND p.event_type = 'purchase'
        AND p.ts BETWEEN e.ts - INTERVAL 5 MINUTE AND e.ts + INTERVAL 5 MINUTE
       ORDER BY error_id, purchase_id""",
    "q28_regression" ->
      """SELECT user_id,
         round(regr_slope(value, epoch_us(ts) / 1000000.0) * 1e6, 6) AS slope_per_mega_s,
         round(regr_r2(value, epoch_us(ts) / 1000000.0), 6) AS r2,
         regr_count(value, epoch_us(ts) / 1000000.0) AS n
       FROM events GROUP BY user_id ORDER BY user_id""",
    "q29_stream_stats" ->
      """WITH diffs AS (
         SELECT event_type, value,
           CAST(epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
             PARTITION BY event_type ORDER BY ts, event_id) AS DOUBLE) AS diff
         FROM events)
       SELECT event_type,
         count(value) AS count,
         round(min(value), 4) AS min,
         round(max(value), 4) AS max,
         round(avg(value), 4) AS mean,
         round(1e6 / quantile_cont(diff, 0.5), 10) AS rate_hz
       FROM diffs GROUP BY event_type ORDER BY event_type""",
    "q30_config_hash" ->
      """WITH counts AS (
         SELECT user_id, event_type, count(*) AS n
         FROM events GROUP BY user_id, event_type)
       SELECT user_id,
         md5(string_agg(event_type || '=' || n, '|' ORDER BY event_type || '=' || n))
           AS config_hash
       FROM counts GROUP BY user_id ORDER BY user_id""",
    "q31_frontier" ->
      """WITH frontier AS (
         SELECT user_id, min(ts) AS lo, max(ts) AS hi
         FROM events WHERE event_type = 'purchase' GROUP BY user_id)
       SELECT e.user_id,
         CAST(sum(CASE WHEN e.ts < f.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_before,
         CAST(sum(CASE WHEN e.ts > f.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_after
       FROM events e JOIN frontier f ON e.user_id = f.user_id
       GROUP BY e.user_id ORDER BY e.user_id""",
    "q256_km_lifetable" -> KmLifeTableSql,
    // drained ≡ one-shot is the contract: q256's oracle verbatim.
    "q264_km_from_drain" -> KmLifeTableSql,
    "q265_conversion_paths" -> s"""$EV,
       flagged AS (
         SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS new_session
         FROM ev
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       ), sessions AS (
         SELECT user_id, ts, event_id, event_type,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM flagged
       ), ranked AS (
         SELECT user_id, session_id, event_type,
           row_number() OVER (PARTITION BY user_id, session_id
             ORDER BY ts, event_id) AS rk
         FROM sessions
       ), tgt AS (
         SELECT user_id, session_id,
           min(CASE WHEN event_type = 'purchase' THEN rk END) AS t
         FROM ranked GROUP BY user_id, session_id
       ), kept AS (
         SELECT r.user_id, r.session_id, r.event_type, r.rk
         FROM ranked r JOIN tgt USING (user_id, session_id)
         WHERE r.rk <= least(coalesce(t, 9223372036854775807), 8)
       ), per AS (
         SELECT user_id, session_id,
           string_agg(event_type, '>' ORDER BY rk) AS path,
           CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS conv
         FROM kept GROUP BY user_id, session_id)
       SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(sum(conv) AS BIGINT) AS n_converted
       FROM per GROUP BY path ORDER BY path""",
    "q259_logrank" -> s"""$EV,
       flagged AS (
         SELECT user_id, ts, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS new_session
         FROM ev
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       ), sessions AS (
         SELECT user_id, ts, event_type,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM flagged
       ), subj AS (
         SELECT user_id, session_id,
           (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS duration_s,
           max(epoch_us(ts)) AS end_us,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS purchased
         FROM sessions GROUP BY user_id, session_id
       ), marked AS (
         SELECT CAST(purchased AS BIGINT) AS purchased, duration_s,
           end_us + 1800000000 <= (SELECT max(epoch_us(ts)) FROM ev)
             AS ended
         FROM subj
       ), pert AS (
         SELECT duration_s AS duration,
           CAST(count(*) AS BIGINT) AS c_all,
           CAST(sum(CASE WHEN ended THEN 1 ELSE 0 END) AS BIGINT) AS d_all,
           CAST(sum(purchased) AS BIGINT) AS c_1,
           CAST(sum(CASE WHEN ended THEN purchased ELSE 0 END) AS BIGINT)
             AS d_1
         FROM marked GROUP BY duration_s
       ), risk AS (
         SELECT duration, d_all, d_1,
           CAST(sum(c_all) OVER dw AS BIGINT) AS n_all,
           CAST(sum(c_1) OVER dw AS BIGINT) AS n_1
         FROM pert
         WINDOW dw AS (ORDER BY duration DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       SELECT CAST(sum(d_1) AS BIGINT) AS o1,
         CAST(sum(CAST((CAST(1000000 AS HUGEINT) * d_all * n_1) // n_all
           AS BIGINT)) AS BIGINT) AS e1_micro,
         CAST(sum(CASE WHEN n_all > 1 THEN
           CAST((CAST(1000000 AS HUGEINT) * d_all * n_1
               * (n_all - n_1) * (n_all - d_all))
             // (CAST(n_all AS HUGEINT) * n_all * (n_all - 1)) AS BIGINT)
           ELSE 0 END) AS BIGINT) AS v_micro
       FROM risk WHERE d_all >= 1""",
    "q260_ks_drift" -> KsDriftSql,
    // drained ≡ one-shot is the contract: q260's oracle verbatim.
    "q261_ks_from_drain" -> KsDriftSql,
    "q266_binned_drift" -> BinnedDriftSql,
    // drained ≡ one-shot is the contract: q266's oracle verbatim.
    "q268_binned_from_drain" -> BinnedDriftSql
  )

  /** q256's oracle, shared verbatim by the q264 drain twin. */
  private lazy val KmLifeTableSql = s"""$EV,
       flagged AS (
         SELECT user_id, ts, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS new_session
         FROM ev
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       ), sessions AS (
         SELECT user_id, ts, event_type,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM flagged
       ), subj AS (
         SELECT user_id, session_id,
           (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS duration_s,
           max(epoch_us(ts)) AS end_us,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS purchased
         FROM sessions GROUP BY user_id, session_id
       ), marked AS (
         SELECT CAST(purchased AS BIGINT) AS purchased, duration_s,
           end_us + 1800000000 <= (SELECT max(epoch_us(ts)) FROM ev)
             AS ended
         FROM subj
       ), km AS (
         SELECT purchased, duration_s,
           CAST(sum(CASE WHEN ended THEN 1 ELSE 0 END) AS BIGINT)
             AS n_event,
           CAST(sum(CASE WHEN ended THEN 0 ELSE 1 END) AS BIGINT)
             AS n_censored
         FROM marked GROUP BY purchased, duration_s)
       SELECT purchased, duration_s AS duration,
         CAST(sum(n_event + n_censored) OVER (PARTITION BY purchased
           ORDER BY duration_s DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_risk,
         n_event, n_censored
       FROM km ORDER BY purchased, duration"""

  /** q260's oracle, shared verbatim by the q261 drain twin. */
  private lazy val KsDriftSql = s"""$EV,
       s AS (SELECT event_type,
           CAST(floor(value * 1000000) AS BIGINT) AS vm,
           ts < TIMESTAMP '2024-01-15 00:00:00' AS baseline
         FROM ev),
       cells AS (SELECT event_type, vm,
           CAST(sum(CASE WHEN baseline THEN 1 ELSE 0 END) AS BIGINT) AS k1,
           CAST(sum(CASE WHEN baseline THEN 0 ELSE 1 END) AS BIGINT) AS k2
         FROM s WHERE vm IS NOT NULL GROUP BY event_type, vm),
       stepped AS (SELECT event_type,
           CAST(sum(k1) OVER cw AS BIGINT) AS c1,
           CAST(sum(k2) OVER cw AS BIGINT) AS c2,
           CAST(sum(k1) OVER kw AS BIGINT) AS n1,
           CAST(sum(k2) OVER kw AS BIGINT) AS n2
         FROM cells
         WINDOW cw AS (PARTITION BY event_type ORDER BY vm
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         kw AS (PARTITION BY event_type)),
       agg AS (SELECT event_type, max(n1) AS n1, max(n2) AS n2,
           max(abs(CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1))
             AS ksnum
         FROM stepped GROUP BY event_type)
       SELECT event_type, n1, n2,
         n1 > 0 AND n2 > 0 AS comparable,
         CAST(CASE WHEN n1 > 0 AND n2 > 0 THEN ksnum ELSE 0 END
           AS BIGINT) AS ks_num,
         CAST(CASE WHEN n1 > 0 AND n2 > 0
           THEN CAST(n1 AS HUGEINT) * n2 ELSE 0 END AS BIGINT) AS ks_den,
         CAST(CASE WHEN n1 > 0 AND n2 > 0
           THEN (CAST(1000 AS HUGEINT) * ksnum)
             // (CAST(n1 AS HUGEINT) * n2)
           ELSE 0 END AS BIGINT) AS ks_permille
       FROM agg ORDER BY event_type"""

  /** q266: baseline decile cuts via the quantileBin rank rule, both sides
    * re-binned by `#cuts < v`, counted per (type, bin).
    */
  private lazy val BinnedDriftSql = s"""$EV,
       s AS (SELECT event_type,
           CAST(floor(value * 1000000) AS BIGINT) AS vm,
           ts < TIMESTAMP '2024-01-15 00:00:00' AS base
         FROM ev),
       b AS (SELECT event_type, vm,
           rank() OVER (PARTITION BY event_type ORDER BY vm) AS r,
           count(*) OVER (PARTITION BY event_type) AS n
         FROM s WHERE base AND vm IS NOT NULL),
       qb AS (SELECT event_type, vm, ((r - 1) * 10) // n AS qb FROM b),
       cuts AS (SELECT event_type, qb, max(vm) AS cut
         FROM qb WHERE qb < 9 GROUP BY event_type, qb),
       cells AS (SELECT event_type, vm, base, CAST(count(*) AS BIGINT) AS m
         FROM s GROUP BY event_type, vm, base),
       abin AS (SELECT cl.event_type, cl.vm, cl.base, cl.m,
           CASE WHEN cl.vm IS NULL THEN CAST(-1 AS BIGINT)
                ELSE CAST(count(c.cut) AS BIGINT) END AS bin
         FROM cells cl LEFT JOIN cuts c
           ON c.event_type = cl.event_type AND c.cut < cl.vm
         GROUP BY cl.event_type, cl.vm, cl.base, cl.m),
       per AS (SELECT event_type, bin,
           CAST(sum(CASE WHEN base THEN m ELSE 0 END) AS BIGINT) AS n_base,
           CAST(sum(CASE WHEN base THEN 0 ELSE m END) AS BIGINT) AS n_comp
         FROM abin GROUP BY event_type, bin)
       SELECT event_type, bin, n_base, n_comp,
         CAST((1000 * n_base) // greatest(CAST(sum(n_base)
           OVER (PARTITION BY event_type) AS BIGINT), 1) AS BIGINT)
           AS base_permille,
         CAST((1000 * n_comp) // greatest(CAST(sum(n_comp)
           OVER (PARTITION BY event_type) AS BIGINT), 1) AS BIGINT)
           AS comp_permille
       FROM per ORDER BY event_type, bin"""
}
