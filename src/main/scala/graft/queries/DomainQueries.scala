package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.functions.{GeometryFunctions, TimeFunctions}
import graft.operators.IntervalJoin
import graft.pipelines.Ephys
import graft.sources.Tables

/** Domain pack — the reference's aeon-specific semantics re-expressed over
  * the `events` stream table: HARP clock arithmetic, 1-hour chunking, the
  * fetch_stream read path, temporal-validity joins, ONIX→HARP sync-model
  * prediction, and point-in-polygon membership (SURVEY.md §1.1, §2.8, §3.2).
  */
object DomainQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // HARP clock: seconds-since-1904 roundtrip (ephys_utils.py:637-643
    // harp_to_naive; swc.aeon harp readers). The HARP value is emitted as
    // exact integer microseconds — a rounded double at ~3.8e9 s flips its
    // last decimal between engines (16 significant digits ≈ double's edge).
    "q40_harp_clock" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          (unix_micros(col("ts")) -
            lit(TimeFunctions.HarpEpochOffsetSeconds * 1000000L)).as("harp_us"),
          TimeFunctions.harpToTimestamp(TimeFunctions.timestampToHarp(col("ts")))
            .as("roundtrip_ts"))
        .orderBy("event_id")
    }),

    // 1-hour tumbling chunks (acquisition.py:500-511): chunk_start floored,
    // chunk_end = next hour; per (user, chunk) sample counts — the Chunk
    // catalog discovery job. At 100 TB this is the partition layout itself.
    "q41_chunk_catalog" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"),
          TimeFunctions.chunkStart(col("ts")).as("chunk_start"))
        .agg(count(lit(1)).as("sample_count"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .withColumn("chunk_end", col("chunk_start") + expr("INTERVAL 1 HOUR"))
        .select("user_id", "chunk_start", "chunk_end", "sample_count",
          "first_ts", "last_ts")
        .orderBy("user_id", "chunk_start")
    }),

    // fetch_stream read path (__init__.py:71-106): time-range slice,
    // time-sorted, µs-rounded — partition pruning does the file selection.
    "q42_fetch_stream" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
        .select(col("ts"), col("user_id"), col("event_type"), col("value"))
        .orderBy("ts", "user_id")
    }),

    // J3 temporal-validity join (streams_maker.py:202-216): per-user validity
    // intervals from signup events (install=signup, removal=next signup);
    // every event matched to its covering interval. Dimension side broadcast.
    "q43_temporal_validity" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val installs = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("i_user"), col("ts").as("install_time"),
          lead(col("ts"), 1).over(w).as("removal_time"))
      IntervalJoin.pointInInterval(
        ev, installs,
        point = col("ts"), start = col("install_time"), end = col("removal_time"),
        extraCond = col("user_id") === col("i_user"))
        .select(col("event_id"), col("user_id"), col("ts"), col("install_time"))
        .orderBy("event_id")
    }),

    // J9 cross-clock join: ONIX→HARP via per-window sync model. Windows =
    // per-user daily regressions of harp-seconds ~ value-ticks... here the
    // sync dimension is synthesized from events: one model per user over the
    // month; prediction = slope * onix + intercept as a pure expression
    // (spike_sorting.py:1124-1166; ephys_utils.py:682-683).
    "q44_sync_predict" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val x = col("event_id").cast("double")
      // Rebase to seconds since 2024-01-01 so predictions stay ~1e6, keeping
      // round(·, 4) far from double's precision edge (raw epoch seconds
      // ~1.7e9 flip the 4th decimal between engines' regr_* accumulations).
      val y = (unix_micros(col("ts")) - lit(1704067200000000L)).cast("double") / 1e6
      val models = ev.groupBy(col("user_id").as("m_user"))
        .agg(regr_slope(y, x).as("slope"), regr_intercept(y, x).as("intercept"))
      ev.join(broadcast(models), col("user_id") === col("m_user"))
        .select(col("event_id"), col("user_id"),
          round(col("slope") * col("event_id") + col("intercept"), 4)
            .as("predicted_s"))
        .orderBy("event_id")
    }),

    // Point-in-polygon (tracking.py:326-340): diamond "nest" in
    // (value, user_id) space, even-odd ray cast as pure expressions.
    "q45_point_in_polygon" -> ((s, d) => {
      val verts = array(
        struct(lit(100.0).as("x"), lit(2.0).as("y")),
        struct(lit(150.0).as("x"), lit(7.0).as("y")),
        struct(lit(100.0).as("x"), lit(12.0).as("y")),
        struct(lit(50.0).as("x"), lit(7.0).as("y")))
      // sort below the projection (q48 rationale: sampling re-executes the
      // subtree below Sort, and the exchange fans a one-row-group file out)
      Tables.events(s, d)
        .orderBy("event_id")
        .select(col("event_id"),
          GeometryFunctions.pointInPolygon(
            col("value"), col("user_id").cast("double"), verts).as("in_nest"))
    }),

    // Distance-to-target (tracking.py:290-302) + threshold flag.
    "q46_distance" -> ((s, d) => {
      Tables.events(s, d)
        .orderBy("event_id")
        .select(col("event_id"),
          round(GeometryFunctions.euclidean(
            col("value"), col("user_id").cast("double"),
            lit(100.0), lit(7.0)), 6).as("dist"),
          (GeometryFunctions.euclidean(
            col("value"), col("user_id").cast("double"),
            lit(100.0), lit(7.0)) < 25.0).as("in_patch"))
    }),

    // The FULL is_position_in_patch chain (tracking.py:305-324) as one
    // composite (round 11): view events are the position stream (centi
    // grid), click events build a per-user wheel odometer (running centi
    // sum); a position is ACTIVE iff inside the patch AND the wheel
    // moved > 1 unit in the trailing 1 s as of that moment, with the
    // evidence reset every time the subject exits the patch (the
    // exit-slice cumsum). Pins the composition of q46/q22/q26/q25/q21's
    // standalone idioms, where the off-by-ones live. Row-level output,
    // all-integer booleans.
    "q237_in_patch_composite" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val pos = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("x_c"),
          ((col("event_id") % 13) * 500).cast("long").as("y_c"))
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val wheel = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("step_c"))
        .withColumn("odo_c", sum(col("step_c")).over(wOrd))
        // one odometer value per instant: last writer (max event_id) wins
        .groupBy(col("user_id"), col("ts"))
        .agg(max(struct(col("event_id"), col("odo_c")))
          .getField("odo_c").as("odo_c"))
      graft.pipelines.Patch.isPositionInPatch(pos, wheel,
          keys = Seq("user_id"), timeCol = "ts", posTieCol = "event_id",
          xCentiCol = "x_c", yCentiCol = "y_c", wheelCentiCol = "odo_c",
          patchXCenti = 3000L, patchYCenti = 2500L, radiusCenti = 2500L,
          wheelWindowUs = 3600L * 1000000L, wheelMinCenti = 100L)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("in_patch"), col("in_wheel"),
          col("patch_slice"), col("in_patch_active"))
        .orderBy("user_id", "us", "event_id")
    }),

    // P5 null-row semantics (acquisition.py:664-705): every (user, day) slot
    // gets a row; absent streams appear with sample_count=0, not dropped.
    "q47_zero_sample_slots" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val users = ev.select(col("user_id")).distinct()
      val days = ev.select(date_trunc("day", col("ts")).as("day")).distinct()
      val slots = users.crossJoin(broadcast(days))
      val actual = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id").as("a_user"), date_trunc("day", col("ts")).as("a_day"))
        .agg(count(lit(1)).as("n"))
      slots.join(actual,
          col("user_id") === col("a_user") && col("day") === col("a_day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).as("sample_count"))
        .orderBy("user_id", "day")
    }),

    // Full ephys sync chain (J4 interval join + J9 predict + HARP convert,
    // Ephys.syncSpikeTimes): events play spikes (onix_clock = event_id);
    // per-user sync windows cover each user's id range with a deterministic
    // per-user model; output = spike HARP timestamps. Models broadcast.
    "q50_spike_sync" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val spikes = ev.select(col("user_id"), col("event_id").as("onix_clock"))
      val harp2024 = 3786912000.0 // 2024-01-01 on the HARP clock (s since 1904)
      val models = ev.groupBy(col("user_id").as("m_user"))
        .agg(min(col("event_id")).as("onix_start"),
          (max(col("event_id")) + 1).as("onix_end"))
        .withColumn("slope", lit(0.001))
        .withColumn("intercept", lit(harp2024) + col("m_user") * 3600.0)
        .withColumnRenamed("m_user", "user_id")
      Ephys.syncSpikeTimes(spikes, models, keys = Seq("user_id"))
        .select(spikes("user_id"), col("onix_clock"), col("harp_time"))
        .orderBy("onix_clock")
    }),

    // Bitmask event extraction (§2.10, BitmaskEvent reader kwargs
    // `streams_maker.py:42`, get_harp_stream_event_bitmask example): event
    // codes carry flag bits; select rows where the pellet-delivery bits
    // (0x22) are all set and split out the payload bits — a plain codegen'd
    // predicate, exactly as the reference compiles it to `event == value`.
    "q49_bitmask_events" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("event_code", pmod(col("event_id"), lit(256)).cast("int"))
        .filter(col("event_code").bitwiseAND(lit(0x22)) === 0x22)
        .select(col("event_id"), col("event_code"),
          col("event_code").bitwiseAND(lit(0xDD)).as("payload_bits"))
        .orderBy("event_id")
    }),

    // Scalar-function pack (§2.8): string/date/JSON functions over events.
    // prop_k demos regex extraction (codegen'd); prop_k_json demos REAL
    // schema'd JSON parsing — ONE from_json per row with a tight schema,
    // fields derived from the struct. (get_json_object would re-walk the
    // document per extracted path; the single-parse struct is the scale
    // shape, and was measured meaningfully faster here even with one path.)
    // Top-level-$.k semantics are identical to the oracle's
    // json_extract_string + cast on integer-valued payloads; malformed JSON
    // yields null on both sides (PERMISSIVE).
    // The projection sits ABOVE the sort on purpose: range partitioning's
    // sampling pass re-executes everything below the Sort, and the sort
    // exchange is also what fans a single-row-group input out across cores —
    // projecting after it means the regex/JSON/format work runs ONCE, in
    // parallel, instead of twice on however many partitions the file opened
    // with. (Catalyst does not push projections below sorts, so the shape is
    // stable.)
    "q48_scalar_functions" -> ((s, d) => {
      val k = regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int")
      val props = from_json(col("props"),
        StructType(Seq(StructField("k", IntegerType))))
      Tables.events(s, d)
        .orderBy("event_id")
        .select(col("event_id"),
          upper(col("event_type")).as("type_upper"),
          k.as("prop_k"),
          props.getField("k").as("prop_k_json"),
          date_trunc("hour", col("ts")).as("hour_bucket"),
          date_format(col("ts"), "yyyy-MM-dd").as("day_str"),
          concat_ws("_", col("event_type"), col("user_id")).as("type_user"))
    })
  )

  val oracles: Map[String, String] = Map(
    // tracking.py:305-324 replay: wheel odometer -> trailing-window
    // movement flag -> backward-inclusive pad onto positions -> radius
    // gate -> exit-slice cumsum -> per-slice running evidence.
    "q237_in_patch_composite" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
           event_type, value FROM events),
       pos AS (
         SELECT user_id, epoch_us(ts) AS us, event_id,
           CAST(round(value * 100) AS BIGINT) AS x_c,
           (event_id % 13) * 500 AS y_c
         FROM ev WHERE event_type = 'view'),
       wraw AS (
         SELECT user_id, epoch_us(ts) AS us, event_id,
           sum(CAST(round(value * 100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS odo_c
         FROM ev WHERE event_type = 'click'),
       wheel AS (
         SELECT user_id, us,
           max_by(odo_c, event_id) AS odo_c
         FROM wraw GROUP BY user_id, us),
       wflag AS (
         SELECT user_id, us,
           coalesce(sum(dd) OVER (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) > 100,
             false) AS mov
         FROM (SELECT *, odo_c - lag(odo_c)
             OVER (PARTITION BY user_id ORDER BY us) AS dd
           FROM wheel)),
       padded AS (
         SELECT p.*,
           (SELECT w.mov FROM wflag w
            WHERE w.user_id = p.user_id AND w.us <= p.us
            ORDER BY w.us DESC LIMIT 1) AS mov
         FROM pos p),
       flagged AS (
         SELECT *,
           (x_c - 3000) * (x_c - 3000) + (y_c - 2500) * (y_c - 2500)
             < 2500 * 2500 AS in_patch,
           coalesce(mov, false) AS in_wheel
         FROM padded),
       exits AS (
         SELECT *,
           CASE WHEN coalesce(lag(in_patch)
                 OVER (PARTITION BY user_id ORDER BY us, event_id), false)
               AND NOT in_patch THEN 1 ELSE 0 END AS ex
         FROM flagged),
       sliced AS (
         SELECT *,
           sum(ex) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS patch_slice
         FROM exits)
       SELECT user_id, us, event_id, in_patch, in_wheel,
         CAST(patch_slice AS BIGINT) AS patch_slice,
         in_patch AND sum(CASE WHEN in_wheel THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id, patch_slice ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
           AS in_patch_active
       FROM sliced ORDER BY user_id, us, event_id""",
    "q40_harp_clock" ->
      """SELECT event_id,
         epoch_us(ts) + 2082844800000000 AS harp_us,
         make_timestamp(CAST(round((epoch_us(ts) / 1000000.0 + 2082844800.0
           - 2082844800.0) * 1000000.0) AS BIGINT)) AS roundtrip_ts
       FROM events ORDER BY event_id""",
    "q41_chunk_catalog" ->
      """SELECT user_id,
         date_trunc('hour', ts) AS chunk_start,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS chunk_end,
         count(*) AS sample_count,
         min(ts) AS first_ts, max(ts) AS last_ts
       FROM events
       GROUP BY user_id, date_trunc('hour', ts)
       ORDER BY user_id, chunk_start""",
    "q42_fetch_stream" ->
      """SELECT ts, user_id, event_type, value
       FROM events
       WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
         AND ts <  TIMESTAMP '2024-01-20 00:00:00'
       ORDER BY ts, user_id""",
    "q43_temporal_validity" ->
      """WITH installs AS (
         SELECT user_id AS i_user, ts AS install_time,
           lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts) AS removal_time
         FROM events WHERE event_type = 'signup')
       SELECT e.event_id, e.user_id, e.ts, i.install_time
       FROM events e JOIN installs i
         ON e.user_id = i.i_user
        AND e.ts >= i.install_time
        AND (i.removal_time IS NULL OR e.ts < i.removal_time)
       ORDER BY e.event_id""",
    "q44_sync_predict" ->
      """WITH models AS (
         SELECT user_id AS m_user,
           regr_slope((epoch_us(ts) - 1704067200000000) / 1000000.0,
             CAST(event_id AS DOUBLE)) AS slope,
           regr_intercept((epoch_us(ts) - 1704067200000000) / 1000000.0,
             CAST(event_id AS DOUBLE)) AS intercept
         FROM events GROUP BY user_id)
       SELECT e.event_id, e.user_id,
         round(m.slope * e.event_id + m.intercept, 4) AS predicted_s
       FROM events e JOIN models m ON e.user_id = m.m_user
       ORDER BY e.event_id""",
    "q45_point_in_polygon" ->
      """SELECT event_id,
         (abs(value - 100.0) / 50.0 + abs(CAST(user_id AS DOUBLE) - 7.0) / 5.0) < 1.0
           AS in_nest
       FROM events ORDER BY event_id""",
    "q46_distance" ->
      """SELECT event_id,
         round(sqrt(pow(value - 100.0, 2) + pow(CAST(user_id AS DOUBLE) - 7.0, 2)), 6)
           AS dist,
         sqrt(pow(value - 100.0, 2) + pow(CAST(user_id AS DOUBLE) - 7.0, 2)) < 25.0
           AS in_patch
       FROM events ORDER BY event_id""",
    "q47_zero_sample_slots" ->
      """WITH users AS (SELECT DISTINCT user_id FROM events),
         days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
         actual AS (
           SELECT user_id AS a_user, date_trunc('day', ts) AS a_day, count(*) AS n
           FROM events WHERE event_type = 'error'
           GROUP BY user_id, date_trunc('day', ts))
       SELECT u.user_id, d.day, coalesce(a.n, 0) AS sample_count
       FROM users u CROSS JOIN days d
       LEFT JOIN actual a ON u.user_id = a.a_user AND d.day = a.a_day
       ORDER BY u.user_id, d.day""",
    "q50_spike_sync" ->
      """SELECT user_id, event_id AS onix_clock,
         make_timestamp(CAST(round(
           ((0.001 * event_id + (3786912000.0 + user_id * 3600.0))
             + (-2082844800.0)) * 1000000.0) AS BIGINT)) AS harp_time
       FROM events
       ORDER BY onix_clock""",
    "q49_bitmask_events" ->
      """SELECT event_id,
         CAST(event_id % 256 AS INTEGER) AS event_code,
         CAST((event_id % 256) AS INTEGER) & 221 AS payload_bits
       FROM events
       WHERE (CAST(event_id % 256 AS INTEGER) & 34) = 34
       ORDER BY event_id""",
    "q48_scalar_functions" ->
      """SELECT event_id,
         upper(event_type) AS type_upper,
         CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS prop_k,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k_json,
         date_trunc('hour', ts) AS hour_bucket,
         strftime(ts, '%Y-%m-%d') AS day_str,
         event_type || '_' || CAST(user_id AS VARCHAR) AS type_user
       FROM events ORDER BY event_id"""
  )
}
