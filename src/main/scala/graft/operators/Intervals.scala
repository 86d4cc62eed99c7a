package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key interval-set algebra over half-open `[start, end)` spans in
  * epoch-micros: union-coalesce of overlapping/adjacent intervals and the
  * intersection of two interval sets.
  *
  * The reference works with exactly these shapes — epochs, chunks, and
  * visits are all validity spans, and questions like "time in ROI while the
  * task was active" are interval intersections (`aeon/io/api.py` chunk
  * spans; `aeon/dj_pipeline/acquisition.py:253-304` epoch closure;
  * `aeon/analysis/block_plotting.py` per-block spans). [[IntervalJoin]]
  * answers PAIRING questions (which A overlaps which B); this answers SET
  * questions (what is A∪A, A∩B as a timeline), which no join expresses.
  *
  * Scale shape: everything is gaps-and-islands / sweep-line on ONE keyed
  * sort — [[merge]] is a running-max window + aggregate, [[intersect]] is
  * a ±1 delta sweep (two running sums) feeding [[merge]]. No self-joins,
  * no per-interval scans, no global state; cost is O(|intervals|) rows
  * through 2–3 keyed shuffles regardless of span lengths, so heavily
  * overlapping corpora (the all-pairs killer for join-based formulations)
  * cost the same as disjoint ones.
  */
object Intervals {

  /** Coalesce a keyed interval set: intervals whose spans overlap or touch
    * (or sit within `gapMicros` of each other) collapse into one maximal
    * interval. Half-open semantics — `[1,5)` and `[5,9)` are adjacent and
    * merge at `gapMicros = 0`. Degenerate rows (`end <= start`) are
    * rejected loudly rather than silently seeding zero-width islands.
    *
    * Output: one row per merged interval —
    * `(keys…, interval_id, start_us, end_us, n_merged)` with `interval_id`
    * 0-based per key in time order.
    *
    * Scale shape: one shuffle on `keys`; island detection is
    * `start > running_max(end) over preceding rows` (order-insensitive
    * among equal starts, so tie order cannot flip membership), and the
    * per-island aggregate reuses the same hash partitioning (grouping keys
    * are a superset of the window's partition keys — no second shuffle).
    */
  def merge(df: DataFrame, keys: Seq[String], startCol: String,
            endCol: String, gapMicros: Long = 0L): DataFrame = {
    require(keys.nonEmpty,
      "Intervals.merge needs partitioning keys (the sweep shuffles on " +
        "them); an unkeyed merge runs in ONE partition")
    require(gapMicros >= 0L, "gapMicros must be >= 0")
    val checked = df.withColumn("__s", col(startCol).cast("long"))
      .withColumn("__e", col(endCol).cast("long"))
      .withColumn("__s",
        when(col("__e") > col("__s"), col("__s"))
          .otherwise(raise_error(concat(
            lit("Intervals.merge: degenerate interval (end <= start) — "),
            col("__s").cast("string"), lit(" >= "),
            col("__e").cast("string")))))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__s"), col("__e"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    checked
      .withColumn("__pmax", max(col("__e")).over(wPrev))
      .withColumn("__new",
        when(col("__pmax").isNull ||
          col("__s") > col("__pmax") + lit(gapMicros), 1L).otherwise(0L))
      .withColumn("interval_id", sum(col("__new")).over(wRun) - 1L)
      .groupBy(keys.map(col) :+ col("interval_id"): _*)
      .agg(min(col("__s")).as("start_us"), max(col("__e")).as("end_us"),
        count(lit(1)).as("n_merged"))
  }

  /** Intersection of two keyed interval sets: the maximal half-open spans
    * during which at least one `a`-interval AND at least one `b`-interval
    * are active. Inputs need not be disjoint or sorted; both sides use the
    * same `(startCol, endCol)` column names.
    *
    * Output: `(keys…, interval_id, start_us, end_us)` — disjoint, 0-based
    * per key in time order.
    *
    * Scale shape: the classic sweep, expressed relationally — each
    * interval becomes a `+1` delta at start and `-1` at end; deltas
    * aggregate per `(keys, t)` (so state BETWEEN event times is exact
    * half-open semantics by construction: an end and a start at the same
    * instant cancel before the running sum sees them); two running sums
    * give the per-side active counts and each `[t, next_t)` slice where
    * both are positive is live. Adjacent live slices share their boundary
    * event, so [[merge]] with gap 0 coalesces them into maximal spans.
    */
  def intersect(a: DataFrame, b: DataFrame, keys: Seq[String],
                startCol: String, endCol: String): DataFrame = {
    require(keys.nonEmpty,
      "Intervals.intersect needs partitioning keys (the sweep shuffles " +
        "on them); an unkeyed sweep runs in ONE partition")
    def deltas(df: DataFrame, da: Long, db: Long) = {
      val starts = df.select(keys.map(col) :+
        col(startCol).cast("long").as("__t") :+
        lit(da).as("__da") :+ lit(db).as("__db"): _*)
      val ends = df.select(keys.map(col) :+
        col(endCol).cast("long").as("__t") :+
        lit(-da).as("__da") :+ lit(-db).as("__db"): _*)
      starts.unionByName(ends)
    }
    val events = deltas(a, 1L, 0L).unionByName(deltas(b, 0L, 1L))
      .groupBy(keys.map(col) :+ col("__t"): _*)
      .agg(sum(col("__da")).as("__da"), sum(col("__db")).as("__db"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val live = events
      .withColumn("__aa", sum(col("__da")).over(wRun))
      .withColumn("__ab", sum(col("__db")).over(wRun))
      .withColumn("__nt", lead(col("__t"), 1).over(w))
      .filter(col("__nt").isNotNull && col("__aa") > 0 && col("__ab") > 0)
      .select(keys.map(col) :+ col("__t").as("__seg_s") :+
        col("__nt").as("__seg_e"): _*)
    merge(live, keys, "__seg_s", "__seg_e", gapMicros = 0L)
      .drop("n_merged")
  }

  /** Covered time per `(key, UTC bucket)`: [[merge]] the interval set,
    * split each merged span across the fixed `bucketMicros` grid, and sum
    * the per-bucket overlap — "time in ROI per day" and every other
    * duty-cycle question. Output: `(keys…, bucket_start_us, covered_us)`
    * with `covered_us` in `(0, bucketMicros]`; buckets with no coverage
    * are absent.
    *
    * Scale shape: the merge passes, then a map-only `sequence()` explode —
    * a span touching `b` buckets becomes `b` rows, so the explode is
    * bounded by total covered time over the bucket width, never by
    * interval count² — and one more keyed aggregate.
    */
  def coverageByBucket(df: DataFrame, keys: Seq[String], startCol: String,
                       endCol: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val merged = merge(df, keys, startCol, endCol, gapMicros = 0L)
    merged
      .withColumn("__b0",
        col("start_us") - pmod(col("start_us"), lit(bucketMicros)))
      // end_us is exclusive: a span ending exactly ON a boundary must not
      // open the next bucket
      .withColumn("__b1",
        (col("end_us") - 1L) - pmod(col("end_us") - 1L, lit(bucketMicros)))
      .withColumn("bucket_start_us",
        explode(sequence(col("__b0"), col("__b1"), lit(bucketMicros))))
      .withColumn("__cov",
        least(col("end_us"), col("bucket_start_us") + bucketMicros) -
          greatest(col("start_us"), col("bucket_start_us")))
      .groupBy(keys.map(col) :+ col("bucket_start_us"): _*)
      .agg(sum(col("__cov")).as("covered_us"))
  }
}
