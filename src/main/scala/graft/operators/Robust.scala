package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group statistics on an INTEGER-valued column — median/MAD
  * outlier detection (Hampel's rule) with EXACT arithmetic: interpolated
  * medians differ across engines in the last ulp (`lo + 0.5·(hi−lo)` vs
  * `0.5·lo + 0.5·hi`), so medians are carried DOUBLED (`med2 = lo + hi`
  * over the order statistics — an integer, never a float), and the
  * outlier gate is the integer comparison `|2x − med2| > k·mad2`. NOTE
  * `mad2 = 4·MAD` (a doubled median over already-doubled deviations), so
  * the gate's EFFECTIVE sensitivity is `|x − med| > 2k·MAD` — see
  * [[madSummary]]. Callers quantize floats to an integer grid
  * first (cents, micros) — the same discipline as every micro-grid score
  * in this repo.
  *
  * Scale shape: two rank passes, each ONE window shuffle keyed by the
  * group (order statistics need a per-group sort; groups are
  * key-cardinality sized, never corpus-sized), and the join back to rows
  * reuses the group partitioning. No global sort, no collect.
  */
object Robust {

  /** EXACT per-group nearest-rank quantiles: one output row per (group,
    * percentile) with `value = v₍⌈p·n/100⌉₎` over the sorted group — the
    * classic nearest-rank definition, pure integer index arithmetic
    * (`(p·n + 99) div 100`, clamped to ≥ 1), so unlike interpolated
    * percentiles there is no float to disagree on. The exact companion of
    * the sample-based q121 path: ONE rank-window pass serves every
    * requested percentile (rows matching any selected index survive a
    * codegen'd filter; no per-percentile scan).
    * Output: `(keyCols…, pct, n, value)`.
    */
  def nearestRankQuantiles(df: DataFrame, keyCols: Seq[String],
                           valueCol: String, pcts: Seq[Int]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1, 100]")
    val keys = keyCols.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(keys: _*)
    val ranked = df.select(keys :+ col(valueCol).cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
    val pctArr = pcts.distinct.sorted
    ranked
      .select(keys ++ Seq(col("__v"), col("__rn"), col("__n"),
        explode(typedlit(pctArr)).as("pct")): _*)
      .filter(col("__rn") ===
        greatest(lit(1L), expr("(pct * __n + 99) div 100")))
      .select(keys ++ Seq(col("pct").cast("long").as("pct"),
        col("__n").as("n"), col("__v").as("value")): _*)
  }

  /** Per-group `(keyCols…, n, med2, mad2, n_outliers)`:
    * `med2 = v₍⌈n/2⌉₎ + v₍⌊n/2⌋₊₁₎` (twice the median, exact), and
    * `mad2` the same doubled-median construction over the ALREADY-doubled
    * deviations `|2v − med2|` — so `mad2 = 4·MAD`, and the outlier gate
    * `|2v − med2| > k·mad2` is EQUIVALENT to `|v − med| > 2k·MAD`: the
    * effective sensitivity is 2k, not the textbook k (default k=3 gates
    * like a textbook k=6). This convention is pinned by the oracles and
    * shared by [[hampelFilter]]/[[hampelFilterTrailing]]; pass k' = ⌈k/2⌉
    * for the textbook gate at even k.
    */
  def madSummary(df: DataFrame, keyCols: Seq[String], valueCol: String,
                 k: Int = 3): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(k >= 1, "k must be >= 1")
    val keys = keyCols.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(keys: _*)
    def medTwice(in: DataFrame, v: String, out: String): DataFrame =
      in.select(keys :+ col(v).as("__v"): _*)
        .withColumn("__rn", row_number().over(wOrd))
        .withColumn("__n", count(lit(1)).over(wAll))
        .withColumn("__lo", expr("(__n + 1) div 2"))
        .withColumn("__hi", expr("__n div 2 + 1"))
        .groupBy(keys: _*)
        .agg((sum(when(col("__rn") === col("__lo"), col("__v"))
            .otherwise(0L)) +
          sum(when(col("__rn") === col("__hi"), col("__v")).otherwise(0L)))
          .as(out),
          max(col("__n")).as("__cnt"))
    // null measurements carry no evidence — and unfiltered they'd sort
    // ahead of every value and silently shift the selected order statistics
    val vals = df.select(keys :+ col(valueCol).cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull)
    val med = medTwice(vals, "__v", "med2")
    val withDev = vals.join(med, keyCols)
      .withColumn("__d2", abs(lit(2L) * col("__v") - col("med2")))
    val mad = medTwice(withDev, "__d2", "mad2")
      .withColumnRenamed("__cnt", "__cnt2")
    withDev.join(mad.select(keys :+ col("mad2"): _*), keyCols)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"), max(col("med2")).as("med2"),
        max(col("mad2")).as("mad2"),
        sum(when(col("__d2") > lit(k.toLong) * col("mad2"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** HAMPEL FILTER — the sliding-window robust outlier detector (Hampel
    * 1974; the standard despiking pass over sensor/tracking series): per
    * row, the median and MAD over the CENTERED window of `half` rows each
    * side (row frame, so series edges use what exists), and the outlier
    * gate in the [[madSummary]] doubled-integer form: `mad2 = 4·MAD`
    * (doubled median of already-doubled deviations), so
    * `|2x − med2| > k·mad2` gates at an EFFECTIVE `|x − med| > 2k·MAD` —
    * twice the textbook Hampel sensitivity at the same k (see
    * [[madSummary]]). No interpolated float anywhere, so any engine
    * replays it exactly.
    *
    * Output: every input row plus `(med2, mad2, is_outlier)`, where
    * `is_outlier ⇔ |2x − med2| > k·mad2` (a constant window — mad2 = 0 —
    * flags exactly the rows that differ from it at all, the standard
    * degenerate-MAD behavior).
    *
    * Scale shape: ONE keyed window shuffle; the per-row order statistics
    * come from `sort_array(collect_list)` over the BOUNDED frame
    * (2·half+1 values — constant memory per row, codegen'd array ops, no
    * per-row re-shuffle), and the deviation median reuses the same
    * collected array via `transform` instead of a second window pass.
    */
  def hampelFilter(df: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, valueMicroCol: String,
                   half: Int, k: Int = 3): DataFrame = {
    require(half >= 1, "half-window must be >= 1")
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)), col(tieCol))
      .rowsBetween(-half, half)
    hampelOver(df, valueMicroCol, k, w)
  }

  /** TRAILING [[hampelFilter]] — the CAUSAL variant (window = the current
    * row and the `window − 1` rows before it), the form a live QC stream
    * can evaluate the moment a sample arrives: no future rows, so the
    * statistic never revises. Series heads use what exists (a key's first
    * row is its own median — never an outlier). Same doubled-integer
    * arithmetic — and the same effective `2k·MAD` gate as
    * [[hampelFilter]] — same one-keyed-shuffle shape; the streaming twin
    * is [[graft.streaming.StreamingHampel]].
    */
  def hampelFilterTrailing(df: DataFrame, keyCol: String, tsCol: String,
                           tieCol: String, valueMicroCol: String,
                           window: Int, k: Int = 3): DataFrame = {
    require(window >= 2, "window must be >= 2 rows")
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)), col(tieCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    hampelOver(df, valueMicroCol, k, w)
  }

  private def hampelOver(df: DataFrame, valueMicroCol: String, k: Int,
                         w: org.apache.spark.sql.expressions.WindowSpec)
      : DataFrame = {
    def med2Of(arr: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      element_at(arr, ((n + 1) / lit(2)).cast("int")) +
        element_at(arr, (n / lit(2) + 1).cast("int"))
    df.withColumn("__ls",
        sort_array(collect_list(col(valueMicroCol).cast("long")).over(w)))
      .withColumn("__n", size(col("__ls")))
      .withColumn("med2", med2Of(col("__ls"), col("__n")))
      .withColumn("__dev",
        sort_array(transform(col("__ls"),
          x => abs(lit(2L) * x - col("med2")))))
      .withColumn("mad2", med2Of(col("__dev"), col("__n")))
      .withColumn("is_outlier",
        abs(lit(2L) * col(valueMicroCol).cast("long") - col("med2")) >
          lit(k.toLong) * col("mad2"))
      .drop("__ls", "__n", "__dev")
  }
}
