package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact lagged correlation over REGULAR series — auto- and
  * cross-correlation at a fixed lag set, every statistic an exact integer
  * rational (the [[graft.functions.StatsFunctions.rollingSlope]]
  * discipline): Pearson's `r = num / sqrt(den_x · den_y)` reported as the
  * three exact integers `(num, den_x, den_y)` with
  * `num = n·Σxy − Σx·Σy`, `den_x = n·Σx² − (Σx)²`,
  * `den_y = n·Σy² − (Σy)²` over the lag-overlapped pairs — the sqrt (and
  * any float) deferred to the presentation edge; `sign(r) = sign(num)`
  * and `r² = num²/(den_x·den_y)` are exact as-is. The statistics are
  * DECIMAL(38,0): the intermediates (and at extreme magnitudes the
  * outputs) exceed BIGINT long before the data stops being realistic.
  *
  * The reference's analysis layer lives on exactly these statistics
  * (spike-train correlograms, tracking autocorrelation); here they come
  * back as engine-exact aggregates instead of numpy calls.
  *
  * Scale shape: one map-only lag explode on the right series (|lags|×
  * rows), one equi-join on `(keys, idx)` — regular series make the lag
  * join an EQUI join, no range scan — and one partial-aggregated keyed
  * shuffle per (key, lag) row out. Gaps in a series simply drop pairs
  * (overlap semantics), so irregular holes never misalign anything.
  */
object Correlate {

  /** Pearson statistics of `a.value` vs `b.value` shifted by each lag:
    * pairs are `(x = a at idx, y = b at idx + lag)`. Output:
    * `(keys…, lag, n, num, den_x, den_y)`, one row per (key, lag) with
    * n ≥ 2. Values must already be exact integers (snap doubles to micros
    * first); `idxCol` is the regular grid index (e.g. `us div step`).
    */
  def pearsonAtLags(a: DataFrame, b: DataFrame, keys: Seq[String],
                    idxCol: String, valueCol: String,
                    lags: Seq[Int]): DataFrame = {
    require(keys.nonEmpty, "pearsonAtLags needs grouping keys")
    require(lags.nonEmpty, "need at least one lag")
    require(lags.distinct.size == lags.size, "lags must be distinct")
    // DECIMAL(38,0) end to end (the q221 chi-square / modularity
    // discipline): with micro-snapped values (~10⁶) over ~10⁶-row series,
    // Σx² ≈ 10¹⁸ and n·Σx² exceeds 2⁶³ — the BIGINT path wraps silently
    // (pinned in CorrelateOverflowSpec) even though the FINAL num/den are
    // small (catastrophic cancellation: den_x = n²·var). 38 digits cover
    // n·Σx² for any n·x² product under 10³⁸ — beyond Long everywhere the
    // statistic is still representable at all.
    val left = a.select(keys.map(col) :+ col(idxCol).cast("long").as("__i") :+
      col(valueCol).cast("decimal(38,0)").as("__x"): _*)
    val right = b.select(keys.map(col) :+ col(idxCol).cast("long").as("__bi") :+
        col(valueCol).cast("decimal(38,0)").as("__y"): _*)
      .withColumn("lag", explode(typedlit(lags.map(_.toLong))))
      .withColumn("__i", col("__bi") - col("lag"))
      .drop("__bi")
    val d38 = "decimal(38,0)"
    left.join(right, keys :+ "__i")
      .groupBy(keys.map(col) :+ col("lag"): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).cast(d38).as("__sx"),
        sum(col("__y")).cast(d38).as("__sy"),
        sum((col("__x") * col("__y")).cast(d38)).cast(d38).as("__sxy"),
        sum((col("__x") * col("__x")).cast(d38)).cast(d38).as("__sxx"),
        sum((col("__y") * col("__y")).cast(d38)).cast(d38).as("__syy"))
      .filter(col("n") >= 2)
      .select(keys.map(col) ++ Seq(col("lag"), col("n"),
        (col("n").cast(d38) * col("__sxy") - col("__sx") * col("__sy"))
          .cast(d38).as("num"),
        (col("n").cast(d38) * col("__sxx") - col("__sx") * col("__sx"))
          .cast(d38).as("den_x"),
        (col("n").cast(d38) * col("__syy") - col("__sy") * col("__sy"))
          .cast(d38).as("den_y")): _*)
  }

  /** [[pearsonAtLags]] of a series against itself — the sample ACF. */
  def autocorr(df: DataFrame, keys: Seq[String], idxCol: String,
               valueCol: String, lags: Seq[Int]): DataFrame =
    pearsonAtLags(df, df, keys, idxCol, valueCol, lags)

  /** Exact SPEARMAN rank correlation per group: Pearson over tie-averaged
    * ranks, with average ranks carried DOUBLED (`rank2 = 2·rank + c − 1`,
    * an integer — the [[graft.operators.Eval.aucExact]] tie discipline),
    * so ties never introduce a float. Output the same exact decimal
    * triple as [[pearsonAtLags]]: `(keys…, n, num, den_x, den_y)` with
    * `ρ = num / sqrt(den_x·den_y)` over the rank2 values — the doubling
    * cancels in ρ, and `sign(ρ)`/`ρ²` read off exactly. The monotone-trend
    * detector (x = time) and the robust cousin of [[pearsonAtLags]].
    *
    * Scale shape: both rank windows partition on the SAME keys — one
    * keyed exchange, two in-partition sorts — then one aggregate; rank
    * sums are O(n²)-magnitude, so all products run in DECIMAL(38,0).
    */
  def spearman(df: DataFrame, keys: Seq[String], xCol: String,
               yCol: String): DataFrame = {
    require(keys.nonEmpty, "spearman needs grouping keys")
    val ks = keys.map(col)
    val d38 = "decimal(38,0)"
    def rank2(v: org.apache.spark.sql.Column, out: String) = (df2: DataFrame) =>
      df2.withColumn("__r", rank().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(ks: _*).orderBy(v)))
        .withColumn("__c", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(ks :+ v: _*)))
        .withColumn(out, (lit(2L) * col("__r") + col("__c") - lit(1L))
          .cast(d38))
        .drop("__r", "__c")
    val ranked = rank2(col("__x"), "rx")(
      rank2(col("__y"), "ry")(
        df.select(ks ++ Seq(col(xCol).cast("long").as("__x"),
            col(yCol).cast("long").as("__y")): _*)
          .filter(col("__x").isNotNull && col("__y").isNotNull)))
    ranked.groupBy(ks: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("rx")).cast(d38).as("__sx"),
        sum(col("ry")).cast(d38).as("__sy"),
        sum((col("rx") * col("ry")).cast(d38)).cast(d38).as("__sxy"),
        sum((col("rx") * col("rx")).cast(d38)).cast(d38).as("__sxx"),
        sum((col("ry") * col("ry")).cast(d38)).cast(d38).as("__syy"))
      .filter(col("n") >= 2)
      .select(ks ++ Seq(col("n"),
        (col("n").cast(d38) * col("__sxy") - col("__sx") * col("__sy"))
          .cast(d38).as("num"),
        (col("n").cast(d38) * col("__sxx") - col("__sx") * col("__sx"))
          .cast(d38).as("den_x"),
        (col("n").cast(d38) * col("__syy") - col("__sy") * col("__sy"))
          .cast(d38).as("den_y")): _*)
  }
}
