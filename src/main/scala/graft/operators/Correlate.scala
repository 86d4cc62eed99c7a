package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact lagged correlation over REGULAR series — auto- and
  * cross-correlation at a fixed lag set, every statistic an exact integer
  * rational (the [[graft.functions.StatsFunctions.rollingSlope]]
  * discipline): Pearson's `r = num / sqrt(den_x · den_y)` reported as the
  * three integers `(num, den_x, den_y)` with
  * `num = n·Σxy − Σx·Σy`, `den_x = n·Σx² − (Σx)²`,
  * `den_y = n·Σy² − (Σy)²` over the lag-overlapped pairs — the sqrt (and
  * any float) deferred to the presentation edge; `sign(r) = sign(num)`
  * and `r² = num²/(den_x·den_y)` are exact as-is.
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
    val left = a.select(keys.map(col) :+ col(idxCol).cast("long").as("__i") :+
      col(valueCol).cast("long").as("__x"): _*)
    val right = b.select(keys.map(col) :+ col(idxCol).cast("long").as("__bi") :+
        col(valueCol).cast("long").as("__y"): _*)
      .withColumn("lag", explode(typedlit(lags.map(_.toLong))))
      .withColumn("__i", col("__bi") - col("lag"))
      .drop("__bi")
    left.join(right, keys :+ "__i")
      .groupBy(keys.map(col) :+ col("lag"): _*)
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"), sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
      .filter(col("n") >= 2)
      .select(keys.map(col) ++ Seq(col("lag"), col("n"),
        (col("n") * col("__sxy") - col("__sx") * col("__sy")).as("num"),
        (col("n") * col("__sxx") - col("__sx") * col("__sx")).as("den_x"),
        (col("n") * col("__syy") - col("__sy") * col("__sy")).as("den_y")): _*)
  }

  /** [[pearsonAtLags]] of a series against itself — the sample ACF. */
  def autocorr(df: DataFrame, keys: Seq[String], idxCol: String,
               valueCol: String, lags: Seq[Int]): DataFrame =
    pearsonAtLags(df, df, keys, idxCol, valueCol, lags)
}
