package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering transforms for the classifier/scoring family
  * (q102/q124's inputs) — row-level encodings with EXACT integer
  * arithmetic, so a training table materialized by any engine is
  * bit-identical.
  */
object Features {

  /** Deterministic QUANTILE BINNING: every row tagged with its per-group
    * quantile bin `⌊(rank − 1)·nBins / n⌋` over `rank()` (ties share a
    * rank, hence a bin — unlike `ntile`, which splits ties by arbitrary
    * physical order and is NOT replayable across engines). Bins are
    * 0-based and at most `nBins` wide; heavy ties can leave bins empty —
    * the price of determinism, and exactly how a feature pipeline wants
    * it (equal inputs get equal features).
    *
    * Scale shape: one keyed window sort (rank + group count share the
    * exchange); null values pass through with a null bin.
    */
  def quantileBin(df: DataFrame, keys: Seq[String], valueCol: String,
                  nBins: Int, binCol: String = "bin"): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    require(keys.nonEmpty, "quantileBin needs grouping keys")
    val ks = keys.map(col)
    // nulls must sort LAST: Spark's default nulls-first ordering would
    // hand null rows the lowest ranks, shifting every real value's rank
    // up and pushing the max value into a bin >= nBins (caught by the
    // nulls-among-values spec case)
    val wRank = Window.partitionBy(ks: _*)
      .orderBy(col(valueCol).asc_nulls_last)
    val wAll = Window.partitionBy(ks: _*)
    df.withColumn("__r",
        when(col(valueCol).isNotNull, rank().over(wRank)))
      .withColumn("__n",
        count(col(valueCol)).over(wAll))
      .withColumn(binCol,
        when(col(valueCol).isNotNull,
          expr(s"((__r - 1) * $nBins) div __n")))
      .drop("__r", "__n")
  }

  /** LEAVE-ONE-OUT target encoding: each row's category feature is the
    * mean target of the OTHER rows in its category —
    * `⌊(Σ_cat target − target) / (n_cat − 1)⌋` on the integer micro grid
    * (singleton categories encode null; there is no "other" evidence).
    * Excluding the row's own target is the standard leakage guard: a
    * plain category mean hands the model its own label.
    *
    * Targets must be NONNEGATIVE micros (floor ≡ truncate on every
    * engine — the clusteringCoefficient discipline); enforced at runtime
    * loudly rather than silently mis-rounding.
    *
    * Scale shape: one category-keyed aggregate joined back to rows
    * (broadcast at category-vocabulary scale); no window, no sort.
    */
  def targetEncodeLoo(df: DataFrame, categoryCols: Seq[String],
                      targetMicroCol: String,
                      encCol: String = "enc_micro"): DataFrame = {
    require(categoryCols.nonEmpty, "targetEncodeLoo needs category columns")
    val ks = categoryCols.map(col)
    val agg = df
      .select(ks :+ col(targetMicroCol).cast("long").as("__t"): _*)
      .filter(col("__t").isNotNull)
      .groupBy(ks: _*)
      .agg(sum(col("__t")).as("__sum"), count(lit(1)).as("__cnt"),
        min(col("__t")).as("__min"))
    df.join(agg, categoryCols, "left")
      .withColumn(encCol,
        when(col("__min") < 0,
          expr("raise_error('targetEncodeLoo: negative target micros — " +
            "shift to a nonnegative grid first')").cast("long"))
        .when(col(targetMicroCol).isNotNull && col("__cnt") > 1,
          expr(s"(__sum - CAST($targetMicroCol AS BIGINT)) div (__cnt - 1)")))
      .drop("__sum", "__cnt", "__min")
  }
}
