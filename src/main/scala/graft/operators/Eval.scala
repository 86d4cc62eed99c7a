package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation statistics with EXACT arithmetic — the scoring side of
  * the training-data pipeline (the q102 classifier, the q124/q125 quality
  * scores all end in "how well does this score separate the classes?").
  * Floats appear nowhere: every statistic is an integer rational on the
  * micro grid, so any engine replays it bit-for-bit.
  */
object Eval {

  /** Exact ROC-AUC per group via the Mann–Whitney U statistic with the
    * standard tie correction: AUC = (Σ_{pos} r̄ − n₊(n₊+1)/2) / (n₊·n₋),
    * where tied scores take their AVERAGE rank. Average ranks are carried
    * DOUBLED (`rank2 = first + last rank of the tie group` — an integer,
    * the [[Robust]] med2 discipline), giving
    * `auc_micro = ⌊10⁶·(Σ rank2₊ − n₊(n₊+1)) / (2·n₊·n₋)⌋`.
    *
    * Output: `(keys…, n_pos, n_neg, auc_micro)`; groups missing a class
    * have no defined AUC and are emitted with `auc_micro` null.
    *
    * Scale shape: ONE keyed window sort (rank + per-score tie count share
    * the same exchange) and one aggregate; the rank sums run in
    * DECIMAL(38,0) — Σ rank2 is O(n²) and wraps BIGINT near 10⁹-row
    * groups (the q215/q207 overflow discipline).
    */
  def aucExact(df: DataFrame, keys: Seq[String], scoreCol: String,
               labelCol: String): DataFrame = {
    require(keys.nonEmpty, "aucExact needs grouping keys")
    val ks = keys.map(col)
    val wRank = Window.partitionBy(ks: _*).orderBy(col("__s"))
    val wTies = Window.partitionBy(ks :+ col("__s"): _*)
    val d38 = "decimal(38,0)"
    df.select(ks ++ Seq(col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("boolean").as("__y")): _*)
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .withColumn("__r", rank().over(wRank))
      .withColumn("__c", count(lit(1)).over(wTies))
      // doubled average rank of the tie group: first + last
      .withColumn("__r2", lit(2L) * col("__r") + col("__c") - lit(1L))
      .groupBy(ks: _*)
      .agg(
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("n_neg"),
        // cast per ROW before summing: Σ rank2 is O(n²) and must
        // accumulate in decimal — a LongType sum cast after aggregation
        // wraps silently first (ADVICE r11; the Correlate/Graphs pattern)
        sum(when(col("__y"), col("__r2")).otherwise(0L).cast(d38))
          .cast(d38).as("__sr2"))
      .withColumn("auc_micro",
        when(col("n_pos") > 0 && col("n_neg") > 0, expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0))
            |  * (__sr2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)))
            | div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg)
            | AS BIGINT)""".stripMargin)))
      .drop("__sr2")
  }
}
