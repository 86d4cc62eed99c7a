package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-to-event (survival) analysis over episode durations.
  *
  * The reference's foraging analytics reason about how long a subject stays
  * in a state before an event ends it — time-in-patch before leaving
  * (`/root/reference/aeon/dj_pipeline/tracking.py:290-340` position epochs,
  * the q237 patch composite), session length before going quiet (q25) —
  * and any observation window right-censors the episodes still open at its
  * edge. The Kaplan–Meier product-limit estimator (Kaplan & Meier 1958,
  * JASA 53:457) is the standard tool; its sufficient statistics are the
  * LIFE TABLE emitted here: at each distinct duration `t` per stratum,
  *
  *   n_event(t)    = episodes ending in an observed event at exactly t
  *   n_censored(t) = episodes censored at exactly t
  *   n_risk(t)     = episodes with duration >= t (the at-risk set)
  *
  * from which S(t) = prod_{t_i <= t} (1 - n_event(t_i)/n_risk(t_i)) and
  * Greenwood variance follow by pure per-row rational arithmetic. The
  * estimator itself is a product of rationals whose exact integer form
  * overflows any fixed width, so the OPERATOR stops at the exact-integer
  * life table (the q246 num/den discipline: ship the exact sufficient
  * statistics, let the presentation edge go float).
  *
  * Scale shape: one groupBy on (strata, duration) with map-side partials
  * (distinct durations per stratum bound the output, not the input rows),
  * then one window keyed on the strata for the descending cumulative
  * at-risk count. Both stages cluster on the strata — Spark satisfies the
  * (strata, duration) aggregation from a strata-only partitioning, so a
  * pre-partitioned input pays ONE exchange. No global window: the keyed
  * form requires strata; the explicitly single-partition form is the
  * separate `*Global` name (house convention, see [[Sessionize]]).
  */
object Survival {

  /** Keyed Kaplan–Meier life table. `durCol` must be integral (pick the
    * grid — seconds, millis — upstream; a float duration makes "distinct
    * time" engine-dependent). `eventCol` is boolean: true = the episode
    * ended in an observed event, false = right-censored at `durCol`.
    *
    * Output: groupCols ++ (duration, n_risk, n_event, n_censored), one row
    * per distinct observed duration (event OR censor times — censor-only
    * rows carry n_event = 0 and are what the KM step function's risk-set
    * bookkeeping needs between events). All counts BIGINT.
    */
  def kmLifeTable(df: DataFrame, groupCols: Seq[String], durCol: String,
                  eventCol: String): DataFrame = {
    require(groupCols.nonEmpty,
      "Survival.kmLifeTable needs strata keys (the life table shuffles on " +
        "them); an unstratified table runs in ONE partition — if that is " +
        "really what you want, call kmLifeTableGlobal")
    lifeTableImpl(df, groupCols, durCol, eventCol)
  }

  /** Unstratified [[kmLifeTable]]: one global life table in a single
    * partition — fine for a presentation-edge frame (one experiment's
    * episodes), never for corpus-scale input.
    */
  def kmLifeTableGlobal(df: DataFrame, durCol: String,
                        eventCol: String): DataFrame =
    lifeTableImpl(df, Seq.empty, durCol, eventCol)

  private def lifeTableImpl(df: DataFrame, groupCols: Seq[String],
                            durCol: String, eventCol: String): DataFrame = {
    graft.functions.StatsFunctions.requireIntegralColumn(df.schema,
      durCol, "kmLifeTable duration")
    val g = groupCols.map(col)
    val perT = df
      .groupBy((g :+ col(durCol).cast("long").as("duration")): _*)
      .agg(
        sum(when(col(eventCol), 1L).otherwise(0L)).as("n_event"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("n_censored"))
    val part =
      if (groupCols.nonEmpty) Window.partitionBy(g: _*)
      else Window.partitionBy()
    val atRisk = part.orderBy(col("duration").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perT.select(
      (g :+ col("duration")
        :+ sum(col("n_event") + col("n_censored")).over(atRisk).as("n_risk")
        :+ col("n_event") :+ col("n_censored")): _*)
  }

  /** Two-sample LOG-RANK test sufficient statistics (Mantel 1966; the
    * standard KM companion — "do the two arms' survival curves differ?").
    * `armCol` must be 0/1 integral (arm 1 is the tested arm). At each
    * distinct duration `t` with at least one pooled event:
    *
    *   O1 += d1(t)
    *   E1 += d(t)·n1(t)/n(t)             (arm-1 expected events under H0)
    *   V  += d(t)·n1(t)·(n−n1)·(n−d) / (n²·(n−1))   (hypergeometric var)
    *
    * emitted as exact integers on the 10⁻⁶ grid — each rational term
    * floors independently (`e1_micro`, `v_micro`; the BM25 `idf_micro`
    * discipline), so the statistic replays bit-for-bit in any engine and
    * differs from the real-valued sum by < 10⁻⁶ per event time. The
    * products run in DECIMAL(38,0) (d·n1·(n−n1)·(n−d)·10⁶ reaches ~10²⁶
    * at 10⁵ subjects — far past BIGINT; the q221 chi-square pattern) and
    * each term snaps to BIGINT. χ² = (O1 − E1)²/V is the presentation
    * edge's one float.
    *
    * Scale shape: one groupBy(keys, duration) with map-side partials, a
    * keyed window over the POST-aggregation rows (distinct durations —
    * bounded by the duration grid, not the subject count; with empty
    * `keys` the window is single-partition over that bounded table, the
    * q216 presentation-edge convention), one final aggregate. One row per
    * key group: (keys, o1, e1_micro, v_micro).
    */
  def logRank(df: DataFrame, armCol: String, durCol: String,
              eventCol: String, keys: Seq[String] = Seq.empty): DataFrame = {
    val at = df.schema(armCol).dataType
    require(at == org.apache.spark.sql.types.LongType ||
      at == org.apache.spark.sql.types.IntegerType,
      s"logRank arm column '$armCol' must be 0/1 integral (got $at)")
    val g = keys.map(col)
    val perT = df
      .groupBy((g :+ col(durCol).cast("long").as("duration")): _*)
      .agg(
        count(lit(1)).as("c_all"),
        sum(when(col(eventCol), 1L).otherwise(0L)).as("d_all"),
        sum(col(armCol).cast("long")).as("c_1"),
        sum(when(col(eventCol), col(armCol).cast("long")).otherwise(0L))
          .as("d_1"))
    val part =
      if (keys.nonEmpty) Window.partitionBy(g: _*) else Window.partitionBy()
    val atRisk = part.orderBy(col("duration").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = perT
      .withColumn("n_all", sum(col("c_all")).over(atRisk))
      .withColumn("n_1", sum(col("c_1")).over(atRisk))
      .filter(col("d_all") >= 1L)
      .withColumn("e1_t", expr(
        """CAST((CAST(1000000 AS DECIMAL(38,0)) * d_all * n_1)
          | div CAST(n_all AS DECIMAL(38,0)) AS BIGINT)""".stripMargin))
      .withColumn("v_t", when(col("n_all") > 1L, expr(
        """CAST((CAST(1000000 AS DECIMAL(38,0)) * d_all * n_1
          |   * (n_all - n_1) * (n_all - d_all))
          | div (CAST(n_all AS DECIMAL(38,0)) * n_all * (n_all - 1))
          | AS BIGINT)""".stripMargin)).otherwise(0L))
    val aggs = Seq(sum(col("d_1")).as("o1"),
      sum(col("e1_t")).as("e1_micro"), sum(col("v_t")).as("v_micro"))
    if (keys.nonEmpty) risk.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
    else risk.agg(aggs.head, aggs.tail: _*)
  }

  /** Right-censoring flag against an observation edge: an episode whose
    * last activity sits within `gapUs` of `edgeUs` could still be open when
    * the recording stopped — its duration is a lower bound, not an event.
    * (The censor rule must match the episode builder's close rule: a
    * gap-sessionizer with gap `g` only PROVES a session ended once `g` has
    * elapsed with no activity.)
    */
  def observedEnd(endUs: Column, edgeUs: Column, gapUs: Long): Column =
    endUs + lit(gapUs) <= edgeUs
}
