package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ/Great-
  * Expectations component of a data platform, re-expressed Spark-first):
  * a suite of constraints over a table produces a violations REPORT —
  * `(check, column, n_rows, n_violations, pass)` — instead of a hard
  * failure, so ingestion gates, SCD merges (q159), and snapshot diffs
  * (q168) can threshold on it.
  *
  * Scale shape is the whole point: every ROW-LEVEL constraint (not-null,
  * range, accepted values) compiles to one `sum(when(violation, 1))`
  * aggregate, and the suite fuses into a SINGLE scan of the table — k
  * checks cost one pass with map-side partials, never k passes
  * (spec-asserted: one scan node). Uniqueness adds one hash aggregate on
  * its key; referential integrity is one anti-join counted — each the
  * minimal shuffle its semantics force.
  */
object Checks {

  /** A row-level constraint: `violation` marks a failing row. */
  sealed trait RowCheck {
    def name: String
    def column: String
    private[operators] def violation: Column
  }

  /** Null is a violation. */
  final case class NotNull(column: String) extends RowCheck {
    val name = "not_null"
    private[operators] def violation: Column = col(column).isNull
  }

  /** Value outside `[lo, hi]` (or null) is a violation. */
  final case class InRange(column: String, lo: Long, hi: Long)
      extends RowCheck {
    val name = "in_range"
    private[operators] def violation: Column =
      col(column).isNull || col(column) < lo || col(column) > hi
  }

  /** Value outside the accepted set (or null) is a violation. */
  final case class Accepted(column: String, values: Seq[String])
      extends RowCheck {
    require(values.nonEmpty, "accepted-values set must be non-empty")
    val name = "accepted_values"
    private[operators] def violation: Column =
      col(column).isNull || !col(column).isin(values: _*)
  }

  private val ReportCols = Seq("check", "column", "n_rows", "n_violations")

  /** Row-level suite as ONE fused scan: one report row per check. */
  def report(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = count(lit(1)).cast("long").as("__n") +:
      checks.zipWithIndex.map { case (c, i) =>
        sum(when(c.violation, 1L).otherwise(0L)).cast("long").as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(checks.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("check"), lit(c.column).as("column"),
          col("__n").as("n_rows"),
          coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
      }: _*)).as("__r"))
      .select(col("__r.check"), col("__r.column"), col("__r.n_rows"),
        col("__r.n_violations"),
        (col("__r.n_violations") === 0L).as("pass"))
  }

  /** [[report]] grouped by `groupCol` — the same single fused scan, one
    * report row per (group, check). The incremental-drain building block:
    * row-level check counts are plain sums, so per-file rows accumulate
    * into exactly the one-shot report
    * ([[graft.streaming.StreamingChecks]]).
    */
  def reportBy(df: DataFrame, groupCol: String, checks: Seq[RowCheck])
      : DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = count(lit(1)).cast("long").as("__n") +:
      checks.zipWithIndex.map { case (c, i) =>
        sum(when(c.violation, 1L).otherwise(0L)).cast("long").as(s"__v$i")
      }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), explode(array(checks.zipWithIndex.map {
        case (c, i) =>
          struct(lit(c.name).as("check"), lit(c.column).as("column"),
            col("__n").as("n_rows"),
            coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
      }: _*)).as("__r"))
      .select(col(groupCol), col("__r.check"), col("__r.column"),
        col("__r.n_rows"), col("__r.n_violations"))
  }

  /** Uniqueness of `column`: violations = rows beyond the first of each
    * key (`n_rows − n_distinct`) — one hash aggregate, the shuffle the
    * semantics force. Nulls count as a key like any other.
    */
  def unique(df: DataFrame, column: String): DataFrame =
    df.groupBy(col(column)).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum("__c"), lit(0L)).cast("long").as("n_rows"),
        coalesce(sum(col("__c") - 1L), lit(0L)).cast("long")
          .as("n_violations"))
      .select(lit("unique").as("check"), lit(column).as("column"),
        col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))

  /** Referential integrity: every non-null `childCol` value must exist in
    * `parent.parentCol` — one left-anti join counted (broadcast when the
    * parent is dimension-sized, hash otherwise; Catalyst picks).
    */
  def refIntegrity(child: DataFrame, childCol: String,
                   parent: DataFrame, parentCol: String): DataFrame = {
    val orphans = child.select(col(childCol)).filter(col(childCol).isNotNull)
      .join(parent.select(col(parentCol).as(childCol)).distinct(),
        Seq(childCol), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"))
    child.agg(count(lit(1)).cast("long").as("n_rows"))
      .crossJoin(orphans)
      .select(lit("ref_integrity").as("check"),
        lit(childCol).as("column"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Union several report frames into one suite result (all report
    * producers share the schema). */
  def suite(reports: DataFrame*): DataFrame = {
    require(reports.nonEmpty, "need at least one report")
    reports.reduce(_ unionByName _)
  }

  /** Schema-driven COLUMN PROFILE — the catalog/discovery companion of
    * the constraint suite: for every column, `(column, dtype, n_rows,
    * n_nulls, n_distinct)` in ONE aggregation pass (the multi-
    * `countDistinct` plans as Spark's expand + partial-aggregate shape —
    * one scan, k-way expand; at 100 TB swap `countDistinct` for
    * `approx_count_distinct`/KMV per column if the expand dominates —
    * the profile's consumers tolerate estimates, its CONTRACT here is
    * exact so the oracle can replay it). Null counts as a distinct value
    * of its column in `n_distinct` (mirrors `count(DISTINCT x)` + null
    * presence: we report value-distincts and nulls separately).
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "profile needs at least one column")
    val dtypes = cols.map(c => c -> df.schema(c).dataType.simpleString).toMap
    val aggs = count(lit(1)).cast("long").as("__n") +:
      cols.zipWithIndex.flatMap { case (c, i) => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"__z$i"),
        countDistinct(col(c)).cast("long").as(s"__d$i"))
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.zipWithIndex.map { case (c, i) =>
        struct(lit(c).as("column"), lit(dtypes(c)).as("dtype"),
          col("__n").as("n_rows"),
          coalesce(col(s"__z$i"), lit(0L)).as("n_nulls"),
          coalesce(col(s"__d$i"), lit(0L)).as("n_distinct"))
      }: _*)).as("__r"))
      .select(col("__r.column"), col("__r.dtype"), col("__r.n_rows"),
        col("__r.n_nulls"), col("__r.n_distinct"))
  }

  /** Two-sample Kolmogorov–Smirnov DISTRIBUTION-drift statistic, exact:
    * the [[Scd2.diffSnapshots]] report says which rows changed; this says
    * whether a numeric column's DISTRIBUTION moved between a baseline and
    * a comparison sample (the screen every scoring/feature pipeline runs
    * between deploys). KS = sup_x |F1(x) − F2(x)| is a rational with
    * denominator n1·n2, so it is computed exactly in integers:
    *
    *   D·n1·n2 = max over distinct values v of |c1(v)·n2 − c2(v)·n1|
    *
    * with c_i(v) the cumulative sample counts — per-row products run in
    * DECIMAL(38,0) (n1·n2 wraps BIGINT past ~3·10⁹ rows per side) and the
    * emitted `ks_num`/`ks_den` snap to BIGINT with the loud range guard
    * (`StatsFunctions.snapLong`; at sample sizes where n1·n2 genuinely
    * exceeds Long, consume `ks_permille` — always in [0, 1000]).
    * Evaluated per DISTINCT value, after merging ties across both sides,
    * which is exactly where the ECDF steps — evaluating per raw row would
    * inflate the sup mid-tie.
    *
    * `valueCol` must be integral (float grids make "distinct value"
    * engine-dependent — floor to the grid you mean upstream, the
    * [[Survival.kmLifeTable]] rule). NULL values are EXCLUDED from both
    * samples before the ECDF (the statistic is over the value
    * distribution; engines disagree on where nulls sort, so including
    * them would break the replays-exactly contract — null-RATE drift is
    * [[binnedDrift]]'s bin −1). `sideCol` boolean: true = baseline.
    * Keys with an empty side are emitted with ks_* = 0 and flagged
    * `comparable = false` rather than dropped (a vanished side IS drift
    * signal, just not a KS number).
    *
    * Scale shape: one groupBy(keys, value) with map-side partials (the
    * shuffle carries distinct cells, not rows), two window passes over
    * the POST-aggregation table keyed on `keys` (cumulative + per-key
    * totals on the same partitioning — one exchange), one final argmax
    * aggregate per key.
    */
  def ksDrift(df: DataFrame, keys: Seq[String], valueCol: String,
              sideCol: String): DataFrame = {
    require(keys.nonEmpty,
      "Checks.ksDrift needs grouping keys (the ECDF window shuffles on " +
        "them); for one global pair of samples add a constant key column " +
        "so the single-partition choice is explicit at the call site")
    graft.functions.StatsFunctions.requireIntegralColumn(df.schema,
      valueCol, "ksDrift value")
    val g = keys.map(col)
    val cells = df
      .filter(col(valueCol).isNotNull)
      .groupBy((g :+ col(valueCol).cast("long").as("__v")): _*)
      .agg(sum(when(col(sideCol), 1L).otherwise(0L)).as("__k1"),
        sum(when(col(sideCol), 0L).otherwise(1L)).as("__k2"))
    ksFromCells(cells, keys)
  }

  /** KS statistic from pre-aggregated per-(keys, value) side counts —
    * the shared tail of [[ksDrift]] and the incremental drain
    * (`streaming/StreamingKsDrift`), whose persisted state IS this cell
    * table (mergeable by summing, like the quality-filter count shards).
    * `cells` columns: keys ++ (__v long, __k1, __k2); duplicate
    * (keys, __v) rows are merged by summing first, so sharded partials
    * feed in directly.
    */
  private[graft] def ksFromCells(cellsIn: DataFrame,
                                 keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.StatsFunctions.snapLong
    val g = keys.map(col)
    val cells = cellsIn
      .groupBy((g :+ col("__v")): _*)
      .agg(sum(col("__k1")).as("__k1"), sum(col("__k2")).as("__k2"))
    val byKey = Window.partitionBy(g: _*)
    val cum = byKey.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = cells
      .withColumn("__c1", sum(col("__k1")).over(cum))
      .withColumn("__c2", sum(col("__k2")).over(cum))
      .withColumn("__n1", sum(col("__k1")).over(byKey))
      .withColumn("__n2", sum(col("__k2")).over(byKey))
      .withColumn("__d", abs(
        col("__c1").cast("decimal(38,0)") * col("__n2") -
          col("__c2").cast("decimal(38,0)") * col("__n1")))
    stepped
      .groupBy(g: _*)
      .agg(max(col("__n1")).as("n1"), max(col("__n2")).as("n2"),
        max(col("__d")).as("__ksnum"))
      .withColumn("comparable", col("n1") > 0L && col("n2") > 0L)
      .select((g :+ col("n1") :+ col("n2") :+ col("comparable")
        :+ when(col("comparable"), snapLong(col("__ksnum")))
          .otherwise(0L).as("ks_num")
        :+ when(col("comparable"),
            snapLong(col("n1").cast("decimal(38,0)") * col("n2")))
          .otherwise(0L).as("ks_den")
        :+ when(col("comparable"), expr(
            """CAST((CAST(1000 AS DECIMAL(38,0)) * __ksnum)
              | div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"""
              .stripMargin))
          .otherwise(0L).as("ks_permille")): _*)
  }

  /** BINNED drift table — the PSI / characteristic-stability report
    * every scoring-pipeline monitor ships next to [[ksDrift]]'s sup
    * statistic: the baseline sample defines `nBins` quantile CUT VALUES
    * per key (the max value of each rank-bin but the last), then BOTH
    * sides re-bin by the same value rule `bin(v) = #cuts < v` — the
    * rank bins only derive the cuts, so ties spanning rank-bins cannot
    * make the two sides disagree about a value's bin. Nulls land in bin
    * −1 (a null-rate shift IS drift signal). Output per (keys, bin):
    * `(n_base, n_comp, base_permille, comp_permille)` — exact integer
    * counts and floor-div shares; PSI itself
    * (Σ (p−q)·ln(p/q)) is the presentation edge's one float.
    *
    * `valueCol` must be integral (the [[ksDrift]] grid rule). Scale
    * shape: one baseline rank window per key (the quantileBin pass), a
    * per-key cut ARRAY (≤ nBins−1 elements — catalog-sized rows, one per
    * key) equi-joined back, and one (keys, bin) count aggregate with
    * map-side partials plus a per-key total window over the bounded
    * post-aggregation table.
    */
  def binnedDrift(df: DataFrame, keys: Seq[String], valueCol: String,
                  sideCol: String, nBins: Int): DataFrame = {
    require(keys.nonEmpty, "binnedDrift needs grouping keys")
    require(nBins >= 2, "need at least 2 bins")
    graft.functions.StatsFunctions.requireIntegralColumn(df.schema,
      valueCol, "binnedDrift value")
    import org.apache.spark.sql.expressions.Window
    val g = keys.map(col)
    val binned = Features.quantileBin(df.filter(col(sideCol)), keys,
      valueCol, nBins, binCol = "__qb")
    val cuts = binned
      .filter(col("__qb").isNotNull && col("__qb") < (nBins - 1).toLong)
      .groupBy((g :+ col("__qb")): _*)
      .agg(max(col(valueCol).cast("long")).as("__cut"))
      .groupBy(g: _*)
      .agg(sort_array(collect_list(col("__cut"))).as("__cuts"))
    val assigned = df
      .select((g :+ col(valueCol).cast("long").as("__v") :+
        col(sideCol).cast("boolean").as("__side")): _*)
      .join(cuts, keys, "left")
      .withColumn("bin", when(col("__v").isNull, lit(-1L))
        .otherwise(coalesce(
          size(filter(col("__cuts"), c => c < col("__v"))).cast("long"),
          lit(0L))))
    val perBin = assigned
      .groupBy((g :+ col("bin")): _*)
      .agg(sum(when(col("__side"), 1L).otherwise(0L)).as("n_base"),
        sum(when(col("__side"), 0L).otherwise(1L)).as("n_comp"))
    binShares(perBin, keys)
  }

  /** [[binnedDrift]] from pre-aggregated per-(keys, value) side counts —
    * the SAME cell table [[ksFromCells]] consumes, so one persisted
    * drift state (`streaming/StreamingKsDrift`) serves both the KS sup
    * report and this PSI table. The quantileBin rank rule is replayed on
    * weighted cells exactly: rank() hands every tied row the FIRST rank,
    * so a value's bin is `((Σ baseline counts below it) · nBins) div n`
    * — one cumulative window over distinct values instead of a per-row
    * rank. Cells carry no nulls (the store excludes them — a null in an
    * idempotency key can never anti-join as a no-op), so this report has
    * no −1 bin; on null-free input it equals [[binnedDrift]] row-for-row
    * (pinned by spec).
    */
  def binnedDriftFromCells(cellsIn: DataFrame, keys: Seq[String],
                           nBins: Int): DataFrame = {
    require(keys.nonEmpty, "binnedDriftFromCells needs grouping keys")
    require(nBins >= 2, "need at least 2 bins")
    import org.apache.spark.sql.expressions.Window
    val g = keys.map(col)
    val cells = cellsIn
      .groupBy((g :+ col("__v")): _*)
      .agg(sum(col("__k1")).as("__k1"), sum(col("__k2")).as("__k2"))
    val byKey = Window.partitionBy(g: _*)
    val before = byKey.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells
      .withColumn("__n", sum(col("__k1")).over(byKey))
      .withColumn("__below", coalesce(sum(col("__k1")).over(before),
        lit(0L)))
      .withColumn("__qb", when(col("__k1") > 0L && col("__n") > 0L,
        expr(s"(__below * $nBins) div __n")))
    val cuts = ranked
      .filter(col("__qb").isNotNull && col("__qb") < (nBins - 1).toLong)
      .groupBy((g :+ col("__qb")): _*)
      .agg(max(col("__v")).as("__cut"))
      .groupBy(g: _*)
      .agg(sort_array(collect_list(col("__cut"))).as("__cuts"))
    val perBin = cells
      .join(cuts, keys, "left")
      .withColumn("bin", coalesce(
        size(filter(col("__cuts"), c => c < col("__v"))).cast("long"),
        lit(0L)))
      .groupBy((g :+ col("bin")): _*)
      .agg(sum(col("__k1")).as("n_base"), sum(col("__k2")).as("n_comp"))
    binShares(perBin, keys)
  }

  /** Shared tail: per-key totals → floor-div per-mille shares. */
  private def binShares(perBin: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = keys.map(col)
    val byKey = Window.partitionBy(g: _*)
    perBin
      .withColumn("__tb", sum(col("n_base")).over(byKey))
      .withColumn("__tc", sum(col("n_comp")).over(byKey))
      .select((g :+ col("bin") :+ col("n_base") :+ col("n_comp")
        :+ expr("(1000 * n_base) div greatest(__tb, 1)")
          .as("base_permille")
        :+ expr("(1000 * n_comp) div greatest(__tc, 1)")
          .as("comp_permille")): _*)
  }
}
