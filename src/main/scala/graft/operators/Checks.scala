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
}
