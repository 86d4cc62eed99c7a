package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension maintenance — the versioned-upsert
  * write path behind the temporal-validity join (J3/q43 reads intervals;
  * this WRITES them): merge a point-in-time snapshot into a dimension
  * history table, closing changed/deleted versions at the snapshot time
  * and opening new ones, so every historical fact join stays answerable
  * (Kimball's SCD type 2).
  *
  * Scale shape: ONE hash shuffle — the full outer join of current (open)
  * versions against the snapshot on the business key; closed history
  * passes through untouched (union, no shuffle), and every branch of the
  * merge decision is a codegen'd projection over the joined row. At 100 TB
  * the dimension and snapshot co-partition on the key (bucketing), and the
  * pass-through history makes the cost proportional to |current| +
  * |snapshot|, never |history|.
  *
  * Determinism: pure column equality (null-safe `<=>` per attribute) and
  * literal timestamps — no floats, no clocks.
  */
object Scd2 {

  /** Snapshot DIFF report — the data-drift summary behind [[merge]]: one
    * row per metric comparing two keyed snapshots:
    * `('added', n)`, `('removed', n)`, `('changed', n)` (rows present in
    * both with ANY attribute differing), and `('changed:<attr>', n)` per
    * attribute — null-safe comparisons throughout. ONE full-outer hash
    * join + one aggregate; the per-metric explosion happens on the
    * aggregated counts, not the rows.
    */
  def diffSnapshots(before: DataFrame, after: DataFrame, idCol: String,
                    attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute column")
    val joined = before.alias("__a")
      .join(after.alias("__b"),
        col("__a." + idCol) === col("__b." + idCol), "full_outer")
    val anyChanged = attrCols
      .map(a => !(col("__a." + a) <=> col("__b." + a))).reduce(_ || _)
    val inBoth = col("__a." + idCol).isNotNull && col("__b." + idCol).isNotNull
    val aggs =
      sum(when(col("__a." + idCol).isNull, 1L).otherwise(0L)).as("added") +:
      sum(when(col("__b." + idCol).isNull, 1L).otherwise(0L)).as("removed") +:
      sum(when(inBoth && anyChanged, 1L).otherwise(0L)).as("changed") +:
      attrCols.map(a =>
        sum(when(inBoth && !(col("__a." + a) <=> col("__b." + a)), 1L)
          .otherwise(0L)).as("changed:" + a))
    val row = joined.agg(aggs.head, aggs.tail: _*)
    val metrics = Seq("added", "removed", "changed") ++
      attrCols.map("changed:" + _)
    row.select(explode(array(metrics.map(m =>
        struct(lit(m).as("metric"), col("`" + m + "`").as("n"))): _*))
        .as("__e"))
      .select(col("__e.metric").as("metric"), col("__e.n").as("n"))
  }

  /** Merge `snapshot` (the dimension's full state AT `asOf`) into the SCD2
    * history `dim`. Contract:
    *  - `dim` columns: `idCol`, `attrCols…`, `validFromCol`, `validToCol`
    *    (null = open/current); at most one open row per id.
    *  - `snapshot` columns: `idCol`, `attrCols…`.
    *  - unchanged open rows stay open; changed ones close at `asOf` and a
    *    new version opens at `asOf`; ids absent from the snapshot close at
    *    `asOf` (deletion); snapshot ids with no open row open at `asOf`
    *    (insert — including re-inserts of previously-closed ids).
    *  - closed history rows pass through verbatim.
    */
  def merge(dim: DataFrame, snapshot: DataFrame, idCol: String,
            attrCols: Seq[String], validFromCol: String, validToCol: String,
            asOf: Column): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute column")
    val history = dim.filter(col(validToCol).isNotNull)
    val current = dim.filter(col(validToCol).isNull)
    val snapCols = attrCols.map(a => col("__snap." + a).as("__n_" + a))
    val joined = current.alias("__cur")
      .join(snapshot.alias("__snap"),
        col("__cur." + idCol) === col("__snap." + idCol), "full_outer")
      .select(
        coalesce(col("__cur." + idCol), col("__snap." + idCol)).as(idCol) +:
          col("__cur." + validFromCol).as(validFromCol) +:
          col("__cur." + idCol).isNotNull.as("__inCur") +:
          col("__snap." + idCol).isNotNull.as("__inSnap") +:
          attrCols.map(a => col("__cur." + a)) ++: snapCols: _*)
      .withColumn("__same",
        attrCols.map(a => col(a) <=> col("__n_" + a)).reduce(_ && _))
    val stillOpen = joined.filter(col("__inCur") && col("__inSnap") &&
        col("__same"))
      .select(col(idCol) +: attrCols.map(col) :+
        col(validFromCol) :+ lit(null).cast("timestamp").as(validToCol): _*)
    val closed = joined.filter(col("__inCur") &&
        (!col("__inSnap") || !col("__same")))
      .select(col(idCol) +: attrCols.map(col) :+
        col(validFromCol) :+ asOf.cast("timestamp").as(validToCol): _*)
    val opened = joined.filter(col("__inSnap") &&
        (!col("__inCur") || !col("__same")))
      .select(col(idCol) +: attrCols.map(a => col("__n_" + a).as(a)) :+
        asOf.cast("timestamp").as(validFromCol) :+
        lit(null).cast("timestamp").as(validToCol): _*)
    history.select(col(idCol) +: attrCols.map(col) :+
        col(validFromCol) :+ col(validToCol): _*)
      .unionByName(stillOpen).unionByName(closed).unionByName(opened)
  }

  /** Point-in-time READ of a type-2 dimension — the query side of
    * [[merge]]: rows whose validity interval contains `ts`
    * (`valid_from <= ts < valid_to`, null `valid_to` = open). A plain
    * filter, so partition/file pruning on the validity columns applies
    * untouched; at most one row per id by the [[merge]] invariant.
    */
  def asOf(dim: DataFrame, validFromCol: String, validToCol: String,
           ts: Column): DataFrame =
    dim.filter(col(validFromCol) <= ts &&
      (col(validToCol).isNull || col(validToCol) > ts))
}
