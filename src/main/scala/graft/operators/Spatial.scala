package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed planar radius self-join — the 2D analog of
  * [[IntervalJoin.overlapBucketed]]'s 1D bucket decomposition: points land
  * in `radius`-sized cells, candidates are pairs whose cells are within
  * one step, verification is the exact integer squared distance. The
  * tracking-position neighbor query (animals within `r` of each other,
  * reference `aeon/analysis/` proximity passes) without an all-pairs
  * join.
  *
  * Scale shape: one map-only ×9 neighbor-cell explode on the RIGHT side
  * only — the left stays on its home cell, so every candidate pair meets
  * on EXACTLY one cell key (the [[Dedup.sortedNeighborhood]] trick lifted
  * to 2D: no dedup pass) — then one equi-join on the cell and a codegen'd
  * distance filter. Candidate volume is bounded by local density
  * (points-per-cell²·9), never by corpus².
  *
  * Coordinates are exact integer micros; cell ids use the
  * `(x − pmod(x, r)) div r` floor division, correct for negative
  * coordinates on every engine.
  */
object Spatial {

  /** Pairs of points within `radiusMicro` (inclusive, squared-distance
    * exact): `(id_a, id_b, dist2)` with `id_a < id_b`,
    * `dist2 = (xa−xb)² + (ya−yb)²` in micro². Inputs: `(idCol, xCol,
    * yCol)` with coordinates already snapped to integer micros.
    */
  def radiusSelfJoin(points: DataFrame, idCol: String, xCol: String,
                     yCol: String, radiusMicro: Long): DataFrame = {
    require(radiusMicro > 0, "radiusMicro must be positive")
    val r = radiusMicro
    def cell(c: String) = expr(s"($c - pmod($c, ${r}L)) div ${r}L")
    val base = points.select(col(idCol).cast("long").as("__id"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val left = base.select(col("__id").as("id_a"), col("__x").as("__xa"),
        col("__y").as("__ya"))
      .withColumn("__cx", cell("__xa")).withColumn("__cy", cell("__ya"))
    val offsets = typedlit(for { dx <- -1 to 1; dy <- -1 to 1 }
      yield (dx.toLong, dy.toLong))
    val right = base.select(col("__id").as("id_b"), col("__x").as("__xb"),
        col("__y").as("__yb"))
      .withColumn("__o", explode(offsets))
      .withColumn("__cx", cell("__xb") + col("__o._1"))
      .withColumn("__cy", cell("__yb") + col("__o._2"))
      .drop("__o")
    left.join(right, Seq("__cx", "__cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("__xa") - col("__xb")) * (col("__xa") - col("__xb")) +
          (col("__ya") - col("__yb")) * (col("__ya") - col("__yb")))
      .filter(col("dist2") <= lit(r) * lit(r))
      .select("id_a", "id_b", "dist2")
  }
}
