package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geometry (SURVEY.md §2.8): point-in-polygon nest membership.
  *
  * Reference: `matplotlib.path.Path.contains_points` over a vertex list
  * (`aeon/dj_pipeline/tracking.py:326-340`). Re-expressed as the standard
  * even-odd ray-casting rule, written entirely with higher-order array
  * functions over a vertex-array column — codegen-friendly, no UDF, and the
  * (tiny) polygon rides along as a broadcast literal or dimension column.
  */
object GeometryFunctions {

  /** Even-odd ray cast: true when (x, y) is inside the polygon given as an
    * array of (vx, vy) structs. Edge i connects vertex i to vertex (i+1) mod n.
    * Crossing test per edge: ((vy_i > y) != (vy_j > y)) &&
    * x < (vx_j - vx_i) * (y - vy_i) / (vy_j - vy_i) + vx_i.
    */
  def pointInPolygon(x: Column, y: Column, vertices: Column): Column = {
    val n = size(vertices)
    val crossings = aggregate(
      sequence(lit(0), n - 1),
      lit(0),
      (acc, i) => {
        val j = pmod(i + 1, n)
        val vi = element_at(vertices, i + 1)
        val vj = element_at(vertices, j + 1)
        val xi = vi.getField("x").cast("double")
        val yi = vi.getField("y").cast("double")
        val xj = vj.getField("x").cast("double")
        val yj = vj.getField("y").cast("double")
        val crosses = ((yi > y) =!= (yj > y)) &&
          (x < (xj - xi) * (y - yi) / (yj - yi) + xi)
        acc + when(crosses, 1).otherwise(0)
      })
    pmod(crossings, lit(2)) === 1
  }

  /** Euclidean distance to a fixed target (reference
    * `tracking.py:290-302` distance-to-patch).
    */
  def euclidean(x: Column, y: Column, tx: Column, ty: Column): Column =
    sqrt(pow(x - tx, 2) + pow(y - ty, 2))
}
