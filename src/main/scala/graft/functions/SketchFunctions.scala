package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column surface for the portable sketches (KMV distinct-count; the
  * count-min sketch lives in `graft.operators.Sketch` — it is a DataFrame
  * shape, not a column).
  *
  * Both sketches are built on the portable md5 family
  * ([[HashFunctions.portableHash60]] / [[HashFunctions.portableSeededHash]]),
  * so their state and estimates replay bit-for-bit in any engine with
  * `md5()` — the DuckDB oracles reproduce them exactly (q117/q118), unlike
  * `approx_count_distinct`'s engine-private HLL bytes.
  */
object SketchFunctions {

  /** 2⁶⁰ as an exact double — the hash-space size the KMV estimator scales
    * by. 2⁶⁰ is a power of two, so the double is exact. */
  private val HashSpace: Double = 1152921504606846976.0d

  /** KMV sketch aggregate: the k smallest DISTINCT values of an
    * already-hashed long column, ascending (`array<bigint>`, O(k) state,
    * mergeable — see graft.expressions.KmvMinHashes). Feed it
    * [[HashFunctions.portableHash60]] of the tracked value; merge sketches
    * by exploding and re-aggregating with the same k.
    */
  def kmvMinHashes(hashed: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.KmvMinHashes(
        org.apache.spark.sql.GraftColumnBridge.eagerExpression(hashed), k)
        .toAggregateExpression())

  /** Distinct-count estimate from a KMV sketch: exact size when the sketch
    * saw fewer than k distinct values, else `(k-1)·2⁶⁰ / kth_min` — the
    * standard KMV estimator (Bar-Yossef et al. 2002). Plain column
    * arithmetic so the float path is visible and engine-replayable: both
    * factors of the numerator are exact doubles and the division is one
    * IEEE op, identical in any binary64 engine.
    */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
        element_at(sketch, k).cast("double"))
}
