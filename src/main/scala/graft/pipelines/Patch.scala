package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** The reference's `is_position_in_patch` chain
  * (`aeon/dj_pipeline/tracking.py:305-324`) as ONE keyed composite: a
  * position is "actively in the patch" iff it lies within the patch
  * radius AND the foraging wheel has moved since the animal last LEFT the
  * patch. The pandas original is five idioms glued together — distance
  * threshold, `wheel.diff().rolling("1s").sum() > 1`,
  * `.reindex(position.index, method="pad")`, `exit_patch.cumsum()` time
  * slices, and a per-slice running `cumsum() > 0` — each of which this
  * repo implements standalone (q46, q22, q26, q25's boundary
  * sessionization, q21); this operator pins their COMPOSITION, where the
  * off-by-one bugs live.
  *
  * All-integer arithmetic on the centi grid: the radius gate is
  * `(x−px)² + (y−py)² < r²` (no sqrt), wheel movement is an exact
  * trailing range-frame sum of centi deltas, and the slice logic is
  * lag/cumsum — so any engine replays every boolean.
  *
  * Semantics pinned to the pandas original:
  *  - `exit` is true at the first row OUTSIDE after a row inside
  *    (`diff() < 0`), and the slice counter increments AT that row;
  *  - the wheel flag pads BACKWARD-INCLUSIVE onto position timestamps
  *    (`method="pad"`); positions before the first wheel sample get null
  *    → never moving;
  *  - the per-slice evidence `cumsum() > 0` is inclusive of the current
  *    row.
  *
  * Wheel rows must be unique per (keys, timestamp) — pre-aggregate ties
  * (the odometer has one value per instant); position ties order by
  * `posTieCol`.
  *
  * Scale shape: ONE key-partitioned sort serves the wheel lag + rolling
  * window; the pad-reindex is [[AsOfJoin.backward]] (keyed union
  * timeline, no join explosion); the slice/evidence windows ride the
  * position side's keyed sort. Nothing global, nothing per-row quadratic.
  *
  * Output: the position rows plus `(in_patch, in_wheel, patch_slice,
  * in_patch_active)`.
  */
object Patch {

  def isPositionInPatch(positions: DataFrame, wheel: DataFrame,
                        keys: Seq[String], timeCol: String,
                        posTieCol: String,
                        xCentiCol: String, yCentiCol: String,
                        wheelCentiCol: String,
                        patchXCenti: Long, patchYCenti: Long,
                        radiusCenti: Long,
                        wheelWindowUs: Long = 1000000L,
                        wheelMinCenti: Long = 100L): DataFrame = {
    require(keys.nonEmpty, "isPositionInPatch needs partitioning keys")
    require(radiusCenti > 0, "radius must be positive")
    val ks = keys.map(col)
    val us = unix_micros(col(timeCol))
    // wheel movement: diff + trailing range sum, one keyed sort
    val wOrd = Window.partitionBy(ks: _*).orderBy(col("__wus"))
    val wRange = Window.partitionBy(ks: _*).orderBy(col("__wus"))
      .rangeBetween(-wheelWindowUs, 0L)
    val wheelFlags = wheel
      .select(ks :+ us.as("__wus") :+
        col(wheelCentiCol).cast("long").as("__wd"): _*)
      .withColumn("__dd", col("__wd") - lag(col("__wd"), 1).over(wOrd))
      .withColumn("__mov",
        coalesce(sum(col("__dd")).over(wRange) > wheelMinCenti, lit(false)))
      .select(ks :+ col("__wus") :+ col("__mov"): _*)
    // pad-reindex the flag onto position timestamps (backward-inclusive)
    val pos = positions.withColumn("__pus", us)
    val padded = AsOfJoin.backward(pos, wheelFlags, "__pus", "__wus",
      keys, valueCols = Seq("__mov"))
    val pOrd = Window.partitionBy(ks: _*)
      .orderBy(col("__pus"), col(posTieCol))
    val pRun = pOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dx = col(xCentiCol).cast("long") - lit(patchXCenti)
    val dy = col(yCentiCol).cast("long") - lit(patchYCenti)
    val flagged = padded
      .withColumn("in_patch",
        dx * dx + dy * dy < lit(radiusCenti) * lit(radiusCenti))
      .withColumn("in_wheel", coalesce(col("__mov"), lit(false)))
      .withColumn("__exit",
        coalesce(lag(col("in_patch"), 1).over(pOrd), lit(false)) &&
          !col("in_patch"))
      .withColumn("patch_slice",
        sum(col("__exit").cast("long")).over(pRun))
    val sliceRun = Window.partitionBy(ks :+ col("patch_slice"): _*)
      .orderBy(col("__pus"), col(posTieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged
      .withColumn("in_patch_active",
        col("in_patch") &&
          sum(col("in_wheel").cast("long")).over(sliceRun) > 0)
      .drop("__exit", "__mov", "__pus", "__wus")
  }
}
