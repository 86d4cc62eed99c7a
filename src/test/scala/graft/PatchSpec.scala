package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.pipelines.Patch

/** The is_position_in_patch composite against hand-walked pandas
  * semantics: slice resets, backward-inclusive padding, and evidence
  * persistence.
  */
class PatchSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  private def run(pos: Seq[(Long, Timestamp, Long, Long, Long)],
                  wheel: Seq[(Long, Timestamp, Long)]) =
    Patch.isPositionInPatch(
        pos.toDF("k", "ts", "tie", "x_c", "y_c"),
        wheel.toDF("k", "ts", "odo_c"),
        keys = Seq("k"), timeCol = "ts", posTieCol = "tie",
        xCentiCol = "x_c", yCentiCol = "y_c", wheelCentiCol = "odo_c",
        patchXCenti = 0L, patchYCenti = 0L, radiusCenti = 100L,
        wheelWindowUs = 10L * 1000000L, wheelMinCenti = 5L)
      .select(col("tie"), col("in_patch"), col("in_wheel"),
        col("patch_slice"), col("in_patch_active"))
      .as[(Long, Boolean, Boolean, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("evidence persists within a slice and resets on patch exit") {
    // wheel: jumps +10 at t=5 (moving for the 10s window), then a flat
    // sample at t=20 turns the flag off — flags evaluate AT wheel
    // timestamps and pad forward, exactly the pandas reindex semantics
    val wheel = Seq((1L, t(0), 0L), (1L, t(5), 10L), (1L, t(20), 10L),
      (1L, t(100), 10L))
    val pos = Seq(
      (1L, t(4), 0L, 0L, 0L),    // in patch, wheel not yet moved -> inactive
      (1L, t(6), 1L, 0L, 0L),    // in patch, wheel just moved -> ACTIVE
      (1L, t(30), 2L, 0L, 0L),   // wheel flag now false, SAME slice -> still
                                  // active (per-slice cumsum > 0 persists)
      (1L, t(40), 3L, 500L, 0L), // exits patch: slice increments here
      (1L, t(50), 4L, 0L, 0L))   // re-entry, new slice, no new wheel
                                  // evidence -> INACTIVE again
    val got = run(pos, wheel)
    assert(got(0L) === ((true, false, 0L, false)))
    assert(got(1L) === ((true, true, 0L, true)))
    assert(got(2L) === ((true, false, 0L, true)))
    assert(got(3L) === ((false, false, 1L, false)))
    assert(got(4L) === ((true, false, 1L, false)))
  }

  test("padding is backward-inclusive; pre-wheel positions never move") {
    val wheel = Seq((2L, t(10), 0L), (2L, t(12), 50L))
    val pos = Seq(
      (2L, t(5), 0L, 0L, 0L),  // before any wheel sample -> in_wheel false
      (2L, t(12), 1L, 0L, 0L), // EXACTLY at the moving sample -> inclusive
      (2L, t(13), 2L, 0L, 0L))
    val got = run(pos, wheel)
    assert(got(0L) === ((true, false, 0L, false)))
    assert(got(1L)._2 === true, "tie with the wheel sample is visible")
    assert(got(1L)._4 === true)
    assert(got(2L)._2 === true)
  }

  test("keys do not leak: each subject slices and pads independently") {
    val wheel = Seq((1L, t(0), 0L), (1L, t(1), 50L), (3L, t(0), 0L))
    val pos = Seq(
      (1L, t(2), 0L, 0L, 0L),  // subject 1: moving wheel -> active
      (3L, t(2), 1L, 0L, 0L))  // subject 3: flat wheel -> inactive
    val got = run(pos, wheel)
    assert(got(0L)._4 === true)
    assert(got(1L)._4 === false)
  }
}
