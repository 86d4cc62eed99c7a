package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Count-min sketch (Cormode & Muthukrishnan 2005): fixed-size frequency
  * summary answering point queries with one-sided error
  * (`estimate >= true count`, over by at most ~total/width per seed,
  * min over `depth` independent seeds).
  *
  * Scale shape: the sketch is `depth × width` counters REGARDLESS of input
  * size — build is one map-side-combined shuffle of (seed, bucket) partial
  * counts (the explode multiplies rows by `depth`, but the partial
  * aggregate collapses each partition to ≤ depth·width rows before the
  * exchange), merge across corpora/days is a union + sum, and lookups
  * broadcast the sketch (a few thousand rows) so probing never shuffles
  * the probe side by key. Hash family: the portable seeded md5 family
  * ([[HashFunctions.portableSeededHash]]) — one md5 per row for all seeds
  * (Kirsch–Mitzenmacher), and every counter is engine-replayable integer
  * arithmetic (the q118 DuckDB oracle rebuilds the sketch bit-for-bit).
  *
  * Vs the exact path: `groupBy(key).count` shuffles every distinct key;
  * at 100 TB with billions of keys (URLs, n-grams) the sketch answers
  * "is this key heavy" at O(depth·width) memory and zero key-shuffle.
  */
object Sketch {

  /** Per-seed bucket ids for a key: `array(h_i(key) mod width)` for
    * i in [0, depth). One md5 pair per key for the whole array (the seeded
    * family is two digest slices + integer steps; codegen CSE shares the
    * digest across seeds).
    */
  def cmBuckets(key: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && width >= 2, s"need depth>=1, width>=2; got ($depth, $width)")
    array((0 until depth).map(i =>
      pmod(HashFunctions.portableSeededHash(key, i), lit(width.toLong))): _*)
  }

  /** Build the sketch: (seed int, bucket bigint, cnt bigint), ≤ depth·width
    * rows. Weighted variant: pass `weight` to count token mass instead of
    * rows (e.g. per-domain token budgets).
    */
  def countMin(df: DataFrame, keyCol: String, depth: Int, width: Int,
               weight: Column = lit(1L)): DataFrame =
    df.select(posexplode(cmBuckets(col(keyCol), depth, width))
        .as(Seq("seed", "bucket")), weight.as("w"))
      .groupBy("seed", "bucket")
      .agg(sum(col("w")).as("cnt"))

  /** Point-query a sketch for each distinct key of `probes`: min over
    * seeds of the bucket counters (0 for never-seen keys). The sketch is
    * broadcast — the probe side is never shuffled by key.
    */
  def cmLookup(sketch: DataFrame, probes: DataFrame, keyCol: String,
               depth: Int, width: Int): DataFrame =
    probes
      .select(col(keyCol),
        posexplode(cmBuckets(col(keyCol), depth, width)).as(Seq("seed", "bucket")))
      .join(broadcast(sketch), Seq("seed", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))

  /** Keys whose estimated frequency is ≥ threshold. Candidate enumeration
    * here is the distinct keys of `df` itself (fine when the key domain is
    * queryable); at open-ended 100 TB key domains, feed `cmLookup` your own
    * candidate stream (per-partition top-k, external watchlist) instead —
    * the sketch answers any probe set without rescanning the corpus.
    */
  def heavyHitters(df: DataFrame, keyCol: String, depth: Int, width: Int,
                   threshold: Long): DataFrame = {
    val sketch = countMin(df, keyCol, depth, width)
    cmLookup(sketch, df.select(keyCol).distinct(), keyCol, depth, width)
      .filter(col("cm_est") >= threshold)
  }
}
