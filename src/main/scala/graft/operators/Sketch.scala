package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Mergeable uniform row sample: the k rows whose tag-keyed portable
    * hashes are globally smallest (bottom-k sampling — the sample twin of
    * the KMV distinct sketch, Bar-Yossef et al. 2002). Deterministic:
    * re-runs, task retries, and other engines select the IDENTICAL rows
    * (ties broken on id), unlike `TABLESAMPLE`/`rand()`. Mergeable:
    * `bottomK(A ∪ B) = trimK(bottomK(A) ∪ bottomK(B))` — per-day samples
    * union into a per-month sample without rescanning the raw data
    * (SketchSpec pins the identity).
    *
    * Scale shape: `orderBy(hash, id).limit(k)` plans DIRECTLY as
    * `TakeOrderedAndProject` — each task keeps a k-row heap and forwards
    * only its own bottom-k frontier; the merge sees ≤ numPartitions·k rows,
    * never the corpus, and no WindowExec ever runs (the earlier
    * `row_number <= k` formulation planned as a single-partition
    * WindowGroupLimit — same data movement, but an avoidable global-window
    * operator). SketchSpec pins the physical plan.
    */
  /** HyperLogLog distinct-count estimate per group (Flajolet et al. 2007)
    * — the canonical cardinality sketch beside the KMV one: `2^p`
    * registers, each the max leading-zero rank of the portable 60-bit
    * hash, merged with plain `max` (fully mergeable partial aggregates).
    * Deterministic END TO END: the hash is the portable md5 family, the
    * rank comes from the BINARY-STRING length (no float log), the
    * harmonic sum is carried as the EXACT integer `Σ 2^(50−M)` (dyadic
    * terms shifted onto a common 2⁵⁰ grid, BIGINT-summed —
    * order-independent; registers past 50 truncate to 0 identically on
    * both engines), and the one `ln` of the small-range linear-counting
    * correction is micro-snapped. Output: `(keyCols…, m, zeros,
    * est_micro)` with `est_micro = floor(10⁶·E)`:
    * `E = α_m·m²·2⁵⁰/S`, corrected to `m·ln(m/zeros)` when
    * `E ≤ 2.5·m` and zeros > 0.
    *
    * Scale shape: one hash-aggregate to `|groups|·2^p` register rows with
    * map-side `max` partials (the sketch property: shuffle carries
    * registers, not values), then a groups-scale finish.
    */
  def hllDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    require(keyCols.nonEmpty, "need at least one key column")
    val m = 1 << p
    val keys = keyCols.map(col)
    val h = graft.functions.HashFunctions.portableHash60(
      col(valueCol).cast("string"))
    val wBits = 60 - p
    val rows = df.select(keys :+ h.as("__h"): _*)
      .withColumn("__bucket", pmod(col("__h"), lit(m.toLong)))
      .withColumn("__w", expr(s"__h div $m"))
      .withColumn("__rho",
        when(col("__w") === 0L, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - length(expr("bin(__w)"))))
    val regs = rows.groupBy(keys :+ col("__bucket"): _*)
      .agg(max(col("__rho")).as("__M"))
    // every group carries ALL m registers (empty ones are rank 0)
    val full = df.select(keys: _*).distinct()
      .select(keys :+ explode(expr(
        s"sequence(CAST(0 AS BIGINT), CAST(${m - 1} AS BIGINT))"))
        .as("__bucket"): _*)
      .join(regs, keyCols :+ "__bucket", "left")
      .withColumn("__M", coalesce(col("__M"), lit(0)))
    val alpha = s"(CAST(0.7213 AS DOUBLE) / " +
      s"(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST($m AS DOUBLE)))"
    full.groupBy(keys: _*)
      .agg(
        sum(when(col("__M") <= 50, expr("shiftleft(1L, 50 - __M)"))
          .otherwise(0L)).as("__S"),
        sum(when(col("__M") === 0, 1L).otherwise(0L)).as("zeros"))
      .withColumn("__raw", expr(
        s"$alpha * CAST($m AS DOUBLE) * CAST($m AS DOUBLE) * " +
          s"CAST(${1L << 50} AS DOUBLE) / CAST(__S AS DOUBLE)"))
      .withColumn("est_micro",
        floor(lit(1e6) * when(
          col("__raw") <= lit(2.5 * m) && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) /
            col("zeros").cast("double")))
          .otherwise(col("__raw"))).cast("long"))
      .select(keys ++ Seq(lit(m.toLong).as("m"), col("zeros"),
        col("est_micro")): _*)
  }

  def bottomKSample(df: DataFrame, idCol: String, k: Int,
                    tag: String = "bottomk"): DataFrame = {
    require(k > 0, "k must be positive")
    df.withColumn("__bk",
        HashFunctions.portableHash60(
          concat(lit(tag + ":"), col(idCol).cast("string"))))
      .orderBy(col("__bk"), col(idCol))
      .limit(k)
      .drop("__bk")
  }

  /** Per-group [[bottomKSample]]: each group keeps its k hash-smallest rows
    * — deterministic stratified sampling where every stratum gets an EQUAL
    * row budget (vs [[graft.operators.Sampling.stratifiedSample]]'s
    * per-stratum RATES), the shape for "audit n examples from every source"
    * and per-stratum quantile sketches. The same merge rule holds per
    * group, so per-day per-group samples trim-union into per-month ones.
    *
    * Scale shape: one hash-partitioned shuffle on `groupCol`; the rank ≤ k
    * filter is detected by `InferWindowGroupLimit` and evaluated as a
    * Partial `WindowGroupLimit` BEFORE the exchange, so each task forwards
    * at most k rows per group it sees, never its whole input (spec-pinned).
    * Skew-safe for k·|groups| ≪ corpus; a single giant group still lands
    * on one reducer but only k rows survive the partial pass.
    */
  def bottomKSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
                            k: Int, tag: String = "bottomk"): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(
      HashFunctions.portableHash60(
        concat(lit(tag + ":"), col(idCol).cast("string"))),
      col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Quantile sketch over a [[bottomKSample]]: `quantile q` = the sample's
    * LOWER order statistic at zero-based rank `floor(q·(n−1))`, where
    * `n = min(k, |df|)` — pure integer indexing into the sorted sample, no
    * interpolation, so the answer is engine-replayable exactly (the reason
    * to prefer this over `approx_percentile`, whose GK sketch is
    * engine-private). Error: the rank of the reported value is within
    * O(n·√(1/k)) of the true rank w.h.p. — k=4096 lands every quantile
    * within ~1.5% of its true rank.
    *
    * Output: one row per requested q, `(q double, value)`. Null value on
    * empty input. The sample aggregate is k rows — driver-scale — and the
    * corpus is touched exactly once by the sampling window.
    */
  def sampleQuantiles(df: DataFrame, idCol: String, valueCol: String, k: Int,
                      qs: Seq[Double], tag: String = "bottomk"): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      "quantiles must be in [0, 1]")
    val sample = bottomKSample(df, idCol, k, tag)
      .agg(sort_array(collect_list(col(valueCol))).as("__vs"))
    sample.select(explode(array(qs.map { q =>
      val idx = (floor(lit(q) * (size(col("__vs")) - 1)) + 1).cast("int")
      struct(lit(q).as("q"),
        when(size(col("__vs")) > 0, element_at(col("__vs"), idx)).as("value"))
    }: _*)).as("__qv"))
      .select(col("__qv.q").as("q"), col("__qv.value").as("value"))
  }

  /** Pairwise multiset-operation estimates ACROSS KMV sketches (Beyer et
    * al. 2007, "On synopses for distinct-value estimation under multiset
    * operations", SIGMOD §5): given per-group k-min sketches
    * (`SketchFunctions.kmvMinHashes` arrays), estimate every pair's union
    * and intersection cardinality and Jaccard WITHOUT touching raw data —
    * the shard-overlap diagnostic ("how much does crawl snapshot A overlap
    * snapshot B") that at 100 TB must run on sketches, because the exact
    * answer re-scans both shards per pair.
    *
    * Estimators, all deterministic given the hash arrays: the pair's union
    * sketch `L = trimK(K_A ∪ K_B)` (the aggregator's own merge rule, so
    * union_est is EXACTLY what the one-shot union sketch would estimate);
    * `n_both = |L ∩ K_A ∩ K_B|`; `inter_est = n_both · union_est / |L|`;
    * `jaccard_micro = (10⁶·n_both) div |L|`. When `|K_A ∪ K_B| < k` both
    * sketches kept everything and the formulas degenerate to exact values.
    *
    * Scale shape: the sketch table is groups-scale (one k-long array per
    * group); the inequality self-join is an intentional broadcast
    * nest-loop over it — the corpus is never touched. Output:
    * `(key_a, key_b, n_a, n_b, n_both, union_est, inter_est,
    * jaccard_micro)`, key_a < key_b.
    */
  def kmvOverlap(sketches: DataFrame, keyCol: String, sketchCol: String,
                 k: Int): DataFrame = {
    require(k > 1, "k must be > 1")
    val a = sketches.select(col(keyCol).as("key_a"), col(sketchCol).as("__ska"))
    val b = sketches.select(col(keyCol).as("key_b"), col(sketchCol).as("__skb"))
    a.join(broadcast(b), col("key_a") < col("key_b"))
      .withColumn("__u",
        slice(array_sort(array_union(col("__ska"), col("__skb"))), 1, k))
      .withColumn("__usz", size(col("__u")))
      .withColumn("__nboth", size(array_intersect(col("__u"),
        array_intersect(col("__ska"), col("__skb")))))
      .withColumn("union_est",
        graft.functions.SketchFunctions.kmvEstimate(col("__u"), k))
      .select(col("key_a"), col("key_b"),
        size(col("__ska")).cast("long").as("n_a"),
        size(col("__skb")).cast("long").as("n_b"),
        col("__nboth").cast("long").as("n_both"),
        col("union_est"),
        (col("__nboth").cast("double") * col("union_est") /
          col("__usz").cast("double")).as("inter_est"),
        expr("(1000000L * __nboth) div __usz").as("jaccard_micro"))
  }
}
