package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for heavy keys (the 100 TB discipline the brief calls out).
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; the two
  * cases it does NOT cover are handled here:
  *
  *  - [[saltedAggregate]]: a groupBy whose key distribution is pathological
  *    (one device/user holding a large fraction of all rows). Two-stage
  *    aggregation over a salted key: partial aggregate on (key, salt) spreads
  *    the hot key over `buckets` reducers, final aggregate merges the
  *    partials. Works for any algebraic aggregate (sum/count/min/max —
  *    supply both partial and merge forms).
  *  - [[saltedJoin]]: a broadcast-able skew pattern where the hot keys of a
  *    large×large join are isolated: rows with hot keys are joined salted
  *    (left side salted, right side replicated per salt), the cold remainder
  *    joins normally, results unioned. Keys are "hot" when listed in
  *    `hotKeys` (detected upstream via a cheap sampled count).
  */
object Skew {

  /** Deterministic per-row salt: hash of the NON-key columns (the key columns
    * are constant within a group, so they'd salt every row of the hot key
    * identically — useless). Content-derived, so a re-executed map task after
    * a shuffle-fetch failure assigns the same salt it did the first time;
    * `spark_partition_id()+monotonically_increasing_id()` would not
    * (row order after an upstream shuffle isn't stable across re-attempts —
    * the SPARK-23207 class of double-count/drop bugs on long 100 TB jobs).
    */
  private def saltOf(df: DataFrame, keys: Seq[String], buckets: Int): Column = {
    val nonKey = df.columns.filterNot(keys.contains).map(col).toSeq
    val basis = if (nonKey.nonEmpty) nonKey else keys.map(col)
    pmod(xxhash64(basis: _*), lit(buckets.toLong))
  }

  /** Two-stage salted aggregation.
    *
    * @param partials aggregate columns for stage 1 over (keys, salt)
    * @param merges   aggregate columns for stage 2 merging stage-1 outputs
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int)
                     (partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    require(buckets > 1, "buckets must exceed 1")
    val salted = df.withColumn("__salt", saltOf(df, keys, buckets))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Hot-key detection by sampled frequency: keys holding more than
    * `threshold` fraction of a `fraction` sample. Cheap scan over the sample;
    * returns the driver-side hot-key list (assumed small — that's what makes
    * them hot).
    */
  def detectHotKeys(df: DataFrame, key: String, fraction: Double = 0.01,
                    threshold: Double = 0.05): Seq[Any] = {
    val sample = df.sample(fraction).groupBy(col(key)).count()
    val total = sample.agg(sum(col("count"))).head().getLong(0).max(1L)
    sample.filter(col("count") > total * threshold)
      .select(col(key)).collect().map(_.get(0)).toSeq
  }

  /** Salted large×large equi-join on `key`: hot-key rows are salted on the
    * left and replicated `buckets`× on the right, so one hot key spreads over
    * `buckets` tasks instead of melting one. Cold keys join normally.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 hotKeys: Seq[Any], buckets: Int): DataFrame = {
    if (hotKeys.isEmpty) return left.join(right, key)
    val isHot = col(key).isin(hotKeys: _*)

    val coldJoined = left.filter(!isHot).join(right.filter(!isHot), key)

    val saltedLeft = left.filter(isHot)
      .withColumn("__salt", saltOf(left, Seq(key), buckets))
    val replicatedRight = right.filter(isHot)
      .withColumn("__salt", explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    val hotJoined = saltedLeft
      .join(replicatedRight, Seq(key, "__salt"))
      .drop("__salt")

    coldJoined.unionByName(hotJoined)
  }
}
