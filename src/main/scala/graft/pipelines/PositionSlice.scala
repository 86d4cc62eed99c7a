package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Position time-range slice — the reference's `_get_position` read path
  * (`aeon/dj_pipeline/tracking.py:343-396`; SURVEY.md §3.3): silver rows hold
  * per-chunk ARRAY columns (`timestamps`, `x`, `y`, `likelihood`); a slice
  * [start, end) selects covering chunks (partition pruning), explodes the
  * zipped arrays, applies a scale factor, and masks to the exact range.
  *
  * Includes the widening fallback (SURVEY.md §7.5.5, reference
  * `acquisition.py:642-661`): when an endpoint falls inside no chunk (gap in
  * acquisition), the nearest chunk is still included, so a query that starts
  * mid-gap returns the data around it instead of silently nothing.
  */
object PositionSlice {

  /** Chunk-level restriction with widening fallback. `chunks` must carry
    * `chunk_start`/`chunk_end` timestamps. Returns the restricted chunk rows.
    */
  def restrictChunks(chunks: DataFrame, start: String, end: String): DataFrame = {
    val s = lit(start).cast("timestamp")
    val e = lit(end).cast("timestamp")
    // Chunks overlapping [s, e) directly:
    val overlapping = chunks.filter(col("chunk_end") > s && col("chunk_start") < e)
    // Widening fallback: if no chunk contains s (resp. e), include the
    // nearest chunk before/after the endpoint. Cheap: chunk catalog is tiny
    // relative to data; two scalar aggregations over the pruned catalog.
    val nearestBefore = chunks.filter(col("chunk_start") <= s)
      .orderBy(col("chunk_start").desc).limit(1)
    val nearestAfter = chunks.filter(col("chunk_end") >= e)
      .orderBy(col("chunk_end").asc).limit(1)
    overlapping.unionByName(nearestBefore).unionByName(nearestAfter)
      .dropDuplicates("chunk_start")
  }

  /** Keyed [[restrictChunks]]: the same widening restriction applied
    * independently per stream key (camera/device/subject) — the multi-stream
    * rig shape, where each stream has its own acquisition gaps. Nearest
    * before/after come from one `row_number` window per key instead of the
    * single-stream global `limit(1)`, so the fallback shuffles on the key
    * and never collapses the catalog to one partition.
    */
  def restrictChunksPerKey(chunks: DataFrame, start: String, end: String,
                           keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty,
      "restrictChunksPerKey needs stream keys; for a single-stream catalog " +
        "call restrictChunks")
    val s = lit(start).cast("timestamp")
    val e = lit(end).cast("timestamp")
    val overlapping = chunks.filter(col("chunk_end") > s && col("chunk_start") < e)
    val nearestBefore = chunks.filter(col("chunk_start") <= s)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(col("chunk_start").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val nearestAfter = chunks.filter(col("chunk_end") >= e)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(col("chunk_end").asc)))
      .filter(col("__rn") === 1).drop("__rn")
    overlapping.unionByName(nearestBefore).unionByName(nearestAfter)
      .dropDuplicates(keys :+ "chunk_start")
  }

  /** Explode per-chunk position arrays into one row per sample, scale, and
    * mask to the exact [start, end) range (steps 3–5 of §3.3).
    * Array columns are zipped positionally — `arrays_zip` + one `explode`,
    * never a driver loop.
    */
  def explodeSlice(chunkRows: DataFrame, start: String, end: String,
                   scaleFactor: Double = 1.0,
                   arrayCols: Seq[String] = Seq("timestamps", "x", "y", "likelihood"),
                   keyCols: Seq[String] = Seq("identity")): DataFrame = {
    val s = lit(start).cast("timestamp")
    val e = lit(end).cast("timestamp")
    val zipped = chunkRows.withColumn("__z",
      explode(arrays_zip(arrayCols.map(col): _*)))
    val timeCol = col(s"__z.${arrayCols.head}")
    val valueCols = arrayCols.tail.map(c =>
      (col(s"__z.$c") * lit(scaleFactor)).as(c))
    zipped
      .select((keyCols.map(col) :+ timeCol.as("time")) ++ valueCols: _*)
      .filter(col("time") >= s && col("time") < e)
      .orderBy(keyCols.map(col) :+ col("time"): _*)
  }
}
