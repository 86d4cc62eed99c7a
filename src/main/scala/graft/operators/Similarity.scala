package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over embedding columns (driver brief).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline. The
  *    query side broadcasts (queries ≪ corpus), so the corpus is scanned once
  *    with no shuffle; top-k per query via window rank on the joined result.
  *  - `lshTopK`: the 100 TB path — both sides bucketed by random-hyperplane
  *    signatures (graft.functions.VectorFunctions.simhashBucket); candidates
  *    come from an equi-join on bucket id, exact cosine re-rank only within
  *    buckets. Recall tunes with nBits/nTables.
  */
object Similarity {

  /** Discover embedding dimensionality with one single-row lookup (the
    * hyperplane literals need it at plan time). */
  private def vecDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** Exact top-k nearest neighbors by cosine for each query vector.
    * Output: (queryIdCol, idCol, cosine) — k rows per query.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, queryIdCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(queryIdCol), col(vecCol).as("__qvec"))
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(q), col(idCol) =!= col(queryIdCol))
      .withColumn("cosine", VectorFunctions.cosine(col(vecCol), col("__qvec")))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cosine"))
  }

  /** LSH-bucketed approximate top-k: multi-table random-hyperplane bucketing;
    * candidates = bucket collisions in ANY table; exact cosine re-rank.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, queryIdCol: String,
              vecCol: String, k: Int,
              nBits: Int = 12, nTables: Int = 4): DataFrame = {
    val dim = vecDim(corpus, vecCol)
    def bucketed(df: DataFrame, id: String): DataFrame =
      df.select(col(id), col(vecCol),
        posexplode(array((0 until nTables).map(t =>
          VectorFunctions.simhashBucket(col(vecCol), nBits, seed = 42 + t, dim = dim)): _*))
          .as(Seq("__table", "__bucket")))

    val c = bucketed(corpus, idCol)
    val q = bucketed(queries, queryIdCol)
      .withColumnRenamed(vecCol, "__qvec")
    val candidates = c.join(q, Seq("__table", "__bucket"))
      .filter(col(idCol) =!= col(queryIdCol))
      .dropDuplicates(idCol, queryIdCol)
      .withColumn("cosine", VectorFunctions.cosine(col(vecCol), col("__qvec")))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))
    candidates.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cosine"))
  }

  /** IVF (inverted-file) approximate top-k — the second scale path beside
    * LSH: a coarse quantizer (MLlib KMeans, seeded) partitions the corpus
    * into `nCentroids` cells; each query probes its `nProbe` nearest cells
    * and re-ranks exactly within them. At 100 TB the corpus is written
    * partitioned by `centroid` so a probe reads nProbe/nCentroids of the
    * data (same partition-pruning discipline as the time chunks).
    *
    * Centroid assignment is pure codegen'd expressions (argmin over
    * `||c||² − 2·v·c` with literal centers via VecDot) — the model leaves
    * MLlib as a float matrix, exactly like the sync models leave regression
    * as a coefficient struct.
    *
    * Invariant (SimilaritySpec): nProbe == nCentroids degenerates to exact
    * brute force.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, queryIdCol: String,
              vecCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val train = corpus.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nCentroids).setSeed(42).setMaxIter(5)
      .fit(train)
    val centers: Array[Array[Float]] =
      model.clusterCenters.map(_.toArray.map(_.toFloat))

    // argmin_i ||v - c_i||² == argmin_i (||c_i||² - 2 v·c_i); struct array_min
    // compares lexicographically (score, then index) → deterministic ties.
    def cellScore(i: Int) = {
      val c = centers(i)
      val norm2 = c.map(x => x.toDouble * x).sum
      (lit(norm2) - lit(2.0) * VectorFunctions.dot(col(vecCol), typedlit(c.toSeq)))
        .as("s")
    }
    def scored = array((0 until nCentroids).map(i =>
      struct(cellScore(i), lit(i).as("i"))): _*)

    val assigned = corpus.select(col(idCol), col(vecCol),
      array_min(scored).getField("i").as("__cell"))
    val probes = queries.select(col(queryIdCol), col(vecCol).as("__qvec"),
      explode(transform(slice(sort_array(scored), 1, nProbe), s => s.getField("i")))
        .as("__cell"))

    val candidates = assigned.join(probes, Seq("__cell"))
      .filter(col(idCol) =!= col(queryIdCol))
      .withColumn("cosine", VectorFunctions.cosine(col(vecCol), col("__qvec")))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))
    candidates.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, via LSH buckets
    * (dedup-by-embedding; pairs with id_a < id_b).
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, nBits: Int = 12, nTables: Int = 4): DataFrame = {
    val dim = vecDim(corpus, vecCol)
    val b = corpus.select(col(idCol), col(vecCol),
      posexplode(array((0 until nTables).map(t =>
        VectorFunctions.simhashBucket(col(vecCol), nBits, seed = 42 + t, dim = dim)): _*))
        .as(Seq("__table", "__bucket")))
    val a = b.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      col("__table"), col("__bucket"))
    val c = b.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      col("__table"), col("__bucket"))
    a.join(c, Seq("__table", "__bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", VectorFunctions.cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
