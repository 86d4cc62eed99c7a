package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `Array[Float]` columns (similarity-search pack,
  * driver brief). Pure higher-order-function expressions (`zip_with` /
  * `aggregate`) — no UDF, so the dot products run inside codegen over the
  * columnar parquet batches.
  */
object VectorFunctions {

  /** Dot product of two array columns (cast to double for accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity in [-1, 1]; null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dot(a, b) / denom)
  }

  /** Random-hyperplane LSH bucket id: sign bits of `nBits` deterministic
    * pseudo-random hyperplanes, packed into a long. Vectors with high cosine
    * similarity collide with high probability — the bucketing key for
    * ANN at scale (join/aggregate per bucket instead of all-pairs).
    *
    * Hyperplane i, component j uses a hash of (seed, i, j) mapped to [-1, 1) —
    * deterministic across executors with no broadcast needed.
    */
  def simhashBucket(vec: Column, nBits: Int = 16, seed: Int = 42): Column = {
    val bits = (0 until nBits).map { i =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (v, j) => {
          val h = pmod(hash(lit(seed), lit(i), j), lit(1000000))
          v.cast("double") * (h.cast("double") / lit(500000.0) - lit(1.0))
        }),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
