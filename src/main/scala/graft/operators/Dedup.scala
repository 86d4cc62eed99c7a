package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication pack (driver brief: first-class alongside SURVEY.md §2).
  *
  * Exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup — each designed
  * for the 100 TB path:
  *  - exact dedup groups on an 8-byte fingerprint, not the document text;
  *  - MinHash candidates come from an equi-join on (band, band-hash) buckets,
  *    never an all-pairs comparison;
  *  - keep-first semantics use an explicit ordering column
  *    (SURVEY.md §7.5.2 — never `monotonically_increasing_id`).
  *
  * Reference analogue: `_dedupe(entries, key_fn)` keep-first
  * (`aeon/dj_pipeline/utils/load_metadata.py:37-46`) and
  * `skip_duplicates=True` inserts.
  */
object Dedup {

  /** Exact dedup, keep-first by `orderCol` within each normalized-text
    * fingerprint group. One shuffle on the 8-byte fingerprint.
    */
  def exactByText(docs: DataFrame, textCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(orderCol))
    docs.withColumn("__fp", TextFunctions.fingerprint64(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Keep-first dedup on explicit key columns (general form of `_dedupe`). */
  def keepFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** One row per (doc, shingle position): word n-grams built with window
    * `lead` over exploded words — every step (split, explode, lead, concat)
    * is codegen'd. The array-lambda alternative (`transform` + `slice` per
    * position) evaluates interpreted at O(words²) per doc and measured ~25 s
    * for 5000 small docs; this shape does the same work in well under a
    * second and scales out (one shuffle keyed by doc id).
    * Docs with fewer than n words yield no rows (no complete shingle).
    */
  private def shingleRows(docs: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame = {
    val words = docs.select(col(idCol),
      posexplode(split(TextFunctions.normalizeForDedup(col(textCol)), " "))
        .as(Seq("__pos", "__w")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val parts = col("__w") +: (1 until n).map(k => lead(col("__w"), k).over(w))
    words
      .select(col(idCol), col("__pos"), concat_ws(" ", parts: _*).as("__s"),
        parts.last.isNotNull.as("__complete"))
      .filter(col("__complete"))
      .drop("__complete")
  }

  /** MinHash signatures `(idCol, minhash: array<long>)`: for each of
    * `numHashes` seeded hash functions, the min over the document's shingle
    * set of `xxhash64(seed, shingle)`. Deterministic across executors.
    *
    * Shape matters at scale: shingles stream out of [[shingleRows]] and the
    * per-seed minima are plain `min` aggregates — fully codegen'd with
    * map-side partials, so the shuffle carries |docs| × numHashes longs,
    * never text. (Min over the shingle multiset equals min over the set, so
    * no distinct is needed.)
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, shingleN: Int = 3): DataFrame = {
    val aggs = (0 until numHashes).map(seed =>
      min(xxhash64(lit(seed), col("__s"))).as(s"__h$seed"))
    shingleRows(docs, idCol, textCol, shingleN)
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"__h$i")): _*).as("minhash"))
  }

  /** LSH banding: candidate near-dup pairs from documents sharing any
    * (band, hash-of-band-slice) bucket. `bands * rowsPerBand == numHashes`.
    * Returns distinct (id_a, id_b) candidate pairs with id_a < id_b.
    * Scale shape: explode to (doc, band, bucket) — |docs| × bands rows — then
    * a self equi-join on (band, bucket); no all-pairs anywhere.
    */
  def lshCandidates(docsWithSig: DataFrame, idCol: String,
                    bands: Int, rowsPerBand: Int): DataFrame = {
    val buckets = docsWithSig.select(
      col(idCol).as("__id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          slice(col("minhash"), b * rowsPerBand + 1, rowsPerBand)))
      }: _*)).as(Seq("band", "bucket")))
    val a = buckets.withColumnsRenamed(Map("__id" -> "id_a"))
    val b = buckets.withColumnsRenamed(Map("__id" -> "id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Winnowing fingerprints `(idCol, fingerprints: array<long>)` — the
    * rolling-hash document fingerprinting of Schleimer et al. (MOSS), the
    * standard overlap-detection primitive in training-data pipelines: hash
    * every k-shingle, slide a window of `windowSize` hashes, keep each
    * window's minimum. Guarantee: any shared run of ≥ windowSize + k − 1
    * tokens between two documents shares at least one fingerprint, so
    * containment (not just near-identity) is detectable via
    * `arrays_overlap`/`array_intersect` on the fingerprint sets.
    *
    * Same scale shape as the other signatures: shingle rows → codegen'd
    * hash → `min` over a row window → distinct per doc. The window
    * partitions by doc id — one keyed shuffle, no interpreted lambdas.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         shingleN: Int = 3, windowSize: Int = 4): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(0, windowSize - 1)
    shingleRows(docs, idCol, textCol, shingleN)
      .withColumn("__h", xxhash64(col("__s")))
      .withColumn("__winmin", min(col("__h")).over(w))
      .groupBy(col(idCol))
      .agg(array_sort(collect_set(col("__winmin"))).as("fingerprints"))
  }

  /** Estimated Jaccard from two MinHash signatures (fraction of agreeing
    * components).
    */
  def minhashJaccard(sigA: String, sigB: String): org.apache.spark.sql.Column =
    aggregate(zip_with(col(sigA), col(sigB), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(col(sigA))

  /** Shingle-set table `(idCol, shingles: array<string>)` — computed ONCE per
    * document. Candidate verification joins against this instead of raw text:
    * shingling is an interpreted higher-order expression, so evaluating it
    * per *pair* (2× per candidate) costs ~100× more than per *document*.
    */
  def withShingles(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame =
    shingleRows(docs, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(collect_set(col("__s")).as("shingles"))

  /** Exact Jaccard between two precomputed shingle-array columns (native
    * array_intersect/union — the cheap per-pair form).
    */
  def jaccard(shA: org.apache.spark.sql.Column,
              shB: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val inter = size(array_intersect(shA, shB)).cast("double")
    val union = size(array_union(shA, shB)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Exact n-gram Jaccard between two text columns. Convenience form for
    * one-off pairs — for candidate verification at scale use
    * [[withShingles]] + [[jaccard]] so shingles are computed per doc, not per
    * pair.
    */
  def ngramJaccard(textA: String, textB: String, n: Int = 3): org.apache.spark.sql.Column =
    jaccard(TextFunctions.shingles(col(textA), n), TextFunctions.shingles(col(textB), n))

  /** 64-bit SimHash fingerprints `(idCol, simhash: long)`: bit i of the
    * fingerprint is the sign of the sum over word tokens of
    * (bit i of xxhash64(token) ? +1 : -1). Near-dups have small Hamming
    * distance.
    *
    * Same scale shape as [[minhashSignatures]]: explode words once, hash with
    * the codegen'd xxhash64, take 64 `sum(when(...))` bit-votes in one hash
    * aggregate (map-side partials), then pack the sign bits. No interpreted
    * higher-order lambdas in the hot path.
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs
      .repartition(col(idCol))
      .select(col(idCol),
        explode(split(TextFunctions.normalizeForDedup(col(textCol)), " ")).as("__w"))
      .withColumn("__h", xxhash64(col("__w")))
    val votes = (0 until 64).map(i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        .as(s"__v$i"))
    val bits = (0 until 64).map(i =>
      when(col(s"__v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
    words.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), bits.reduce(_ + _).as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: String, b: String): org.apache.spark.sql.Column =
    bit_count(col(a).bitwiseXOR(col(b)))
}
