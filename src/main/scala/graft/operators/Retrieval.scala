package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sparse lexical retrieval over the `documents` corpus: Okapi BM25 top-k
  * (Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework"),
  * TF-IDF keyword extraction, and exact phrase search — the lexical half a
  * training-data pipeline needs next to the embedding ANN family
  * (dense retrieval lives in [[Similarity]]; reciprocal-rank fusion of the
  * two is [[Retrieval.hybridRrf]]).
  *
  * Scale shape: ONE tokenize pass over the corpus (explode + codegen'd
  * normalize — the Dedup discipline), then everything narrows immediately:
  * the query-term SET broadcasts (KBs), so the posting aggregate only
  * carries (term ∈ queries) × doc rows — the distributed analogue of
  * walking exactly the query terms' posting lists, never a full-corpus
  * term × doc matrix. Document length and corpus stats are partial
  * aggregates; the per-(query, doc) score sum shuffles candidate rows
  * only. Top-k is a per-query window over candidates — |queries| is
  * catalog-scale, so the rank partition never concentrates the corpus.
  *
  * Determinism across engines (the DSIR micro-grid discipline): IDF is
  * snapped to an integer micro-grid straight off `ln` — the ONE libm call
  * — so the residual hazard is a last-ulp landing exactly on a grid
  * boundary (~10⁻⁹ per distinct term; everything downstream is exact-input
  * IEEE arithmetic, floored per (doc, term), then summed as BIGINTs —
  * order-independent.
  */
object Retrieval {

  private def tokens(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol).as("__doc"),
      explode(filter(
        split(TextFunctions.normalizeForDedup(col(textCol)), " "),
        w => length(w) > 0)).as("__t"))

  /** BM25 top-`k` per query: `(query_id, rank, doc_id, score_micro)`.
    *
    * `score_micro = Σ_t floor(idf_micro(t) · tf·(k1+1) / (tf + k1·(1−b +
    * b·dl/avgdl)))` over the query's DISTINCT terms, with
    * `idf_micro = floor(10⁶·ln(1 + (N − df + ½)/(df + ½)))` — the
    * always-positive Lucene form. Candidates are docs sharing ≥ 1 term
    * with the query; ranks tie-break on `doc_id`.
    *
    * `k1`/`b` default to the standard 1.2/0.75. NB an oracle must replay
    * the floating-point expressions with the SAME literals and
    * associativity (and cast decimal literals to DOUBLE — engines that
    * read bare decimals as exact DECIMAL diverge in the last ulp).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, queryIdCol: String, queryTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = tokens(docs, idCol, textCol)
    // ONE rollup aggregate yields every per-doc length AND the corpus
    // token total (the null-group row) in a single shuffle — never a
    // corpus-wide docs ⋈ dl join, and the exchange is reused between the
    // two consumers. N counts ALL docs (token-less included) off the
    // column-pruned id scan.
    val dlAll = toks.rollup("__doc").agg(count(lit(1)).as("__dl"))
    val dl = dlAll.filter(col("__doc").isNotNull)
    val stats = docs.select(col(idCol)).agg(count(lit(1)).as("__n"))
      .crossJoin(dlAll.filter(col("__doc").isNull)
        .select(col("__dl").as("__tot")))
      .withColumn("__avgdl",
        col("__tot").cast("double") / col("__n").cast("double"))
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(filter(
        split(TextFunctions.normalizeForDedup(col(queryTextCol)), " "),
        w => length(w) > 0))).as("__t"))
    val termSet = qterms.select("__t").distinct()
    // posting restriction: only query terms survive the corpus explode
    val tf = toks.join(broadcast(termSet), Seq("__t"))
      .groupBy("__t", "__doc").agg(count(lit(1)).as("__tf"))
    val idf = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(stats.select("__n", "__avgdl")))
      .withColumn("__idf_micro",
        floor(lit(1e6) * log(lit(1.0) +
          ((col("__n") - col("__df")).cast("double") + lit(0.5)) /
            (col("__df").cast("double") + lit(0.5)))).cast("long"))
      .select("__t", "__idf_micro", "__avgdl")
    val contrib = tf
      .join(broadcast(idf), Seq("__t"))
      .join(dl, Seq("__doc"))
      .withColumn("__contrib",
        floor(col("__idf_micro").cast("double") *
          (col("__tf").cast("double") * (lit(k1) + lit(1.0))) /
          (col("__tf").cast("double") + lit(k1) *
            (lit(1.0) - lit(b) +
              lit(b) * col("__dl").cast("double") / col("__avgdl"))))
          .cast("long"))
      .select("__t", "__doc", "__contrib")
    val scores = qterms.join(contrib, Seq("__t"))
      .groupBy("query_id", "__doc")
      .agg(sum("__contrib").as("score_micro"))
    scores
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_micro").desc, col("__doc"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("__doc").as("doc_id"),
        col("score_micro"))
  }

  /** Materialize the BM25 index as a PHYSICAL layout — the 100 TB shape
    * (the [[Similarity.writeIvfIndex]] discipline): [[bm25TopK]] re-scans
    * and re-tokenizes the corpus once per consumer of each shared
    * intermediate (tf, dl — Spark's exchange reuse does not survive the
    * divergent prunings), which is the right tool ad hoc; an index you
    * probe repeatedly pays tokenization ONCE at write time. Layout:
    *
    *   - `postings/` — `(term, doc, tf, dl)` parquet partitioned by
    *     `bucket = pmod(xxhash64(term), nBuckets)`: a probe reads only its
    *     query terms' buckets via partition pruning, with the term
    *     equality pushed into the row-group scan — the distributed
    *     analogue of seeking the query terms' posting lists.
    *   - `df/` — `(term, df)` (vocabulary-scale).
    *   - `stats/` — one row `(n, tot)` over the WHOLE corpus, so probes
    *     never touch the documents table.
    *
    * Like the IVF centers, the index is rebuilt to re-shard (`nBuckets` is
    * baked into the layout).
    */
  def writeBm25Index(docs: DataFrame, path: String, idCol: String,
                     textCol: String, nBuckets: Int = 64,
                     checkpointer: Dedup.Checkpointer = Dedup.Checkpointer.Local)
      : Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val toks = tokens(docs, idCol, textCol)
    // cut the shared intermediates even at build time: tfAll feeds the
    // postings join AND df; dl feeds the join AND the stats total —
    // uncut, the corpus tokenize runs once per consumer
    val tfAll = checkpointer.cut(
      toks.groupBy("__doc", "__t").agg(count(lit(1)).as("tf")))
    val dl = checkpointer.cut(
      tfAll.groupBy("__doc").agg(sum("tf").as("dl")))
    tfAll.join(dl, Seq("__doc"))
      .select(col("__t").as("term"), col("__doc").as("doc"), col("tf"),
        col("dl"),
        pmod(xxhash64(col("__t")), lit(nBuckets.toLong)).as("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(path + "/postings")
    tfAll.groupBy("__t").agg(count(lit(1)).as("df"))
      .select(col("__t").as("term"), col("df"))
      .write.mode("overwrite").parquet(path + "/df")
    docs.select(col(idCol)).agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(sum("dl").as("tot")))
      .withColumn("nbuckets", lit(nBuckets))
      .write.mode("overwrite").parquet(path + "/stats")
  }

  /** BM25 top-`k` over a [[writeBm25Index]] layout — identical output
    * contract and micro-grid arithmetic as [[bm25TopK]] (spec-pinned
    * equal), but the plan reads ONLY the query terms' posting buckets:
    * partition pruning on `bucket`, term-equality row-group pushdown, idf
    * from the vocabulary table, corpus stats from the one-row `stats/` —
    * zero scans of the documents table, one narrow candidate shuffle plus
    * the per-query rank.
    */
  def bm25Probe(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                queries: DataFrame, queryIdCol: String, queryTextCol: String,
                k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(filter(
        split(TextFunctions.normalizeForDedup(col(queryTextCol)), " "),
        w => length(w) > 0))).as("__t"))
    // resolve the terms' bucket ids with the ENGINE's own hash (a 1-task
    // job over the catalog-scale term set — never a JVM twin of xxhash64)
    val terms = qterms.select(col("__t").as("term")).distinct()
    val resolved = terms.select(col("term"),
      pmod(xxhash64(col("term")), lit(bucketCount(spark, indexPath).toLong))
        .as("bucket")).collect()
    val termLits = resolved.map(_.getString(0)).toSeq
    val bucketLits = resolved.map(_.getLong(1)).distinct.toSeq
    val postings = spark.read.parquet(indexPath + "/postings")
      .filter(col("bucket").isin(bucketLits: _*) &&
        col("term").isin(termLits: _*))
    val stats = spark.read.parquet(indexPath + "/stats")
      .withColumn("__avgdl",
        col("tot").cast("double") / col("n").cast("double"))
    val idf = spark.read.parquet(indexPath + "/df")
      .filter(col("term").isin(termLits: _*))
      .crossJoin(broadcast(stats))
      .withColumn("__idf_micro",
        floor(lit(1e6) * log(lit(1.0) +
          ((col("n") - col("df")).cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5)))).cast("long"))
      .select("term", "__idf_micro", "__avgdl")
    val contrib = postings
      .join(broadcast(idf), Seq("term"))
      .withColumn("__contrib",
        floor(col("__idf_micro").cast("double") *
          (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0) - lit(b) +
              lit(b) * col("dl").cast("double") / col("__avgdl"))))
          .cast("long"))
      .select(col("term").as("__t"), col("doc"), col("__contrib"))
    qterms.join(contrib, Seq("__t"))
      .groupBy("query_id", "doc")
      .agg(sum("__contrib").as("score_micro"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_micro").desc, col("doc"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc").as("doc_id"),
        col("score_micro"))
  }

  /** The bucket modulus a [[writeBm25Index]] layout was written with —
    * recorded IN the layout (`stats/nbuckets`): recovering it from the
    * partition directories under-counts whenever the top buckets happen
    * to capture no terms, silently hashing probe terms under the wrong
    * modulus (the StreamingDsir nBuckets lesson — a layout must carry its
    * own sharding identity).
    */
  private def bucketCount(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String): Int =
    spark.read.parquet(indexPath + "/stats")
      .select("nbuckets").head().getInt(0)

  /** Top-`n` TF-IDF keywords per document: `(doc_id, rank, term,
    * tfidf_micro)` with `tfidf_micro = floor(tf · floor(10⁶·ln(N/df)))` —
    * integer tf times the micro-snapped IDF, ties on the term string.
    * Stopword-ish terms (df = N) score exactly 0 and still rank (the
    * floor of ln(1) is 0) — callers wanting them gone filter on
    * `tfidf_micro > 0`.
    *
    * One tokenize pass; df is a full-vocabulary aggregate (vocabulary
    * plateaus on natural text); the per-doc rank window partitions by
    * doc — millions of small groups, no concentration.
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    n: Int,
                    checkpointer: Dedup.Checkpointer = Dedup.Checkpointer.Local)
      : DataFrame = {
    require(n > 0, "n must be positive")
    val toks = tokens(docs, idCol, textCol)
    // cut: tf feeds BOTH the vocabulary df aggregate and the score join —
    // uncut, the corpus tokenize runs once per consumer
    val tf = checkpointer.cut(
      toks.groupBy("__doc", "__t").agg(count(lit(1)).as("__tf")))
    val df = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    val nDocs = docs.select(col(idCol)).agg(count(lit(1)).as("__n"))
    val idf = df.crossJoin(broadcast(nDocs))
      .withColumn("__idf_micro",
        floor(lit(1e6) * log(
          col("__n").cast("double") / col("__df").cast("double")))
          .cast("long"))
      .select("__t", "__idf_micro")
    tf.join(idf, Seq("__t"))
      .withColumn("tfidf_micro", col("__tf") * col("__idf_micro"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("__doc")
          .orderBy(col("tfidf_micro").desc, col("__t"))).cast("long"))
      .filter(col("rank") <= n)
      .select(col("__doc").as("doc_id"), col("rank"), col("__t").as("term"),
        col("tfidf_micro"))
  }

  /** Reciprocal-rank fusion (Cormack & Clarke 2009) of N ranked lists:
    * `(query_id, rank, doc_id, rrf_score)` — top-`k` per query by
    * `rrf_score = Σ_lists (10⁹ div (c + rank_list))`, a PURE-INTEGER
    * reciprocal (BIGINT division, no floats anywhere), 0 for lists that
    * missed the doc; ties on `doc_id`. The standard c = 60.
    *
    * Each input is `(queryIdCol, docIdCol, rankCol)`. Fusion is one
    * union + hash aggregate on (query, doc) — candidate-scale, the lists
    * are already top-k'd — and a per-query rank window.
    */
  def hybridRrf(rankings: Seq[DataFrame], queryIdCol: String,
                docIdCol: String, rankCol: String, k: Int,
                c: Long = 60L): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k > 0, "k must be positive")
    val contribs = rankings.map(r =>
      r.select(col(queryIdCol).as("query_id"), col(docIdCol).as("doc_id"),
        expr(s"CAST(1000000000 AS BIGINT) div " +
          s"(CAST($c AS BIGINT) + CAST($rankCol AS BIGINT))").as("__rr")))
      .reduce(_ unionByName _)
    contribs
      .groupBy("query_id", "doc_id")
      .agg(sum("__rr").as("rrf_score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("rrf_score").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_score"))
  }

  /** Exact phrase search via a POSITIONAL posting join: `(query_id,
    * doc_id, n_matches)` — the number of positions where the phrase's
    * words occur consecutively in the normalized token stream (docs with
    * zero matches are absent).
    *
    * Scale shape: the corpus explodes to (term, doc, position) ONCE with
    * the phrase's term set broadcast-filtered first — only positions of
    * words that appear in some phrase survive, the positional-index
    * analogue of bm25's posting restriction. Each phrase then equi-joins
    * its i-th word's postings on (doc, position − i): an m-way hash join
    * on compact keys, never a scan of the text column per phrase. A naive
    * `contains()` over the corpus re-reads every byte per query; this
    * reads the pruned index — the reason inverted indexes exist.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrases: DataFrame, queryIdCol: String,
                   phraseCol: String): DataFrame = {
    val pwords = phrases.select(col(queryIdCol).as("query_id"),
      posexplode(filter(
        split(TextFunctions.normalizeForDedup(col(phraseCol)), " "),
        w => length(w) > 0)).as(Seq("__i", "__t")))
    val termSet = pwords.select("__t").distinct()
    val postings = docs.select(col(idCol).as("__doc"),
      posexplode(filter(
        split(TextFunctions.normalizeForDedup(col(textCol)), " "),
        w => length(w) > 0)).as(Seq("__p", "__t")))
      .join(broadcast(termSet), Seq("__t"))
    // anchor = phrase word 0 at position p; word i must sit at p + i. An
    // anchor survives iff EVERY further word's posting exists: left-join
    // each (anchor × phrase-word) pair against the positional postings and
    // require hit-count == word-count per anchor.
    val anchors = pwords.filter(col("__i") === 0)
      .join(postings, Seq("__t"))
      .select(col("query_id"), col("__doc"), col("__p"))
    val rest = pwords.filter(col("__i") > 0)
    anchors
      .join(rest, Seq("query_id"), "left")
      .join(postings.select(col("__t").as("__t2"), col("__doc").as("__d2"),
          col("__p").as("__p2")),
        col("__t2") === col("__t") && col("__d2") === col("__doc") &&
          col("__p2") === col("__p") + col("__i"), "left")
      .groupBy("query_id", "__doc", "__p")
      .agg(sum(when(col("__i").isNull, 0)
        .otherwise(when(col("__t2").isNotNull, 1).otherwise(0))).as("__hit"),
        sum(when(col("__i").isNull, 0).otherwise(1)).as("__need"))
      .filter(col("__hit") === col("__need"))
      .groupBy("query_id", "__doc")
      .agg(count(lit(1)).as("n_matches"))
      .select(col("query_id"), col("__doc").as("doc_id"), col("n_matches"))
  }
}
