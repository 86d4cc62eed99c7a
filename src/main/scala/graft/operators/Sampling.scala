package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Deterministic corpus sampling and sequence packing — the selection layer
  * of a training-data pipeline (what runs AFTER dedup/quality filtering and
  * BEFORE tokenized shards are written).
  *
  * All selection here is HASH-GATED, never `rand()`: the accept/reject
  * decision for a row is a pure function of its id, so (a) re-running the
  * job — or re-attempting a lost task — selects the identical corpus
  * (`rand()` breaks exactly-once under shuffle retry, the SPARK-23207
  * class designed out in [[Skew]]), and (b) an external system (or the
  * DuckDB oracle) can replay the selection bit-for-bit from the portable
  * md5-derived hash ([[HashFunctions.portableHash60]]).
  *
  * Scale shape: sampling is a pure per-row filter — no shuffle, pushes
  * behind any scan Catalyst can prune. Mixture rebalancing adds one
  * catalog-scale aggregate (rows = #strata) broadcast back onto the corpus.
  * Sequence packing windows per SHARD, so packing parallelism is the shard
  * count, never a global sort.
  */
object Sampling {

  /** 2^60 as a double — the hash-space width of [[HashFunctions.portableHash60]].
    * Exact in double (a power of two), so `rate * HashSpace` is a single
    * correctly-rounded IEEE multiply any engine reproduces.
    */
  val HashSpace: Double = (1L << 60).toDouble

  /** The per-row acceptance gate: accept iff
    * `portableHash60(tag || ':' || id) < rate * 2^60`. The `tag` keys the
    * draw, so independent sampling stages over the same corpus (e.g. a
    * validation split after a mixture pass) use independent hash draws.
    * The comparison is done in DOUBLE space — the hash (< 2^60) casts to
    * double with one half-even rounding, identical on every IEEE engine.
    */
  def acceptGate(id: Column, rate: Column, tag: String): Column =
    HashFunctions.portableHash60(concat(lit(tag + ":"), id.cast("string")))
      .cast("double") < rate * lit(HashSpace)

  /** Weighted sampling WITHOUT replacement: the k rows with the largest
    * `⌊10⁶·(ln w + Gumbel(hash(id)))⌋` keys — the Efraimidis–Spirakis
    * scheme in its Gumbel formulation, so inclusion probability tracks the
    * weight column (sample k docs ∝ quality score / token count; the
    * generic form of the DSIR draw, whose weight is the learned
    * exp(importance)). Deterministic and engine-replayable: the Gumbel
    * draw keys on the portable id hash and the key snaps to a micro grid
    * (one ln per row — same accepted 1-ulp-at-boundary class as the DSIR
    * weights), so re-runs, task retries, and the oracle select identical
    * rows. Rows with NULL or non-positive weight are excluded (no mass).
    *
    * Scale shape: a pure per-row key computation then
    * `orderBy(key).limit(k)` — TakeOrderedAndProject per-task frontiers,
    * no shuffle of the corpus, no window operator.
    */
  def weightedSampleK(df: DataFrame, idCol: String, weightCol: String,
                      k: Int, tag: String = "wsample"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (HashFunctions.portableHash60(
        concat(lit(tag + ":"), col(idCol).cast("string"))).cast("double") +
      lit(0.5)) / lit(HashSpace)
    val key = floor(lit(1e6) *
      (log(col(weightCol).cast("double")) + -log(-log(u)))).cast("long")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__wk", key)
      .orderBy(col("__wk").desc, col(idCol))
      .limit(k)
      .drop("__wk")
  }

  /** Per-group [[weightedSampleK]]: each group keeps its k largest
    * `⌊10⁶·(ln w + Gumbel(hash(id)))⌋` keys — "k docs per language,
    * weighted by quality/token mass", the stratified form of the E–S
    * draw (equal budgets per stratum like
    * [[graft.operators.Sketch.bottomKSamplePerGroup]], inclusion ∝
    * weight within each).
    *
    * Scale shape: one hash-partitioned shuffle on `groupCol`; the
    * rank ≤ k filter runs as a Partial WindowGroupLimit before the
    * exchange (≤ k rows per group leave each task, spec-pinned).
    */
  def weightedSampleKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                              weightCol: String, k: Int,
                              tag: String = "wsample"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (HashFunctions.portableHash60(
        concat(lit(tag + ":"), col(idCol).cast("string"))).cast("double") +
      lit(0.5)) / lit(HashSpace)
    val key = floor(lit(1e6) *
      (log(col(weightCol).cast("double")) + -log(-log(u)))).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__wk").desc, col(idCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__wk", key)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__wk", "__rk")
  }

  /** Stratified sampling with per-stratum rates: keep a row of stratum `s`
    * with probability `rates(s)` (else `defaultRate`), deterministically in
    * the row id. The LLM-pipeline use: DOWN-sample an over-represented
    * language/domain while keeping low-resource strata at full rate.
    *
    * No shuffle — the stratum→rate map becomes a codegen'd CASE chain.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       tag: String = "strat"): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(acceptGate(col(idCol), rate, tag))
  }

  /** EXACT-count stratified sampling: keep exactly `min(k, |stratum|)` rows
    * per stratum — the "exactly 1M docs per source" selection a rate gate
    * cannot promise (binomial spread) — chosen deterministically as the k
    * smallest tag-keyed hashes (ties on id). The same hash family as
    * [[acceptGate]], so exact-k and rate draws with different tags stay
    * independent, and a row's selection never depends on task layout or
    * retries.
    *
    * Scale shape: ONE shuffle (the per-stratum window rank). Rank-k within
    * a window sorts each stratum group; for k ≪ stratum size Spark's
    * rank-limit pushdown (WindowGroupLimit) keeps per-task state at the
    * top-k frontier rather than the full stratum sort.
    */
  def exactKPerStratum(df: DataFrame, strataCol: String, idCol: String,
                       k: Int, tag: String = "exactk"): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(HashFunctions.portableHash60(
        concat(lit(tag + ":"), col(idCol).cast("string"))), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Rebalance a corpus toward explicit target mixture WEIGHTS: given
    * `weights(s)` (relative target share of stratum `s`), keep stratum `s`
    * at rate `c·w_s/n_s` where `c = min_s(n_s/w_s)` — the largest scaling
    * for which no stratum needs up-sampling (all rates ≤ 1, the binding
    * stratum kept whole). This is the "data mixture" knob of an LLM
    * pipeline (e.g. cap web-crawl at 60%, keep code/books whole).
    *
    * Scale shape: one aggregate of #strata rows, window-min over that tiny
    * frame, broadcast-joined back onto the corpus; the corpus itself is
    * touched once by a pure filter. Rates are derived IN-PLAN (no driver
    * collect) and every arithmetic step is order-fixed IEEE double, so the
    * oracle replays the selection exactly.
    */
  def mixtureRebalance(df: DataFrame, strataCol: String, idCol: String,
                       weights: Map[String, Double],
                       tag: String = "mix",
                       sizeCol: Option[String] = None): DataFrame = {
    require(weights.values.forall(_ > 0), "mixture weights must be positive")
    val w = weights.foldLeft(lit(null).cast("double")) { case (acc, (s, wt)) =>
      when(col(strataCol) === s, lit(wt)).otherwise(acc)
    }
    // `sizeCol` switches the mixture unit from documents to that column's
    // sum (TOKENS in an LLM pipeline — targets like "≤60% web" are token
    // shares, and doc-count rebalancing skews when strata have different
    // doc lengths). The keep decision stays per-document, so the achieved
    // token share equals the target in expectation.
    val mass = sizeCol.fold(count(lit(1)).cast("double"))(c => sum(col(c)).cast("double"))
    val perStratum = df.groupBy(col(strataCol))
      .agg(mass.as("__n"))
      .withColumn("__w", w)
      .filter(col("__w").isNotNull) // strata without a weight are dropped
    // c = min_s(n_s/w_s) as a 1-row aggregate broadcast-crossed back onto
    // the #strata frame — same value as a global window-min, without the
    // single-partition WindowExec (harmless at #strata rows, a trap if a
    // caller ever passes a high-cardinality stratum column)
    val cMin = perStratum.agg(min(col("__n") / col("__w")).as("__c"))
    val counts = perStratum.crossJoin(broadcast(cMin))
      .withColumn("__rate", col("__c") * col("__w") / col("__n"))
      .select(col(strataCol), col("__rate"))
    df.join(broadcast(counts), strataCol)
      .filter(acceptGate(col(idCol), col("__rate"), tag))
      .drop("__rate")
  }

  /** TEMPERATURE mixture rebalance — the multilingual sampling knob
    * (mT5/XLM-R): target stratum shares ∝ n_s^α, flattening the natural
    * distribution toward uniform as α → 0 (α = 1 keeps it unchanged). With
    * no up-sampling (rates ≤ 1, smallest stratum kept whole) the keep rate
    * reduces to `rate_s = (n_min / n_s)^(1−α)`.
    *
    * Same scale shape as [[mixtureRebalance]]: one #strata-row aggregate,
    * 1-row min broadcast-crossed back, corpus touched once by a pure
    * hash-gate filter; `sizeCol` switches the unit to token mass.
    *
    * α = 0.5 (the most common setting) is computed as
    * `sqrt(n_min / n_s)` — division and square root are correctly-rounded
    * IEEE operations, so the selection replays EXACTLY in any engine
    * (oracle-checkable). Other α go through `pow`, whose last-ulp behavior
    * is the platform libm's — same selection in practice, but the exact
    * cross-engine guarantee is documented for α = 0.5 only.
    */
  def temperatureRebalance(df: DataFrame, strataCol: String, idCol: String,
                           alpha: Double, tag: String = "temp",
                           sizeCol: Option[String] = None): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val mass = sizeCol.fold(count(lit(1)).cast("double"))(c =>
      sum(col(c)).cast("double"))
    val perStratum = df.groupBy(col(strataCol)).agg(mass.as("__n"))
    val nMin = perStratum.agg(min(col("__n")).as("__m"))
    val ratio = col("__m") / col("__n")
    val rateExpr =
      if (alpha == 0.5) sqrt(ratio) else pow(ratio, lit(1.0 - alpha))
    val rates = perStratum.crossJoin(broadcast(nMin))
      .select(col(strataCol), rateExpr.as("__rate"))
    df.join(broadcast(rates), strataCol)
      .filter(acceptGate(col(idCol), col("__rate"), tag))
      .drop("__rate")
  }

  /** Balanced OUTPUT sharding: assign each document (ordered by `orderCol`)
    * a shard index so every shard holds ~`targetTokensPerShard` tokens —
    * the data-loader-facing export step (N roughly-equal-token training
    * shards) that [[sequencePack]] packs WITHIN. A doc belongs to the shard
    * its token START offset falls in (straddlers stay whole, like
    * sequencePack's boundary semantics). Adds `token_start` and `shard`.
    *
    * Scale shape — the distributed prefix sum, NOT a global window (a
    * `Window.partitionBy()` cumsum would drag the corpus through one
    * partition, the exact trap mixtureRebalance's scaladoc documents):
    *  1. ONE driver `approxQuantile` over `orderCol` picks ~`nRanges`
    *     bucket boundaries, embedded as LITERALS — so a row's bucket is a
    *     pure function of its own `orderCol` value, identical in every
    *     pass and on every retry. (Deliberately NOT
    *     `spark_partition_id()` over `repartitionByRange`: Spark's range
    *     partitioner seeds its boundary sampling with the RDD id, so two
    *     executions of the same plan can draw DIFFERENT boundaries — the
    *     totals would describe partitions the window never sees. The
    *     boundaries here only need to exist, not reproduce: once
    *     collected they are literals.)
    *  2. per-bucket token totals — a #buckets-row aggregate — are
    *     prefix-summed on the DRIVER (catalog-scale: one long per bucket)
    *     and embedded as each bucket's base offset;
    *  3. one window WITHIN each bucket adds the local cumsum to the base.
    * Parallelism = #buckets throughout; bucket skew is bounded by the
    * quantile sketch accuracy. `df` is executed three times (quantile,
    * totals, result) — persist it first if its lineage is expensive.
    * `orderCol` must be numeric (quantile boundaries), unique, and
    * non-null.
    */
  def shardByTokens(df: DataFrame, orderCol: String, tokensCol: String,
                    targetTokensPerShard: Long, nRanges: Int = 0): DataFrame = {
    require(targetTokensPerShard > 0, "targetTokensPerShard must be positive")
    val spark = df.sparkSession
    val ranges =
      if (nRanges > 0) nRanges
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val bounds: Array[Double] =
      if (ranges <= 1) Array.empty
      else df.stat.approxQuantile(orderCol,
        (1 until ranges).map(_.toDouble / ranges).toArray, 0.001)
        .distinct.sorted
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(orderCol) > lit(b), 1).otherwise(0)
    }
    val withB = df.withColumn("__bk", bucket)
    val sums = withB.groupBy(col("__bk"))
      .agg(sum(col(tokensCol).cast("long")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nBuckets = bounds.length + 1
    val offsets = new Array[Long](nBuckets)
    var acc = 0L
    (0 until nBuckets).foreach { b => offsets(b) = acc; acc += sums.getOrElse(b, 0L) }
    val offsetCol = element_at(typedlit(offsets.toSeq), col("__bk") + 1)
    val w = Window.partitionBy(col("__bk")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .withColumn("token_start",
        (offsetCol + sum(col(tokensCol).cast("long")).over(w) -
          col(tokensCol).cast("long")).cast("long"))
      .withColumn("shard", floor(col("token_start") / targetTokensPerShard))
      .drop("__bk")
  }

  /** Materialize token shards as BYTES — the step after [[shardByTokens]]
    * assigns indices: one flat little-endian u16 file per shard at
    * `dir/shard-<k>.bin`, documents laid end-to-end in `orderCol` order.
    * This is the data-loader-facing artifact of the pipeline (the `.bin`
    * token stream a training job memory-maps), and it is written in the
    * engine's OWN flat-binary dialect: a read back through
    * `format("graft-clock").option("format","u16").option("channels","1")`
    * yields `(file, row_index, samples)` where `row_index` is the token's
    * offset within its shard — the loader's addressing scheme for free.
    *
    * Scale shape: ONE shuffle keyed on the shard, docs sorted by `orderCol`
    * within partitions; each task streams its shards' tokens through a
    * forward-only Hadoop FS stream (memory = one document's id array, same
    * discipline as the AVI/WAV export sinks). Task retries rewrite their
    * shard files from scratch (`create(overwrite)`) — the content is a pure
    * function of the shard's rows, so convergence is byte-identical.
    *
    * Token ids must fit u16 (0..65535) — the point of the format; out-of-
    * range or null ids fail loudly rather than truncating silently.
    */
  def exportTokenShards(df: DataFrame, shardCol: String, orderCol: String,
                        tokenIdsCol: String, dir: String): Unit = {
    val conf = new graft.sources.SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    // widen INTEGRAL id arrays (array<int> etc. would otherwise die with a
    // bare ClassCastException inside the task loop) — but only integral
    // ones: a blanket cast would silently TRUNCATE array<double> ids (1.7
    // -> 1), the exact corruption class the contract forbids
    import org.apache.spark.sql.types.{ArrayType, ByteType, IntegerType, LongType, ShortType}
    df.schema(df.schema.fieldIndex(tokenIdsCol)).dataType match {
      case ArrayType(et, _) if et == ByteType || et == ShortType ||
        et == IntegerType || et == LongType => ()
      case other => throw new IllegalArgumentException(
        s"exportTokenShards needs an integral-element array id column; " +
          s"'$tokenIdsCol' is ${other.simpleString}")
    }
    df.select(col(shardCol).cast("long").as("__shard"),
        col(orderCol).cast("long").as("__ord"),
        col(tokenIdsCol).cast("array<long>").as("__toks"))
      .repartition(col("__shard"))
      .sortWithinPartitions("__shard", "__ord")
      .foreachPartition { rows: Iterator[Row] =>
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf.value)
        var cur = Long.MinValue
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        def closeCurrent(): Unit = if (out != null) { out.close(); out = null }
        try {
          rows.foreach { r =>
            require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
              "shard, order, and token-id columns must not be null")
            val shard = r.getLong(0)
            if (shard != cur) {
              closeCurrent()
              cur = shard
              require(shard >= 0, s"shard index $shard is negative")
              out = fs.create(
                new org.apache.hadoop.fs.Path(dir, s"shard-$shard.bin"), true)
            }
            // elements come out boxed: a null ELEMENT would silently unbox
            // to 0L under getSeq[Long] — the exact truncation the contract
            // forbids — so null-check before unboxing
            val toks = r.getSeq[Any](2)
            val buf = ByteBuffer.allocate(toks.length * 2)
              .order(ByteOrder.LITTLE_ENDIAN)
            toks.foreach { boxed =>
              require(boxed != null,
                "null token id inside the id array — ids must be dense")
              val t = boxed.asInstanceOf[Long]
              require(t >= 0 && t < 65536,
                s"token id $t does not fit u16 — rehash into a 0..65535 vocab")
              buf.putShort(t.toShort)
            }
            out.write(buf.array())
          }
          closeCurrent()
        } finally closeCurrent() // failure path: release the FS handle
      }
  }

  /** Sequence packing: lay documents end-to-end in token space within each
    * SHARD (ordered by `orderCol`) and chunk the concatenated stream into
    * fixed `seqLen`-token training sequences. Emits for each document its
    * first sequence (`seq_id`), offset within it (`seq_offset`), and how
    * many sequences it spans (`n_seqs`) — the contiguous-chunking semantics
    * of standard LLM pretraining packing (documents straddle sequence
    * boundaries; nothing is dropped).
    *
    * Scale shape: ONE window per shard — packing parallelism is the shard
    * count and no global order exists. At 100 TB the shard column is the
    * file/partition the tokenizer writes, exactly how packing is sharded in
    * production pipelines.
    */
  def sequencePack(df: DataFrame, shardCol: String, orderCol: String,
                   tokensCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0)
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = (sum(col(tokensCol)).over(w) - col(tokensCol)).cast("long")
    df.withColumn("__start", start)
      .withColumn("seq_id", floor(col("__start") / seqLen))
      .withColumn("seq_offset", col("__start") % seqLen)
      .withColumn("n_seqs",
        floor((col("__start") + greatest(col(tokensCol).cast("long"), lit(1L)) -
          1L) / seqLen) - col("seq_id") + 1L)
      .drop("__start")
  }

  /** Overlapping token-window CHUNKS of each document — the long-document
    * splitting stage (RAG retrieval units, context-window-bounded training
    * examples), the inverse direction of [[sequencePack]] (packing
    * concatenates short docs into fixed windows; chunking splits long docs
    * into them). Tokens are the [[graft.functions.TextFunctions.tokenCount]]
    * whitespace universe; chunk i starts at token `i·(maxTokens−overlap)`
    * and takes up to `maxTokens` tokens; a tail window whose tokens are all
    * covered by the previous chunk is NOT emitted (it would add no new
    * content). Output: `(idCol, chunk_id, chunk_text, n_tokens)` —
    * `chunk_id` dense from 0 per document; empty/whitespace docs emit
    * nothing.
    *
    * Scale shape: pure map-only Column algebra (split → start-sequence →
    * posexplode → slice) — chunking a 100 TB corpus is ZERO shuffles; the
    * per-doc start list is `⌈n/step⌉` elements, never materialized beyond
    * the row.
    */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    require(overlap >= 0 && overlap < maxTokens,
      "overlap must be in [0, maxTokens)")
    val step = maxTokens - overlap
    docs
      .select(col(idCol),
        filter(split(trim(col(textCol)), "\\s+"), w => length(w) > 0)
          .as("__ws"))
      .withColumn("__n", size(col("__ws")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__ws"), col("__n"),
        posexplode(filter(sequence(lit(0), col("__n") - 1, lit(step)),
          s => s === 0 || s - lit(step) + lit(maxTokens) < col("__n")))
          .as(Seq("chunk_id", "__s")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("__ws"), col("__s") + 1, lit(maxTokens)), " ")
          .as("chunk_text"),
        least(lit(maxTokens), col("__n") - col("__s")).cast("long")
          .as("n_tokens"))
  }
}
