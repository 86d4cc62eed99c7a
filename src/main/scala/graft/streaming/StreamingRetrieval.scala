package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.TextFunctions
import graft.operators.Populate

/** Incremental BM25 index maintenance — the [[StreamingVocab.trainDrain]]
  * discipline applied to [[graft.operators.Retrieval.writeBm25Index]]'s
  * input state: newly-landed document files drain into a STAGING store of
  * per-doc posting rows plus per-file corpus stats, idempotently keyed on
  * the source file (a lost checkpoint replaying re-batched files can never
  * double-count); [[publish]] then rebuilds the bucket-partitioned probe
  * layout from the aggregate WITHOUT re-tokenizing the backlog. Posting
  * rows and stats are per-document/per-file quantities, so the staged
  * aggregate equals the one-shot index regardless of how the corpus
  * arrived (spec-pinned: drain in waves + publish ≡ writeBm25Index, probe
  * results identical).
  *
  * Staging layout: `<staging>/postings` = `(src_file, term, doc, tf, dl)`
  * keyed `(src_file, doc, term)`; `<staging>/stats` = `(src_file, n, tot)`
  * keyed `(src_file)` — stats ride separately because token-less docs
  * leave no posting rows but still count toward N and avgdl.
  */
object StreamingRetrieval {

  def indexDrain(spark: SparkSession, sourceDir: String, stagingDir: String,
                 checkpointDir: String, idCol: String, textCol: String,
                 schema: org.apache.spark.sql.types.StructType): Unit = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "64")
      .parquet(sourceDir)
      .withColumn("__src", col("_metadata.file_path"))
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val toks = batch.select(col("__src").as("src_file"),
          col(idCol).as("doc"),
          explode(filter(
            split(TextFunctions.normalizeForDedup(col(textCol)), " "),
            w => length(w) > 0)).as("term"))
        val tf = toks.groupBy("src_file", "doc", "term")
          .agg(count(lit(1)).as("tf"))
        val dl = tf.groupBy("src_file", "doc").agg(sum("tf").as("dl"))
        Populate.appendIdempotent(
          tf.join(dl, Seq("src_file", "doc"))
            .select("src_file", "term", "doc", "tf", "dl"),
          stagingDir + "/postings", Seq("src_file", "doc", "term"))
        Populate.appendIdempotent(
          batch.groupBy(col("__src").as("src_file"))
            .agg(count(lit(1)).as("n"))
            .join(dl.groupBy("src_file").agg(sum("dl").as("__t")),
              Seq("src_file"), "left")
            .select(col("src_file"), col("n"),
              coalesce(col("__t"), lit(0L)).as("tot")),
          stagingDir + "/stats", Seq("src_file"))
        ()
      }
      .start()
    query.awaitTermination()
  }

  /** Rebuild the [[graft.operators.Retrieval.bm25Probe]] layout from the
    * staged aggregate — tokenization was paid at drain time; this is pure
    * shuffle work over posting rows. The published layout is
    * byte-compatible with [[graft.operators.Retrieval.writeBm25Index]]'s
    * (postings partitioned by `pmod(xxhash64(term), nBuckets)`, df,
    * stats + bucket modulus), so the same probe serves both.
    */
  def publish(spark: SparkSession, stagingDir: String, indexDir: String,
              nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val staged = spark.read.parquet(stagingDir + "/postings")
    staged
      .select(col("term"), col("doc"), col("tf"), col("dl"),
        pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(indexDir + "/postings")
    staged.groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(indexDir + "/df")
    spark.read.parquet(stagingDir + "/stats")
      .agg(sum("n").as("n"), sum("tot").as("tot"))
      .withColumn("nbuckets", lit(nBuckets))
      .write.mode("overwrite").parquet(indexDir + "/stats")
  }
}
