package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Dsir, Populate}

/** Streaming form of DSIR / perplexity scoring — newly-landed document
  * files stream in, each micro-batch is scored under PINNED model weights
  * and appended to a persisted scores table idempotently keyed on the doc
  * id. Unlike the dedup drains there is no cross-batch index to probe:
  * scoring is a pure per-document function, so the streamed result is
  * batch-split-invariant by construction (StreamingDsirSpec pins drained ≡
  * one-shot anyway, the twin discipline's point being to catch exactly
  * the "should be trivially equal" paths that aren't).
  *
  * The weight array is the score table's IDENTITY, same contract as the
  * semantic index's pinned centers: scores produced under different
  * weights are not comparable — retraining the model means rebuilding the
  * table. Keep the MERGEABLE count arrays ([[Dsir.trainNgramCounts]]) if
  * the model itself must also track the growing corpus; scores can then be
  * recomputed for a new model epoch by re-draining from scratch.
  *
  * Durability: checkpoint (which files were consumed) + idempotent keyed
  * append (which docs are scored) — either alone suffices; together,
  * reprocessing after checkpoint loss is rare AND harmless.
  */
object StreamingDsir {

  /** Drain newly-landed document files: append `(idCol, dsir_score,
    * n_feats, ce_micro)` for every unseen doc. `weights` are the
    * importance weights ([[Dsir.importanceWeights]]) and `targetModel` the
    * target-LM probabilities ([[Dsir.modelFromCounts]]); both must share
    * nBuckets. Returns once the backlog is drained (AvailableNow).
    */
  def drain(spark: SparkSession, sourceDir: String, scoresDir: String,
            checkpointDir: String, idCol: String, textCol: String,
            schema: org.apache.spark.sql.types.StructType,
            weights: Array[Long], targetModel: Array[Long]): Unit = {
    require(weights.length == targetModel.length,
      "weights and targetModel must share nBuckets")
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "64")
      .parquet(sourceDir)

    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val docs = batch.select(col(idCol), col(textCol))
        val scored = Dsir.scoreAndCrossEntropy(docs, idCol, textCol,
            weights, targetModel)
          .select(col(idCol), col("dsir_score"), col("n_feats"),
            col("ce_micro"))
        Populate.appendIdempotent(scored, scoresDir, Seq(idCol))
        ()
      }
      .start()
    query.awaitTermination()
  }
}
