package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{EventMatch, Populate}

/** Streaming/incremental twin of
  * [[graft.operators.EventMatch.propagateGlobalIds]] — the reference's
  * unit-matching populate IS incremental (`spike_sorting.py:1269-1299`:
  * `key_source` yields the seed block first, then the processing
  * frontier), so the drain mirrors it: block-stamped event files land in
  * waves; each drain walks the NEW blocks in ascending order, matches
  * every one against the PERSISTED trains of its predecessor block
  * (the corpus is never re-matched), and appends the block's
  * `(block, unit, global_unit)` assignment idempotently. Matched units
  * inherit the predecessor's global id; new units mint dense ids above
  * the persisted running maximum.
  *
  * Contract: blocks must land in order (a block's predecessor must
  * already be assigned when the block drains — the reference's
  * seed-first guard raises on gaps, and so does this drain). The drained
  * assignment table after any wave sequence equals the one-shot
  * [[EventMatch.propagateGlobalIds]] over the same blocks
  * (StreamingUnitMatchSpec + the q254 oracle, which is q253's closed
  * form verbatim).
  *
  * State per wave: the predecessor block's trains (one block, read back
  * with a block-pruned scan from the persisted train store) + the
  * assignment table (unit-catalog scale). Late/replayed blocks are
  * keyed no-ops: assignments append idempotently on `(block, unit)` and
  * train rows on `(block, unit, us)`.
  */
object StreamingUnitMatch {

  def drain(spark: SparkSession, sourceDir: String, trainsDir: String,
            assignmentsDir: String, checkpointDir: String,
            blockCol: String, unitCol: String, usCol: String,
            schema: org.apache.spark.sql.types.StructType,
            deltaUs: Long, minPermille: Long): Unit = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "64")
      .parquet(sourceDir)

    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import spark.implicits._
        val rows = batch.select(col(blockCol).cast("long").as("block"),
          col(unitCol).cast("long").as("unit"),
          col(usCol).cast("long").as("us")).localCheckpoint(true)
        // persist the wave's trains first, PARTITIONED by block (one
        // `block=N` subdir per block, written per wave block — the wave's
        // block set is catalog-sized): the predecessor read below opens
        // exactly one partition directory, so matching block k against
        // k−1 never lists or scans the other blocks' files — the pruning
        // a 100 TB train store needs, by path instead of row-group stats
        def blockDir(b: Long) = s"$trainsDir/block=$b"
        val waveBlocks = rows.select("block").distinct().as[Long]
          .collect().toSeq.sorted
        waveBlocks.foreach { b =>
          Populate.appendIdempotent(
            rows.filter(col("block") === b).select("unit", "us"),
            blockDir(b), Seq("unit", "us"))
        }
        val assigned0 = Populate.readIfExists(spark, assignmentsDir)
        val doneBlocks: Set[Long] = assigned0 match {
          case None => Set.empty
          case Some(a) => a.select("block").distinct().as[Long]
            .collect().toSet // block catalog — bounded driver state
        }
        val newBlocks = waveBlocks.toSet.diff(doneBlocks).toSeq.sorted
        newBlocks.foreach { blk =>
          val cur = spark.read.parquet(blockDir(blk)).select("unit", "us")
          val assignedNow = Populate.readIfExists(spark, assignmentsDir)
          val assignment = assignedNow match {
            case None =>
              // first assignment = the seed block (identity ids, like
              // propagateGlobalIds); newBlocks is sorted, so this is the
              // smallest block the stream has delivered — the landing
              // contract makes that the true seed
              cur.select(col("unit")).distinct()
                .select(lit(blk).as("block"), col("unit"),
                  col("unit").as("global_unit"))
            case Some(assigned) =>
              val prevBlk = blk - 1
              val prevAssigned = assigned
                .filter(col("block") === prevBlk)
                .select(col("unit").as("prev_unit"), col("global_unit"))
              require(prevAssigned.limit(1).count() > 0,
                s"block $blk drained before its predecessor $prevBlk was " +
                  "assigned — blocks must land in order (the reference's " +
                  "seed-first frontier guard)")
              val prev = spark.read.parquet(blockDir(prevBlk))
                .select("unit", "us")
              val matches = EventMatch.mutualBestMatch(
                EventMatch.agreementMatrix(cur, prev, "unit", "us", deltaUs),
                minPermille)
                .select(col("unit_a").as("unit"),
                  col("unit_b").as("prev_unit"))
              val inherited = matches
                .join(prevAssigned, Seq("prev_unit"))
                .select(col("unit"), col("global_unit"))
              val maxId = assigned.agg(max(col("global_unit"))).as[Long]
                .head() // one bounded driver long per block
              val fresh = graft.sources.Layout.assignDenseIds(
                  cur.select("unit").distinct()
                    .join(inherited.select("unit"), Seq("unit"), "left_anti"),
                  Seq("unit"), numRanges = 4)
                .select(col("unit"),
                  (col("row_id") + maxId + 1L).as("global_unit"))
              inherited.unionByName(fresh)
                .select(lit(blk).as("block"), col("unit"), col("global_unit"))
          }
          Populate.appendIdempotent(assignment, assignmentsDir,
            Seq("block", "unit"))
        }
        ()
      }
      .start()
    query.awaitTermination()
  }

  /** The drained assignment table, `(block, unit, global_unit)`. */
  def loadAssignments(spark: SparkSession, assignmentsDir: String): DataFrame =
    spark.read.parquet(assignmentsDir)
}
