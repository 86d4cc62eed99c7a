package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TimeFunctions
import graft.operators.IntervalJoin

/** Ephys-chain relational semantics (SURVEY.md §3.1/§3.3 fourth lifecycle,
  * `aeon/dj_pipeline/spike_sorting.py`): the sorting itself (Kilosort) is an
  * external black box; these are the operators around it.
  */
object Ephys {

  /** Spike→chunk ownership (`spike_sorting.py:1519-1560`): a sorted block's
    * spike sample indices are assigned to the acquisition chunk that owns
    * them, where chunk n owns samples `[cum_offset_n, cum_offset_{n+1})` and
    * cum_offset is the running sum of per-chunk sample counts (W2 cumsum +
    * as-of containment, not 1:1 — chunks straddle, SURVEY.md §7.5.4).
    *
    * @param chunks (chunkKeys..., sample_count) rows in chunk order given by
    *               `orderCol`
    * @param spikes rows with a `sample_index` column (block-relative)
    * @return spikes with their owning chunk's key columns appended
    */
  def assignSpikeOwners(spikes: DataFrame, chunks: DataFrame,
                        orderCol: String, chunkKeys: Seq[String],
                        blockKeys: Seq[String] = Seq.empty): DataFrame = {
    // Empty blockKeys is safe HERE, unlike the operator-level window
    // fallbacks (AsOfJoin/Sessionize require keys): the global window runs
    // over the chunk CATALOG, not the spike stream, and the catalog must
    // already fit the broadcast join below — catalog-scale input by
    // contract, so the single partition holds KBs either way. The spike
    // side never enters a window.
    val w = (if (blockKeys.nonEmpty) Window.partitionBy(blockKeys.map(col): _*)
             else Window.partitionBy())
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOffsets = chunks
      .withColumn("own_start", coalesce(sum(col("sample_count")).over(w), lit(0L)))
      .withColumn("own_end", col("own_start") + col("sample_count"))
    // chunk catalogs are small relative to spikes → broadcast containment
    // join; spikes never shuffle.
    val cond = (col("sample_index") >= col("own_start")) &&
      (col("sample_index") < col("own_end")) &&
      blockKeys.map(k => spikes(k) === withOffsets(k)).foldLeft(lit(true))(_ && _)
    spikes.join(broadcast(withOffsets), cond)
      .select((spikes.columns.toIndexedSeq.map(spikes(_)) ++
        chunkKeys.map(withOffsets(_)) :+ col("own_start")): _*)
  }

  /** ONIX→HARP spike-time synchronization (J9/J4/A8 composed:
    * `spike_sorting.py:1124-1166` `indices2syncedtimes`,
    * `ephys_utils.py:645-683` `resolve_harp`): locate the sync window whose
    * observed ONIX bounds cover each spike's clock value, then apply that
    * window's regression as a pure column expression. Sync models broadcast
    * (one row per (probe, hour)); 1↔N straddling handled by the interval
    * join, not assumed away.
    *
    * @param spikes     rows with an `onix_clock` column
    * @param syncModels rows with `onix_start`, `onix_end`, `slope`,
    *                   `intercept` (+ join keys shared with spikes)
    */
  def syncSpikeTimes(spikes: DataFrame, syncModels: DataFrame,
                     keys: Seq[String] = Seq.empty): DataFrame = {
    // Closed upper bound: onix_end is an observed clock sample, and the
    // reference fast-paths a spike exactly at the last sync sample
    // (ephys.py:625 BETWEEN, spike_sorting.py:1156 `<= end`).
    val joined = IntervalJoin.pointInInterval(
      spikes, syncModels,
      point = col("onix_clock"), start = col("onix_start"), end = col("onix_end"),
      extraCond = keys.map(k => spikes(k) === syncModels(k))
        .foldLeft(lit(true))(_ && _),
      inclusiveEnd = true)
    joined.withColumn("harp_time",
      TimeFunctions.onixToTimestamp(col("onix_clock"), col("slope"), col("intercept")))
  }

  /** Staged derive (`spike_sorting.py:174-382` make_fetch / make_compute /
    * make_insert): the reference splits heavy compute out of the DB
    * transaction; the Spark analogue materializes the fetch product once
    * (localCheckpoint) so the expensive compute never re-reads its inputs,
    * then the insert is the usual idempotent append (done by the caller —
    * compute results are returned, not written, so they can be validated
    * first, mirroring the reference's staging contract).
    */
  def deriveStaged(fetch: => DataFrame)(compute: DataFrame => DataFrame): DataFrame = {
    val fetched = fetch.localCheckpoint(eager = true)
    compute(fetched)
  }
}
