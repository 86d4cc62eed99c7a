package graft

import org.apache.spark.sql.functions._

import graft.functions.TimeFunctions
import graft.pipelines.Ephys

class EphysSpec extends SparkSpec {
  import spark.implicits._

  test("assignSpikeOwners: cumulative offsets own half-open sample ranges") {
    // 3 chunks of 100/50/200 samples → ownership [0,100), [100,150), [150,350)
    val chunks = Seq(
      ("c1", 1L, 100L), ("c2", 2L, 50L), ("c3", 3L, 200L)
    ).toDF("chunk_id", "ord", "sample_count")
    val spikes = Seq(0L, 99L, 100L, 149L, 150L, 349L).toDF("sample_index")

    val owned = Ephys.assignSpikeOwners(spikes, chunks, "ord", Seq("chunk_id"))
      .select("sample_index", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(owned == Set(
      (0L, "c1"), (99L, "c1"),
      (100L, "c2"), (149L, "c2"),
      (150L, "c3"), (349L, "c3")))
  }

  test("assignSpikeOwners: out-of-range spikes drop (no phantom chunk)") {
    val chunks = Seq(("c1", 1L, 10L)).toDF("chunk_id", "ord", "sample_count")
    val spikes = Seq(5L, 10L, 11L).toDF("sample_index")
    val owned = Ephys.assignSpikeOwners(spikes, chunks, "ord", Seq("chunk_id"))
    assert(owned.count() == 1)
  }

  test("syncSpikeTimes: straddling windows map each spike via its own model") {
    // Two sync windows with different regressions; spikes fall in both —
    // staggered, not 1:1 (SURVEY.md §7.5.4).
    val harp0 = TimeFunctions.instantToHarp(java.time.Instant.parse("2024-01-01T00:00:00Z"))
    val models = Seq(
      (0L, 1000L, 0.001, harp0),          // window A: 1000 ticks/s from t0
      (1000L, 2000L, 0.002, harp0 - 1.0)  // window B: different slope/intercept
    ).toDF("onix_start", "onix_end", "slope", "intercept")
    val spikes = Seq(500L, 1500L).toDF("onix_clock")

    val synced = Ephys.syncSpikeTimes(spikes, models)
      .orderBy("onix_clock")
      .select("onix_clock", "harp_time").collect()
    assert(synced.length == 2)
    val tA = synced(0).getTimestamp(1).toInstant
    val tB = synced(1).getTimestamp(1).toInstant
    assert(tA == java.time.Instant.parse("2024-01-01T00:00:00.500Z"))
    assert(tB == java.time.Instant.parse("2024-01-01T00:00:02Z")) // 0.002*1500 - 1
  }

  test("deriveStaged: compute sees the fetched data exactly once") {
    var fetchCount = 0
    val out = Ephys.deriveStaged {
      fetchCount += 1
      Seq((1, "a"), (2, "b")).toDF("k", "v")
    } { df => df.withColumn("k2", col("k") * 2) }
    assert(out.count() == 2)
    assert(out.agg(sum("k2")).head().getLong(0) == 6)
    assert(fetchCount == 1)
  }
}
