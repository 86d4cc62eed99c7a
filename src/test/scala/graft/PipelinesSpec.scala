package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.pipelines.{CameraQC, PositionSlice}

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("CameraQC: known dropped frames produce exact drop_count and frame_offset") {
    // 50 Hz synthetic with a 3-frame drop after frame 2 and a 1-frame drop
    // after frame 6 (FIXTURES.md §1.3 recipe: hw_counter gaps = drops).
    val rows = Seq(
      (0L, 1000L), (1L, 1001L), (2L, 1002L),
      (3L, 1006L), // 3 dropped
      (4L, 1007L), (5L, 1008L), (6L, 1009L),
      (7L, 1011L)  // 1 dropped
    ).map { case (frame, hw) =>
      ("cam0", Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusMillis(frame * 20)), hw, hw * 20000000L, frame)
    }
    val meta = rows.toDF("device", "time", "hw_counter", "hw_timestamp", "frame")

    val deltas = CameraQC.frameDeltas(meta, Seq("device")).cache()
    val offsets = deltas.orderBy("frame").select("frame_offset").as[Long].collect()
    assert(offsets.sameElements(Array(0L, 0L, 0L, 3L, 3L, 3L, 3L, 4L)))

    val summ = CameraQC.summary(deltas, Seq("device"), nominalFps = 50.0).head()
    assert(summ.getAs[Long]("sample_count") == 8)
    assert(summ.getAs[Long]("drop_count") == 4)
    assert(summ.getAs[Double]("max_camera_delta") == 0.08) // 4 hw ticks * 20 ms
  }

  test("PositionSlice: explode + scale + exact mask") {
    val chunk = Seq((
      "subj1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"),
      Seq(ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00"), ts("2024-01-01 10:40:00")),
      Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0, 30.0), Seq(0.9, 0.8, 0.7)
    )).toDF("identity", "chunk_start", "chunk_end", "timestamps", "x", "y", "likelihood")

    val out = PositionSlice.explodeSlice(chunk,
      "2024-01-01 10:10:00", "2024-01-01 10:50:00", scaleFactor = 2.0)
    val rows = out.collect()
    assert(rows.length == 2) // 10:00 masked out, 10:20 & 10:40 in range
    assert(rows(0).getAs[Double]("x") == 4.0) // scaled
    assert(rows(0).getAs[Double]("y") == 40.0)
  }

  test("restrictChunksPerKey widens independently per stream key") {
    // camA: gap 09:00-12:00 around the query start; camB: continuous
    // coverage (no fallback needed); camC: ALL chunks before the window
    // (only the nearest-before fallback row survives).
    val chunks = Seq(
      ("camA", "2024-01-01 08:00:00", "2024-01-01 09:00:00"),
      ("camA", "2024-01-01 12:00:00", "2024-01-01 13:00:00"),
      ("camB", "2024-01-01 09:00:00", "2024-01-01 10:00:00"),
      ("camB", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
      ("camB", "2024-01-01 11:00:00", "2024-01-01 12:00:00"),
      ("camC", "2024-01-01 01:00:00", "2024-01-01 02:00:00"),
      ("camC", "2024-01-01 03:00:00", "2024-01-01 04:00:00")
    ).map { case (k, s, e) => (k, ts(s), ts(e)) }
      .toDF("cam", "chunk_start", "chunk_end")
    val got = PositionSlice.restrictChunksPerKey(chunks,
        "2024-01-01 10:00:00", "2024-01-01 12:30:00", keys = Seq("cam"))
      .select("cam", "chunk_start").as[(String, Timestamp)].collect().toSet
    assert(got == Set(
      ("camA", ts("2024-01-01 08:00:00")), // nearest-before fallback
      ("camA", ts("2024-01-01 12:00:00")),
      // camB: nearest-before IS the 10:00 chunk (already overlapping —
      // dedup'd), so 09:00 stays excluded
      ("camB", ts("2024-01-01 10:00:00")),
      ("camB", ts("2024-01-01 11:00:00")),
      ("camC", ts("2024-01-01 03:00:00")) // only the fallback row
    ), got)
  }

  test("PositionSlice.restrictChunks widens to nearest chunk when endpoint is in a gap") {
    val chunks = Seq(
      ("2024-01-01 08:00:00", "2024-01-01 09:00:00"),
      // gap 09:00-12:00 (acquisition stopped)
      ("2024-01-01 12:00:00", "2024-01-01 13:00:00")
    ).map { case (s, e) => (ts(s), ts(e)) }.toDF("chunk_start", "chunk_end")

    // Query starting mid-gap: the 08:00 chunk (nearest before) must appear.
    val got = PositionSlice.restrictChunks(chunks,
      "2024-01-01 10:00:00", "2024-01-01 12:30:00")
      .orderBy("chunk_start").select("chunk_start").as[Timestamp].collect()
    assert(got.length == 2 && got(0) == ts("2024-01-01 08:00:00"))
  }
}
