package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables
import graft.streaming.StreamOps

/** System pack: the streaming transforms run in batch mode (they are
  * batch/stream agnostic — SURVEY.md §2.9) and the multimodal plumbing
  * (driver brief). Streaming ops get full DuckDB oracles; the multimodal
  * features are engine-specific (stub decode) so they get the rows-only
  * check with invariants pinned in MultimodalSpec.
  */
object SystemQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Tumbling-window chunk catalog via the streaming transform (batch mode).
    "q80_stream_chunks" -> ((s, d) => {
      StreamOps.chunkCounts(Tables.events(s, d), "ts", Seq("user_id"))
        .orderBy("user_id", "chunk_start")
    }),

    // Session windows via session_window (batch mode): merge-on-overlap
    // semantics equal gaps-and-islands for point events.
    "q81_session_window" -> ((s, d) => {
      StreamOps.sessionAgg(Tables.events(s, d), "ts", Seq("user_id"),
        gap = "30 minutes")
        .select("user_id", "n_events", "session_start", "session_end")
        .orderBy("user_id", "session_start")
    }),

    // Windowed per-key stats via the streaming transform (batch mode).
    "q82_windowed_stats" -> ((s, d) => {
      StreamOps.windowedStats(Tables.events(s, d), "ts", "value",
        Seq("event_type"), width = "1 day")
        .orderBy("event_type", "window_start")
    }),

    // Multimodal: synthesized blobs → per-blob features (stub decode kernel;
    // real partition/batch/schema plumbing). Engine-specific → rows-only.
    "q83_multimodal_features" -> ((s, d) => {
      val blobs = Multimodal.synthesizeBlobs(
        Tables.documents(s, d).select("doc_id", "text"), "text")
      Multimodal.extractFeatures(blobs, "blob", dim = 8)
        .select("doc_id", "width", "height", "n_bytes")
        .orderBy("doc_id")
    }),

    // Multimodal: deterministic frame sampling (posexplode plumbing).
    "q84_frame_sample" -> ((s, d) => {
      val blobs = Multimodal.synthesizeBlobs(
        Tables.documents(s, d).select("doc_id", "text"), "text", repeat = 16)
      Multimodal.sampleFrames(blobs, "blob", Seq("doc_id"),
        everyNth = 7, maxFrames = 4)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          max(col("frame_index")).as("max_frame"))
        .orderBy("doc_id")
    })
  )

  private val EV =
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
       event_type, value, props FROM events)"""

  val oracles: Map[String, String] = Map(
    "q80_stream_chunks" -> s"""$EV
       SELECT user_id,
         date_trunc('hour', ts) AS chunk_start,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS chunk_end,
         count(*) AS sample_count,
         min(ts) AS first_ts, max(ts) AS last_ts
       FROM ev GROUP BY user_id, date_trunc('hour', ts)
       ORDER BY user_id, chunk_start""",
    "q81_session_window" -> s"""$EV,
       flagged AS (
         SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                THEN 1 ELSE 0 END AS new_session
         FROM ev
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       ), sessions AS (
         SELECT user_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM flagged)
       SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         min(ts) AS session_start, max(ts) AS session_end
       FROM sessions GROUP BY user_id, sid
       ORDER BY user_id, session_start""",
    "q82_windowed_stats" -> s"""$EV
       SELECT event_type, date_trunc('day', ts) AS window_start,
         count(value) AS count,
         min(value) AS min, max(value) AS max,
         round(avg(value), 4) AS mean
       FROM ev GROUP BY event_type, date_trunc('day', ts)
       ORDER BY event_type, window_start"""
  )
}
