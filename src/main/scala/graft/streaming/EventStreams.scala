package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming-ready event analytics (SURVEY.md §2.10 — ABSENT in
  * the batch-only reference; north-star extension §7.6).
  *
  * Every transform here is written once and applied to BOTH a batch
  * DataFrame (oracle-verified against DuckDB) and a `readStream` DataFrame
  * (verified batch-vs-stream in ScalaTest) — the Structured Streaming
  * model's whole point. `withWatermark` is a no-op on batch inputs and
  * bounds state on streams.
  *
  * Scale design: windowed/sessionized aggregation keys are
  * (window, event_type) / (session, user_id) — standard partial+final agg
  * on streams with state eviction driven by the watermark; no custom state
  * store needed (mapGroupsWithState would only enter for cross-window
  * user state, which none of these need).
  */
object EventStreams {

  /** Tumbling-window counts + mean value per event type. Window start is
    * surfaced as a formatted string so batch output is oracle-comparable
    * (raw timestamps differ in physical precision between engines). */
  def tumblingCounts(events: DataFrame,
                     windowDur: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events.filter(col("user_id").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(avg("value"), 4).as("avg_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("avg_value"))

  /** Per-user sessionization with a gap timeout: events closer than `gap`
    * chain into one session. Built on session_window (no custom state). */
  def userSessions(events: DataFrame,
                   gap: String = "5 minutes",
                   watermark: String = "10 minutes"): DataFrame =
    events.filter(col("user_id").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
}
