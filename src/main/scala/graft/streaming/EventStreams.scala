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
      .agg(count(lit(1)).as("n_events"), round(graft.ops.Det.davg(col("value")), 4).as("avg_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("avg_value"))

  /** Sliding (hopping) window counts + mean value per event type: windows
    * of `windowDur` starting every `slide`, so each event lands in
    * windowDur/slide overlapping windows. Same watermark-driven state
    * eviction as tumbling — the per-key state multiplier is the overlap
    * factor, which is why production slides are a small divisor of the
    * window (4 here), not per-second micro-hops. */
  def slidingCounts(events: DataFrame,
                    windowDur: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events.filter(col("user_id").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(graft.ops.Det.davg(col("value")), 4).as("avg_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("avg_value"))

  /** Stream-stream click→purchase attribution join: every purchase a user
    * makes within `horizon` of a click, keyed by user. The canonical
    * Structured Streaming two-stream join — equality key + event-time
    * range condition, with BOTH sides watermarked so each side's join
    * state is evicted once the other's watermark passes the horizon
    * (state stays bounded at any throughput; without the range condition
    * Spark would rightly refuse to plan unbounded-state retention).
    *
    * Works identically on batch inputs (oracle-verified as st3). Both
    * engines see second-truncated timestamps: the parquet carries
    * nanosecond timestamps, Spark truncates to micros on read, and a
    * raw-precision range boundary could flip between engines
    * (SURVEY.md §7.4.4 discipline, same as the as-of join). */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                        horizon: String = "60 minutes",
                        watermark: String = "2 hours"): DataFrame =
    clickPurchaseJoinTyped(clicks, purchases, horizon, watermark, "inner")

  /** LEFT-OUTER form of [[clickPurchaseJoin]] — every click appears, the
    * unconverted ones with null purchase columns: the "abandoned
    * journeys" view conversion analysis actually needs (an inner join
    * silently drops exactly the rows marketing asks about).
    *
    * Streaming semantics: an outer stream-stream join emits a
    * null-completed row only once the WATERMARK has definitively closed
    * that click's horizon (until then a match could still arrive), so
    * null rows trail the matched rows by the watermark delay, and a
    * bounded replay only emits null rows for clicks whose horizon ends
    * before the final watermark — the StreamingSpec case pushes the
    * watermark past end-of-data with a sentinel event, the same thing a
    * production heartbeat topic does. Matched rows stream out eagerly,
    * exactly as in the inner form. */
  def clickPurchaseJoinOuter(clicks: DataFrame, purchases: DataFrame,
                             horizon: String = "60 minutes",
                             watermark: String = "2 hours"): DataFrame =
    clickPurchaseJoinTyped(clicks, purchases, horizon, watermark, "left_outer")

  /** FULL-OUTER form of [[clickPurchaseJoin]] — the complete funnel
    * ledger: matched attributions, unconverted clicks (null purchase
    * side), AND unattributed purchases (null click side — organic/direct
    * conversions no click preceded, the rows both one-sided forms drop).
    * Both null-completed classes emit once the OPPOSITE side's watermark
    * closes their horizon, exactly as in the left-outer form; matched
    * rows stream eagerly. Works identically on batch inputs
    * (oracle-verified as st8). */
  def clickPurchaseJoinFull(clicks: DataFrame, purchases: DataFrame,
                            horizon: String = "60 minutes",
                            watermark: String = "2 hours"): DataFrame =
    clickPurchaseJoinTyped(clicks, purchases, horizon, watermark, "full_outer")

  private def clickPurchaseJoinTyped(clicks: DataFrame, purchases: DataFrame,
                                     horizon: String, watermark: String,
                                     joinType: String): DataFrame = {
    val c = clicks
      .filter(col("user_id").isNotNull && col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        date_trunc("second", col("ts")).as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .filter(col("user_id").isNotNull && col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        date_trunc("second", col("ts")).as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    c.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"),
        joinType)
      // coalesce is a no-op for inner/left (click side present) and
      // surfaces the purchase's user on full-outer's click-less rows
      .select(coalesce(col("user_id"), col("p_user_id")).as("user_id"),
        col("click_id"), col("purchase_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
  }

  /** Stream-static enrichment: the event stream joined to a STATIC
    * dimension (`dim`: user_id → segment), then windowed counts per
    * segment. The stream-static join is stateless — no watermark needed
    * on the join itself (each micro-batch joins against the current
    * static snapshot); the watermark below only bounds the downstream
    * windowed-agg state. The dim is broadcast: re-read per micro-batch
    * by Structured Streaming's contract, so a dim-scale table costs a
    * broadcast per trigger and the stream side never shuffles for the
    * join — at 100 TB/day of events that is the only sane plan shape.
    * Works identically on batch inputs (oracle-verified as st5). */
  def enrichedSegmentCounts(events: DataFrame, dim: DataFrame,
                            windowDur: String = "1 hour",
                            watermark: String = "10 minutes"): DataFrame =
    events.filter(col("user_id").isNotNull)
      .withWatermark("ts", watermark)
      .join(broadcast(dim), Seq("user_id"))
      .groupBy(window(col("ts"), windowDur).as("w"), col("segment"))
      .agg(count(lit(1)).as("n_events"), round(graft.ops.Det.davg(col("value")), 4).as("avg_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("segment"), col("n_events"), col("avg_value"))

  /** Composed funnel-dashboard shape (st7): the LEFT-OUTER click→purchase
    * attribution join ([[clickPurchaseJoinOuter]]) feeding a per-user
    * session-window aggregation — per 5-minute-gap click session, how many
    * attributed (click, purchase-within-horizon) pairs and how many clicks
    * converted to nothing. This is what a conversion dashboard actually
    * serves: sessions, not raw pairs.
    *
    * Streaming shape: TWO chained stateful operators — a stream-stream
    * time-interval outer join, then a session-window aggregation over the
    * join output's click event time (watermark propagates through the
    * join; Spark ≥3.5 plans chained stateful ops in append mode). Session
    * rows finalize when the watermark passes the session's end; null-side
    * join rows for unconverted clicks emit once the purchase watermark
    * closes the click's horizon, so they reach the session agg strictly
    * before that watermark can close the session — no unconverted click is
    * ever counted late. Metrics avoid COUNT(DISTINCT) deliberately:
    * streaming aggs can't plan it, and each unconverted click contributes
    * exactly one null-completed row, so plain counts are exact.
    *
    * Works identically on batch inputs (oracle-verified as st7). */
  def sessionAttribution(clicks: DataFrame, purchases: DataFrame,
                         horizon: String = "60 minutes",
                         gap: String = "5 minutes",
                         watermark: String = "2 hours"): DataFrame =
    sessionAttributionFrom(
      clicks
        .filter(col("user_id").isNotNull && col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          date_trunc("second", col("ts")).as("click_ts"))
        .withWatermark("click_ts", watermark),
      purchases
        .filter(col("user_id").isNotNull && col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
          date_trunc("second", col("ts")).as("purchase_ts"))
        .withWatermark("purchase_ts", watermark),
      horizon, gap)

  /** [[sessionAttribution]] over PRE-WATERMARKED inputs — the shape behind
    * [[Admission.guard]], which already owns the stream's single watermark
    * (Spark's watermark-propagation simulator rightly refuses a
    * downstream redefinition: the guard's frontier is the one that
    * already admitted the rows). Caller contract: `ts` is already
    * second-truncated (truncate BEFORE the guard — a derived column
    * would shed the watermark metadata, a plain alias preserves it) and
    * carries the watermark. */
  def sessionAttributionGuarded(clicks: DataFrame, purchases: DataFrame,
                                horizon: String = "60 minutes",
                                gap: String = "5 minutes"): DataFrame =
    sessionAttributionFrom(
      clicks
        .filter(col("user_id").isNotNull && col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts")),
      purchases
        .filter(col("user_id").isNotNull && col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts")),
      horizon, gap)

  private def sessionAttributionFrom(c: DataFrame, p: DataFrame,
                                     horizon: String, gap: String): DataFrame =
    c.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"),
        "left_outer")
      .groupBy(session_window(col("click_ts"), gap).as("w"), col("user_id"))
      .agg(
        count(col("purchase_id")).as("n_attributions"),
        count(when(col("purchase_id").isNull, lit(1))).as("n_unconverted_clicks"))
      .select(
        col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_attributions"), col("n_unconverted_clicks"))

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
