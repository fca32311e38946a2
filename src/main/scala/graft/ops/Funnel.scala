package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — the MATCH_RECOGNIZE-shaped "did the user do
  * A, then B after A, then C after B" query engines ship natively and
  * Spark does not. Composed from per-stage min-timestamp contractions:
  * stage k's reach time for a user is the EARLIEST stage-k event strictly
  * after the user's stage-(k−1) reach time (optionally within `maxGap`
  * seconds of it). Greedy-earliest is the standard funnel semantics: if
  * any event sequence completes the funnel, the earliest-per-stage chain
  * does too when unconstrained; with a gap it is the usual product
  * definition (each step clocked from the previous reach).
  *
  * Scale shape: one pass per stage over the type-filtered event sliver,
  * joined to the USER-cardinality reach table (AQE picks the strategy;
  * the reach side is dimension-like, never event-scale), then a user-key
  * groupBy — all passes co-keyed on the user column, no self-join of the
  * full event table against itself and no per-user event buffering
  * (collect_list funnels die on hot users at 100 TB).
  */
object Funnel {

  /** Per-user reach times: `userCol`, `t0`..`t(k-1)` (TIMESTAMP, null
    * from the first stage the user never reached — non-null columns form
    * a prefix). `maxGapSeconds`: stage k must land within this many
    * seconds of the stage-(k−1) reach time. */
  def funnelTimes(events: DataFrame, stages: Seq[String],
                  userCol: String = "user_id", typeCol: String = "event_type",
                  tsCol: String = "ts",
                  maxGapSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"funnel stages must be distinct, got $stages")
    maxGapSeconds.foreach(g => require(g > 0, s"maxGapSeconds must be positive, got $g"))
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    for (i <- 1 until stages.length) {
      val prev = col(s"t${i - 1}")
      val gate = maxGapSeconds
        .map(g => col(tsCol) <= prev + expr(s"INTERVAL $g SECOND"))
        .getOrElse(lit(true))
      val reach = events.filter(col(typeCol) === stages(i))
        .select(col(userCol), col(tsCol))
        .join(acc.select(col(userCol), prev), Seq(userCol))
        .filter(col(tsCol) > prev && gate)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t$i"))
      acc = acc.join(reach, Seq(userCol), "left")
    }
    acc
  }

  /** Event-transition matrix: counts of consecutive (from_type → to_type)
    * steps per user in event order (`tsCol`, `tieCol` total order — the
    * tie column makes the lag deterministic when timestamps collide).
    * The Markov-chain view of user journeys; row-normalizing `n` gives
    * P(next | current). One user-partitioned window + one hash agg; the
    * window shuffle carries only (user, ts, tie, type). */
  def transitions(events: DataFrame, userCol: String = "user_id",
                  typeCol: String = "event_type", tsCol: String = "ts",
                  tieCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events.select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .groupBy(col("__from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** The conversion report: one row per stage with `stage_idx`, `stage`,
    * `users_reached` (monotone non-increasing by construction). Integer
    * output only — ratios are derivable and floats would be the only
    * nondeterminism in an otherwise exact pipeline. */
  def funnelCounts(events: DataFrame, stages: Seq[String],
                   userCol: String = "user_id", typeCol: String = "event_type",
                   tsCol: String = "ts",
                   maxGapSeconds: Option[Long] = None): DataFrame = {
    val times = funnelTimes(events, stages, userCol, typeCol, tsCol, maxGapSeconds)
    val aggs = stages.indices.map(i =>
      sum(when(col(s"t$i").isNotNull, 1L).otherwise(0L)).as(s"__n$i"))
    times.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(stages.zipWithIndex.map { case (st, i) =>
        struct(lit(i.toLong).as("stage_idx"), lit(st).as("stage"),
          coalesce(col(s"__n$i"), lit(0L)).as("users_reached"))
      }: _*)).as("__s"))
      .select(col("__s.stage_idx"), col("__s.stage"), col("__s.users_reached"))
  }

  /** BATCH sessionization — the gap-based session assignment the
    * streaming `session_window` computes online, over the archive: an
    * event starts a new session when more than `gapMicros` elapsed
    * since the user's previous event (exact microsecond arithmetic —
    * seconds-truncated timestamps would glue sessions that straddle a
    * second boundary). One user-keyed window (break flags + running sum
    * ⇒ per-user session ordinal) + one hash agg — no per-user event
    * buffering, session count per shuffle key bounded by the user's
    * events. Output: (userCol, session_seq, n_events, duration_us),
    * deterministic under the (ts, event_id) total order. */
  def sessionize(events: DataFrame, gapMicros: Long,
                 userCol: String = "user_id", tsCol: String = "ts",
                 idCol: String = "event_id"): DataFrame =
    assignSessions(events, gapMicros, userCol, tsCol, idCol)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max("__t") - min("__t")).as("duration_us"))

  /** Per-EVENT session assignment: the input rows plus `session_seq` (the
    * user's 1-based session ordinal) and `__t` (event-time micros). The
    * row-level primitive under [[sessionize]]; path/sequence analyses that
    * need the events themselves (not just session summaries) build on this.
    * Same determinism contract: (ts, id) total order per user, >gap ⇒ new
    * session. One user-keyed window, no per-user buffering. */
  def assignSessions(events: DataFrame, gapMicros: Long,
                     userCol: String = "user_id", tsCol: String = "ts",
                     idCol: String = "event_id"): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be positive, got $gapMicros")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(tsCol, idCol)
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val t = unix_micros(col(tsCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    events
      .withColumn("__t", t)
      .withColumn("__brk",
        when(prev.isNull || t - prev > gapMicros, 1L).otherwise(0L))
      .withColumn("session_seq", sum("__brk").over(wRun))
      .drop("__brk")
  }
}
