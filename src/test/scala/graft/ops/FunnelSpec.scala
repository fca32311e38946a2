package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Ordered-funnel semantics on a hand-built event log: strict ordering,
  * prefix-null reach times, the gap window, and monotone stage counts. */
class FunnelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  // u1 completes in order; u2 clicked BEFORE viewing (click must not count)
  // then clicked again after; u3 views only; u4 purchases before clicking
  // (no purchase reach); u5 never appears in stage 0
  private def log = Seq(
    (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(30)),
    (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "click", ts(10)),
    (3L, "view", ts(3)),
    (4L, "view", ts(0)), (4L, "purchase", ts(1)), (4L, "click", ts(2)),
    (5L, "purchase", ts(9))
  ).toDF("user_id", "event_type", "ts")

  test("reach times: earliest-after-previous per stage, null prefix for drop-offs") {
    val t = Funnel.funnelTimes(log, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3))).toMap
    assert(t.keySet == Set(1L, 2L, 3L, 4L)) // u5 never viewed
    assert(t(1L) == ((ts(0), ts(5), ts(30))))
    // u2's pre-view click ignored; post-view click at :10 counts
    assert(t(2L) == ((ts(2), ts(10), null)))
    assert(t(3L) == ((ts(3), null, null)))
    // u4's purchase precedes its click reach → no purchase
    assert(t(4L) == ((ts(0), ts(2), null)))
  }

  test("funnelCounts: monotone stage counts matching the reach table") {
    val rows = Funnel.funnelCounts(log, Seq("view", "click", "purchase"))
      .orderBy("stage_idx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((0L, "view", 4L), (1L, "click", 3L), (2L, "purchase", 1L)))
  }

  test("maxGap: a stage outside the window does not count") {
    // u1's purchase is 25 min after its click reach — a 10-min gap drops it
    val rows = Funnel.funnelCounts(log, Seq("view", "click", "purchase"),
      maxGapSeconds = Some(600L))
      .orderBy("stage_idx")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(("view", 4L), ("click", 3L), ("purchase", 0L)))
  }

  test("transitions: consecutive steps per user, tie-broken deterministically, no cross-user pairs") {
    val log = Seq(
      (1L, 10L, "view", ts(0)), (1L, 11L, "click", ts(1)), (1L, 12L, "view", ts(2)),
      // same-timestamp events for u2: event_id order decides (view then click)
      (2L, 20L, "view", ts(5)), (2L, 21L, "click", ts(5)),
      (3L, 30L, "view", ts(9)) // single event → no transition
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Funnel.transitions(log)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("view", "click") -> 2L, // u1 and u2
      ("click", "view") -> 1L  // u1 only — u3's view never pairs with u2's click
    ))
  }

  test("assignSessions: row-level ordinals — boundary gap stays, >gap breaks, ties by event_id") {
    val log = Seq(
      // u1: 0 → +600s (== gap, same session) → +601s after that (breaks)
      (1L, 10L, ts(0)), (1L, 11L, ts(10)),
      (1L, 12L, Timestamp.valueOf("2024-01-01 10:20:01")),
      // u2: same-timestamp pair — event_id decides the order, one session
      (2L, 20L, ts(5)), (2L, 21L, ts(5))
    ).toDF("user_id", "event_id", "ts")
    val got = Funnel.assignSessions(log, gapMicros = 600L * 1000000L)
      .collect().map(r => r.getLong(1) -> r.getAs[Long]("session_seq")).toMap
    assert(got == Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 20L -> 1L, 21L -> 1L))
    // summary view == groupBy of the row-level assignment (same contract)
    val viaRows = Funnel.assignSessions(log, gapMicros = 600L * 1000000L)
      .groupBy("user_id", "session_seq").count().count()
    assert(Funnel.sessionize(log, gapMicros = 600L * 1000000L).count() == viaRows)
  }

  test("guards and empty input") {
    intercept[IllegalArgumentException](Funnel.funnelTimes(log, Seq()))
    intercept[IllegalArgumentException](Funnel.funnelTimes(log, Seq("a", "a")))
    intercept[IllegalArgumentException](
      Funnel.funnelTimes(log, Seq("view"), maxGapSeconds = Some(0L)))
    val empty = Funnel.funnelCounts(log.filter(lit(false)), Seq("view", "click"))
      .orderBy("stage_idx")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(empty == Seq(("view", 0L), ("click", 0L)))
  }
}
