package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via flatMapGroupsWithState — the §2.10 tool for
  * semantics the built-in windows can't express (cross-batch running
  * state per key). Works on batch Datasets too (state starts empty), so
  * the same function is verifiable batch-vs-stream like EventStreams.
  *
  * Scale: state lives in the executor state store partitioned by key —
  * one entry per user here (two longs + a double), eviction by timeout
  * when the key set is unbounded (NoTimeout is right for a bounded user
  * population like this corpus).
  */
object StatefulOps {

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, n_purchases: Long, total_value: Double)

  /** Running per-user totals, emitted once per key per micro-batch (or
    * once overall in batch mode). State = the running UserStats. */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0L, 0.0))
          var n = prev.n_events; var p = prev.n_purchases; var v = prev.total_value
          batch.foreach { e =>
            n += 1
            if (e.event_type == "purchase") p += 1
            v += e.value
          }
          val next = UserStats(uid, n, p, v)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Typed view over the events table (nulls filtered, value defaulted). */
  def asUserEvents(events: DataFrame): Dataset[UserEvent] = {
    import events.sparkSession.implicits._
    events.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .as[UserEvent]
  }
}
