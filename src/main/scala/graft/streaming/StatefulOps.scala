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
    * once overall in batch mode). State = the running UserStats.
    *
    * NoTimeout is right for a BOUNDED key population (this corpus's fixed
    * user set) and for the batch oracle twin — but it is exactly the
    * unbounded-state shape [[StreamGuard]] refuses on an ad-hoc STREAM
    * (r16 verdict ask #2): at an open key population the per-key state
    * grows with every user ever seen. A guarded streaming deployment uses
    * [[runningUserStatsExpiring]] instead. */
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

  /** [[runningUserStats]] with BOUNDED state — the StreamGuard-admissible
    * form for an open key population: a processing-time timeout evicts a
    * key's state after `idleTimeout` without events (a key that reappears
    * later restarts from zero — the documented cost of eviction; pick the
    * timeout ≥ the business definition of "lapsed"). While every key stays
    * active the emitted stats are identical to the NoTimeout form, which
    * is what StatefulSpec pins. */
  def runningUserStatsExpiring(events: Dataset[UserEvent],
                               idleTimeout: String = "30 days"): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserStats]) =>
          if (state.hasTimedOut) {
            // idle key: drop the state, emit nothing — the state store
            // shrinks by exactly the lapsed keys
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0L, 0.0))
            var n = prev.n_events; var p = prev.n_purchases; var v = prev.total_value
            batch.foreach { e =>
              n += 1
              if (e.event_type == "purchase") p += 1
              v += e.value
            }
            val next = UserStats(uid, n, p, v)
            state.update(next)
            state.setTimeoutDuration(idleTimeout)
            Iterator.single(next)
          }
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

  // ---- transformWithState (Spark 4's arbitrary-state API) -------------

  /** Sibling sessions for batch state-store-backed operators, keyed by the
    * parent session (weak keys — test sessions come and go). See
    * [[rebindForBatchState]]. */
  private val statefulScopes =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
                                org.apache.spark.sql.SparkSession]())
  private val rebindCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Pin the shuffle width of a BATCH state-store-backed operator to the
    * session's real shuffle-partition count.
    *
    * Batch `transformWithState` pins its state-store count to
    * `conf.numShufflePartitions` — which, under AQE coalescing, is the
    * INITIAL partition number, and stateful operators are exempt from
    * coalescing (the partition↔state-store mapping is fixed at planning:
    * the Exchange is tagged REQUIRED_BY_STATEFUL_OPERATOR). The engine's
    * global 8×-cores initial width (`engine/Sessions.scala` — right for
    * big hash aggregates; it is the sf30-ladder OOM fix) therefore
    * instantiates 8× state-store providers and pays their fixed init cost
    * 8× on small inputs (measured: st9 0.99 s → 3.9 s in the round-17
    * bench delta; 256 stores for 150 keys).
    *
    * Fix at the seam, not globally: rebind the batch input to a sibling
    * session (shared SparkContext, own SQLConf) whose initialPartitionNum
    * equals the real shuffle width. The logical plan crosses sessions via
    * a global temp view — global-temp is context-shared, and the view is
    * the already-analyzed plan, so pushdown/pruning survive and the
    * sibling only re-plans physically. Streaming inputs pass through
    * untouched (AQE is disabled on streams; the checkpoint pins width).
    * A pre-`repartition(n, key)` canNOT express this — the stateful
    * operator's required distribution demands exactly
    * `conf.numShufflePartitions` partitions, so the narrower Exchange
    * would just be re-shuffled back up. */
  private def rebindForBatchState[T: org.apache.spark.sql.Encoder](
      ds: Dataset[T]): Dataset[T] = {
    if (ds.isStreaming) return ds
    val parent = ds.sparkSession
    val width = parent.conf.get("spark.sql.shuffle.partitions")
    val init = parent.conf.getOption(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    if (init.isEmpty || init.contains(width)) return ds
    val scoped = statefulScopes.synchronized {
      val cached = statefulScopes.get(parent)
      if (cached != null) cached
      else {
        val s = parent.newSession()
        s.conf.set("spark.sql.shuffle.partitions", width)
        s.conf.set(
          "spark.sql.adaptive.coalescePartitions.initialPartitionNum", width)
        statefulScopes.put(parent, s)
        s
      }
    }
    val name = s"graft_batch_state_rebind_${rebindCounter.incrementAndGet()}"
    ds.createOrReplaceGlobalTempView(name)
    scoped.table(s"global_temp.$name").as[T]
  }

  final case class UserEventCents(user_id: Long, event_type: String, cents: Long)
  final case class UserStatsCents(user_id: Long, n_events: Long,
                                  n_purchases: Long, total_cents: Long)

  /** [[runningUserStats]] re-expressed on `transformWithState` — Spark 4's
    * successor to flatMapGroupsWithState: explicit named state handles
    * (`ValueState`/`ListState`/`MapState`), TTL per state, and timers
    * instead of a single opaque blob + one timeout. Money as cent-BIGINTs
    * (ROUND before the cast) so the running sum is exact integer
    * arithmetic — order-independent across micro-batch replays AND
    * engine-portable for the batch oracle. State here is one ValueState
    * row per user; at an unbounded key population the TTLConfig seam is
    * where eviction policy plugs in. */
  class RunningStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserEventCents, UserStatsCents] {
    @transient private var stats:
      org.apache.spark.sql.streaming.ValueState[UserStatsCents] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      stats = getHandle.getValueState[UserStatsCents]("stats",
        org.apache.spark.sql.Encoders.product[UserStatsCents],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEventCents],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserStatsCents] = {
      val prev = if (stats.exists()) stats.get() else UserStatsCents(key, 0L, 0L, 0L)
      var n = prev.n_events; var p = prev.n_purchases; var c = prev.total_cents
      rows.foreach { e =>
        n += 1
        if (e.event_type == "purchase") p += 1
        c += e.cents
      }
      val next = UserStatsCents(key, n, p, c)
      stats.update(next)
      Iterator.single(next)
    }
  }

  /** Running per-user totals via [[RunningStatsProcessor]]. Works in batch
    * mode too (each key's rows arrive in one handleInputRows call, so the
    * emission IS the final aggregate) — which is what makes the operator
    * DuckDB-oracle-verifiable like every other st* query.
    *
    * TimeMode.None + TTLConfig.NONE is the batch-twin setting; on an
    * ad-hoc STREAM it is unbounded custom state and [[StreamGuard]]
    * refuses it (r16 ask #2) — the guarded streaming form is
    * [[runningUserStatsTwsTtl]]. */
  def runningUserStatsTws(events: Dataset[UserEventCents]): Dataset[UserStatsCents] = {
    import events.sparkSession.implicits._
    ensureStateStoreCoordinator(events.sparkSession)
    rebindForBatchState(events).groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** [[RunningStatsProcessor]] with per-state TTL — the transformWithState
    * idiom for bounded state at an open key population: the ValueState
    * carries a TTLConfig, so a key untouched for `ttl` is evicted by the
    * state store itself (no timer code; a reappearing key restarts from
    * zero). TimeMode.ProcessingTime is required for TTL to tick.
    *
    * Extends [[GuardedStatefulProcessor]] (r17 ask #3): the TTL is a
    * CONSTRUCTOR obligation, so copying this processor and dropping the
    * TTL no longer compiles into plan-invisible unbounded state — and
    * StreamGuard's `unguarded-custom-state` rule admits it on streams. */
  class RunningStatsProcessorTtl(ttl: java.time.Duration)
      extends GuardedStatefulProcessor[Long, UserEventCents, UserStatsCents](
        org.apache.spark.sql.streaming.TTLConfig(ttl)) {
    @transient private var stats:
      org.apache.spark.sql.streaming.ValueState[UserStatsCents] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      stats = ttlValueState[UserStatsCents]("stats",
        org.apache.spark.sql.Encoders.product[UserStatsCents])

    override def handleInputRows(key: Long, rows: Iterator[UserEventCents],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserStatsCents] = {
      val prev = if (stats.exists()) stats.get() else UserStatsCents(key, 0L, 0L, 0L)
      var n = prev.n_events; var p = prev.n_purchases; var c = prev.total_cents
      rows.foreach { e =>
        n += 1
        if (e.event_type == "purchase") p += 1
        c += e.cents
      }
      val next = UserStatsCents(key, n, p, c)
      stats.update(next)
      Iterator.single(next)
    }
  }

  /** StreamGuard-admissible streaming form of [[runningUserStatsTws]]:
    * TTL'd state under TimeMode.ProcessingTime. Active keys emit the same
    * running totals as the batch twin. */
  def runningUserStatsTwsTtl(events: Dataset[UserEventCents],
                             ttl: java.time.Duration = java.time.Duration.ofDays(30))
      : Dataset[UserStatsCents] = {
    import events.sparkSession.implicits._
    ensureStateStoreCoordinator(events.sparkSession)
    rebindForBatchState(events).groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessorTtl(ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Update())
  }

  /** Typed cent-exact view over the events table. */
  def asUserEventsCents(events: DataFrame): Dataset[UserEventCents] = {
    import events.sparkSession.implicits._
    events.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"),
        expr("CAST(ROUND(coalesce(value, 0.0) * 100) AS BIGINT)").as("cents"))
      .as[UserEventCents]
  }

  private val coordinatorKicked = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** BATCH transformWithState needs the driver-side StateStoreCoordinator,
    * which Spark only instantiates when a streaming query starts
    * (RpcEndpointNotFoundException otherwise — verified on 4.1.2). Kick a
    * no-op rate→noop AvailableNow stream once per JVM to create it. */
  def ensureStateStoreCoordinator(spark: org.apache.spark.sql.SparkSession): Unit =
    if (coordinatorKicked.compareAndSet(false, true)) {
      val q = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .writeStream.format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
}
