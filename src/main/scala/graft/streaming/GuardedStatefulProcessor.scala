package graft.streaming

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.streaming.{ListState, MapState, QueryInfo, StatefulProcessor, StatefulProcessorHandle, TTLConfig, ValueState}

/** TTL-at-the-API-seam base for `transformWithState` processors — the
  * closure of [[StreamGuard]]'s documented residual (r17 verdict ask #3).
  *
  * The plan cannot prove a clocked-mode (ProcessingTime/EventTime)
  * processor's state is bounded: TTL lives in runtime `TTLConfig` per
  * state VARIABLE, invisible to the logical `TransformWithState` node. A
  * user copying a TTL'd processor and dropping its `TTLConfig` gets
  * unbounded state past every plan-level check. So the bound moves to
  * the one place it is machine-checkable before any state exists — the
  * processor's constructor:
  *
  *   - construction REQUIRES a positive TTL (`TTLConfig.NONE`, zero and
  *     negative durations are refused with an error naming the rule);
  *   - [[ttlValueState]]/[[ttlListState]]/[[ttlMapState]] acquire state
  *     with that TTL — the intended `init` vocabulary;
  *   - [[guardedHandle]] is a delegating view of the engine handle whose
  *     `get*State` overloads refuse `TTLConfig.NONE` (and null/zero/
  *     negative), for processors that want per-variable TTLs — every
  *     acquisition path through this class carries a real expiry.
  *
  * [[StreamGuard]] completes the loop on the plan side: under the
  * `GRAFT_GUARD_REQUIRE_GUARDED_TWS` policy (default ON) a STREAMING
  * `transformWithState` whose processor is not a
  * `GuardedStatefulProcessor` is refused at admission, clocked mode or
  * not — so the TTL-less-but-clocked shape that used to slip through is
  * now caught at `admit`, before `start()`.
  *
  * (`getHandle`/`setHandle` are final in Spark's `StatefulProcessor`, so
  * a determined subclass CAN still reach the raw handle; the guard's bar
  * is the honest-mistake — the copied-and-edited processor — not a
  * hostile one, same as PlanGuard's byte thresholds.)
  */
abstract class GuardedStatefulProcessor[K, I, O](val stateTtl: TTLConfig)
    extends StatefulProcessor[K, I, O] {

  GuardedStatefulProcessor.requirePositive(stateTtl,
    "GuardedStatefulProcessor requires a positive state TTL at construction")

  /** Acquire a ValueState bound by the processor's [[stateTtl]]. */
  protected final def ttlValueState[T](name: String, enc: Encoder[T]): ValueState[T] =
    getHandle.getValueState(name, enc, stateTtl)

  /** Acquire a ListState bound by the processor's [[stateTtl]]. */
  protected final def ttlListState[T](name: String, enc: Encoder[T]): ListState[T] =
    getHandle.getListState(name, enc, stateTtl)

  /** Acquire a MapState bound by the processor's [[stateTtl]]. */
  protected final def ttlMapState[MK, MV](name: String, kEnc: Encoder[MK],
                                          vEnc: Encoder[MV]): MapState[MK, MV] =
    getHandle.getMapState(name, kEnc, vEnc, stateTtl)

  /** The engine handle with TTL enforcement: acquisition overloads refuse
    * `TTLConfig.NONE` (and null/zero/negative TTLs); everything else
    * forwards. Use this instead of `getHandle` when state variables need
    * DIFFERENT TTLs — the per-variable TTL must still be a real one. */
  protected final def guardedHandle: StatefulProcessorHandle = new StatefulProcessorHandle {
    private def h: StatefulProcessorHandle = getHandle
    // NOTE: req() runs BEFORE the handle is touched in every override —
    // Scala evaluates the receiver before arguments, so `h.f(req(x))`
    // would hit an uninitialized handle first and mask the refusal.
    private def req(ttl: TTLConfig): TTLConfig = {
      GuardedStatefulProcessor.requirePositive(ttl,
        "guardedHandle refuses TTL-less state acquisition — pass a positive TTLConfig " +
          "(or use ttlValueState/ttlListState/ttlMapState for the constructor TTL)")
      ttl
    }
    override def getValueState[T](name: String, enc: Encoder[T], ttl: TTLConfig): ValueState[T] =
      { val t = req(ttl); h.getValueState(name, enc, t) }
    override def getValueState[T](name: String, ttl: TTLConfig)(
        implicit enc: Encoder[T]): ValueState[T] =
      { val t = req(ttl); h.getValueState(name, enc, t) }
    override def getListState[T](name: String, enc: Encoder[T], ttl: TTLConfig): ListState[T] =
      { val t = req(ttl); h.getListState(name, enc, t) }
    override def getListState[T](name: String, ttl: TTLConfig)(
        implicit enc: Encoder[T]): ListState[T] =
      { val t = req(ttl); h.getListState(name, enc, t) }
    override def getMapState[MK, MV](name: String, kEnc: Encoder[MK], vEnc: Encoder[MV],
                                     ttl: TTLConfig): MapState[MK, MV] =
      { val t = req(ttl); h.getMapState(name, kEnc, vEnc, t) }
    override def getMapState[MK, MV](name: String, ttl: TTLConfig)(
        implicit kEnc: Encoder[MK], vEnc: Encoder[MV]): MapState[MK, MV] =
      { val t = req(ttl); h.getMapState(name, kEnc, vEnc, t) }
    override def getQueryInfo(): QueryInfo = h.getQueryInfo()
    override def registerTimer(expiryTimestampMs: Long): Unit = h.registerTimer(expiryTimestampMs)
    override def deleteTimer(expiryTimestampMs: Long): Unit = h.deleteTimer(expiryTimestampMs)
    override def listTimers(): Iterator[Long] = h.listTimers()
    override def deleteIfExists(stateName: String): Unit = h.deleteIfExists(stateName)
  }
}

object GuardedStatefulProcessor {
  private[streaming] def requirePositive(ttl: TTLConfig, rule: String): Unit = {
    val ok = ttl != null && ttl.ttlDuration != null &&
      !ttl.ttlDuration.isNegative && !ttl.ttlDuration.isZero
    if (!ok) throw new IllegalArgumentException(
      s"$rule (got ${if (ttl == null) "null" else ttl.toString}): unbounded custom state " +
        "grows with uptime, not data size — give every state variable an expiry")
  }
}
