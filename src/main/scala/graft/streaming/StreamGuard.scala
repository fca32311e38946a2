package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, EventTimeWatermark, FlatMapGroupsWithState, Join, LogicalPlan, TransformWithState}
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types.{StructType, TimestampType}

/** STREAMING-plan admission guard — [[graft.engine.PlanGuard]]'s twin for
  * the ingest side (r15 verdict ask #9): lint a streaming DataFrame
  * BEFORE `start()` for the state shapes Spark happily plans but that
  * grow without bound at production ingest rates. Spark's own analyzer
  * refuses SOME of these (append-mode aggregation without a watermark),
  * but deliberately permits the rest — an unwatermarked stream-stream
  * INNER join, update/complete-mode keyed aggregation, and plain
  * `dropDuplicates` all run forever while their state grows with every
  * event ever seen. On a laptop replay that is invisible; at 100 TB/day
  * it is the pager at 3am. The guard turns the engine's own watermark
  * discipline (every registry stream bounds its state — the soak series
  * proves eviction actually happens) into a machine check on AD-HOC
  * streams.
  *
  * Rules (on the ANALYZED plan — `EventTimeWatermark` survives there):
  *   - `unbounded-agg` (fatal): a streaming Aggregate with no watermark
  *     anywhere below it — per-key state is created on first sight of a
  *     key and never expires.
  *   - `unbounded-dedup` (fatal): a streaming Deduplicate with no
  *     watermark below — the dedup set IS the stream's history.
  *     (`dropDuplicatesWithinWatermark` plans its own node and carries
  *     its bound by construction.)
  *   - `unbounded-join` (fatal): a stream-stream Join where either side
  *     lacks a watermark, or whose condition carries no cross-side time
  *     bound — an event-time range conjunct or window/timestamp equality
  *     (Spark's two documented state bounds); without both, neither
  *     side's buffered rows can ever be discarded. (Stream-static joins
  *     are stateless and pass untouched.)
  *   - `unbounded-custom-state` (fatal, r16 verdict ask #2): a streaming
  *     `flatMapGroupsWithState`/`mapGroupsWithState` with
  *     GroupStateTimeout.NoTimeout (per-key state with NO expiry path the
  *     plan can prove — exactly as unbounded as a watermark-less
  *     aggregate; the function body MAY call state.remove(), but that is
  *     invisible to the plan and the guard holds ad-hoc custom state to
  *     the machine-checkable bar), or with EventTimeTimeout but no
  *     watermark below (timers can never fire); and a streaming
  *     `transformWithState` under TimeMode.None (no timers can tick and
  *     per-state TTL — the remaining expiry path — requires a clocked
  *     TimeMode, so nothing can ever expire).
  *   - `unguarded-custom-state` (fatal, policy `GRAFT_GUARD_REQUIRE_
  *     GUARDED_TWS`, default ON — r17 verdict ask #3): a streaming
  *     `transformWithState` whose processor is not a
  *     [[GuardedStatefulProcessor]]. Under ProcessingTime/EventTime
  *     modes a processor's TTL lives in runtime TTLConfig per state
  *     VARIABLE, which the plan does not expose — so a raw processor
  *     that skips TTLConfig is plan-invisible unbounded state. The
  *     guarded base makes the bound machine-checkable at the API seam
  *     (positive TTL required at construction; acquisition wrappers
  *     apply it), and this rule funnels streams onto that seam. Set the
  *     env var to `false` to run raw processors at your own risk.
  *
  * All rules are fatal: unlike the batch guard's byte thresholds there
  * is no "small enough" unbounded state — growth is a function of
  * uptime, not data size. `lint` returns findings; `admit` throws
  * [[graft.engine.PlanGuard.PlanRejected]] and otherwise returns the
  * frame unchanged, so it drops in front of any writeStream:
  * `StreamGuard.admit(df).writeStream...start()`.
  */
object StreamGuard {
  import graft.engine.PlanGuard.{Finding, PlanRejected}

  private def hasWatermark(p: LogicalPlan): Boolean =
    p.exists { case _: EventTimeWatermark => true; case _ => false }

  /** A conjunct that lets a stream-stream join discard buffered rows once
    * the opposite watermark passes: a cross-side RANGE over EVENT-TIME
    * typed operands (the interval form `b_ts >= a_ts AND b_ts <= a_ts +
    * INTERVAL …` — both sides stay TimestampType), or cross-side EQUALITY
    * on time windows / timestamps (Spark's other documented state bound —
    * joining on `window(ts) = window(ts)` expires a window's buffered rows
    * when the watermark crosses its end). Ranges over NON-time columns
    * (`a.amount < b.quantity`) derive no state eviction in Spark and must
    * NOT satisfy the guard — the timeTyped check applies to ranges exactly
    * as it does to equalities. */
  private def hasCrossSideTimeBound(cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    val l = left.outputSet
    val r = right.outputSet
    def spans(a: Expression, b: Expression): Boolean =
      (a.references.nonEmpty && b.references.nonEmpty) &&
        ((a.references.subsetOf(l) && b.references.subsetOf(r)) ||
          (a.references.subsetOf(r) && b.references.subsetOf(l)))
    def timeTyped(e: Expression): Boolean = e.dataType match {
      case TimestampType => true
      case s: StructType => // the window() struct: start/end timestamps
        s.fieldNames.contains("start") && s.fieldNames.contains("end") &&
          s.fields.forall(_.dataType == TimestampType)
      case _ => false
    }
    conjuncts(cond).exists {
      case GreaterThan(a, b)        => spans(a, b) && timeTyped(a) && timeTyped(b)
      case GreaterThanOrEqual(a, b) => spans(a, b) && timeTyped(a) && timeTyped(b)
      case LessThan(a, b)           => spans(a, b) && timeTyped(a) && timeTyped(b)
      case LessThanOrEqual(a, b)    => spans(a, b) && timeTyped(a) && timeTyped(b)
      case EqualTo(a, b)            => spans(a, b) && timeTyped(a) && timeTyped(b)
      case _                        => false
    }
  }

  /** Lint the analyzed plan of a (streaming) DataFrame. A batch frame
    * lints empty — the rules only fire on streaming state. */
  def lint(df: DataFrame): Seq[Finding] = {
    val plan = df.queryExecution.analyzed
    if (!plan.isStreaming) return Seq.empty
    val aggs = plan.collect {
      case a: Aggregate if a.isStreaming && !hasWatermark(a.child) =>
        Finding("unbounded-agg", fatal = true, "Aggregate",
          "streaming aggregate with no watermark below it: per-key state never expires " +
            "— withWatermark the event-time column upstream")
    }
    val dedups = plan.collect {
      case d: Deduplicate if d.isStreaming && !hasWatermark(d.child) =>
        Finding("unbounded-dedup", fatal = true, "Deduplicate",
          "streaming dropDuplicates with no watermark below it: the dedup set grows with " +
            "the stream's whole history — watermark upstream or use dropDuplicatesWithinWatermark")
    }
    val joins = plan.collect {
      case j: Join if j.left.isStreaming && j.right.isStreaming &&
          (!hasWatermark(j.left) || !hasWatermark(j.right)) =>
        Finding("unbounded-join", fatal = true, j.joinType.sql,
          "stream-stream join without watermarks on both sides: buffered rows can never be discarded")
      case j: Join if j.left.isStreaming && j.right.isStreaming &&
          !j.condition.exists(hasCrossSideTimeBound(_, j.left, j.right)) =>
        Finding("unbounded-join", fatal = true, j.joinType.sql,
          "stream-stream join without a cross-side time bound (event-time range or " +
            "window/timestamp equality): watermarks alone cannot bound the buffer")
    }
    val custom = plan.collect {
      case f: FlatMapGroupsWithState if f.isStreaming &&
          f.timeout == GroupStateTimeout.NoTimeout =>
        Finding("unbounded-custom-state", fatal = true, "FlatMapGroupsWithState",
          "streaming flatMapGroupsWithState with NoTimeout: per-key state has no " +
            "expiry path the plan can prove — use ProcessingTimeTimeout/EventTimeTimeout " +
            "and evict on state.hasTimedOut")
      case f: FlatMapGroupsWithState if f.isStreaming &&
          f.timeout == GroupStateTimeout.EventTimeTimeout && !hasWatermark(f.child) =>
        Finding("unbounded-custom-state", fatal = true, "FlatMapGroupsWithState",
          "streaming flatMapGroupsWithState with EventTimeTimeout but no watermark " +
            "below: timers can never fire, so state never expires — withWatermark upstream")
      case t: TransformWithState if t.isStreaming &&
          t.timeMode == org.apache.spark.sql.streaming.TimeMode.None() =>
        Finding("unbounded-custom-state", fatal = true, "TransformWithState",
          "streaming transformWithState under TimeMode.None: no timers can tick and " +
            "state TTL requires a clocked TimeMode, so no state can ever expire — " +
            "use TimeMode.ProcessingTime/EventTime with TTLConfig'd state")
      case t: TransformWithState if t.isStreaming &&
          t.timeMode != org.apache.spark.sql.streaming.TimeMode.None() &&
          requireGuardedTws &&
          !t.statefulProcessor.isInstanceOf[GuardedStatefulProcessor[_, _, _]] =>
        Finding("unguarded-custom-state", fatal = true, "TransformWithState",
          s"streaming transformWithState with a raw ${t.statefulProcessor.getClass.getName}: " +
            "per-variable TTLConfig is invisible to the plan, so a processor that skips it " +
            "is unbounded state this guard cannot see — extend " +
            "graft.streaming.GuardedStatefulProcessor (TTL required at construction) or set " +
            "GRAFT_GUARD_REQUIRE_GUARDED_TWS=false to waive")
    }
    aggs ++ dedups ++ joins ++ custom
  }

  /** Policy: require [[GuardedStatefulProcessor]] for streaming
    * transformWithState (default ON; malformed values fail loudly like
    * the rest of the GRAFT_GUARD_* family). */
  private def requireGuardedTws: Boolean =
    sys.env.get("GRAFT_GUARD_REQUIRE_GUARDED_TWS") match {
      case None          => true
      case Some("true")  => true
      case Some("false") => false
      case Some(v) => throw new IllegalArgumentException(
        s"GRAFT_GUARD_REQUIRE_GUARDED_TWS must be true or false, got '$v'")
    }

  /** Pass-through admission: returns `df` unchanged when clean, throws
    * [[graft.engine.PlanGuard.PlanRejected]] otherwise. */
  def admit(df: DataFrame): DataFrame = {
    val findings = lint(df)
    if (findings.exists(_.fatal)) throw new PlanRejected(findings)
    df
  }
}
