package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Sort, Window}

/** Batch-plan ADMISSION GUARD — the compile-time twin of
  * [[graft.streaming.Admission]]: lint a DataFrame's OPTIMIZED plan for the
  * shapes that are survivable on a laptop corpus and fatal at 100 TB, and
  * refuse to submit the ones policy marks fatal. The reference has no
  * equivalent (its pandas fallback happily materializes anything); this is
  * the engine-native enforcement of the discipline PlanSpec pins
  * query-by-query, packaged as a library call a pipeline can run on ANY
  * plan before execution — including ad-hoc SQL the test suite never saw.
  *
  * Rules are STATS-AWARE, not shape-based: the registry's sanctioned
  * 1-row-broadcast scalar attaches (`crossJoin(broadcast(stats))`) and
  * dim×dim crosses (j7: region×nation) are loop joins by shape but slivers
  * by size — a shape rule would ban them for no scale reason. Each rule
  * reads Catalyst's logical size estimates (`plan.stats.sizeInBytes` —
  * parquet footer totals propagated through filters/projects), so the
  * guard's verdict scales with the data the way the hazard does.
  *
  * Rules:
  *   - `loop-join` (fatal): a Join with NO equi-join conjunct — cross, or a
  *     condition Spark can only evaluate as a nested loop — where the
  *     SMALLER side exceeds `maxLoopBuildBytes`. Per-row re-probe of a
  *     non-sliver build is the single worst 100 TB plan shape.
  *   - `global-window` (warn): a Window with an EMPTY partitionSpec over a
  *     child above `maxGlobalWindowBytes` — every row moves to ONE task
  *     (WindowExec's single-partition collapse), the quiet cluster killer.
  *     Day-grain cumulative slivers pass; a fact-grain running total fails.
  *   - `global-sort` (warn): a total Sort over a child above
  *     `maxGlobalSortBytes` — legitimate for oracle determinism and top-k
  *     reports on aggregate slivers, a full-corpus range shuffle otherwise.
  *   - `udf` (warn; fatal when `forbidUdfs`): any ScalaUDF in the plan —
  *     opaque to codegen, filter pushdown, and null-safety inference; the
  *     engine's own surface is UDF-free (SURVEY §2.11) and a deployment
  *     can hold ad-hoc queries to the same bar.
  *
  * `lint` returns findings; `admit` throws on the fatal ones and returns
  * the frame unchanged otherwise, so it drops into any pipeline as a
  * pass-through stage: `PlanGuard.admit(df).write.parquet(...)`.
  */
object PlanGuard {

  final case class Finding(rule: String, fatal: Boolean, node: String, detail: String)

  /** Byte thresholds are on Catalyst's logical size estimates. Defaults
    * target executor-memory-scale hazards; tighten them in tests or strict
    * deployments (see [[Policy.strict]]). */
  final case class Policy(
      maxLoopBuildBytes: Long = 8L << 20,
      maxGlobalWindowBytes: Long = 64L << 20,
      maxGlobalSortBytes: Long = 256L << 20,
      forbidUdfs: Boolean = false)

  object Policy {
    val default: Policy = Policy()
    /** Sliver-scale thresholds: anything beyond a broadcastable build, a
      * dashboard-sized window input, or a report-sized sort input flags.
      * This is the setting the engine's own registry is audited under at
      * test scale (PlanGuardSpec), where every table is tiny. */
    val strict: Policy = Policy(
      maxLoopBuildBytes = 1L << 20,
      maxGlobalWindowBytes = 4L << 20,
      maxGlobalSortBytes = 32L << 20,
      forbidUdfs = true)
  }

  final class PlanRejected(val findings: Seq[Finding])
    extends IllegalStateException(
      s"plan rejected by PlanGuard: ${findings.map(f => s"[${f.rule}] ${f.detail}").mkString("; ")}")

  /** True when `cond` contains a top-level equi conjunct joining the two
    * sides — the predicate a hash or sort-merge join can key on. */
  private def hasEquiConjunct(cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    def splitConjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
        splitConjuncts(a) ++ splitConjuncts(b)
      case other => Seq(other)
    }
    val leftOut = left.outputSet
    val rightOut = right.outputSet
    def spansBothSides(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(leftOut) && b.references.subsetOf(rightOut) &&
        a.references.nonEmpty && b.references.nonEmpty) ||
      (a.references.subsetOf(rightOut) && b.references.subsetOf(leftOut) &&
        a.references.nonEmpty && b.references.nonEmpty)
    splitConjuncts(cond).exists {
      case EqualTo(a, b)       => spansBothSides(a, b)
      case EqualNullSafe(a, b) => spansBothSides(a, b)
      case _                   => false
    }
  }

  private def bytes(p: LogicalPlan): BigInt = p.stats.sizeInBytes

  private def mb(n: BigInt): String = f"${n.toDouble / (1 << 20)}%.1f MiB"

  /** Lint the optimized logical plan. Pure analysis — never executes. */
  def lint(df: DataFrame, policy: Policy = Policy.default): Seq[Finding] = {
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: Join if j.condition.forall(c => !hasEquiConjunct(c, j.left, j.right)) =>
        val build = bytes(j.left).min(bytes(j.right))
        (j, build)
    }.collect { case (j, build) if build > policy.maxLoopBuildBytes =>
      Finding("loop-join", fatal = true, j.joinType.sql,
        s"${j.joinType.sql} join with no equi-key: smaller side ~${mb(build)} " +
          s"exceeds maxLoopBuildBytes=${mb(policy.maxLoopBuildBytes)} — per-row nested-loop probe")
    }
    val windows = plan.collect {
      case w: Window if w.partitionSpec.isEmpty && bytes(w.child) > policy.maxGlobalWindowBytes =>
        Finding("global-window", fatal = false, "Window",
          s"unpartitioned window over ~${mb(bytes(w.child))} collapses to ONE task " +
            s"(> maxGlobalWindowBytes=${mb(policy.maxGlobalWindowBytes)})")
    }
    val sorts = plan.collect {
      case s: Sort if s.global && bytes(s.child) > policy.maxGlobalSortBytes =>
        Finding("global-sort", fatal = false, "Sort",
          s"total sort over ~${mb(bytes(s.child))} " +
            s"(> maxGlobalSortBytes=${mb(policy.maxGlobalSortBytes)}) — full range shuffle")
    }
    val udfs = plan.collect {
      case node if node.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])) =>
        Finding("udf", fatal = policy.forbidUdfs, node.nodeName,
          "ScalaUDF in the plan: opaque to codegen and pushdown")
    }
    joins ++ windows ++ sorts ++ udfs
  }

  /** Pass-through admission: returns `df` unchanged when no FATAL finding
    * exists, throws [[PlanRejected]] (listing every finding) otherwise. */
  def admit(df: DataFrame, policy: Policy = Policy.default): DataFrame = {
    val findings = lint(df, policy)
    if (findings.exists(_.fatal)) throw new PlanRejected(findings)
    df
  }
}
