package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Whole-registry physical-plan drift CI (VERDICT r17 ask #8): every
  * registered production query's plan is reduced to a golden FINGERPRINT
  * — join strategies, shuffle widths, broadcast count, aggregate/expand/
  * window/sort counts, and per-scan pushdown + dynamic-pruning flags —
  * and compared against `src/test/resources/plan_fingerprints.json`.
  *
  * This turns PlanSpec's hand-picked pin set into registry-wide coverage:
  * a Spark upgrade, a config change, or an innocent-looking refactor that
  * silently turns a broadcast join into a sort-merge join, drops a
  * pushed filter, widens a stateful shuffle (the round-17 st9 regression:
  * AQE initialPartitionNum leaking into batch transformWithState's
  * state-store count — exactly a shuffle-width fingerprint change), or
  * grows an Expand, fails HERE at test time instead of surfacing as a
  * bench regression a round later.
  *
  * The fingerprint reads the adaptive plan's INITIAL physical plan
  * (`AdaptiveSparkPlanExec.executedPlan` before any execution): it is
  * deterministic without running the query, and unlike
  * `queryExecution.sparkPlan` (which under AQE carries NO exchanges —
  * EnsureRequirements runs inside AQE's stage planning) it shows every
  * Exchange with its width, so a shuffle-width regression of the st9
  * class is visible. AQE's runtime coalescing/re-planning reacts to
  * data volumes this tiny corpus does not exercise. Paths, expression
  * ids, and stats never enter the fingerprint, so it is stable across
  * machines and reruns at the same Spark version + testdata.
  *
  * REGENERATION (the documented path): after a DELIBERATE plan change,
  *   GRAFT_REGEN_PLAN_FINGERPRINTS=1 sbt "testOnly graft.PlanFingerprintSpec"
  * rewrites the golden file (sorted, one query per line — the git diff of
  * the regen IS the plan-change review artifact), and the commit that
  * changes the plan carries it.
  */
class PlanFingerprintSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir
  private val goldenPath =
    java.nio.file.Paths.get("src/test/resources/plan_fingerprints.json")

  /** Recursive traversal incl. subquery plans (DPP/scalar subqueries
    * live in expressions, not children). In the PRE-adaptive sparkPlan,
    * subquery expressions can still hold LOGICAL plans (they are planned
    * during the executedPlan preparations), so `SparkPlan.subqueries`'s
    * unconditional cast throws — collect only the already-physical ones;
    * the logical ones' structure is not part of the chosen plan yet. */
  private def walk(p0: SparkPlan): Seq[SparkPlan] = {
    val p = p0 match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan // pre-execution: the initial plan, exchanges in place
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
      case other => other
    }
    val subs = p.expressions.flatMap(_.collect {
      case e: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] => e.plan
    }).collect { case sp: SparkPlan => sp }
    p +: (p.children ++ subs).flatMap(walk)
  }

  def fingerprint(df: DataFrame): String = {
    val nodes = walk(df.queryExecution.executedPlan)
    val joins = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        // ExistenceJoin prints its attribute (exists#<exprId>) — strip the
        // per-analysis id, or every fresh analysis would "drift"
        s"${j.nodeName}:${j.joinType.toString.replaceAll("#\\d+", "")}"
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec =>
        "CartesianProduct"
    }
    val shuffleWidths = nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning.numPartitions
    }
    val bcasts = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec])
    def count(pred: SparkPlan => Boolean) = nodes.count(pred)
    val aggs = count(_.nodeName.contains("Aggregate"))
    val expands = count(_.nodeName.contains("Expand"))
    val windows = count(n => n.nodeName.contains("Window") ||
      n.nodeName.contains("RunningWindowFunction"))
    val sorts = count(_.nodeName == "Sort")
    val limits = count(_.nodeName.contains("TakeOrderedAndProject"))
    val scans = nodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        val pushed = s.dataFilters.nonEmpty
        val pf = s.partitionFilters.nonEmpty
        val dpp = s.partitionFilters.exists(
          _.toString.toLowerCase.contains("dynamicpruning"))
        s"pushed=$pushed,part=$pf,dpp=$dpp"
    }
    s"joins=[${joins.mkString(";")}] shuffles=[${shuffleWidths.mkString(",")}] " +
      s"bcast=$bcasts agg=$aggs expand=$expands window=$windows sort=$sorts " +
      s"topk=$limits scans=[${scans.mkString(";")}]"
  }

  private def computeAll(): Map[String, String] =
    SparkEntry.specs.map { s =>
      s.name -> (try fingerprint(s.production(spark, d))
                 catch { case e: Throwable => s"ERROR: ${e.getClass.getName}" })
    }.toMap

  private def writeGolden(fps: Map[String, String]): Unit = {
    val body = fps.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""  "$k": "$v"""" }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.createDirectories(goldenPath.getParent)
    java.nio.file.Files.writeString(goldenPath, body)
  }

  private def readGolden(): Map[String, String] = {
    import org.json4s._
    jackson.JsonMethods.parse(java.nio.file.Files.readString(goldenPath)) match {
      case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty
    }
  }

  test("registry-wide physical-plan fingerprints match the golden file") {
    val fps = computeAll()
    val errored = fps.filter(_._2.startsWith("ERROR"))
    assert(errored.isEmpty, s"fingerprinting failed: $errored")
    if (sys.env.get("GRAFT_REGEN_PLAN_FINGERPRINTS").contains("1")) {
      writeGolden(fps)
      info(s"regenerated ${fps.size} fingerprints at $goldenPath")
    } else {
      assert(java.nio.file.Files.exists(goldenPath),
        s"no golden fingerprints at $goldenPath — regenerate with " +
          "GRAFT_REGEN_PLAN_FINGERPRINTS=1")
      val golden = readGolden()
      val missing = fps.keySet -- golden.keySet
      val stale = golden.keySet -- fps.keySet
      val drifted = fps.collect {
        case (n, f) if golden.get(n).exists(_ != f) =>
          s"$n:\n  golden: ${golden(n)}\n  now:    $f"
      }
      assert(missing.isEmpty && stale.isEmpty && drifted.isEmpty,
        s"plan drift detected — if DELIBERATE, regenerate the golden file " +
          s"(GRAFT_REGEN_PLAN_FINGERPRINTS=1 sbt 'testOnly graft.PlanFingerprintSpec') " +
          s"and commit the diff.\n" +
          (if (missing.nonEmpty) s"new queries without a golden entry: $missing\n" else "") +
          (if (stale.nonEmpty) s"golden entries for unregistered queries: $stale\n" else "") +
          drifted.mkString("\n"))
    }
  }
}
