package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}
import graft.model.Tables

/** PlanGuard semantics: stats-aware findings (shape alone never flags),
  * fatal admission on expensive loop joins, and the registry-wide audit —
  * every registered production plan admits under the default policy. */
class PlanGuardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def li = Tables.lineitem(spark, d)

  /** Thresholds scaled to the KB-sized smoke corpus (sf0.001 lineitem is
    * ~114 KB on disk): the guard reads logical size estimates, so tests
    * exercise the rules by shrinking the policy, not by growing data. */
  private val tiny = PlanGuard.Policy(
    maxLoopBuildBytes = 10L << 10,
    maxGlobalWindowBytes = 10L << 10,
    maxGlobalSortBytes = 10L << 10,
    forbidUdfs = true)

  test("clean keyed aggregate lints empty under the tiny policy") {
    val df = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(PlanGuard.lint(df, tiny).isEmpty)
    assert(PlanGuard.admit(df, tiny) eq df)
  }

  test("sanctioned 1-row-broadcast scalar attach passes: loop join by shape, sliver by size") {
    val stats = li.agg(avg("l_quantity").as("mean_q"))
    val df = li.crossJoin(broadcast(stats)).filter(col("l_quantity") > col("mean_q"))
    assert(!PlanGuard.lint(df, tiny).exists(_.rule == "loop-join"),
      PlanGuard.lint(df, tiny).mkString("; "))
  }

  test("fact×fact cross join is a fatal loop-join; admit throws PlanRejected") {
    val df = li.select(col("l_orderkey").as("a")).crossJoin(li.select(col("l_orderkey").as("b")))
    val fs = PlanGuard.lint(df, tiny)
    assert(fs.exists(f => f.rule == "loop-join" && f.fatal), fs.mkString("; "))
    val e = intercept[PlanGuard.PlanRejected](PlanGuard.admit(df, tiny))
    assert(e.getMessage.contains("loop-join"))
  }

  test("non-equi range condition over non-sliver sides flags; adding an equi conjunct clears it") {
    val a = li.select(col("l_orderkey").as("ka"), col("l_quantity").as("qa"))
    val b = li.select(col("l_orderkey").as("kb"), col("l_quantity").as("qb"))
    val pureRange = a.join(b, col("qa") < col("qb"))
    assert(PlanGuard.lint(pureRange, tiny).exists(_.rule == "loop-join"))
    val equiPlusRange = a.join(b, col("ka") === col("kb") && col("qa") < col("qb"))
    assert(!PlanGuard.lint(equiPlusRange, tiny).exists(_.rule == "loop-join"),
      "an equi conjunct makes this hash-joinable — must not flag")
  }

  test("unpartitioned window over a non-sliver child warns; partitioned twin is clean") {
    import org.apache.spark.sql.expressions.Window
    val global = li.withColumn("rn",
      row_number().over(Window.orderBy("l_orderkey", "l_linenumber")))
    assert(PlanGuard.lint(global, tiny).exists(_.rule == "global-window"))
    // warn-severity: admit still passes
    PlanGuard.admit(global, tiny.copy(forbidUdfs = false))
    val keyed = li.withColumn("rn",
      row_number().over(Window.partitionBy("l_orderkey").orderBy("l_linenumber")))
    assert(!PlanGuard.lint(keyed, tiny).exists(_.rule == "global-window"))
  }

  test("total sort over a non-sliver child warns; sliver sort is clean") {
    assert(PlanGuard.lint(li.orderBy("l_orderkey"), tiny).exists(_.rule == "global-sort"))
    val sliver = li.groupBy("l_returnflag").agg(count(lit(1)).as("n")).orderBy("l_returnflag")
    assert(!PlanGuard.lint(sliver, PlanGuard.Policy.default).exists(_.rule == "global-sort"))
  }

  test("ScalaUDF flags; fatal only under forbidUdfs") {
    val plusOne = udf((x: Double) => x + 1.0)
    val df = li.select(plusOne(col("l_quantity")).as("q1"))
    val strict = PlanGuard.lint(df, tiny)
    assert(strict.exists(f => f.rule == "udf" && f.fatal), strict.mkString("; "))
    intercept[PlanGuard.PlanRejected](PlanGuard.admit(df, tiny))
    val lax = PlanGuard.lint(df, tiny.copy(forbidUdfs = false))
    assert(lax.exists(f => f.rule == "udf" && !f.fatal))
    PlanGuard.admit(df, tiny.copy(forbidUdfs = false))
  }

  test("registry audit: every registered production plan admits under the default policy") {
    // the engine holds its own surface to the bar it offers deployments:
    // no registered query plans a non-sliver nested loop or a ScalaUDF
    val bad = SparkEntry.specs.flatMap { s =>
      val findings =
        try PlanGuard.lint(s.production(spark, d),
          PlanGuard.Policy.default.copy(forbidUdfs = true))
        catch { case e: Throwable => Seq(PlanGuard.Finding(
          "lint-error", fatal = true, s.name, e.toString)) }
      findings.filter(_.fatal).map(f => s.name -> f)
    }
    assert(bad.isEmpty, bad.map { case (n, f) => s"$n: [${f.rule}] ${f.detail}" }
      .mkString("\n"))
  }
}
