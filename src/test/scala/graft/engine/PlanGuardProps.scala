package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.TestSpark

/** PlanGuard's loop-join detection checked against Spark's OWN planner:
  * for a random join condition, the guard must flag (at a zero build
  * threshold) exactly when Catalyst itself fails to extract equi keys and
  * falls back to a nested-loop physical join. This pins the detector to
  * the planner's ExtractEquiJoinKeys semantics instead of to a hand-rolled
  * re-implementation of them — if a Spark upgrade changes what counts as
  * hash-joinable, the property fails loudly. */
object PlanGuardProps extends Properties("graft.planguard") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val left = spark.range(64)
    .select(col("id").as("ka"), (col("id") % 7).as("va"))
  private lazy val right = spark.range(64)
    .select(col("id").as("kb"), (col("id") % 5).as("vb"))

  /** Leaf predicates spanning the interesting classes: plain equi,
    * expression equi, pure range, one-sided, same-side equi, and an
    * OR-bundled pseudo-equi (hash-joinable by NONE of Spark's
    * strategies). */
  private def leaves: Gen[Column] = Gen.oneOf(
    Gen.const(col("ka") === col("kb")),
    Gen.const(col("ka") + 1 === col("kb")),
    Gen.const(col("va") < col("vb")),
    Gen.const(col("ka") > lit(3)),
    Gen.const(col("ka") === col("va")),
    Gen.const(col("ka") === col("kb") || col("va") === col("vb")))

  private def conditions: Gen[Column] = for {
    n <- Gen.chooseNum(1, 3)
    ls <- Gen.listOfN(n, leaves)
  } yield ls.reduce(_ && _)

  property("loop-join flags exactly when Catalyst plans a nested loop") =
    forAll(conditions) { cond =>
      val joined = left.join(right, cond)
      val physical = joined.queryExecution.sparkPlan.toString
      val plannerLoops = physical.contains("BroadcastNestedLoop") ||
        physical.contains("CartesianProduct")
      val zeroThreshold = PlanGuard.Policy(maxLoopBuildBytes = 0, assumeAggSlivers = false)
      val guardFlags = PlanGuard.lint(joined, zeroThreshold)
        .exists(_.rule == "loop-join")
      guardFlags == plannerLoops
    }

  /** Grouping-set shapes spanning the Expand-producing classes (rollup,
    * cube, sliver-first rollup) and the Expand-free ones (plain group-by,
    * single distinct — planned without Expand). The multi-distinct class
    * (physical Expand, deliberately NOT flagged: its replication is
    * unavoidable and dedup-capped) is pinned in PlanGuardSpec instead. */
  private def aggShapes: Gen[org.apache.spark.sql.DataFrame] = Gen.oneOf(
    Gen.const(left.groupBy("va").agg(sum("ka").as("s"))),
    Gen.const(left.rollup("va", "ka").agg(sum("ka").as("s"))),
    Gen.const(left.cube("va", "ka").agg(count(lit(1)).as("n"))),
    Gen.const(left.groupBy("va").agg(countDistinct("ka").as("d"))),
    Gen.const(left.groupBy("va").agg(sum("ka").as("s"))
      .rollup("va").agg(sum("s").as("t"))))

  property("expand-over-fact flags exactly when Catalyst's physical plan contains an Expand") =
    forAll(aggShapes) { df =>
      val physical = df.queryExecution.sparkPlan.toString
      val plannerExpands = physical.contains("Expand")
      val zeroThreshold = PlanGuard.Policy(maxExpandBytes = 0, assumeAggSlivers = false)
      val guardFlags = PlanGuard.lint(df, zeroThreshold)
        .exists(_.rule == "expand-over-fact")
      guardFlags == plannerExpands
    }
}
