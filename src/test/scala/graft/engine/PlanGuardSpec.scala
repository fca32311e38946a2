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

  test("expand-over-fact: rollup directly over a joined fact flags; fatal under expandFatal") {
    // the ds2 defect, reconstructed: Spark plans ROLLUP as an Expand that
    // replicates the JOINED FACT (levels+1)× before partial aggregation
    val cust = Tables.customer(spark, d)
    val offender = Tables.orders(spark, d)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .rollup(col("c_mktsegment"), col("o_orderpriority"))
      .agg(sum(col("o_totalprice")).as("spend"))
    val expandTiny = PlanGuard.Policy.default.copy(maxExpandBytes = 1L)
    val warn = PlanGuard.lint(offender, expandTiny)
    assert(warn.exists(f => f.rule == "expand-over-fact" && !f.fatal), warn.mkString("; "))
    PlanGuard.admit(offender, expandTiny) // warn severity: still admits
    val strict = expandTiny.copy(expandFatal = true)
    val e = intercept[PlanGuard.PlanRejected](PlanGuard.admit(offender, strict))
    assert(e.getMessage.contains("expand-over-fact"))
  }

  test("expand-over-fact: aggregate-before-Expand (the engine's own discipline) admits at any threshold") {
    // sliver-first form: fact → (segment, priority) decimal partials ONCE,
    // rollup over the sliver — Expand's child is aggregate-rooted
    val cust = Tables.customer(spark, d)
    val sliverFirst = Tables.orders(spark, d)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(sum(col("o_totalprice")).as("part"))
      .rollup(col("c_mktsegment"), col("o_orderpriority"))
      .agg(sum(col("part")).as("spend"))
    val strict = PlanGuard.Policy.default.copy(maxExpandBytes = 1L, expandFatal = true)
    val fs = PlanGuard.lint(sliverFirst, strict)
    assert(!fs.exists(_.rule == "expand-over-fact"), fs.mkString("; "))
    PlanGuard.admit(sliverFirst, strict)
  }

  test("expand-over-fact: the multi-distinct rewrite's Expand is exempt — unavoidable and dedup-capped") {
    // `count(DISTINCT a), count(DISTINCT b)` plans as Expand 2× capped by a
    // pure-dedup partial aggregate (RewriteDistinctAggregates); no
    // single-pass sliver-first equivalent exists, so the guard must not
    // flag Spark's best plan — even at a zero threshold
    val df = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("d1"),
        countDistinct(col("l_partkey")).as("d2"))
    assert(df.queryExecution.sparkPlan.toString.contains("Expand"),
      "precondition: multi-distinct must plan an Expand")
    val zero = PlanGuard.Policy.default.copy(
      maxExpandBytes = 0L, expandFatal = true, assumeAggSlivers = false)
    val fs = PlanGuard.lint(df, zero)
    assert(!fs.exists(_.rule == "expand-over-fact"), fs.mkString("; "))
  }

  test("expand-over-fact: MIXED distinct + regular aggregates are exempt too") {
    // ADVICE r16: `count(DISTINCT a), count(DISTINCT b), sum(c)` — the
    // rewrite's first aggregate carries the partial regular aggregates, so
    // a purity test misses it; the structural gid-grouping detection must
    // still recognize the Expand as Catalyst's unavoidable rewrite
    val df = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("d1"),
        countDistinct(col("l_partkey")).as("d2"),
        sum(col("l_quantity")).as("s"))
    assert(df.queryExecution.sparkPlan.toString.contains("Expand"),
      "precondition: mixed multi-distinct must plan an Expand")
    val zero = PlanGuard.Policy.default.copy(
      maxExpandBytes = 0L, expandFatal = true, assumeAggSlivers = false)
    val fs = PlanGuard.lint(df, zero)
    assert(!fs.exists(_.rule == "expand-over-fact"), fs.mkString("; "))
    PlanGuard.admit(df, zero)
    // and the fixable offender class — rollup straight over the fact —
    // must STILL flag under the structural detection (its grouping id is
    // spark_grouping_id, not the rewrite's gid)
    val rollup = li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("q"))
    assert(PlanGuard.lint(rollup, zero).exists(_.rule == "expand-over-fact"),
      "rollup-over-fact must not be swept up by the multi-distinct exemption")
  }

  test("subquery traversal: a ScalaUDF hiding inside a scalar subquery is found") {
    spark.udf.register("graft_guard_test_udf", (x: Double) => x + 1.0)
    li.createOrReplaceTempView("guard_li")
    val df = spark.sql(
      """SELECT l_orderkey FROM guard_li
        | WHERE l_quantity > (SELECT graft_guard_test_udf(avg(l_quantity)) FROM guard_li)""".stripMargin)
    val fs = PlanGuard.lint(df, tiny)
    assert(fs.exists(f => f.rule == "udf" && f.fatal), fs.mkString("; "))
    intercept[PlanGuard.PlanRejected](PlanGuard.admit(df, tiny))
  }

  test("subquery traversal: a fact×fact cross join inside a scalar subquery is a fatal loop-join") {
    li.createOrReplaceTempView("guard_li")
    val df = spark.sql(
      """SELECT l_orderkey FROM guard_li
        | WHERE l_quantity > (SELECT max(a.l_quantity * b.l_quantity)
        |                       FROM guard_li a CROSS JOIN guard_li b)""".stripMargin)
    val fs = PlanGuard.lint(df, tiny.copy(forbidUdfs = false))
    assert(fs.exists(f => f.rule == "loop-join" && f.fatal), fs.mkString("; "))
  }

  test("CBO-off sliver exemption: hazards over aggregate-rooted children don't flag; disabling the exemption restores the byte rule") {
    import org.apache.spark.sql.expressions.Window
    // day-grain cumulative series (the ds3 shape): with CBO off Catalyst
    // estimates the grouped Aggregate at fact size, but the subtree is
    // group-cardinality — must not warn even at a 1-byte threshold
    val daily = li.groupBy("l_shipdate").agg(sum("l_quantity").as("q"))
    val cum = daily.withColumn("c", sum("q").over(
      Window.orderBy("l_shipdate").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val oneByte = PlanGuard.Policy.default.copy(
      maxLoopBuildBytes = 1L, maxGlobalWindowBytes = 1L, maxGlobalSortBytes = 1L)
    assert(!PlanGuard.lint(cum, oneByte).exists(_.rule == "global-window"),
      PlanGuard.lint(cum, oneByte).mkString("; "))
    assert(PlanGuard.lint(cum, oneByte.copy(assumeAggSlivers = false))
      .exists(_.rule == "global-window"),
      "with the exemption off, the 1-byte threshold must flag — else the exemption isn't load-bearing")
    // a legitimate non-equi join over two aggregated slivers must admit
    val a = daily.select(col("l_shipdate").as("da"), col("q").as("qa"))
    val b = daily.select(col("l_shipdate").as("db"), col("q").as("qb"))
    val bandJoin = a.join(b, col("qa") < col("qb"))
    assert(!PlanGuard.lint(bandJoin, oneByte).exists(_.rule == "loop-join"))
    assert(PlanGuard.lint(bandJoin, oneByte.copy(assumeAggSlivers = false))
      .exists(f => f.rule == "loop-join" && f.fatal))
    // explode above the aggregate breaks the exemption: Generate's row
    // multiplier is unbounded, so the subtree is no longer group-scale
    val exploded = daily.select(explode(array(col("q"), col("q"))).as("q2"))
      .withColumn("rn", row_number().over(Window.orderBy("q2")))
    assert(PlanGuard.lint(exploded, oneByte).exists(_.rule == "global-window"))
  }

  test("CBO remedy pinned: ANALYZEd catalog stats give Aggregates row-count-aware estimates") {
    // the guard's documented alternative to the CBO-off sliver exemption:
    // with spark.sql.cbo.enabled + ANALYZE ... FOR COLUMNS, Catalyst's
    // aggregate estimate carries rowCount = grouping-key cardinality (the
    // genuine sliver), so byte thresholds judge post-aggregation subtrees
    // truthfully at any scale — where the size-only visitor's width-ratio
    // shrinkage still multiplies by FACT row count
    spark.sql("DROP TABLE IF EXISTS cbo_guard_li")
    try {
      li.write.saveAsTable("cbo_guard_li")
      spark.sql("ANALYZE TABLE cbo_guard_li COMPUTE STATISTICS FOR COLUMNS l_returnflag")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val agg = spark.table("cbo_guard_li")
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val stats = agg.queryExecution.optimizedPlan.stats
      val factRows = spark.table("cbo_guard_li").count()
      assert(stats.rowCount.isDefined,
        s"CBO must attach a row count to the aggregate, got $stats")
      assert(stats.rowCount.get.toLong < factRows / 10,
        s"aggregate row estimate ${stats.rowCount} should be group-cardinality, " +
          s"not the $factRows fact rows")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS cbo_guard_li")
    }
  }

  test("registry audit: every registered production plan admits under the default policy") {
    // the engine holds its own surface to the bar it offers deployments:
    // no registered query plans a non-sliver nested loop or a ScalaUDF
    val bad = SparkEntry.specs.flatMap { s =>
      val findings =
        try PlanGuard.lint(s.production(spark, d),
          PlanGuard.Policy.default.copy(forbidUdfs = true, expandFatal = true))
        catch { case e: Throwable => Seq(PlanGuard.Finding(
          "lint-error", fatal = true, s.name, e.toString)) }
      findings.filter(_.fatal).map(f => s.name -> f)
    }
    assert(bad.isEmpty, bad.map { case (n, f) => s"$n: [${f.rule}] ${f.detail}" }
      .mkString("\n"))
  }
}
