package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.QuerySpec.sql
import graft.model.Tables
import graft.ops.Det
import graft.ops.Det.{dsum}

/** TPC-DS-shaped plan classes the TPC-H family (a31/a32, j15–j35) does not
  * exercise: multi-band conditional aggregation collapsing N filtered scans
  * into ONE (Q88), a window function consuming ROLLUP output with
  * GROUPING()-derived partition keys (Q36), a full-outer alignment of two
  * cumulative series built from one fact (Q51), a year-over-year
  * self-join of a keyed aggregate with itself (Q74), an OR-of-EXISTS
  * disjunction (Q10/Q35), a multi-way INTERSECT of grouped key sets
  * (Q38/Q87 — must plan as a LeftSemi chain, never a distinct-union), and
  * a union of two conformed fact families under one rollup (Q5/Q77 —
  * filters/projections pushed through the Union, aggregate-before-Expand
  * held across it). Like the TPC-H fills,
  * these are query *shapes* re-expressed over the test corpus — the point is
  * the PLAN CLASS (what Catalyst must produce for the query to survive
  * 100 TB), not the benchmark's literal schema.
  *
  * Determinism: money through [[graft.ops.Det]] exact-decimal accumulation
  * (SURVEY.md §7.5); cumulative sums accumulate in decimal BEFORE the
  * double surface so running totals are order-independent; every oracle
  * output carries a total ORDER BY.
  */
object DsQueries {
  private def ssum(e: String): String = Det.Sql.dsum(e)

  /** ds9's warehouse layout, materialized once per sfDir (the dd6b/dd8b
    * PersistedState discipline): lineitem written `partitionBy(ship_month)`
    * — the reference's own ingest IS a month-partitioned layout
    * (src/main.py:93-99 loops month files) — plus a tiny month dim
    * (ship_month, yr) derived from the fact's distinct months. The point
    * of splitting dim from fact is the PLAN CLASS: the fact scan must
    * prune partitions via a DYNAMIC-pruning subquery fed by the dim's
    * selective filter, not a static literal filter. Built lazily on first
    * use (Verify), or untimed via QuerySpec.prepare (Bench). */
  private[graft] object PartitionedState {
    private val cache = scala.collection.concurrent.TrieMap.empty[String, String]
    def ensure(s: org.apache.spark.sql.SparkSession, d: String): String =
      cache.getOrElseUpdate(d, {
        val root = java.nio.file.Files.createTempDirectory("graft-dslayout").toString
        val fact = Tables.lineitem(s, d)
          .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
        graft.io.Sinks.parquet(fact, s"$root/lineitem_by_month",
          partitionBy = Seq("ship_month"))
        fact.select(col("ship_month"),
            year(col("l_shipdate")).cast("long").as("yr")).distinct()
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$root/month_dim")
        root
      })
  }

  /** Q10/Q35 body — shared between the DuckDB oracle (bare table names)
    * and the Spark run (prefixed temp views), the j24/j29 single-source
    * discipline: the two sides can never drift. */
  private def q10Text(t: String => String): String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_customers
       | FROM ${t("customer")}
       | WHERE EXISTS (SELECT 1 FROM ${t("orders")}
       |         WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
       |    OR EXISTS (SELECT 1 FROM ${t("orders")} o JOIN ${t("lineitem")} l
       |         ON o.o_orderkey = l.l_orderkey
       |         WHERE o.o_custkey = c_custkey AND l.l_returnflag = 'R')
       | GROUP BY c_mktsegment
       | ORDER BY c_mktsegment""".stripMargin.replace("\n", "")

  val all: Seq[QuerySpec] = Seq(

    sql("ds1_quantity_bands",
      "DS1: TPC-DS Q88-shaped MULTI-BAND COUNTS — eight conditional aggregates (count + exact revenue per quantity band) that a naive engine runs as four separate filtered scans and a correct one collapses into ONE pass: a single pushed base predicate (discount window) reaches the parquet scan, the band split happens in the aggregate via CASE, and the output is one row. The shape that turns N dashboard tiles into one 100 TB read instead of N",
      s"""SELECT
         |  COUNT(*) FILTER (WHERE l_quantity < 13) AS n_band1,
         |  ${ssum("CASE WHEN l_quantity < 13 THEN l_extendedprice END")} AS rev_band1,
         |  COUNT(*) FILTER (WHERE l_quantity >= 13 AND l_quantity < 25) AS n_band2,
         |  ${ssum("CASE WHEN l_quantity >= 13 AND l_quantity < 25 THEN l_extendedprice END")} AS rev_band2,
         |  COUNT(*) FILTER (WHERE l_quantity >= 25 AND l_quantity < 37) AS n_band3,
         |  ${ssum("CASE WHEN l_quantity >= 25 AND l_quantity < 37 THEN l_extendedprice END")} AS rev_band3,
         |  COUNT(*) FILTER (WHERE l_quantity >= 37) AS n_band4,
         |  ${ssum("CASE WHEN l_quantity >= 37 THEN l_extendedprice END")} AS rev_band4
         | FROM lineitem
         | WHERE l_discount >= 0.02 AND l_discount <= 0.08""".stripMargin.replace("\n", "")) {
      (s, d) => {
        def band(cond: org.apache.spark.sql.Column, tag: String) = Seq(
          count(when(cond, lit(1))).as(s"n_$tag"),
          dsum(when(cond, col("l_extendedprice"))).as(s"rev_$tag"))
        val q = col("l_quantity")
        val aggs = band(q < 13, "band1") ++ band(q >= 13 && q < 25, "band2") ++
          band(q >= 25 && q < 37, "band3") ++ band(q >= 37, "band4")
        Tables.lineitem(s, d)
          .filter(col("l_discount") >= 0.02 && col("l_discount") <= 0.08)
          .agg(aggs.head, aggs.tail: _*)
      }
    },

    sql("ds2_rollup_rank",
      "DS2: TPC-DS Q36-shaped RANK WITHIN PARENT over ROLLUP — per-(nation, mktsegment) spend rolled up through nation subtotals to a grand total, then RANK() partitioned by the GROUPING()-derived level (segments ranked within their nation, nations ranked overall): a window function consuming grouping-sets output, the plan class where the window's partition key is itself computed by the aggregate. Scale: dims broadcast into the orders scan, and the engine refuses the naive rollup-over-fact plan (Spark's Expand multiplies the JOINED FACT (levels+1)× BEFORE partial aggregation — 3× the 100 TB row stream for two rollup dims; measured 32.1 s vs 13.4 s at the 60M-row sf10 rung, same host window): it aggregates to the (nation, segment) sliver FIRST in exact decimal — decimal partials re-aggregate associatively, so the rollup over ~125 rows is bit-identical to the direct form — and Expand touches only the sliver. The window then runs on the ~130-row rollup output — never the fact",
      s"""WITH base AS (
         |  SELECT COALESCE(n_name, 'ALL') AS nat, COALESCE(c_mktsegment, 'ALL') AS seg,
         |    GROUPING(n_name) + GROUPING(c_mktsegment) AS lvl,
         |    ${ssum("o_totalprice")} AS spend
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |    JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY ROLLUP(n_name, c_mktsegment))
         |SELECT nat, seg, lvl, spend,
         |  RANK() OVER (PARTITION BY lvl, CASE WHEN lvl = 0 THEN nat END
         |               ORDER BY spend DESC) AS rnk
         | FROM base
         | ORDER BY lvl, nat, rnk, seg""".stripMargin.replace("\n", "")) {
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(18, 4)
        // fact → (nation, segment) sliver ONCE, exact decimal partials
        val perGroup = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("c_mktsegment"))
          .agg(sum(col("o_totalprice").cast(dec)).as("spend_part"))
        // rollup over the ~125-row sliver; decimal re-aggregation is
        // associative, so this equals the direct rollup bit-for-bit
        val base = perGroup
          .rollup(col("n_name"), col("c_mktsegment"))
          .agg((grouping(col("n_name")) + grouping(col("c_mktsegment"))).cast("long").as("lvl"),
            sum(col("spend_part")).cast("double").as("spend"))
          .select(coalesce(col("n_name"), lit("ALL")).as("nat"),
            coalesce(col("c_mktsegment"), lit("ALL")).as("seg"),
            col("lvl"), col("spend"))
        base.withColumn("rnk", rank().over(
            Window.partitionBy(col("lvl"), when(col("lvl") === 0, col("nat")))
              .orderBy(col("spend").desc)).cast("long"))
          .select("nat", "seg", "lvl", "spend", "rnk")
          .orderBy("lvl", "nat", "rnk", "seg")
      }
    },

    sql("ds3_cumulative_returns",
      "DS3: TPC-DS Q51-shaped CUMULATIVE-SERIES COMPARE — two daily revenue series carved from one fact (returned vs kept lines), full-outer-aligned on day, cumulated AFTER the alignment (a missing day on one side must inherit that side's prior cumulative, which pre-join cumulation would get wrong), then filtered where the returned share of cumulative revenue crosses a threshold. Scale: both series are day-grain aggregates (map-side combined) BEFORE the join and window, so the full-outer join and the running sums touch ~2.5k rows, not the fact; cumulative totals accumulate in exact decimal so the running doubles are order-independent",
      s"""WITH ret AS (SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,
         |    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
         |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
         |kept AS (SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,
         |    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
         |  FROM lineitem WHERE l_returnflag <> 'R' GROUP BY 1),
         |joined AS (SELECT COALESCE(ret.day, kept.day) AS day,
         |    COALESCE(ret.rev, 0) AS ret_rev, COALESCE(kept.rev, 0) AS kept_rev
         |  FROM ret FULL OUTER JOIN kept ON ret.day = kept.day),
         |cum AS (SELECT day,
         |    CAST(SUM(ret_rev)  OVER (ORDER BY day) AS DOUBLE) AS cum_ret,
         |    CAST(SUM(kept_rev) OVER (ORDER BY day) AS DOUBLE) AS cum_kept
         |  FROM joined)
         |SELECT day, cum_ret, cum_kept FROM cum
         | WHERE cum_ret > 0.52 * cum_kept
         | ORDER BY day""".stripMargin.replace("\n", "")) {
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val dec = org.apache.spark.sql.types.DecimalType(18, 4)
        def daily(cond: org.apache.spark.sql.Column, out: String) =
          li.filter(cond)
            .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
            .agg(sum(col("l_extendedprice").cast(dec)).as(out))
        val ret = daily(col("l_returnflag") === "R", "ret_rev")
        val kept = daily(col("l_returnflag") =!= "R", "kept_rev")
        val joined = ret.join(kept, Seq("day"), "full_outer")
          .select(col("day"),
            coalesce(col("ret_rev"), lit(0).cast(dec)).as("ret_rev"),
            coalesce(col("kept_rev"), lit(0).cast(dec)).as("kept_rev"))
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        joined
          .select(col("day"),
            sum(col("ret_rev")).over(w).cast("double").as("cum_ret"),
            sum(col("kept_rev")).over(w).cast("double").as("cum_kept"))
          .filter(col("cum_ret") > lit(0.52) * col("cum_kept"))
          .orderBy("day")
      }
    },

    sql("ds5_either_exists",
      "DS5: TPC-DS Q10/Q35-shaped OR-of-EXISTS — per-segment counts of customers with an urgent order OR a returned line (the second EXISTS is itself a 2-way join). A disjunction of existence tests can NOT decorrelate to LeftSemi (a semi join models one conjunct only) — each EXISTS must become an ExistenceJoin producing a boolean column, with the OR evaluated as a plain filter over the two flags; the naive per-customer re-execution or a cartesian fallback is exactly what the PlanSpec pin refuses. Scale: both probe sides reduce to distinct custkey slivers before touching the customer table, and the returned-line flag pushes into the lineitem scan",
      q10Text(identity)) {
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("ds5_customer")
        Tables.orders(s, d).createOrReplaceTempView("ds5_orders")
        Tables.lineitem(s, d).createOrReplaceTempView("ds5_lineitem")
        s.sql(q10Text(t => s"ds5_$t"))
      }
    },

    sql("ds6_repeat_buyers",
      "DS6: TPC-DS Q38/Q87-shaped MULTI-WAY INTERSECT — customers present in ALL THREE differently-filtered fact slices (an urgent order; a returned line, itself a 2-way semi join; a >100k order). INTERSECT of grouped key sets must plan as per-branch filtered scans feeding a LeftSemi chain with ONE distinct aggregate on top (Catalyst's ReplaceIntersectWithSemiJoin), never a fact-scale distinct-union blowup: each semi join only streams keys that survive the previous branch, and the final dedup touches the surviving sliver. Scale: every branch filter pushes into its own parquet scan; the returned-line membership test is a LeftSemi against the flagged lineitem slice (never materializing the join), and no Union node appears anywhere in the plan",
      s"""SELECT custkey FROM (
         |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         |  INTERSECT
         |  SELECT o.o_custkey AS custkey FROM orders o
         |    WHERE EXISTS (SELECT 1 FROM lineitem l
         |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
         |  INTERSECT
         |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
         |) ORDER BY custkey""".stripMargin.replace("\n", "")) {
      (s, d) => {
        val o = Tables.orders(s, d)
        val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("custkey"))
        val returned = o.join(
            Tables.lineitem(s, d).filter(col("l_returnflag") === "R").select("l_orderkey"),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select(col("o_custkey").as("custkey"))
        val bigSpend = o.filter(col("o_totalprice") > 100000)
          .select(col("o_custkey").as("custkey"))
        urgent.intersect(returned).intersect(bigSpend).orderBy("custkey")
      }
    },

    sql("ds7_channel_rollup",
      "DS7: TPC-DS Q5/Q77-shaped UNION-OF-FACTS ROLLUP — two differently-shaped fact families (order-grain totalprice, line-grain discounted extendedprice) conformed to one (channel, yr, amt) schema by per-branch projections, unioned, and rolled up to per-channel-and-year, per-channel, and grand-total revenue. Scale: the Union itself is free (no shuffle — each branch's tasks feed the partial aggregate map-side); per-branch filters and the 3-column conformance projection push THROUGH the Union into both parquet scans (PushProjectionThroughUnion — neither fact is read wider than its branch needs); and the a13/ds2 aggregate-before-Expand discipline holds ACROSS the union: one keyed decimal aggregate reduces both fact streams to the (channel, yr) sliver and ROLLUP's Expand replicates only that sliver, never either fact",
      s"""WITH chan AS (
         |  SELECT 'orders' AS channel, year(o_orderdate) AS yr,
         |         CAST(o_totalprice AS DECIMAL(18,4)) AS amt
         |    FROM orders WHERE o_orderstatus <> 'P'
         |  UNION ALL
         |  SELECT 'lineitem' AS channel, year(l_shipdate) AS yr,
         |         CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS amt
         |    FROM lineitem WHERE l_quantity >= 5),
         |g AS (SELECT channel, yr, SUM(amt) AS part FROM chan GROUP BY 1, 2)
         |SELECT channel, yr, CAST(GROUPING(channel, yr) AS BIGINT) AS gid,
         |       CAST(SUM(part) AS DOUBLE) AS revenue
         |  FROM g GROUP BY ROLLUP(channel, yr)
         | ORDER BY gid, channel NULLS FIRST, yr NULLS FIRST""".stripMargin.replace("\n", "")) {
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(18, 4)
        val ordersChan = Tables.orders(s, d)
          .filter(col("o_orderstatus") =!= "P")
          .select(lit("orders").as("channel"),
            year(col("o_orderdate")).cast("long").as("yr"),
            col("o_totalprice").cast(dec).as("amt"))
        val linesChan = Tables.lineitem(s, d)
          .filter(col("l_quantity") >= 5)
          .select(lit("lineitem").as("channel"),
            year(col("l_shipdate")).cast("long").as("yr"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec).as("amt"))
        // ONE keyed aggregate over the union reduces both fact streams to
        // the (channel, yr) sliver (partials combine map-side per branch);
        // the rollup's Expand then touches only that sliver — decimal
        // partials re-aggregate associatively, bit-identical to direct
        val sliver = ordersChan.unionByName(linesChan)
          .groupBy(col("channel"), col("yr"))
          .agg(sum(col("amt")).as("part"))
        sliver.rollup(col("channel"), col("yr"))
          .agg(grouping_id().as("gid"),
            sum(col("part")).cast("double").as("revenue"))
          .select(col("channel"), col("yr"), col("gid"), col("revenue"))
          .orderBy(col("gid"), col("channel").asc_nulls_first, col("yr").asc_nulls_first)
      }
    },

    sql("ds8_urgent_no_returns",
      "DS8: TPC-DS Q69/Q35-shaped EXISTS-AND-NOT-EXISTS — per-segment counts of customers WITH an urgent order and WITHOUT any returned line (the second test is itself a 2-way join). The CONJUNCTION of existence tests is ds5's counterpart: where a disjunction must become ExistenceJoin flags, a conjunction decorrelates fully — EXISTS to LeftSemi, NOT EXISTS to LeftAnti, chained on the customer stream with no boolean flags, no Expand, no per-customer re-execution. Scale: each membership probe reduces to a custkey sliver before touching customers (the urgent filter pushes into its orders scan; the returned-line probe is orders semi-joined to the flag-pushed lineitem slice), and the final aggregate runs on the filtered customer sliver",
      s"""SELECT c_mktsegment, COUNT(*) AS n_customers
         | FROM customer c
         | WHERE EXISTS (SELECT 1 FROM orders o
         |               WHERE o.o_custkey = c.c_custkey
         |                 AND o.o_orderpriority = '1-URGENT')
         |   AND NOT EXISTS (SELECT 1 FROM orders o JOIN lineitem l
         |                     ON o.o_orderkey = l.l_orderkey
         |                   WHERE o.o_custkey = c.c_custkey
         |                     AND l.l_returnflag = 'R')
         | GROUP BY c_mktsegment
         | ORDER BY c_mktsegment""".stripMargin.replace("\n", "")) {
      (s, d) => {
        val o = Tables.orders(s, d)
        val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        val returned = o.join(
            Tables.lineitem(s, d).filter(col("l_returnflag") === "R").select("l_orderkey"),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select("o_custkey")
        Tables.customer(s, d)
          .join(urgent, col("c_custkey") === urgent("o_custkey"), "left_semi")
          .join(returned, col("c_custkey") === returned("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("c_mktsegment")
      }
    },

    sql("ds9_partitioned_fact",
      "DS9: DYNAMIC PARTITION PRUNING over a date-partitioned fact — the bread-and-butter warehouse physical shape (TPC-DS's store_sales ⋈ date_dim WHERE d_year = N): lineitem laid out partitionBy(ship_month) — the reference's own ingest is a month-partitioned layout — joined to a month dim filtered to one year, aggregated to per-month revenue. The dim's filter is on yr, NOT the partition column, so static pruning is impossible: Spark must insert a dynamicpruning subquery into the fact scan (fed by the broadcast dim exchange, reused — no extra dim scan) and read ONLY the matching month partitions, never the archive. PlanSpec pins the subquery AND the pruned file count (12 of 84 months read); at 100 TB this is the difference between scanning one year and scanning the decade. Oracle: the equivalent year filter over the flat table",
      s"""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         |  COUNT(*) AS n_lines,
         |  ${ssum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         | FROM lineitem
         | WHERE year(l_shipdate) = 1995
         | GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", "")) {
      (s, d) => {
        val root = PartitionedState.ensure(s, d)
        val fact = s.read.parquet(s"$root/lineitem_by_month")
        val dim = s.read.parquet(s"$root/month_dim").filter(col("yr") === 1995)
        fact.join(broadcast(dim), Seq("ship_month"))
          .groupBy("ship_month")
          .agg(count(lit(1)).as("n_lines"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy("ship_month")
      }
    }.withPrepare((s, d) => { PartitionedState.ensure(s, d); () }),

    sql("ds4_yoy_spend",
      "DS4: TPC-DS Q74-shaped YEAR-OVER-YEAR growth — per-customer yearly spend compared against itself shifted one year, keeping customers whose spend grew by more than half. The oracle keeps the classic aggregate-vs-itself self-join text; the engine plan refuses it (a year-shift self-join can never reuse its exchange — the two sides hash DIFFERENT expressions, y vs y+1, over the same aggregate, so Spark re-scans the fact for the shifted copy — verified empirically) and instead reads the adjacent year with lag() OVER (PARTITION BY custkey ORDER BY y): ONE fact scan, one map-side-combined aggregate, one custkey-partitioned window on the (customer × year) sliver, no join at all; the y = lag(y)+1 gate reproduces the join's adjacency semantics exactly. Growth is one IEEE division of two exact-decimal doubles, bit-portable",
      s"""WITH yr AS (SELECT o_custkey, year(o_orderdate) AS y,
         |    ${ssum("o_totalprice")} AS spend
         |  FROM orders GROUP BY 1, 2)
         |SELECT a.o_custkey AS custkey, b.y AS yr,
         |  a.spend AS prev_spend, b.spend AS cur_spend,
         |  b.spend / a.spend AS growth
         | FROM yr a JOIN yr b ON a.o_custkey = b.o_custkey AND b.y = a.y + 1
         | WHERE b.spend > 1.5 * a.spend
         | ORDER BY custkey, yr""".stripMargin.replace("\n", "")) {
      (s, d) => {
        val yr = Tables.orders(s, d)
          .groupBy(col("o_custkey"), year(col("o_orderdate")).cast("long").as("y"))
          .agg(dsum(col("o_totalprice")).as("spend"))
        val w = Window.partitionBy("o_custkey").orderBy("y")
        yr.select(col("o_custkey").as("custkey"), col("y").as("yr"),
            lag("y", 1).over(w).as("py"),
            lag("spend", 1).over(w).as("prev_spend"),
            col("spend").as("cur_spend"))
          .filter(col("yr") === col("py") + 1 &&
            col("cur_spend") > lit(1.5) * col("prev_spend"))
          .select(col("custkey"), col("yr"), col("prev_spend"), col("cur_spend"),
            (col("cur_spend") / col("prev_spend")).as("growth"))
          .orderBy("custkey", "yr")
      }
    }
  )
}
