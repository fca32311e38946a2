package graft.tools

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** One ds9 (dynamic-partition-pruning) ladder rung (r17 verdict ask #4):
  * build the month-partitioned layout for the given sf dir (untimed — the
  * bench's withPrepare contract), run the query `passes` times, and emit
  * one JSON line with the median plus the DPP evidence the verdict asks
  * to see holding at real data volumes: the `numPartitions` scan metric
  * (months actually READ) vs the layout's total month-partition count,
  * and whether the executed plan carries the dynamicpruning subquery.
  *
  * Usage: runMain graft.tools.DsNineLadder <sfDir> [passes]
  */
object DsNineLadder {

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => (other.children ++ other.subqueries).flatMap(scans)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.engine.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")

    val spec = graft.SparkEntry.specs.find(_.name == "ds9_partitioned_fact").get
    // layout build is prepare-time, not query-time (Bench.withPrepare)
    val root = graft.queries.DsQueries.PartitionedState.ensure(spark, sfDir)
    val totalMonths = new java.io.File(s"$root/lineitem_by_month")
      .listFiles().count(_.getName.startsWith("ship_month="))

    var lastRead = -1L
    var lastDpp = false
    val times = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      val df = spec.run(spark, sfDir)
      df.collect()
      val t = (System.nanoTime() - t0) / 1e9
      val exec = df.queryExecution.executedPlan
      val factScans = scans(exec).filter(
        _.relation.location.rootPaths.exists(_.toString.contains("lineitem_by_month")))
      lastRead = factScans.map(_.metrics("numPartitions").value).sum
      lastDpp = exec.toString.toLowerCase.contains("dynamicpruning")
      t
    }.sorted
    val med = times(times.size / 2)
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    println(
      f"""{"query":"ds9_partitioned_fact","sf":"$sfDir","lineitem_rows":$rows,"median_sec":$med%.3f,"samples":${times.map(t => f"$t%.3f").mkString("[", ",", "]")},"partitions_read":$lastRead,"partitions_total":$totalMonths,"dynamic_pruning":$lastDpp}""")
    spark.stop()
  }
}
