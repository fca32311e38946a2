package graft.queries

import graft.QuerySpec
import graft.QuerySpec.sql

/** EP2/EP3 report SQL registered through the oracle gate — the same
  * `spark.sql` strings [[graft.pipeline.Reports]] serves as CSV artifacts
  * (PipelineSpec covers the artifact path; these entries hash-verify the
  * report CONTENT against DuckDB).
  */
object ReportQueries {

  val all: Seq[QuerySpec] = Seq(

    sql("ep2_analysis",
      "EP2: the reference's multi-key GROUP BY report SQL, content-verified",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS total_lines,
        | ROUND(AVG(l_extendedprice), 2) AS avg_price
        | FROM lineitem GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus LIMIT 100""".stripMargin.replace("\n", "")) {
      (s, d) => graft.pipeline.Reports.analysis(s, d)
    },

    sql("ep3_hourly_demand",
      "EP3: hourly-demand time-dimension report (the analytics the reference promises but dropped its datetime columns for)",
      """SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day, COUNT(*) AS n_events,
        | ROUND(AVG(value), 2) AS avg_value
        | FROM events WHERE user_id IS NOT NULL
        | GROUP BY hour(ts) ORDER BY hour_of_day""".stripMargin.replace("\n", "")) {
      (s, d) => graft.pipeline.Reports.hourlyDemand(s, d)
    }
  )
}
