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
    },

    sql("ep4_funnel",
      "EP4: ordered-funnel conversion — users whose earliest view precedes a later click precedes a later purchase (the MATCH_RECOGNIZE-shaped query composed from per-stage min-ts contractions; reach tables are user-dim sized, never event-scale self-joins)",
      """WITH v AS (SELECT user_id, MIN(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
        |         CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS users_reached
        |  UNION ALL SELECT 1, 'click', (SELECT COUNT(*) FROM c)
        |  UNION ALL SELECT 2, 'purchase', (SELECT COUNT(*) FROM p))
        | ORDER BY stage_idx""".stripMargin.replace("\n", "")) {
      (s, d) =>
        graft.ops.Funnel.funnelCounts(graft.model.Tables.events(s, d),
          Seq("view", "click", "purchase"))
          .orderBy("stage_idx")
    },

    sql("ep5_cohort_retention",
      "EP5: weekly cohort retention — users bucketed by ISO-Monday week of first activity, distinct active users per (cohort, week offset); user-dim intermediates, exact integer week arithmetic",
      """WITH f AS (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cw
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w FROM events),
        |r AS (SELECT f.cw, CAST((a.w - f.cw) // 7 AS BIGINT) AS week_offset, a.user_id
        |  FROM a JOIN f USING (user_id))
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, week_offset,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        | FROM r GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin.replace("\n", "")) {
      (s, d) =>
        graft.ops.Retention.weeklyCohorts(graft.model.Tables.events(s, d))
          .orderBy("cohort_week", "week_offset")
    },

    sql("ep6_event_transitions",
      "EP6: event-transition matrix — counts of consecutive (from → to) event-type steps per user in (ts, event_id) order; the Markov-chain view of user journeys, one user-partitioned window + one hash agg",
      """WITH s AS (SELECT user_id, event_type,
        |  LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        |  FROM events)
        |SELECT from_type, event_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
        | FROM s WHERE from_type IS NOT NULL
        | GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin.replace("\n", "")) {
      (s, d) =>
        graft.ops.Funnel.transitions(graft.model.Tables.events(s, d))
          .orderBy("from_type", "to_type")
    },

    sql("ep7_sessionization",
      "EP7: batch sessionization — gap-based session assignment over the event archive (new session when >30 min since the user's previous event), the offline twin of the streaming session_window; exact microsecond arithmetic, one user-keyed window + one hash agg, no per-user event buffering",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
        |g AS (SELECT user_id, event_id, t,
        |  CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
        |         OR t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > 1800000000
        |       THEN 1 ELSE 0 END AS brk FROM e),
        |s AS (SELECT user_id, t,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        | FROM g)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(MAX(t) - MIN(t) AS BIGINT) AS duration_us
        | FROM s GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin.replace("\n", "")) {
      (s, d) =>
        graft.ops.Funnel.sessionize(
          graft.model.Tables.events(s, d), gapMicros = 1800L * 1000000L)
          .orderBy("user_id", "session_seq")
    }
  )
}
