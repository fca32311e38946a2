package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort-retention analysis — the "of users who first appeared in week
  * W, how many were still active N weeks later" report. Cohort = the
  * ISO-Monday week of the user's earliest event (both Spark and DuckDB
  * truncate weeks to Monday, making the bucket engine-portable); activity
  * = the distinct (user, week) pairs; the report counts distinct users
  * per (cohort, offset).
  *
  * Scale shape: one user-keyed agg for cohorts (user-dim output), one
  * distinct over (user, week) — ~52·users rows/year, still dimension-like
  * vs the event table — then a co-keyed join and a count-distinct per
  * (cohort, offset) cell. No event-scale self-joins; week offsets are
  * exact integer day arithmetic (both week columns are Monday-truncated,
  * so the difference is a nonnegative multiple of 7 — no float rounding).
  */
object Retention {

  /** Weekly cohort retention: `cohort_week` (yyyy-MM-dd string — DATE
    * surfaced portably), `week_offset` (0 = the cohort week itself),
    * `n_users` distinct active users of that cohort in that week. */
  def weeklyCohorts(events: DataFrame, userCol: String = "user_id",
                    tsCol: String = "ts"): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("__cw"))
    val active = events
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("__w"))
      .distinct()
    active.join(first, Seq(userCol))
      .select(col("__cw"),
        (datediff(col("__w"), col("__cw")) / 7).cast("long").as("week_offset"),
        col(userCol))
      .groupBy(col("__cw"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
      .select(date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }
}
