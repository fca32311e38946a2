package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{approx_count_distinct, struct}

/** Writer-side governance — [[PlanGuard]]'s twin at the WRITE funnel
  * (r16 verdict ask #7): estimate the partition-directory count a
  * `partitionBy` will produce and refuse it past a cap BEFORE any file
  * lands. A high-cardinality partition key is the most common way real
  * users melt a 100 TB table: `partitionBy(user_id)` on a million-user
  * corpus creates a million directories — every downstream listing,
  * metastore sync, and small-file compaction pays for it forever, and
  * the write itself fans out to (tasks × partitions) files. The read
  * side already has admission guards (PlanGuard, StreamGuard); this is
  * the same machine check on the one funnel they can't see.
  *
  * Estimate ladder (cheapest sufficient evidence wins):
  *  1. Catalyst's row-count estimate, when the optimizer knows one (CBO
  *     stats, LocalRelation, or a limit): distinct partition values can
  *     never exceed rows, so rowCount ≤ cap admits with NO extra work.
  *  2. otherwise ONE `approx_count_distinct` scalar over just the
  *     partition columns — a map-side-combined 1-row aggregate that scans
  *     only those columns (parquet-pruned), the same statistics pre-pass
  *     class as [[graft.ops.Skew.hotKeys]]. HLL++ relative error ~2% is
  *     irrelevant at a 10k threshold.
  *
  * The cap comes from `GRAFT_GUARD_MAX_WRITE_PARTITIONS` (default
  * [[DefaultMaxWritePartitions]]; the documented GRAFT_GUARD_* policy
  * family — see engine/Config). Unpartitioned writes pass untouched:
  * their file count is governed by the sized sinks
  * ([[graft.io.Sinks.parquetSized]]), not by directory fan-out.
  *
  * Wired into every partitioned columnar sink in [[graft.io.Sinks]];
  * `admit` throws [[PlanGuard.PlanRejected]] so it surfaces exactly like
  * a refused plan. */
object WriteGuard {

  /** 10k partition directories is where HMS listing, S3 LIST pagination,
    * and driver-side FileIndex memory all start visibly degrading; a
    * date/month/cid-keyed layout sits orders of magnitude below it. */
  val DefaultMaxWritePartitions = 10000L

  /** Cap from the GRAFT_GUARD_* env family; malformed values fail loudly
    * (the Config.fromEnv contract — a typo'd guard must never silently
    * become the default). */
  def maxWritePartitionsFromEnv(env: Map[String, String] = sys.env): Long =
    env.get("GRAFT_GUARD_MAX_WRITE_PARTITIONS") match {
      case None => DefaultMaxWritePartitions
      case Some(v) => v.toLongOption.filter(_ > 0).getOrElse(
        throw new IllegalArgumentException(
          s"GRAFT_GUARD_MAX_WRITE_PARTITIONS must be a positive integer, got '$v'"))
    }

  /** Measured partition-directory count for `partitionBy(cols)`: one
    * approx_count_distinct scalar over just those columns. */
  def estimatePartitions(df: DataFrame, cols: Seq[String]): Long = {
    require(cols.nonEmpty, "estimatePartitions needs partition columns")
    df.select(approx_count_distinct(struct(cols.map(df.col): _*)).as("n"))
      .head().getLong(0)
  }

  /** Pass-through admission for a partitioned write: returns `df`
    * unchanged when the estimated directory count is within the cap,
    * throws [[PlanGuard.PlanRejected]] otherwise. No-op for
    * unpartitioned writes. The rowCount rung can only ADMIT (distinct
    * values never exceed rows); a fact-scale rowCount says nothing about
    * the key's cardinality, so refusal always rests on the measured
    * distinct count. */
  def admit(df: DataFrame, partitionBy: Seq[String],
            maxPartitions: Long = maxWritePartitionsFromEnv()): DataFrame = {
    if (partitionBy.isEmpty) return df
    if (df.queryExecution.optimizedPlan.stats.rowCount
          .exists(_ <= BigInt(maxPartitions))) return df
    val est = estimatePartitions(df, partitionBy)
    if (est > maxPartitions)
      throw new PlanGuard.PlanRejected(Seq(PlanGuard.Finding(
        "write-partitions", fatal = true, "partitionBy",
        s"partitionBy(${partitionBy.mkString(", ")}) would create ~$est partition " +
          s"directories (> GRAFT_GUARD_MAX_WRITE_PARTITIONS=$maxPartitions) — " +
          "a metadata-melting layout; partition by a coarser key (date/month/bucket) " +
          "or raise the cap deliberately")))
    df
  }
}
