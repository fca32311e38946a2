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

  /** Existing partition-directory count under `root` — one FS listing per
    * partition level, aborting early once the count passes `abortAbove`
    * (an intermediate level's directories each hold ≥1 leaf, so a partial
    * count past the cap already proves refusal; work stays ∝ the cap, not
    * the layout). An absent root counts 0 — the first write of a layout. */
  def existingPartitionDirs(df: DataFrame, root: String, levels: Int,
                            abortAbove: Long): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
      df.sparkSession.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) return 0L
    var frontier: Seq[org.apache.hadoop.fs.Path] = Seq(p)
    var level = 0
    while (level < levels && frontier.nonEmpty) {
      val next = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
      val it = frontier.iterator
      while (it.hasNext && next.size <= abortAbove) {
        next ++= fs.listStatus(it.next()).iterator
          .filter(s => s.isDirectory && s.getPath.getName.contains("="))
          .map(_.getPath)
      }
      if (next.size > abortAbove) return next.size
      frontier = next.toSeq
      level += 1
    }
    frontier.size
  }

  /** Pass-through admission for a partitioned write: returns `df`
    * unchanged when the estimated directory count is within the cap,
    * throws [[PlanGuard.PlanRejected]] otherwise. No-op for
    * unpartitioned writes.
    *
    * SEMANTICS — per-layout, not per-write (r17 advice): for a
    * cumulative write (`mode=append`, or dynamic partition overwrite —
    * both only ever ADD directories to the target) with a known `target`
    * path, the admitted quantity is `existing dirs + new keys' upper
    * bound`: a long-running appender is refused at the write that would
    * push the LAYOUT past the cap, not judged batch-by-batch. The
    * existing count is one bounded FS listing ([[existingPartitionDirs]]
    * — work ∝ the cap); callers that don't thread a target keep the old
    * per-write check (documented weaker form). The sum is an upper bound
    * — batch keys usually overlap existing directories — so a
    * steady-state appender whose true union sits near the cap can be
    * refused early; that is the conservative side of a guard whose
    * failure mode is a melted layout, and bounded-key layouts have
    * [[admit]]'s `knownKeyBound` to state the exact union.
    *
    * `knownKeyBound` (caller contract): the partition key's total
    * cardinality is structurally ≤ this bound (e.g. an IVF `cid` layout
    * has exactly K cells — the quantizer is frozen). When given, it
    * REPLACES both the existing-dir listing and the per-batch
    * approx_count_distinct scan: the union can never exceed the bound,
    * so a per-micro-batch appender pays ZERO extra jobs at this guard.
    *
    * Estimate ladder for the new keys otherwise: Catalyst rowCount (can
    * only ADMIT — distinct values never exceed rows; a fact-scale
    * rowCount says nothing about cardinality), then ONE
    * approx_count_distinct scalar over just the partition columns. */
  def admit(df: DataFrame, partitionBy: Seq[String],
            maxPartitions: Long = maxWritePartitionsFromEnv(),
            mode: String = "overwrite",
            target: Option[String] = None,
            knownKeyBound: Option[Long] = None): DataFrame = {
    if (partitionBy.isEmpty) return df

    def refuse(est: Long, existing: Long): Nothing =
      throw new PlanGuard.PlanRejected(Seq(PlanGuard.Finding(
        "write-partitions", fatal = true, "partitionBy",
        s"partitionBy(${partitionBy.mkString(", ")}) would put the layout at ~$est " +
          s"partition directories (> GRAFT_GUARD_MAX_WRITE_PARTITIONS=$maxPartitions" +
          (if (existing > 0) s"; $existing already on disk at ${target.get}" else "") +
          ") — a metadata-melting layout; partition by a coarser key " +
          "(date/month/bucket) or raise the cap deliberately")))

    knownKeyBound match {
      case Some(bound) =>
        if (bound > maxPartitions) refuse(bound, 0L)
        return df
      case None =>
    }

    val cumulative = mode.equalsIgnoreCase("append") ||
      mode.equalsIgnoreCase("dynamic-overwrite")
    val existing: Long =
      if (cumulative) target.map(existingPartitionDirs(df, _, partitionBy.size,
        maxPartitions)).getOrElse(0L)
      else 0L
    if (existing > maxPartitions) refuse(existing, existing)

    val budget = maxPartitions - existing
    if (df.queryExecution.optimizedPlan.stats.rowCount
          .exists(_ <= BigInt(budget))) return df
    val est = estimatePartitions(df, partitionBy)
    if (existing + est > maxPartitions) refuse(existing + est, existing)
    df
  }
}
