package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table maintenance at 100 TB: apply a CDC changelog to a keyed snapshot
  * (the MERGE INTO / upsert primitive) and merge algebraic aggregate
  * states (incremental aggregation maintenance — re-aggregate only the
  * new batch, never rescan the full history).
  *
  * Complements [[Diff]] (what changed?) with the write side (apply the
  * changes). The reference rewrites whole tables per run
  * (src/main.py:88-309); these are the idempotent-incremental versions a
  * cluster-scale pipeline needs instead.
  */
object Merge {

  /** Distributed guard: any op value outside {upsert, delete} (a typo'd
    * 'update', a NULL) fails the job loudly instead of silently acting as
    * a delete — the anti-join removes every keyed row and the upsert
    * filter would then drop the malformed one. Map-side `when` check,
    * zero extra shuffles; `raise_error` carries the offending value. */
  private def validatedOp(opCol: String): org.apache.spark.sql.Column =
    when(col(opCol).isin("upsert", "delete"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"malformed CDC batch: '$opCol' must be 'upsert' or 'delete', got "),
        coalesce(col(opCol).cast("string"), lit("NULL")))))

  /** Apply a CDC changelog to a keyed snapshot. `changes` carries the
    * target's columns plus `opCol` ∈ {"upsert","delete"} (ENFORCED — see
    * [[validatedOp]]) and a
    * monotonically increasing `seqCol`; when one key appears multiple
    * times the HIGHEST seq wins (the Delta/Hudi/Iceberg MERGE contract
    * for out-of-order CDC batches).
    *
    * Scale shape: one window shuffle over the changelog (keyed by the
    * join keys — changelogs are batch-sized, ≪ target), one left-anti
    * join target⟕latest-keys (AQE broadcasts it when the batch is
    * small), and a union — the target is scanned exactly once and never
    * re-sorted. No driver-side state.
    *
    * Determinism: ties on (key, seqCol) are rejected nowhere cheap to
    * check distributedly; callers must make seq unique per key (CDC
    * sources do). The window orders by (seq DESC, op) so a pathological
    * tie resolves deterministically rather than by partition order. */
  def applyChangeLog(target: DataFrame, changes: DataFrame, keys: Seq[String],
                     opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    require(keys.nonEmpty, "applyChangeLog needs at least one key column")
    val dataCols = target.columns.toIndexedSeq
    require(dataCols.forall(changes.columns.contains),
      s"changelog must carry all target columns; missing: ${
        dataCols.filterNot(changes.columns.contains).mkString(",")}")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol))
    val latest = changes
      .withColumn(opCol, validatedOp(opCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val untouched = target.join(latest.select(keys.map(col): _*), keys, "left_anti")
    val upserts = latest.filter(col(opCol) === "upsert")
      .select(dataCols.map(col): _*)
    untouched.unionByName(upserts)
  }

  /** Out-of-order-safe CDC state merge — the streaming-ingest form of
    * [[applyChangeLog]]. The persisted state keeps `opCol` and `seqCol`
    * per key (DELETE TOMBSTONES INCLUDED), so merging a micro-batch is
    * latest-seq-wins over `state ∪ batch` regardless of arrival order: a
    * stale upsert arriving after a newer delete loses to the tombstone —
    * semantics incremental apply-and-drop cannot provide (Hudi's
    * precombine-field pattern). One window shuffle over state+batch keys.
    * [[currentSnapshot]] projects the live table out of the state. */
  def mergeChangeState(state: DataFrame, batch: DataFrame, keys: Seq[String],
                       opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol))
    state.unionByName(batch.withColumn(opCol, validatedOp(opCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The live table a CDC state represents: tombstones filtered out,
    * bookkeeping columns dropped. */
  def currentSnapshot(state: DataFrame, opCol: String = "op",
                      seqCol: String = "seq"): DataFrame =
    state.filter(col(opCol) === "upsert").drop(opCol, seqCol)

  /** Algebraic per-key aggregate state: count / exact-decimal sum / min /
    * max of `valueCol`. States over disjoint slices merge losslessly with
    * [[mergeStats]] — the substrate for incremental aggregation
    * maintenance (keep yesterday's states, aggregate only today's batch,
    * merge). Sum accumulates in DECIMAL ([[Det.dsum]] rationale) so the
    * merged result is bit-identical to a full recompute. */
  def partialStats(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(col(valueCol)).as("cnt"),
      sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("sum_dec"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /** Merge aggregate states from disjoint slices: counts and decimal sums
    * add, min/max fold. One union + one hash agg over state rows (key
    * cardinality, not data cardinality — trivially small at any scale). */
  def mergeStats(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeStats needs at least one state frame")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*).agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_dec")).as("sum_dec"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Surface a merged state as final analytics columns (exact sum and
    * exact mean as double — the [[Det]] determinism discipline). */
  def finalizeStats(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("cnt"),
        col("sum_dec").cast("double").as("sum_v"),
        (col("sum_dec").cast("double") / col("cnt")).as("avg_v"),
        col("min_v"),
        col("max_v")): _*)
}
