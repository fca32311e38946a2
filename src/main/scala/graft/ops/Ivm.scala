package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental VIEW maintenance for materialized JOINs — keep V = A ⋈ B
  * current under growing inputs without ever re-running the full join.
  *
  * [[Merge]] maintains aggregate states (U9–U14) and keyed snapshots (U8);
  * this is the remaining leg a 100 TB nightly needs: a denormalized join
  * view (orders×customer, doc×cluster-label, fact×dim) that downstream
  * consumers read directly. Recomputing it nightly costs a full
  * archive-side shuffle; the delta identity
  *
  *   (A ∪ ΔA) ⋈ (B ∪ ΔB)  =  A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB
  *
  * holds exactly under BAG semantics, so the view update is three
  * batch-sized joins — AQE broadcasts the Δ sides and the old snapshots
  * are scanned once map-side, never re-shuffled against each other.
  *
  * Scale shape: work ∝ |Δ| × match fan-out. The one full-corpus pass is
  * the unavoidable A-side scan in A⋈ΔB (pruned further when A is
  * clustered on the join key — see [[Manifest.prunedScan]]); no shuffle
  * of A against B ever recurs after the initial build.
  *
  * Reference analog: none — the reference (src/main.py:88-309) rewrites
  * every derived table from scratch each run.
  */
object Ivm {

  private def payloadOverlap(a: DataFrame, b: DataFrame, keys: Seq[String]): Seq[String] =
    a.columns.filterNot(keys.contains).toSeq intersect b.columns.filterNot(keys.contains).toSeq

  private def requireDisjointPayloads(a: DataFrame, b: DataFrame, keys: Seq[String]): Unit = {
    val clash = payloadOverlap(a, b, keys)
    require(clash.isEmpty,
      s"join-view sides must have disjoint non-key columns; both carry: ${clash.mkString(",")}")
  }

  /** The view DELTA for insert-only deltas ΔA, ΔB against snapshots A, B:
    * ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB (equi-join on same-named `keys`; rename the
    * dim key upstream). Bag-exact: `viewOld ∪ joinViewDelta(...)` equals
    * the full join of the grown sides, duplicates and all. */
  def joinViewDelta(aOld: DataFrame, aDelta: DataFrame,
                    bOld: DataFrame, bDelta: DataFrame,
                    keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinViewDelta needs at least one join key")
    requireDisjointPayloads(aOld, bOld, keys)
    require(aOld.columns.sameElements(aDelta.columns),
      s"ΔA schema must match A: ${aDelta.columns.mkString(",")} vs ${aOld.columns.mkString(",")}")
    require(bOld.columns.sameElements(bDelta.columns),
      s"ΔB schema must match B: ${bDelta.columns.mkString(",")} vs ${bOld.columns.mkString(",")}")
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))
  }

  /** Fold one increment into the materialized view. */
  def maintainJoinView(viewOld: DataFrame,
                       aOld: DataFrame, aDelta: DataFrame,
                       bOld: DataFrame, bDelta: DataFrame,
                       keys: Seq[String]): DataFrame =
    viewOld.unionByName(joinViewDelta(aOld, aDelta, bOld, bDelta, keys))

  /** CDC form: apply an upsert/delete changelog on the FACT side (keyed by
    * A's primary key `aPk`, latest `seqCol` wins — the U8 contract;
    * op values outside {upsert, delete} fail loudly via
    * [[Merge.validatedOp]] instead of silently acting as deletes) to the
    * materialized view directly. Affected keys' view rows are dropped and
    * recomputed against the current dim `bCur`; untouched view rows pass
    * through unscanned-by-the-join. Requires A's pk columns to survive
    * into the view (they do — the view carries all of A's columns).
    *
    * Scale shape: one window over the batch, one anti-join
    * view⟕batch-keys (AQE broadcasts the batch-key sliver), one
    * batch⋈dim equi-join. Work ∝ batch; the view is scanned once. */
  def applyToJoinView(viewOld: DataFrame, aChanges: DataFrame, bCur: DataFrame,
                      aPk: Seq[String], joinKeys: Seq[String],
                      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    require(aPk.nonEmpty, "applyToJoinView needs the fact-side primary key")
    require(aPk.forall(viewOld.columns.contains),
      s"view must carry the fact pk columns ${aPk.mkString(",")}")
    val w = Window.partitionBy(aPk.map(col): _*).orderBy(col(seqCol).desc, col(opCol))
    val latest = aChanges
      .withColumn(opCol, Merge.validatedOp(opCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val survivors = latest.filter(col(opCol) === "upsert").drop(opCol, seqCol)
    requireDisjointPayloads(survivors, bCur, joinKeys)
    val untouched = viewOld.join(latest.select(aPk.map(col): _*).distinct(),
      aPk, "left_anti")
    // using-column joins move their keys to the front; restore the
    // view's own column order so the fold is schema-stable
    untouched.unionByName(survivors.join(bCur, joinKeys))
      .select(viewOld.columns.map(col).toIndexedSeq: _*)
  }
}
