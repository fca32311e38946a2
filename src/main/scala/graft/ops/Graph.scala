package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over pair lists — the numeric companion to
  * [[Dedup.connectedComponents]]. PageRank here ranks documents inside the
  * near-duplicate graph: a cluster's highest-rank member is its most
  * connected (most-copied) version, a better canonical-survivor choice
  * than min-id when versions differ in quality.
  *
  * Scale shape per iteration: one join of the edge list against the rank
  * vector (both id-keyed — AQE picks broadcast when ranks fit) plus one
  * hash agg; lineage is truncated per round with localCheckpoint exactly
  * like the CC loop, so 10 iterations never build a 10-deep plan. The edge
  * list is the near-dup PAIR set — orders of magnitude smaller than the
  * corpus — so the whole computation is sliver-sized.
  */
object Graph {

  /** PageRank over an undirected pair list (`id1`, `id2`), damping `beta`,
    * fixed `iters` sweeps. Rank convention: teleport mass is (1-beta) PER
    * NODE, so ranks sum to the node count (every edge endpoint has degree
    * ≥ 1 here, making the per-iteration sum exactly conserved — pinned in
    * GraphSpec). Deterministic: pure arithmetic on exact joins, no seeds.
    *
    * Lineage is truncated every `checkpointEvery` iterations rather than
    * every one: each eager checkpoint is a full job, and on a sliver-sized
    * pair graph the job overhead dominates the arithmetic — a 3-deep
    * join/agg chain between truncations is well within Catalyst's comfort
    * while cutting the fixed job count ~3×. */
  def pageRank(pairs: DataFrame, beta: Double = 0.85, iters: Int = 10,
               checkpointEvery: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(beta > 0 && beta < 1, s"beta must be in (0,1), got $beta")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    val edges = pairs
      .select(col("id1").cast("long").as("src"), col("id2").cast("long").as("dst"))
      .unionByName(pairs.select(col("id2").cast("long").as("src"),
        col("id1").cast("long").as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val nodes = deg.select(col("src").as("id"))
    var ranks = nodes.select(col("id"), lit(1.0).as("rank"))
    for (i <- 1 to iters) {
      val inflow = edges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("inflow"))
      val next = nodes
        .join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - beta) + lit(beta) * coalesce(col("inflow"), lit(0.0))).as("rank"))
      ranks = if (i % checkpointEvery == 0 || i == iters) next.localCheckpoint() else next
    }
    ranks
  }
}
