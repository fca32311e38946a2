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

  /** Engine-portable PageRank: same iteration as [[pageRank]] but in
    * BIGINT FIXED-POINT (`one` = 1.0, default 1e-12 resolution) with
    * truncating integer division — every per-iteration value is exact
    * integer arithmetic, so any engine reproduces the result bit-for-bit
    * and the query is DuckDB-oracle-able (g1), unlike the double form
    * whose per-iteration float sums are association-dependent.
    *
    * Semantics: contribution = rank DIV deg (truncation loses < deg
    * sub-pico units of mass per node per round — a DEFINED part of the
    * fixed-point operator, identical everywhere). Rank convention matches
    * [[pageRank]]: teleport is (1-beta)·one per node.
    *
    * Overflow bound (ANSI mode fails loudly, never wraps): a node's
    * inflow < Σranks ≤ n·one, and the damping multiply scales it by
    * betaNum, so betaNum·n·one < 2⁶³ — with the defaults that allows
    * ~10⁵ nodes. The near-dup pair graphs this ranks are cluster slivers
    * (orders of magnitude below that); for larger graphs pass a coarser
    * `one` (1e9 admits ~10⁸ nodes at 1e-9 rank resolution) or use the
    * double-arithmetic [[pageRank]], which is the production path anyway.
    *
    * `betaDen` must divide `one` (exact teleport) and `betaNum/betaDen`
    * expresses beta as a ratio (85/100 = 0.85). */
  def pageRankFixedPoint(pairs: DataFrame, betaNum: Long = 85L, betaDen: Long = 100L,
                         iters: Int = 10, one: Long = 1000000000000L,
                         checkpointEvery: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(betaNum > 0 && betaNum < betaDen, s"need 0 < betaNum < betaDen, got $betaNum/$betaDen")
    require(one % betaDen == 0, s"betaDen ($betaDen) must divide one ($one) for an exact teleport")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    val edges = pairs
      .select(col("id1").cast("long").as("src"), col("id2").cast("long").as("dst"))
      .unionByName(pairs.select(col("id2").cast("long").as("src"),
        col("id1").cast("long").as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val nodes = deg.select(col("src").as("id"))
    val teleport = (one / betaDen) * (betaDen - betaNum)
    var ranks = nodes.select(col("id"), lit(one).as("rank"))
    for (i <- 1 to iters) {
      val inflow = edges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"), expr("rank DIV deg").as("c"))
        .groupBy("id").agg(sum("c").as("inflow"))
      val next = nodes
        .join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) + expr(s"(coalesce(inflow, CAST(0 AS BIGINT)) * $betaNum) DIV $betaDen"))
            .as("rank"))
      ranks = if (i % checkpointEvery == 0 || i == iters) next.localCheckpoint() else next
    }
    ranks
  }
}
