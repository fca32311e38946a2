package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — an operator Spark lacks natively
  * (SURVEY.md §2.5; the built-in planner turns a pure range predicate
  * into a broadcast-nested-loop join, which is O(points × intervals)).
  *
  * Scale design: both sides are bucketized onto a fixed-width grid —
  * each point lands in exactly one cell, each interval explodes into
  * the cells it overlaps — and the join becomes an EQUALITY join on the
  * cell id plus a residual range filter. Cost is
  * O(points + intervals·span/width + matches), shuffled on an 8-byte
  * key: the shape that survives millions of intervals where the
  * nested loop dies. Skewed cells (many intervals stacked on a popular
  * value range) are ordinary hash-join skew — AQE's skew-join splitting
  * applies, same as any hot key.
  *
  * `bucketWidth` trades explode factor against residual selectivity:
  * ~the median interval length is the usual choice (each interval then
  * covers ~2 cells). Semantics: lo <= point < hi, NULL points/bounds
  * never match (SQL comparison semantics).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // both guards fail fast at plan build: a shared name would make the
    // post-join column references ambiguous at runtime, and a caller
    // __cell column would be silently clobbered then dropped
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals must not share column names, both have: ${shared.mkString(", ")}")
    require(!points.columns.contains("__cell") && !intervals.columns.contains("__cell"),
      "__cell is reserved by pointInInterval")
    val p = points.withColumn("__cell",
      floor(col(pointCol) / bucketWidth).cast("long"))
    // cells floor(lo/w)..floor(hi/w) inclusive: the hi-edge cell is
    // included even when hi lands exactly on a cell boundary (one empty
    // cell of slack) — the residual filter makes over-coverage harmless,
    // under-coverage would lose matches
    val i = intervals.withColumn("__cell",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(i, "__cell")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__cell")
  }

  /** Reference semantics for the same join — the broadcast nested loop
    * Spark plans for a bare range predicate. Correct at dimension scale;
    * the grid path above is the data-scale plan. Parity between the two
    * is pinned in RangeJoinSpec. */
  def pointInIntervalNaive(points: DataFrame, intervals: DataFrame,
                           pointCol: String, loCol: String, hiCol: String): DataFrame =
    points.join(broadcast(intervals),
      col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
}
