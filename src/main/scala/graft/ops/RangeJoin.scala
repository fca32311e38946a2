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

  /** INTERVAL-OVERLAP join — both sides carry half-open intervals and a
    * pair matches iff `[lLo,lHi) ∩ [rLo,rHi) ≠ ∅` (`lLo < rHi AND
    * rLo < lHi`) and the optional equality `keys` agree. The concurrency
    * primitive (overlapping sessions, double-booked resources, in-flight
    * orders) that Spark, like the point form above, would otherwise plan
    * as a nested loop.
    *
    * Scale design: both sides explode onto the same fixed-width grid and
    * the join becomes an EQUALITY join on (keys, cell) with the overlap
    * predicate as a residual filter. A pair whose intervals share several
    * cells would match once per shared cell, so instead of a DISTINCT
    * over the (wide) match output, each pair is emitted ONLY in the first
    * cell both intervals cover — `cell == floor(max(lLo,rLo)/width)`,
    * which any overlapping pair covers on both sides by construction.
    * Exactly-once emission with zero extra shuffles; cost is
    * O(Σ spans/width + matches), shuffled on narrow keys. Equality keys
    * both shrink the candidate space and co-partition the shuffle — the
    * keyed form (per-user, per-resource) is what survives at 100 TB;
    * the keyless form is quadratic in any hot cell, same as any
    * unkeyed spatial join.
    *
    * Empty intervals (`lo >= hi`) match nothing; NULL bounds/keys never
    * match (SQL comparison semantics). Self-joins: pass the same frame
    * with renamed columns and filter `id1 < id2` on the result.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLo: String, lHi: String, rLo: String, rHi: String,
                      bucketWidth: Double,
                      keys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"left and right must not share column names, both have: ${shared.mkString(", ")}")
    require(!left.columns.contains("__cell") && !right.columns.contains("__cell"),
      "__cell is reserved by intervalOverlap")
    // hi is exclusive, but the hi-edge cell is still included (same slack
    // rule as pointInInterval): over-coverage is filtered by the residual,
    // under-coverage would lose pairs whose only shared cell is the edge
    def cells(lo: String, hi: String) =
      explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long")))
    val l = left.withColumn("__cell", cells(lLo, lHi))
    val r = right.withColumn("__cell", cells(rLo, rHi))
    val keyCond = keys.map { case (lk, rk) => col(lk) === col(rk) }
      .foldLeft(l("__cell") === r("__cell"))(_ && _)
    // greatest(lo) < least(hi) rather than the two cross-inequalities:
    // the latter wrongly matches an EMPTY interval sitting inside a
    // non-empty one ([5,5) vs [4,6) passes lLo<rHi && rLo<lHi)
    l.join(r, keyCond)
      .filter(greatest(col(lLo), col(rLo)) < least(col(lHi), col(rHi)))
      .filter(l("__cell") ===
        floor(greatest(col(lLo), col(rLo)) / bucketWidth).cast("long"))
      .drop("__cell")
  }

  /** Reference semantics for [[intervalOverlap]] — the broadcast nested
    * loop. Parity pinned in RangeJoinSpec. */
  def intervalOverlapNaive(left: DataFrame, right: DataFrame,
                           lLo: String, lHi: String, rLo: String, rHi: String,
                           keys: Seq[(String, String)] = Nil): DataFrame = {
    val cond = keys.map { case (lk, rk) => col(lk) === col(rk) }
      .foldLeft(greatest(col(lLo), col(rLo)) < least(col(lHi), col(rHi)))(_ && _)
    left.join(broadcast(right), cond)
  }
}
