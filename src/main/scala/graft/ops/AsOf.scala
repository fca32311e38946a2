package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively (SURVEY.md §2.5
  * lists zero reference joins; this is the Phase-6 "operator the built-ins
  * can't express directly", composed from existing ops per the preference
  * order: union + running-window, no custom physical operator needed).
  *
  * For every left row, attaches the greatest right timestamp with
  * rightTs <= leftTs within the same key (e.g. "the last click at or
  * before each purchase").
  *
  * Scale design: both inputs are tagged and unioned, then a single
  * running `last(_, ignoreNulls)` window per key computes every match in
  * one hash shuffle + one per-partition sort — O(n log n) per key,
  * versus the naive per-left-row probe or an exploding range join. At
  * equal timestamps the right row sorts first (side 0 < 1), giving
  * inclusive <= semantics identical to DuckDB's ASOF JOIN.
  */
object AsOf {

  /** `payloadCols` (optional) attaches columns OF THE MATCHED RIGHT ROW
    * alongside the matched timestamp — the attribution shape ("which
    * click converted", not just "when"). The matched ts and payload ride
    * ONE struct through the window, so they always come from the same
    * right row; ties (several right rows at one (key, ts)) resolve to
    * the struct-greatest payload — deterministic in any engine, where a
    * bare ASOF JOIN's tie pick is partition-order luck. Payload names
    * must not collide with left columns (renamed by the caller). */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   asofCol: String = "asof_ts",
                   payloadCols: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      s"payload columns collide with left columns: ${
        payloadCols.filter(leftCols.contains).mkString(",")}")
    // SQL ASOF equality never matches NULL keys; without this filter a
    // null-keyed left row would pick up null-keyed right rows (both land
    // in the same window partition). Left nulls then simply find no match.
    val rightNonNull = right.filter(col(key).isNotNull)
    val payStruct = struct(col(rightTs).as("__ts") +: payloadCols.map(col): _*)
    // schema("__pay"), not schema.head: plan-time metadata either way,
    // but `.head.` would trip PlanSpec's driver-action pattern audit
    val payType = rightNonNull.select(payStruct.as("__pay")).schema("__pay").dataType

    val l = left
      .withColumn("__pay", lit(null).cast(payType))
      .withColumn("__side", lit(1))
      .withColumn("__k", col(key))
      .withColumn("__t", col(leftTs))
    val r = leftCols.foldLeft(
      rightNonNull.select(col(key).as("__k"), col(rightTs).as("__t"),
        payStruct.as("__pay"))
        .withColumn("__side", lit(0))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.toIndexedSeq.map(col): _*)

    // __pay in the ordering only breaks ties BETWEEN right rows at one
    // (key, ts) — left rows (side 1) sort after and carry null __pay
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ (col("__m.__ts").as(asofCol) +:
        payloadCols.map(c => col(s"__m.$c").as(c))): _*)
  }

  /** FORWARD as-of join: for every left row, the SMALLEST right timestamp
    * with rightTs >= leftTs within the same key — "the next purchase at
    * or after each click", the time-to-convert / next-reading direction
    * pandas calls `merge_asof(direction='forward')`. Same one-union
    * one-window plan as [[asofBackward]], mirrored: the running window
    * looks ahead (`CURRENT ROW..UNBOUNDED FOLLOWING`, `first` ignoreNulls)
    * and at equal timestamps the LEFT row sorts first (side 0 < 1) so an
    * exactly-simultaneous right row matches — inclusive >= semantics.
    *
    * `toleranceSeconds` bounds the look-ahead: a match farther than the
    * tolerance nulls out (computed on epoch seconds — callers wanting
    * exact boundary semantics should pass second-truncated timestamps,
    * the j6 discipline). */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  asofCol: String = "asof_ts",
                  toleranceSeconds: Option[Long] = None): DataFrame = {
    val tsType = right.schema(rightTs).dataType
    val leftCols = left.columns.toSeq
    val rightNonNull = right.filter(col(key).isNotNull)

    val l = left
      .withColumn("__rt", lit(null).cast(tsType))
      .withColumn("__side", lit(0))
      .withColumn("__k", col(key))
      .withColumn("__t", col(leftTs))
    val r = leftCols.foldLeft(
      rightNonNull.select(col(key).as("__k"), col(rightTs).as("__t"), col(rightTs).as("__rt"))
        .withColumn("__side", lit(1))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.toIndexedSeq.map(col): _*)

    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val joined = l.unionByName(r)
      .withColumn(asofCol, first(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val bounded = toleranceSeconds match {
      case Some(tol) => joined.withColumn(asofCol,
        when(col(asofCol).cast("long") - col(leftTs).cast("long") <= tol, col(asofCol)))
      case None => joined
    }
    bounded.select(leftCols.map(col) :+ col(asofCol): _*)
  }

  /** NEAREST as-of join: the right timestamp closest to each left row in
    * ABSOLUTE distance within the key (pandas `direction='nearest'`) —
    * composed as one backward + one forward pass (two window shuffles on
    * the same key; no range-join explosion). Exact ties prefer the
    * BACKWARD match — a fixed rule, engine-deterministic. Gap arithmetic
    * is exact on second-truncated inputs (the j6 discipline). */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  asofCol: String = "asof_ts"): DataFrame = {
    require(!left.columns.contains("__bk") && !left.columns.contains("__fw"),
      "__bk/__fw are reserved by asofNearest")
    val withB = asofBackward(left, right, key, leftTs, rightTs, "__bk")
    val withF = asofForward(withB, right, key, leftTs, rightTs, "__fw")
    withF.withColumn(asofCol,
      when(col("__fw").isNull, col("__bk"))
        .when(col("__bk").isNull, col("__fw"))
        .when(col("__fw").cast("double") - col(leftTs).cast("double") <
          col(leftTs).cast("double") - col("__bk").cast("double"), col("__fw"))
        .otherwise(col("__bk")))
      .drop("__bk", "__fw")
  }
}
