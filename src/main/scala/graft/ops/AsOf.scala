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

  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   asofCol: String = "asof_ts"): DataFrame = {
    val tsType = right.schema(rightTs).dataType
    val leftCols = left.columns.toSeq
    // SQL ASOF equality never matches NULL keys; without this filter a
    // null-keyed left row would pick up null-keyed right rows (both land
    // in the same window partition). Left nulls then simply find no match.
    val rightNonNull = right.filter(col(key).isNotNull)

    val l = left
      .withColumn("__rt", lit(null).cast(tsType))
      .withColumn("__side", lit(1))
      .withColumn("__k", col(key))
      .withColumn("__t", col(leftTs))
    val r = leftCols.foldLeft(
      rightNonNull.select(col(key).as("__k"), col(rightTs).as("__t"), col(rightTs).as("__rt"))
        .withColumn("__side", lit(0))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.toIndexedSeq.map(col): _*)

    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn(asofCol, last(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) :+ col(asofCol): _*)
  }
}
