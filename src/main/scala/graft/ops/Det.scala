package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic (engine-portable) aggregate builders.
  *
  * Problem: `sum(double)` is order-dependent; Spark's partial/final
  * aggregation associates differently than a single-threaded oracle, so
  * raw double aggregates can differ in the last ulps and post-hoc rounding
  * still loses the coin-flip at rounding boundaries (SURVEY.md §7.4.5).
  *
  * Fix: accumulate in exact DECIMAL (the inputs are money-like values with
  * ≤4 meaningful decimal digits, so the cast is lossless), then surface the
  * exact result as a double. Decimal arithmetic is associative, so Spark and
  * any oracle produce the *bit-identical* double with no rounding discipline
  * needed. This mirrors the reference's sink DDL which also models money as
  * DECIMAL (reference: scripts/create_tables.sql:14-27).
  *
  * At 100 TB these stay fully distributable: decimal sums use the same
  * partial+final hash aggregation and whole-stage codegen as double sums
  * (marginally more cycles per row, zero extra shuffles). For approximate
  * analytics at scale the plain double forms remain available — determinism
  * here is about verifiability, not a performance compromise.
  */
object Det {
  private val Dec = DecimalType(18, 4)

  /** Exact sum of a money-like expression, surfaced as double.
    *
    * IMPORTANT: only valid when the expression's values carry ≤4 meaningful
    * decimal digits (money, 2dp×2dp products, integral counts) so the
    * double→decimal cast is value-preserving in every engine. Casting an
    * *arbitrary* double (e.g. a price/quantity ratio) to decimal is NOT
    * portable: engines legitimately differ by 1 ulp when scaling the double,
    * and those ulps accumulate across rows. For arbitrary-valued expressions
    * use plain double aggregates + [[r4]]-style rounding instead. */
  def dsum(e: Column): Column = sum(e.cast(Dec)).cast("double")

  /** Exact mean: exact decimal sum / non-null count, one double division.
    * Same ≤4-decimal-digit precondition as [[dsum]]. */
  def davg(e: Column): Column = sum(e.cast(Dec)).cast("double") / count(e)

  /** Rounded plain-double mean for arbitrary-valued expressions. The two
    * engines' double sums differ only in the last ulps; 4dp rounding leaves
    * a vanishing boundary-flip probability (SURVEY.md §7.4.5). */
  def ravg(e: Column, scale: Int = 4): Column = round(avg(e), scale)

  /** Sample stddev, rounded scale-aware: cross-engine Welford-merge vs
    * streaming variance differ ~1e-11 relative, so pick `scale` such that
    * 10^-scale ≫ value·1e-10 (2dp for price-scale columns, 6dp for
    * fraction-scale columns). */
  def rstddev(e: Column, scale: Int): Column = round(stddev_samp(e), scale)

  /** DuckDB-side SQL fragments mirroring the expressions above. */
  object Sql {
    def dsum(e: String): String =
      s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"
    def davg(e: String): String =
      s"(CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE) / COUNT($e))"
    def ravg(e: String, scale: Int = 4): String =
      s"ROUND(AVG($e), $scale)"
    def rstddev(e: String, scale: Int): String =
      s"ROUND(STDDEV_SAMP($e), $scale)"
  }
}
