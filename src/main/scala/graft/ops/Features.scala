package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-column ("feature engineering") expressions — SURVEY.md §2.3.
  *
  * All pure `Column` expressions: codegen'd, no UDFs, fully pushout-friendly.
  */
object Features {

  /** D1: left-closed bucketing CASE chain
    * (reference: src/data_processing/spark_processor.py:185-189).
    * Canonical semantics decision SURVEY.md §7.4.1: a value equal to a split
    * goes to the *upper* bucket (`when(x < split)` chain), NOT pandas
    * `pd.cut` right-closed behavior.
    *
    * @param splits ascending upper-exclusive bounds; labels.length must be
    *               splits.length + 1 (last label = overflow bucket).
    */
  def bucketize(x: Column, splits: Seq[Double], labels: Seq[String]): Column = {
    require(labels.length == splits.length + 1, "need one more label than splits")
    require(splits == splits.sorted, "splits must be ascending")
    splits.zip(labels).foldRight(lit(labels.last): Column) {
      case ((split, label), rest) => when(x < split, label).otherwise(rest)
    }
  }

  /** D2: division guarded against zero/negative denominators
    * (reference: src/data_processing/spark_processor.py:190-192). */
  def guardedDiv(num: Column, den: Column): Column =
    when(den > 0, num / den).otherwise(lit(0.0))

  /** D3: guarded percentage ratio
    * (reference: src/data_processing/spark_processor.py:193-195). */
  def guardedPct(num: Column, den: Column): Column =
    when(den > 0, num / den * 100).otherwise(lit(0.0))
}
