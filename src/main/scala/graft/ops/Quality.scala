package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validation — SURVEY.md §2.4 A6–A9 and §2.2 P3/P4/P6.
  *
  * The reference computes these as N+5 separate Spark actions (one full scan
  * per column null-count, a distinct().count() for dups, one scan per rule —
  * reference: src/data_processing/data_validator.py:102-155). That is the
  * §4.3 anti-pattern. Here everything except the duplicate count folds into
  * ONE conditional-aggregation pass; the duplicate count needs its own
  * shuffle by definition (whole-row distinct).
  */
object Quality {

  /** A violation rule: named disjunctive predicate counted per pass
    * (reference: src/data_processing/data_validator.py:136-147). */
  final case class Rule(name: String, predicate: Column)

  final case class QualityReport(
      totalRows: Long,
      nullCounts: Map[String, Long],
      completeness: Map[String, Double],
      duplicateCount: Long,
      ruleViolations: Map[String, Long],
      qualityScore: Double)

  /** Single-pass aggregate plan producing one wide row:
    * total_rows, <col>_nulls per column, <rule> count per rule. */
  def metricsPlan(df: DataFrame, columns: Seq[String], rules: Seq[Rule]): DataFrame = {
    // coalesce: SUM over an empty frame is NULL — surface 0 so consumers
    // (report, the a6/a8 oracles) never see nulls on degenerate input
    val aggs =
      count(lit(1)).as("total_rows") +:
      (columns.map(c => coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"${c}_nulls")) ++
       rules.map(r => coalesce(sum(when(r.predicate, 1L).otherwise(0L)), lit(0L)).as(r.name)))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** A7: whole-row duplicate count. Kept separate (needs a distinct shuffle);
    * one job, not the reference's two full counts
    * (reference: src/data_validator.py:127-129 does count() + distinct().count()). */
  def duplicateCount(df: DataFrame): Long = {
    val r = df.groupBy(df.columns.toIndexedSeq.map(col): _*).count()
      .agg(sum(when(col("count") > 1, col("count") - 1)).as("dups")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Full quality report (A6+A7+A8+A9) in two jobs total. Quality score
    * formula mirrors reference src/data_validator.py:149-152 exactly:
    * max(0, (rows − Σ violations) / rows · 100), 2dp — business-rule
    * violations ONLY; null counts are reported but do not penalize. */
  def report(df: DataFrame, columns: Seq[String], rules: Seq[Rule]): QualityReport = {
    val row = metricsPlan(df, columns, rules).head()
    val total = row.getLong(0)
    val nulls = columns.zipWithIndex.map { case (c, i) => c -> row.getLong(1 + i) }.toMap
    val viol = rules.zipWithIndex.map { case (r, i) => r.name -> row.getLong(1 + columns.length + i) }.toMap
    val dups = duplicateCount(df)
    val completeness = nulls.map { case (c, n) =>
      c -> (if (total == 0) 0.0 else math.rint((total - n).toDouble / total * 10000) / 100)
    }
    val score =
      if (total == 0) 0.0
      else math.max(0.0, math.rint((total - viol.values.sum).toDouble / total * 10000) / 100)
    QualityReport(total, nulls, completeness, dups, viol, score)
  }

  /** P6/schema gate: required-column set check, metadata-only
    * (reference: src/data_processing/data_validator.py:157-184). */
  def validateSchema(df: DataFrame, required: Set[String], critical: Set[String]): Either[String, Unit] = {
    val present = df.columns.toSet
    val missingCritical = critical -- present
    val missing = required -- present
    if (missingCritical.nonEmpty) Left(s"missing critical columns: ${missingCritical.toSeq.sorted.mkString(",")}")
    else if (missing.nonEmpty) Left(s"missing columns: ${missing.toSeq.sorted.mkString(",")}")
    else Right(())
  }
}
