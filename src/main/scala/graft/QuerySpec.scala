package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of engine capability: a Spark query over the test
  * corpus plus (when SQL-expressible) an equivalent ANSI-SQL oracle the
  * driver runs in DuckDB on the same parquet files.
  *
  * Determinism contract (SURVEY.md §7.5): every oracle-bearing query has a
  * total ORDER BY, accumulates money in exact DECIMAL (surfaced as double —
  * see [[graft.ops.Det]]), avoids raw timestamps/sampling/rand in compared
  * output, and aliases every column identically on both sides.
  */
final case class QuerySpec(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def sql(name: String, doc: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, doc, run, Some(oracle))

  /** Non-SQL-expressible op: the driver records a weaker rows-only check;
    * correctness is pinned by a ScalaTest spec instead. */
  def rowsOnly(name: String, doc: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, doc, run, None)
}
