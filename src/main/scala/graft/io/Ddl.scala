package graft.io

import org.apache.spark.sql.SparkSession

/** S6 — DDL executor. The reference creates three Postgres tables plus
  * indexes via a SQL batch (postgres_manager.py:154-210,
  * scripts/create_tables.sql). Self-contained analog: external catalog
  * tables over the pipeline's parquet outputs, so EP2/EP3 SQL runs against
  * `spark.sql` with no external database. Indexes have no Spark analog —
  * partition pruning + parquet min/max statistics serve that role.
  */
object Ddl {

  /** Statements mirroring create_tables.sql's three analytics tables,
    * re-shaped for the engine's corpus. Idempotent (IF NOT EXISTS). */
  def analyticsTableDdl(location: String): Seq[String] = Seq(
    s"""CREATE TABLE IF NOT EXISTS supplier_stats (
       |  l_suppkey BIGINT, total_lines BIGINT, total_revenue DOUBLE,
       |  avg_quantity DOUBLE, avg_price DOUBLE, avg_discount DOUBLE)
       |USING PARQUET LOCATION '$location/supplier_stats'""".stripMargin,
    s"""CREATE TABLE IF NOT EXISTS bucket_stats (
       |  quantity_bucket STRING, total_lines BIGINT, avg_price DOUBLE,
       |  avg_quantity DOUBLE, avg_price_per_unit DOUBLE)
       |USING PARQUET LOCATION '$location/bucket_stats'""".stripMargin,
    s"""CREATE TABLE IF NOT EXISTS pipeline_quality (
       |  dir STRING, total_rows BIGINT, duplicate_count BIGINT,
       |  quality_score DOUBLE)
       |USING PARQUET LOCATION '$location/pipeline_quality'""".stripMargin)

  /** Execute a DDL batch; returns per-statement success like the
    * reference's create_tables (failure logs and continues). */
  def execute(spark: SparkSession, statements: Seq[String]): Seq[Either[String, Unit]] =
    statements.map { ddl =>
      try { spark.sql(ddl); Right(()) }
      catch { case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
    }

  def createAnalyticsTables(spark: SparkSession, location: String): Seq[Either[String, Unit]] =
    execute(spark, analyticsTableDdl(location))
}
