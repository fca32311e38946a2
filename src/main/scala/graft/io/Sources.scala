package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC sources — the reference's "run arbitrary SQL against the
  * warehouse, get a frame back" path (reference:
  * src/storage/postgres_manager.py:80-93 `execute_query` → DataFrame).
  *
  * Scale notes: [[jdbcQuery]] pushes the ENTIRE query into the database
  * (Spark wraps it as a subquery), so aggregation/filter work happens
  * where the data lives and only the result crosses the wire — the right
  * shape for dimension/catalog lookups. For bulk table pulls,
  * [[jdbcTable]] accepts a partition spec so executors read ranges in
  * parallel instead of one connection streaming everything. Verified
  * round-trip against embedded Derby in JdbcSpec (write → read-back →
  * row/schema equality; no external service needed).
  */
object Sources {

  /** Read a whole table. Pass `partitionColumn`+bounds to split the scan
    * across `numPartitions` executor-side connections (without it, JDBC
    * reads are single-partition — a driver-shaped bottleneck at scale). */
  def jdbcTable(spark: SparkSession, url: String, table: String,
                user: String = "", password: String = "",
                partitionColumn: Option[String] = None,
                lowerBound: Long = 0L, upperBound: Long = 0L,
                numPartitions: Int = 1): DataFrame = {
    partitionColumn.foreach { _ =>
      require(upperBound > lowerBound,
        s"partitioned read needs upperBound ($upperBound) > lowerBound ($lowerBound)")
      require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    }
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
    partitionColumn.fold(base) { pc =>
      base.option("partitionColumn", pc)
        .option("lowerBound", lowerBound.toString)
        .option("upperBound", upperBound.toString)
        .option("numPartitions", numPartitions.toString)
    }.load()
  }

  /** Run `sql` INSIDE the database and read the result — the pushed-down
    * analog of the reference's execute_query. */
  def jdbcQuery(spark: SparkSession, url: String, sql: String,
                user: String = "", password: String = ""): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
      .option("user", user)
      .option("password", password)
      .load()
}
