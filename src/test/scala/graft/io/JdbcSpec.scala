package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** S4 (JDBC sink) + JDBC source round-trip against EMBEDDED Derby — the
  * Spark distribution ships the Derby jars for the Hive metastore, so the
  * whole write → read-back loop runs in-process with no container
  * service, standing in for the reference's Postgres
  * (src/storage/postgres_manager.py:80-152).
  */
class JdbcSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dbDir = java.nio.file.Files.createTempDirectory("graft-derby").toString
  private val url = s"jdbc:derby:$dbDir/db;create=true"

  private def frame = Seq(
    (Some(1L), Some("alpha"), Some(1.5)),
    (Some(2L), Some("beta"), None: Option[Double]),
    (Some(3L), Some("alpha"), Some(3.0)),
    (None: Option[Long], None: Option[String], None: Option[Double]) // dropped by dropna(how='all')
  ).toDF("id", "name", "val")

  test("jdbc sink round-trip: write, read back, rows and schema match; all-null rows dropped") {
    Sinks.jdbc(frame, url, "ROUND_TRIP", user = "app", password = "",
      batchsize = 2, columnTypes = Some("name VARCHAR(64)"))
    val back = Sources.jdbcTable(spark, url, "ROUND_TRIP", user = "app")
    assert(back.schema.fields.map(f => (f.name.toLowerCase, f.dataType)).toSeq ==
      frame.schema.fields.map(f => (f.name.toLowerCase, f.dataType)).toSeq)
    val got = back.collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(got == Set(
      (Some(1L), Some("alpha"), Some(1.5)),
      (Some(2L), Some("beta"), None),
      (Some(3L), Some("alpha"), Some(3.0))))
  }

  test("append mode accumulates; overwrite replaces") {
    Sinks.jdbc(frame.limit(1), url, "MODES", "app", "", columnTypes = Some("name VARCHAR(64)"))
    Sinks.jdbc(frame.limit(1), url, "MODES", "app", "")
    assert(Sources.jdbcTable(spark, url, "MODES", "app").count() == 2)
    Sinks.jdbc(frame.limit(1), url, "MODES", "app", "",
      mode = "overwrite", columnTypes = Some("name VARCHAR(64)"))
    assert(Sources.jdbcTable(spark, url, "MODES", "app").count() == 1)
  }

  test("jdbc source pushes a whole query into the database (reference execute_query path)") {
    Sinks.jdbc(frame, url, "QSRC", "app", "", columnTypes = Some("name VARCHAR(64)"))
    // Spark's JDBC writer creates case-preserved (quoted) columns, so the
    // pushed-down query must quote them too — standard SQL identifier rules
    val agg = Sources.jdbcQuery(spark, url,
      """SELECT "name", COUNT(*) AS n, SUM("val") AS s FROM QSRC GROUP BY "name"""", user = "app")
      .collect().map(r => (r.getString(0), r.getInt(1), Option(r.get(2)))).toSet // Derby COUNT(*) is INTEGER
    assert(agg == Set(("alpha", 2, Some(4.5)), ("beta", 1, None)))
  }

  test("partitioned jdbc table read splits the scan without changing results") {
    Sinks.jdbc(frame, url, "PARTED", "app", "", columnTypes = Some("name VARCHAR(64)"))
    val split = Sources.jdbcTable(spark, url, "PARTED", "app",
      partitionColumn = Some("id"), lowerBound = 1L, upperBound = 4L, numPartitions = 3)
    assert(split.rdd.getNumPartitions == 3)
    assert(split.select(sum("id")).collect()(0).getLong(0) == 6L)
  }
}
