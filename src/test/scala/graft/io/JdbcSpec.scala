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

  test("postgres dialect contract: reference DDL types reproduced, silent re-types caught (no server)") {
    import org.apache.spark.sql.types._
    // taxi_trips_processed-shaped frame (reference:
    // scripts/create_tables.sql:31-43; SERIAL id is server-side)
    val processed = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("vendor_id", IntegerType),
        StructField("passenger_count", DoubleType),
        StructField("trip_distance", DoubleType),
        StructField("fare_amount", DoubleType),
        StructField("tip_amount", DoubleType),
        StructField("total_amount", DoubleType),
        StructField("payment_type", IntegerType),
        StructField("rate_code_id", IntegerType),
        StructField("distance_category", StringType),
        StructField("fare_per_mile", DoubleType))))
    // DEFAULT mapping: StringType lands as TEXT — the silent re-type an
    // unpinned deploy would ship (VARCHAR(20) contract dropped)
    val bare = PostgresDdl.schemaString(processed)
    assert(bare.contains("\"distance_category\" TEXT"), bare)
    // with the reference contract applied: VARCHAR(20) restored, INTEGER
    // ids and FLOAT8 measures as in create_tables.sql (postgres FLOAT ==
    // FLOAT8)
    val pinned = PostgresDdl.schemaString(processed,
      Some(PostgresDdl.ReferenceColumnTypes("taxi_trips_processed")))
    assert(pinned.contains("\"distance_category\" VARCHAR(20)"), pinned)
    assert(pinned.contains("\"vendor_id\" INTEGER"), pinned)
    assert(pinned.contains("\"payment_type\" INTEGER"), pinned)
    assert(pinned.contains("\"fare_per_mile\" FLOAT8"), pinned)
    assert(!pinned.contains("TEXT"), s"unexpected TEXT in pinned DDL: $pinned")

    // daily_trip_stats (create_tables.sql:46-53): DECIMAL(12,2)/(8,2)
    // money — the overrides carry the exact precision whether the frame
    // arrives as exact decimal or as the engine's double money discipline
    val daily = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("total_trips", IntegerType),
        StructField("total_revenue", DoubleType),
        StructField("avg_trip_distance", DoubleType),
        StructField("avg_fare_amount", DoubleType),
        StructField("avg_tip_amount", DoubleType))))
    val dailyPinned = PostgresDdl.schemaString(daily,
      Some(PostgresDdl.ReferenceColumnTypes("daily_trip_stats")))
    // the dialect renders DECIMAL(p,s) as NUMERIC(p,s) — in PostgreSQL
    // these are the SAME type (NUMERIC is the canonical name, DECIMAL the
    // SQL-standard alias), so precision/scale are preserved exactly
    assert(dailyPinned.contains("\"total_revenue\" NUMERIC(12,2)"), dailyPinned)
    assert(dailyPinned.contains("\"avg_fare_amount\" NUMERIC(8,2)"), dailyPinned)
    assert(dailyPinned.contains("\"total_trips\" INTEGER"), dailyPinned)
    // an exact-decimal frame maps faithfully even WITHOUT overrides (the
    // common JDBC mapping preserves precision/scale)
    val dailyExact = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("total_revenue", DecimalType(12, 2)))))
    assert(PostgresDdl.schemaString(dailyExact)
      .contains("\"total_revenue\" NUMERIC(12,2)"))

    // taxi_trips_raw (create_tables.sql:10-28): CHAR(1) flag and
    // DECIMAL(10,6) coordinates survive
    val raw = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("vendor_id", IntegerType),
        StructField("store_and_fwd_flag", StringType),
        StructField("trip_distance", DoubleType),
        StructField("pickup_longitude", DoubleType),
        StructField("pickup_latitude", DoubleType),
        StructField("dropoff_longitude", DoubleType),
        StructField("dropoff_latitude", DoubleType),
        StructField("fare_amount", DoubleType),
        StructField("extra", DoubleType),
        StructField("mta_tax", DoubleType),
        StructField("tip_amount", DoubleType),
        StructField("tolls_amount", DoubleType),
        StructField("total_amount", DoubleType))))
    val rawPinned = PostgresDdl.schemaString(raw,
      Some(PostgresDdl.ReferenceColumnTypes("taxi_trips_raw")))
    assert(rawPinned.contains("\"store_and_fwd_flag\" CHAR(1)"), rawPinned)
    assert(rawPinned.contains("\"pickup_longitude\" NUMERIC(10,6)"), rawPinned)
    assert(rawPinned.contains("\"fare_amount\" NUMERIC(8,2)"), rawPinned)
  }

  test("partitioned jdbc table read splits the scan without changing results") {
    Sinks.jdbc(frame, url, "PARTED", "app", "", columnTypes = Some("name VARCHAR(64)"))
    val split = Sources.jdbcTable(spark, url, "PARTED", "app",
      partitionColumn = Some("id"), lowerBound = 1L, upperBound = 4L, numPartitions = 3)
    assert(split.rdd.getNumPartitions == 3)
    assert(split.select(sum("id")).collect()(0).getLong(0) == 6L)
  }
}
