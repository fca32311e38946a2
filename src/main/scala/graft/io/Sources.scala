package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

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

  /** Outcome of a quarantined ingest: row counts for both channels. */
  final case class IngestReport(good: Long, quarantined: Long)

  /** Schema-enforced JSON-lines ingest with corrupt-record QUARANTINE —
    * the bulk-ingest contract at 100 TB: one malformed line in a billion
    * must neither kill the job (FAILFAST) nor silently vanish
    * (DROPMALFORMED); it lands in a reviewable side channel with its raw
    * bytes intact. PERMISSIVE parsing captures each unparseable or
    * type-mismatched line's raw text in a corrupt-record column; good
    * rows and the quarantine sliver split from ONE parse of the input.
    *
    * Returns the good-row frame (exactly `schema`) after writing the
    * raw rejected lines to `quarantinePath` as text. Rows that parse
    * but carry nulls in fields the pipeline requires are NOT corrupt —
    * that is the schema gate's job (ops/Quality P6), downstream.
    *
    * Spark contract note: querying the corrupt-record column straight
    * off the raw-file plan is disallowed (UNSUPPORTED_FEATURE
    * .QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the documented `cache()`
    * workaround does not survive the V1 write path — the write command
    * plans its scan without cache substitution, resurrecting the raw
    * corrupt-only scan. So the parsed frame is `localCheckpoint`ed
    * (eager): ONE parse pass serves both channels, no raw-file relation
    * survives into either, and the returned good frame reads the
    * materialized snapshot instead of re-parsing. The snapshot lives in
    * executor memory-and-disk until the frame is GC'd — the price of
    * the split; callers wanting a stream-through good channel can
    * simply re-read with DROPMALFORMED after reviewing the report. */
  def jsonWithQuarantine(spark: SparkSession, path: String, schema: StructType,
                         quarantinePath: String): (DataFrame, IngestReport) =
    readWithQuarantine(schema, quarantinePath) { (s, corrupt) =>
      spark.read.schema(s)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .json(path)
    }

  /** [[jsonWithQuarantine]] over an in-memory frame of raw JSON lines
    * (single string column) instead of a path — the form a STREAMING
    * ingest uses inside `foreachBatch`: each arriving micro-batch of
    * raw text splits into parsed rows + quarantined lines with the same
    * channel contract, and appends each channel to its landing dir
    * (StreamingSpec pins replayed-stream == one-shot-batch parity). */
  def jsonLinesWithQuarantine(lines: DataFrame, schema: StructType,
                              quarantinePath: String): (DataFrame, IngestReport) = {
    require(lines.schema.fields.length == 1 &&
      lines.schema.fields(0).dataType == StringType,
      s"expected a single string column of raw lines, got ${lines.schema.simpleString}")
    val spark = lines.sparkSession
    import spark.implicits._
    val ds = lines.select(col(lines.columns.head)).as[String]
    readWithQuarantine(schema, quarantinePath, quarantineMode = "append") {
      (s, corrupt) =>
        spark.read.schema(s)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", corrupt)
          .json(ds)
    }
  }

  /** [[jsonWithQuarantine]] for headerless CSV (same channel contract). */
  def csvWithQuarantine(spark: SparkSession, path: String, schema: StructType,
                        quarantinePath: String): (DataFrame, IngestReport) =
    readWithQuarantine(schema, quarantinePath) { (s, corrupt) =>
      spark.read.schema(s)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .csv(path)
    }

  /** Schema-evolution-on-read: a long-lived table's parquet files span
    * schema versions (columns added over time, ints widened to longs).
    * Reads with `mergeSchema` and conforms the union to `expected`:
    * columns a file generation lacks surface as typed nulls, columns the
    * caller no longer wants are dropped, SAFE widenings
    * (byte/short/int→long, int/long/float→double) cast silently, and any
    * LOSSY mismatch (string→int, double→long, …) fails loudly instead of
    * silently truncating — the failure mode schema drift actually causes
    * at 100 TB is a quiet cast eating precision for months.
    * Name resolution is exact-match (the engine's tables are
    * machine-written; case drift would itself be a bug worth surfacing). */
  def parquetEvolved(spark: SparkSession, path: String,
                     expected: StructType): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(path)
    val rawTypes = raw.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = expected.fields.map { f =>
      rawTypes.get(f.name) match {
        case None => org.apache.spark.sql.functions.lit(null)
          .cast(f.dataType).as(f.name)
        case Some(dt) if dt == f.dataType => col(f.name)
        case Some(dt) if widens(dt, f.dataType) =>
          col(f.name).cast(f.dataType).as(f.name)
        case Some(dt) => throw new IllegalArgumentException(
          s"parquetEvolved: column ${f.name} is $dt on disk but ${f.dataType} " +
            "expected — not a safe widening; refusing to cast lossily")
      }
    }
    raw.select(cols.toIndexedSeq: _*)
  }

  import org.apache.spark.sql.types._

  /** Lossless numeric widenings (value-preserving for every input). */
  private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType | ShortType | IntegerType, LongType) => true
    case (ByteType | ShortType | IntegerType | FloatType, DoubleType) => true
    case _ => false
  }

  private def readWithQuarantine(schema: StructType, quarantinePath: String,
                                 quarantineMode: String = "overwrite")(
      read: (StructType, String) => DataFrame): (DataFrame, IngestReport) = {
    val corrupt = "_corrupt_record"
    require(!schema.fieldNames.contains(corrupt),
      s"schema must not declare $corrupt — it is the quarantine channel")
    val parsed = read(schema.add(corrupt, StringType), corrupt).localCheckpoint()
    val bad = parsed.filter(col(corrupt).isNotNull)
    bad.select(col(corrupt).as("raw"))
      .write.mode(quarantineMode).text(quarantinePath)
    // counts come from the checkpointed snapshot, not a quarantine
    // read-back — in append mode (streaming micro-batches) the dir holds
    // PRIOR batches' lines too, and the report is per-call
    val badN = bad.count()
    val good = parsed.filter(col(corrupt).isNull).drop(corrupt)
    (good, IngestReport(parsed.count() - badN, badN))
  }
}
