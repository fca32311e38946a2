package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the synthetic test corpus (one parquet file per table,
  * see TESTDATA.md / FIXTURES.md §B). Schema-on-read from the parquet
  * footer, mirroring the reference's ingestion style
  * (reference: src/data_processing/spark_processor.py:44-61).
  *
  * At cluster scale each of these would be a partitioned parquet
  * directory (or catalog table); the single-file layout is a test
  * artifact. Nothing here collects to the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (WidenTables(name)) widenSmallScan(spark, df, s"$dir/$name.parquet")
    else df
  }

  /** Tables whose consumers are MAP-HEAVY per input row — shingle/word
    * explodes, 64-hash MinHash signing, per-dimension vector math — where
    * a single-task scan starves the whole stage. The row-store tables
    * (lineitem/orders/events) are deliberately NOT here: their queries
    * are scan+filter+agg shapes where single-task whole-stage codegen
    * over ≤1M rows already saturates, and an A/B at sf0.1 showed the
    * repartition is a pure ~0.3–1 s tax on each of the ~100 cheap
    * queries (grand total 246 s → 302 s floored-everything) while the
    * documents-substrate family win stands (u19 6.0 → 2.7 s). */
  private val WidenTables = Set("documents", "embeddings")

  /** Parallelism floor for small single-file corpora (round 12).
    *
    * The driver's tables are ONE parquet file with ONE row group each, so
    * a scan yields ONE task no matter how it is split (a split only
    * processes row groups whose midpoint it contains) — and every
    * downstream map-heavy stage (shingle explode, 64-hash MinHash
    * signatures, regexp passes) runs on a single core of local[32]
    * (measured: u19's state build 4.4 s single-task vs 1.1 s widened).
    * A ROUND-ROBIN repartition of the raw rows right above the scan
    * restores the session's parallelism at the cheapest possible point
    * (pre-explode, narrow rows).
    *
    * Scale honesty: the floor triggers only when the table is too small
    * to reach parallelism from file splits (bytes < 4 MB/split × target,
    * capped at 512 MB) and big enough to matter (> 64 KB — broadcast-side
    * dims gain nothing from 32 empty tasks). A cluster-scale corpus is
    * past the cap, so this NEVER adds a shuffle at 100 TB. Catalyst
    * pushes filters and column pruning THROUGH the repartition into the
    * scan (pinned in PlanSpec), and every compared result is a keyed
    * aggregation/exact arithmetic per the §7.5 determinism contract, so
    * partition layout cannot change any oracle hash. */
  private val widenCache = scala.collection.concurrent.TrieMap.empty[String, Boolean]
  private def widenSmallScan(spark: SparkSession, df: DataFrame,
                             path: String): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    val widen = widenCache.getOrElseUpdate(s"$path@$target", {
      val p = new org.apache.hadoop.fs.Path(path)
      val bytes = scala.util.Try(
        p.getFileSystem(spark.sessionState.newHadoopConf())
          .getContentSummary(p).getLength).getOrElse(Long.MaxValue)
      val ceiling = math.min(4L * 1024 * 1024 * target, 512L * 1024 * 1024)
      bytes > 64L * 1024 && bytes < ceiling
    })
    if (widen) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Event-time contract: `events.ts` is always `TimestampType` after
    * loading, whatever the producer wrote. Real pipelines meet (at least)
    * three encodings across producers, and `withWatermark` accepts only
    * `TimestampType`, so the loader conforms all of them:
    *  - parquet TIMESTAMP(NANOS) → Spark reads long nanoseconds
    *    (spark.sql.legacy.parquet.nanosAsLong — see graft.engine.Sessions);
    *    truncated to micros here.
    *  - TIMESTAMP_MICROS(isAdjustedToUTC=false) → Spark reads
    *    TIMESTAMP_NTZ; cast to TimestampType. The session TZ is pinned UTC
    *    (Sessions), so the cast is instant-preserving — the wall-clock
    *    value (and every oracle hash) is unchanged.
    *  - TIMESTAMP_MICROS(isAdjustedToUTC=true) → already TimestampType;
    *    passes through. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTime(load(s, d, "events"), "ts")

  /** Conform one event-time column to `TimestampType` regardless of source
    * encoding (ns-long / NTZ / LTZ). Shared by the batch loader and the
    * streaming ingest paths so every `withWatermark(col, …)` site works on
    * any producer. No-op for columns already TimestampType. */
  def normalizeEventTime(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema(colName).dataType match {
      // integral `div`, NOT `/`: Divide casts to double, whose ulp at
      // epoch-nanos magnitude (~1.7e18 > 2^53) is ~256 ns — a ±1 µs error
      // that could flip second-boundary truncation vs the nanos-exact oracle
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql(...)` serves the
    * reference's EP2/EP3 SQL reporting surface without an external DB
    * (reference: src/main.py:311-424 goes through Postgres; we stay
    * self-contained — SURVEY.md §3 EP2). */
  /** Register one table as a temp view, routed through the per-table
    * loaders so e.g. the events view gets the same ns→TimestampType
    * normalization as DataFrame-path consumers. */
  def register(spark: SparkSession, dir: String, name: String): Unit = {
    val df = name match {
      case "events" => events(spark, dir)
      case other    => load(spark, dir, other)
    }
    df.createOrReplaceTempView(name)
  }

  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(register(spark, dir, _))
}
