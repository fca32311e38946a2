package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sinks
import graft.model.Tables
import graft.ops.{Cleaning, Det, Features, Quality}
import graft.queries.CoreQueries

/** EP1 — the reference's pipeline orchestration re-expressed
  * (reference: src/main.py:88-309): per-directory loop ("months"),
  * schema gate → quality metrics → clean → derive(+cache) → sample-load →
  * aggregate → sink artifacts → unpersist.
  *
  * Error-isolation policy is the reference's, made explicit instead of
  * bare try/except (SURVEY.md §7.4.7): a failed schema gate skips the
  * directory (src/main.py:114-116 `continue`); any other failed stage
  * records the error and the run continues (src/main.py:140-145,171-188).
  *
  * Scale notes: `cache()` holds the enriched frame across the multiple
  * downstream actions exactly like the reference (C1/C2,
  * src/main.py:135-137,293-295); all sinks write distributed; the only
  * driver materialization is the one-row quality report.
  */
object Pipeline {

  final case class StageResult(stage: String, ok: Boolean, rows: Long, detail: String)
  final case class DirReport(dir: String, stages: Seq[StageResult]) {
    def ok: Boolean = stages.forall(_.ok)
  }

  /** The engine's trip-table analog columns (FIXTURES.md §B mapping). */
  private val requiredCols = Set("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
  private val criticalCols = Set("l_quantity", "l_extendedprice")

  /** Parquet sink + row count in ONE job: an [[Observation]] on the frame
    * counts rows as a side-product of the write itself (CollectMetrics
    * rides the write tasks). The previous shape — write, then
    * `spark.read.parquet(path).count()` for the stage report — re-scanned
    * every artifact it had just written: a full second pass per stage at
    * 100 TB, purely to produce a report number the write already knew. */
  private def parquetCounted(df: DataFrame, path: String,
                             guard: graft.engine.PlanGuard.Policy): Long = {
    // every pipeline artifact passes the batch admission guard before its
    // write is submitted: a plan carrying a non-sliver nested loop fails
    // its stage (PlanRejected → StageResult ok=false) instead of running
    // the 100 TB-fatal job. Plan-only analysis — no extra Spark job. The
    // policy is env-tunable (GRAFT_GUARD_* via Config.fromEnv).
    val admitted = graft.engine.PlanGuard.admit(df, guard)
    val obs = Observation()
    Sinks.parquet(admitted.observe(obs, count(lit(1)).as("rows")), path)
    obs.get("rows").asInstanceOf[Long]
  }

  def processDir(spark: SparkSession, dir: String, outDir: String,
                 exactPercentiles: Boolean = false,
                 jdbc: Option[graft.engine.Config.Jdbc] = None,
                 jdbcBatchSize: Int = 1000,
                 guard: graft.engine.PlanGuard.Policy = graft.engine.PlanGuard.Policy.default): DirReport = {
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageResult]
    def stage(name: String)(f: => (Long, String)): Boolean = {
      val r =
        try { val (rows, detail) = f; StageResult(name, ok = true, rows, detail) }
        catch { case e: Exception =>
          StageResult(name, ok = false, -1, s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      stages += r
      r.ok
    }

    val li =
      try Tables.lineitem(spark, dir)
      catch { case e: Exception =>
        stages += StageResult("scan", ok = false, -1, e.getMessage)
        return DirReport(dir, stages.toSeq)
      }
    stages += StageResult("scan", ok = true, -1, s"schema=${li.columns.length} cols")

    // schema gate — failure skips the directory, like the reference's
    // `continue` (metadata-only check, no job)
    Quality.validateSchema(li, requiredCols, criticalCols) match {
      case Left(err) =>
        stages += StageResult("schema_gate", ok = false, -1, err)
        return DirReport(dir, stages.toSeq)
      case Right(()) =>
        stages += StageResult("schema_gate", ok = true, -1, "ok")
    }

    var quality: Option[Quality.QualityReport] = None
    stage("quality_metrics") {
      val r = Quality.report(li, Seq("l_quantity", "l_extendedprice"), CoreQueries.violationRules)
      quality = Some(r)
      (r.totalRows, f"score=${r.qualityScore}%.2f dups=${r.duplicateCount}")
    }

    // clean + derive (D1–D3), cached across the downstream actions (C1)
    val cleaned = Cleaning.iqrFilter(
      Cleaning.applyRules(li, CoreQueries.cleanRules),
      "l_extendedprice", exact = exactPercentiles)
    val enriched = cleaned
      .withColumn("quantity_bucket",
        Features.bucketize(col("l_quantity"), CoreQueries.bucketSplits, CoreQueries.bucketLabels))
      .withColumn("price_per_unit",
        Features.guardedDiv(col("l_extendedprice"), col("l_quantity")))
      .withColumn("discount_pct",
        Features.guardedPct(col("l_extendedprice") * col("l_discount"), col("l_extendedprice")))
      .cache()
    try {
      stage("clean_derive") {
        ((-1L), "lazy (materialized by first sink)")
      }

      // sample-load: the reference's 1%-sample Postgres path
      // (src/main.py:147-188) with a parquet destination
      stage("sample_load") {
        val sampled = enriched.sample(withReplacement = false, 0.01, seed = 42).limit(1000)
        (parquetCounted(sampled, s"$outDir/sample_load", guard), "1% seeded sample, 1000-row cap")
      }

      stage("supplier_stats") {
        val agg = enriched.groupBy("l_suppkey").agg(
          count(lit(1)).as("total_lines"),
          Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"),
          Det.davg(col("l_quantity")).as("avg_quantity"),
          Det.davg(col("l_extendedprice")).as("avg_price"),
          Det.davg(col("l_discount")).as("avg_discount"))
        (parquetCounted(agg, s"$outDir/supplier_stats", guard), "A1 analog")
      }

      stage("bucket_stats") {
        val agg = enriched.groupBy("quantity_bucket").agg(
          count(lit(1)).as("total_lines"),
          Det.davg(col("l_extendedprice")).as("avg_price"),
          Det.davg(col("l_quantity")).as("avg_quantity"),
          Det.ravg(col("price_per_unit")).as("avg_price_per_unit"))
        (parquetCounted(agg, s"$outDir/bucket_stats", guard), "A2 analog")
      }

      stage("quality_csv") {
        import spark.implicits._
        val q = quality.get
        // admit like every other pipeline write (trivially: a 1-row local
        // frame) so "every EP1 write passes the guard" holds literally
        val df = graft.engine.PlanGuard.admit(
          Seq((dir, q.totalRows, q.duplicateCount, q.qualityScore))
            .toDF("dir", "total_rows", "duplicate_count", "quality_score"), guard)
        Sinks.csv(df, s"$outDir/quality_report", singleFile = true)
        // parquet copy backs the Ddl.pipeline_quality catalog table
        Sinks.parquet(df, s"$outDir/pipeline_quality")
        (1L, "quality metrics CSV + parquet")
      }

      // warehouse summary append — the reference's primary sink
      // (src/main.py:212-227 inserts per-run summary stats into the
      // daily_trip_stats Postgres table). Optional: runs only when a JDBC
      // config is supplied; failure isolates like any stage.
      jdbc.foreach { j =>
        stage("summary_jdbc") {
          val summary = graft.engine.PlanGuard.admit(enriched.agg(
            count(lit(1)).as("total_lines"),
            Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"),
            Det.davg(col("l_quantity")).as("avg_quantity"),
            Det.davg(col("l_extendedprice")).as("avg_price"))
            .withColumn("dir", lit(dir)), guard)
          Sinks.jdbc(summary, j.url, "PIPELINE_SUMMARY", j.user, j.password,
            batchsize = jdbcBatchSize, columnTypes = Some("dir VARCHAR(256)"))
          (1L, s"summary appended to ${j.host}:${j.port}/${j.database}")
        }
      }
    } finally {
      enriched.unpersist() // C2
    }
    DirReport(dir, stages.toSeq)
  }

  /** The per-month loop: one report per directory, failures isolated.
    * `jdbc`/`jdbcBatchSize` (usually from [[graft.engine.Config.fromEnv]])
    * switch on the warehouse summary append per directory. */
  def run(spark: SparkSession, dirs: Seq[String], outRoot: String,
          jdbc: Option[graft.engine.Config.Jdbc] = None,
          jdbcBatchSize: Int = 1000,
          guard: graft.engine.PlanGuard.Policy = graft.engine.PlanGuard.Policy.default): Seq[DirReport] =
    dirs.map { dir =>
      val name = dir.replaceAll(".*/", "")
      processDir(spark, dir, s"$outRoot/$name", jdbc = jdbc, jdbcBatchSize = jdbcBatchSize,
        guard = guard)
    }

  /** [[run]] with a [[PipelineMetrics]] listener attached: every stage the
    * pipeline executes is captured with task counts / bytes / spills and
    * attributed to its directory via a per-dir job group (the reference's
    * psutil monitor, re-expressed executor-side — see [[PipelineMetrics]]).
    * The listener bus is async, so we poll until the stage count settles
    * before snapshotting (bounded wait; no private Spark API). */
  def runInstrumented(spark: SparkSession, dirs: Seq[String], outRoot: String,
                      settleMs: Long = 500, maxWaitMs: Long = 15000,
                      writeMetrics: Boolean = true,
                      jdbc: Option[graft.engine.Config.Jdbc] = None,
                      jdbcBatchSize: Int = 1000,
                      guard: graft.engine.PlanGuard.Policy = graft.engine.PlanGuard.Policy.default)
      : (Seq[DirReport], Seq[StageMetricsRow]) = {
    val listener = new PipelineMetrics
    spark.sparkContext.addSparkListener(listener)
    try {
      val reports = dirs.map { dir =>
        val name = dir.replaceAll(".*/", "")
        spark.sparkContext.setJobGroup(s"graft-pipeline-$name", s"EP1 $dir")
        try processDir(spark, dir, s"$outRoot/$name", jdbc = jdbc, jdbcBatchSize = jdbcBatchSize,
          guard = guard)
        finally spark.sparkContext.clearJobGroup()
      }
      val deadline = System.currentTimeMillis() + maxWaitMs
      var last = -1
      var cur = listener.snapshot.size
      while (cur != last && System.currentTimeMillis() < deadline) {
        last = cur
        Thread.sleep(settleMs)
        cur = listener.snapshot.size
      }
      val rows = listener.snapshot
      // the monitoring artifact the reference writes as a CSV report
      // (pipeline_monitor metrics log) — KB-scale, one row per stage
      if (writeMetrics && rows.nonEmpty)
        Sinks.csv(metricsDF(spark, rows), s"$outRoot/_stage_metrics", singleFile = true)
      (reports, rows)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** Stage metrics as a DataFrame (joins naturally against [[reportDF]]
    * on the dir-derived group name). */
  def metricsDF(spark: SparkSession, rows: Seq[StageMetricsRow]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  /** Stage results as a DataFrame — the t1 smoke surface. */
  def reportDF(spark: SparkSession, reports: Seq[DirReport]): DataFrame = {
    import spark.implicits._
    reports.flatMap(r => r.stages.map(s => (r.dir, s.stage, s.ok, s.rows, s.detail)))
      .toDF("dir", "stage", "ok", "rows", "detail")
  }
}
