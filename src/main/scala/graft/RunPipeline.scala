package graft

/** User-facing CLI — the reference's `python src/main.py` entry point
  * re-expressed (reference: src/main.py:88-309): run the EP1 pipeline
  * over one or more data directories ("months"), then generate the EP2
  * report pack over the first successful directory's artifacts.
  *
  *   sbt "runMain graft.RunPipeline /tmp/out /root/testdata/sf0.001"
  *
  * JDBC warehouse append switches on via GRAFT_JDBC_URL (+ optional
  * GRAFT_JDBC_USER/PASSWORD/BATCH_SIZE) — the settings.py contract,
  * validated up front. Exit code 1 when every directory failed; partial
  * failures follow the reference's continue policy and are visible in
  * the printed stage report.
  */
object RunPipeline {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: runMain graft.RunPipeline <outDir> <dataDir> [<dataDir> ...]")
    val outDir = args.head
    val dirs = args.tail.toSeq
    val spark = graft.engine.Sessions.local()
    val cfg = graft.engine.Config.fromEnv() match {
      case Right(c)  => c
      case Left(err) => throw new IllegalArgumentException(s"bad GRAFT_* config: $err")
    }
    val (reports, metrics) = pipeline.Pipeline.runInstrumented(spark, dirs, outDir,
      jdbc = cfg.jdbc, jdbcBatchSize = cfg.batchSize, guard = cfg.guard)
    reports.find(_.ok).foreach { r =>
      val name = r.dir.replaceAll(".*/", "")
      pipeline.Reports.generate(spark, r.dir, s"$outDir/$name", s"$outDir/reports")
    }
    // the stage report is a KB-scale summary — printing it is the CLI's
    // deliverable, not a data funnel
    pipeline.Pipeline.reportDF(spark, reports).show(100, truncate = false)
    System.err.println(
      s"[pipeline] ${reports.count(_.ok)}/${reports.size} dirs ok, " +
        s"${metrics.size} instrumented stages; artifacts under $outDir")
    val allFailed = reports.nonEmpty && reports.forall(!_.ok)
    spark.stop()
    if (allFailed) sys.exit(1)
  }
}
