package graft.tools

/** Dump `.explain("formatted")` of registered queries' PRODUCTION plans to
  * files — the plan-evidence artifact of the optimization rounds
  * (`plans/r<N>/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [name ...]
  * With no names, dumps every registered query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSet
    java.nio.file.Files.createDirectories(outDir)
    val spark = graft.engine.Sessions.local()
    val specs = graft.SparkEntry.specs
      .filter(s => names.isEmpty || names(s.name))
    specs.foreach { spec =>
      try {
        val df = spec.production(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          outDir.resolve(s"${spec.name}_$suffix.txt"), txt)
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] ${spec.name} failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
