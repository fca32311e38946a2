package graft

/** Benchmark main — runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Each query is forced through the `noop` sink so the full plan executes
  * and materializes every output column (a bare `count()` would let Catalyst
  * prune the job down to nothing and flatter the numbers).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local()

    def runOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // JVM/codegen warm-up on the smallest sf (not timed)
    ordered.take(2).foreach { case (n, f) =>
      try f(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    val results = ordered.map { case (name, fn) => name -> runOnce(name, fn) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
