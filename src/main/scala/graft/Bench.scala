package graft

/** Benchmark main — runs every registered query (PRODUCTION plan, see
  * [[QuerySpec.production]]) against SPARK_GRAFT_SF_DIR and prints ONE JSON
  * line for the driver.
  *
  * Each query is forced through the `noop` sink so the full plan executes
  * and materializes every output column (a bare `count()` would let Catalyst
  * prune the job down to nothing and flatter the numbers).
  *
  * Per-query time is the MEDIAN of `Iterations` runs: single-shot timing on
  * a shared machine is ±30% noise (round 1 measured a 3.7× contention
  * inflation), and the median keeps one descheduled run from polluting
  * round-over-round deltas.
  *
  * A query that throws is reported with value -1 and listed under "failed"
  * so the driver can distinguish a broken query from a slow one.
  */
object Bench {

  val Iterations = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local()

    // Optional comma-separated allowlist for local iteration on a subset
    // (the driver never sets it, so driver runs always time the full set).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.specs.sortBy(_.name)
      .filter(s => only.forall(_.contains(s.name)))

    // JVM/codegen warm-up on the smallest sf (not timed). Fall back to the
    // bench dir itself if the smoke corpus is absent on this machine.
    val warmDir =
      Seq("/root/testdata/sf0.001", sfDir)
        .find(p => new java.io.File(p).isDirectory).getOrElse(sfDir)
    ordered.foreach { spec =>
      try spec.production(spark, warmDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }

    def runOnce(spec: QuerySpec): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { spec.production(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${spec.name} failed: ${e.getMessage}"); false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    /** Median of Iterations runs; the first failed run short-circuits
      * (re-running a broken query twice more just triples the cost of
      * the failure). */
    def runMedian(spec: QuerySpec): (Double, Boolean) = {
      val times = new scala.collection.mutable.ArrayBuffer[Double](Iterations)
      var i = 0
      while (i < Iterations) {
        val (t, ok) = runOnce(spec)
        if (!ok) return (-1.0, false)
        times += t
        i += 1
      }
      (times.sorted.apply(Iterations / 2), true)
    }

    val results = ordered.map(spec => (spec.name, runMedian(spec)))
    val qs = results.map { case (k, (v, ok)) =>
      "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, (_, false)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, (v, true)) => v }.sum
    // "value" is emitted LAST: consumers that keep only the final N chars of
    // the run log (tail truncation) still see the headline total; JSON key
    // order is irrelevant to a real parser.
    println(f"""{"metric":"total","unit":"sec","iterations":$Iterations,"queries":$qs,"failed":$failed,"sf":"$sfDir","value":$total%.3f}""")
    spark.stop()
  }
}
