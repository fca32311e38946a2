package graft

/** Benchmark main — runs every registered query (PRODUCTION plan, see
  * [[QuerySpec.production]]) against SPARK_GRAFT_SF_DIR and prints ONE JSON
  * line for the driver; the same complete JSON is also written to
  * SPARK_GRAFT_BENCH_OUT (default BENCH_full.json in the working dir) so per-query
  * medians survive stdout tail-truncation.
  *
  * Each query is forced through the `noop` sink so the full plan executes
  * and materializes every output column (a bare `count()` would let Catalyst
  * prune the job down to nothing and flatter the numbers).
  *
  * Per-query time is the MEDIAN of `Iterations` runs, taken across
  * INTERLEAVED full passes over the query list (not back-to-back): single-
  * shot timing on a shared machine is ±30% noise (round 1 measured a 3.7×
  * contention inflation), and back-to-back samples all land in the same
  * contention window, defeating the median.
  *
  * A query that throws is reported with value -1 and listed under "failed"
  * so the driver can distinguish a broken query from a slow one.
  *
  * CONTENTION SENTINEL: the JSON carries `"calibration": [[s,m,e], …]` —
  * one inner array per pass, each timing the SAME fixed-size in-memory
  * aggregation ([[calibrationJob]]) at the start, middle, and end of that
  * pass. Each reported probe point is the MIN of [[ProbeReps]] back-to-back
  * runs (a single short run is scheduler-jittery; contention can only
  * INFLATE a probe, so the min of a few is a far steadier floor estimate —
  * round 8's single-shot probes drifted 0.08→0.40 s on an idle box and
  * couldn't discriminate a genuinely 2×-contended run). The sentinel does
  * constant work, so its level IS the machine's noise floor during the
  * run; a co-tenant burst shows up as an inflated probe in the affected
  * pass.
  *
  * SELF-SERVE CONTENTION DISCOUNT (VERDICT r8 missing #3): the JSON also
  * carries
  *   - `"noise": [f1, f2, …]` — one factor per pass = median of that
  *     pass's probe points / [[IdleProbeSec]] (the recorded idle
  *     reference, measured on this machine class — see the constant's
  *     doc);
  *   - `"noise_factor"` — the median per-pass factor, ≈ how many × slower
  *     the machine was than idle for the run as a whole;
  *   - `"value_idle_est"` — `value / max(1, noise_factor)`: the
  *     contention-discounted estimate of the idle-equivalent total;
  *   - `"contended"` — true when `noise_factor ≥ 1.5`.
  * A consumer comparing two artifacts (e.g. a 206 s driver run vs a 107 s
  * same-code rerun) can classify the slower one as contention from the
  * artifact alone: its `noise_factor` carries the inflation and
  * `value_idle_est` lands near the clean run's `value`. Per-query medians
  * remain RAW (un-discounted) — the factor is whole-run, not per-query.
  */
object Bench {

  val Iterations = 3

  /** Back-to-back runs per reported probe point (min taken). */
  val ProbeReps = 3

  /** Recorded idle reference for one [[calibrationJob]] (seconds): the
    * typical per-pass MEDIAN of min-of-[[ProbeReps]] points measured on
    * the idle round-9 builder machine (observed pass medians 0.07–0.12 s;
    * single-point outliers to ~0.6 s are the jitter the per-pass median
    * discards; probes taken mid-full-run read slightly higher — ~0.15 —
    * from the query jobs' residual GC/cache pressure, and the FULL run is
    * what this constant discounts). If the machine class changes,
    * re-measure from an idle full-run artifact's calibration array. */
  val IdleProbeSec = 0.15

  /** Fixed-size CPU-bound probe: hash+sum over an in-memory range, no
    * I/O, no shuffle variance — same work every invocation. ~0.1–0.3 s
    * idle at local[32]; long enough to sample contention, short enough
    * to not distort the pass. */
  private val CalibrationRows = 100000000L

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

    // UNTIMED state init (QuerySpec.prepare): persisted-state variants
    // (dd6b/dd8b) build yesterday's artifacts here so the timed passes
    // measure only the amortized increment a deployment pays per batch.
    ordered.foreach { spec =>
      spec.prepare.foreach { p =>
        try p(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[bench] prepare(${spec.name}) failed: ${e.getMessage}")
        }
      }
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

    def calibrationJob(): Unit = {
      import org.apache.spark.sql.functions.{col, expr, xxhash64}
      // bit_xor, not sum: summing 1e8 64-bit hashes overflows Long and
      // Spark 4 runs ANSI arithmetic (loud failure)
      spark.range(0L, CalibrationRows, 1L, 32)
        .select(xxhash64(col("id")).as("h"))
        .agg(expr("bit_xor(h)"))
        .write.mode("overwrite").format("noop").save()
    }
    // one probe POINT = min of ProbeReps back-to-back runs (see scaladoc)
    def calibrate(): Double =
      (1 to ProbeReps).map { _ =>
        val t0 = System.nanoTime()
        calibrationJob()
        (System.nanoTime() - t0) / 1e9
      }.min
    calibrationJob() // codegen warm-up; first timed probe must not pay it

    // INTERLEAVED passes: run the FULL query list Iterations times and take
    // each query's median ACROSS passes. Back-to-back per-query iterations
    // put all 3 samples of one query inside the same co-tenant contention
    // window — round 4's driver run manufactured a phantom 7× regression on
    // t5 that way (4.28 s benched, 0.757 s re-measured idle). Spreading a
    // query's samples ~a-full-pass apart makes a burst poison at most one
    // sample, which the median discards. A query that fails on any pass is
    // reported -1/failed and skipped on later passes (re-running a broken
    // query just multiplies the cost of the failure).
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    val broken = scala.collection.mutable.Set.empty[String]
    val calibrations = scala.collection.mutable.ListBuffer.empty[Seq[Double]]
    for (_ <- 1 to Iterations) {
      val probes = scala.collection.mutable.ListBuffer.empty[Double]
      probes += calibrate()
      for ((spec, idx) <- ordered.zipWithIndex) {
        if (idx == ordered.size / 2) probes += calibrate()
        if (!broken(spec.name)) {
          val (t, ok) = runOnce(spec)
          if (ok) times(spec.name) = t :: times.getOrElse(spec.name, Nil)
          else broken += spec.name
        }
      }
      probes += calibrate()
      calibrations += probes.toSeq
    }
    val results = ordered.map { spec =>
      if (broken(spec.name)) (spec.name, (-1.0, false))
      else {
        val ts = times(spec.name).sorted
        (spec.name, (ts(ts.size / 2), true))
      }
    }
    val qs = results.map { case (k, (v, ok)) =>
      "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, (_, false)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, (v, true)) => v }.sum
    // "value" is emitted LAST: consumers that keep only the final N chars of
    // the run log (tail truncation) still see the headline total; JSON key
    // order is irrelevant to a real parser.
    val calib = calibrations
      .map(_.map(t => f"$t%.3f").mkString("[", ",", "]")).mkString("[", ",", "]")
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // per-pass contention factor vs the recorded idle reference, then the
    // whole-run factor + discounted total (see object scaladoc)
    val noisePerPass = calibrations.toSeq.map(p => median(p) / IdleProbeSec)
    val noiseFactor = if (noisePerPass.nonEmpty) median(noisePerPass) else 1.0
    val idleEst = total / math.max(1.0, noiseFactor)
    val noise = noisePerPass.map(f => f"$f%.2f").mkString("[", ",", "]")
    val json = f"""{"metric":"total","unit":"sec","iterations":$Iterations,"queries":$qs,"failed":$failed,"calibration":$calib,"noise":$noise,"noise_factor":$noiseFactor%.2f,"value_idle_est":$idleEst%.3f,"contended":${noiseFactor >= 1.5},"sf":"$sfDir","value":$total%.3f}"""
    println(json)
    // The stdout line above is tail-truncatable by log-capture harnesses
    // (round 6 lost every median alphabetically before f8 that way) — also
    // write the COMPLETE JSON to a file so per-query medians always survive.
    // Default path is RELATIVE to the working dir (override with
    // SPARK_GRAFT_BENCH_OUT) so running from another checkout writes next
    // to that checkout, not into a hardcoded absolute location.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
