package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins every branch of [[Bench.guardReason]] — the canonical-artifact
  * guard that keeps BENCH_full.json from being overwritten by a smoke
  * subset, a wrong-scale run, or a contended pass (the three failure
  * modes that produced stale/wrong committed bench artifacts in rounds
  * 8–10). Pure-function tests: no Spark, no bench run. */
class BenchGuardSpec extends AnyFunSuite {

  private val sf01 = "/root/testdata/sf0.1"
  private def artifact(sf: String, noise: Double, ioNoise: Double): String =
    s"""{"metric":"total","queries":{"sf_fake_query":1.0},"noise_factor":$noise,"io_noise_factor":$ioNoise,"sf":"$sf","value":100.0}"""

  /** Synthetic delta artifact: one query at time `t` with three identical
    * per-pass samples (so the sample-floor burst check can NOT clear a
    * regression — every pass is equally slow, exactly the shape that used
    * to need a hand-run solo re-measure). */
  private def deltaArtifact(t: Double): String =
    s"""{"metric":"total","queries":{"q_syn":$t},"samples":{"q_syn":[$t,$t,$t]},""" +
      s""""noise_factor":0.5,"io_noise_factor":1.0,"sf":"$sf01","value":$t}"""

  /** Run tools/compare_bench.py on synthetic old/new artifacts with a
    * --solo-cmd that replays a canned solo Bench artifact; returns the
    * output JSON text. Pins the r15 ask: residual adjudication fires
    * UNATTENDED — no builder in the loop. */
  private def runCompare(soloTime: Double): String = {
    import scala.sys.process._
    val dir = java.nio.file.Files.createTempDirectory("graft-benchguard")
    def write(name: String, text: String): java.nio.file.Path =
      java.nio.file.Files.writeString(dir.resolve(name), text)
    write("old.json", deltaArtifact(1.0))
    write("new.json", deltaArtifact(5.0)) // 5x at identical sentinels -> residual
    val solo = write("solo.json", deltaArtifact(soloTime))
    val out = dir.resolve("delta.json")
    val cmd = Seq("python3", "tools/compare_bench.py", out.toString,
      dir.resolve("old.json").toString, dir.resolve("new.json").toString,
      "--solo-cmd", s"cat $solo # {query}")
    assert(cmd.! == 0, s"compare_bench failed: $cmd")
    java.nio.file.Files.readString(out)
  }

  test("delta residual auto-adjudicates via the unattended solo re-measure (fast solo => solo-cleared, no open regression)") {
    val out = runCompare(soloTime = 1.1)
    assert(out.contains(""""class": "solo-cleared""""), out)
    assert(out.contains(""""solo_cleared": [\n  "q_syn"\n ]""".stripMargin) ||
      out.contains(""""solo_cleared":["q_syn"]""") ||
      out.replaceAll("\\s", "").contains(""""solo_cleared":["q_syn"]"""), out)
    assert(out.replaceAll("\\s", "").contains(""""open_regressions":[]"""), out)
    assert(out.contains("unattended solo re-measure at identical code"), out)
  }

  test("a solo re-measure that is STILL slow keeps the residual open — the adjudication can confirm a real regression, not just dismiss") {
    val out = runCompare(soloTime = 5.0)
    assert(out.replaceAll("\\s", "").contains(""""open_regressions":["q_syn"]"""), out)
    assert(out.replaceAll("\\s", "").contains(""""solo_sec":5.0"""), out)
    assert(!out.contains("solo-cleared"), out)
  }

  test("suite-drift attribution: the r16 raw-1.06-vs-normalized-1.21 split is reconciled by the solo battery") {
    // r16 verdict wrong #1, reconstructed: both sentinels read ~12%
    // faster on the new host (cpu 0.58->0.51, io 1.14->1.00) while every
    // query ran 6% slower raw -- normalization manufactures a ~1.21
    // normalized median that no per-query evidence supports. The solo
    // battery (replaying the new times on a "quiet core") must side with
    // raw_median and say so in the artifact.
    import scala.sys.process._
    val dir = java.nio.file.Files.createTempDirectory("graft-suitedrift")
    def artifact(t: Double, nf: Double, io: Double): String = {
      val qs = (1 to 11).map(i => s""""q$i":$t""").mkString(",")
      s"""{"metric":"total","queries":{$qs},"noise_factor":$nf,"io_noise_factor":$io,"sf":"$sf01","value":${t * 11}}"""
    }
    def write(name: String, text: String): java.nio.file.Path =
      java.nio.file.Files.writeString(dir.resolve(name), text)
    write("old.json", artifact(1.0, 0.58, 1.14))
    write("new.json", artifact(1.06, 0.51, 1.00))
    val solo = write("solo.json", artifact(1.06, 0.51, 1.00))
    val out = dir.resolve("delta.json")
    val cmd = Seq("python3", "tools/compare_bench.py", out.toString,
      dir.resolve("old.json").toString, dir.resolve("new.json").toString,
      "--solo-cmd", s"cat $solo # {query}")
    assert(cmd.! == 0, s"compare_bench failed: $cmd")
    val text = java.nio.file.Files.readString(out).replaceAll("\\s", "")
    assert(text.contains(""""suite_drift":{"""), text)
    assert(text.contains(""""trusted":"raw_median""""), text)
    assert(text.contains(""""battery_median":1.06"""), text)
    assert(text.contains("sentinelmiscalibration"), text)
    assert(text.contains(""""open_regressions":[]"""), text)
    // and when the medians agree, no drift section is manufactured
    write("new2.json", artifact(1.06, 0.58, 1.14))
    val out2 = dir.resolve("delta2.json")
    assert(Seq("python3", "tools/compare_bench.py", out2.toString,
      dir.resolve("old.json").toString, dir.resolve("new2.json").toString).! == 0)
    assert(java.nio.file.Files.readString(out2).replaceAll("\\s", "")
      .contains(""""suite_drift":null"""))
  }

  test("suite-drift without a solo battery is recorded as UNATTRIBUTED, never silently trusted") {
    import scala.sys.process._
    val dir = java.nio.file.Files.createTempDirectory("graft-suitedrift2")
    def artifact(t: Double, nf: Double, io: Double): String = {
      val qs = (1 to 11).map(i => s""""q$i":$t""").mkString(",")
      s"""{"metric":"total","queries":{$qs},"noise_factor":$nf,"io_noise_factor":$io,"sf":"$sf01","value":${t * 11}}"""
    }
    java.nio.file.Files.writeString(dir.resolve("old.json"), artifact(1.0, 0.58, 1.14))
    java.nio.file.Files.writeString(dir.resolve("new.json"), artifact(1.06, 0.51, 1.00))
    val out = dir.resolve("delta.json")
    assert(Seq("python3", "tools/compare_bench.py", out.toString,
      dir.resolve("old.json").toString, dir.resolve("new.json").toString).! == 0)
    val text = java.nio.file.Files.readString(out).replaceAll("\\s", "")
    assert(text.contains(""""trusted":null"""), text)
    assert(text.contains("UNATTRIBUTED"), text)
  }

  test("burstPriorCleared: an unconverged floor near the prior canonical clears; a genuinely slow floor stays unresolved") {
    val prior = Some(
      s"""{"metric":"total","queries":{"u19_kmv":3.2,"other":1.0},""" +
        s""""noise_factor":0.5,"io_noise_factor":1.0,"sf":"$sf01","value":100.0}""")
    // floor 3.5 vs prior 3.2 at identical sentinels: 1.09x — cleared,
    // with the machine-readable floor/prior/ratio record (r17 advice)
    val cleared = Bench.burstPriorCleared(prior, "u19_kmv", 3.5, 0.5, 1.0)
    assert(cleared.exists(_.detail.contains("co-tenant burst")), cleared.toString)
    assert(cleared.exists(c => c.floor == 3.5 && c.prior == 3.2 &&
      math.abs(c.ratio - 3.5 / 3.2) < 1e-9), cleared.toString)
    // floor 12.0 vs prior 3.2: 3.75x — stays unresolved (positive signal)
    assert(Bench.burstPriorCleared(prior, "u19_kmv", 12.0, 0.5, 1.0).isEmpty)
    // sentinel discounting mirrors the delta tool: a 2x-noisier current
    // run licenses a 2x-slower floor on the contended axis
    assert(Bench.burstPriorCleared(prior, "u19_kmv", 6.0, 1.0, 1.0).isDefined)
    // no prior value for the query (or no prior artifact): never clears
    assert(Bench.burstPriorCleared(prior, "unknown_q", 1.0, 0.5, 1.0).isEmpty)
    assert(Bench.burstPriorCleared(None, "u19_kmv", 3.5, 0.5, 1.0).isEmpty)
  }

  test("burstPriorCleared creep guard: chained slower-than-prior clears are refused; faster floors always clear") {
    // the r17 advice scenario: a sub-1.5x regression cleared as burst
    // last round must not clear again this round — compounding creep is
    // capped at one discounted step
    def prior(clearEntry: String) = Some(
      s"""{"metric":"total","queries":{"u19_kmv":3.5,"other":1.0},""" +
        s""""burst_prior_cleared":{$clearEntry},""" +
        s""""noise_factor":0.5,"io_noise_factor":1.0,"sf":"$sf01","value":100.0}""")
    val chained = prior(
      """"u19_kmv":{"floor":3.5,"prior":3.2,"ratio":1.094,"discounted":1.094,"detail":"x"}""")
    // slower again (4.2 vs 3.5 = 1.2x, inside BurstAgreeRatio) — REFUSED:
    // the prior value itself came from a slower-than-prior clear
    assert(Bench.burstPriorCleared(chained, "u19_kmv", 4.2, 0.5, 1.0).isEmpty)
    // but a floor back at/below the (inflated) prior still clears — the
    // ratchet can only unwind, never advance
    assert(Bench.burstPriorCleared(chained, "u19_kmv", 3.4, 0.5, 1.0).isDefined)
    // a prior clear that was NOT slower (ratio <= tolerance) does not
    // block this round's discounted clear
    val benign = prior(
      """"u19_kmv":{"floor":3.1,"prior":3.2,"ratio":0.969,"discounted":0.969,"detail":"x"}""")
    assert(Bench.burstPriorCleared(benign, "u19_kmv", 4.2, 0.5, 1.0).isDefined)
    // an OLD-FORMAT string entry (no parsable ratio) blocks slower clears
    // — the conservative side
    val oldFmt = prior(""""u19_kmv":"solo floor 3.50 s vs prior 3.20 s"""")
    assert(Bench.burstPriorCleared(oldFmt, "u19_kmv", 4.2, 0.5, 1.0).isEmpty)
    assert(Bench.burstPriorCleared(oldFmt, "u19_kmv", 3.5, 0.5, 1.0).isDefined)
    // a different query's chained entry is irrelevant
    val otherQ = prior(
      """"w3_frames":{"floor":2.0,"prior":1.5,"ratio":1.33,"discounted":1.33,"detail":"x"}""")
    assert(Bench.burstPriorCleared(otherQ, "u19_kmv", 4.2, 0.5, 1.0).isDefined)
  }

  test("subset run always diverts, even at matching sf and clean noise") {
    val r = Bench.guardReason(Some(artifact(sf01, 0.5, 1.0)), sf01,
      subsetSize = Some(3), noiseFactor = 0.5, ioNoiseFactor = 1.0)
    assert(r.exists(_.contains("subset run")))
    // and even with no prior artifact at all (nothing canonical to seed
    // from a partial sweep)
    assert(Bench.guardReason(None, sf01, Some(1), 0.5, 1.0)
      .exists(_.contains("subset run")))
  }

  test("sf mismatch diverts: an sf0.001 smoke cannot replace the sf0.1 artifact") {
    val r = Bench.guardReason(Some(artifact(sf01, 0.5, 1.0)),
      "/root/testdata/sf0.001", None, 0.4, 0.9)
    assert(r.exists(_.contains("sf mismatch")))
  }

  test("cpu noise factor >1.3x the artifact's diverts") {
    val r = Bench.guardReason(Some(artifact(sf01, 0.5, 1.0)), sf01, None,
      noiseFactor = 0.66, ioNoiseFactor = 1.0)
    assert(r.exists(_.contains("cpu noise_factor")))
    // at exactly 1.3x it does NOT divert (threshold is strict >)
    assert(Bench.guardReason(Some(artifact(sf01, 0.5, 1.0)), sf01, None,
      0.65, 1.0).isEmpty)
  }

  test("io noise factor >1.3x the artifact's diverts — the probe class the cpu sentinel missed") {
    val r = Bench.guardReason(Some(artifact(sf01, 0.5, 1.0)), sf01, None,
      noiseFactor = 0.5, ioNoiseFactor = 1.31)
    assert(r.exists(_.contains("io_noise_factor")))
  }

  test("clean full run at the artifact's sf writes the canonical path") {
    assert(Bench.guardReason(Some(artifact(sf01, 0.5, 1.0)), sf01, None,
      0.55, 1.1).isEmpty)
  }

  test("no prior artifact: a CLEAN full run seeds the canonical path at any sf") {
    assert(Bench.guardReason(None, "/root/testdata/sf0.001", None, 0.8, 1.2).isEmpty)
  }

  test("absolutely contended run diverts even with no prior artifact (no contended seed)") {
    // round-11 advice: the relative check alone let a contended run seed
    // the canonical, or ratchet it 1.3x noisier per overwrite
    assert(Bench.guardReason(None, sf01, None, 3.0, 3.0)
      .exists(_.contains("contended")))
    assert(Bench.guardReason(None, sf01, None, 1.5, 1.0)
      .exists(_.contains("contended")))
    assert(Bench.guardReason(None, sf01, None, 0.5, 2.0)
      .exists(_.contains("contended")))
    // and even when a prior artifact exists whose own noise would admit
    // the run under the relative rule (the ratchet case)
    assert(Bench.guardReason(Some(artifact(sf01, 1.4, 1.9)), sf01, None,
      1.6, 1.0).exists(_.contains("contended")))
    // just under both absolute thresholds with no prior: admitted
    assert(Bench.guardReason(None, sf01, None, 1.49, 1.99).isEmpty)
  }

  test("normalizedSlowdown: sentinel-discounted ratio vs the prior canonical") {
    // prior: 100s at clean sentinels (discount 1) -> idle 100
    val prior = Some(artifact(sf01, 0.5, 1.0))
    // this run: 260s at io 2.0 -> idle 130 -> ratio 1.3
    val r = Bench.normalizedSlowdown(prior, total = 260.0,
      noiseFactor = 0.5, ioNoiseFactor = 2.0)
    assert(r.exists(v => math.abs(v - 1.3) < 1e-9), s"got $r")
    // same-idle runs ratio 1.0 regardless of raw totals
    assert(Bench.normalizedSlowdown(prior, 150.0, 0.5, 1.5)
      .exists(v => math.abs(v - 1.0) < 1e-9))
    // no prior -> no ratio
    assert(Bench.normalizedSlowdown(None, 100.0, 0.5, 1.0).isEmpty)
    // legacy artifact without io_noise_factor: cpu-only discount
    val legacy = Some(s"""{"noise_factor":2.0,"sf":"$sf01","value":200.0}""")
    assert(Bench.normalizedSlowdown(legacy, 100.0, 1.0, 1.0)
      .exists(v => math.abs(v - 1.0) < 1e-9))
  }

  test("burst detection + robust floor: the r13 u19/u20 sample shapes") {
    // u19's r13 samples: 2.74x spread — flagged (the threshold sits at
    // 2.5 precisely so this canonical-drift shape is caught), and the two
    // fastest (12.0 vs 23.8) do NOT agree, so re-measurement is required
    val u19 = Seq(32.9, 12.0, 23.8)
    assert(Bench.burstSpread(u19) > Bench.BurstSpreadRatio)
    assert(!Bench.floorAgreed(u19))
    // u20's shape: 10x spread — flagged
    val u20 = Seq(6.7, 16.1, 1.6)
    assert(Bench.burstSpread(u20) > Bench.BurstSpreadRatio)
    assert(!Bench.floorAgreed(u20)) // 1.6 vs 6.7
    // one re-run landing near the floor resolves it and pins the value
    val resolved = u20 :+ 1.7
    assert(Bench.floorAgreed(resolved))
    assert(Bench.robustFloorValue(resolved) == 1.7) // second-smallest
    // a single lucky fast pass can NOT drag the admitted value down:
    // second-smallest of the unresolved u20 shape is 6.7, not 1.6
    assert(Bench.robustFloorValue(u20) == 6.7)
    // steady query: no flag, nothing to resolve
    assert(Bench.burstSpread(Seq(1.0, 1.2, 1.1)) < Bench.BurstSpreadRatio)
    assert(Bench.floorAgreed(Seq(1.0, 1.2, 1.1)))
    // degenerate inputs
    assert(Bench.burstSpread(Seq(1.0)) == 1.0)
    assert(!Bench.floorAgreed(Seq(1.0)))
    assert(Bench.robustFloorValue(Seq(1.0)) == 1.0)
    assert(Bench.robustFloorValue(Nil) == -1.0)
  }

  test("burstTailReason: refuses a canonical whose top-10 is >50% unresolved-burst time") {
    val values = (1 to 20).map(i => (f"q$i%02d", i.toDouble))
    // top-10 = q11..q20, total 155; q16..q20 sum 90 > 77.5 -> divert
    assert(Bench.burstTailReason(values, Set("q16", "q17", "q18", "q19", "q20"))
      .exists(_.contains("burst-dominated")))
    // one 20 s unresolved burst in a 155 s tail: admitted (adjudicate
    // cross-round via compare_bench.py instead of blocking the refresh)
    assert(Bench.burstTailReason(values, Set("q20")).isEmpty)
    // unresolved bursts OUTSIDE the top-10 never block
    assert(Bench.burstTailReason(values, Set("q01", "q02", "q03")).isEmpty)
    assert(Bench.burstTailReason(values, Set.empty).isEmpty)
    assert(Bench.burstTailReason(Nil, Set("x")).isEmpty)
  }

  test("pre-round-11 artifact without io_noise_factor: relative io check is skipped, cpu check still applies") {
    val legacy = s"""{"metric":"total","noise_factor":0.35,"sf":"$sf01","value":208.5}"""
    // io 1.9 would fail a relative >1.3x check against any plausible prior
    // but is under the ABSOLUTE threshold — with no prior io field, admitted
    assert(Bench.guardReason(Some(legacy), sf01, None, 0.40, 1.9).isEmpty)
    assert(Bench.guardReason(Some(legacy), sf01, None, 0.50, 1.0)
      .exists(_.contains("cpu noise_factor")))
  }
}
