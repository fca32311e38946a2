#!/usr/bin/env python3
"""Noise-normalized cross-round bench comparison (VERDICT r11 ask #1).

Usage:
  compare_bench.py OUT.json OLD_BENCH.json NEW_BENCH.json \
      [--adjudicate name=noise|code:reason ...] \
      [--solo-cmd 'SPARK_GRAFT_BENCH_ONLY={query} ... runMain graft.Bench']

Raw per-query ratios between two rounds' Bench artifacts are dominated by
host variance (r10->r11 showed a flat ~1.33x median across every query
class at CPU sentinel 0.44->0.51 / IO sentinel 1.07->1.24), so a raw
ratio cannot attribute a regression to code. Each artifact carries its
own contention sentinels (noise_factor = CPU probe vs idle reference,
io_noise_factor = write+fsync+read probe vs idle reference); this tool
divides them out.

Per query (on the intersection of the two query sets):
  raw_ratio   = t_new / t_old
  cpu_norm    = (t_new / nf_new) / (t_old / nf_old)    # CPU-noise discounted
  io_norm     = (t_new / io_new) / (t_old / io_old)    # IO-noise discounted
  best_norm   = min(cpu_norm, io_norm)                 # most-favorable class

Classes:
  stable      raw_ratio <= FLAG_RATIO
  noise-flat  raw_ratio > FLAG_RATIO but best_norm <= FLAG_RATIO -- the
              whole-run sentinel movement alone explains it
  burst       best_norm > FLAG_RATIO, but the PER-PASS SAMPLES (the
              "samples" field Bench emits since r13) show the regression
              vanishes at each run's robust floor: a code regression
              slows EVERY pass including the floor, while a query-local
              co-tenant burst inflates only the passes it lands on.
              Auto-classification requires samples on BOTH sides (ADVICE
              r13: one-sided comparisons pit a floor against a median --
              min<=median bias dismisses real regressions), and each
              side's floor is the SECOND-smallest sample, so one lucky
              outlier-fast pass can't fake a burst-free floor. When
              floor_new/floor_old, sentinel-discounted, is within
              FLAG_RATIO, the query is auto-classified burst -- no manual
              isolated re-run needed (r12 ask #1).
  solo-cleared  best_norm > FLAG_RATIO and the floor check did not clear
              it, but the UNATTENDED solo re-measure (--solo-cmd) at
              identical code did -- recorded with its evidence in-row.
  residual    best_norm > FLAG_RATIO and neither the robust floor ratio
              nor the solo re-measure (when --solo-cmd is given) clears
              it, or either artifact lacks >=2 per-pass samples
              (pre-r13 artifacts) -- needs adjudication: either the code
              changed (a real regression) or the evidence for noise is
              external (empty git diff on the query's path + a same-code
              re-measure), recorded via --adjudicate. The sentinels are
              whole-run medians by design -- a 30 s co-tenant burst that
              lands on one query's 3 samples moves that query without
              moving the run median.

--adjudicate records the human/git adjudication for a residual query in
the artifact itself (e.g. --adjudicate "u19_kmv_overlap=noise:git diff
OLD..NEW -- ops/Merge.scala,queries/ExtraQueries.scala is empty"), so the
committed delta is self-contained: every residual row is either
adjudicated or an open regression, and `open_regressions` lists the rest.

--solo-cmd automates that adjudication UNATTENDED (r15 verdict wrong #3:
u19 has been the burst outlier in three rounds and each time needed a
hand-run solo re-measure): for every query still residual after the
sample-floor check, the command (with {query} substituted) is run to
re-measure it in ISOLATION at identical code; the last JSON line of its
stdout must be a graft.Bench artifact. If the solo time, discounted by
the solo run's own sentinels vs the OLD artifact's, clears FLAG_RATIO,
the query is auto-classified `solo-cleared` (co-tenant burst: the code,
run alone, is as fast as before) with the evidence embedded in its row;
if the solo run is STILL slow, the row keeps class residual and the solo
evidence now positively confirms a code regression. Either way no round
ships with an unadjudicated residual even when the builder forgets.

Headline fields:
  raw_median        median raw ratio (what a naive diff would report)
  normalized_median median best_norm ratio (the code-attributable signal)
  explain_factor    max(nf_new/nf_old, io_new/io_old, 1) -- how much of a
                    flat slowdown the sentinels alone license

SUITE-DRIFT ATTRIBUTION (r16 verdict wrong #1): raw_median and
normalized_median can disagree -- r16 shipped 1.062 raw vs 1.205
normalized because the new host's sentinels read ~12% faster while the
suite ran ~2% slower raw, so sentinel normalization manufactured an
apparent 20% suite-wide slowdown that every per-query check contradicted.
When the two medians disagree by more than DRIFT_BOUND while no residual
is open, the artifact must reconcile them instead of leaving the reader
to trust one: a fixed battery of the longest-running stable queries is
re-measured solo (--solo-cmd) at identical code on a quiet core, and the
battery's raw solo/old median -- a direct code-change measurement immune
to sentinel miscalibration -- picks which headline median the artifact
trusts. The `suite_drift` section records the battery evidence, the
trusted median, and the reason; without --solo-cmd it records the
disagreement as unattributed so no reader mistakes silence for agreement.

best_norm assumes a query's cost scales with ONE contended resource
class; a query bound by the less-contended class is over-discounted, so
normalized_median is a LOWER bound on real change and residual flags are
conservative (few false alarms, by design).

Accepts raw graft.Bench artifacts and the driver's BENCH_r{N}.json
wrapper (uses its `parsed` payload when present). Dev tool only -- not
part of the library.
"""
import json
import subprocess
import sys

FLAG_RATIO = 1.5   # best_norm above this => residual (unexplained)
MIN_SEC = 0.05     # ignore sub-50ms queries: %.3f quantization dominates
DRIFT_BOUND = 0.10   # raw-vs-normalized median disagreement needing attribution
BATTERY_SIZE = 6     # stable queries re-measured solo for drift attribution
BATTERY_MIN_SEC = 0.3  # battery members need enough runtime for signal


def solo_rerun(cmd_template, name):
    """Run the solo re-measure command for one query; return the parsed
    graft.Bench artifact from the last JSON line of its stdout, or None."""
    cmd = cmd_template.replace("{query}", name)
    try:
        out = subprocess.run(cmd, shell=True, capture_output=True,
                             text=True, timeout=1800).stdout
    except Exception as e:
        print(f"solo re-measure failed for {name}: {e}", file=sys.stderr)
        return None
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                art = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(art.get("queries"), dict):
                return art
    print(f"solo re-measure for {name}: no Bench JSON line in output",
          file=sys.stderr)
    return None


def load(path):
    with open(path) as f:
        art = json.load(f)
    if isinstance(art.get("parsed"), dict):   # driver wrapper
        art = art["parsed"]
    nf = float(art.get("noise_factor") or 1.0)
    io = float(art.get("io_noise_factor") or 1.0)
    qs = {k: v for k, v in art["queries"].items()
          if isinstance(v, (int, float)) and v > 0}
    samples = {k: [s for s in v if isinstance(s, (int, float)) and s > 0]
               for k, v in (art.get("samples") or {}).items()
               if isinstance(v, list)}
    return art, qs, max(nf, 1e-9), max(io, 1e-9), samples


def sf_key(art):
    # "/root/testdata/sf0.1" and "sf0.1" and 0.1 all mean the same rung
    sf = art.get("sf")
    s = str(sf).rstrip("/").rsplit("/", 1)[-1]
    return s if s.startswith("sf") else f"sf{s}"


def robust_floor(samples):
    """Second-smallest sample, or None with fewer than 2 samples -- the
    burst-free floor estimate that one lucky fast pass cannot fake."""
    s = sorted(samples)
    return s[1] if len(s) >= 2 else None


def median(xs):
    s = sorted(xs)
    if not s:
        return None
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main():
    args = sys.argv[1:]
    adjudications = {}
    while "--adjudicate" in args:
        i = args.index("--adjudicate")
        spec = args[i + 1]
        del args[i:i + 2]
        name, verdict = spec.split("=", 1)
        kind, _, reason = verdict.partition(":")
        if kind not in ("noise", "code"):
            sys.exit(f"adjudication kind must be noise|code, got {kind!r}")
        adjudications[name] = {"kind": kind, "reason": reason}
    solo_cmd = None
    if "--solo-cmd" in args:
        i = args.index("--solo-cmd")
        solo_cmd = args[i + 1]
        del args[i:i + 2]
    out_path, old_path, new_path = args

    old_art, old_q, old_nf, old_io, old_s = load(old_path)
    new_art, new_q, new_nf, new_io, new_s = load(new_path)
    if sf_key(old_art) != sf_key(new_art):
        sys.exit(f"sf mismatch: {old_art.get('sf')} vs {new_art.get('sf')}")

    common = sorted(set(old_q) & set(new_q))
    cpu_disc = new_nf / old_nf
    io_disc = new_io / old_io
    explain = max(cpu_disc, io_disc, 1.0)

    queries, raws, norms = {}, [], []
    for name in common:
        t0, t1 = old_q[name], new_q[name]
        if t0 < MIN_SEC or t1 < MIN_SEC:
            queries[name] = {"old": t0, "new": t1, "raw_ratio": None,
                             "class": "sub-quantum"}
            continue
        raw = t1 / t0
        cpu_norm = raw / cpu_disc
        io_norm = raw / io_disc
        best = min(cpu_norm, io_norm)
        raws.append(raw)
        norms.append(best)
        cls = ("residual" if best > FLAG_RATIO
               else "noise-flat" if raw > FLAG_RATIO
               else "stable")
        row = {
            "old": t0, "new": t1,
            "raw_ratio": round(raw, 3),
            "cpu_norm_ratio": round(cpu_norm, 3),
            "io_norm_ratio": round(io_norm, 3),
            "best_norm_ratio": round(best, 3),
            "class": cls,
        }
        o_samp, n_samp = old_s.get(name) or [], new_s.get(name) or []
        if o_samp or n_samp:
            row["old_samples"], row["new_samples"] = o_samp, n_samp
        o_floor, n_floor = robust_floor(o_samp), robust_floor(n_samp)
        if cls == "residual" and o_floor is not None and n_floor is not None:
            # intra-run spread adjudication (docstring "burst" class):
            # compare each run at its robust (second-smallest) floor --
            # ADVICE r13: BOTH sides must carry >=2 samples (a one-sided
            # floor-vs-median comparison is biased toward dismissal), and
            # second-smallest is immune to a single outlier-fast pass
            fr = max(n_floor, 0.001) / max(o_floor, 0.001)
            floor_best = min(fr / cpu_disc, fr / io_disc)
            row["floor_ratio"] = round(fr, 3)
            row["floor_norm_ratio"] = round(floor_best, 3)
            if floor_best <= FLAG_RATIO:
                row["class"] = cls = "burst"
        if name in adjudications:
            row["adjudicated"] = adjudications[name]
        queries[name] = row

    # unattended solo adjudication (r15 verdict wrong #3): re-measure each
    # still-residual query in ISOLATION at identical code; a solo time
    # that, discounted by the solo run's own sentinels vs the OLD
    # artifact's, clears FLAG_RATIO proves the interleaved slowness was a
    # co-tenant burst — the code run alone is as fast as before. A solo
    # run that is STILL slow positively confirms a code regression (the
    # row keeps class residual, now with the confirming evidence embedded)
    if solo_cmd:
        for name, row in queries.items():
            if row.get("class") != "residual" or name in adjudications:
                continue
            art = solo_rerun(solo_cmd, name)
            t = (art or {}).get("queries", {}).get(name)
            if not isinstance(t, (int, float)) or t <= 0:
                continue
            s_nf = max(float(art.get("noise_factor") or 1.0), 1e-9)
            s_io = max(float(art.get("io_noise_factor") or 1.0), 1e-9)
            ratio = t / old_q[name]
            best = min(ratio / (s_nf / old_nf), ratio / (s_io / old_io))
            row["solo_sec"] = t
            row["solo_norm_ratio"] = round(best, 3)
            if best <= FLAG_RATIO:
                row["class"] = "solo-cleared"
                row["adjudicated"] = {
                    "kind": "noise",
                    "reason": (f"unattended solo re-measure at identical code: "
                               f"{t}s vs old {old_q[name]}s "
                               f"(sentinel-discounted {round(best, 3)}x <= "
                               f"{FLAG_RATIO}) -- co-tenant burst"),
                }

    # suite-drift attribution (docstring section): reconcile disagreeing
    # headline medians with a solo battery of the longest stable queries
    raw_median = round(median(raws), 3) if raws else None
    normalized_median = round(median(norms), 3) if norms else None
    suite_drift = None
    if raw_median and normalized_median:
        disagreement = abs(normalized_median - raw_median) / raw_median
        if disagreement > DRIFT_BOUND:
            suite_drift = {
                "raw_median": raw_median,
                "normalized_median": normalized_median,
                "disagreement": round(disagreement, 3),
                "bound": DRIFT_BOUND,
            }
            battery = sorted(
                (n for n, q in queries.items()
                 if q.get("class") == "stable" and old_q[n] >= BATTERY_MIN_SEC),
                key=lambda n: -old_q[n])[:BATTERY_SIZE]
            # FALLBACK (r17 advice): in a genuine suite-wide slowdown --
            # the case attribution matters most -- long queries classify
            # residual, not stable, and the stable battery can be empty.
            # Top up with the longest-running common queries of ANY class
            # rather than silently degrading to UNATTRIBUTED.
            if len(battery) < BATTERY_SIZE:
                extra = sorted(
                    (n for n in queries if n not in battery
                     and old_q.get(n, 0) >= BATTERY_MIN_SEC),
                    key=lambda n: -old_q[n])[:BATTERY_SIZE - len(battery)]
                battery = battery + extra
            ratios, rows = [], {}
            if solo_cmd:
                for name in battery:
                    art = solo_rerun(solo_cmd, name)
                    t = (art or {}).get("queries", {}).get(name)
                    if not isinstance(t, (int, float)) or t <= 0:
                        continue
                    r = t / old_q[name]
                    ratios.append(r)
                    rows[name] = {"old": old_q[name], "solo": t,
                                  "solo_raw_ratio": round(r, 3)}
            if ratios:
                bm = round(median(ratios), 3)
                d_raw = round(abs(bm - raw_median), 3)
                d_norm = round(abs(bm - normalized_median), 3)
                trusted = ("raw_median" if d_raw <= d_norm
                           else "normalized_median")
                # r17 advice: a battery median FAR from both headline
                # medians must be surfaced, not silently endorse the
                # nearer one -- record both distances, and when even the
                # nearer one is off by more than the drift bound, demote
                # the verdict to the battery's own number.
                contradicts = min(d_raw, d_norm) / raw_median > DRIFT_BOUND
                suite_drift.update({
                    "battery": rows,
                    "battery_median": bm,
                    "battery_distance_raw": d_raw,
                    "battery_distance_normalized": d_norm,
                    "battery_contradicts_both": contradicts,
                    "trusted": "battery_median" if contradicts else trusted,
                    "reason": (
                        (f"solo battery of {len(ratios)} queries at "
                         f"identical code on a quiet core measured raw "
                         f"solo/old median {bm}, farther than {DRIFT_BOUND} "
                         f"from BOTH headline medians -- trust the battery "
                         f"itself; both headlines carry host artifacts")
                        if contradicts else
                        (f"solo battery of {len(ratios)} queries at "
                         f"identical code on a quiet core measured raw "
                         f"solo/old median {bm}, closer to {trusted}; the "
                         f"other median reflects sentinel miscalibration "
                         f"between the two hosts, not a code change")),
                })
            else:
                suite_drift.update({
                    "trusted": None,
                    "reason": ("medians disagree beyond the bound but no "
                               "--solo-cmd battery could run -- UNATTRIBUTED; "
                               "do not trust either headline median alone"),
                })

    residual = sorted(
        (n for n, q in queries.items() if q.get("class") == "residual"),
        key=lambda n: -queries[n]["best_norm_ratio"])
    burst = sorted(
        (n for n, q in queries.items() if q.get("class") == "burst"),
        key=lambda n: -queries[n]["best_norm_ratio"])
    solo_cleared = sorted(
        (n for n, q in queries.items() if q.get("class") == "solo-cleared"),
        key=lambda n: -queries[n]["best_norm_ratio"])
    open_regressions = [n for n in residual
                        if queries[n].get("adjudicated", {}).get("kind") != "noise"]
    unused = set(adjudications) - set(residual)
    if unused:
        print(f"note: adjudications for non-residual queries: {sorted(unused)}",
              file=sys.stderr)

    result = {
        "old": {"path": old_path, "noise_factor": old_nf,
                "io_noise_factor": old_io,
                "total_common": round(sum(old_q[n] for n in common), 3)},
        "new": {"path": new_path, "noise_factor": new_nf,
                "io_noise_factor": new_io,
                "total_common": round(sum(new_q[n] for n in common), 3)},
        "sf": sf_key(new_art),
        "n_common": len(common),
        "only_old": sorted(set(old_q) - set(new_q)),
        "only_new": sorted(set(new_q) - set(old_q)),
        "cpu_discount": round(cpu_disc, 3),
        "io_discount": round(io_disc, 3),
        "explain_factor": round(explain, 3),
        "raw_median": raw_median,
        "normalized_median": normalized_median,
        "suite_drift": suite_drift,
        "flag_ratio": FLAG_RATIO,
        "residual": residual,
        "burst": burst,
        "solo_cleared": solo_cleared,
        "open_regressions": open_regressions,
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    drift_note = ""
    if suite_drift:
        drift_note = (f" suite_drift(trusted={suite_drift.get('trusted')} "
                      f"battery_median={suite_drift.get('battery_median')})")
    print(f"common={len(common)} raw_median={result['raw_median']} "
          f"normalized_median={result['normalized_median']} "
          f"explain_factor={result['explain_factor']} "
          f"burst={burst} solo_cleared={solo_cleared} residual={residual} "
          f"open_regressions={open_regressions}{drift_note}")


if __name__ == "__main__":
    main()
