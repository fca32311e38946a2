#!/usr/bin/env python3
"""Merge per-rung Bench artifacts into BENCH_ladder.json.

Usage: make_ladder.py OUT.json LABEL=BENCH.json [LABEL=BENCH.json ...]

Each input is a graft.Bench artifact (run with SPARK_GRAFT_BENCH_ONLY
restricted to the ladder query set and SPARK_GRAFT_SF_DIR at that rung).
Rung size n = lineitem row count of the artifact's recorded sf dir (read
from parquet footer metadata — no scan).

For every query the output carries the per-rung medians plus, between
consecutive rungs, the measured time ratio vs the (n log n) ratio; a
query is flagged ok when every measured ratio is within SLACK of the
n log n ratio (fixed overheads make small-sf ratios sublinear, which
passes trivially — the claim under test is the top rung).
"""
import json
import math
import os
import sys

import pyarrow.parquet as pq

SLACK = 1.3


def lineitem_rows(sf_dir):
    path = os.path.join(sf_dir, "lineitem.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path) if f.endswith(".parquet"))
    return pq.ParquetFile(path).metadata.num_rows


def main():
    out_path = sys.argv[1]
    rungs = []  # (label, artifact, n)
    for spec in sys.argv[2:]:
        label, path = spec.split("=", 1)
        art = json.load(open(path))
        # an artifact re-synthesized from a committed ladder carries its
        # rung size directly (the original sf dir may no longer exist on
        # this machine); a fresh Bench artifact is sized from its sf dir
        n = art.get("lineitem_rows") or lineitem_rows(art["sf"])
        rungs.append((label, art, n))

    names = sorted(set.union(*(set(a["queries"]) for _, a, _ in rungs)))
    queries, growth = {}, {}
    all_ok = True
    for name in names:
        times = {lab: a["queries"].get(name) for lab, a, _ in rungs}
        queries[name] = times
        steps, ok = [], True
        for (l0, a0, n0), (l1, a1, n1) in zip(rungs, rungs[1:]):
            t0, t1 = a0["queries"].get(name), a1["queries"].get(name)
            # a query ABSENT from a rung's artifact was not attempted there
            # (e.g. only the top-5 heaviest run at the biggest rung) -- the
            # step is skipped, not failed; an attempted-and-failed query
            # (-1) still fails. A legitimate 0.000 median (sub-ms query
            # quantized by the artifact's %.3f format at a small rung) is
            # neither: clamp it to the format quantum so the ratio stays
            # finite and the trivially-fast rung passes (round-11 advice)
            if t0 is None or t1 is None:
                steps.append({"step": f"{l0}->{l1}", "ratio": None,
                              "skipped": True})
                continue
            if t0 < 0 or t1 < 0:
                ok = False
                steps.append({"step": f"{l0}->{l1}", "ratio": None})
                continue
            t0, t1 = max(t0, 0.001), max(t1, 0.001)
            ratio = t1 / t0
            nlogn = (n1 * math.log(n1)) / (n0 * math.log(n0))
            step_ok = ratio <= nlogn * SLACK
            ok = ok and step_ok
            steps.append({"step": f"{l0}->{l1}", "ratio": round(ratio, 2),
                          "nlogn_ratio": round(nlogn, 2), "ok": step_ok})
        # a query with ZERO measured (non-skipped) steps was never
        # attempted across consecutive rungs: mark it "unmeasured" rather
        # than letting it ride all_ok as a silent pass (r12 advice)
        measured = [s for s in steps if not s.get("skipped")]
        if not measured:
            growth[name] = {"steps": steps, "ok": None, "unmeasured": True}
            all_ok = False
        else:
            growth[name] = {"steps": steps, "ok": ok}
            all_ok = all_ok and ok

    result = {
        "metric": "ladder",
        "slack": SLACK,
        "rungs": [{"label": lab, "sf": a["sf"], "lineitem_rows": n,
                   "noise_factor": a.get("noise_factor"),
                   "io_noise_factor": a.get("io_noise_factor"),
                   "contended": a.get("contended")}
                  for lab, a, n in rungs],
        "queries": queries,
        "growth": growth,
        "all_ok": all_ok,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"{out_path}: {len(names)} queries, all_ok={all_ok}")
    for name in names:
        if growth[name].get("unmeasured"):
            print(f"  UNMEASURED {name}: no rung pair carries a measurement")
        elif not growth[name]["ok"]:
            print(f"  OVER-BOUND {name}: {growth[name]['steps']}")


if __name__ == "__main__":
    main()
