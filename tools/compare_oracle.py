#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB against <sfDir>/*.parquet registered as
views, sorts columns by name, and compares row-by-row. Reports per-query
match/mismatch with first diffs. Dev tool only — not part of the library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: the engine's determinism contract is bit-equality
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # A subset Verify run (SPARK_GRAFT_VERIFY_ONLY) writes its filtered map
    # as oracle_sql.partial.json so it can never clobber a full-run map;
    # prefer the partial map when it is the newer artifact in this dir.
    full, partial = Path(out_dir, "oracle_sql.json"), Path(out_dir, "oracle_sql.partial.json")
    if partial.exists() and (not full.exists() or partial.stat().st_mtime >= full.stat().st_mtime):
        oracle = json.loads(partial.read_text())
    else:
        oracle = json.loads(full.read_text())
    results = {}
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            results[name] = "MISSING spark result"
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf()
        except Exception as e:
            results[name] = f"READ FAIL: {e}"
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE SQL FAIL: {e}"
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            results[name] = f"COLUMNS differ: spark={s_cols} duck={d_cols}"
            continue
        # Driver's gate hashes TYPED values: a BIGINT vs HUGEINT/float64 dtype
        # mismatch fails it even when the values compare equal in Python.
        dt_diffs = [
            (c, str(spark_df[c].dtype), str(duck_df[c].dtype))
            for c in s_cols if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
        if dt_diffs:
            results[name] = "DTYPES differ: " + "; ".join(
                f"{c}: spark={s} duck={d}" for c, s, d in dt_diffs)
            continue
        if len(spark_df) != len(duck_df):
            results[name] = f"ROWS differ: spark={len(spark_df)} duck={len(duck_df)}"
            continue
        spark_df = spark_df[s_cols]
        duck_df = duck_df[d_cols]
        diffs = []
        srec = spark_df.to_dict("records")
        drec = duck_df.to_dict("records")
        for i, (sr, dr) in enumerate(zip(srec, drec)):
            for c in s_cols:
                if not values_equal(norm(sr[c]), norm(dr[c])):
                    diffs.append((i, c, sr[c], dr[c]))
                    if len(diffs) >= 3:
                        break
            if len(diffs) >= 3:
                break
        if diffs:
            results[name] = "VALUES differ: " + "; ".join(
                f"row {i} col {c}: spark={s!r} duck={d!r}" for i, c, s, d in diffs)
        else:
            results[name] = "OK"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else f"  -> {v}"))
    print(f"\n{n_ok}/{len(results)} queries match the oracle")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
