#!/usr/bin/env python3
"""Driver-mimic correctness check (dev tool only — the shipped library is
pure Scala/Spark; this mirrors what the round driver does with Verify output).

Usage: python3 tools/check.py [sfDir] [outDir]

1. Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run.
2. For each query: loads <outDir>/<name> parquet (Spark result), runs the
   oracle SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
   sorts columns by name, sorts rows, and compares values exactly.
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    # Null-tagged sort key: rows may mix None with strings/numbers in the
    # same column (e.g. SCD2 delete rows), which plain tuple sort can't order.
    if val is None:
        return (0, "")
    if isinstance(val, float) and math.isnan(val):
        return (2, "NaN")
    return (1, val)


def frame_key(rows):
    return sorted(tuple(canon(v) for v in r) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO-OUTPUT"
            continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = sorted(got.columns)
        got_df = got.fetchall()
        got_idx = [got.columns.index(c) for c in got_cols]
        got_rows = [[r[i] for i in got_idx] for r in got_df]

        if name not in oracles:
            results[name] = f"ROWS-ONLY ({len(got_rows)} rows)" \
                if len(got_rows) > 0 else "ROWS-ONLY-EMPTY!"
            continue

        try:
            exp = con.sql(oracles[name])
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        exp_cols = sorted(exp.columns)
        exp_df = exp.fetchall()
        exp_idx = [exp.columns.index(c) for c in exp_cols]
        exp_rows = [[r[i] for i in exp_idx] for r in exp_df]

        if got_cols != exp_cols:
            results[name] = f"SCHEMA-MISMATCH spark={got_cols} duck={exp_cols}"
        elif len(got_rows) != len(exp_rows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(got_rows)} duck={len(exp_rows)}"
        elif frame_key(got_rows) != frame_key(exp_rows):
            g, e = frame_key(got_rows), frame_key(exp_rows)
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b)
            results[name] = f"VALUE-MISMATCH first-diff row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}"
        else:
            results[name] = f"MATCH ({len(got_rows)} rows)"

    ok = True
    for name, res in sorted(results.items()):
        status = "PASS" if res.startswith(("MATCH", "ROWS-ONLY (")) else "FAIL"
        if status == "FAIL":
            ok = False
        print(f"[{status}] {name}: {res}")
    # queries declared but not produced
    for name in sorted(set(oracles) - set(names)):
        ok = False
        print(f"[FAIL] {name}: declared oracle but no Verify output")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
