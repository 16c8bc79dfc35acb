#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the matching oracle SQL in
DuckDB over the same parquet tables and compares (columns sorted by name,
exact value equality). Reports per-query PASS/FAIL with first diffs.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v + 0.0  # normalize -0.0
    return v


def frame(con, rel):
    df = rel.fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    dtypes = {c: str(df[c].dtype) for c in cols}
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return cols, dtypes, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        if name not in oracles:
            n = con.sql(f"SELECT count(*) FROM '{qdir}/*.parquet'").fetchone()[0]
            print(f"[rows-only] {name}: {n} rows")
            continue
        try:
            got_cols, got_dtypes, got = frame(con, con.sql(f"SELECT * FROM '{qdir}/*.parquet'"))
            want_cols, want_dtypes, want = frame(con, con.sql(oracles[name]))
        except Exception as e:
            print(f"[FAIL] {name}: exception {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"[FAIL] {name}: schema mismatch spark={got_cols} oracle={want_cols}")
            n_fail += 1
            continue
        # The driver's hash compare is dtype-sensitive (600 int64 vs 600.0
        # float64 hash differently even though == passes); surface any
        # pandas-dtype drift as a hard failure so it can't slip through.
        if got_dtypes != want_dtypes:
            drift = {c: (got_dtypes[c], want_dtypes[c])
                     for c in got_dtypes if got_dtypes[c] != want_dtypes.get(c)}
            print(f"[FAIL] {name}: dtype drift (spark, oracle) = {drift}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"[FAIL] {name}: rowcount spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(got, want)) if a != b]
        if diffs:
            print(f"[FAIL] {name}: {len(diffs)}/{len(got)} rows differ; first: ")
            for i, a, b in diffs[:3]:
                print(f"    row {i}: spark={a}")
                print(f"            oracle={b}")
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(got)} rows")
            n_pass += 1
    # queries that have an oracle but produced no parquet (failed in Verify)
    for name in sorted(oracles):
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"[FAIL] {name}: no Spark output written")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
