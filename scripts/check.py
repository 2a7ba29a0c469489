#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify's parquet
dumps against the DuckDB oracles in oracle_sql.json.

Usage: python3 scripts/check.py <sfDir> <outDir>
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no result parquet"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} != {ec}"); fails += 1; continue
    got, exp = got[gc], exp[gc]
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fails += 1; continue
    # canonical: sort rows the way the DRIVER's checker does (pandas
    # sort_values over every column) so harness-shape failures — e.g. an
    # array<double> output column, unsortable by pandas — reproduce
    # locally instead of being masked by a stringify-sort.
    try:
        got = got.sort_values(by=gc, kind="mergesort").reset_index(drop=True)
        exp = exp.sort_values(by=gc, kind="mergesort").reset_index(drop=True)
    except Exception as e:
        print(f"FAIL {name}: driver-style sort errs: {type(e).__name__}: {e}")
        fails += 1; continue
    gs = [str(t) for t in got.itertuples(index=False, name=None)]
    es = [str(t) for t in exp.itertuples(index=False, name=None)]
    if gs != es:
        bad = [(a, b) for a, b in zip(gs, es) if a != b][:3]
        print(f"FAIL {name}: value mismatch, e.g. {bad}"); fails += 1; continue
    print(f"ok   {name} ({len(got)} rows)")

# queries with no oracle: rows-only
for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(res_dir.rstrip("/"))
    if name in oracle:
        continue
    n = con.sql(f"SELECT count(*) FROM read_parquet('{res_dir}/*.parquet')").fetchone()[0]
    print(f"ok?  {name} rows-only: {n} rows")

print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
