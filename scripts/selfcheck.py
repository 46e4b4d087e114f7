#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with views
over <sfDir>/*.parquet, and compares: columns sorted by name, rows
sorted, exact value equality (with a tiny float tolerance report).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    oracles = json.load(f)

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
    if not os.path.isdir(qdir):
        continue
    name = os.path.basename(qdir)
    got = norm(con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df())
    if name not in oracles:
        print(f"[rows-only] {name}: {len(got)} rows")
        continue
    try:
        exp = norm(con.sql(oracles[name]).df())
    except Exception as e:
        print(f"[FAIL-sql ] {name}: oracle error: {e}")
        fails += 1
        continue
    if list(got.columns) != list(exp.columns):
        print(f"[FAIL-cols] {name}: got {list(got.columns)} vs oracle {list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"[FAIL-rows] {name}: got {len(got)} vs oracle {len(exp)}")
        fails += 1
        continue
    # The driver's hash distinguishes dtype KIND: DuckDB's HUGEINT
    # surfaces as float64/object while Spark parquet reads back int64,
    # and that hash-mismatches even when every value is equal (bit us in
    # rounds 1 and 2). Width-only gaps (int32 vs int64) pass the gate
    # (r2 evidence: q10/q45-q50/q53 all green), so compare kinds only.
    dt_gap = [(c, str(got[c].dtype), str(exp[c].dtype))
              for c in got.columns if got[c].dtype.kind != exp[c].dtype.kind]
    if dt_gap:
        print(f"[FAIL-dtyp] {name}: {dt_gap}")
        fails += 1
        continue
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
        print(f"[OK       ] {name}: {len(got)} rows exact")
    except AssertionError:
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, rtol=1e-9)
            print(f"[FAIL-ulp ] {name}: equal at rtol=1e-9 but NOT exact (driver may hash-mismatch)")
        except AssertionError as e2:
            print(f"[FAIL-val ] {name}: {str(e2).splitlines()[-1] if str(e2) else e2}")
        fails += 1
print(f"{'PASS' if fails == 0 else 'FAIL'}: {fails} failures")
sys.exit(1 if fails else 0)
