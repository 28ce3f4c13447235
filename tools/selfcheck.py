#!/usr/bin/env python3
"""Self-check: mimic the driver's DuckDB-oracle compare.

Usage: selfcheck.py <sfDir> <verifyOutDir>
Reads oracle_sql.json, registers the sf tables in DuckDB, runs each
oracle, loads the Spark parquet result, sorts columns by name + rows by
value, and compares cell-by-cell (exact).
"""
import json, sys, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fails += 1
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))])
    except Exception as e:
        print(f"FAIL {name}: spark result missing {e}")
        fails += 1
        continue
    want = want[sorted(want.columns)]
    got = got[sorted(got.columns)] if sorted(got.columns) == sorted(want.columns) else got
    if sorted(got.columns) != sorted(want.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
        fails += 1
        continue
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    if len(ws) != len(gs):
        print(f"FAIL {name}: rows {len(gs)} != {len(ws)}")
        fails += 1
        continue
    # dtype-STRICT compare: the driver hashes value representations, so an
    # int64 vs HUGEINT/object/float64 mismatch fails there even when values
    # are numerically equal. Mirror that here.
    mism = []
    for c in ws.columns:
        a, b = gs[c], ws[c]
        if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
            a, b = a.astype(str), b.astype(str)
        if str(a.dtype) != str(b.dtype):
            mism.append((c, f"dtype spark={a.dtype}", f"oracle={b.dtype}", -1))
            continue
        neq = ~(a.eq(b) | (a.isna() & b.isna()))
        if neq.any():
            i = neq.idxmax()
            mism.append((c, gs[c][i], ws[c][i], int(neq.sum())))
    if mism:
        print(f"FAIL {name}: {mism[:3]}")
        fails += 1
    else:
        print(f"OK   {name} ({len(ws)} rows)")
print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
