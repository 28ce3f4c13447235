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
    # dtype-strict compare, calibrated against driver behavior:
    #  - int width (int32 vs int64) is driver-equivalent (r2 evidence:
    #    ann_bruteforce/q_fuzzy_match/text_* all int32-vs-BIGINT, all
    #    hash-green) -> normalize integer kinds to int64;
    #  - datetimes are compared at microsecond precision (Spark parquet
    #    micros vs DuckDB us); tz-aware vs naive stays a FAIL;
    #  - a float64 column with only-integral values + nulls against an
    #    int column is pandas' nullable-int artifact -> WARN + value
    #    compare (the driver may or may not accept; keep it visible);
    #  - everything else (object/HUGEINT/float-vs-int) stays a FAIL --
    #    that's the class that cost round 1 two red rows.
    mism = []
    warns = []
    for c in ws.columns:
        a, b = gs[c], ws[c]
        if a.dtype.kind in "iu" and b.dtype.kind in "iu":
            a, b = a.astype("int64"), b.astype("int64")
        elif a.dtype.kind == "M" or b.dtype.kind == "M":
            # parquet DATE loads as object-of-datetime.date; DuckDB DATE
            # as datetime64 -- driver-equivalent (r2: q3/q_running_total
            # green). Normalize both through to_datetime, then compare
            # at microsecond precision.
            try:
                a = pd.to_datetime(a)
                b = pd.to_datetime(b)
            except (ValueError, TypeError):
                mism.append((c, f"dtype spark={gs[c].dtype}", f"oracle={ws[c].dtype}", -1))
                continue
            ta = getattr(a.dtype, "tz", None)
            tb = getattr(b.dtype, "tz", None)
            if ta != tb:
                mism.append((c, f"tz spark={ta}", f"oracle={tb}", -1))
                continue
            # tz-aware -> naive first: astype('datetime64[us]') raises
            # TypeError on tz-aware series in pandas 2.x
            if ta is not None:
                a = a.dt.tz_convert("UTC").dt.tz_localize(None)
                b = b.dt.tz_convert("UTC").dt.tz_localize(None)
            a = a.astype("datetime64[us]").astype(str)
            b = b.astype("datetime64[us]").astype(str)
        elif {a.dtype.kind, b.dtype.kind} == {"f", "i"} or \
             {a.dtype.kind, b.dtype.kind} == {"f", "u"}:
            f = a if a.dtype.kind == "f" else b
            if ((f.dropna() % 1) == 0).all():
                warns.append(c)
                a, b = a.astype("float64"), b.astype("float64")
            else:
                mism.append((c, f"dtype spark={gs[c].dtype}", f"oracle={ws[c].dtype}", -1))
                continue
        if str(a.dtype) != str(b.dtype):
            mism.append((c, f"dtype spark={a.dtype}", f"oracle={b.dtype}", -1))
            continue
        neq = ~(a.eq(b) | (a.isna() & b.isna()))
        if neq.any():
            i = neq.idxmax()
            mism.append((c, gs[c][i], ws[c][i], int(neq.sum())))
    if warns:
        print(f"WARN {name}: nullable-int-as-float cols {warns} (driver may hash-fail)")
    if mism:
        print(f"FAIL {name}: {mism[:3]}")
        fails += 1
    else:
        print(f"OK   {name} ({len(ws)} rows)")
print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
