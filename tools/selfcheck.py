#!/usr/bin/env python3
"""Self-check harness mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
Registers each parquet table as a DuckDB view, runs every oracle SQL,
and compares to the Spark-written parquet (columns sorted by name,
rows sorted, values compared with float tolerance + exact match report).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "no spark output")); continue
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}")); continue
    sdf = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{spark_dir}/*.parquet")])
    o = odf.reindex(sorted(odf.columns), axis=1)
    s = sdf.reindex(sorted(sdf.columns), axis=1)
    if list(o.columns) != list(s.columns):
        fails.append((name, f"cols: oracle={list(o.columns)} spark={list(s.columns)}")); continue
    if len(o) != len(s):
        fails.append((name, f"rows: oracle={len(o)} spark={len(s)}")); continue
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    bad = []
    for c in o.columns:
        oc, sc = o[c], s[c]
        if pd.api.types.is_float_dtype(oc) or pd.api.types.is_float_dtype(sc):
            # Two tolerance regimes: big 2-dp-rounded sums may differ by 0.01
            # near a .005 boundary (parallel vs serial summation); small
            # 6-dp-rounded metrics (ratios, correlations, similarities) must
            # agree to their rounding precision — a blanket 0.011 would mask
            # real bugs there. NB the driver's own gate is an exact hash.
            big = oc.abs().fillna(0) > 10
            tol = 1e-9 * oc.abs().fillna(0) + np.where(big, 0.011, 2e-6)
            ok = ((oc - sc).abs() <= tol) | (oc.isna() & sc.isna())
        else:
            try:
                ok = (oc.astype(str) == sc.astype(str))
            except Exception:
                ok = oc == sc
        if not ok.all():
            i = ok.idxmin()
            bad.append(f"{c}[{i}]: oracle={oc[i]!r} spark={sc[i]!r} (dtypes {oc.dtype}/{sc.dtype})")
    if bad:
        fails.append((name, "; ".join(bad[:3])))
    else:
        # dtype check (schema match matters to the driver)
        dt = [(c, str(o[c].dtype), str(s[c].dtype)) for c in o.columns if str(o[c].dtype) != str(s[c].dtype)]
        print(f"OK   {name} rows={len(o)}" + (f"  DTYPE-DIFF {dt}" if dt else ""))
if fails:
    for n, m in fails:
        print(f"FAIL {n}: {m}")
    sys.exit(1)
print("ALL OK")
