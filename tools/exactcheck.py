#!/usr/bin/env python3
"""Strict mirror of the driver's hash gate: values compared EXACTLY
(as strings, columns sorted by name, rows sorted) — no float tolerance.

Usage: python3 tools/exactcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for f in glob.glob(f"{sf}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(f)[:-8]} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
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
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True).astype(str)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True).astype(str)
    bad = []
    for c in o.columns:
        ok = o[c] == s[c]
        if not ok.all():
            i = ok.idxmin()
            bad.append(f"{c}[{i}]: oracle={o[c][i]!r} spark={s[c][i]!r}")
    if bad:
        fails.append((name, "; ".join(bad[:3])))
    else:
        print(f"OK   {name} rows={len(o)}")
if fails:
    for n, m in fails:
        print(f"FAIL {n}: {m}")
    sys.exit(1)
print("ALL OK (exact)")
