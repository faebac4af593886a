#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle at a given SF. Usage:
  python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01 [query...]
(Verify must have been run first: sbt "runMain graft.Verify <sf> <out>")"""
import sys, os, json, glob
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = ok = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"MISS  {name}: no spark output")
        fail += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ERR   {name}: {e}")
        fail += 1
        continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"SCHEMA {name}: spark={gc} oracle={wc}")
        fail += 1
        continue
    g, w = got[gc], want[wc]
    if len(g) != len(w):
        print(f"ROWS  {name}: spark={len(g)} oracle={len(w)}")
        fail += 1
        continue
    try:
        import pandas as pd
        eq = g.reset_index(drop=True).astype(str).equals(
             w.reset_index(drop=True).astype(str))
    except Exception as e:
        print(f"CMP   {name}: {e}")
        fail += 1
        continue
    if eq:
        ok += 1
        print(f"OK    {name} ({len(g)} rows)")
    else:
        fail += 1
        print(f"DIFF  {name}")
        m = (g.reset_index(drop=True).astype(str)
             != w.reset_index(drop=True).astype(str))
        bad = m.any(axis=1)
        idx = bad[bad].index[:3]
        for i in idx:
            print(f"  row {i} spark={g.iloc[i].to_dict()}")
            print(f"  row {i} duck ={w.iloc[i].to_dict()}")

# queries with no oracle → rows-only
import re
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracle:
        files = glob.glob(f"{d}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"ROWSONLY {name}: {n} rows")

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
