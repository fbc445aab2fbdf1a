#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

For each query parquet in verify_out_dir, if oracle_sql.json has an entry,
run it in DuckDB with the sf tables registered as views, sort columns by
name, sort rows, and compare values exactly.
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for qdir in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(qdir.rstrip("/"))
    if name.startswith("_"):
        continue
    got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
    if name not in oracle:
        print(f"{name:22s} rows-only: {len(got)} rows")
        continue
    want = con.execute(oracle[name]).fetchdf()
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"{name:22s} FAIL cols: got {list(got.columns)} want {list(want.columns)}")
        fails += 1
        continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    if len(g) != len(w):
        print(f"{name:22s} FAIL rows: got {len(g)} want {len(w)}")
        fails += 1
        continue
    # exact value compare via string repr of every cell
    mism = None
    for cidx, c in enumerate(g.columns):
        gv = g[c].astype(str).tolist()
        wv = w[c].astype(str).tolist()
        if gv != wv:
            for i, (a, b) in enumerate(zip(gv, wv)):
                if a != b:
                    mism = (c, i, a, b)
                    break
            break
    if mism:
        c, i, a, b = mism
        print(f"{name:22s} FAIL val: col={c} row={i} got={a} want={b}")
        fails += 1
    else:
        print(f"{name:22s} OK ({len(g)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
