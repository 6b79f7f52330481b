#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares each
<outDir>/<name> parquet against the DuckDB oracle in oracle_sql.json.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = pq.read_table(files).to_pandas() if files else pd.DataFrame()
    if name not in oracle:
        print(f"{name}: rows-only check — {len(got)} rows")
        continue
    exp = con.sql(oracle[name]).df()
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    status = []
    if list(got.columns) != list(exp.columns):
        status.append(f"SCHEMA cols {list(got.columns)} vs {list(exp.columns)}")
    elif [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
        status.append(f"DTYPES {list(got.dtypes)} vs {list(exp.dtypes)}")
    if len(got) != len(exp):
        status.append(f"ROWS {len(got)} vs {len(exp)}")
    if not status:
        g = got.sort_values(by=list(got.columns), ignore_index=True)
        e = exp.sort_values(by=list(exp.columns), ignore_index=True)
        if not g.equals(e):
            neq = (g != e) & ~(g.isna() & e.isna())
            bad_cols = [c for c in g.columns if neq[c].any()]
            status.append(f"VALUES differ in {bad_cols}")
            for c in bad_cols[:2]:
                i = neq[c].idxmax()
                status.append(f"  {c}[{i}]: got={g[c][i]!r} exp={e[c][i]!r}")
    if status:
        fail += 1
        print(f"{name}: FAIL — " + "; ".join(status))
    else:
        print(f"{name}: OK ({len(got)} rows)")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
