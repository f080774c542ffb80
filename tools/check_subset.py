#!/usr/bin/env python3
"""check.py variant for iteration: compares only queries whose spark
output dir exists (Verify run with SPARK_GRAFT_ONLY)."""
import sys, json, glob, os, re
import duckdb
import pandas as pd
sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
pat = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1).astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)
n_ok = n_bad = 0
for name in sorted(oracle):
    path = f"{outdir}/{name}"
    if not os.path.isdir(path): continue
    if pat and not pat.search(name): continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{path}/*.parquet"))])
        duck_df = con.execute(oracle[name]).fetchdf()
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_bad += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_bad += 1
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(a)} rows differ; first:")
            idx = neq.idxmax()
            print("  spark:", a.loc[idx].to_dict())
            print("  duck :", b.loc[idx].to_dict()); n_bad += 1
        else:
            print(f"ok   {name} ({len(a)} rows)"); n_ok += 1
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); n_bad += 1
print(f"{n_ok} ok, {n_bad} bad")
sys.exit(1 if n_bad else 0)
