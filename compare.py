#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, load the Spark parquet dump, sort columns
by name + rows by all columns, and compare values exactly.

Usage: python3 compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

fails, passes = [], []
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    try:
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        exp = canon(con.execute(oracle[name]).df())
    except Exception as e:
        fails.append((name, f"load/sql error: {e}")); continue
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"schema: spark={list(got.columns)} duck={list(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rows: spark={len(got)} duck={len(exp)}")); continue
    diff_cols = []
    for c in got.columns:
        a, b = got[c].values, exp[c].values
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            eq = np.array_equal(a, b, equal_nan=True)
        else:
            eq = (pd.Series(a).fillna("\0N") == pd.Series(b).fillna("\0N")).all()
        if not eq:
            diff_cols.append(c)
    if diff_cols:
        msg = []
        for c in diff_cols[:3]:
            m = got[c].values != exp[c].values
            i = int(np.argmax(m))
            msg.append(f"{c}[row{i}]: spark={got[c].values[i]!r} duck={exp[c].values[i]!r}")
        fails.append((name, f"values differ in {diff_cols}; " + " | ".join(msg)))
    else:
        passes.append((name, len(got)))

for n, r in passes: print(f"PASS {n} ({r} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
