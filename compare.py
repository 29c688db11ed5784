#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, load the Spark parquet dump, sort columns
by name + rows by all columns, and compare values exactly.

Round 12: (a) queries fan out over a process pool (the 144-query compare
was ~26 min serial — the pipe2/3/4/5 recursive CTE chains dominate; the
pool cuts wall time to roughly the slowest chain), and (b) the per-query
results are written to <verifyOutDir>/correctness_self.json in the
driver's CORRECTNESS_rN schema ({rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}) so a committed in-tree attestation exists
even when the driver-side channel is dark.

Usage: python3 compare.py <sfDir> <verifyOutDir> [nproc]
"""
import sys, json, glob, os
from concurrent.futures import ProcessPoolExecutor

sfdir, outdir = sys.argv[1], sys.argv[2]
nproc = int(sys.argv[3]) if len(sys.argv) > 3 else min(8, os.cpu_count() or 4)

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]


def canon(df):
    import pandas as pd
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


def check(args):
    """Run one query's oracle + compare; returns (name, driver-schema dict,
    human message or None). Each worker process opens its own DuckDB
    connection (connections don't fork-share)."""
    name, sql = args
    import duckdb, pandas as pd, numpy as np
    res = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        res["err"] = "no spark output"
        return name, res, "no spark output"
    try:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        exp = canon(con.execute(sql).df())
    except Exception as e:
        res["err"] = f"load/sql error: {e}"
        return name, res, res["err"]
    res["spark_rows"], res["oracle_rows"] = len(got), len(exp)
    res["rows_match"] = len(got) == len(exp)
    res["schema_match"] = list(got.columns) == list(exp.columns)
    if not res["schema_match"]:
        msg = f"schema: spark={list(got.columns)} duck={list(exp.columns)}"
        res["err"] = msg
        return name, res, msg
    if not res["rows_match"]:
        msg = f"rows: spark={len(got)} duck={len(exp)}"
        res["err"] = msg
        return name, res, msg
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
        msg = f"values differ in {diff_cols}; " + " | ".join(msg)
        res["err"] = msg
        return name, res, msg
    res["hash_match"] = True
    return name, res, None


if __name__ == "__main__":
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # schedule longest-first so the pool's tail isn't one giant pipe chain
    # starting last; the pipe/dd/sim chains are the known heavy hitters
    heavy = ("pipe", "dd", "sim", "t1", "gr")
    ordered = sorted(oracle.items(),
                     key=lambda kv: (not kv[0].startswith(heavy), kv[0]))
    fails, passes, attest = [], [], {}
    with ProcessPoolExecutor(max_workers=nproc) as ex:
        for name, res, msg in ex.map(check, ordered):
            attest[name] = res
            if msg is None:
                passes.append((name, res["spark_rows"]))
            else:
                fails.append((name, msg))
    with open(f"{outdir}/correctness_self.json", "w") as f:
        json.dump({k: attest[k] for k in sorted(attest)}, f, indent=1)
    for n, r in sorted(passes): print(f"PASS {n} ({r} rows)")
    for n, m in sorted(fails): print(f"FAIL {n}: {m}")
    print(f"\n{len(passes)} pass / {len(fails)} fail")
    sys.exit(1 if fails else 0)
