#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<query> parquet written by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the same sf tables,
and compares: columns sorted by name, rows compared after a stable sort,
numerics cell-wise (exact + 1e-9-tolerance report).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_views(con, sf_dir):
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # stable sort over stringified rows for order-insensitive compare
    key = df.astype(str).agg("|".join, axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)

def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"FAIL {name}: columns differ\n  spark={list(a.columns)}\n  duck ={list(b.columns)}"
    if len(a) != len(b):
        return f"FAIL {name}: row counts differ spark={len(a)} duck={len(b)}"
    # The driver's hash gate stringifies typed cells, so an int64 column on
    # one side vs float64 on the other (DuckDB HUGEINT sums land as float64)
    # hash-mismatches even when values agree — flag dtype family drift.
    def fam(dt):
        if pd.api.types.is_integer_dtype(dt): return "int"
        if pd.api.types.is_float_dtype(dt): return "float"
        if pd.api.types.is_bool_dtype(dt): return "bool"
        return "other"
    dtbad = [f"  {c}: spark={a[c].dtype} duck={b[c].dtype}"
             for c in a.columns if fam(a[c].dtype) != fam(b[c].dtype)]
    if dtbad:
        return f"FAIL {name}: dtype family mismatch (driver hash would differ)\n" + "\n".join(dtbad)
    exact = 0; close = 0; bad = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_numeric_dtype(av) and pd.api.types.is_numeric_dtype(bv):
            an, bn = av.astype(float).to_numpy(), bv.astype(float).to_numpy()
            eq = (an == bn) | (np.isnan(an) & np.isnan(bn))
            cl = eq | np.isclose(an, bn, rtol=1e-9, atol=1e-9, equal_nan=True)
            exact += int(eq.sum()); close += int(cl.sum())
            for i in np.where(~cl)[0][:3]:
                bad.append(f"  {c}[{i}]: spark={an[i]!r} duck={bn[i]!r}")
        else:
            eq = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
            exact += int(eq.sum()); close += int(eq.sum())
            for i in np.where(~eq.to_numpy())[0][:3]:
                bad.append(f"  {c}[{i}]: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    total = len(a) * len(a.columns)
    if bad:
        return f"FAIL {name}: {total-close}/{total} cells differ beyond 1e-9\n" + "\n".join(bad[:10])
    note = "" if exact == total else f"  (exact {exact}/{total}, all within 1e-9)"
    return f"PASS {name}: {len(a)} rows x {len(a.columns)} cols{note}"

def main(out_dir, sf_dir):
    con = duckdb.connect()
    load_views(con, sf_dir)
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    failures = 0
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for q in qdirs:
        files = glob.glob(os.path.join(out_dir, q, "*.parquet"))
        spark_df = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        if q not in oracle:
            print(f"SKIP {q}: rows-only ({len(spark_df)} rows)")
            if len(spark_df) == 0:
                failures += 1
                print(f"FAIL {q}: zero rows")
            continue
        try:
            duck_df = con.execute(oracle[q]).fetchdf()
        except Exception as e:
            print(f"FAIL {q}: oracle SQL error: {e}")
            failures += 1
            continue
        msg = compare(q, spark_df, duck_df)
        print(msg)
        if msg.startswith("FAIL"):
            failures += 1
    for q in oracle:
        if q not in qdirs:
            print(f"FAIL {q}: oracle declared but no spark output")
            failures += 1
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
