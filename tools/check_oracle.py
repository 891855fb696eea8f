#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<query> parquet written by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the same sf tables,
and compares: columns sorted by name, rows compared after a stable sort,
numerics cell-wise (exact + 1e-9-tolerance report).

The round-12 oracle gotchas are ENCODED here as automatic checks, so a
query author cannot re-trip them silently:
  * LINT (hard FAIL before execution): an arithmetic product involving a
    bare INT32/INT16/INT8 base-table column — DuckDB multiplies INTEGERs
    in INTEGER and wraps at 2^31 (the t22 Lehmer-key overflow); write
    col::BIGINT * ... instead.
  * LINT (hard FAIL): sum(<bare int column>) — DuckDB returns HUGEINT,
    which lands as float64/object in pandas and hash-mismatches Spark's
    int64; write sum(col)::BIGINT or sum(col::BIGINT).
  * LINT (warning): unnest(range(...)) together with a later OR filter —
    DuckDB cannot bind a correlated unnest alias in a later CTE filter
    with OR (the p7 lesson); join a bounded unnest table instead.
  * WARN (runtime): a float column containing -0.0 on either side — the
    driver's stringified row sort scrambles on the SIGN of a rounded
    zero (the s13 lesson); append + 0.0 AFTER the round on both sides.
  * Poisoned-connection recovery: one INTERNAL error used to fail every
    later query on the shared connection ("closed pending query result"
    cascades); each oracle error now rebuilds the connection and retries
    once, so one bad SQL costs one FAIL, not the rest of the gate.

Self-test: python3 tools/test_check_oracle.py (seeded bad oracles must
be rejected; every committed oracle must pass the lint).
"""
import json, sys, glob, os, re
import duckdb
import pandas as pd
import numpy as np

def load_views(con, sf_dir):
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def narrow_int_columns(con):
    """Base-table columns DuckDB types narrower than BIGINT — the operand
    set the overflow lint guards."""
    rows = con.execute(
        "SELECT column_name, data_type FROM information_schema.columns").fetchall()
    return {c for c, dt in rows if dt in ("INTEGER", "SMALLINT", "TINYINT")}

def lint_oracle(name, sql, intcols):
    """Static pre-checks over the oracle SQL text. Returns a list of hard
    errors (reject before execution) and prints warnings directly."""
    errors = []
    # A bare narrow-int column adjacent to '*' multiplies in INTEGER and
    # silently wraps at 2^31. A cast column reads 'col::BIGINT' so the
    # token captured next to '*' would be BIGINT, not the column name —
    # capturing the bare name IS the evidence it was uncast.
    for m in re.finditer(r"\b(\w+)\s*\*", sql):
        if m.group(1) in intcols:
            errors.append(
                f"uncast INT32 column '{m.group(1)}' on the left of '*' — "
                "DuckDB multiplies INTEGERs in INTEGER (wraps at 2^31); "
                f"write {m.group(1)}::BIGINT * ...")
    # negative lookahead for '::': `7 * col::BIGINT` is safe ('::' binds
    # tighter than '*', so the multiply runs in BIGINT) and must not FAIL
    for m in re.finditer(r"\*\s*(\w+)\b(?!\s*::)", sql):
        if m.group(1) in intcols:
            errors.append(
                f"uncast INT32 column '{m.group(1)}' on the right of '*' — "
                f"write ... * {m.group(1)}::BIGINT")
    # sum(bare int col): HUGEINT result -> pandas float64/object -> the
    # driver's typed hash mismatches Spark's int64 even on equal values.
    for m in re.finditer(r"\bsum\s*\(\s*(\w+)\s*\)(?!\s*::)", sql, re.IGNORECASE):
        if m.group(1) in intcols:
            errors.append(
                f"sum({m.group(1)}) over an INT32 column without a cast — "
                "DuckDB returns HUGEINT (float64 in pandas); write "
                f"sum({m.group(1)})::BIGINT or sum({m.group(1)}::BIGINT)")
    if re.search(r"unnest\s*\(\s*range\s*\(", sql, re.IGNORECASE) and \
            re.search(r"\bOR\b", sql):
        print(f"LINT-WARN {name}: unnest(range(...)) plus an OR filter — "
              "DuckDB cannot bind a correlated unnest alias in a later CTE "
              "filter with OR (p7 lesson); join a bounded unnest table instead")
    return errors

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # stable sort over stringified rows for order-insensitive compare
    key = df.astype(str).agg("|".join, axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)

def negzero_warning(name, a, b):
    """The driver sorts STRINGIFIED rows, and Spark/DuckDB disagree on a
    rounded zero's sign — any -0.0 on either side is a latent scramble."""
    for side, df in (("spark", a), ("duck", b)):
        for c in df.columns:
            if pd.api.types.is_float_dtype(df[c].dtype):
                v = df[c].to_numpy()
                if np.any((v == 0.0) & np.signbit(v)):
                    print(f"WARN {name}: {side} column '{c}' contains -0.0 — "
                          "append + 0.0 after the round on BOTH sides "
                          "(s13 lesson) or the stringified row sort can scramble")
                    return

def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"FAIL {name}: columns differ\n  spark={list(a.columns)}\n  duck ={list(b.columns)}"
    if len(a) != len(b):
        return f"FAIL {name}: row counts differ spark={len(a)} duck={len(b)}"
    negzero_warning(name, a, b)
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
    intcols = narrow_int_columns(con)
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
        lint = lint_oracle(q, oracle[q], intcols)
        if lint:
            print(f"FAIL {q}: oracle SQL rejected by lint\n  " + "\n  ".join(lint))
            failures += 1
            continue
        try:
            duck_df = con.execute(oracle[q]).fetchdf()
        except Exception as e:
            # One INTERNAL error poisons the shared connection for every
            # later query — rebuild and retry once so one bad SQL costs
            # exactly one FAIL.
            try:
                con.close()
            except Exception:
                pass
            con = duckdb.connect()
            load_views(con, sf_dir)
            try:
                duck_df = con.execute(oracle[q]).fetchdf()
            except Exception as e2:
                # the RETRY's error is the real diagnosis; the first
                # exception may be a stale poisoned-connection cascade
                print(f"FAIL {q}: oracle SQL error: {e2}")
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
