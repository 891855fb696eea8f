#!/usr/bin/env python3
"""Self-test for check_oracle.py's oracle lints (the round-12 gotchas).

Usage: python3 tools/test_check_oracle.py [oracle_sql.json] [sf_dir]

Seeded BAD oracles must be rejected and their GOOD twins accepted; when
an oracle_sql.json dump and an sf dir are given, every committed oracle
must additionally pass the lint with zero errors (no false positives).
"""
import json, sys
import duckdb
import check_oracle as co

def run():
    intcols = {"l_linenumber", "seq"}
    bad = {
        # the t22 Lehmer-key class: INT32 multiplied in INTEGER wraps
        "seeded_int_mul_left":
            "SELECT sum(l_linenumber * 2654435761) FROM lineitem",
        "seeded_int_mul_right":
            "SELECT sum(2654435761 * l_linenumber) FROM lineitem",
        # HUGEINT sum -> pandas float64 -> driver hash mismatch
        "seeded_uncast_sum":
            "SELECT l_returnflag, sum(l_linenumber) AS s FROM lineitem GROUP BY 1",
    }
    good = {
        "cast_mul":
            "SELECT sum(l_linenumber::BIGINT * 2654435761) FROM lineitem",
        # '::' binds tighter than '*', so a RIGHT-side cast is equally
        # safe and must not false-positive (round-13 review finding)
        "cast_mul_right":
            "SELECT sum(7 * l_linenumber::BIGINT) FROM lineitem",
        "cast_sum_outside":
            "SELECT l_returnflag, sum(l_linenumber)::BIGINT AS s FROM lineitem GROUP BY 1",
        "cast_sum_inside":
            "SELECT l_returnflag, sum(l_linenumber::BIGINT) AS s FROM lineitem GROUP BY 1",
        "bigint_col_untouched":
            "SELECT sum(o_orderkey * 7) FROM orders",  # o_orderkey not in intcols
    }
    fails = 0
    for name, sql in bad.items():
        errs = co.lint_oracle(name, sql, intcols)
        if not errs:
            print(f"SELFTEST FAIL: lint accepted seeded bad oracle {name}")
            fails += 1
        else:
            print(f"SELFTEST OK: {name} rejected ({errs[0][:60]}...)")
    for name, sql in good.items():
        errs = co.lint_oracle(name, sql, intcols)
        if errs:
            print(f"SELFTEST FAIL: lint rejected good oracle {name}: {errs}")
            fails += 1
        else:
            print(f"SELFTEST OK: {name} accepted")
    # the unnest(range)+OR combination warns (prints) but must not error
    errs = co.lint_oracle("warn_only",
        "WITH r AS (SELECT unnest(range(1, 5)) AS i) "
        "SELECT * FROM r WHERE i = 1 OR i = 2", intcols)
    if errs:
        print(f"SELFTEST FAIL: unnest+OR must warn, not reject: {errs}")
        fails += 1
    else:
        print("SELFTEST OK: unnest+OR warns without rejecting")
    # no false positives across every committed oracle
    if len(sys.argv) >= 3:
        with open(sys.argv[1]) as f:
            oracle = json.load(f)
        con = duckdb.connect()
        co.load_views(con, sys.argv[2])
        real_intcols = co.narrow_int_columns(con)
        fps = {q: co.lint_oracle(q, sql, real_intcols)
               for q, sql in oracle.items()}
        fps = {q: e for q, e in fps.items() if e}
        if fps:
            for q, e in fps.items():
                print(f"SELFTEST FAIL: committed oracle {q} tripped the lint: {e[0]}")
            fails += len(fps)
        else:
            print(f"SELFTEST OK: all {len(oracle)} committed oracles pass the lint")
    print("SELFTEST:", "FAIL" if fails else "PASS")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    run()
