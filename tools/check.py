#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify
output against the DuckDB oracle on the same tables.

Usage: python3 tools/check.py [sf_dir] [verify_out]
(Run `sbt "runMain graft.Verify <sf_dir> <out>"` first.)
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Rows-only queries have no oracle for the compare loop to trip
    # over; Verify records every crash here so none can hide.
    try:
        crashed = json.load(open(f"{out}/failures.json"))
    except FileNotFoundError:
        crashed = {}
    for name, err in sorted(crashed.items()):
        print(f"FAIL {name}: crashed in Verify: {err}")
        n_fail += 1
    for name, sql in sorted(oracles.items()):
        if name in crashed:
            continue  # already counted above
        try:
            spark_df = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
            oracle_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        s_cols = sorted(spark_df.columns)
        o_cols = sorted(oracle_df.columns)
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        sd = spark_df[s_cols]
        od = oracle_df[o_cols]
        # Driver parity: the real gate sorts rows with pandas
        # sort_values over every column, which CRASHES on list/ndarray
        # cells (unhashable in lexsort's Categorical). Round 7 shipped
        # an array<string> column that passed this replica's
        # stringify-sort but red-flagged at the driver — replicate the
        # driver's sort so non-scalar outputs fail HERE.
        try:
            sd.sort_values(by=s_cols)
            od.sort_values(by=o_cols)
        except Exception as e:
            print(f"FAIL {name}: driver-style sort_values crashed "
                  f"(non-scalar column?): {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if len(sd) != len(od):
            print(f"FAIL {name}: rows spark={len(sd)} oracle={len(od)}")
            n_fail += 1
            continue
        s_rows = sorted(tuple(canon(v) for v in r) for r in sd.itertuples(index=False))
        o_rows = sorted(tuple(canon(v) for v in r) for r in od.itertuples(index=False))
        if s_rows != o_rows:
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs:")
            for a, b in diffs:
                print(f"   spark : {a}\n   oracle: {b}")
            n_fail += 1
            continue
        # dtype mismatch IS a failure: the driver hashes typed values, so
        # e.g. DuckDB HUGEINT (object/float64) vs Spark int64 hash-differs
        # even when the values print the same.
        s_dt = [str(d) for d in sd.dtypes]
        o_dt = [str(d) for d in od.dtypes]
        if s_dt != o_dt:
            print(f"FAIL {name}: dtype mismatch spark={s_dt} oracle={o_dt}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sd)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
