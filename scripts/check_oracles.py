#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:]) or None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if v is None:
        return None
    return v


def rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort key tolerates NULLs and mixed types (None is unorderable as a
    # plain tuple element: a NULL aggregate would crash the gate mid-run
    # instead of reporting MISMATCH)
    vals = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(
        vals, key=lambda t: tuple((v is None, str(type(v)), str(v))
                                  for v in t)
    ), [cols[i] for i in order]


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from parquet_playground_rs_spark.session import get_spark

    spark = get_spark(app="check_oracles", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if ONLY:
        unknown = ONLY - set(qs)
        if unknown:  # a typo'd name must not produce a false-green gate
            sys.exit(f"unknown query name(s): {sorted(unknown)}; "
                     f"valid: {sorted(qs)}")
    failed = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        df = fn(spark, SF_DIR)
        spark_rows = df.collect()
        spark_cols = df.columns
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(spark_rows)} rows "
                  f"{[tuple(r) for r in spark_rows[:3]]}")
            continue
        duck = con.sql(oracles[name])
        duck_rows = duck.fetchall()
        duck_cols = [d[0] for d in duck.description]
        sv, sc = rows_to_set(spark_cols, [tuple(r) for r in spark_rows])
        dv, dc = rows_to_set(duck_cols, duck_rows)
        ok_cols = sc == dc
        ok_count = len(sv) == len(dv)
        ok_vals = sv == dv
        status = "OK" if (ok_cols and ok_count and ok_vals) else "MISMATCH"
        print(f"{name:28s} {status}  rows={len(sv)}/{len(dv)} cols_match={ok_cols}")
        if status != "OK":
            failed.append(name)
            if not ok_cols:
                print(f"   spark cols: {sc}\n   duck  cols: {dc}")
            for a, b in zip(sv[:5], dv[:5]):
                if a != b:
                    print(f"   spark: {a}\n   duck : {b}")
    spark.stop()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all oracle-checked queries match")


if __name__ == "__main__":
    main()
