"""Randomized differential fuzzing: Spark SQL vs DuckDB on the same
generated query (pg_datalake_spark.fuzz grammar), compared with the
driver-fidelity exact comparator (scripts/check_exact.compare_exact).

The reference runs its regress-derived SQL corpora through a
differential oracle (assert_query_results_on_tables); this is the
generator-driven analog over the implemented relational surface:
filters x joins x aggs x windows x set-ops x subqueries x grouping
sets x scalars.

Usage:
    python scripts/fuzz_differential.py --n 500 [--base 0] [--sf DIR]

Exit 0 iff every seed matches. Prints one line per failure with the
seed + SQL so it can be pinned as a regression in
tests/test_fuzz_differential.py::REGRESSION_SEEDS.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from check_exact import compare_exact  # noqa: E402 (sibling module)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--base", type=int, default=0, help="first seed")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--stop-on-fail", action="store_true")
    args = ap.parse_args()

    from pg_datalake_spark.catalog import TABLE_NAMES, load_tables, table_path
    from pg_datalake_spark.fuzz import gen_query
    from pg_datalake_spark.session import build_session

    spark = build_session("fuzz-differential", cpus=16)
    for name, df in load_tables(spark, args.sf).items():
        df.createOrReplaceTempView(name)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(args.sf, t)}')"
        )

    n_fail = n_empty = 0
    t0 = time.time()
    for seed in range(args.base, args.base + args.n):
        shape, spark_sql, duck_sql = gen_query(seed)
        try:
            spark_pdf = spark.sql(spark_sql).toPandas()
            oracle_pdf = con.execute(duck_sql).df()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"seed {seed} [{shape}]: ENGINE ERROR "
                  f"{type(e).__name__}: {str(e)[:300]}\n  SQL: {spark_sql}")
            if args.stop_on_fail:
                return 1
            continue
        problems = compare_exact(spark_pdf, oracle_pdf)
        if problems:
            n_fail += 1
            print(f"seed {seed} [{shape}]: MISMATCH ({len(spark_pdf)} rows)")
            for p in problems[:4]:
                print(f"    {p}")
            print(f"  SQL: {spark_sql}")
            if args.stop_on_fail:
                return 1
        elif len(spark_pdf) == 0:
            n_empty += 1
    dt = time.time() - t0
    print(f"\n{n_fail} failures / {args.n} seeds "
          f"({n_empty} empty results, {dt:.0f}s)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
