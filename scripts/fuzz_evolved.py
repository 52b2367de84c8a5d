"""Ad-hoc evolved-table read fuzz sweep (bigger than the gate).

Usage:
    python scripts/fuzz_evolved.py [--tables 20] [--queries 25]
        [--tstart SCHEMA_EVO_BASE offset 0] [--qstart 0]

Builds evolved LakeTables by replaying evolution-tier DML sequences
(with DuckDB twins kept) and sweeps seeded query shapes over them,
including the scan(filters=...) pruning path
(pg_datalake_spark.fuzz_evolved). Finds get pinned in
tests/test_fuzz_evolved.py::EVOLVED_READ_REGRESSION_PAIRS.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from check_exact import compare_exact
from pg_datalake_spark.fuzz_dml import SCHEMA_EVO_BASE
from pg_datalake_spark.fuzz_evolved import (
    build_evolved_table,
    run_evolved_read_seed,
)
from pg_datalake_spark.session import build_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", type=int, default=20)
    ap.add_argument("--queries", type=int, default=25)
    ap.add_argument("--tstart", type=int, default=0,
                    help="table-seed offset above SCHEMA_EVO_BASE")
    ap.add_argument("--qstart", type=int, default=0)
    args = ap.parse_args()

    spark = build_session()
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    con = duckdb.connect()
    base = tempfile.mkdtemp(prefix="fuzz_evread_")
    failures: list[str] = []
    shapes: dict[str, int] = {}
    t0 = time.time()
    for ti in range(args.tables):
        tseed = SCHEMA_EVO_BASE + args.tstart + ti
        root = os.path.join(base, f"t{tseed}")
        try:
            built = build_evolved_table(
                spark, con, tseed, root, compare_exact
            )
        except Exception as e:  # noqa: BLE001
            failures.append(f"table {tseed}: BUILD ERROR {e}")
            continue
        for j in range(args.queries):
            qseed = args.qstart + ti * args.queries + j
            problems, shape = run_evolved_read_seed(
                spark, con, built, qseed, compare_exact
            )
            shapes[shape] = shapes.get(shape, 0) + 1
            failures.extend(f"table {tseed}: {p}" for p in problems)
        con.execute(f"DROP TABLE IF EXISTS {built['twin']}")
        shutil.rmtree(root, ignore_errors=True)
        print(
            f"[{ti + 1}/{args.tables}] {time.time() - t0:.0f}s, "
            f"{len(failures)} failures",
            flush=True,
        )
    shutil.rmtree(base, ignore_errors=True)
    print(f"\n{len(failures)} failures / "
          f"{args.tables * args.queries} queries over {args.tables} "
          f"tables ({time.time() - t0:.0f}s); shapes={shapes}")
    for f in failures[:20]:
        print("  ", f)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
