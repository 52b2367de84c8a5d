"""Ad-hoc write-path differential fuzz sweep (bigger than the pytest gate).

Usage:
    python scripts/fuzz_dml.py [--n 500] [--start 0]

Every seed is a random DML sequence applied to a LakeTable and a
DuckDB twin with a full-state exact diff after each step
(pg_datalake_spark.fuzz_dml). Mismatching seeds must be pinned in
tests/test_fuzz_dml.py::DML_REGRESSION_SEEDS.
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
from pg_datalake_spark.fuzz_dml import (
    SCHEMA_EVO_BASE,
    run_sequence,
    run_sequence_delta,
)
from pg_datalake_spark.session import build_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--backend", choices=["lake", "delta"], default="lake")
    args = ap.parse_args()

    # the delta runner rejects schema-evolution seeds per-sequence; an
    # incompatible range would otherwise read as n ENGINE ERRORs
    if args.backend == "delta" and args.start + args.n > SCHEMA_EVO_BASE:
        raise SystemExit(
            f"--backend delta only supports seeds < {SCHEMA_EVO_BASE} "
            f"(schema-evolution tier is lake-only); got "
            f"[{args.start}, {args.start + args.n})"
        )

    spark = build_session()
    con = duckdb.connect()
    base = tempfile.mkdtemp(prefix="fuzz_dml_")
    failures: list[str] = []
    agg = {"mor": 0, "cow": 0, "dropped": 0}
    t0 = time.time()
    for seed in range(args.start, args.start + args.n):
        root = os.path.join(base, f"t{seed}")
        try:
            runner = (run_sequence if args.backend == "lake"
                      else run_sequence_delta)
            problems, cov = runner(spark, con, seed, root, compare_exact)
        except Exception as e:  # noqa: BLE001
            empty = ({"mor": 0, "cow": 0, "dropped": 0, "ops": {}}
                     if args.backend == "lake"
                     else {"ops": {}, "modes": []})
            problems, cov = [f"seed {seed}: ENGINE ERROR {e}"], empty
        failures.extend(problems)
        for k in agg:
            agg[k] += cov.get(k, 0)
        shutil.rmtree(root, ignore_errors=True)
        if (seed - args.start + 1) % 25 == 0:
            print(
                f"[{seed - args.start + 1}/{args.n}] "
                f"{time.time() - t0:.0f}s, {len(failures)} failures, "
                f"strategy hits mor={agg['mor']} cow={agg['cow']} "
                f"dropped={agg['dropped']}",
                flush=True,
            )
    shutil.rmtree(base, ignore_errors=True)
    print(f"\n{len(failures)} failures / {args.n} sequences "
          f"({time.time() - t0:.0f}s); mor={agg['mor']} cow={agg['cow']} "
          f"dropped={agg['dropped']}")
    for f in failures[:20]:
        print("  ", f)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
