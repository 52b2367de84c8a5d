"""Ad-hoc concurrent-writer interleaving sweep (bigger than the gate).

Usage:
    python scripts/fuzz_concurrent.py [--n 100] [--start 0]
        [--backend lake|delta|iceberg|all]

Every seed is a 2-3-writer race against one table; the committed
history is recorded at the commit primitive and the state at every
committed version is diffed against a DuckDB twin replaying the ops
in commit order (pg_datalake_spark.fuzz_concurrent). Any find is
pinned in tests/test_fuzz_concurrent.py::CONC_REGRESSION_SEEDS plus a
deterministic repro in the backend's test file.
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
from pg_datalake_spark.fuzz_concurrent import RUNNERS
from pg_datalake_spark.session import build_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--backend", default="all",
                    choices=["lake", "delta", "iceberg", "all"])
    args = ap.parse_args()

    backends = (
        list(RUNNERS) if args.backend == "all" else [args.backend]
    )
    spark = build_session()
    con = duckdb.connect()
    base = tempfile.mkdtemp(prefix="fuzz_conc_")
    failures: list[str] = []
    t0 = time.time()
    for backend in backends:
        agg = {"conflicts": 0, "commits": 0, "noop_ops": 0}
        ops: dict[str, int] = {}
        bt = time.time()
        for seed in range(args.start, args.start + args.n):
            root = os.path.join(base, f"{backend}{seed}")
            try:
                problems, cov = RUNNERS[backend](
                    spark, con, seed, root, compare_exact
                )
            except Exception as e:  # noqa: BLE001
                problems, cov = (
                    [f"{backend} seed {seed}: HARNESS ERROR {e}"], {}
                )
            failures.extend(problems)
            for k in agg:
                agg[k] += cov.get(k, 0)
            for op, c in cov.get("ops", {}).items():
                ops[op] = ops.get(op, 0) + c
            shutil.rmtree(root, ignore_errors=True)
            if (seed - args.start + 1) % 20 == 0:
                print(
                    f"[{backend} {seed - args.start + 1}/{args.n}] "
                    f"{time.time() - bt:.0f}s, {len(failures)} failures, "
                    f"conflicts={agg['conflicts']} commits={agg['commits']}",
                    flush=True,
                )
        print(
            f"== {backend}: {len(failures)} cumulative failures, "
            f"{time.time() - bt:.0f}s; conflicts={agg['conflicts']} "
            f"commits={agg['commits']} noop={agg['noop_ops']} ops={ops}",
            flush=True,
        )
    shutil.rmtree(base, ignore_errors=True)
    print(f"\n{len(failures)} failures total ({time.time() - t0:.0f}s)")
    for f in failures[:20]:
        print("  ", f)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
