"""Ad-hoc streaming restart/replay fuzz sweep (bigger than the gate).

Usage:
    python scripts/fuzz_streaming.py [--n 50] [--start 0]
        [--pipeline ingest|rollup|dedup|all]

Every seed is a randomized drain schedule (micro-batch boundaries +
injected kill/restart points) for one streaming pipeline, asserted
against a one-shot batch oracle (pg_datalake_spark.fuzz_streaming).
Finds get pinned in tests/test_fuzz_streaming.py.
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
from pg_datalake_spark.fuzz_streaming import STREAM_RUNNERS
from pg_datalake_spark.session import build_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--pipeline", default="all",
                    choices=["ingest", "rollup", "dedup", "all"])
    args = ap.parse_args()

    pipelines = (
        list(STREAM_RUNNERS) if args.pipeline == "all"
        else [args.pipeline]
    )
    spark = build_session()
    con = duckdb.connect()
    base = tempfile.mkdtemp(prefix="fuzz_stream_")
    failures: list[str] = []
    t0 = time.time()
    for pipeline in pipelines:
        crashes = restarts = 0
        bt = time.time()
        for seed in range(args.start, args.start + args.n):
            root = os.path.join(base, f"{pipeline}{seed}")
            try:
                problems, cov = STREAM_RUNNERS[pipeline](
                    spark, con, seed, root, compare_exact
                )
            except Exception as e:  # noqa: BLE001
                problems, cov = (
                    [f"{pipeline} seed {seed}: HARNESS ERROR {e}"], {}
                )
            failures.extend(problems)
            crashes += cov.get("crashes", 0)
            restarts += cov.get("restarts", 0)
            shutil.rmtree(root, ignore_errors=True)
            if (seed - args.start + 1) % 10 == 0:
                print(
                    f"[{pipeline} {seed - args.start + 1}/{args.n}] "
                    f"{time.time() - bt:.0f}s, {len(failures)} failures, "
                    f"crashes={crashes} restarts={restarts}",
                    flush=True,
                )
        print(
            f"== {pipeline}: {len(failures)} cumulative failures, "
            f"{time.time() - bt:.0f}s; crashes={crashes} "
            f"restarts={restarts}",
            flush=True,
        )
    shutil.rmtree(base, ignore_errors=True)
    print(f"\n{len(failures)} failures total ({time.time() - t0:.0f}s)")
    for f in failures[:20]:
        print("  ", f)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
