"""Ad-hoc write-path differential fuzz sweep (bigger than the pytest gate).

Usage:
    python scripts/fuzz_dml.py [--n 500] [--start 0] [--threads 4]

Every seed is a random DML sequence applied to a LakeTable and a
DuckDB twin with a full-state exact diff after each step
(pg_datalake_spark.fuzz_dml). Mismatching seeds must be pinned in
tests/test_fuzz_dml.py::DML_REGRESSION_SEEDS.

Sequences run on a thread pool (r15: the per-sequence cost is the
engine ops' Spark job launches, not the comparator — parallel
sequences overlap the py4j round-trips and the sweep finishes ~Tx
faster). Each worker owns its DuckDB connection (temp twin tables are
per-connection) and its own table roots; the session-level shuffle /
AQE confs are pinned ONCE up front so run_sequence's save/restore is
a fixed point and thread-safe.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import threading
import time
from concurrent.futures import ThreadPoolExecutor

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
    ap.add_argument("--threads", type=int, default=4)
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
    # pin the per-sequence confs once: run_sequence saves/restores the
    # SAME values, so concurrent sequences cannot flip them mid-run
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    base = tempfile.mkdtemp(prefix="fuzz_dml_")
    runner = run_sequence if args.backend == "lake" else run_sequence_delta
    empty_cov = ({"mor": 0, "cow": 0, "dropped": 0, "ops": {}}
                 if args.backend == "lake" else {"ops": {}, "modes": []})
    agg = {"mor": 0, "cow": 0, "dropped": 0}
    failures: list[str] = []
    done = [0]
    lock = threading.Lock()
    tls = threading.local()
    t0 = time.time()

    def one(seed: int) -> None:
        con = getattr(tls, "con", None)
        if con is None:
            con = tls.con = duckdb.connect()
        root = os.path.join(base, f"t{seed}")
        try:
            problems, cov = runner(spark, con, seed, root, compare_exact)
        except Exception as e:  # noqa: BLE001
            problems, cov = [f"seed {seed}: ENGINE ERROR {e}"], empty_cov
        shutil.rmtree(root, ignore_errors=True)
        with lock:
            failures.extend(problems)
            for k in agg:
                agg[k] += cov.get(k, 0)
            done[0] += 1
            if done[0] % 25 == 0:
                print(
                    f"[{done[0]}/{args.n}] {time.time() - t0:.0f}s, "
                    f"{len(failures)} failures, strategy hits "
                    f"mor={agg['mor']} cow={agg['cow']} "
                    f"dropped={agg['dropped']}",
                    flush=True,
                )

    with ThreadPoolExecutor(max_workers=args.threads) as pool:
        list(pool.map(one, range(args.start, args.start + args.n)))

    shutil.rmtree(base, ignore_errors=True)
    print(f"\n{len(failures)} failures / {args.n} sequences "
          f"({time.time() - t0:.0f}s); mor={agg['mor']} cow={agg['cow']} "
          f"dropped={agg['dropped']}")
    for f in failures[:20]:
        print("  ", f)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
