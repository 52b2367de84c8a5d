"""Ad-hoc scaling probe: time a set of registered queries at two SF
dirs (default sf0.1 vs the make_sf1.py output) and print a ratio
table — the per-family evidence behind COVERAGE.md's SCALING section.

Usage:
    python scripts/make_sf1.py /tmp/sf1          # once
    python scripts/scale_probe.py cb11_regex_extract_bands cb14_top_words ...
    python scripts/scale_probe.py --small /root/testdata/sf0.1 --big /tmp/sf1 names...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_datalake_spark import plans
from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.plans.registry import QUERIES
from pg_datalake_spark.session import (
    build_session,
    cpu_count,
    shuffle_partitions_for,
)


def _time(spark, name: str, sf_dir: str, runs: int = 2) -> float:
    fn = QUERIES[name]
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sf1")
    args = ap.parse_args()

    plans.load_all()
    data_bytes = sum(
        os.path.getsize(os.path.join(args.big, f))
        for f in os.listdir(args.big)
        if f.endswith(".parquet")
    )
    spark = build_session(
        "scale-probe",
        shuffle_partitions=shuffle_partitions_for(data_bytes, cpu_count()),
    )
    for sf in (args.small, args.big):
        for df in load_tables(spark, sf).values():
            df.cache().count()

    print(f"| key | {args.small} s | {args.big} s | ratio |")
    print("|---|---|---|---|")
    total_s = total_b = 0.0
    for name in args.names:
        s = _time(spark, name, args.small)
        b = _time(spark, name, args.big)
        total_s += s
        total_b += b
        print(f"| {name} | {s:.2f} | {b:.2f} | {b / s:.1f}× |")
    print(f"| **total** | **{total_s:.2f}** | **{total_b:.2f}** | "
          f"**{total_b / total_s:.1f}×** |")
    spark.stop()


if __name__ == "__main__":
    main()
