"""Per-key micro-profiler for the bench headline set (guide §1).

For each headline key, splits wall time into:
  - build: load_tables + DataFrame construction (driver/Python/analysis)
  - exec:  the bench sink aggregate (count + xxhash64 checksum)
and optionally dumps .explain('formatted') to plans/<tag>/<key>_<tag>.txt.

Usage: python scripts/profile_keys.py [--reps 5] [--plans plans/r15 --tag before]
       [--keys q01_pricing_summary,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pg_datalake_spark import plans  # noqa: E402
from pg_datalake_spark.catalog import load_tables  # noqa: E402
from pg_datalake_spark.plans.registry import QUERIES  # noqa: E402
from pg_datalake_spark.session import (  # noqa: E402
    DEFAULT_SF_DIR as SF_DIR,
    build_session,
    cpu_count,
    shuffle_partitions_for,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--keys", default=None)
    args = ap.parse_args()

    plans.load_all()
    import bench

    keys = args.keys.split(",") if args.keys else [k for k in bench.HEADLINE if k in QUERIES]

    data_bytes = sum(
        os.path.getsize(os.path.join(SF_DIR, f))
        for f in os.listdir(SF_DIR)
        if f.endswith(".parquet")
    )
    spark = build_session(
        "pg_datalake_spark-profile",
        shuffle_partitions=shuffle_partitions_for(data_bytes, cpu_count()),
    )
    tabs = load_tables(spark, SF_DIR)
    for name in tabs:
        tabs[name].cache().count()

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _hashable(dt) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    if args.plans:
        os.makedirs(os.path.join(REPO, args.plans), exist_ok=True)

    out = {}
    for name in keys:
        fn = QUERIES[name]
        best_build = best_exec = best_total = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            cols = [f.name for f in df.schema.fields if _hashable(f.dataType)]
            sink = F.bit_xor(F.xxhash64(F.struct(*cols))) if cols else F.count(F.lit(1))
            agg = df.agg(F.count(F.lit(1)), sink)
            t1 = time.perf_counter()
            agg.first()
            t2 = time.perf_counter()
            best_build = min(best_build, t1 - t0)
            best_exec = min(best_exec, t2 - t1)
            best_total = min(best_total, t2 - t0)
        out[name] = {
            "build": round(best_build, 4),
            "exec": round(best_exec, 4),
            "total": round(best_total, 4),
        }
        print(
            f"# {name}: build={best_build:.3f}s exec={best_exec:.3f}s total={best_total:.3f}s",
            file=sys.stderr,
        )
        if args.plans:
            df = fn(spark, SF_DIR)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = os.path.join(REPO, args.plans, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(p)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
