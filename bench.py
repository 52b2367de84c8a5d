"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}

Mirrors the reference's pg_lake_benchmark methodology (run query,
discard result, wall-clock per query — reference:
pg_lake_benchmark/README.md:13-14). Each query is timed as a full
execution (plan + execute + fetch counts), min of three runs to smooth
JIT/codegen warmup, on a warm session with tables pre-registered.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pg_datalake_spark import plans
from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.plans.registry import QUERIES
from pg_datalake_spark.session import build_session

from pg_datalake_spark.session import DEFAULT_SF_DIR as SF_DIR  # noqa: E402

# Headline set: the join/agg-heavy TPC-H shapes plus one of each
# operator family that exists by the time bench runs.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q09_product_type_profit",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "q21_waiting_orders",
    "w01_window_suite",
    "g01_grouping_sets",
    "d01_exact_dedup",
    "d02_minhash_lsh_neardup",
    "d03_simhash",
    "v01_cosine_topk",
    "t01_text_quality",
    # r6: TPC-DS shapes (appended — the 15 keys above keep their history)
    "ds36_margin_rollup_rank",
    "ds51_cumulative_channels",
    "ds67_rollup_rank_topk",
    # r7: appended (the 18 keys above keep their history)
    "ds78_channel_qty_ratio",
    # r7 batch 2: appended (the 19 keys above keep their history)
    "d09_exact_substring_spans",
]


def main() -> None:
    plans.load_all()
    from pg_datalake_spark.session import cpu_count, shuffle_partitions_for

    data_bytes = sum(
        os.path.getsize(os.path.join(SF_DIR, f))
        for f in os.listdir(SF_DIR)
        if f.endswith(".parquet")
    )
    # r16: the derived AQE advisory partition size moved INTO the engine
    # (catalog.load_tables sets it from the scanned bytes — VERDICT r15
    # item 2); the bench no longer passes session-level special config.
    spark = build_session(
        "pg_datalake_spark-bench",
        shuffle_partitions=shuffle_partitions_for(data_bytes, cpu_count()),
    )
    tabs = load_tables(spark, SF_DIR)
    # steady-state engine: materialize the columnar cache once before
    # timing (the reference engine benches against a warm NVMe file
    # cache + OS buffer cache the same way — BASELINE.md engine defaults,
    # methodology pinned in BASELINE.md "Warm-cache methodology decision").
    # Warmup jobs are independent — overlap them from a small thread
    # pool so one table's straggler tasks back-fill with the next
    # table's (optimization guide §2.6); untimed either way.
    # SPARK_GRAFT_BENCH_COLD=1 skips the warmup — the uncached leg
    # recorded per optimization round (BENCH_COLD_r{N}.json); the
    # driver's own invocation never sets it, so its numbers are
    # unchanged.
    if os.environ.get("SPARK_GRAFT_BENCH_COLD") != "1":
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            list(pool.map(lambda name: tabs[name].cache().count(), tabs))

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _hashable(dt) -> bool:  # xxhash64 rejects MapType at any depth
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    names = [n for n in HEADLINE if n in QUERIES]
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            # prune-proof sink (r9): a bare count() lets Catalyst drop
            # unreferenced output columns, under-measuring expression
            # work — hash every (hashable) output column instead, still
            # one row back to the driver
            cols = [f.name for f in df.schema.fields if _hashable(f.dataType)]
            # bit_xor, not sum: ANSI mode makes a long sum of hashes throw
            sink = F.bit_xor(F.xxhash64(F.struct(*cols))) if cols else F.count(F.lit(1))
            n, _chk = df.agg(F.count(F.lit(1)), sink).first()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
