"""Test-data catalog: register the driver-provided parquet tables.

Mirrors the reference's notion of lake foreign tables over parquet
(reference: docs/query-data-lake-files.md:1-40) — here each table is a
temp view over ``spark.read.parquet`` so both the DataFrame API and
``spark.sql`` see the same relations, and Catalyst pushes filters and
projections into the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Tables below this size gain nothing from spreading (their scans are
# instant and they are usually broadcast sides); everything bigger whose
# file layout cannot feed the session's cores gets a round-robin spread.
# 256 KiB keeps the schema-bounded dims (nation/region/supplier/part)
# out while catching the per-row-expensive text/embedding corpora.
_PAR_FLOOR_MIN_BYTES = 1 << 18


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Per-process parquet-schema memo: schema inference (footer read +
# relation build) costs ~0.1 s of driver time per spark.read.parquet
# call, paid again for every table of every timed query; supplying the
# schema explicitly cuts that to ~25 ms with an identical analyzed plan
# (cache lookups still match — verified). Metadata only, never data.
_SCHEMA_MEMO: dict[str, T.StructType] = {}


def _read_table(spark: SparkSession, path: str) -> DataFrame:
    sch = _SCHEMA_MEMO.get(path)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[path] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def _scan_layout(path: str) -> tuple[int, int]:
    """(total_bytes, n_files) of a parquet file or directory of files."""
    if os.path.isdir(path):
        total, n = 0, 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, f))
                    n += 1
        return total, max(n, 1)
    return os.path.getsize(path), 1


def _max_partition_bytes(spark: SparkSession) -> int:
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try:
        return int(raw)
    except ValueError:
        try:  # values like "128MB"
            return int(
                spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
            )
        except Exception:
            return 134217728


def _with_scan_parallelism(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Scale-adaptive scan-parallelism floor (optimization guide §2.5:
    "one huge unsplittable file ... repartition immediately after the
    read"). The driver testdata ships ONE single-row-group parquet file
    per table, so every scan — and any cache built from it — is a
    single task no matter how many cores the session has; every
    downstream map stage then runs 1-wide. When the file layout cannot
    produce at least defaultParallelism scan tasks (few files, bytes
    below maxPartitionBytes·cores) the rows are spread round-robin
    once, restoring full-width map stages; at real scale (many files /
    row groups) the condition is false and NO exchange is added.
    Catalyst still pushes filters and column pruning below the
    Repartition into the parquet scan (verified in plans/r15)."""
    try:
        total_bytes, n_files = _scan_layout(path)
    except OSError:
        return df
    if total_bytes < _PAR_FLOOR_MIN_BYTES:
        return df
    par = spark.sparkContext.defaultParallelism
    est_tasks = max(n_files, total_bytes // _max_partition_bytes(spark))
    if est_tasks >= par:
        return df
    return df.repartition(par)


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None, spread: bool = True
) -> dict[str, DataFrame]:
    """Read each parquet table and register it as a temp view.

    Returns {name: DataFrame}. Idempotent per session; re-registering a
    temp view is cheap and keeps callers stateless.

    ``spread=False`` skips the scan-parallelism floor: a handful of
    queries accumulate raw IEEE doubles (plain sum/avg) whose
    last-ulp value depends on partition merge order — they hash-match
    the single-threaded DuckDB oracle only over the file's native
    single-partition scan order and must keep that plan.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the driver supplies its own session: pin the timezone here too —
    # epoch/time-of-day arithmetic casts through TimestampType, which
    # is session-tz-dependent (oracle comparisons assume UTC)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for name in names if names is not None else TABLE_NAMES:
        df = _read_table(spark, table_path(sf_dir, name))
        if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
            # TIMESTAMP(NANOS) read as long nanos → timestamp_ntz (µs)
            # floor division in exact integer arithmetic: `div`
            # truncates toward zero, which is off by one µs for
            # pre-epoch nanos; double division loses precision past
            # 2^53 ns (~104 days of epoch time)
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr(
                        "CASE WHEN ts >= 0 THEN ts div 1000 "
                        "ELSE -((-ts + 999) div 1000) END"
                    )
                ).cast("timestamp_ntz"),
            )
        if spread:
            df = _with_scan_parallelism(spark, df, table_path(sf_dir, name))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
