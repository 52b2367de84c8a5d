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


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read each parquet table and register it as a temp view.

    Returns {name: DataFrame}. Idempotent per session; re-registering a
    temp view is cheap and keeps callers stateless.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the driver supplies its own session: pin the timezone here too —
    # epoch/time-of-day arithmetic casts through TimestampType, which
    # is session-tz-dependent (oracle comparisons assume UTC)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for name in names if names is not None else TABLE_NAMES:
        df = spark.read.parquet(table_path(sf_dir, name))
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
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
