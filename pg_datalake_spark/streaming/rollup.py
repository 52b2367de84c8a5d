"""Continuous aggregate (hypertable-style rollup) on a LakeTable.

The reference's idiom for this is a staging table + periodic flush via
pg_cron (docs/iceberg-tables.md:120-140); TimescaleDB calls the
pattern a continuous aggregate. Here it is a LakeTable holding
time-bucketed partial aggregates, refreshed incrementally: each batch
of new events is aggregated to deltas and MERGEd in — matched buckets
combine (counts and sums are algebraic), new buckets insert. The
rollup therefore stays exactly equal to re-aggregating all raw data,
at the cost of only the delta's aggregation.

Scale design: the delta aggregation is a partial-agg-friendly groupBy
over the new batch only; the MERGE rewrites only the bucket-key files
the delta touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_datalake_spark.tables import LakeTable

ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("bucket_key", T.StringType()),
        T.StructField("window_start", T.TimestampNTZType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _deltas(events: DataFrame, window: str = "1 hour") -> DataFrame:
    agg = (
        events.groupBy(
            F.window("ts", window).alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return agg.select(
        F.concat_ws("|", F.col("window_start").cast("string"), "event_type").alias(
            "bucket_key"
        ),
        "window_start",
        "event_type",
        "n_events",
        "total_value",
    )


def create_rollup(spark: SparkSession, root: str) -> LakeTable:
    return LakeTable.create(spark, root, ROLLUP_SCHEMA)


def refresh_rollup(rollup: LakeTable, new_events: DataFrame, window: str = "1 hour") -> None:
    """Fold a batch of new raw events into the rollup: matched buckets
    combine additively, unseen buckets insert — one MERGE commit."""
    rollup.merge(
        _deltas(new_events, window),
        on=["window_start", "event_type"],
        when_matched_update={
            "n_events": "tgt.n_events + src.n_events",
            # a delta bucket whose events all have NULL value sums to
            # NULL; adding that would wipe the accumulated total (PG
            # sum() ignores NULLs, so the rollup must too)
            "total_value": "coalesce(tgt.total_value, 0.0) + coalesce(src.total_value, 0.0)",
        },
    )
