"""Post-window streaming queries (registered after the 50-slot driver
window; verified by the local exact-hash gate)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.plans.registry import register


@register(
    "st07_streaming_dedup",
    oracle="""
    SELECT count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    """,
)
def st07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication (SURVEY §2.10 beyond-reference tier):
    the landing zone receives every event file TWICE (an
    at-least-once upstream replay), and
    ``streaming.streaming_dedup_ingest`` — watermarked
    ``dropDuplicatesWithinWatermark`` on the event key, so dedup state
    is bounded by the watermark window, not the stream length — must
    deliver each event exactly once: the sink aggregate equals the
    clean single-copy aggregate the oracle computes."""
    from pg_datalake_spark.streaming.ingest import streaming_dedup_ingest

    t = load_tables(spark, sf_dir, ["events"])
    clean = t["events"].select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "value"
    )
    stage = tempfile.mkdtemp(prefix="st07_")
    landing = os.path.join(stage, "landing")
    clean.write.parquet(landing)
    clean.write.mode("append").parquet(landing)  # the duplicate delivery
    sink_dir = os.path.join(stage, "sink")

    def sink(df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(sink_dir)

    schema = spark.read.parquet(landing).schema
    streaming_dedup_ingest(
        spark,
        landing,
        schema,
        os.path.join(stage, "ckpt"),
        sink,
        key_cols=["event_id"],
        event_time_col="ts",
        watermark="10 minutes",
    )
    return spark.read.parquet(sink_dir).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long")
        .alias("value_cents"),
    )
