"""Streaming ingestion into an external Iceberg table.

Registered inside the 50-slot driver window (round 5) after four
rounds as a parity-only tail query. Combines the two beyond-reference surfaces — Structured
Streaming exactly-once ingest (SURVEY §2.10) and the external-Iceberg
write half — into the transactional streaming sink a real pipeline
runs: one APPEND snapshot per micro-batch, idempotent on replay via
the (checkpoint, batch-id) identity in snapshot summaries.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.plans.registry import register
from pg_datalake_spark.streaming import iceberg_stream_sink


@register(
    "st05_iceberg_stream_ingest",
    oracle="""
    SELECT count(*) AS n,
           round(sum(value), 2) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    """,
)
def st05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events table through the streaming Iceberg sink
    (bootstrap commit on the first batch), drain AGAIN with no new
    files (zero batches — the checkpoint's exactly-once contract), then
    aggregate the Iceberg table the stream produced. The oracle
    aggregates the source directly, so ingest + snapshot commit + read
    must be lossless."""
    from pg_datalake_spark.tables.iceberg_external import read_iceberg_table

    load_tables(spark, sf_dir, ["events"])
    stage = tempfile.mkdtemp(prefix="st05_")
    landing = os.path.join(stage, "landing")
    os.makedirs(landing)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(landing, "events.parquet"))
    ckpt = os.path.join(stage, "ckpt")
    loc = os.path.join(stage, "iceberg_events")
    src_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    iceberg_stream_sink(spark, landing, src_schema, ckpt, loc)
    # second drain: no new files → no new snapshots
    iceberg_stream_sink(spark, landing, src_schema, ckpt, loc)

    ingested = read_iceberg_table(spark, loc)
    return ingested.agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(30,2)")).cast("double"), 2
        ).alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "st10_delta_stream_ingest",
    oracle="""
    SELECT count(*) AS n,
           round(sum(value), 2) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    """,
)
def st10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion into a DELTA table (r10;
    streaming.delta_stream_sink) with txn-watermark idempotence
    (PROTOCOL.md "Transaction Identifiers"): drain the events table,
    drain AGAIN on the same checkpoint (zero new batches), then
    REPLAY batch 0 by hand against the table — the txn watermark in
    the log (which also survived a checkpoint) must reject it even
    though the Structured-Streaming checkpoint is gone. The oracle
    aggregates the source directly, so ingest + idempotence + read
    must be lossless — a double-append doubles n and breaks the
    hash."""
    import os as _os
    import shutil as _shutil

    from pg_datalake_spark.streaming import delta_stream_sink
    from pg_datalake_spark.tables import delta_log as dl

    load_tables(spark, sf_dir, ["events"])
    stage = tempfile.mkdtemp(prefix="st10_")
    landing = _os.path.join(stage, "landing")
    _os.makedirs(landing)
    _shutil.copy(f"{sf_dir}/events.parquet", _os.path.join(landing, "events.parquet"))
    ckpt = _os.path.join(stage, "ckpt")
    loc = _os.path.join(stage, "delta_events")
    src_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    delta_stream_sink(spark, landing, src_schema, ckpt, loc, app_id="st10")
    # second drain on the same checkpoint: no new files -> no batches
    delta_stream_sink(spark, landing, src_schema, ckpt, loc, app_id="st10")
    # checkpoint the table, then hand-replay batch 0: the watermark
    # must be recovered from the CHECKPOINT and reject the append
    dl.write_delta_checkpoint(spark, loc)
    before = dl.delta_table_version(loc)
    replay = spark.read.schema(src_schema).parquet(
        _os.path.join(landing, "events.parquet")
    )
    v = dl.append_delta(replay, loc, txn_app_id="st10", txn_version=0)
    assert v == before, "replayed batch 0 must be skipped"

    ingested = dl.read_delta_table(spark, loc)
    return ingested.agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(30,2)")).cast("double"), 2
        ).alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "st11_delta_stream_source",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    """
    + " GROUP BY o_orderstatus",
)
def st11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta as a STREAMING SOURCE (r10;
    sources/delta_stream_source.DeltaStreamDataSource — the Spark 4
    Python Data Source API's streamReader, mirroring delta-spark's
    readStream semantics: per-commit offsets, dataChange=false commits
    invisible, skipChangeCommits for non-append commits). The orders
    table lands in a Delta table over THREE commits (create + two
    appends) with an OPTIMIZE in between, is consumed by a
    checkpointed availableNow stream into parquet, and the parquet is
    aggregated — the oracle aggregates the source directly, so the
    commit→offset→exactly-once path must be lossless."""
    import os as _os

    from pg_datalake_spark.sources.delta_stream_source import (
        DeltaStreamDataSource,
    )
    from pg_datalake_spark.tables import delta_log as dl

    t = load_tables(spark, sf_dir, ["orders"])
    src = t["orders"].select("o_orderkey", "o_orderstatus")
    stage = tempfile.mkdtemp(prefix="st11_")
    loc = _os.path.join(stage, "delta_orders")
    dl.write_delta_table(
        src.filter("o_orderkey % 3 = 0").repartition(2), loc
    )                                                               # v0
    dl.append_delta(src.filter("o_orderkey % 3 = 1").repartition(2), loc)  # v1
    dl.optimize_delta(spark, loc, target_file_mb=128)               # v2
    dl.append_delta(src.filter("o_orderkey % 3 = 2").repartition(2), loc)  # v3

    spark.dataSource.register(DeltaStreamDataSource)
    sink = _os.path.join(stage, "sink")
    q = (
        spark.readStream.format("pglake_delta")
        .option("path", loc)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", _os.path.join(stage, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return (
        spark.read.parquet(sink)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


@register(
    "st12_iceberg_stream_source",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    """
    + " GROUP BY o_orderstatus",
)
def st12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External Iceberg as a STREAMING SOURCE (r10 tail;
    sources/iceberg_stream_source.IcebergStreamDataSource — sequence-
    number offsets over the snapshot history, append snapshots only,
    ADDED manifest entries per batch, typed identity-partition
    re-injection). The orders table lands in an Iceberg table over
    three append snapshots, is consumed by a checkpointed availableNow
    stream into parquet, and aggregated; the oracle aggregates the
    source directly — the snapshot→offset→exactly-once path must be
    lossless."""
    import os as _os

    from pg_datalake_spark.sources.iceberg_stream_source import (
        IcebergStreamDataSource,
    )
    from pg_datalake_spark.tables import iceberg_external as ie

    t = load_tables(spark, sf_dir, ["orders"])
    src = t["orders"].select("o_orderkey", "o_orderstatus")
    stage = tempfile.mkdtemp(prefix="st12_")
    loc = _os.path.join(stage, "ice_orders")
    ie.export_iceberg_snapshot(src.filter("o_orderkey % 3 = 0"), loc)
    ie.append_snapshot(src.filter("o_orderkey % 3 = 1"), loc)
    ie.append_snapshot(src.filter("o_orderkey % 3 = 2"), loc)

    spark.dataSource.register(IcebergStreamDataSource)
    sink = _os.path.join(stage, "sink")
    q = (
        spark.readStream.format("pglake_iceberg")
        .option("path", loc)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", _os.path.join(stage, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return (
        spark.read.parquet(sink)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )
