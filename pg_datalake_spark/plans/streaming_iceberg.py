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
from pg_datalake_spark.plans.registry import ORACLES, QUERIES, register
from pg_datalake_spark.streaming import iceberg_stream_sink

# The former st05 window slot, widened in the r10 tail to the
# streaming table-format suite: Iceberg sink (st05), Delta sink with
# txn watermarks (st10), Delta streaming SOURCE (st11), Iceberg
# streaming SOURCE (st12) — NULL-padded by-name union, every arm's
# oracle recomputed relationally from the source parquet. Feeders stay
# registered standalone (st05 re-registers at module end, after the
# window) for the local gate.
_STFMT_SCHEMA = [
    ("o_orderstatus", "string"),
    ("n", "long"),
    ("total_value", "double"),
    ("n_users", "long"),
    ("key_sum", "long"),
    # r12 widening: the post-window streaming trio joins the window
    ("value_cents", "long"),
    ("n_pairs", "long"),
    ("n_views_matched", "long"),
    ("n_purchases_matched", "long"),
    ("attributed_cents", "long"),
    ("id_a", "long"),
    ("id_b", "long"),
    ("jaccard", "double"),
]
_STFMT_ARMS = [
    ("st05", "st05_iceberg_stream_ingest", ["n", "total_value", "n_users"]),
    ("st10", "st10_delta_stream_ingest", ["n", "total_value", "n_users"]),
    ("st11", "st11_delta_stream_source", ["o_orderstatus", "n", "key_sum"]),
    ("st12", "st12_iceberg_stream_source", ["o_orderstatus", "n", "key_sum"]),
    ("st07", "st07_streaming_dedup", ["n", "n_users", "value_cents"]),
    ("st08", "st08_stream_stream_join",
     ["n_pairs", "n_views_matched", "n_purchases_matched",
      "attributed_cents"]),
    ("st09", "st09_streaming_lsh_neardup", ["id_a", "id_b", "jaccard"]),
]


def _st_pad_sql(arm: str, name: str, present: list[str]) -> str:
    from pg_datalake_spark.plans.suites import _pad_arm_sql

    return _pad_arm_sql(arm, ORACLES[name], _STFMT_SCHEMA, present)


@register(
    "st05_st07_st08_st09_st10_st11_st12_stream_formats",
    oracle=lambda: "\nUNION ALL\n".join(
        _st_pad_sql(arm, name, present) for arm, name, present in _STFMT_ARMS
    ),
)
def stream_formats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verified STREAMING table-format suite (r10 tail): the
    exactly-once Iceberg sink (st05), the txn-watermark-idempotent
    Delta sink (st10), and both Spark-4 Python DataSource STREAMING
    SOURCES — Delta by commit-version offsets (st11) and external
    Iceberg by snapshot sequence numbers (st12) — widened in the r12
    tail with the post-window streaming trio: watermarked streaming
    dedup (st07), the stream-stream interval join (st08) and
    streaming MinHash-LSH near-dup detection (st09, whose stream must
    equal the batch d02 output). Seven arms, one NULL-padded union;
    each arm's stream must reproduce its source aggregate exactly or
    the hash breaks."""
    from pg_datalake_spark.plans.suites import _pad_arm

    out = None
    for arm, name, _present in _STFMT_ARMS:
        padded = _pad_arm(QUERIES[name](spark, sf_dir), arm, _STFMT_SCHEMA)
        out = padded if out is None else out.unionByName(padded)
    return out


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


# st05's standalone registration moved AFTER the window (its former
# slot now holds the merged stream-formats suite) — the lake08 pattern:
# local parity gate keeps the feeder, the window verifies the merge.
register(
    "st05_iceberg_stream_ingest",
    oracle="""
    SELECT count(*) AS n,
           round(sum(value), 2) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    """,
)(st05)
