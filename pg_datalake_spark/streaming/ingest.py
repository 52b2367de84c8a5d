"""Incremental ingestion and streaming aggregation.

The reference is batch-only; its streaming idioms are (a) staging
table + periodic flush and (b) exactly-once incremental file ingestion
via pg_incremental filtering on _filename
(docs/use-case-log-management.md:1-40, SURVEY §2.10). The Spark-native
equivalents below exceed that surface:

- incremental_file_ingest: Structured Streaming file source with
  Trigger.AvailableNow + checkpoint — exactly-once file tracking is
  built into the source (the _filename bookkeeping the reference
  bolts on), draining all available input then stopping, cron-able
  exactly like pg_incremental.
- windowed_event_counts: watermarked tumbling-window aggregation of
  late-arriving events — no reference counterpart (SURVEY notes the
  gap); included because a 100 TB event pipeline needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def incremental_file_ingest(
    spark: SparkSession,
    source_glob: str,
    schema,
    checkpoint_dir: str,
    sink_fn,
    fmt: str = "parquet",
) -> int:
    """Drain all currently-available files exactly once into sink_fn.

    ``sink_fn(batch_df, batch_id)`` is the foreachBatch body (append to
    a LakeTable, write parquet, ...). Re-running with the same
    checkpoint ingests only files not seen before — restart-safe
    exactly-once, the pg_incremental contract.

    Returns the number of micro-batches executed.
    """
    n_batches = 0

    def _wrapped(df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        sink_fn(df, batch_id)

    reader = spark.readStream.schema(schema)
    stream = reader.parquet(source_glob) if fmt == "parquet" else reader.format(fmt).load(
        source_glob
    )
    q = (
        stream.writeStream.foreachBatch(_wrapped)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts/sums over a (possibly
    streaming) events frame. On a batch frame this degrades to a plain
    window aggregation — same code path both ways."""
    g = [F.window(F.col(ts_col), window).alias("w")] + [F.col(c) for c in (group_cols or [])]
    out = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        out.groupBy(*g)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *(group_cols or []),
            "n_events",
            "total_value",
        )
    )
