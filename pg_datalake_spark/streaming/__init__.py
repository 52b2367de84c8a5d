"""Structured Streaming surface: incremental ingestion, windowed aggregation."""

from pg_datalake_spark.streaming.ingest import (  # noqa: F401
    delta_stream_sink,
    iceberg_commit_batch,
    iceberg_stream_sink,
    incremental_file_ingest,
    windowed_event_counts,
)
