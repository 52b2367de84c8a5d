"""Structured Streaming surface: incremental ingestion, windowed aggregation."""

from pg_datalake_spark.streaming.ingest import (  # noqa: F401
    incremental_file_ingest,
    windowed_event_counts,
)
