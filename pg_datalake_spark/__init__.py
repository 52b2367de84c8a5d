"""pg_datalake_spark — a PySpark-native lakehouse analytics engine.

A from-scratch rebuild of the capability surface of the ``pg_lake``
PostgreSQL lakehouse (reference surveyed in SURVEY.md), expressed
idiomatically on Spark DataFrames / Spark SQL / Catalyst:

- ``session``   — SparkSession construction tuned for analytics.
- ``catalog``   — test-data table registration (TPC-H-ish star schema).
- ``sources``   — schema-inferred readers for parquet/csv/json, file
                  listing/preview, COPY-style import/export.
- ``functions`` — PostgreSQL-compatible scalar/aggregate function layer.
- ``plans``     — the query library (TPC-H-ish, relational-coverage,
                  LLM-data-pipeline) with DuckDB oracle SQL for each.
- ``operators`` — reusable dataframe operators (dedup, similarity,
                  text stats, top-k, as-of joins).
- ``tables``    — transactional lakehouse table format on Parquet
                  (snapshots, hidden partitioning, MOR deletes, time
                  travel, compaction) — pure metadata layer, Spark data
                  plane.
- ``streaming`` — incremental ingestion and windowed aggregation via
                  Structured Streaming.
"""

__version__ = "0.1.0"
