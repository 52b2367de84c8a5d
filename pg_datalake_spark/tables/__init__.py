"""Transactional lakehouse table format on Parquet."""

from pg_datalake_spark.tables.format import LakeTable  # noqa: F401
