"""PostgreSQL-compatible function layer over pyspark.sql.functions."""

from pg_datalake_spark.functions.pgcompat import (  # noqa: F401
    pg_array_agg,
    pg_date_bin,
    pg_date_trunc,
    pg_div,
    pg_dow,
    pg_epoch,
    pg_generate_series,
    pg_to_char,
)
