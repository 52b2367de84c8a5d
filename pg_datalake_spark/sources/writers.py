"""COPY-style import/export helpers.

Reference parity: ``COPY table TO 's3://…/x.csv.gz'`` /
``COPY table FROM 's3://…'`` with format + compression inferred from
the extension (pg_lake_copy/src/copy/copy.c:274-1100; extension table
docs/file-formats-reference.md:26-36). Spark's writers handle
compression codecs and multipart layout; a single-file target uses
coalesce(1) like the reference's single-URL COPY TO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pg_datalake_spark.sources.readers import infer_format, read_files

_COMP_CODEC = {None: None, "gzip": "gzip", "zstd": "zstd", "snappy": "snappy"}


def copy_to(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    compression: str | None = None,
    single_file: bool = False,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Export a DataFrame to files, format/compression from extension.
    ``partition_by`` writes hive-layout ``col=value`` directories (the
    reference's ``COPY ... TO ... (PARTITION_BY col)``); incompatible
    with ``single_file``."""
    if fmt is None:
        fmt, ext_comp = infer_format(path)
        compression = compression or ext_comp
    elif compression is None:
        # explicit format does not opt out of extension-based
        # compression inference ("/out/x.csv.gz" must be gzipped)
        try:
            _, compression = infer_format(path)
        except ValueError:
            compression = None  # extension names no known codec — write uncompressed
    if partition_by and single_file:
        raise ValueError("partition_by and single_file are mutually exclusive")
    writer = df.coalesce(1) if single_file else df
    w = writer.write.mode(mode).options(**{k: str(v) for k, v in options.items()})
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        w = w.option("header", "true")
        if compression:
            w = w.option("compression", _COMP_CODEC[compression])
        w.csv(path)
    elif fmt == "json":
        if compression:
            w = w.option("compression", _COMP_CODEC[compression])
        w.json(path)
    elif fmt == "parquet":
        w.option("compression", compression or "snappy").parquet(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def copy_from(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """Import files (the INSERT side is the caller's writeTo/append —
    the reference pushes COPY FROM straight into the engine the same
    way: IsCopyFromPushdownable, copy.c:605)."""
    return read_files(spark, path, fmt, schema=schema, **options)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and per-bucket sorted) on its
    join key — Spark's storage-level co-location. Two tables bucketed
    on the same key with the same bucket count join WITHOUT a shuffle
    exchange on either side (and without a sort when sort_cols match):
    at 100 TB this converts every recurring fact-fact join on the
    bucketed key from a full-network shuffle into a local merge, the
    same reason the reference clusters lake tables on their join keys.
    The layout lives in the session catalog (parquet + bucket spec);
    plan-shape-locked by tests/test_plan_shapes.py::
    test_bucketed_join_has_no_shuffle."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Scan a bucketed table with its bucket spec intact (plain
    ``spark.table`` — the catalog carries the layout metadata that
    lets the planner elide the exchange)."""
    return spark.table(table_name)
