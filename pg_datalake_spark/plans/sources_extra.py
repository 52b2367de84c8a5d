"""Extra source parity queries registered after the driver window.

src04: the offline ``hf://`` reader (sources/hf_reader.py, r8) driven
end-to-end — a huggingface_hub-layout snapshot cache is materialized
from the documents table (convention-named parquet shards, refs →
snapshots indirection), read back through ``read_files("hf://…")``,
and aggregated; DuckDB reproduces both splits relationally from the
source parquet, never seeing the cache layout. Reference:
docs/file-formats-reference.md:158-183 (hf:// URLs through httpfs).
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.plans.registry import register


@register(
    "src04_hf_dataset",
    oracle="""
    SELECT 'train' AS split, lang, count(*) AS n,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM documents WHERE doc_id % 10 <> 0 GROUP BY lang
    UNION ALL
    SELECT 'test' AS split, lang, count(*) AS n,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM documents WHERE doc_id % 10 = 0 GROUP BY lang
    """,
)
def src04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_datalake_spark.sources.readers import read_files

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    cache = tempfile.mkdtemp(prefix="src04_hf_")
    commit = "feedc0de" * 5
    repo = os.path.join(cache, "datasets--bench--documents")
    snap = os.path.join(repo, "snapshots", commit, "default")
    os.makedirs(os.path.join(repo, "refs"))
    os.makedirs(snap)
    with open(os.path.join(repo, "refs", "main"), "w") as fh:
        fh.write(commit)

    def shard(df: DataFrame, names: list[str]) -> None:
        stage = os.path.join(cache, "_stage")
        df.repartition(len(names)).write.mode("overwrite").parquet(stage)
        parts = sorted(glob.glob(os.path.join(stage, "*.parquet")))
        assert len(parts) == len(names), (parts, names)
        for src, dst in zip(parts, names):
            os.replace(src, os.path.join(snap, dst))

    shard(
        docs.filter(F.col("doc_id") % 10 != 0),
        ["train-00000-of-00002.parquet", "train-00001-of-00002.parquet"],
    )
    shard(docs.filter(F.col("doc_id") % 10 == 0), ["test-00000-of-00001.parquet"])

    def agg(split: str) -> DataFrame:
        return (
            read_files(
                spark, "hf://datasets/bench/documents", split=split, cache_dir=cache
            )
            .groupBy("lang")
            .agg(
                F.count("*").alias("n"),
                F.sum("n_chars").cast("long").alias("chars"),
            )
            .select(F.lit(split).alias("split"), "lang", "n", "chars")
        )

    return agg("train").unionByName(agg("test"))
