"""Multimodal-column queries: binary media round-trips through
mapInPandas decode/resize/frame-sample, verified against closed-form
oracles (the fake codec's metadata is a pure function of doc_id, so
DuckDB can predict the decoded values without parsing bytes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.operators import multimodal as mm
from pg_datalake_spark.plans.registry import register


def _media_frame(spark: SparkSession, sf_dir: str, kind: str = "image", frames=None):
    t = load_tables(spark, sf_dir, ["documents"])
    return t["documents"].select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        mm.fake_media(F.col("doc_id"), kind, frames).alias("data"),
    )


@register(
    "mm01_decode_meta",
    oracle="""
    SELECT CAST(64 + doc_id % 192 AS INT) AS width,
           CAST(32 + doc_id % 96 AS INT)  AS height,
           count(*) AS n
    FROM documents
    GROUP BY 1, 2
    """,
)
def mm01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode binary media JVM-side, decode via Arrow-batched
    mapInPandas, aggregate decoded dims — the oracle predicts them in
    closed form from doc_id."""
    media = _media_frame(spark, sf_dir, "image")
    decoded = mm.decode_media(media)
    return (
        decoded.select(F.col("meta.width").alias("width"), F.col("meta.height").alias("height"))
        .groupBy("width", "height")
        .agg(F.count("*").alias("n"))
    )


@register(
    "mm02_resize_pipeline",
    oracle="""
    SELECT CAST(floor((64 + doc_id % 192) * 0.5) AS INT) AS width,
           count(*) AS n
    FROM documents
    GROUP BY 1
    """,
)
def mm02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resize(0.5) then re-decode: header transform must round-trip
    through the binary representation."""
    media = _media_frame(spark, sf_dir, "image")
    resized = mm.resize_media(media, scale=0.5)
    decoded = mm.decode_media(resized)
    return (
        decoded.select(F.col("meta.width").alias("width"))
        .groupBy("width")
        .agg(F.count("*").alias("n"))
    )


@register(
    "mm03_frame_sample",
    oracle="""
    SELECT doc_id AS media_id, CAST(4 AS BIGINT) AS n_sampled
    FROM documents WHERE doc_id < 50
    """,
)
def mm03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample 16-frame fake videos every 4th frame → exactly 4
    frames per media row."""
    media = _media_frame(spark, sf_dir, "video", frames=16).filter(F.col("media_id") < 50)
    frames = mm.frame_sample(media, every_n=4)
    return frames.groupBy("media_id").agg(F.count("*").alias("n_sampled"))


@register("mm04_byte_histogram")  # rows-only: features are real numpy work
def mm04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram features (the embedding-shaped output a real
    image encoder would produce)."""
    media = _media_frame(spark, sf_dir, "image")
    feats = mm.media_features(media, dims=8)
    return feats.select(
        "media_id", F.size("features").alias("dim"), F.element_at("features", 1).alias("f0")
    )


@register("mm05_perceptual_neardup")  # rows-only: dHash is numpy raster work
def mm05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash IMAGE near-duplicate detection: dHash (8×9
    grid-mean difference hash) over Arrow-batched payloads, 16-bit
    band bucket join (the d02 LSH shape — pigeonhole-complete for
    hamming ≤ 3), exact bit_count verify. The textured corpus plants
    a 2-byte-edited sibling for every even id; the pair set is exactly
    the sibling set (asserted bit-exact in pytest; rows-only here —
    the raster resample has no SQL restatement)."""
    t = load_tables(spark, sf_dir, ["documents"])
    media = t["documents"].select(
        F.col("doc_id").alias("media_id"),
        mm.fake_textured_media(F.col("doc_id")).alias("data"),
    )
    return mm.phash_neardup_pairs(media, "media_id", max_hamming=3)
