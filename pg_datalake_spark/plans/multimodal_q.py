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


@register(
    "mm04_byte_histogram",
    oracle="""
    SELECT doc_id AS media_id, CAST(8 AS INT) AS dim,
           CAST(CASE WHEN doc_id % 256 < 32 THEN 1.0 ELSE 0.0 END AS DOUBLE)
             AS f0
    FROM documents
    """,
)
def mm04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram features (the embedding-shaped output a real
    image encoder would produce). r11 promotion from rows-only: the
    fake payload is the byte (doc_id % 256) repeated, so the 8-bin
    histogram is closed-form — bin 0 holds everything iff
    doc_id % 256 < 32 — and DuckDB predicts dim and f0 without
    parsing bytes."""
    media = _media_frame(spark, sf_dir, "image")
    feats = mm.media_features(media, dims=8)
    return feats.select(
        "media_id",
        F.size("features").alias("dim"),
        F.element_at("features", 1).cast("double").alias("f0"),
    )


@register(
    "mm05_perceptual_neardup",
    oracle="""
    SELECT a.doc_id AS id_a, a.doc_id + 1 AS id_b, CAST(1 AS INT) AS ham_ok
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    WHERE a.doc_id % 2 = 0
    """,
)
def mm05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash IMAGE near-duplicate detection: dHash (8×9
    grid-mean difference hash) over Arrow-batched payloads, 16-bit
    band bucket join (the d02 LSH shape — pigeonhole-complete for
    hamming ≤ 3), exact bit_count verify. The textured corpus plants
    a 2-byte-edited sibling for every even id; the pair set is exactly
    the sibling set. r11 promotion from rows-only: the pair IDs hash
    against the planted sibling relation recomputed relationally, and
    the engine-specific hamming value is verified as the bounded
    ham_ok law instead of exported raw."""
    t = load_tables(spark, sf_dir, ["documents"])
    media = t["documents"].select(
        F.col("doc_id").alias("media_id"),
        mm.fake_textured_media(F.col("doc_id")).alias("data"),
    )
    pairs = mm.phash_neardup_pairs(media, "media_id", max_hamming=3)
    return pairs.select(
        "id_a", "id_b", (F.col("hamming") <= 3).cast("int").alias("ham_ok")
    )
