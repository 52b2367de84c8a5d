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


@register(
    "src05_geo_formats",
    oracle="""
    SELECT 'shp' AS src, c_mktsegment, count(*) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_custkey % 20 = 0 GROUP BY c_mktsegment
    UNION ALL
    SELECT 'gpkg' AS src, c_mktsegment, count(*) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_custkey % 20 = 1 GROUP BY c_mktsegment
    """,
)
def src05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDAL-surface analog driven end-to-end (r9;
    sources/geo_files.py — pure-Python ESRI Shapefile and OGC
    GeoPackage codecs, closing the one §2.1 'no' as far as the two
    most common formats): customer-derived points are written to TWO
    .shp/.dbf pairs (multi-file parallel read) and one .gpkg feature
    table (read partitioned by ROWID RANGE), read back through the
    executor-side parsers, and aggregated; DuckDB recomputes both
    splits from the source parquet, never seeing the binary formats.
    Balances hash as exact CENTS (the dsum convention). Reference:
    pg_lake_engine/src/pgduck/gdal.c,
    docs/file-formats-reference.md:96-138."""
    from pg_datalake_spark.sources.geo_files import (
        read_gpkg,
        read_shapefile,
        write_gpkg_points,
        write_point_shapefile,
    )

    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    d = tempfile.mkdtemp(prefix="src05_geo_")

    def sample(mod_val: int) -> list[tuple]:
        rows = (
            cust.filter(F.col("c_custkey") % 20 == mod_val)
            .select("c_acctbal", "c_custkey", "c_mktsegment")
            .collect()
        )  # fixture-sized sample (|customer|/20 rows), builds the files
        return [
            (
                float(r.c_acctbal),
                (r.c_custkey % 100) / 10.0,
                int(r.c_custkey),
                r.c_mktsegment,
            )
            for r in rows
        ]

    fields = [("key", "N", 12, 0), ("seg", "C", 12, 0)]
    shp_rows = sample(0)
    half = len(shp_rows) // 2
    write_point_shapefile(os.path.join(d, "part0"), shp_rows[:half], fields)
    write_point_shapefile(os.path.join(d, "part1"), shp_rows[half:], fields)
    write_gpkg_points(
        os.path.join(d, "pts.gpkg"), "customers", sample(1),
        [("key", "INTEGER"), ("seg", "TEXT")],
    )

    shp = read_shapefile(spark, os.path.join(d, "*.shp"))
    gp = read_gpkg(spark, os.path.join(d, "pts.gpkg"), num_partitions=4)

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.groupBy(F.col("seg").alias("c_mktsegment"))
            .agg(
                F.count("*").alias("n"),
                F.sum("key").cast("long").alias("key_sum"),
                F.sum(F.round(F.col("x") * 100).cast("long"))
                .cast("long")
                .alias("bal_cents"),
            )
            .select(F.lit(tag).alias("src"), "*")
        )

    return agg(shp, "shp").unionByName(agg(gp, "gpkg"))


@register(
    "src06_office_kml",
    oracle="""
    SELECT 'xlsx' AS src, c_mktsegment, count(*) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_custkey % 20 = 2 GROUP BY c_mktsegment
    UNION ALL
    SELECT 'kml' AS src, c_mktsegment, count(*) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_custkey % 20 = 3 GROUP BY c_mktsegment
    """,
)
def src06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XLSX + KML import analogs (r9; sources/office_files.py pure
    zipfile+ElementTree SpreadsheetML reader, sources/geo_files.read_kml
    OGC KML 2.2 Placemarks) — the remaining common GDAL-imported
    formats after src05's shapefile/GeoPackage. Customer-derived rows
    are written to two .xlsx files (multi-file parallel read, shared
    strings + numeric cells) and one .kml document (point Placemarks
    with ExtendedData), read back through the executor-side parsers,
    and aggregated; DuckDB recomputes both splits from the source
    parquet. Balances hash as exact CENTS. Reference:
    pg_lake_engine/src/pgduck/gdal.c (XLSX/KML drivers),
    docs/file-formats-reference.md:96-138."""
    from pg_datalake_spark.sources.geo_files import read_kml, write_kml_points
    from pg_datalake_spark.sources.office_files import read_xlsx, write_xlsx

    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    d = tempfile.mkdtemp(prefix="src06_")

    def sample(mod_val: int) -> list:
        return (
            cust.filter(F.col("c_custkey") % 20 == mod_val)
            .select("c_acctbal", "c_custkey", "c_mktsegment")
            .collect()
        )  # fixture-sized sample (|customer|/20 rows), builds the files

    xl = [(float(r.c_custkey), r.c_mktsegment, float(r.c_acctbal)) for r in sample(2)]
    half = len(xl) // 2
    write_xlsx(os.path.join(d, "a.xlsx"), ["key", "seg", "bal"], xl[:half])
    write_xlsx(os.path.join(d, "b.xlsx"), ["key", "seg", "bal"], xl[half:])
    write_kml_points(
        os.path.join(d, "pts.kml"),
        [
            (r.c_mktsegment, float(r.c_acctbal), (r.c_custkey % 100) / 10.0,
             int(r.c_custkey))
            for r in sample(3)
        ],
        ["key"],
    )

    xlsx_arm = (
        read_xlsx(spark, os.path.join(d, "*.xlsx"))
        .groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("key").cast("long")).cast("long").alias("key_sum"),
            F.sum(F.round(F.col("bal") * 100).cast("long")).cast("long")
            .alias("bal_cents"),
        )
        .select(F.lit("xlsx").alias("src"), "*")
    )
    kml_arm = (
        read_kml(spark, os.path.join(d, "pts.kml"))
        .groupBy(F.col("name").alias("c_mktsegment"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("key").cast("long")).cast("long").alias("key_sum"),
            F.sum(F.round(F.col("x") * 100).cast("long")).cast("long")
            .alias("bal_cents"),
        )
        .select(F.lit("kml").alias("src"), "*")
    )
    return xlsx_arm.unionByName(kml_arm)


@register(
    "src07_geojson",
    oracle="""
    SELECT c_mktsegment, count(*) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_custkey % 20 = 4 GROUP BY c_mktsegment
    """,
)
def src07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoJSON import (r10; sources/geo_files.read_geojson) — the one
    GDAL format that is plain JSON, so the reader is FULLY Spark-native:
    schema inference for typed properties, geometry.coordinates
    re-read as a raw JSON string and decoded per-row with from_json by
    geometry.type (mixed Point/LineString/Polygon collections stay
    JVM-side, zero Python UDFs). Customer-derived point features are
    written to two .geojson files (multi-file glob read), read back,
    and aggregated; DuckDB recomputes from the source parquet.
    Balances hash as exact CENTS. Reference:
    pg_lake_engine/src/pgduck/gdal.c (GeoJSON driver),
    docs/file-formats-reference.md:96-138."""
    from pg_datalake_spark.sources.geo_files import read_geojson, write_geojson

    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    d = tempfile.mkdtemp(prefix="src07_")
    rows = [
        ((r.c_custkey % 100) / 10.0, (r.c_custkey % 73) / 7.0,
         int(r.c_custkey), r.c_mktsegment, float(r.c_acctbal))
        for r in cust.filter(F.col("c_custkey") % 20 == 4)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .collect()  # fixture-sized sample (|customer|/20 rows), builds the files
    ]
    half = len(rows) // 2
    write_geojson(os.path.join(d, "a.geojson"), rows[:half], ["key", "seg", "bal"])
    write_geojson(os.path.join(d, "b.geojson"), rows[half:], ["key", "seg", "bal"])
    return (
        read_geojson(spark, os.path.join(d, "*.geojson"))
        .groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("key").cast("long")).cast("long").alias("key_sum"),
            F.sum(F.round(F.col("bal") * 100).cast("long")).cast("long")
            .alias("bal_cents"),
        )
    )


@register(
    "src08_gml",
    oracle="""
    SELECT c_mktsegment, count(*) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_custkey % 20 = 5 GROUP BY c_mktsegment
    """,
)
def src08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGC GML import (r10; sources/geo_files.read_gml — ElementTree
    over GML 2/3.1/3.2 namespaces, executor-side one file per task,
    gml:pos / gml:posList / GML-2 gml:coordinates geometry forms).
    Closes the GML entry of the GDAL long tail; only raster formats
    remain scoped out. Customer-derived point features are written to
    two .gml files (multi-file glob read), read back, and aggregated;
    DuckDB recomputes from the source parquet. Balances hash as exact
    CENTS. Reference: pg_lake_engine/src/pgduck/gdal.c (GML driver),
    docs/file-formats-reference.md:96-138."""
    from pg_datalake_spark.sources.geo_files import read_gml, write_gml_points

    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    d = tempfile.mkdtemp(prefix="src08_")
    rows = [
        ((r.c_custkey % 100) / 10.0, (r.c_custkey % 73) / 7.0,
         int(r.c_custkey), r.c_mktsegment, float(r.c_acctbal))
        for r in cust.filter(F.col("c_custkey") % 20 == 5)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .collect()  # fixture-sized sample (|customer|/20 rows), builds the files
    ]
    half = len(rows) // 2
    write_gml_points(os.path.join(d, "a.gml"), rows[:half], ["key", "seg", "bal"])
    write_gml_points(os.path.join(d, "b.gml"), rows[half:], ["key", "seg", "bal"])
    return (
        read_gml(spark, os.path.join(d, "*.gml"))
        .groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            F.count("*").alias("n"),
            # GML properties surface as strings (types live in the XSD,
            # not the instance document) — cast before arithmetic
            F.sum(F.col("key").cast("long")).cast("long").alias("key_sum"),
            F.sum(F.round(F.col("bal").cast("double") * 100).cast("long"))
            .cast("long").alias("bal_cents"),
        )
    )


@register(
    "src09_gdal_dispatch",
    oracle="""
    SELECT 'zipshp' AS src, c_mktsegment, count(*) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_custkey % 20 = 6 GROUP BY c_mktsegment
    UNION ALL
    SELECT 'kmz' AS src, c_mktsegment, count(*) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_custkey % 20 = 7 GROUP BY c_mktsegment
    UNION ALL
    SELECT 'seq' AS src, c_mktsegment, count(*) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_custkey % 20 = 8 GROUP BY c_mktsegment
    UNION ALL
    SELECT 'gz' AS src, c_mktsegment, count(*) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_custkey % 20 = 9 GROUP BY c_mktsegment
    UNION ALL
    SELECT 'fgb' AS src, c_mktsegment, count(*) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_custkey % 20 = 10 GROUP BY c_mktsegment
    """,
)
def src09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``format 'gdal'`` OPTION surface (r10;
    sources/gdal_dispatch.read_gdal) — the reference's
    compression/zip_path inference table driven end-to-end
    (docs/file-formats-reference.md:96-138: compression gzip/zip/none
    inferred from extension, zip_path member selection, .kmz, the
    GeoJSONSeq .geojsonl form). Four archive arms, each a distinct
    dispatch path:

    - zipshp: a shapefile (.shp+.dbf) zipped, read via
      ``zip_path='pts.shp'`` (sidecars staged automatically);
    - kmz: a KML document zipped as .kmz (compression='zip' inferred,
      inner .kml auto-detected);
    - seq: newline-delimited GeoJSONSeq — Spark-native splittable json
      read (the scale path of the GeoJSON family);
    - gz: a .geojson.gz (compression='gzip' inferred, inner extension
      re-dispatched);
    - fgb: FlatGeoBuf (sources/fgb.py — pure-Python flatbuffer codec,
      spec v3) with a real packed-R-tree index, read back RANGE-
      PARTITIONED by the index's leaf byte offsets.

    DuckDB recomputes all five splits from the source parquet, never
    seeing archives. Balances hash as exact CENTS."""
    import gzip as _gz
    import zipfile as _zf

    from pg_datalake_spark.sources.gdal_dispatch import read_gdal
    from pg_datalake_spark.sources.geo_files import (
        write_geojson,
        write_geojson_seq,
        write_kml_points,
        write_point_shapefile,
    )

    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    d = tempfile.mkdtemp(prefix="src09_")

    def sample(mod_val: int) -> list:
        return (
            cust.filter(F.col("c_custkey") % 20 == mod_val)
            .select("c_acctbal", "c_custkey", "c_mktsegment")
            .collect()
        )  # fixture-sized sample (|customer|/20 rows), builds the archives

    # zipshp arm: shapefile pair zipped with a decoy member, selected
    # by zip_path (exercises sidecar staging + member selection)
    fields = [("key", "N", 12, 0), ("seg", "C", 12, 0)]
    write_point_shapefile(
        os.path.join(d, "pts"),
        [
            (float(r.c_acctbal), (r.c_custkey % 100) / 10.0,
             int(r.c_custkey), r.c_mktsegment)
            for r in sample(6)
        ],
        fields,
    )
    with _zf.ZipFile(os.path.join(d, "pts.zip"), "w") as z:
        for ext in (".shp", ".dbf", ".shx"):
            p = os.path.join(d, "pts" + ext)
            if os.path.exists(p):
                z.write(p, "pts" + ext)
        z.writestr("README.txt", "decoy member: dispatch must ignore this")
    # kmz arm
    write_kml_points(
        os.path.join(d, "doc.kml"),
        [
            (r.c_mktsegment, float(r.c_acctbal), (r.c_custkey % 100) / 10.0,
             int(r.c_custkey))
            for r in sample(7)
        ],
        ["key"],
    )
    with _zf.ZipFile(os.path.join(d, "pts.kmz"), "w") as z:
        z.write(os.path.join(d, "doc.kml"), "doc.kml")
    # seq arm (no archive: the splittable scale path)
    write_geojson_seq(
        os.path.join(d, "pts.geojsonl"),
        [
            ((r.c_custkey % 100) / 10.0, (r.c_custkey % 73) / 7.0,
             int(r.c_custkey), r.c_mktsegment, float(r.c_acctbal))
            for r in sample(8)
        ],
        ["key", "seg", "bal"],
    )
    # gz arm
    write_geojson(
        os.path.join(d, "pts.geojson"),
        [
            ((r.c_custkey % 100) / 10.0, (r.c_custkey % 73) / 7.0,
             int(r.c_custkey), r.c_mktsegment, float(r.c_acctbal))
            for r in sample(9)
        ],
        ["key", "seg", "bal"],
    )
    with open(os.path.join(d, "pts.geojson"), "rb") as src, _gz.open(
        os.path.join(d, "pts.geojson.gz"), "wb"
    ) as dst:
        dst.write(src.read())
    os.remove(os.path.join(d, "pts.geojson"))
    # fgb arm
    from pg_datalake_spark.sources.fgb import write_fgb_points

    write_fgb_points(
        os.path.join(d, "pts.fgb"),
        [
            (float(r.c_acctbal), (r.c_custkey % 100) / 10.0,
             int(r.c_custkey), r.c_mktsegment)
            for r in sample(10)
        ],
        [("key", "long"), ("seg", "string")],
    )

    def cents(col):
        return F.sum(F.round(col * 100).cast("long")).cast("long")

    zipshp = (
        read_gdal(spark, os.path.join(d, "pts.zip"), zip_path="pts.shp")
        .groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            F.count("*").alias("n"),
            F.sum("key").cast("long").alias("key_sum"),
            cents(F.col("x")).alias("bal_cents"),
        )
        .select(F.lit("zipshp").alias("src"), "*")
    )
    kmz = (
        read_gdal(spark, os.path.join(d, "pts.kmz"))
        .groupBy(F.col("name").alias("c_mktsegment"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("key").cast("long")).cast("long").alias("key_sum"),
            cents(F.col("x")).alias("bal_cents"),
        )
        .select(F.lit("kmz").alias("src"), "*")
    )
    seq = (
        read_gdal(spark, os.path.join(d, "pts.geojsonl"))
        .groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("key").cast("long")).cast("long").alias("key_sum"),
            cents(F.col("bal")).alias("bal_cents"),
        )
        .select(F.lit("seq").alias("src"), "*")
    )
    gz = (
        read_gdal(spark, os.path.join(d, "pts.geojson.gz"))
        .groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("key").cast("long")).cast("long").alias("key_sum"),
            cents(F.col("bal")).alias("bal_cents"),
        )
        .select(F.lit("gz").alias("src"), "*")
    )
    fgb_arm = (
        read_gdal(spark, os.path.join(d, "pts.fgb"))
        .groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            F.count("*").alias("n"),
            F.sum("key").cast("long").alias("key_sum"),
            cents(F.col("x")).alias("bal_cents"),
        )
        .select(F.lit("fgb").alias("src"), "*")
    )
    return (
        zipshp.unionByName(kmz).unionByName(seq).unionByName(gz)
        .unionByName(fgb_arm)
    )


@register(
    "src10_geotiff",
    oracle="""
    WITH px AS (
      SELECT gx.generate_series AS x, gy.generate_series AS y
      FROM generate_series(0, 63) gx, generate_series(0, 47) gy
    ), v AS (
      SELECT k.kind AS kind, b.band AS band, x, y,
             (x * 31 + y * 17 + b.band * 7) % 997 AS val
      FROM px, (VALUES (0), (1)) b(band),
           (VALUES ('deflate'), ('raw'), ('cog')) k(kind)
    ), ov AS (
      -- level-1 overview: pixel (x,y) decimates full-res (2x,2y) and
      -- the geo transform carries the doubled pixel scale
      SELECT 'cogov' AS kind, b.band AS band, x, y,
             ((2 * x) * 31 + (2 * y) * 17 + b.band * 7) % 997 AS val,
             100.0 + x * 1.0 AS gx, 50.0 - y * 0.5 AS gy
      FROM (SELECT gx.generate_series AS x, gy.generate_series AS y
            FROM generate_series(0, 31) gx, generate_series(0, 23) gy) q,
           (VALUES (0), (1)) b(band)
    )
    SELECT kind || '|' || CAST(band AS VARCHAR) AS k,
           count(*) AS n,
           CAST(sum(val) AS BIGINT) AS val_sum,
           CAST(sum(CAST(round((100.0 + x * 0.5) * 100) AS BIGINT)
                    + CAST(round((50.0 - y * 0.25) * 100) AS BIGINT))
                AS BIGINT) AS geo_cents
    FROM v
    GROUP BY kind, band
    UNION ALL
    SELECT kind || '|' || CAST(band AS VARCHAR) AS k,
           count(*) AS n,
           CAST(sum(val) AS BIGINT) AS val_sum,
           CAST(sum(CAST(round(gx * 100) AS BIGINT)
                    + CAST(round(gy * 100) AS BIGINT)) AS BIGINT) AS geo_cents
    FROM ov
    GROUP BY kind, band
    """,
)
def src10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoTIFF raster minimum slice (r11; sources/geotiff.py) — the
    one documented GDAL format family previously scoped out
    (docs/file-formats-reference.md:96-138 raster row). A planted
    2-band 64×48 uint16 raster (value = (31x+17y+7b) mod 997) is
    written twice — uncompressed and DEFLATE — with real
    georeferencing tags (ModelPixelScale (0.5, 0.25), tiepoint at
    (100, 50)), then read back long-form through the chunk-partitioned
    reader (one Spark task per strip/tile; the driver parses only the
    IFD chain). A third copy is the COG shape — tiled 32×16 + LZW + a
    chained level-1 overview — read at full resolution AND at the
    overview level (decimated values, doubled pixel scale).
    Aggregates per (file, band): pixel count, value sum, and the
    geo-transform checked as exact integer cents of geo_x + geo_y.
    DuckDB recomputes everything from generate_series, never seeing
    TIFF bytes."""
    import numpy as np

    from pg_datalake_spark.sources.geotiff import read_geotiff, write_geotiff

    d = tempfile.mkdtemp(prefix="src10_")
    ys, xs, bs = np.indices((48, 64, 2))
    arr = ((xs * 31 + ys * 17 + bs * 7) % 997).astype(np.uint16)
    for kind, comp in (("raw", "none"), ("deflate", "deflate")):
        write_geotiff(
            os.path.join(d, f"{kind}.tif"),
            arr,
            compression=comp,
            pixel_scale=(0.5, 0.25),
            tiepoint=(100.0, 50.0),
        )
    # the COG shape: tiled + LZW + a chained level-1 overview IFD
    write_geotiff(
        os.path.join(d, "cog.tif"),
        arr,
        tile=(32, 16),
        compression="lzw",
        pixel_scale=(0.5, 0.25),
        tiepoint=(100.0, 50.0),
        overviews=[2],
    )
    px = read_geotiff(spark, os.path.join(d, "*.tif"))
    ov = read_geotiff(spark, os.path.join(d, "cog.tif"), level=1)

    def agg(df, kind):
        return df.groupBy(
            F.concat(kind, F.lit("|"), F.col("band").cast("string")).alias("k")
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("long")).alias("val_sum"),
            F.sum(
                F.round(F.col("geo_x") * 100).cast("long")
                + F.round(F.col("geo_y") * 100).cast("long")
            ).alias("geo_cents"),
        )

    full = agg(px, F.regexp_extract(F.col("path"), r"([a-z]+)\.tif$", 1))
    return full.unionByName(agg(ov, F.lit("cogov")))


@register(
    "src11_cad_mapinfo",
    oracle="""
    SELECT 'mif' AS src, c_mktsegment, count(*) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_custkey % 20 = 11 GROUP BY c_mktsegment
    UNION ALL
    SELECT 'dxf' AS src, c_mktsegment, count(*) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_custkey % 20 = 12 GROUP BY c_mktsegment
    """,
)
def src11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapInfo MIF/MID + AutoCAD DXF import analogs (r12;
    sources/geo_files.read_mapinfo / read_dxf — the two text halves of
    the formerly scoped-out CAD/MapInfo tail). Customer-derived POINT
    features are written to a .mif/.mid pair (typed COLUMNS, comma
    delimiter) and a .dxf ENTITIES section (one layer per market
    segment, the custkey carried in y), read back through the
    executor-side parsers and aggregated; DuckDB recomputes both
    splits from the source parquet, never seeing the text formats.
    Balances hash as exact CENTS. Reference:
    pg_lake_engine/src/pgduck/gdal.c (MITAB/DXF drivers),
    docs/file-formats-reference.md:96-138."""
    from pg_datalake_spark.sources.geo_files import read_dxf, read_mapinfo

    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    d = tempfile.mkdtemp(prefix="src11_")

    def sample(mod_val: int) -> list:
        return (
            cust.filter(F.col("c_custkey") % 20 == mod_val)
            .select("c_acctbal", "c_custkey", "c_mktsegment")
            .collect()
        )  # fixture-sized sample (|customer|/20 rows), builds the files

    mif_rows = sample(11)
    mif = os.path.join(d, "pts.mif")
    with open(mif, "w") as fh:
        fh.write(
            'VERSION 300\nCHARSET "Neutral"\nDELIMITER ","\n'
            "COLUMNS 3\n  key Integer\n  seg Char(12)\n  bal Float\nDATA\n"
        )
        for r in mif_rows:
            fh.write(f"POINT {float(r.c_acctbal)} "
                     f"{(r.c_custkey % 100) / 10.0}\n")
    with open(os.path.join(d, "pts.mid"), "w") as fh:
        for r in mif_rows:
            fh.write(f"{int(r.c_custkey)},{r.c_mktsegment},"
                     f"{float(r.c_acctbal)}\n")

    dxf_rows = sample(12)
    dxf = os.path.join(d, "pts.dxf")
    with open(dxf, "w") as fh:
        fh.write("0\nSECTION\n2\nENTITIES\n")
        for r in dxf_rows:
            fh.write(
                f"0\nPOINT\n8\n{r.c_mktsegment}\n"
                f"10\n{float(r.c_acctbal)}\n20\n{int(r.c_custkey)}\n"
            )
        fh.write("0\nENDSEC\n0\nEOF\n")

    mif_arm = (
        read_mapinfo(spark, mif)
        .groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            F.count("*").alias("n"),
            F.sum("key").cast("long").alias("key_sum"),
            F.sum(F.round(F.col("bal") * 100).cast("long"))
            .cast("long")
            .alias("bal_cents"),
        )
        .select(F.lit("mif").alias("src"), "*")
    )
    dxf_arm = (
        read_dxf(spark, dxf)
        .groupBy(F.col("layer").alias("c_mktsegment"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("y").cast("long")).cast("long").alias("key_sum"),
            F.sum(F.round(F.col("x") * 100).cast("long"))
            .cast("long")
            .alias("bal_cents"),
        )
        .select(F.lit("dxf").alias("src"), "*")
    )
    return mif_arm.unionByName(dxf_arm)
