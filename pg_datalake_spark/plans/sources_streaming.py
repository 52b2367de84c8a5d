"""Source/format and streaming queries for the correctness gate."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.plans.registry import ORACLES, QUERIES, register
from pg_datalake_spark.sources import copy_to, read_files
from pg_datalake_spark.streaming import incremental_file_ingest, windowed_event_counts

_SRC_BASE_SQL = """
    SELECT 'csv' AS src, l_returnflag AS k, count(*) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS c1,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS c2
    FROM lineitem
    GROUP BY l_returnflag
    UNION ALL
    SELECT 'json' AS src, o_orderstatus AS k, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c1,
           CAST(NULL AS BIGINT) AS c2
    FROM orders
    GROUP BY o_orderstatus
    UNION ALL
    SELECT 'log' AS src, event_type AS k, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c1,
           CAST(NULL AS BIGINT) AS c2
    FROM events WHERE event_id <= 2000
    GROUP BY event_type
    """


@register(
    "src01_src02_src03_src04_src05_src06_src07_src08_src09_src10_src11_file_roundtrips",
    oracle=lambda: _SRC_BASE_SQL
    + f"""
    UNION ALL
    SELECT 'hf' AS src, split || '|' || lang AS k, n,
           CAST(chars AS BIGINT) AS c1, CAST(NULL AS BIGINT) AS c2
    FROM ({ORACLES["src04_hf_dataset"]}) hf_arm
    UNION ALL
    SELECT 'geo' AS src, src || '|' || c_mktsegment AS k, n,
           key_sum AS c1, bal_cents AS c2
    FROM ({ORACLES["src05_geo_formats"]}) geo_arm
    UNION ALL
    SELECT 'office' AS src, src || '|' || c_mktsegment AS k, n,
           key_sum AS c1, bal_cents AS c2
    FROM ({ORACLES["src06_office_kml"]}) office_arm
    UNION ALL
    SELECT 'geojson' AS src, c_mktsegment AS k, n,
           key_sum AS c1, bal_cents AS c2
    FROM ({ORACLES["src07_geojson"]}) geojson_arm
    UNION ALL
    SELECT 'gml' AS src, c_mktsegment AS k, n,
           key_sum AS c1, bal_cents AS c2
    FROM ({ORACLES["src08_gml"]}) gml_arm
    UNION ALL
    SELECT 'gdal' AS src, src || '|' || c_mktsegment AS k, n,
           key_sum AS c1, bal_cents AS c2
    FROM ({ORACLES["src09_gdal_dispatch"]}) gdal_arm
    UNION ALL
    SELECT 'raster' AS src, k, n,
           val_sum AS c1, geo_cents AS c2
    FROM ({ORACLES["src10_geotiff"]}) raster_arm
    UNION ALL
    SELECT 'cad' AS src, src || '|' || c_mktsegment AS k, n,
           key_sum AS c1, bal_cents AS c2
    FROM ({ORACLES["src11_cad_mapinfo"]}) cad_arm
    """,
)
def src01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-format roundtrips, tagged union of the former
    src01/src02/src03 rows (src03 folded in r6 to free a window slot;
    src04 hf:// + src05 shapefile/GeoPackage rotated in r9; src06
    XLSX/KML rotated in r10; src07/src08/src09 rotated in the r10
    tail):

    - ``csv``: COPY TO csv.gz → schema-inferred read back → aggregate;
    - ``json``: COPY TO ndjson → inferred read → aggregate;
    - ``log``: events rendered to space-delimited log lines, re-parsed
      by regex template into typed columns (the reference's
      s3-access-log path), aggregated;
    - ``hf``: huggingface-hub snapshot-cache layout read back through
      read_files("hf://…") (src04's feeder);
    - ``geo``: shapefile + GeoPackage fixtures read through the
      pure-Python codecs (src05's feeder);
    - ``office``: XLSX + KML fixtures read through the pure-Python
      SpreadsheetML / OGC-KML parsers (src06's feeder);
    - ``geojson``: Spark-native RFC 7946 FeatureCollection read
      (src07's feeder);
    - ``gml``: OGC GML 2/3.x ElementTree reader (src08's feeder);
    - ``gdal``: the format-'gdal' option dispatcher — zip_path'd
      shapefile, .kmz, GeoJSONSeq, .geojson.gz (src09's feeder);
    - ``raster``: GeoTIFF minimum slice — planted 2-band raster,
      raw + DEFLATE, strip-partitioned read with georeferencing
      checked as exact cents (src10's feeder, r11);
    - ``cad``: MapInfo MIF/MID + AutoCAD DXF text formats, the
      formerly scoped-out CAD/MapInfo tail (src11's feeder, r12).

    The oracle aggregates the original parquet, so export + dialect /
    type inference must be lossless for the measured columns. Sums are
    exact integer cents on both sides (inference yields doubles)."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    csv_out = tempfile.mkdtemp(prefix="src01_") + "/lineitem.csv.gz"
    copy_to(t["lineitem"], csv_out, fmt="csv", compression="gzip")
    csv_back = read_files(spark, csv_out, fmt="csv")
    csv_arm = csv_back.groupBy(F.col("l_returnflag").alias("k")).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).cast("long").alias("c1"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("c2"),
    ).select(F.lit("csv").alias("src"), "k", "n", "c1", "c2")

    json_out = tempfile.mkdtemp(prefix="src02_") + "/orders.json"
    copy_to(t["orders"].select("o_orderstatus", "o_totalprice"), json_out, fmt="json")
    json_back = read_files(spark, json_out, fmt="json")
    json_arm = json_back.groupBy(F.col("o_orderstatus").alias("k")).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("c1"),
    ).select(
        F.lit("json").alias("src"), "k", "n", "c1", F.lit(None).cast("long").alias("c2")
    )
    log_arm = src03(spark, sf_dir).select(
        F.lit("log").alias("src"),
        F.col("event_type").alias("k"),
        "n",
        F.col("value_cents").alias("c1"),
        F.lit(None).cast("long").alias("c2"),
    )
    hf_arm = QUERIES["src04_hf_dataset"](spark, sf_dir).select(
        F.lit("hf").alias("src"),
        F.concat(F.col("split"), F.lit("|"), F.col("lang")).alias("k"),
        "n",
        F.col("chars").cast("long").alias("c1"),
        F.lit(None).cast("long").alias("c2"),
    )
    geo = QUERIES["src05_geo_formats"](spark, sf_dir)
    geo_arm = geo.select(
        F.lit("geo").alias("srcx"),
        F.concat(F.col("src"), F.lit("|"), F.col("c_mktsegment")).alias("k"),
        "n",
        F.col("key_sum").alias("c1"),
        F.col("bal_cents").alias("c2"),
    ).withColumnRenamed("srcx", "src")
    office = QUERIES["src06_office_kml"](spark, sf_dir)
    office_arm = office.select(
        F.lit("office").alias("srcx"),
        F.concat(F.col("src"), F.lit("|"), F.col("c_mktsegment")).alias("k"),
        "n",
        F.col("key_sum").alias("c1"),
        F.col("bal_cents").alias("c2"),
    ).withColumnRenamed("srcx", "src")
    geojson_arm = QUERIES["src07_geojson"](spark, sf_dir).select(
        F.lit("geojson").alias("src"),
        F.col("c_mktsegment").alias("k"),
        "n",
        F.col("key_sum").alias("c1"),
        F.col("bal_cents").alias("c2"),
    )
    gml_arm = QUERIES["src08_gml"](spark, sf_dir).select(
        F.lit("gml").alias("src"),
        F.col("c_mktsegment").alias("k"),
        "n",
        F.col("key_sum").alias("c1"),
        F.col("bal_cents").alias("c2"),
    )
    raster_arm = QUERIES["src10_geotiff"](spark, sf_dir).select(
        F.lit("raster").alias("src"),
        "k",
        "n",
        F.col("val_sum").alias("c1"),
        F.col("geo_cents").alias("c2"),
    )
    gdal_arm = QUERIES["src09_gdal_dispatch"](spark, sf_dir).select(
        F.lit("gdal").alias("srcx"),
        F.concat(F.col("src"), F.lit("|"), F.col("c_mktsegment")).alias("k"),
        "n",
        F.col("key_sum").alias("c1"),
        F.col("bal_cents").alias("c2"),
    ).withColumnRenamed("srcx", "src")
    cad_arm = QUERIES["src11_cad_mapinfo"](spark, sf_dir).select(
        F.lit("cad").alias("srcx"),
        F.concat(F.col("src"), F.lit("|"), F.col("c_mktsegment")).alias("k"),
        "n",
        F.col("key_sum").alias("c1"),
        F.col("bal_cents").alias("c2"),
    ).withColumnRenamed("srcx", "src")
    return (
        csv_arm.unionByName(json_arm)
        .unionByName(log_arm)
        .unionByName(hf_arm)
        .unionByName(geo_arm)
        .unionByName(office_arm)
        .unionByName(geojson_arm)
        .unionByName(gml_arm)
        .unionByName(gdal_arm)
        .unionByName(raster_arm)
        .unionByName(cad_arm)
    )


@register(
    "st01_incremental_ingest",
    oracle="""
    SELECT count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    """,
)
def st01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once incremental file ingestion (Structured Streaming
    file source, Trigger.AvailableNow + checkpoint) into a staging dir;
    the aggregate over ingested data must equal the source. This is the
    pg_incremental contract (SURVEY §2.10) on Spark-native machinery."""
    import os
    import shutil

    load_tables(spark, sf_dir, ["events"])
    stage = tempfile.mkdtemp(prefix="st01_")
    landing = os.path.join(stage, "landing")  # file streams need a dir source
    os.makedirs(landing)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(landing, "events.parquet"))
    sink_dir = os.path.join(stage, "sink")
    ckpt = os.path.join(stage, "ckpt")
    src_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def sink(df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(sink_dir)

    incremental_file_ingest(spark, landing, src_schema, ckpt, sink, fmt="parquet")
    ingested = spark.read.parquet(sink_dir)
    # raw nanos → seconds value column unaffected; aggregate only typed cols
    # exact decimal sum: double accumulation order differs between
    # engines (and between runs), decimal cents hash identically
    return ingested.agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


_HOURLY_ROLLUP_SQL = """
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """


def st02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (the same code path drives the
    watermarked streaming version; on a batch frame the watermark is a
    no-op)."""
    t = load_tables(spark, sf_dir, ["events"])
    out = windowed_event_counts(t["events"], window="1 hour", group_cols=["event_type"])
    # values are exact cents, so the true sum is a cent multiple;
    # round(2) collapses the engines' differing accumulation-order
    # noise (~1e-9) onto the same double
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    )


def src03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Templated log-format scan (the reference's s3-access-log path):
    events rendered to space-delimited log lines, re-parsed by regex
    template into typed columns, aggregated — must equal the original.
    Feeds the ``log`` arm of src01_…_src09_file_roundtrips (merged
    r6); sums are exact integer cents so the merged row hash-matches."""
    from pg_datalake_spark.sources.readers import read_log

    t = load_tables(spark, sf_dir, ["events"])
    logs = tempfile.mkdtemp(prefix="src03_") + "/log"
    (
        t["events"]
        .filter(F.col("event_id") <= 2000)
        .select(
            F.concat_ws(
                " ",
                F.col("event_id"),
                F.col("user_id"),
                F.col("event_type"),
                F.format_number(F.col("value"), 6),
            ).alias("value")
        )
        .coalesce(1)
        .write.text(logs)
    )
    parsed = read_log(
        spark,
        logs,
        r"^(\d+) (\d+) (\w+) ([\d.,]+)$",
        [
            ("event_id", "long"),
            ("user_id", "long"),
            ("event_type", "string"),
            ("value_str", "string"),
        ],
    )
    return (
        parsed.withColumn("value", F.regexp_replace("value_str", ",", "").cast("double"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long")
            .alias("value_cents"),
        )
    )


@register(
    "st03_stateful_counts",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def st03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user running counters
    via applyInPandasWithState, drained to completion — final state
    must equal the batch aggregate."""
    import os
    import shutil

    from pg_datalake_spark.streaming.ingest import stateful_user_counts

    load_tables(spark, sf_dir, ["events"])
    stage = tempfile.mkdtemp(prefix="st03_")
    landing = os.path.join(stage, "landing")
    os.makedirs(landing)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(landing, "events.parquet"))
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    out = stateful_user_counts(spark, landing, schema, os.path.join(stage, "ckpt"))
    # state accumulates doubles batch-by-batch; round(2) makes the
    # cent-valued sums hash identically to the oracle's
    return out.select("user_id", "n_events", F.round("total_value", 2).alias("total_value"))


def st04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous aggregate: hourly rollup LakeTable loaded from the
    first 20 days of events, then incrementally refreshed with the
    rest via additive MERGE — the final state must equal
    re-aggregating all raw events (the oracle does exactly that)."""
    from pg_datalake_spark.streaming.rollup import create_rollup, refresh_rollup

    t = load_tables(spark, sf_dir, ["events"])
    cutoff = F.expr("TIMESTAMP_NTZ '2024-01-21 00:00:00'")
    rollup = create_rollup(spark, tempfile.mkdtemp(prefix="st04_") + "/rollup")
    refresh_rollup(rollup, t["events"].filter(F.col("ts") < cutoff))
    refresh_rollup(rollup, t["events"].filter(F.col("ts") >= cutoff))
    return rollup.scan().select(
        "window_start",
        "event_type",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    )


_SESSION_SQL = """
    WITH gaps AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id < 50
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id,
           CAST(epoch_us(min(ts)) AS BIGINT) AS session_start,
           CAST(epoch_us(max(ts)) + 1800000000 AS BIGINT) AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM sessions GROUP BY user_id, session_id
    """


def st06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window (the streaming sessionization
    operator — identical code path under readStream with a watermark;
    batch here so the oracle can replay it): sessions close after a
    30-minute silence, window.end = last event + gap. The oracle
    states the same sessions via the gaps-and-islands formulation with
    Spark's >=-gap boundary semantics; start/end compare as epoch µs."""
    t = load_tables(spark, sf_dir, ["events"])
    sw = F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
    return (
        t["events"]
        .filter(F.col("user_id") < 50)
        .groupBy(sw, "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start"),
            F.unix_micros(F.col("session_window.end")).alias("session_end"),
            "n_events",
            "value_cents",
        )
    )


@register(
    "st02_st04_st06_rollup_sessions",
    oracle=f"""
    SELECT 'windowed' AS arm, * FROM ({_HOURLY_ROLLUP_SQL}) w_arm
    UNION ALL BY NAME
    SELECT 'rollup' AS arm, * FROM ({_HOURLY_ROLLUP_SQL}) r_arm
    UNION ALL BY NAME
    SELECT 'session' AS arm, * FROM ({_SESSION_SQL}) s_arm
    """,
)
def st02_st04_st06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (st02), the continuous-rollup
    LakeTable with incremental MERGE refresh (st04), and native
    session_window sessionization (st06, folded in r6) in one driver
    slot — the three windowed-aggregation code paths Structured
    Streaming runs (identical plans under readStream + watermark);
    batch here so the oracle can replay them. NULL-padded by-name
    union: the hourly arms carry (window_start, event_type,
    total_value), the session arm (user_id, session_start,
    session_end, value_cents); n_events is shared."""
    windowed = st02(spark, sf_dir).select(F.lit("windowed").alias("arm"), "*")
    rollup = st04(spark, sf_dir).select(F.lit("rollup").alias("arm"), "*")
    session = st06(spark, sf_dir).select(F.lit("session").alias("arm"), "*")
    return windowed.unionByName(rollup).unionByName(
        session, allowMissingColumns=True
    )
