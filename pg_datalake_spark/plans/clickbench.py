"""ClickBench-style event analytics (the reference's third benchmark
suite — pg_lake_benchmark/README.md:9-15) adapted to the events table:
hot-key top-N, per-entity distincts, time-series bucketing, and
quantile scans — the interactive-analytics query shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.plans.registry import register


@register(
    "cb01_top_users_by_events",
    oracle="""
    SELECT user_id, count(*) AS n, count(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    ORDER BY n DESC, user_id
    LIMIT 10
    """,
)
def cb01(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.countDistinct("event_type").alias("n_types"))
        .orderBy(F.desc("n"), "user_id")
        .limit(10)
    )


@register(
    "cb02_hourly_timeseries",
    oracle="""
    SELECT date_trunc('hour', ts) AS h,
           count(*) AS n,
           count(DISTINCT user_id) AS uniq_users,
           round(avg(value), 6) AS avg_value
    FROM events
    WHERE event_type IN ('view', 'click')
    GROUP BY 1
    """,
)
def cb02(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .filter(F.col("event_type").isin("view", "click"))
        .groupBy(F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("h"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("uniq_users"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


@register(
    "cb03_funnel_counts",
    oracle="""
    SELECT v.user_id,
           count(DISTINCT v.event_id) AS views,
           count(DISTINCT p.event_id) AS purchases
    FROM events v
    LEFT JOIN events p
      ON p.user_id = v.user_id AND p.event_type = 'purchase' AND p.ts > v.ts
    WHERE v.event_type = 'view'
    GROUP BY v.user_id
    HAVING count(DISTINCT p.event_id) > 0
    """,
)
def cb03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase funnel via a self-join on user + time ordering."""
    t = load_tables(spark, sf_dir, ["events"])
    v = t["events"].filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("v_id"), F.col("ts").alias("v_ts")
    )
    p = t["events"].filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    return (
        v.join(p, (F.col("p_user") == F.col("user_id")) & (F.col("p_ts") > F.col("v_ts")), "left")
        .groupBy("user_id")
        .agg(
            F.countDistinct("v_id").alias("views"),
            F.countDistinct("p_id").alias("purchases"),
        )
        .filter(F.col("purchases") > 0)
    )


@register(
    "cb04_value_quantiles_by_type",
    oracle="""
    SELECT event_type,
           percentile_cont(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
           percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS p95,
           percentile_cont(0.99) WITHIN GROUP (ORDER BY value) AS p99,
           max(value) AS mx
    FROM events
    GROUP BY event_type
    """,
)
def cb04(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
            F.expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
            F.expr("percentile_cont(0.99) WITHIN GROUP (ORDER BY value)").alias("p99"),
            F.max("value").alias("mx"),
        )
    )


@register(
    "cb05_json_prop_analysis",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_band,
           count(*) AS n, avg(value) AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def cb05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured scan: JSON property extraction in the hot path."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy(
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_band")
        )
        .agg(F.count("*").alias("n"), F.avg("value").alias("avg_value"))
    )
