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


@register(
    "cb06_uniq_users_per_type",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(count(*) / count(DISTINCT user_id), 6) AS events_per_user
    FROM events
    GROUP BY event_type
    ORDER BY n_events DESC, event_type
    """,
)
def cb06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench COUNT(DISTINCT UserID) family: per-type audience
    size and intensity — one hash aggregate, distinct via partial
    aggregation (no row explosion)."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            "event_type", "n_events", "n_users",
            F.round(F.col("n_events") / F.col("n_users"), 6).alias("events_per_user"),
        )
        .orderBy(F.desc("n_events"), "event_type")
    )


@register(
    "cb07_like_filter_topn",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    WHERE props LIKE '%"k": 6%' AND event_type NOT LIKE '%error%'
    GROUP BY event_type
    ORDER BY n DESC, event_type
    LIMIT 10
    """,
)
def cb07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench URL-LIKE family: substring filter over the raw
    semi-structured column (pushed to the scan as a string predicate)
    + negated LIKE, then a top-N aggregate."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .filter(F.col("props").like('%"k": 6%') & ~F.col("event_type").like("%error%"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long")
            .alias("value_cents"),
        )
        .orderBy(F.desc("n"), "event_type")
        .limit(10)
    )


@register(
    "cb08_wide_group_topn",
    oracle="""
    SELECT user_id, event_type, date_trunc('day', ts) AS d, count(*) AS n
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY n DESC, user_id, event_type, d
    LIMIT 20
    """,
)
def cb08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench wide-cardinality GROUP BY + ORDER BY count LIMIT:
    the optimizer must keep this a TakeOrdered over the aggregate —
    never a global sort of all groups."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy(
            "user_id",
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("d"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "user_id", "event_type", "d")
        .limit(20)
    )


@register(
    "cb09_argmax_per_user",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id DESC) AS rk
      FROM events
    )
    SELECT user_id, event_type AS top_type, value AS top_value,
           CAST(epoch_us(ts) AS BIGINT) AS top_ts_us
    FROM ranked WHERE rk = 1 AND user_id < 200
    """,
)
def cb09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench argMax family: the event carrying each user's max
    value (ties broken on event_id so both engines pick the same row),
    as one window rank — no self-join back to the fact table."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["events"])
    win = W.partitionBy("user_id").orderBy(F.desc("value"), F.desc("event_id"))
    return (
        t["events"]
        .filter(F.col("user_id") < 200)
        .withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("top_type"),
            F.col("value").alias("top_value"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("top_ts_us"),
        )
    )


@register(
    "cb10_active_hours",
    oracle="""
    SELECT date_trunc('hour', ts) AS h, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    HAVING count(DISTINCT user_id) >= 15
    ORDER BY n_users DESC, h
    """,
)
def cb10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench time-histogram family: hourly distinct-user counts
    with a HAVING floor — aggregate-then-filter, bucket pruning stays
    on the aggregate side."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy(F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("h"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .filter(F.col("n_users") >= 15)
        .orderBy(F.desc("n_users"), "h")
    )
