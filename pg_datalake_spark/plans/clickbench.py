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


# ===========================================================================
# Tier 2 (round 7): the regex/URL-parse, segmentation, and wide-top-N
# families from the reference's ClickBench port
# (pg_lake_benchmark/pg_lake_benchmark--3.0.sql:9-65), mapped to the
# events/documents schema.
# ===========================================================================


@register(
    "cb11_regex_extract_bands",
    oracle=r"""
    SELECT CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT) // 10 AS k_band,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    WHERE regexp_matches(props, '\d')
    GROUP BY 1
    """,
)
def cb11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench URL-parse family: a raw REGEXP_EXTRACT over the
    semi-structured payload string (no JSON reader — the regex runs in
    the scan's codegen stage), banded and aggregated."""
    t = load_tables(spark, sf_dir, ["events"])
    k = F.regexp_extract("props", r"(\d+)", 1)
    return (
        t["events"]
        .filter(k != "")
        .groupBy(F.floor(k.cast("long") / 10).alias("k_band"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )


@register(
    "cb12_host_extract",
    oracle=r"""
    SELECT CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 5 AS host_band,
           lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def cb12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench domain-extract family: pull the host id out of the
    source identifier with a regex, cross it with the language
    dimension — the canonical per-domain traffic rollup."""
    t = load_tables(spark, sf_dir, ["documents"])
    host = F.regexp_extract("source", r"(\d+)", 1).cast("long") % 5
    return (
        t["documents"]
        .groupBy(host.alias("host_band"), "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "cb13_device_segmentation",
    oracle="""
    SELECT CASE user_id % 3 WHEN 0 THEN 'mobile' WHEN 1 THEN 'desktop'
                            ELSE 'tablet' END AS device,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
             AS views,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             AS purchases,
           round(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                      AS DOUBLE)
                 / sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END), 6)
             AS conversion
    FROM events
    GROUP BY 1
    """,
)
def cb13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench isMobile segmentation: a derived device class (the
    events table carries no UA string, so the class is a deterministic
    user hash — same contract as ClickBench's MobilePhone dimension),
    with per-segment audience and view→purchase conversion from ONE
    conditional aggregate."""
    t = load_tables(spark, sf_dir, ["events"])
    device = (
        F.when(F.col("user_id") % 3 == 0, "mobile")
        .when(F.col("user_id") % 3 == 1, "desktop")
        .otherwise("tablet")
    )
    views = F.sum((F.col("event_type") == "view").cast("int"))
    purchases = F.sum((F.col("event_type") == "purchase").cast("int"))
    return (
        t["events"]
        .groupBy(device.alias("device"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            views.alias("views"),
            purchases.alias("purchases"),
            F.round(purchases.cast("double") / views, 6).alias("conversion"),
        )
    )


@register(
    "cb14_top_words",
    oracle=r"""
    WITH words AS (
      SELECT lower(w) AS word
      FROM documents,
           unnest(regexp_extract_all(text, '[A-Za-z]{4,}')) AS t(w)
    )
    SELECT word, count(*) AS n
    FROM words GROUP BY word
    ORDER BY n DESC, word LIMIT 20
    """,
)
def cb14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench SearchPhrase family: tokenize free text with a regex
    (JVM regexp_extract_all — zero Python), explode, count, top-20
    with a word tiebreak so both engines rank identically. The count
    aggregate partially combines map-side before the single shuffle;
    the LIMIT is a TakeOrdered, never a global sort."""
    t = load_tables(spark, sf_dir, ["documents"])
    words = t["documents"].select(
        F.explode(F.expr(r"regexp_extract_all(text, '[A-Za-z]{4,}', 0)")).alias("w")
    )
    return (
        words.groupBy(F.lower(F.col("w")).alias("word"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


@register(
    "cb15_wide_topn_multi_agg",
    oracle="""
    SELECT user_id, event_type, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           CAST(epoch_us(max(ts)) AS BIGINT) AS last_ts_us
    FROM events
    GROUP BY 1, 2
    ORDER BY value_cents DESC, user_id, event_type
    LIMIT 30
    """,
)
def cb15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench wide-group top-N with mixed measures (count + money
    + latest timestamp) ordered by a computed measure: stays a
    TakeOrdered(30) over the hash aggregate."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("last_ts_us"),
        )
        .orderBy(F.desc("value_cents"), "user_id", "event_type")
        .limit(30)
    )


@register(
    "cb16_value_histogram",
    oracle="""
    SELECT CASE WHEN value < 0.0 THEN CAST(0 AS BIGINT)
                WHEN value >= 20.0 THEN CAST(11 AS BIGINT)
                ELSE CAST(floor(value / 2.0) + 1 AS BIGINT)
           END AS bucket,
           count(*) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events WHERE event_type <> 'error'
    GROUP BY 1
    """,
)
def cb16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench histogram family: width_bucket banding over the
    measure column — one hash aggregate, bucket boundaries identical
    in both engines (Spark's built-in width_bucket matches PG/DuckDB
    semantics for finite bounds)."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .filter(F.col("event_type") != "error")
        .groupBy(
            F.width_bucket(F.col("value"), F.lit(0.0), F.lit(20.0), F.lit(10))
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


@register(
    "cb17_user_span",
    oracle="""
    SELECT user_id,
           CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS span_us,
           count(*) AS n
    FROM events
    GROUP BY user_id
    ORDER BY span_us DESC, user_id
    LIMIT 25
    """,
)
def cb17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench visit-duration family: per-user first→last activity
    span in exact integer microseconds (no float time arithmetic),
    top-25 longest."""
    t = load_tables(spark, sf_dir, ["events"])
    ts = F.col("ts").cast("timestamp")
    return (
        t["events"]
        .groupBy("user_id")
        .agg(
            (F.unix_micros(F.max(ts)) - F.unix_micros(F.min(ts))).alias("span_us"),
            F.count("*").alias("n"),
        )
        .orderBy(F.desc("span_us"), "user_id")
        .limit(25)
    )


@register(
    "cb18_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def cb18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench referrer-chain analog: the event-type transition
    matrix — lead() per user ordered by (ts, event_id) so concurrent
    events order identically in both engines, then one aggregate over
    the (from, to) pairs. The window shuffles once on user_id; the
    aggregate reuses the map-side combine."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["events"])
    win = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        "user_id",
        "event_type",
        F.lead("event_type").over(win).alias("next_type"),
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "cb19_rank_users_within_type",
    oracle="""
    WITH per AS (
      SELECT event_type, user_id, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, user_id, n, rk FROM (
      SELECT event_type, user_id, n,
             CAST(rank() OVER (PARTITION BY event_type
                               ORDER BY n DESC, user_id) AS INT) AS rk
      FROM per
    ) t WHERE rk <= 5
    """,
)
def cb19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench top-N-per-key family: rank users within each event
    type by activity — the window runs over the (type, user)
    AGGREGATE (|types|×|users| rows), never the raw fact table."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["events"])
    per = t["events"].groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    win = W.partitionBy("event_type").orderBy(F.desc("n"), "user_id")
    return (
        per.withColumn("rk", F.rank().over(win).cast("int"))
        .filter(F.col("rk") <= 5)
        .select("event_type", "user_id", "n", "rk")
    )


@register(
    "cb20_daily_audience_ratio",
    oracle="""
    SELECT date_trunc('day', ts) AS d,
           count(DISTINCT user_id) AS dau,
           count(DISTINCT CASE WHEN event_type = 'purchase'
                               THEN user_id END) AS buyers,
           round(CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                                          THEN user_id END) AS DOUBLE)
                 / count(DISTINCT user_id), 6) AS buyer_ratio
    FROM events
    GROUP BY 1
    """,
)
def cb20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench conditional-distinct family: daily active users vs
    daily buyers in one aggregate — the conditional COUNT(DISTINCT
    CASE...) expands to two distinct aggregates over the same shuffle
    (Spark plans multi-distinct with one Expand, not two scans)."""
    t = load_tables(spark, sf_dir, ["events"])
    buyers = F.countDistinct(
        F.when(F.col("event_type") == "purchase", F.col("user_id"))
    )
    return (
        t["events"]
        .groupBy(F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("d"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            buyers.alias("buyers"),
            F.round(buyers.cast("double") / F.countDistinct("user_id"), 6).alias(
                "buyer_ratio"
            ),
        )
    )


# ===========================================================================
# Tier 3 (round 7): the cheap-scan, phrase-regex, per-minute, longest-
# string, two-dim pair, derived-bucket, null-handling, tagged-union and
# decile families (30 of the reference's 43 ClickBench shapes —
# pg_lake_benchmark/pg_lake_benchmark--3.0.sql:9-65).
# ===========================================================================


@register(
    "cb21_global_scan_stats",
    oracle="""
    SELECT count(*) AS n,
           count(DISTINCT event_type) AS n_types,
           round(min(value), 2) AS min_v,
           round(max(value), 2) AS max_v,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / count(value) / 100, 6) AS avg_v
    FROM events
    """,
)
def cb21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench cheap-scan family (the Q0-tier full-table min/max/
    avg/count probes collapsed into one aggregate): the scan reads
    only the two referenced columns (ReadSchema-pruned)."""
    t = load_tables(spark, sf_dir, ["events"])
    return t["events"].agg(
        F.count("*").alias("n"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.min("value"), 2).alias("min_v"),
        F.round(F.max("value"), 2).alias("max_v"),
        F.round(
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / F.count("value") / 100,
            6,
        ).alias("avg_v"),
    )


@register(
    "cb22_phrase_regex_count",
    oracle=r"""
    SELECT event_type, count(*) AS n
    FROM events
    WHERE regexp_matches(props, '"k": [0-9]{2}$|"k": [0-9]{2}\}')
      AND NOT regexp_matches(event_type, '^(error|signup)$')
    GROUP BY event_type
    """,
)
def cb22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench phrase-match family: a positive and a negative
    regex over two columns, evaluated in the scan stage (JVM regexp —
    zero Python)."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .filter(
            F.col("props").rlike(r'"k": [0-9]{2}$|"k": [0-9]{2}\}')
            & ~F.col("event_type").rlike(r"^(error|signup)$")
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "cb23_per_minute_series",
    oracle="""
    SELECT date_trunc('minute', ts) AS m, count(*) AS n
    FROM events
    GROUP BY 1
    HAVING count(*) >= 3
    """,
)
def cb23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench fine-grained time series: per-minute counts with a
    HAVING floor — the bucket count is |minutes in range|, bounded by
    wall-clock span, not event volume."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy(F.date_trunc("minute", F.col("ts")).cast("timestamp_ntz").alias("m"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 3)
    )


@register(
    "cb24_longest_documents",
    oracle="""
    SELECT doc_id, length(text) AS n_chars_actual, lang
    FROM documents
    ORDER BY n_chars_actual DESC, doc_id
    LIMIT 10
    """,
)
def cb24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench longest-URL family: top-10 longest documents with a
    deterministic id tiebreak — a TakeOrdered over the scan, never a
    global sort."""
    t = load_tables(spark, sf_dir, ["documents"])
    return (
        t["documents"]
        .select("doc_id", F.length("text").alias("n_chars_actual"), "lang")
        .orderBy(F.desc("n_chars_actual"), "doc_id")
        .limit(10)
    )


@register(
    "cb25_pair_cardinality_topn",
    oracle="""
    SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_band,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    ORDER BY n DESC, user_id, k_band
    LIMIT 25
    """,
)
def cb25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench two-dimension pair family ((UserID, SearchPhrase)
    pairs → (user, k-band) here): wide-cardinality pair aggregate with
    a TakeOrdered top-N."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy(
            "user_id",
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_band"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "user_id", "k_band")
        .limit(25)
    )


@register(
    "cb26_lang_source_matrix",
    oracle="""
    SELECT lang, source, count(*) AS n,
           round(CAST(sum(CAST(n_chars AS DECIMAL(30,0))) AS DOUBLE)
                 / count(n_chars), 6) AS avg_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY n DESC, lang, source
    LIMIT 20
    """,
)
def cb26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench dimension-matrix family: (lang, source) counts +
    exact-decimal average, top-20."""
    t = load_tables(spark, sf_dir, ["documents"])
    return (
        t["documents"]
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("n_chars").cast("decimal(30,0)")).cast("double")
                / F.count("n_chars"),
                6,
            ).alias("avg_chars"),
        )
        .orderBy(F.desc("n"), "lang", "source")
        .limit(20)
    )


@register(
    "cb27_derived_bucket_sums",
    oracle="""
    SELECT CAST(floor(value / 2) * 2 AS BIGINT) AS v_bucket,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events WHERE value >= 0
    GROUP BY 1
    """,
)
def cb27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench derived-expression grouping: buckets computed from
    the measure itself (floor arithmetic — identical in both
    engines), grouped and summed in one pass."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .filter(F.col("value") >= 0)
        .groupBy(
            (F.floor(F.col("value") / 2) * 2).cast("long").alias("v_bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )


@register(
    "cb28_short_doc_audit",
    oracle="""
    SELECT count(*) AS n_docs,
           CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blank,
           CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_short,
           count(DISTINCT CASE WHEN n_chars < 100 THEN source END)
             AS n_short_sources
    FROM documents
    """,
)
def cb28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench empty/degenerate-value audit: blank and short
    documents plus the distinct sources producing them, one
    conditional aggregate."""
    t = load_tables(spark, sf_dir, ["documents"])
    return t["documents"].agg(
        F.count("*").alias("n_docs"),
        F.sum((F.length(F.trim(F.col("text"))) == 0).cast("int")).alias("n_blank"),
        F.sum((F.col("n_chars") < 100).cast("int")).alias("n_short"),
        F.countDistinct(
            F.when(F.col("n_chars") < 100, F.col("source"))
        ).alias("n_short_sources"),
    )


@register(
    "cb29_tagged_union_report",
    oracle="""
    SELECT 'all' AS segment, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    UNION ALL
    SELECT 'purchases' AS segment, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT 'heavy_users' AS segment, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events WHERE user_id IN (SELECT user_id FROM events
                                  GROUP BY user_id HAVING count(*) >= 80)
    """,
)
def cb29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench tagged-union report: three differently-filtered
    aggregates of the same fact unioned into one result — the
    heavy-user segment reaches the scan as an aggregate-then-semi-join,
    never a collected IN list."""
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"]
    agg = [
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long")
        .alias("value_cents"),
    ]
    heavy = (
        ev.groupBy("user_id").agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= 80)
        .select("user_id")
    )
    return (
        ev.agg(*agg).select(F.lit("all").alias("segment"), "n", "value_cents")
        .unionByName(
            ev.filter(F.col("event_type") == "purchase")
            .agg(*agg)
            .select(F.lit("purchases").alias("segment"), "n", "value_cents")
        )
        .unionByName(
            ev.join(heavy, "user_id", "left_semi")
            .agg(*agg)
            .select(F.lit("heavy_users").alias("segment"), "n", "value_cents")
        )
    )


@register(
    "cb30_user_deciles",
    oracle="""
    WITH per AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ),
    dec AS (
      SELECT user_id, n, ntile(10) OVER (ORDER BY n, user_id) AS decile
      FROM per
    )
    SELECT decile, count(*) AS n_users,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(min(n) AS BIGINT) AS min_n, CAST(max(n) AS BIGINT) AS max_n
    FROM dec GROUP BY decile
    """,
)
def cb30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench activity-decile family: NTILE(10) over the per-user
    aggregate (deterministic id tiebreak in the order), then per-decile
    stats. r13: even the per-user aggregate is |users| rows — billions
    on a 100 TB events table — so the global window is replaced by
    ``pgcompat.pg_distributed_ntile`` (range-partitioned row_number +
    broadcast prefix offsets; hash-identical closed-form tiles)."""
    from pg_datalake_spark.functions.pgcompat import pg_distributed_ntile

    t = load_tables(spark, sf_dir, ["events"])
    per = t["events"].groupBy("user_id").agg(F.count("*").alias("n"))
    dec = pg_distributed_ntile(per, 10, ["n", "user_id"], alias="decile")
    return dec.groupBy("decile").agg(
        F.count("*").alias("n_users"),
        F.sum("n").alias("n_events"),
        F.min("n").alias("min_n"),
        F.max("n").alias("max_n"),
    )


# ===========================================================================
# Tier 4 (round 7): the remaining 13 families — COMPLETES the
# reference's 43-shape ClickBench port
# (pg_lake_benchmark/pg_lake_benchmark--3.0.sql:9-65) on this schema.
# ===========================================================================


@register(
    "cb31_nonzero_share",
    oracle="""
    SELECT count(*) AS n_total,
           CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_campaign,
           round(CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
                               THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS share
    FROM events
    """,
)
def cb31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench AdvEngineID<>0 family: the share of traffic carrying
    a campaign marker — one conditional aggregate."""
    t = load_tables(spark, sf_dir, ["events"])
    is_c = (F.get_json_object("props", "$.k").cast("long") % 7 == 0).cast("int")
    return t["events"].agg(
        F.count("*").alias("n_total"),
        F.sum(is_c).alias("n_campaign"),
        F.round(F.sum(is_c).cast("double") / F.count("*"), 6).alias("share"),
    )


@register(
    "cb32_date_span",
    oracle="""
    SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS min_ts_us,
           CAST(epoch_us(max(ts)) AS BIGINT) AS max_ts_us,
           CAST(date_diff('day', min(ts), max(ts)) AS BIGINT) AS span_days
    FROM events
    """,
)
def cb32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench min/max EventDate family: dataset time range in
    exact integer microseconds + the day span."""
    t = load_tables(spark, sf_dir, ["events"])
    ts = F.col("ts").cast("timestamp")
    return t["events"].agg(
        F.unix_micros(F.min(ts)).alias("min_ts_us"),
        F.unix_micros(F.max(ts)).alias("max_ts_us"),
        F.datediff(F.max(ts).cast("date"), F.min(ts).cast("date"))
        .cast("long")
        .alias("span_days"),
    )


@register(
    "cb33_distinct_triples",
    oracle="""
    SELECT DISTINCT user_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_band
    FROM events
    ORDER BY user_id, event_type, k_band
    LIMIT 100
    """,
)
def cb33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench DISTINCT-triple family: distinct dimension
    combinations, ordered + limited deterministically."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .select(
            "user_id",
            "event_type",
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_band"),
        )
        .distinct()
        .orderBy("user_id", "event_type", "k_band")
        .limit(100)
    )


@register(
    "cb34_first_events",
    oracle="""
    SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, user_id, event_type
    FROM events
    ORDER BY ts, event_id
    LIMIT 50
    """,
)
def cb34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench ORDER BY EventTime LIMIT family: the earliest events
    — a TakeOrdered(50) over the scan with an id tiebreak."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .orderBy("ts", "event_id")
        .limit(50)
        .select(
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "user_id",
            "event_type",
        )
    )


@register(
    "cb35_ten_minute_buckets",
    oracle="""
    SELECT CAST(floor(epoch_us(ts) / 600000000) AS BIGINT) AS bucket_10m,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    HAVING count(*) >= 5
    """,
)
def cb35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench 10-minute-interval traffic: integer epoch bucketing
    (no calendar function in the group key), HAVING floor."""
    t = load_tables(spark, sf_dir, ["events"])
    bucket = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / 600_000_000
    ).cast("long")
    return (
        t["events"]
        .groupBy(bucket.alias("bucket_10m"))
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
        .filter(F.col("n") >= 5)
    )


@register(
    "cb36_bitmask_bands",
    oracle="""
    SELECT CAST(user_id & 15 AS BIGINT) AS user_band,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def cb36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench IPNetworkID-mask family: bitwise AND in the group
    key — pure integer arithmetic, identical in both engines."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy(F.col("user_id").bitwiseAND(F.lit(15)).cast("long").alias("user_band"))
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "cb37_concat_group_key",
    oracle="""
    SELECT event_type || '#' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 5
                                     AS VARCHAR) AS grp,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1
    ORDER BY n DESC, grp
    LIMIT 15
    """,
)
def cb37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench computed-string group key: concatenated dimension
    key, top-15 — the group key is computed once in the aggregate,
    not re-evaluated per output."""
    t = load_tables(spark, sf_dir, ["events"])
    grp = F.concat(
        F.col("event_type"),
        F.lit("#"),
        (F.get_json_object("props", "$.k").cast("long") % 5).cast("string"),
    )
    return (
        t["events"]
        .groupBy(grp.alias("grp"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .orderBy(F.desc("n"), "grp")
        .limit(15)
    )


@register(
    "cb38_domain_family",
    oracle=r"""
    SELECT regexp_replace(source, '[0-9]+', '', 'g') AS family,
           count(*) AS n_docs,
           count(DISTINCT source) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def cb38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench URL-hierarchy family: collapse the source id to its
    non-numeric stem (the 'domain' of a URL path) and roll up."""
    t = load_tables(spark, sf_dir, ["documents"])
    return (
        t["documents"]
        .groupBy(F.regexp_replace("source", "[0-9]+", "").alias("family"))
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "cb39_hot_sources",
    oracle="""
    SELECT source, count(*) AS n,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    HAVING count(*) > 20
    ORDER BY n DESC, source
    """,
)
def cb39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench URLs-with-hits>N family: aggregate + HAVING + full
    ordered output (no LIMIT — the survivors are few by construction)."""
    t = load_tables(spark, sf_dir, ["documents"])
    return (
        t["documents"]
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("total_chars"))
        .filter(F.col("n") > 20)
        .orderBy(F.desc("n"), "source")
    )


@register(
    "cb40_avg_inter_event_gap",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           count(gap_us) AS n_gaps,
           CAST(sum(gap_us) // count(gap_us) AS BIGINT) AS avg_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
    ORDER BY avg_gap_us DESC, user_id
    LIMIT 20
    """,
)
def cb40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench inter-visit-gap family: per-user average gap between
    consecutive events in exact integer microseconds (lag over (ts,
    event_id) — deterministic under concurrent timestamps), top-20
    slowest cadences."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["events"])
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    win = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = t["events"].select(
        "user_id", (us - F.lag(us).over(win)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.expr("sum(gap_us) div count(gap_us)").alias("avg_gap_us"),
        )
        .orderBy(F.desc("avg_gap_us"), "user_id")
        .limit(20)
    )


@register(
    "cb41_hourly_type_share",
    oracle="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT hr, event_type, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY hr), 6) AS share
    FROM h
    """,
)
def cb41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench share-of-traffic family: each type's share of its
    hour — the window runs over the |hours|×|types| aggregate; the
    share divides exact integer counts."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["events"])
    h = (
        t["events"]
        .groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hr"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
    )
    return h.select(
        "hr",
        "event_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(W.partitionBy("hr")), 6
        ).alias("share"),
    )


@register(
    "cb42_band_type_rollup",
    oracle="""
    SELECT CAST(GROUPING(k_band) AS INT) AS g_band,
           CAST(GROUPING(event_type) AS INT) AS g_type,
           k_band, event_type,
           CAST(sum(n) AS BIGINT) AS n,
           CAST(sum(u) AS BIGINT) AS approx_users
    FROM (
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_band,
             event_type, count(*) AS n, count(DISTINCT user_id) AS u
      FROM events GROUP BY 1, 2
    ) pre
    GROUP BY ROLLUP(k_band, event_type)
    """,
)
def cb42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench totals-matrix family as a two-phase ROLLUP: the
    finest-level aggregate runs first (distinct users exact at that
    level), the rollup sums the pre-aggregate — Expand never sees
    fact rows. NOTE the rolled-up user count is additive-by-band
    (labeled approx_users), matching the oracle exactly."""
    t = load_tables(spark, sf_dir, ["events"])
    pre = (
        t["events"]
        .groupBy(
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_band"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("u"))
    )
    return pre.rollup("k_band", "event_type").agg(
        F.grouping("k_band").cast("int").alias("g_band"),
        F.grouping("event_type").cast("int").alias("g_type"),
        F.sum("n").alias("n"),
        F.sum("u").alias("approx_users"),
    ).select("g_band", "g_type", "k_band", "event_type", "n", "approx_users")


@register(
    "cb43_low_error_users",
    oracle="""
    WITH per AS (
      SELECT user_id, count(*) AS n,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
      FROM events GROUP BY user_id HAVING count(*) >= 20
    )
    SELECT count(*) AS n_clean_users,
           CAST(sum(n) AS BIGINT) AS n_events,
           round(CAST(sum(n_err) AS DOUBLE) / sum(n), 6) AS pooled_error_rate
    FROM per
    WHERE CAST(n_err AS DOUBLE) / n < 0.05
    """,
)
def cb43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench not-a-bot family: engaged users (≥20 events) whose
    error rate stays under 5 % — per-user conditional counts, rate
    filter on exact integer ratios, one summary row."""
    t = load_tables(spark, sf_dir, ["events"])
    per = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("event_type") == "error").cast("int")).alias("n_err"),
        )
        .filter(F.col("n") >= 20)
        .filter(F.col("n_err").cast("double") / F.col("n") < 0.05)
    )
    return per.agg(
        F.count("*").alias("n_clean_users"),
        F.sum("n").alias("n_events"),
        F.round(F.sum("n_err").cast("double") / F.sum("n"), 6).alias("pooled_error_rate"),
    )
