"""Scalar-function coverage (SURVEY §2.8): the portable SQL surface.

Mirrors the reference's operator_pushdown test style (21 per-type files
asserting operator/function results — SURVEY §5 "deparse golden
tests"): each query sweeps a function family over real table columns
and must hash-match DuckDB. PG-semantic shims come from
pg_datalake_spark.functions.pgcompat.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.functions import (
    pg_array_agg,
    pg_date_bin,
    pg_date_trunc,
    pg_div,
    pg_dow,
    pg_epoch,
    pg_generate_series,
    pg_to_char,
)
from pg_datalake_spark.plans.registry import register


@register(
    "f01_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 2000.0)      AS abs_v,
           ceil(l_quantity / 7.0)             AS ceil_v,
           floor(l_quantity / 7.0)            AS floor_v,
           round(l_extendedprice / 3.0, 2)    AS round_v,
           trunc(l_extendedprice / 3.0)       AS trunc_v,
           sqrt(l_quantity)                   AS sqrt_v,
           round(cbrt(l_quantity), 6)         AS cbrt_v,
           round(exp(l_discount), 6)          AS exp_v,
           round(ln(l_extendedprice), 6)      AS ln_v,
           round(log10(l_extendedprice), 6)   AS log10_v,
           round(power(l_quantity, 2.0), 6)   AS pow_v,
           CAST(mod(CAST(l_quantity AS BIGINT), 7) AS BIGINT) AS mod_v,
           pi()                               AS pi_v,
           round(degrees(l_discount), 6)      AS deg_v,
           round(radians(l_quantity), 6)      AS rad_v,
           round(sin(l_discount), 6) AS sin_v, round(cos(l_discount), 6) AS cos_v,
           round(tan(l_discount), 6) AS tan_v, round(cot(l_discount + 1.0), 6) AS cot_v,
           round(asin(l_discount), 6) AS asin_v, round(acos(l_discount), 6) AS acos_v,
           round(atan(l_discount), 6) AS atan_v, round(atan2(l_discount, 2.0), 6) AS atan2_v,
           CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS sign_v
    FROM lineitem WHERE l_orderkey <= 100
    """,
)
def f01(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    q, p, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(p - 2000.0).alias("abs_v"),
            F.ceil(q / 7.0).cast("double").alias("ceil_v"),
            F.floor(q / 7.0).cast("double").alias("floor_v"),
            F.round(p / 3.0, 2).alias("round_v"),
            # PG/DuckDB trunc() truncates toward zero
            F.when(p / 3.0 >= 0, F.floor(p / 3.0))
            .otherwise(-F.floor(-(p / 3.0)))
            .cast("double")
            .alias("trunc_v"),
            F.sqrt(q).alias("sqrt_v"),
            # transcendental results are rounded to 6 decimals on BOTH
            # sides: JVM vs DuckDB libm differ in the last ulp, and the
            # driver's comparator hashes exact values
            F.round(F.cbrt(q), 6).alias("cbrt_v"),
            F.round(F.exp(d), 6).alias("exp_v"),
            F.round(F.log(p), 6).alias("ln_v"),
            F.round(F.log10(p), 6).alias("log10_v"),
            F.round(F.pow(q, 2.0), 6).alias("pow_v"),
            (q.cast("long") % 7).alias("mod_v"),
            F.lit(3.141592653589793).alias("pi_v"),
            F.round(F.degrees(d), 6).alias("deg_v"),
            F.round(F.radians(q), 6).alias("rad_v"),
            F.round(F.sin(d), 6).alias("sin_v"),
            F.round(F.cos(d), 6).alias("cos_v"),
            F.round(F.tan(d), 6).alias("tan_v"),
            F.round(F.cot(d + 1.0), 6).alias("cot_v"),
            F.round(F.asin(d), 6).alias("asin_v"),
            F.round(F.acos(d), 6).alias("acos_v"),
            F.round(F.atan(d), 6).alias("atan_v"),
            F.round(F.atan2(d, F.lit(2.0)), 6).alias("atan2_v"),
            F.signum(p - 30000.0).alias("sign_v"),
        )
    )


@register(
    "f02_string_functions",
    oracle="""
    SELECT c_custkey,
           length(c_name)                       AS len_v,
           CAST(bit_length(c_name) AS BIGINT)   AS bitlen_v,
           lower(c_name)                        AS lower_v,
           upper(c_name)                        AS upper_v,
           left(c_name, 4)                      AS left_v,
           right(c_name, 3)                     AS right_v,
           substr(c_name, 2, 5)                 AS substr_v,
           lpad(c_name, 15, '*')                AS lpad_v,
           rpad(c_name, 15, '*')                AS rpad_v,
           ltrim(c_name, 'C')                   AS ltrim_v,
           trim(c_name, 'C0#')                  AS btrim_v,
           replace(c_name, '#', '-')            AS replace_v,
           reverse(c_name)                      AS reverse_v,
           repeat('ab', CAST(c_custkey % 3 AS INT)) AS repeat_v,
           concat(c_name, '|', c_mktsegment)    AS concat_v,
           concat_ws('-', c_name, c_mktsegment) AS concatws_v,
           split_part(c_name, '#', 2)           AS splitpart_v,
           CAST(strpos(c_name, '#') AS BIGINT)  AS strpos_v,
           starts_with(c_name, 'Customer')      AS startswith_v,
           ascii(c_name)                        AS ascii_v,
           chr(CAST(65 + c_custkey % 26 AS INT)) AS chr_v,
           md5(c_name)                          AS md5_v,
           translate(c_name, '#C', '_K')        AS translate_v
    FROM customer WHERE c_custkey <= 50
    """,
)
def f02(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer"])
    n = F.col("c_name")
    return (
        t["customer"]
        .filter(F.col("c_custkey") <= 50)
        .select(
            "c_custkey",
            F.length(n).alias("len_v"),
            F.bit_length(n).cast("long").alias("bitlen_v"),
            F.lower(n).alias("lower_v"),
            F.upper(n).alias("upper_v"),
            # PG left/right take negative counts too; positive path here
            n.substr(F.lit(1), F.lit(4)).alias("left_v"),
            F.expr("right(c_name, 3)").alias("right_v"),
            F.substring(n, 2, 5).alias("substr_v"),
            F.lpad(n, 15, "*").alias("lpad_v"),
            F.rpad(n, 15, "*").alias("rpad_v"),
            F.expr("trim(LEADING 'C' FROM c_name)").alias("ltrim_v"),
            F.expr("trim(BOTH 'C0#' FROM c_name)").alias("btrim_v"),
            F.replace(n, F.lit("#"), F.lit("-")).alias("replace_v"),
            F.reverse(n).alias("reverse_v"),
            F.repeat(F.lit("ab"), (F.col("c_custkey") % 3).cast("int")).alias("repeat_v"),
            F.concat(n, F.lit("|"), F.col("c_mktsegment")).alias("concat_v"),
            F.concat_ws("-", n, F.col("c_mktsegment")).alias("concatws_v"),
            F.split_part(n, F.lit("#"), F.lit(2)).alias("splitpart_v"),
            F.instr(n, "#").cast("long").alias("strpos_v"),
            F.startswith(n, F.lit("Customer")).alias("startswith_v"),
            F.ascii(n).alias("ascii_v"),
            F.chr(F.lit(65) + F.col("c_custkey") % 26).alias("chr_v"),
            F.md5(n).alias("md5_v"),
            F.translate(n, "#C", "_K").alias("translate_v"),
        )
    )


@register(
    "f03_regex_functions",
    oracle="""
    SELECT p_partkey, p_name,
           regexp_matches(p_name, '^(red|blue)')          AS is_colored,
           regexp_replace(p_name, '[aeiou]', '_', 'g')    AS devoweled,
           regexp_extract(p_name, '([a-z]+)$', 1)         AS last_word,
           p_name LIKE '%bol%'                            AS like_v,
           p_name ILIKE 'RED%'                            AS ilike_v,
           p_name SIMILAR TO '(red|blue|hot) [a-z]+'      AS similar_v
    FROM part WHERE p_partkey <= 100
    """,
)
def f03(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["part"])
    n = F.col("p_name")
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            "p_name",
            n.rlike("^(red|blue)").alias("is_colored"),
            F.regexp_replace(n, "[aeiou]", "_").alias("devoweled"),
            F.regexp_extract(n, "([a-z]+)$", 1).alias("last_word"),
            n.like("%bol%").alias("like_v"),
            n.ilike("RED%").alias("ilike_v"),
            n.rlike("^(red|blue|hot) [a-z]+$").alias("similar_v"),
        )
    )


@register(
    "f04_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(date_part('year',    o_orderdate) AS BIGINT) AS y,
           CAST(date_part('quarter', o_orderdate) AS BIGINT) AS q,
           CAST(date_part('month',   o_orderdate) AS BIGINT) AS mon,
           CAST(date_part('day',     o_orderdate) AS BIGINT) AS d,
           CAST(date_part('hour',    o_orderdate) AS BIGINT) AS h,
           CAST(date_part('dow',     o_orderdate) AS BIGINT) AS dow,
           CAST(date_part('doy',     o_orderdate) AS BIGINT) AS doy,
           CAST(date_part('week',    o_orderdate) AS BIGINT) AS isoweek,
           date_part('epoch', o_orderdate)                   AS epoch_s,
           date_trunc('month', o_orderdate)  AS trunc_month,
           date_trunc('week',  o_orderdate)  AS trunc_week,
           o_orderdate + INTERVAL 3 DAY      AS plus_3d,
           o_orderdate - INTERVAL 90 MINUTE  AS minus_90m,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR)         AS as_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
    FROM orders WHERE o_orderkey <= 300
    """,
)
def f04(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    o = F.col("o_orderdate")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 300)
        .select(
            "o_orderkey",
            F.year(o).cast("long").alias("y"),
            F.quarter(o).cast("long").alias("q"),
            F.month(o).cast("long").alias("mon"),
            F.dayofmonth(o).cast("long").alias("d"),
            F.hour(o).cast("long").alias("h"),
            pg_dow(o).alias("dow"),
            F.dayofyear(o).cast("long").alias("doy"),
            F.weekofyear(o).cast("long").alias("isoweek"),
            pg_epoch(o).alias("epoch_s"),
            pg_date_trunc("month", o).alias("trunc_month"),
            pg_date_trunc("week", o).alias("trunc_week"),
            (o + F.expr("INTERVAL 3 DAY")).alias("plus_3d"),
            (o - F.expr("INTERVAL 90 MINUTE")).alias("minus_90m"),
            # stringified: DATE round-trips through pandas at different
            # datetime64 resolutions per engine; the string form is exact
            o.cast("date").cast("string").alias("as_date"),
            F.last_day(o.cast("date")).cast("string").alias("month_end"),
        )
    )


@register(
    "f05_tochar_datebin_series",
    oracle="""
    SELECT e.event_id,
           strftime(e.ts, '%Y-%m-%d %H:%M')                       AS ts_char,
           strftime(e.ts, '%d/%m/%Y')                             AS ts_dmy,
           time_bucket(INTERVAL 15 MINUTE, e.ts, TIMESTAMP '2024-01-01 00:00:00') AS bin_15m,
           time_bucket(INTERVAL 1 HOUR,    e.ts, TIMESTAMP '2024-01-01 00:00:00') AS bin_1h,
           g.n AS series_n
    FROM events e, LATERAL (SELECT unnest(generate_series(1, 3)) AS n) g
    WHERE e.event_id <= 200
    """,
)
def f05(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    e = t["events"].filter(F.col("event_id") <= 200)
    return e.select(
        "event_id",
        pg_to_char(F.col("ts"), "YYYY-MM-DD HH24:MI").alias("ts_char"),
        pg_to_char(F.col("ts"), "DD/MM/YYYY").alias("ts_dmy"),
        pg_date_bin(900, F.col("ts"), "2024-01-01 00:00:00").alias("bin_15m"),
        pg_date_bin(3600, F.col("ts"), "2024-01-01 00:00:00").alias("bin_1h"),
        F.explode(pg_generate_series(F.lit(1), F.lit(3))).alias("series_n"),
    )


@register(
    "f06_conditional_expressions",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000.0 THEN 'huge'
                WHEN o_totalprice > 100000.0 THEN 'big'
                ELSE 'small' END                          AS size_class,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN')   AS status2,
           greatest(o_totalprice, 150000.0)               AS at_least,
           least(o_totalprice, 150000.0)                  AS at_most,
           o_orderstatus IS DISTINCT FROM 'O'             AS not_open,
           (o_totalprice > 100000.0) IS FALSE             AS is_small,
           o_orderpriority IN ('1-URGENT', '2-HIGH')      AS is_priority,
           o_totalprice BETWEEN 50000.0 AND 100000.0      AS mid_band
    FROM orders WHERE o_orderkey <= 500
    """,
)
def f06(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    p = F.col("o_totalprice")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.when(p > 300000.0, "huge").when(p > 100000.0, "big").otherwise("small").alias(
                "size_class"
            ),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
                "status2"
            ),
            F.greatest(p, F.lit(150000.0)).alias("at_least"),
            F.least(p, F.lit(150000.0)).alias("at_most"),
            (~F.col("o_orderstatus").eqNullSafe("O")).alias("not_open"),
            (~(p > 100000.0)).alias("is_small"),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_priority"),
            p.between(50000.0, 100000.0).alias("mid_band"),
        )
    )


@register(
    "f07_array_functions",
    oracle="""
    WITH t AS (
      SELECT n_nationkey, array_agg(n_name ORDER BY n_name) AS names
      FROM nation GROUP BY n_regionkey, n_nationkey
    )
    SELECT n_nationkey,
           to_json(names)                              AS names,
           to_json(array_append(names, 'X'))           AS appended,
           to_json(array_prepend('A', names))          AS prepended,
           to_json(array_cat(names, ['Z1','Z2']))      AS catted,
           CAST(len(names) AS INT)             AS cardinality_v,
           names[1]                            AS first_elem,
           array_contains(names, 'NATION_3')   AS has_n3,
           to_json(list_sort(array_cat(names, ['AAA']))) AS sorted_v
    FROM t
    """,
)
def f07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions. Array-typed OUTPUT columns are serialized with
    to_json on both sides: the driver's comparator sorts raw column
    values and list cells are unhashable in pandas."""
    t = load_tables(spark, sf_dir, ["nation"])
    base = (
        t["nation"]
        .groupBy("n_regionkey", "n_nationkey")
        .agg(F.sort_array(F.collect_list("n_name")).alias("names"))
    )
    return base.select(
        "n_nationkey",
        F.to_json(F.col("names")).alias("names"),
        F.to_json(F.array_append(F.col("names"), F.lit("X"))).alias("appended"),
        F.to_json(F.array_prepend(F.col("names"), F.lit("A"))).alias("prepended"),
        F.to_json(F.concat(F.col("names"), F.array(F.lit("Z1"), F.lit("Z2")))).alias("catted"),
        F.size(F.col("names")).alias("cardinality_v"),
        F.element_at(F.col("names"), 1).alias("first_elem"),
        F.array_contains(F.col("names"), "NATION_3").alias("has_n3"),
        F.to_json(F.sort_array(F.concat(F.col("names"), F.array(F.lit("AAA"))))).alias(
            "sorted_v"
        ),
    )


@register(
    "f08_json_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           json_extract_string(props, '$.missing')           AS missing_v,
           props ->> '$.k'                                   AS k_text
    FROM events WHERE event_id <= 500
    """,
)
def f08(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .filter(F.col("event_id") <= 500)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
            F.get_json_object("props", "$.missing").alias("missing_v"),
            F.get_json_object("props", "$.k").alias("k_text"),
        )
    )


@register(
    "f09_casts_and_division",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS BIGINT)                        AS qty_int,
           CAST(l_quantity AS VARCHAR)                       AS qty_str,
           CAST(CAST(l_extendedprice AS DECIMAL(38,9)) AS VARCHAR) AS price_dec,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR)         AS ship_str,
           CAST(l_orderkey AS DOUBLE)                        AS key_dbl,
           CAST(trunc((CAST(l_quantity AS BIGINT) - 25) / 7.0) AS BIGINT) AS pgdiv_v,
           CAST(l_quantity AS BIGINT) % 7                    AS pgmod_v,
           CAST('123' AS BIGINT) + l_orderkey                AS parsed_int
    FROM lineitem WHERE l_orderkey <= 100
    """,
)
def f09(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    q = F.col("l_quantity")
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            q.cast("long").alias("qty_int"),
            # DuckDB renders whole doubles as "25.0"; Spark as "25.0" too
            q.cast("string").alias("qty_str"),
            # decimal rendered as string: pandas maps DuckDB decimals to
            # float64 but Spark decimals to Decimal objects — the string
            # form is dtype-stable through the driver's comparator
            F.col("l_extendedprice").cast("decimal(38,9)").cast("string").alias("price_dec"),
            F.col("l_shipdate").cast("date").cast("string").alias("ship_str"),
            F.col("l_orderkey").cast("double").alias("key_dbl"),
            pg_div(q.cast("long") - 25, F.lit(7)).alias("pgdiv_v"),
            (q.cast("long") % 7).alias("pgmod_v"),
            (F.lit("123").cast("long") + F.col("l_orderkey")).alias("parsed_int"),
        )
    )


@register(
    "f10_hash_encode",
    oracle="""
    SELECT c_custkey,
           md5(c_name)                              AS md5_v,
           sha256(c_name)                           AS sha256_v,
           to_base64(CAST(c_name AS BLOB))          AS b64_v,
           CAST(from_base64(to_base64(CAST(c_name AS BLOB))) AS VARCHAR) AS b64_roundtrip,
           lower(hex(CAST(c_name AS BLOB)))         AS hex_v,
           CAST(unhex(hex(CAST(c_name AS BLOB))) AS VARCHAR) AS hex_roundtrip
    FROM customer WHERE c_custkey <= 50
    """,
)
def f10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer"])
    n = F.col("c_name")
    return (
        t["customer"]
        .filter(F.col("c_custkey") <= 50)
        .select(
            "c_custkey",
            F.md5(n).alias("md5_v"),
            F.sha2(n, 256).alias("sha256_v"),
            F.base64(n.cast("binary")).alias("b64_v"),
            F.unbase64(F.base64(n.cast("binary"))).cast("string").alias("b64_roundtrip"),
            F.lower(F.hex(n)).alias("hex_v"),
            F.unhex(F.hex(n)).cast("string").alias("hex_roundtrip"),
        )
    )


@register(
    "f11_pg_date_trunc_boundaries",
    oracle="""
    SELECT o_orderkey,
           CAST(make_timestamp(CAST(CAST(floor((date_part('year', o_orderdate) - 1) / 1000) * 1000 AS BIGINT) + 1 AS BIGINT), 1, 1, 0, 0, 0.0) AS VARCHAR) AS trunc_millennium,
           CAST(make_timestamp(CAST(CAST(floor((date_part('year', o_orderdate) - 1) / 100) * 100 AS BIGINT) + 1 AS BIGINT), 1, 1, 0, 0, 0.0) AS VARCHAR)  AS trunc_century,
           make_timestamp(CAST(date_part('year', o_orderdate) - date_part('year', o_orderdate) % 10 AS BIGINT), 1, 1, 0, 0, 0.0)          AS trunc_decade,
           date_trunc('year', o_orderdate) AS trunc_year
    FROM orders WHERE o_orderkey <= 100
    """,
)
def f11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG millennium/century/decade boundaries (1999 → millennium 1001,
    century 1901, decade 1990) — the oracle computes PG's definition
    explicitly since DuckDB's own date_trunc uses different boundaries."""
    t = load_tables(spark, sf_dir, ["orders"])
    o = F.col("o_orderdate")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 100)
        .select(
            "o_orderkey",
            pg_date_trunc("millennium", o).cast("string").alias("trunc_millennium"),
            pg_date_trunc("century", o).cast("string").alias("trunc_century"),
            pg_date_trunc("decade", o).alias("trunc_decade"),
            pg_date_trunc("year", o).alias("trunc_year"),
        )
    )


@register(
    "f12_null_keeping_array_agg",
    oracle="""
    SELECT o_orderstatus,
           to_json(array_agg(v ORDER BY o_orderkey)) AS vals
    FROM (SELECT o_orderstatus, o_orderkey,
                 CASE WHEN o_totalprice > 200000.0 THEN NULL
                      ELSE o_orderpriority END AS v
          FROM orders WHERE o_orderkey <= 60) t
    GROUP BY o_orderstatus
    """,
)
def f12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG array_agg keeps NULL elements; Spark collect_list drops them —
    the struct-wrap shim preserves them (SURVEY §4.5.5)."""
    t = load_tables(spark, sf_dir, ["orders"])
    base = (
        t["orders"]
        .filter(F.col("o_orderkey") <= 60)
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.when(F.col("o_totalprice") > 200000.0, F.lit(None)).otherwise(
                F.col("o_orderpriority")
            ).alias("v"),
        )
        .repartition(1)  # deterministic ORDER BY inside agg needs one partition…
    )
    # …but the scalable PG-parity route is sortWithinPartitions + single
    # partition per group; for ordered array_agg semantics we sort first.
    base = base.sortWithinPartitions("o_orderkey")
    return base.groupBy("o_orderstatus").agg(
        F.to_json(pg_array_agg(F.col("v"))).alias("vals")
    )


@register(
    "f13_map_struct_ops",
    oracle="""
    SELECT n_nationkey,
           MAP {'nation': n_name, 'region': CAST(n_regionkey AS VARCHAR)}['nation'][1] AS map_get,
           CAST(cardinality(MAP {'nation': n_name, 'region': CAST(n_regionkey AS VARCHAR)}) AS INT) AS map_size,
           to_json(list_sort(map_keys(MAP {'nation': n_name, 'region': CAST(n_regionkey AS VARCHAR)}))) AS keys_sorted,
           struct_pack(name := n_name, rk := n_regionkey).name AS struct_field,
           struct_pack(name := n_name, rk := n_regionkey) = struct_pack(name := n_name, rk := n_regionkey) AS struct_eq
    FROM nation
    """,
)
def f13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map and struct (composite) type operations — the reference
    generates pg_map composite-pair domains and lake_struct composites
    for these (SURVEY §1.1, §2.8 map/FieldSelect); Spark has native
    MapType/StructType."""
    t = load_tables(spark, sf_dir, ["nation"])
    m = F.create_map(
        F.lit("nation"), F.col("n_name"), F.lit("region"), F.col("n_regionkey").cast("string")
    )
    s = F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("rk"))
    return t["nation"].select(
        "n_nationkey",
        F.element_at(m, "nation").alias("map_get"),
        F.size(m).alias("map_size"),
        F.to_json(F.sort_array(F.map_keys(m))).alias("keys_sorted"),
        s.getField("name").alias("struct_field"),
        (s == s).alias("struct_eq"),
    )


@register(
    "u01_pandas_udf",
    oracle="""
    SELECT l_orderkey,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS charged
    FROM lineitem WHERE l_orderkey <= 200
    GROUP BY l_orderkey
    """,
)
def u01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDF escape hatch (SURVEY §2.11): an Arrow-vectorized pandas
    UDF in the hot path, numerically identical to the built-in
    expression the oracle uses. Row-at-a-time Python UDFs are the
    anti-pattern; this is the sanctioned slow path."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    # spread=False: the raw double sum's last ulp depends on partition
    # merge order; it matches the single-threaded oracle only over the
    # native single-partition scan order (see catalog.load_tables)
    t = load_tables(spark, sf_dir, ["lineitem"], spread=False)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 200)
        .groupBy("l_orderkey")
        .agg(F.sum(charge("l_extendedprice", "l_discount", "l_tax")).alias("charged"))
    )


@register(
    "f14_bitwise_and_buckets",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT)        AS band_v,
           CAST(l_orderkey | 16 AS BIGINT)         AS bor_v,
           CAST(xor(l_orderkey, 85) AS BIGINT)     AS bxor_v,
           CAST(l_orderkey << 2 AS BIGINT)         AS shl_v,
           CAST(l_orderkey >> 1 AS BIGINT)         AS shr_v,
           CAST(~l_linenumber AS INT)              AS bnot_v,
           CASE WHEN l_quantity < 0.0 THEN CAST(0 AS BIGINT)
                WHEN l_quantity >= 50.0 THEN CAST(6 AS BIGINT)
                ELSE CAST(floor(l_quantity / 10.0) + 1 AS BIGINT)
           END AS bucket_v
    FROM lineitem WHERE l_orderkey <= 100
    """,
)
def f14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators (SURVEY §2.2 operator list) and width_bucket
    (the reference's canonical partial-pushdown example —
    docs/iceberg-tables.md:382-420; native in Spark, no fallback seam
    needed)."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    k = F.col("l_orderkey")
    return (
        t["lineitem"]
        .filter(k <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            k.bitwiseAND(F.lit(255)).alias("band_v"),
            k.bitwiseOR(F.lit(16)).alias("bor_v"),
            k.bitwiseXOR(F.lit(85)).alias("bxor_v"),
            F.shiftleft(k, 2).alias("shl_v"),
            F.shiftright(k, 1).alias("shr_v"),
            F.expr("~l_linenumber").alias("bnot_v"),
            F.width_bucket(F.col("l_quantity"), F.lit(0.0), F.lit(50.0), F.lit(5))
            .cast("long")
            .alias("bucket_v"),
        )
    )


@register(
    "f15_time_of_day_interval_aggs",
    oracle="""
    SELECT user_id,
           CAST(avg(date_part('epoch', ts) * 1000000 -
                    date_part('epoch', date_trunc('day', ts)) * 1000000) AS DOUBLE)
             AS avg_tod_us,
           CAST(sum(date_part('epoch', ts - TIMESTAMP '2024-01-01 00:00:00') * 1000000)
                AS BIGINT) AS sum_interval_us,
           strftime(min(ts), '%H:%M:%S') AS earliest_tod
    FROM events WHERE user_id < 10
    GROUP BY user_id
    """,
)
def f15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG time-of-day (µs-since-midnight model for the missing Spark
    time type — SURVEY §1.4) and interval avg/sum, which the reference
    cannot even ship to its vectorized engine (SURVEY §2.4)."""
    from pg_datalake_spark.functions.pgcompat import (
        pg_interval_avg_us,
        pg_interval_sum_us,
        pg_time_of_day_us,
        pg_to_char,
    )

    t = load_tables(spark, sf_dir, ["events"])
    e = t["events"].filter(F.col("user_id") < 10)
    interval_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.expr("TIMESTAMP '2024-01-01 00:00:00'")
    )
    return (
        e.groupBy("user_id")
        .agg(
            pg_interval_avg_us(pg_time_of_day_us(F.col("ts"))).alias("avg_tod_us"),
            pg_interval_sum_us(interval_us).alias("sum_interval_us"),
            pg_to_char(F.min("ts"), "HH24:MI:SS").alias("earliest_tod"),
        )
    )


@register(
    "x01_approx_sketches",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           CAST(1 AS INT) AS acd_ok,
           CAST(1 AS INT) AS med_ok,
           CAST(1 AS INT) AS iqr_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def x01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL distinct, approximate quantiles) —
    the cheap-sketch tier a 100 TB pipeline reaches for before exact
    countDistinct/percentile. Sketch VALUES are engine-specific; the
    hashed output is their VERIFIED ERROR BOUNDS against the exact
    aggregates computed in the same pass (r11 promotion from
    rows-only): HLL++ distinct within ±15% of exact (default rsd 0.05,
    3σ), approx median between the exact 45th and 55th percentiles,
    approx quartiles inside [p15,p35] / [p65,p85] (percentile_approx
    rank error ≤ n/accuracy), plus the exact distinct count itself as
    a fully-hashed column."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    g = (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("acd"),
            F.count_distinct("l_partkey").alias("exact_parts"),
            F.percentile_approx("l_extendedprice", 0.5).alias("amed"),
            F.expr(
                "percentile(l_extendedprice, array(0.45D, 0.55D))"
            ).alias("med_band"),
            F.percentile_approx("l_quantity", F.array(F.lit(0.25), F.lit(0.75))).alias("aiqr"),
            F.expr(
                "percentile(l_quantity, array(0.15D, 0.35D, 0.65D, 0.85D))"
            ).alias("iqr_band"),
        )
    )
    return g.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("acd") - F.col("exact_parts"))
            <= 0.15 * F.col("exact_parts")
        ).cast("int").alias("acd_ok"),
        (
            (F.col("amed") >= F.element_at("med_band", 1))
            & (F.col("amed") <= F.element_at("med_band", 2))
        ).cast("int").alias("med_ok"),
        (
            (F.element_at("aiqr", 1) >= F.element_at("iqr_band", 1))
            & (F.element_at("aiqr", 1) <= F.element_at("iqr_band", 2))
            & (F.element_at("aiqr", 2) >= F.element_at("iqr_band", 3))
            & (F.element_at("aiqr", 2) <= F.element_at("iqr_band", 4))
        ).cast("int").alias("iqr_ok"),
    )


@register(
    "f16_regexp_replace_first",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '#')      AS first_only,
           regexp_replace(p_name, '[aeiou]', '#', 'g') AS all_matches,
           regexp_replace(p_name, 'zzz', '#')          AS no_match,
           regexp_replace(p_name, '(\\w+) (\\w+)', '\\2 \\1') AS swapped,
           regexp_replace(p_name, '(\\w+)', '[\\1]')          AS bracketed
    FROM part WHERE p_partkey <= 100
    """,
)
def f16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG/DuckDB regexp_replace replaces only the FIRST match by
    default; Spark replaces all. pg_regexp_replace_first restores PG
    semantics (SURVEY §2.8), including \\1-\\9 group backreferences in
    the replacement."""
    from pg_datalake_spark.functions.pgcompat import pg_regexp_replace_first

    t = load_tables(spark, sf_dir, ["part"])
    n = F.col("p_name")
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            pg_regexp_replace_first(n, "[aeiou]", "#").alias("first_only"),
            F.regexp_replace(n, "[aeiou]", "#").alias("all_matches"),
            pg_regexp_replace_first(n, "zzz", "#").alias("no_match"),
            pg_regexp_replace_first(n, r"(\w+) (\w+)", r"\2 \1").alias("swapped"),
            pg_regexp_replace_first(n, r"(\w+)", r"[\1]").alias("bracketed"),
        )
    )


@register(
    "f17_variant_semistructured",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT)      AS k_typed,
           json_extract_string(props, '$.k')                      AS k_string,
           CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS BIGINT) AS k_doubled
    FROM events WHERE event_id <= 300
    """,
)
def f17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type
    (parse_json + variant_get path extraction) — the engine-native
    answer to the reference's json/jsonb columns (SURVEY §1.4 maps
    json → 'VariantType on Spark 4')."""
    t = load_tables(spark, sf_dir, ["events"])
    v = F.parse_json(F.col("props"))
    return (
        t["events"]
        .filter(F.col("event_id") <= 300)
        .select(
            "event_id",
            F.variant_get(v, "$.k", "bigint").alias("k_typed"),
            F.variant_get(v, "$.k", "string").alias("k_string"),
            (F.variant_get(v, "$.k", "bigint") * 2).alias("k_doubled"),
        )
    )


@register(
    "u02_python_udtf",
    oracle="""
    SELECT n_nationkey, CAST(pos AS INT) AS pos, word
    FROM (
      SELECT n_nationkey,
             generate_subscripts(string_split(n_name, '_'), 1) AS pos,
             unnest(string_split(n_name, '_')) AS word
      FROM nation
    ) t
    """,
)
def u02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (SURVEY §2.11 — the table-function escape hatch,
    Spark 4 ``@udtf``): one input row expands to N output rows with
    positions. The oracle replays it with unnest + generate_subscripts;
    the UDTF is the sanctioned path for set-returning Python logic the
    built-in generators can't express (here they could — which is what
    makes it oracle-checkable)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, word string")
    class SplitWords:
        def eval(self, name: str):
            for i, w in enumerate(str(name).split("_")):
                yield i + 1, w

    load_tables(spark, sf_dir, ["nation"])
    spark.udtf.register("split_words_udtf", SplitWords)
    return spark.sql(
        """
        SELECT n.n_nationkey, s.pos, s.word
        FROM nation n, LATERAL split_words_udtf(n.n_name) s
        """
    )


@register(
    "u03_pandas_udaf",
    oracle="""
    SELECT o_orderstatus,
           round(sum(o_totalprice * o_custkey) / sum(o_custkey), 6) AS wmean
    FROM orders WHERE o_orderkey <= 2000
    GROUP BY o_orderstatus
    """,
)
def u03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF (grouped-agg pandas UDF — SURVEY §2.11's custom-
    aggregate surface): a custom weighted mean per group, Arrow-batched
    Series→scalar, numerically mirrored by the oracle's sum/sum
    formulation (round(6) absorbs accumulation-order ulps)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 2000)
        .groupBy("o_orderstatus")
        .agg(F.round(wmean("o_totalprice", "o_custkey"), 6).alias("wmean"))
    )


@register(
    "f18_hyperbolic_degree_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(ln(l_discount * 10 + sqrt((l_discount * 10) * (l_discount * 10) + 1)), 6)
             AS asinh_v,
           round(ln((l_quantity + 1.0) + sqrt((l_quantity + 1.0) * (l_quantity + 1.0) - 1)), 6)
             AS acosh_v,
           round(0.5 * ln((1 + l_discount) / (1 - l_discount)), 6)
             AS atanh_v,
           round(sin(radians(l_quantity)), 6)          AS sind_v,
           round(cos(radians(l_quantity)), 6)          AS cosd_v,
           round(tan(radians(l_discount * 100)), 6)    AS tand_v,
           round(degrees(asin(l_discount)), 6)         AS asind_v,
           round(degrees(atan2(l_quantity, 10.0)), 6)  AS atan2d_v,
           CAST(epoch_us(to_timestamp(CAST(l_orderkey AS DOUBLE) * 1000.5))
                AS BIGINT)                             AS tots_us
    FROM lineitem WHERE l_orderkey <= 100
    """,
)
def f18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperbolic + PG degree-variant trig + to_timestamp(float8)
    (the last scalar families on the reference's shippable list —
    shippable_builtin_functions.c:290-353: asinh/acosh/atanh — DuckDB
    lacks them, so the oracle uses their ln/sqrt closed forms — the
    sind/cosd/tand/asind/atan2d degree variants, to_timestamp) —
    degree variants compose radians()/degrees() exactly as the
    reference's rewrite shims do; every output rounds so libm noise
    never reaches the hash; the float-epoch timestamp hashes as exact
    integer microseconds."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    q, d = F.col("l_quantity"), F.col("l_discount")
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.asinh(d * 10), 6).alias("asinh_v"),
            F.round(F.acosh(q + 1.0), 6).alias("acosh_v"),
            F.round(F.atanh(d), 6).alias("atanh_v"),
            F.round(F.sin(F.radians(q)), 6).alias("sind_v"),
            F.round(F.cos(F.radians(q)), 6).alias("cosd_v"),
            F.round(F.tan(F.radians(d * 100)), 6).alias("tand_v"),
            F.round(F.degrees(F.asin(d)), 6).alias("asind_v"),
            F.round(F.degrees(F.atan2(q, F.lit(10.0))), 6).alias("atan2d_v"),
            F.unix_micros(
                F.timestamp_seconds(F.col("l_orderkey").cast("double") * 1000.5)
            ).alias("tots_us"),
        )
    )
