"""TPC-DS-shape analytical queries adapted to the driver's star schema.

The reference ships the full TPC-DS harness (reference:
pg_lake_benchmark/src/tpcds.c:76, 99 fixed queries;
pg_lake_benchmark/README.md:26-30) — the workload a real migration
replays first. The driver's synthetic schema has no item/store/
date_dim tables, so each query here is the structurally matching DS
shape re-expressed over the available star schema:

- hierarchy  i_category → i_class        maps to  p_type → p_brand
- channels   store/web/catalog sales     map to   order-priority or
             returnflag partitions of the same fact table
- date_dim   d_year / d_moy              map to   year()/month() of
             the fact timestamp columns

All money sums use the exact-decimal formulation (tpch.dsum) so every
value hashes identically across engines; window rank ties are broken
on the rounded measure + the dimension columns so both engines rank
identically.

Scale notes (100 TB): every query groups/joins on its natural keys
with partial aggregation; part (SF-scaled) carries no broadcast hint —
AQE decides. The ROLLUP queries are TWO-PHASE: Spark's Expand operator
multiplies its INPUT rows by the number of grouping sets before the
partial aggregate, so a naive rollup over the fact table pushes
|fact|·|sets| rows through aggregation. Instead we pre-aggregate to
the finest grouping level first (one ordinary shuffle, map-side
combine) and run the rollup over the tiny aggregate — sum/count are
decomposable and the sums stay DECIMAL (exact, order-independent)
until the final cast, so the result is bit-identical to the oracle's
single-phase ROLLUP while Expand only ever sees |groups| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.plans.registry import register
from pg_datalake_spark.plans.tpch import davg, disc_price, dsum

# ---------------------------------------------------------------------------
# ds27 shape: averages over a two-level ROLLUP with grouping flags
# ---------------------------------------------------------------------------


@register(
    "ds27_avg_rollup",
    oracle="""
    SELECT CAST(GROUPING(p_type) AS INT) AS g_type,
           CAST(GROUPING(p_brand) AS INT) AS g_brand,
           p_type, p_brand,
           CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / count(l_quantity)
             AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
             / count(l_extendedprice) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE) / count(l_discount)
             AS avg_disc,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_returnflag = 'N'
    GROUP BY ROLLUP(p_type, p_brand)
    """,
)
def ds27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS27 shape (avg measures over item×demographic rollup →
    p_type×p_brand rollup here): per-level averages with grouping
    flags disambiguating subtotal NULLs from real NULL keys.
    Two-phase rollup: exact decimal sums + non-null counts at the
    finest level, averages recomposed per grouping set (sum-of-sums /
    sum-of-counts — identical to the oracle's single-phase avg)."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    pre = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "N")
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(30,2)")).alias("_qty"),
            F.count("l_quantity").alias("_qty_n"),
            F.sum(F.col("l_extendedprice").cast("decimal(30,2)")).alias("_price"),
            F.count("l_extendedprice").alias("_price_n"),
            F.sum(F.col("l_discount").cast("decimal(30,2)")).alias("_disc"),
            F.count("l_discount").alias("_disc_n"),
            F.count("*").alias("_n"),
        )
    )
    return (
        pre.rollup("p_type", "p_brand")
        .agg(
            F.grouping("p_type").cast("int").alias("g_type"),
            F.grouping("p_brand").cast("int").alias("g_brand"),
            (F.sum("_qty").cast("double") / F.sum("_qty_n")).alias("avg_qty"),
            (F.sum("_price").cast("double") / F.sum("_price_n")).alias("avg_price"),
            (F.sum("_disc").cast("double") / F.sum("_disc_n")).alias("avg_disc"),
            F.sum("_n").alias("n"),
        )
        .select("g_type", "g_brand", "p_type", "p_brand",
                "avg_qty", "avg_price", "avg_disc", "n")
    )


# ---------------------------------------------------------------------------
# ds36 shape: gross margin over ROLLUP + rank within parent hierarchy
# ---------------------------------------------------------------------------


@register(
    "ds36_margin_rollup_rank",
    oracle="""
    WITH agg AS (
      SELECT GROUPING(p_type) AS g_type, GROUPING(p_brand) AS g_brand,
             p_type, p_brand,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4)))
                  AS DOUBLE) AS sum_net,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_gross
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY ROLLUP(p_type, p_brand)
    )
    SELECT CAST(g_type + g_brand AS INT) AS lochierarchy, p_type, p_brand,
           round(sum_net / sum_gross, 6) AS gross_margin,
           CAST(rank() OVER (
             PARTITION BY g_type + g_brand,
                          CASE WHEN g_brand = 0 THEN p_type END
             ORDER BY round(sum_net / sum_gross, 6),
                      coalesce(p_type, '*'), coalesce(p_brand, '*')
           ) AS INT) AS rank_within_parent
    FROM agg
    """,
)
def ds36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS36 shape (gross margin over the category→class ROLLUP with
    rank-within-parent): two-phase rollup — pre-aggregate exact
    decimal sums per (p_type, p_brand), then ROLLUP over the ~150-row
    aggregate so Expand never multiplies fact rows. The rank window
    partitions by hierarchy level and the parent key, ordering by the
    rounded margin so both engines rank identical doubles. Reference
    harness: pg_lake_benchmark/src/tpcds.c:76 (query 36)."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    pre = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(
            F.sum(disc_price().cast("decimal(30,4)")).alias("_net"),
            F.sum(F.col("l_extendedprice").cast("decimal(30,2)")).alias("_gross"),
        )
    )
    agg = (
        pre.rollup("p_type", "p_brand")
        .agg(
            F.grouping("p_type").cast("int").alias("g_type"),
            F.grouping("p_brand").cast("int").alias("g_brand"),
            F.sum("_net").cast("double").alias("sum_net"),
            F.sum("_gross").cast("double").alias("sum_gross"),
        )
    )
    margin = F.round(F.col("sum_net") / F.col("sum_gross"), 6)
    win = W.partitionBy(
        F.col("g_type") + F.col("g_brand"),
        F.when(F.col("g_brand") == 0, F.col("p_type")),
    ).orderBy(
        margin,
        F.coalesce(F.col("p_type"), F.lit("*")),
        F.coalesce(F.col("p_brand"), F.lit("*")),
    )
    return agg.select(
        (F.col("g_type") + F.col("g_brand")).cast("int").alias("lochierarchy"),
        "p_type",
        "p_brand",
        margin.alias("gross_margin"),
        F.rank().over(win).cast("int").alias("rank_within_parent"),
    )


# ---------------------------------------------------------------------------
# ds42 shape: dim-join topline by category for one year
# ---------------------------------------------------------------------------


@register(
    "ds42_category_year_topline",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INT) AS yr, p_type,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4)))
                AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE year(l_shipdate) = 1997
    GROUP BY 1, 2
    ORDER BY revenue DESC, p_type
    """,
)
def ds42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS42 shape (category topline for one calendar year): fact→dim
    equi-join, year predicate pushed to the scan, category group."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    return (
        t["lineitem"]
        .filter(F.year("l_shipdate") == 1997)
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.year("l_shipdate").cast("int").alias("yr"),
            F.col("p_type"),
        )
        .agg(dsum(disc_price(), 4).alias("revenue"), F.count("*").alias("n_items"))
        .orderBy(F.desc("revenue"), "p_type")
    )


# ---------------------------------------------------------------------------
# ds51 shape: two-channel cumulative full-outer join with running max
# ---------------------------------------------------------------------------


@register(
    "ds51_cumulative_channels",
    oracle="""
    WITH m AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS mon,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'web' ELSE 'store' END AS channel,
             o_totalprice
      FROM orders
    ),
    cs AS (
      SELECT mon, channel, sum(CAST(o_totalprice AS DECIMAL(30,2))) AS rev
      FROM m GROUP BY mon, channel
    ),
    j AS (
      SELECT coalesce(w.mon, s.mon) AS mon,
             coalesce(w.rev, 0) AS wrev, coalesce(s.rev, 0) AS srev
      FROM (SELECT mon, rev FROM cs WHERE channel = 'web') w
      FULL OUTER JOIN (SELECT mon, rev FROM cs WHERE channel = 'store') s
        ON w.mon = s.mon
    ),
    c AS (
      SELECT mon,
             sum(wrev) OVER (ORDER BY mon ROWS UNBOUNDED PRECEDING) AS wc,
             sum(srev) OVER (ORDER BY mon ROWS UNBOUNDED PRECEDING) AS sc
      FROM j
    )
    SELECT mon, CAST(wc AS DOUBLE) AS web_cumulative,
           CAST(sc AS DOUBLE) AS store_cumulative,
           CAST(max(greatest(wc, sc)) OVER (ORDER BY mon ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) AS max_cumulative
    FROM c
    """,
)
def ds51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS51 shape (web vs store cumulative sales, full-outer joined by
    period, with the running max of the leading channel): the decimal
    sums stay DECIMAL through the cumulative windows — exact integer
    arithmetic in both engines — and cast to DOUBLE only at the end,
    so every cumulative value hashes identically. The global window
    has ~84 month rows (one per month, after aggregation), so the
    single-partition window is bounded regardless of fact size."""
    t = load_tables(spark, sf_dir, ["orders"])
    m = t["orders"].select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int").alias("mon"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "web")
        .otherwise("store")
        .alias("channel"),
        F.col("o_totalprice"),
    )
    cs = m.groupBy("mon", "channel").agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("rev")
    )
    web = cs.filter(F.col("channel") == "web").select("mon", F.col("rev").alias("wrev"))
    store = cs.filter(F.col("channel") == "store").select(
        F.col("mon").alias("s_mon"), F.col("rev").alias("srev")
    )
    zero = F.lit(0).cast("decimal(30,2)")
    j = (
        web.join(store, web["mon"] == store["s_mon"], "full_outer")
        .select(
            F.coalesce(F.col("mon"), F.col("s_mon")).alias("mon"),
            F.coalesce(F.col("wrev"), zero).alias("wrev"),
            F.coalesce(F.col("srev"), zero).alias("srev"),
        )
    )
    cum = W.orderBy("mon").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = j.select(
        "mon",
        F.sum("wrev").over(cum).alias("wc"),
        F.sum("srev").over(cum).alias("sc"),
    )
    return c.select(
        "mon",
        F.col("wc").cast("double").alias("web_cumulative"),
        F.col("sc").cast("double").alias("store_cumulative"),
        F.max(F.greatest(F.col("wc"), F.col("sc")))
        .over(cum)
        .cast("double")
        .alias("max_cumulative"),
    )


# ---------------------------------------------------------------------------
# ds59 shape: period-over-period revenue ratio via self-join
# ---------------------------------------------------------------------------


@register(
    "ds59_month_over_month",
    oracle="""
    WITH r AS (
      SELECT l_returnflag,
             CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS INT) AS mon_idx,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4)))
                  AS DOUBLE) AS rev
      FROM lineitem GROUP BY 1, 2
    )
    SELECT cur.l_returnflag, cur.mon_idx,
           cur.rev AS cur_rev, prev.rev AS prev_rev,
           round(cur.rev / prev.rev, 6) AS mom_ratio
    FROM r cur JOIN r prev
      ON cur.l_returnflag = prev.l_returnflag AND cur.mon_idx = prev.mon_idx + 1
    """,
)
def ds59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS59 shape (week-over-week store sales → month-over-month by
    returnflag here): aggregate once, self-join consecutive periods on
    a pure-integer month index (year*12+month — no calendar-function
    edge cases at year boundaries)."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    r = (
        t["lineitem"]
        .groupBy(
            "l_returnflag",
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
            .cast("int")
            .alias("mon_idx"),
        )
        .agg(dsum(disc_price(), 4).alias("rev"))
    )
    cur = r
    prev = r.select(
        F.col("l_returnflag").alias("p_flag"),
        F.col("mon_idx").alias("p_mon_idx"),
        F.col("rev").alias("prev_rev"),
    )
    return (
        cur.join(
            prev,
            (F.col("l_returnflag") == F.col("p_flag"))
            & (F.col("mon_idx") == F.col("p_mon_idx") + 1),
        )
        .select(
            "l_returnflag",
            "mon_idx",
            F.col("rev").alias("cur_rev"),
            "prev_rev",
            F.round(F.col("rev") / F.col("prev_rev"), 6).alias("mom_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# ds67 shape: three-level ROLLUP + windowed top-k per category
# ---------------------------------------------------------------------------


@register(
    "ds67_rollup_rank_topk",
    oracle="""
    WITH agg AS (
      SELECT p_type, p_brand, CAST(year(l_shipdate) AS INT) AS yr,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4)))
                  AS DOUBLE) AS sumsales
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY ROLLUP(p_type, p_brand, yr)
    )
    SELECT p_type, p_brand, yr, sumsales, rk FROM (
      SELECT p_type, p_brand, yr, sumsales,
             CAST(rank() OVER (
               PARTITION BY p_type
               ORDER BY sumsales DESC, coalesce(p_brand, '*'), coalesce(yr, -1)
             ) AS INT) AS rk
      FROM agg
    ) t WHERE rk <= 5
    """,
)
def ds67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS67 shape (sales over the full product×time ROLLUP, then the
    top-5 grouping rows per category by a rank window): two-phase
    rollup — one ordinary aggregate to (p_type, p_brand, yr) ≈ 1k
    rows, then the 4-set ROLLUP over that (decimal sums re-summed
    exactly). The rank partitions by category (subtotal rows rank
    within their own NULL-category partition, exactly as DS does).
    Reference harness: pg_lake_benchmark/src/tpcds.c:76 (query 67)."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    pre = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("yr", F.year("l_shipdate").cast("int"))
        .groupBy("p_type", "p_brand", "yr")
        .agg(F.sum(disc_price().cast("decimal(30,4)")).alias("_net"))
    )
    agg = pre.rollup("p_type", "p_brand", "yr").agg(
        F.sum("_net").cast("double").alias("sumsales")
    )
    win = W.partitionBy("p_type").orderBy(
        F.desc("sumsales"),
        F.coalesce(F.col("p_brand"), F.lit("*")),
        F.coalesce(F.col("yr"), F.lit(-1)),
    )
    return (
        agg.withColumn("rk", F.rank().over(win).cast("int"))
        .filter(F.col("rk") <= 5)
        .select("p_type", "p_brand", "yr", "sumsales", "rk")
    )


# ---------------------------------------------------------------------------
# ds71 shape: multi-channel UNION ALL fact rollup by brand
# ---------------------------------------------------------------------------


@register(
    "ds71_channel_union_brand",
    oracle="""
    WITH channels AS (
      SELECT 'web' AS channel, l_partkey, l_extendedprice * (1 - l_discount) AS net
      FROM lineitem WHERE l_returnflag = 'N'
      UNION ALL
      SELECT 'store', l_partkey, l_extendedprice * (1 - l_discount)
      FROM lineitem WHERE l_returnflag = 'R'
      UNION ALL
      SELECT 'catalog', l_partkey, l_extendedprice * (1 - l_discount)
      FROM lineitem WHERE l_returnflag = 'A'
    )
    SELECT channel, p_brand,
           CAST(sum(CAST(net AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM channels JOIN part ON l_partkey = p_partkey
    GROUP BY channel, p_brand
    """,
)
def ds71(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS71 shape (web/catalog/store channel union → one dim join →
    brand rollup): three filtered scans of the fact table tagged and
    unioned BEFORE the join, so the dim join and aggregation run once
    over the union — the DS pattern Catalyst collapses into a single
    shuffle."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])

    def chan(tag: str, flag: str) -> DataFrame:
        return (
            t["lineitem"]
            .filter(F.col("l_returnflag") == flag)
            .select(F.lit(tag).alias("channel"), "l_partkey", disc_price().alias("net"))
        )

    channels = chan("web", "N").unionByName(chan("store", "R")).unionByName(
        chan("catalog", "A")
    )
    return (
        channels.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("channel", "p_brand")
        .agg(dsum(F.col("net"), 4).alias("revenue"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# ds11 shape: year-over-year customer spend growth
# ---------------------------------------------------------------------------


@register(
    "ds11_yoy_customer_growth",
    oracle="""
    WITH y AS (
      SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
             CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS spend
      FROM orders GROUP BY 1, 2
    )
    SELECT a.o_custkey, b.spend AS spend_prev, a.spend AS spend_cur,
           round(a.spend / b.spend, 6) AS growth
    FROM y a JOIN y b ON a.o_custkey = b.o_custkey
    WHERE a.yr = 1997 AND b.yr = 1996 AND a.spend > 1.5 * b.spend
    """,
)
def ds11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS11 shape (customers whose year-over-year spend grew past a
    threshold): per-customer-per-year aggregate once, self-join the
    two years. The growth predicate compares deterministic doubles
    (exact-decimal sums), so both engines keep the same customers."""
    t = load_tables(spark, sf_dir, ["orders"])
    y = (
        t["orders"]
        .groupBy("o_custkey", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(dsum(F.col("o_totalprice"), 2).alias("spend"))
    )
    cur = y.filter(F.col("yr") == 1997).select("o_custkey", F.col("spend").alias("spend_cur"))
    prev = y.filter(F.col("yr") == 1996).select(
        F.col("o_custkey").alias("p_custkey"), F.col("spend").alias("spend_prev")
    )
    return (
        cur.join(prev, F.col("o_custkey") == F.col("p_custkey"))
        .filter(F.col("spend_cur") > 1.5 * F.col("spend_prev"))
        .select(
            "o_custkey",
            "spend_prev",
            "spend_cur",
            F.round(F.col("spend_cur") / F.col("spend_prev"), 6).alias("growth"),
        )
    )


# ---------------------------------------------------------------------------
# ds89 shape: deviation from the group average (join-back formulation)
# ---------------------------------------------------------------------------


@register(
    "ds89_avg_deviation",
    oracle="""
    WITH m AS (
      SELECT p_type, p_brand,
             CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS mon,
             CAST(year(l_shipdate) AS INT) AS yr,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4)))
                  AS DOUBLE) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2, 3, 4
    ),
    a AS (
      SELECT p_type AS a_type, p_brand AS a_brand, yr AS a_yr,
             CAST(sum(CAST(rev AS DECIMAL(30,4))) AS DOUBLE) / count(rev) AS avg_rev
      FROM m GROUP BY 1, 2, 3
    )
    SELECT p_type, p_brand, mon, rev, avg_rev,
           round(abs(rev - avg_rev) / avg_rev, 6) AS deviation
    FROM m JOIN a ON p_type = a_type AND p_brand = a_brand AND yr = a_yr
    WHERE abs(rev - avg_rev) / avg_rev > 0.1
    """,
)
def ds89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS89 shape (months whose sales deviate >10 % from the brand's
    yearly average): monthly aggregate once, join back the per-year
    average — two shuffles on the same keys (AQE coalesces), no
    window over the fact table. The deviation predicate compares
    deterministic doubles, so both engines keep identical rows."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    m = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_type",
            "p_brand",
            (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("int").alias("mon"),
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(dsum(disc_price(), 4).alias("rev"))
    )
    a = (
        m.groupBy(
            F.col("p_type").alias("a_type"),
            F.col("p_brand").alias("a_brand"),
            F.col("yr").alias("a_yr"),
        )
        .agg(davg(F.col("rev"), 4).alias("avg_rev"))
    )
    dev = F.abs(F.col("rev") - F.col("avg_rev")) / F.col("avg_rev")
    return (
        m.join(
            a,
            (F.col("p_type") == F.col("a_type"))
            & (F.col("p_brand") == F.col("a_brand"))
            & (F.col("yr") == F.col("a_yr")),
        )
        .filter(dev > 0.1)
        .select("p_type", "p_brand", "mon", "rev", "avg_rev",
                F.round(dev, 6).alias("deviation"))
    )


# ---------------------------------------------------------------------------
# ds98 shape: revenue ratio within class (window over aggregate)
# ---------------------------------------------------------------------------


@register(
    "ds98_ratio_within_class",
    oracle="""
    WITH r AS (
      SELECT p_type, p_brand,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    )
    SELECT p_type, p_brand, CAST(rev AS DOUBLE) AS revenue,
           round(CAST(rev AS DOUBLE) * 100
                 / CAST(sum(rev) OVER (PARTITION BY p_type) AS DOUBLE), 6)
             AS revenueratio
    FROM r
    """,
)
def ds98(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS98 shape (each item's share of its class revenue): the class
    total is a whole-partition window over the aggregate — the sum
    stays DECIMAL through the window (order-independent exact
    arithmetic), cast to DOUBLE only for the final ratio."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    r = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(F.sum(disc_price().cast("decimal(30,4)")).alias("rev"))
    )
    class_total = F.sum("rev").over(W.partitionBy("p_type"))
    return r.select(
        "p_type",
        "p_brand",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") * 100 / class_total.cast("double"), 6
        ).alias("revenueratio"),
    )


# ---------------------------------------------------------------------------
# ds35 shape: customers present in multiple channels (double semi-join)
# ---------------------------------------------------------------------------


@register(
    "ds35_multichannel_exists",
    oracle="""
    SELECT c_mktsegment, n_name, count(*) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) / count(c_acctbal)
             AS avg_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
      AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW'))
    GROUP BY 1, 2
    """,
)
def ds35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS35 shape (customers active in several sales channels, with
    demographic stats): two LEFT SEMI joins against the channel
    partitions of orders, then the dim join + rollup. nation is
    broadcast (bounded by schema at 25 rows)."""
    t = load_tables(spark, sf_dir, ["customer", "nation", "orders"])
    urgent = t["orders"].filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_custkey")
    low = t["orders"].filter(
        F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")
    ).select(F.col("o_custkey").alias("o_custkey2"))
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(low, F.col("c_custkey") == F.col("o_custkey2"), "left_semi")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_mktsegment", "n_name")
        .agg(F.count("*").alias("n_cust"), davg(F.col("c_acctbal")).alias("avg_bal"))
    )


# ---------------------------------------------------------------------------
# ds16 shape: distinct-count with EXISTS / NOT EXISTS side conditions
# ---------------------------------------------------------------------------


@register(
    "ds16_distinct_exists",
    oracle="""
    SELECT count(DISTINCT o.o_orderkey) AS order_count,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total_price
    FROM orders o
    WHERE o.o_orderpriority = '1-URGENT'
      AND EXISTS (SELECT 1 FROM lineitem l1
                  WHERE l1.l_orderkey = o.o_orderkey AND l1.l_discount > 0.05)
      AND NOT EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = o.o_orderkey AND l2.l_returnflag = 'R')
    """,
)
def ds16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS16 shape (order count with an EXISTS channel condition and a
    NOT EXISTS returns exclusion): semi + anti hash joins on the
    natural fact key, then one distinct-count aggregate. NOTE the sum
    counts each qualifying ORDER once (the semi-join never duplicates
    o rows — exactly why EXISTS, not JOIN)."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    li = t["lineitem"]
    discounted = li.filter(F.col("l_discount") > 0.05).select("l_orderkey")
    returned = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_orderkey")
    )
    return (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .join(discounted, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(returned, F.col("o_orderkey") == F.col("r_orderkey"), "left_anti")
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            dsum(F.col("o_totalprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# ds23 shape: frequent items in one period, measured in another
# ---------------------------------------------------------------------------


@register(
    "ds23_frequent_items",
    oracle="""
    WITH freq AS (
      SELECT l_partkey FROM lineitem
      WHERE year(l_shipdate) = 1996
      GROUP BY l_partkey HAVING count(*) >= 4
    )
    SELECT p_brand,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4)))
                AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    JOIN freq USING (l_partkey)
    JOIN part ON l_partkey = p_partkey
    WHERE year(l_shipdate) = 1997
    GROUP BY p_brand
    """,
)
def ds23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS23 shape (frequently-sold items of one year, revenue measured
    the next year): the frequent-item set is an aggregate-then-semi-
    join — it reaches the fact scan as a join filter, never a
    collected IN-list."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    li = t["lineitem"]
    freq = (
        li.filter(F.year("l_shipdate") == 1996)
        .groupBy("l_partkey")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= 4)
        .select("l_partkey")
    )
    return (
        li.filter(F.year("l_shipdate") == 1997)
        .join(freq, "l_partkey", "left_semi")
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(dsum(disc_price(), 4).alias("revenue"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# ds54 shape: cross-channel customer migration (A then B, temporal)
# ---------------------------------------------------------------------------


@register(
    "ds54_channel_migration",
    oracle="""
    WITH first_web AS (
      SELECT o_custkey, min(o_orderdate) AS first_web_date
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o_custkey
    )
    SELECT c_mktsegment,
           count(DISTINCT o.o_custkey) AS n_migrated,
           count(*) AS n_store_orders_after
    FROM orders o
    JOIN first_web f ON o.o_custkey = f.o_custkey
    JOIN customer ON c_custkey = o.o_custkey
    WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      AND o.o_orderdate > f.first_web_date
    GROUP BY c_mktsegment
    """,
)
def ds54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS54 shape (customers first seen in one channel, later active
    in another): per-customer first-touch aggregate joined back to the
    fact with a temporal predicate — one extra shuffle on the customer
    key, no window over the raw fact."""
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    o = t["orders"]
    web = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    first_web = (
        o.filter(web)
        .groupBy(F.col("o_custkey").alias("f_custkey"))
        .agg(F.min("o_orderdate").alias("first_web_date"))
    )
    return (
        o.filter(~web)
        .join(first_web, F.col("o_custkey") == F.col("f_custkey"))
        .filter(F.col("o_orderdate") > F.col("first_web_date"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_migrated"),
            F.count("*").alias("n_store_orders_after"),
        )
    )


# ---------------------------------------------------------------------------
# ds95 shape: same-entity co-occurrence EXISTS (two-hop self-join)
# ---------------------------------------------------------------------------


@register(
    "ds95_repeat_buyer_months",
    oracle="""
    WITH m AS (
      SELECT DISTINCT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS INT) AS mon_idx
      FROM orders
    )
    SELECT a.mon_idx, count(*) AS n_repeat_customers
    FROM m a
    WHERE EXISTS (SELECT 1 FROM m b
                  WHERE b.o_custkey = a.o_custkey AND b.mon_idx = a.mon_idx + 1)
    GROUP BY a.mon_idx
    """,
)
def ds95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS95 shape (entities present in consecutive periods — the
    two-hop EXISTS self-join): distinct (customer, month) pairs
    semi-joined to themselves shifted one month. The distinct
    aggregate runs BEFORE the self-join, so the join input is
    |customer×month|, not |orders|."""
    t = load_tables(spark, sf_dir, ["orders"])
    m = (
        t["orders"]
        .select(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("int")
            .alias("mon_idx"),
        )
        .distinct()
    )
    nxt = m.select(
        F.col("o_custkey").alias("n_custkey"), (F.col("mon_idx") - 1).alias("n_mon_idx")
    )
    return (
        m.join(
            nxt,
            (F.col("o_custkey") == F.col("n_custkey"))
            & (F.col("mon_idx") == F.col("n_mon_idx")),
            "left_semi",
        )
        .groupBy("mon_idx")
        .agg(F.count("*").alias("n_repeat_customers"))
    )
