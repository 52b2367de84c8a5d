"""Scalable EXACT ordered-set aggregates (percentile_cont / mode).

Spark's native `percentile_cont` / `mode` collect each group's values
into aggregation state — the one §2.4 family whose shuffle volume is
O(rows) (ARCHITECTURE.md flagged it as the documented exception; the
reference ships whole groups to DuckDB the same way). For the common
analytics case — values with bounded precision (money cents, integer
quantities, enum strings) — the exact answer is derivable from the
VALUE-COUNTED aggregate instead:

    pass 1  count per (group, exact value)      — partial-aggregable,
                                                  shuffle = |distinct|
    pass 2  cumulative counts over the sorted    — window over the
            distinct values, order-statistic      aggregate, rows =
            lookup + linear interpolation         |distinct| not |rows|

At 100 TB with cent-valued prices, |distinct| is bounded (~10⁷ cents)
regardless of row count, so state per group stays small where the
native aggregate's is unbounded. Values are scaled to exact integers
(`scale` decimal digits) so the counting key is precise; the final
interpolation uses the same `lo + (hi - lo)·frac` form DuckDB and
Spark use natively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    specs: list[tuple[str, float, str]],
    scale: int = 100,
) -> DataFrame:
    """Exact `percentile_cont(q) WITHIN GROUP (ORDER BY col)` per
    group for each ``(col, q, alias)`` in ``specs``, via the
    value-counted two-stage plan. ``scale`` = 10^digits that makes the
    values exact integers (100 for cents). NULLs are excluded, like
    the native aggregate."""
    value_cols = sorted({c for c, _, _ in specs})
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("_col"),
                F.round(F.col(c) * scale).cast("long").alias("_v"),
            )
            for c in value_cols
        ]
    )
    melted = (
        df.select(*group_cols, F.explode(pairs).alias("_p"))
        .select(*group_cols, F.col("_p._col").alias("_col"), F.col("_p._v").alias("_v"))
        .filter(F.col("_v").isNotNull())
    )
    vc = melted.groupBy(*group_cols, "_col", "_v").agg(F.count("*").alias("_c"))
    by_col = W.partitionBy(*group_cols, "_col")
    cum = vc.select(
        *group_cols,
        "_col",
        "_v",
        F.sum("_c").over(by_col.orderBy("_v")).alias("_cum"),
        F.sum("_c").over(by_col).alias("_n"),
    )

    def pct(col: str, q: float) -> Column:
        on = F.col("_col") == col
        rk = (F.col("_n") - 1) * F.lit(q)  # 0-based fractional rank
        lo_v = F.min(F.when(on & (F.col("_cum") >= F.floor(rk) + 1), F.col("_v")))
        hi_v = F.min(F.when(on & (F.col("_cum") >= F.ceil(rk) + 1), F.col("_v")))
        frac = F.max(F.when(on, rk - F.floor(rk)))
        return (lo_v + (hi_v - lo_v) * frac) / scale

    return cum.groupBy(*group_cols).agg(
        *[pct(c, q).alias(alias) for c, q, alias in specs]
    )


def grouped_exact_mode(
    df: DataFrame, group_cols: list[str], value_col: str, alias: str = "mode"
) -> DataFrame:
    """Exact mode per group with a DETERMINISTIC tie-break (highest
    count, then smallest value — PG's mode() leaves ties
    implementation-defined; pinning them makes the result
    engine-reproducible). Same value-counted shape: shuffle volume is
    |distinct values|, fully partial-aggregable first stage."""
    vc = df.filter(F.col(value_col).isNotNull()).groupBy(
        *group_cols, F.col(value_col).alias("_v")
    ).agg(F.count("*").alias("_c"))
    win = W.partitionBy(*group_cols).orderBy(F.desc("_c"), F.asc("_v"))
    return (
        vc.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") == 1)
        .select(*group_cols, F.col("_v").alias(alias))
    )
