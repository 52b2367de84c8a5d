"""Time-series gap filling (hypertable-style `time_bucket_gapfill`).

Dense bucket grids are generated per group from that group's own
extent (`sequence()` + explode — no driver loop, no cross join), then
missing buckets are filled by last-observation-carried-forward using
the gaps-and-islands trick: a running count of non-null observations
partitions the series into islands, and `first()` within each island
is the carried value. Both steps are plain window functions — one
shuffle on the group key, identical semantics in any engine (no
IGNORE NULLS dependence), which is what makes the operator
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill_locf(
    df: DataFrame,
    bucket_col: str,
    group_cols: list[str],
    value_col: str,
    step: int,
) -> DataFrame:
    """Fill missing buckets per group with the last observed value.

    ``bucket_col`` must be numeric (e.g. epoch seconds already
    bucketed); ``step`` is the bucket width in the same unit. Output:
    one row per (group, bucket) on the dense grid from the group's min
    to max bucket, with ``value`` = observed or carried-forward, and
    ``is_filled`` marking synthesized rows.
    """
    extents = df.groupBy(*group_cols).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    grid = extents.select(
        *group_cols,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))).alias(
            bucket_col
        ),
    )
    joined = grid.join(df, [*group_cols, bucket_col], "left")
    w = Window.partitionBy(*group_cols).orderBy(bucket_col)
    joined = joined.withColumn("__island", F.count(value_col).over(w))
    wi = Window.partitionBy(*group_cols, "__island").orderBy(bucket_col)
    return joined.select(
        *group_cols,
        bucket_col,
        F.first(value_col).over(wi).alias("value"),
        F.col(value_col).isNull().alias("is_filled"),
    )


def gap_fill_interpolate(
    df: DataFrame,
    bucket_col: str,
    group_cols: list[str],
    value_col: str,
    step: int,
) -> DataFrame:
    """Like :func:`gap_fill_locf` but missing buckets are LINEARLY
    interpolated between the surrounding observations (TimescaleDB's
    ``interpolate``). Holes before the first / after the last
    observation fall back to the nearest observed value. Same one-
    shuffle window shape: the previous/next observation and their
    buckets come from four framed window aggregates, no self-join."""
    extents = df.groupBy(*group_cols).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    grid = extents.select(
        *group_cols,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))).alias(
            bucket_col
        ),
    )
    joined = grid.join(df, [*group_cols, bucket_col], "left")
    base = Window.partitionBy(*group_cols).orderBy(bucket_col)
    wprev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wnext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_bucket = F.when(F.col(value_col).isNotNull(), F.col(bucket_col))
    prev_v = F.last(value_col, ignorenulls=True).over(wprev)
    next_v = F.first(value_col, ignorenulls=True).over(wnext)
    prev_b = F.last(obs_bucket, ignorenulls=True).over(wprev)
    next_b = F.first(obs_bucket, ignorenulls=True).over(wnext)
    frac = (F.col(bucket_col) - prev_b).cast("double") / (next_b - prev_b).cast(
        "double"
    )
    interp = (
        F.when(F.col(value_col).isNotNull(), F.col(value_col).cast("double"))
        .when(prev_v.isNull(), next_v.cast("double"))
        .when(next_v.isNull(), prev_v.cast("double"))
        .otherwise(prev_v.cast("double") + (next_v - prev_v).cast("double") * frac)
    )
    return joined.select(
        *group_cols,
        bucket_col,
        interp.alias("value"),
        F.col(value_col).isNull().alias("is_filled"),
    )


def time_weighted_avg(
    df: DataFrame,
    ts_us_col: str,
    value_cents_col: str,
    group_cols: list[str],
    bucket_us: int,
) -> DataFrame:
    """WITHIN-BUCKET time-weighted average (the hypertable
    ``time_weight('locf')`` family): each observation holds its value
    from its own timestamp until the NEXT observation in the group or
    the bucket end, whichever comes first; the bucket average weights
    each value by that holding duration. Carry-in from the previous
    bucket is deliberately out of scope (documented within-bucket
    variant — cross-bucket carry needs the gap-fill grid first; compose
    with gap_fill_locf for that).

    Exactness: timestamps in µs and values in integer cents, so every
    value·duration product is exact integer arithmetic (decimal
    accumulation) and both engines agree bit-for-bit. One shuffle on
    the group key (the lead window); the bucket aggregate reuses the
    same partitioning."""
    ts = F.col(ts_us_col)
    bucket = (ts - (ts % F.lit(bucket_us))).alias("bucket_us")
    # value tie-break: with duplicate timestamps in a group, the tie
    # order decides which row gets _dt=0 — order by (ts, value) so the
    # result is deterministic across engines/partitionings (the oracle
    # SQL uses the same two-key ORDER BY).
    w = Window.partitionBy(*group_cols).orderBy(ts_us_col, value_cents_col)
    seg = (
        df.select(*group_cols, ts_us_col, value_cents_col)
        .withColumn("bucket_us", bucket)
        .withColumn("_next", F.lead(ts_us_col).over(w))
        .withColumn("_bucket_end", F.col("bucket_us") + F.lit(bucket_us))
        .withColumn(
            "_dt",
            F.least(F.coalesce(F.col("_next"), F.col("_bucket_end")),
                    F.col("_bucket_end")) - ts,
        )
    )
    return (
        seg.groupBy(*group_cols, "bucket_us")
        .agg(
            F.count("*").alias("n_obs"),
            F.sum("_dt").cast("long").alias("covered_us"),
            F.round(
                F.sum(
                    (F.col(value_cents_col) * F.col("_dt")).cast("decimal(38,0)")
                ).cast("double")
                / F.sum("_dt")
                / 100.0,
                6,
            ).alias("tw_avg"),
        )
    )
