"""Skew-resistant aggregation: two-phase salted group-by.

Hot grouping keys concentrate a shuffle onto single reducers; salting
splits each key across ``salt`` sub-partitions for the partial phase
and re-combines in a second, tiny aggregation. Spark's map-side
partial aggregation already mitigates this for algebraic aggregates —
the explicit salt matters when partial aggregation is defeated (high
per-key cardinality of distinct intermediate state, collect_list-like
aggregates) or for skewed JOIN keys (there, prefer AQE skew-join,
enabled in build_session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    salt: int = 16,
) -> DataFrame:
    """count(*) + sum(cols) per key, shuffled as key×salt then
    recombined. Result is identical to a plain groupBy — only the
    shuffle distribution changes."""
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )
