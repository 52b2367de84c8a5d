"""As-of (backward) join.

The reference has no dedicated as-of operator (plain theta join —
SURVEY §2.3 "range/interval/as-of joins"), but a theta join
``r.t <= l.t`` + argmax explodes quadratically. This implementation is
the scalable composition: tag both sides, union, and take the running
``last(right payload) ignore nulls`` over a window keyed by the join
key and ordered by time — one shuffle on the key, linear work,
no Python.

At 100 TB this is the right shape: a single hash-partition by key and
an in-partition sort (both AQE-managed), versus a broadcast/NL join
that cannot scale on the right side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_time] <= left[left_time]``, matched on ``on``.

    Right payload columns (everything except ``on``) are appended to
    the left row; a payload column whose name collides with a left
    column comes out suffixed ``_right`` (pd.merge_asof convention).
    Rows with no match get NULLs. Ties at equal time match (inclusive
    bound): right rows sort before left rows at the same instant, and
    equal-time right rows are tie-broken by the payload struct itself
    so the result is deterministic.
    """
    payload_cols = [c for c in right.columns if c != on]
    out_names = {
        c: (f"{c}_right" if c in left.columns else c) for c in payload_cols
    }
    # SQL semantics: a right row with NULL time never satisfies
    # r.t <= l.t, and a NULL key never equals anything — without this
    # filter such rows sort NULLS FIRST in the window and become a
    # phantom running match for every left row in the partition
    right = right.filter(F.col(right_time).isNotNull() & F.col(on).isNotNull())
    l_tagged = left.select(
        F.col(on),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast(
            right.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType.simpleString()
        ).alias("__rrow"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None)
        .cast(left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType.simpleString())
        .alias("__lrow"),
        F.struct(*payload_cols).alias("__rrow"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(on)
        .orderBy("__t", "__is_left", "__rrow")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        unioned.withColumn("__match", F.last("__rrow", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"__match.{c}").alias(out_names[c]) for c in payload_cols
    ]
    return matched.select(*out_cols)
