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

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the as-of matching right row on
    ``on`` — pd.merge_asof's surface, composed from windows:

    - ``direction="backward"`` (default): latest right with
      ``rt <= lt``;
    - ``direction="forward"``: earliest right with ``rt >= lt``
      (the same union + running-last, traversed in reverse);
    - ``direction="nearest"``: whichever of the two is closer in
      time (ties prefer backward, like pandas).

    ``tolerance`` (optional): matches farther than this from the left
    time are nulled out; must be comparable with the time-column
    difference (numeric times → numeric tolerance; timestamps → a
    ``F.expr("INTERVAL ...")`` column).

    Right payload columns (everything except ``on``) are appended to
    the left row; a payload column whose name collides with a left
    column comes out suffixed ``_right`` (pd.merge_asof convention).
    Rows with no match get NULLs. Ties at equal time match (inclusive
    bound): right rows sort before left rows at the same instant, and
    equal-time right rows are tie-broken by the payload struct itself
    so the result is deterministic. Still one shuffle on the key
    (nearest runs two window passes over the same partitioning —
    Catalyst reuses the exchange).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")
    payload_cols = [c for c in right.columns if c != on]
    out_names = {
        c: (f"{c}_right" if c in left.columns else c) for c in payload_cols
    }
    # carry the right time inside the payload struct so tolerance /
    # nearest can measure the match distance after the window
    payload_struct = lambda: F.struct(
        F.col(right_time).alias("__rt"), *[F.col(c) for c in payload_cols]
    )
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
            right.select(payload_struct().alias("s")).schema["s"].dataType.simpleString()
        ).alias("__rrow"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None)
        .cast(left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType.simpleString())
        .alias("__lrow"),
        payload_struct().alias("__rrow"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w_back = (
        W.partitionBy(on)
        .orderBy(F.asc("__t"), F.asc("__is_left"), F.asc("__rrow"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # reverse traversal: at equal time right rows (is_left=0) must
    # still precede left rows, and equal-time right ties must resolve
    # to the SAME row as a forward scan would (smallest payload)
    w_fwd = (
        W.partitionBy(on)
        .orderBy(F.desc("__t"), F.asc("__is_left"), F.desc("__rrow"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    if direction == "backward":
        matched = unioned.withColumn(
            "__match", F.last("__rrow", ignorenulls=True).over(w_back)
        )
    elif direction == "forward":
        matched = unioned.withColumn(
            "__match", F.last("__rrow", ignorenulls=True).over(w_fwd)
        )
    else:  # nearest
        matched = (
            unioned.withColumn("__b", F.last("__rrow", ignorenulls=True).over(w_back))
            .withColumn("__f", F.last("__rrow", ignorenulls=True).over(w_fwd))
            .withColumn(
                "__match",
                F.when(F.col("__b").isNull(), F.col("__f"))
                .when(F.col("__f").isNull(), F.col("__b"))
                .when(
                    # ties prefer backward (pandas convention)
                    (F.col("__t") - F.col("__b.__rt"))
                    <= (F.col("__f.__rt") - F.col("__t")),
                    F.col("__b"),
                )
                .otherwise(F.col("__f")),
            )
        )
    matched = matched.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        dist = F.abs(F.col("__t") - F.col("__match.__rt"))
        matched = matched.withColumn(
            "__match", F.when(dist <= tol, F.col("__match"))
        )
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"__match.{c}").alias(out_names[c]) for c in payload_cols
    ]
    return matched.select(*out_cols)
