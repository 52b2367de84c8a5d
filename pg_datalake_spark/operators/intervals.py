"""Interval-overlap join via bin bucketing.

A naive overlap join (``a.start <= b.end AND b.start <= a.end``) is a
theta join — Spark can only execute it as a broadcast nested loop or a
cartesian product, both O(|A|·|B|). The scale path bins each interval
onto a coarse grid, joins on the bin key (an equi-join: hash
partitioned, AQE-planned), and re-checks the exact predicate on the
candidates; an interval of length L lands in ~L/bin + 1 bins, so the
fan-out is bounded and tunable. Same shape as the reference's band
joins and the banded LSH: equi-join keys manufactured from ranges.

Distinct-pairs dedup happens on (a_id, b_id) AFTER the residual
predicate, shuffling only true matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    bin_width: int,
    a_cols: tuple[str, str, str] = ("a_id", "a_start", "a_end"),
    b_cols: tuple[str, str, str] = ("b_id", "b_start", "b_end"),
) -> DataFrame:
    """All (a_id, b_id) pairs whose [start, end] intervals overlap
    (inclusive endpoints; start/end are numeric, e.g. epoch days).
    ``bin_width`` trades fan-out for candidate selectivity — set it
    near the typical interval length."""
    a_id, a_start, a_end = a_cols
    b_id, b_start, b_end = b_cols

    def binned(df: DataFrame, id_c: str, s_c: str, e_c: str) -> DataFrame:
        bins = F.sequence(
            F.floor(F.col(s_c) / bin_width), F.floor(F.col(e_c) / bin_width)
        )
        return df.select(id_c, s_c, e_c, F.explode(bins).alias("__bin"))

    cand = binned(a, a_id, a_start, a_end).join(
        binned(b, b_id, b_start, b_end), "__bin"
    )
    return (
        cand.filter(
            (F.col(a_start) <= F.col(b_end)) & (F.col(b_start) <= F.col(a_end))
        )
        .select(a_id, b_id)
        .distinct()
    )
