"""Runtime guards for the distributed-rank core (r14, VERDICT item 5 +
ADVICE items 1–2).

`_distributed_global_position` (functions/pgcompat.py) leans on two
Spark implementation details that are correct today but version-
coupled: (a) `monotonically_increasing_id` packs
(partitionId << 33) | rowIndexInPartition, so ids are contiguous
within a partition; (b) the counts branch and the main branch read ONE
physical range exchange via the ReuseExchange rule. Both were asserted
only by plan-shape unit tests under default conf — these tests pin the
new in-plan / driver-side guards that fail LOUD instead of returning
wrong ranks when either assumption breaks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_datalake_spark.functions.pgcompat import (
    _guarded_min_mid,
    _shuffle_partition_count,
    pg_distributed_row_number,
)


def test_guarded_min_mid_passes_on_contiguous_ids(spark):
    df = spark.createDataFrame(
        [(0, 4, 5)], "m0 long, m1 long, c long"
    ).select(
        _guarded_min_mid(F.col("m0"), F.col("m1"), F.col("c")).alias("v")
    )
    assert df.collect()[0].v == 0


def test_guarded_min_mid_spoofed_violation_fails_loud(spark):
    # max - min + 1 != count — the invariant a changed id packing or a
    # non-contiguous partition replay would break
    df = spark.createDataFrame(
        [(0, 5, 3)], "m0 long, m1 long, c long"
    ).select(
        _guarded_min_mid(F.col("m0"), F.col("m1"), F.col("c")).alias("v")
    )
    with pytest.raises(Exception, match="not contiguous"):
        df.collect()


def test_exchange_reuse_off_fails_loud(spark):
    df = spark.range(100).withColumn("k", F.col("id") % 7)
    prev = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        with pytest.raises(RuntimeError, match="exchange.reuse"):
            pg_distributed_row_number(df, ["k", "id"])
    finally:
        spark.conf.set("spark.sql.exchange.reuse", prev)
    # and with the conf restored the helper still works end-to-end
    rows = (
        pg_distributed_row_number(df, ["k", "id"], alias="rn")
        .orderBy("rn")
        .limit(3)
        .collect()
    )
    assert [r.rn for r in rows] == [1, 2, 3]


def test_shuffle_partition_count_auto_falls_back(spark):
    class _Conf:
        def get(self, key):
            return "auto"

    class _Stub:
        conf = _Conf()
        sparkContext = spark.sparkContext

    assert _shuffle_partition_count(_Stub()) == (
        spark.sparkContext.defaultParallelism
    )
    assert _shuffle_partition_count(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
