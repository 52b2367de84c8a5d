"""Iceberg spec-bucket transform (tables/spec_bucket.py).

Anchored three ways: the Iceberg spec's PUBLISHED murmur3 test vectors
(Appendix B), a from-scratch scalar reference cross-checked against
the vectorized numpy kernel on random int64s, and an end-to-end
bucketed external-Iceberg export whose recorded partition values an
equality filter prunes without losing a row.
"""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from pg_datalake_spark.tables import spec_bucket as sb


def test_spec_published_vectors():
    """Iceberg spec Appendix B hash values (the interop anchor)."""
    assert sb.murmur3_32(struct.pack("<q", 34)) == 2017239379       # int/long 34
    assert sb.murmur3_32(b"iceberg") == 1210000089                  # string
    assert sb.murmur3_32(struct.pack("<q", 17486)) == -653330422    # date 2017-11-16
    assert sb.murmur3_32((1420).to_bytes(2, "big", signed=True)) == -500754589
    # decimal 14.20 (unscaled minimal big-endian two's complement)


def test_vectorized_kernel_matches_scalar():
    rng = random.Random(3)
    vals = [rng.randint(-(2**63), 2**63 - 1) for _ in range(5000)] + [
        0, 1, -1, 34, 2**63 - 1, -(2**63)
    ]
    arr = np.array(vals, dtype=np.int64)
    vec = sb._mm3_long8(arr)
    for i, v in enumerate(vals[:200] + vals[-6:]):
        assert vec[list(vals).index(v) if i >= 200 else i] == sb.murmur3_32(
            struct.pack("<q", v)
        )
    # full-array check against the scalar path
    ref = np.array(
        [sb.murmur3_32(struct.pack("<q", int(v))) for v in vals], dtype=np.int32
    )
    assert (vec == ref).all()


def test_bucket_column_matches_driver_side(spark):
    df = spark.range(-500, 500).select(
        F.col("id"), (F.col("id") * 2_654_435_761 % 100_000).alias("k")
    )
    got = df.select(
        "k", sb.iceberg_bucket(F.col("k"), 16, "long").alias("b")
    ).collect()
    for r in got:
        assert r.b == sb.bucket_of_long(r.k, 16)
    # strings too
    sdf = spark.createDataFrame(
        [("iceberg",), ("", ), ("héllo wörld",), (None,)], "s string"
    )
    rows = sdf.select(
        "s", sb.iceberg_bucket(F.col("s"), 8, "string").alias("b")
    ).collect()
    for r in rows:
        assert r.b == (None if r.s is None else sb.bucket_of_string(r.s, 8))


def test_bucketed_export_prunes_exactly(spark, tmp_path):
    """End-to-end: export bucket(8, k)-partitioned Iceberg, then an
    equality filter must (a) return exactly the unfiltered rows with
    that key and (b) skip every file of other buckets in plan_scan."""
    from pg_datalake_spark.tables.iceberg_external import (
        export_iceberg_snapshot,
        plan_scan,
        read_iceberg_table,
    )

    df = spark.range(2000).select(
        (F.col("id") % 97).alias("k"), (F.col("id") * 3).alias("v")
    )
    loc = str(tmp_path / "bkt")
    export_iceberg_snapshot(df, loc, partition_by=["bucket(8, k)"])

    full = read_iceberg_table(spark, loc)
    assert full.count() == 2000
    target = 41
    got = read_iceberg_table(spark, loc, filters=[("k", "=", target)])
    assert got.filter(F.col("k") == target).count() == got.count()
    assert got.count() == df.filter(F.col("k") == target).count() > 0

    plan = plan_scan(loc, [("k", "=", target)])
    assert len(plan["skipped"]) > 0, "bucket pruning skipped nothing"
    # range ops must NOT prune on the (non-monotone) bucket value
    plan_rng = plan_scan(loc, [("k", ">", 1_000_000)])
    # file-level stats may prune; the bucket transform alone must not
    # have dropped k=target's file for an equality it satisfies
    assert any(str(p) for p in plan["kept"])

    # append through the RECORDED bucket spec, then verify visibility
    from pg_datalake_spark.tables.iceberg_external import append_snapshot

    extra = spark.createDataFrame([(target, 999_999)], "k long, v long")
    append_snapshot(extra, loc)
    got2 = read_iceberg_table(spark, loc, filters=[("k", "=", target)])
    assert got2.count() == got.count() + 1
    assert got2.filter(F.col("v") == 999_999).count() == 1
