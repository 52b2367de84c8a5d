"""Regression tests for the sources/streaming/functions review fixes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_datalake_spark.functions.pgcompat import pg_date_bin, pg_div, pg_to_char_pattern
from pg_datalake_spark.sources import copy_to, read_files


def test_pg_div_exact_beyond_double_precision(spark):
    """Integer division must be exact past 2^53 (a double quotient
    rounds)."""
    df = spark.createDataFrame(
        [(9007199254740995, 2), (-9007199254740995, 2), (7, 2), (-7, 2), (4, 10)],
        "a long, b long",
    )
    got = [r.q for r in df.select(pg_div(F.col("a"), F.col("b")).alias("q")).collect()]
    assert got == [4503599627370497, -4503599627370497, 3, -3, 0]


def test_pg_date_bin_far_origin(spark):
    """Bucket math must stay exact for offsets beyond 2^53 µs."""
    df = spark.createDataFrame([("2026-08-13 10:37:22",)], "s string").select(
        F.col("s").cast("timestamp_ntz").alias("ts")
    )
    got = df.select(
        pg_date_bin(900, F.col("ts"), "0001-01-01 00:00:00").cast("string").alias("b")
    ).first()[0]
    assert got == "2026-08-13 10:30:00"


def test_to_char_unsupported_tokens_raise():
    assert pg_to_char_pattern("YYYY-MM-DD HH24:MI:SS") == "yyyy-MM-dd HH:mm:ss"
    with pytest.raises(ValueError, match="MON"):
        pg_to_char_pattern("MON YYYY")
    with pytest.raises(ValueError, match="pattern letter"):
        pg_to_char_pattern("YYYY-Q")


def test_tsv_reads_tab_delimited(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("a\tb\n1\tx\n2\ty\n")
    df = read_files(spark, str(p))
    assert df.columns == ["a", "b"]
    assert df.count() == 2


def test_copy_to_explicit_fmt_still_compresses(spark, tmp_path):
    import glob
    import gzip

    out = str(tmp_path / "x.csv.gz")
    copy_to(spark.range(5).selectExpr("id"), out, fmt="csv", single_file=True)
    parts = glob.glob(out + "/part-*.csv.gz")
    assert parts, "expected gzip part files"
    with gzip.open(parts[0], "rt") as f:
        assert f.readline().strip() == "id"


def test_rollup_survives_all_null_value_batch(spark, tmp_path):
    from pg_datalake_spark.streaming.rollup import create_rollup, refresh_rollup

    events1 = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 1, "view", 5.0)],
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).select("event_id", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "user_id", "event_type", "value")
    events2 = events1.withColumn("value", F.lit(None).cast("double")).withColumn(
        "event_id", F.lit(2)
    )
    r = create_rollup(spark, str(tmp_path / "ru"))
    refresh_rollup(r, events1)
    refresh_rollup(r, events2)  # all-NULL delta must not wipe the total
    row = r.scan().select("n_events", "total_value").first()
    assert row.n_events == 2
    assert row.total_value == 5.0


def test_merge_into_null_delete_predicate_keeps_row(spark, tmp_path):
    """ANSI MERGE: a WHEN MATCHED DELETE condition that evaluates to
    NULL is NOT satisfied — the matched row must be kept (round-6
    advice: ~(matched & NULL) was NULL and filter() dropped the row)."""
    from pg_datalake_spark.tables.iceberg_external import (
        export_iceberg_snapshot,
        merge_into,
        read_iceberg_table,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    loc = str(tmp_path / "mnull")
    export_iceberg_snapshot(base, loc)
    # flag is NULL for k=1 (predicate NULL -> keep), true for k=2
    # (delete), false for k=3 (keep)
    source = spark.createDataFrame(
        [(1, None), (2, True), (3, False)], "k long, flag boolean"
    )
    merge_into(
        spark, loc, source, on=["k"],
        when_matched_delete="src.flag",
        insert_not_matched=False,
    )
    kept = {r.k for r in read_iceberg_table(spark, loc).collect()}
    assert kept == {1, 3}


def test_time_weighted_avg_duplicate_timestamps_deterministic(spark):
    """Duplicate timestamps in a group: the (ts, value) two-key order
    decides which observation gets a zero holding span, making tw_avg
    deterministic across engines and partitionings (round-6 advice)."""
    from pg_datalake_spark.operators.timeseries import time_weighted_avg

    df = spark.createDataFrame(
        [("g", 0, 200), ("g", 0, 100)], "grp string, t_us long, cents long"
    )
    rows = []
    for parts in (1, 4):
        out = time_weighted_avg(
            df.repartition(parts), "t_us", "cents", ["grp"], 1000
        ).collect()
        assert len(out) == 1
        rows.append((out[0].n_obs, out[0].covered_us, out[0].tw_avg))
    # smaller cents sorts first -> gets _dt=0; the 200-cent row holds
    # the full 1000 us bucket: tw_avg = 200*1000/1000/100 = 2.0
    assert rows[0] == rows[1] == (2, 1000, 2.0)


def test_rest_catalog_table_name_urlencoded():
    """Table names with reserved characters must be percent-encoded in
    REST paths, mirroring the namespace handling (round-6 advice)."""
    from pg_datalake_spark.tables.rest_catalog import RestCatalogClient

    calls = []

    def fake_request(self, method, path, body=None, params=None):
        calls.append((method, path))
        return {}

    orig = RestCatalogClient._request
    RestCatalogClient._request = fake_request
    try:
        client = RestCatalogClient("http://ex.org", token="t")
        client.load_table("ns one", "tbl/we ird#name")
        client.commit_snapshot(
            "ns one", "tbl/we ird#name", "file:///m/v2.metadata.json",
            "uuid-1", None, {"snapshot-id": 1},
        )
    finally:
        RestCatalogClient._request = orig
    get_path = calls[1][1]
    post_path = calls[2][1]
    assert get_path.endswith("/namespaces/ns%20one/tables/tbl%2Fwe%20ird%23name")
    assert post_path.endswith("/namespaces/ns%20one/tables/tbl%2Fwe%20ird%23name")


def test_merge_delta_null_delete_predicate_keeps_row(spark, tmp_path):
    """Delta MERGE: a WHEN MATCHED DELETE condition evaluating to NULL
    is NOT satisfied — the matched row must be updated/kept, not
    silently deleted (round-10 advice: is_match & NULL was NULL and
    filter(~drop_row) excluded the row)."""
    from pg_datalake_spark.tables import delta_log as dl

    loc = str(tmp_path / "mnull_delta")
    dl.write_delta_table(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
        ),
        loc,
    )
    # nv is NULL for k=1 → 's.nv < 0' is NULL → keep+update; k=2
    # deletes (-1 < 0); k=3 keeps+updates (5 < 0 is false).
    source = spark.createDataFrame(
        [(1, None), (2, -1.0), (3, 5.0)], "k long, nv double"
    )
    dl.merge_delta(
        spark, loc, source, on="t.k = s.k",
        when_matched_update={"v": "t.v + 1"},
        when_matched_delete="s.nv < 0",
        when_not_matched_insert=False,
    )
    got = {r.k: r.v for r in dl.read_delta_table(spark, loc).collect()}
    assert got == {1: 11.0, 3: 31.0}


def test_delta_stream_schema_evolution_reads_nulls(spark, tmp_path):
    """Streaming a Delta table across an ADD COLUMN: files written
    before the evolution must stream the new column as typed NULLs —
    get_field_index(-1) must never silently bind the LAST physical
    column under the new name (round-10 advice)."""
    import pyspark.sql.functions as F

    from pg_datalake_spark.sources.delta_stream_source import (
        DeltaStreamDataSource,
    )
    from pg_datalake_spark.tables import delta_log as dl

    loc = str(tmp_path / "t_evo")
    dl.write_delta_table(
        spark.createDataFrame([(0, "a"), (1, "b")], "k long, tag string"),
        loc,
    )                                                               # v0
    dl.add_column_delta(spark, loc, "extra", "double")              # v1
    dl.append_delta(
        spark.createDataFrame([(2, "c", 9.5)],
                              "k long, tag string, extra double"),
        loc,
    )                                                               # v2

    spark.dataSource.register(DeltaStreamDataSource)
    sink = str(tmp_path / "sink_evo")
    q = (
        spark.readStream.format("pglake_delta")
        .option("path", loc)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_evo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.k: (r.tag, r.extra)
           for r in spark.read.parquet(sink).collect()}
    # pre-evolution rows: extra is NULL, tag is NOT misbound
    assert got == {0: ("a", None), 1: ("b", None), 2: ("c", 9.5)}


def test_stream_partition_literal_types_and_fail_loud():
    """Partition-value literals re-typed beyond the r10 map: timestamp,
    decimal, smallint; unknown complex types fail loud instead of
    silently emitting strings (round-10 advice)."""
    import datetime as dt
    import decimal

    import pyarrow as pa
    import pytest as _pt

    from pg_datalake_spark.sources.delta_stream_source import (
        _typed_literal_array,
    )

    arr = _typed_literal_array("2026-01-02 03:04:05", "timestamp", 2)
    assert pa.types.is_timestamp(arr.type)
    assert arr[0].as_py().replace(tzinfo=None) == dt.datetime(2026, 1, 2, 3, 4, 5)
    arr = _typed_literal_array("12.50", "decimal(9,2)", 1)
    assert pa.types.is_decimal(arr.type)
    assert arr[0].as_py() == decimal.Decimal("12.50")
    arr = _typed_literal_array("7", "smallint", 1)
    assert arr.type == pa.int16()
    arr = _typed_literal_array(None, "decimal(9,2)", 3)
    assert arr.null_count == 3 and pa.types.is_decimal(arr.type)
    with _pt.raises(NotImplementedError, match="array"):
        _typed_literal_array("x", "array<int>", 1)


def test_stage_zip_basename_collision_raises(spark, tmp_path):
    """Two archive members sharing a basename in different zip
    subdirectories must fail loud at staging instead of silently
    overwriting each other (round-10 advice); zip_path still
    disambiguates."""
    import zipfile

    import pytest as _pt

    from pg_datalake_spark.sources.gdal_dispatch import read_gdal

    kml = (
        '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
        "<Placemark><name>{nm}</name><Point><coordinates>"
        "{x},{y}</coordinates></Point></Placemark></Document></kml>"
    )
    kmz = str(tmp_path / "multi.kmz")
    with zipfile.ZipFile(kmz, "w") as z:
        z.writestr("a/pts.kml", kml.format(nm="A", x=1.0, y=2.0))
        z.writestr("b/pts.kml", kml.format(nm="B", x=3.0, y=4.0))
    with _pt.raises(ValueError, match="pts.kml"):
        read_gdal(spark, kmz)
    rows = read_gdal(spark, kmz, zip_path="b/pts.kml").collect()
    assert len(rows) == 1


def test_pg_grouping_agg_empty_input_grand_total(spark):
    """PG/DuckDB emit the () grand-total row over EMPTY input; Spark's
    rollup/cube return an empty relation (differential-fuzzer find,
    r12). pg_grouping_agg restores the row on empty input and must NOT
    double-emit it on non-empty input."""
    from pyspark.sql import functions as F

    from pg_datalake_spark.functions.pgcompat import pg_grouping_agg

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)], "k int, g string, v double"
    )
    aggs = [F.count(F.lit(1)).alias("n"),
            F.max("v").alias("mx")]

    # empty input: exactly one row, NULL keys, grouping()=1, n=0, mx NULL
    out = pg_grouping_agg(
        df.where(F.col("k") < 0), ["g"], aggs,
        kind="rollup", groupings=[("gg", "g")],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.g is None and r.gg == 1 and r.n == 0 and r.mx is None

    # non-empty input: same rows as plain rollup (no extra grand total)
    out2 = pg_grouping_agg(df, ["g"], aggs, kind="rollup",
                           groupings=[("gg", "g")])
    plain = df.rollup("g").agg(
        F.grouping("g").cast("int").alias("gg"), *aggs)
    key = lambda row: tuple(repr(v) for v in row)  # noqa: E731 (None-safe)
    assert sorted(map(tuple, out2.collect()), key=key) == sorted(
        map(tuple, plain.collect()), key=key)

    # cube over two keys, empty input: still exactly the one () row
    df2 = df.where(F.col("k") < 0)
    out3 = pg_grouping_agg(df2, ["g", "k"], aggs, kind="cube").collect()
    assert len(out3) == 1 and out3[0].g is None and out3[0].k is None


def test_pg_limit_with_ties_matches_rank(spark):
    """r13 (VERDICT #1): the threshold-prefilter WITH TIES rewrite must
    be row-identical to rank() <= k across tie shapes, and its plan
    must contain NO WindowExec at all."""
    from pyspark.sql import Window as W

    from pg_datalake_spark.functions.pgcompat import pg_limit_with_ties

    def naive(df, col, k, desc):
        o = F.desc_nulls_last(col) if desc else F.asc_nulls_last(col)
        return df.withColumn("__r", F.rank().over(W.orderBy(o))).filter(
            F.col("__r") <= k
        ).drop("__r")

    cases = [
        [5, 5, 3, 3, 3],          # ties straddle the cut
        [5, 4, 3, 3, 3],          # ties AT the cut expand the result
        [5, 5, 5, 4],             # ties above the cut
        [7],                      # fewer rows than k
        [],                       # empty input
        [None, None, 5, 4, 3],    # nulls sort last, never in top-k
        [None, None, None],       # all-null: everything ties at rank 1
        [4, None, None],          # nulls tie in when non-nulls < k
    ]
    for vals in cases:
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id int, v int"
        )
        for desc in (True, False):
            for k in (1, 2, 3):
                got = sorted(
                    (r.id, r.v)
                    for r in pg_limit_with_ties(
                        df, "v", k, descending=desc
                    ).collect()
                )
                want = sorted(
                    (r.id, r.v) for r in naive(df, "v", k, desc).collect()
                )
                assert got == want, (vals, desc, k, got, want)
    plan = pg_limit_with_ties(
        spark.range(10).withColumnRenamed("id", "v"), "v", 3
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_pg_distributed_ntile_matches_builtin(spark):
    """r13 (VERDICT #5): range-partitioned ntile must equal
    F.ntile(n) OVER (ORDER BY ...) for every (rows, n) shape —
    including total < n, total % n != 0 — and put no unpartitioned
    window over anything bigger than the per-partition count table."""
    from pyspark.sql import Window as W

    from pg_datalake_spark.functions.pgcompat import pg_distributed_ntile

    for rows, n in [(0, 4), (3, 10), (10, 3), (17, 4), (100, 7), (8, 8)]:
        df = spark.range(rows).select(
            F.col("id"), (F.col("id") * 37 % 11).alias("v")
        )
        got = {
            r.id: r.t
            for r in pg_distributed_ntile(
                df, n, ["v", "id"], alias="t"
            ).collect()
        }
        want = {
            r.id: r.t
            for r in df.withColumn(
                "t", F.ntile(n).over(W.orderBy("v", "id"))
            ).collect()
        }
        assert got == want, (rows, n)
    # consistency contract: the counts branch must READ the main
    # branch's range shuffle (boundaries are sampled per-evaluation;
    # two independent evaluations could disagree on row->partition)
    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("v"))
    out = pg_distributed_ntile(df, 4, ["v", "id"], alias="t")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan and "rangepartitioning" in plan


def test_pg_rank_helpers_hypothesis(spark):
    """Hypothesis (r13): pg_distributed_ntile / pg_distributed_row_number
    match the built-in window forms on random (row count, duplicate-
    heavy key domain, tile count) shapes — the unique id tiebreak makes
    the order total, which is the helpers' documented requirement."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import Window as W

    from pg_datalake_spark.functions.pgcompat import (
        pg_distributed_ntile,
        pg_distributed_row_number,
    )

    @given(
        st.integers(0, 400),    # rows
        st.integers(1, 17),     # tiles
        st.integers(1, 50),     # key modulus (duplicate density)
        st.integers(0, 2**31),  # value scramble
    )
    @settings(max_examples=15, deadline=None)
    def check(rows, n, mod, scramble):
        df = spark.range(rows).select(
            F.col("id"), ((F.col("id") + scramble) * 2654435761 % mod).alias("v")
        )
        got_nt = {
            r.id: r.t
            for r in pg_distributed_ntile(df, n, ["v", "id"], alias="t").collect()
        }
        want_nt = {
            r.id: r.t
            for r in df.withColumn(
                "t", F.ntile(n).over(W.orderBy("v", "id"))
            ).collect()
        }
        assert got_nt == want_nt, (rows, n, mod)
        got_rn = {
            r.id: r.rn
            for r in pg_distributed_row_number(
                df, ["v", "id"], alias="rn"
            ).collect()
        }
        want_rn = {
            r.id: r.rn
            for r in df.withColumn(
                "rn", F.row_number().over(W.orderBy("v", "id"))
            ).collect()
        }
        assert got_rn == want_rn, (rows, n, mod)

    check()


def test_pg_limit_with_ties_hypothesis(spark):
    """Hypothesis (r13): the threshold-prefilter WITH TIES equals
    rank() <= k on random value lists with heavy duplication and
    nulls, both directions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import Window as W

    from pg_datalake_spark.functions.pgcompat import pg_limit_with_ties

    vals = st.lists(
        st.one_of(st.none(), st.integers(-5, 5)), min_size=0, max_size=60
    )

    @given(vals, st.integers(1, 8), st.booleans())
    @settings(max_examples=25, deadline=None)
    def check(xs, k, desc):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(xs)], "id int, v int"
        )
        o = F.desc_nulls_last("v") if desc else F.asc_nulls_last("v")
        want = sorted(
            (r.id, r.v)
            for r in df.withColumn("__r", F.rank().over(W.orderBy(o)))
            .filter(F.col("__r") <= k)
            .collect()
        )
        got = sorted(
            (r.id, r.v)
            for r in pg_limit_with_ties(df, "v", k, descending=desc).collect()
        )
        assert got == want, (xs, k, desc)

    check()
