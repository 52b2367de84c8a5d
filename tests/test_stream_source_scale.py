"""Scale probes for the Delta/Iceberg streaming sources (r11, VERDICT
item 5): offsets must resolve from the log/metadata alone with
O(commits-in-range) driver work per micro-batch — no per-batch
full-log replay. These tests drive the reader API directly (the same
calls the Structured Streaming engine makes) with the file-parsing
entry points instrumented, so a regression to cumulative replay is a
loud count assertion, not a slow stream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

# r16: randomized differential sweeps and stress probes run in the
# explicit fuzz tier (pytest -m fuzz) — the default `pytest tests/`
# must finish inside the driver's verify budget (VERDICT r15 item 6).
pytestmark = pytest.mark.fuzz


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("b")
    )


def test_delta_stream_per_batch_work_is_o_new_commits(
    spark, tmp_path, monkeypatch
):
    """30-commit Delta log, 3 simulated micro-batches of 10 commits:
    each batch parses EXACTLY its own commit files; latestOffset
    parses none (directory listing only); reader init's metaData scan
    is a one-time O(commits) walk, never repeated per batch."""
    from pg_datalake_spark.sources import delta_stream_source as dss
    from pg_datalake_spark.tables import delta_log as dl

    loc = str(tmp_path / "t")
    dl.write_delta_table(_mk(spark, 0, 10).coalesce(1), loc)  # v0
    for i in range(1, 30):
        dl.append_delta(_mk(spark, i * 10, i * 10 + 10).coalesce(1), loc)

    opened: list[int] = []
    orig = dss._commit_actions

    def spy(location, version):
        opened.append(version)
        return orig(location, version)

    monkeypatch.setattr(dss, "_commit_actions", spy)

    ds = dss.DeltaStreamDataSource({"path": loc})
    schema = ds.schema()
    opened.clear()
    reader = dss.DeltaStreamReader(schema, {"path": loc})
    # init scans newest->oldest until the metaData action (v0 here):
    # one-time O(commits), not per-batch
    assert sorted(set(opened)) == list(range(30))
    init_opens = len(opened)
    assert init_opens == 30

    # latestOffset: listing only, zero commit bodies parsed
    opened.clear()
    assert reader.latestOffset() == {"version": 29}
    assert opened == []

    # three micro-batches of 10 commits each: each parses exactly its
    # own range — cumulative replay would re-open earlier versions
    for b in range(3):
        opened.clear()
        parts = reader.partitions(
            {"version": b * 10 - 1}, {"version": b * 10 + 9}
        )
        assert sorted(set(opened)) == list(range(b * 10, b * 10 + 10))
        assert len(opened) == 10
        assert len(parts) == 10  # one coalesced add file per commit


def test_iceberg_stream_per_batch_manifests_are_o_new_snapshots(
    spark, tmp_path, monkeypatch
):
    """12-snapshot Iceberg table, 3 simulated micro-batches of 4
    snapshots: each batch reads only the NEW snapshots' manifest
    lists + their added manifests (carried-forward manifests are
    skipped before entry decode); latestOffset reads metadata.json
    only — zero Avro."""
    from pg_datalake_spark.sources import iceberg_stream_source as iss
    from pg_datalake_spark.tables import avro_codec
    from pg_datalake_spark.tables import iceberg_external as ie

    loc = str(tmp_path / "t")
    ie.export_iceberg_snapshot(_mk(spark, 0, 10).coalesce(1), loc)  # seq 1
    for i in range(1, 12):
        ie.append_snapshot(
            _mk(spark, i * 10, i * 10 + 10).coalesce(1), loc
        )  # seq 2..12

    avro_reads: list[str] = []
    orig = avro_codec.read_avro

    def spy(path, *a, **kw):
        avro_reads.append(path)
        return orig(path, *a, **kw)

    # the reader module imports read_avro inside partitions() from
    # tables.avro_codec — patch at the source
    monkeypatch.setattr(avro_codec, "read_avro", spy)
    monkeypatch.setattr(iss, "read_avro", spy, raising=False)

    ds = iss.IcebergStreamDataSource({"path": loc})
    schema = ds.schema()
    import pyspark.sql.types as T

    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    reader = iss.IcebergStreamReader(schema, {"path": loc})

    avro_reads.clear()
    assert reader.latestOffset() == {"seq": 12}
    assert avro_reads == []  # metadata.json only

    for b in range(3):
        avro_reads.clear()
        lo, hi = b * 4, b * 4 + 4
        parts = reader.partitions({"seq": lo}, {"seq": hi})
        assert len(parts) == 4  # one added file per snapshot
        # per new snapshot: its manifest list + each ADDED manifest.
        # Iceberg appends carry the full manifest set forward in the
        # list, but only the snapshot's own ADDED manifests are decoded
        # — so reads stay O(new snapshots), not O(history)²
        n_lists = sum(1 for p in avro_reads if "snap-" in p.rsplit("/", 1)[-1])
        n_manifests = len(avro_reads) - n_lists
        assert n_lists == 4
        assert n_manifests == 4, avro_reads


def test_iceberg_stream_manifest_reads_do_not_grow_with_history(
    spark, tmp_path, monkeypatch
):
    """The decisive scale law: the NEWEST snapshot costs the same
    number of manifest decodes whether it is snapshot 2 or snapshot
    12 — per-batch work does not grow with table history."""
    from pg_datalake_spark.sources import iceberg_stream_source as iss
    from pg_datalake_spark.tables import avro_codec
    from pg_datalake_spark.tables import iceberg_external as ie

    loc = str(tmp_path / "t")
    ie.export_iceberg_snapshot(_mk(spark, 0, 10).coalesce(1), loc)
    for i in range(1, 12):
        ie.append_snapshot(_mk(spark, i * 10, i * 10 + 10).coalesce(1), loc)

    avro_reads: list[str] = []
    orig = avro_codec.read_avro

    def spy(path, *a, **kw):
        avro_reads.append(path)
        return orig(path, *a, **kw)

    monkeypatch.setattr(avro_codec, "read_avro", spy)
    monkeypatch.setattr(iss, "read_avro", spy, raising=False)

    ds = iss.IcebergStreamDataSource({"path": loc})
    schema = ds.schema()
    import pyspark.sql.types as T

    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    reader = iss.IcebergStreamReader(schema, {"path": loc})

    counts = []
    for seq in (2, 7, 12):
        avro_reads.clear()
        reader.partitions({"seq": seq - 1}, {"seq": seq})
        counts.append(len(avro_reads))
    # one manifest list + one added manifest, at any point in history
    assert counts[0] == counts[1] == counts[2] == 2, counts
