"""Source readers/writers and streaming ingestion unit tests
(FIXTURES.md §6 format/inference fixtures)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pg_datalake_spark.sources import (
    copy_to,
    infer_format,
    list_files,
    preview_schema,
    read_files,
)
from pg_datalake_spark.streaming import incremental_file_ingest
from tests.conftest import SF_DIR


def test_infer_format():
    assert infer_format("a/b.csv") == ("csv", None)
    assert infer_format("a/b.csv.gz") == ("csv", "gzip")
    assert infer_format("a/b.ndjson") == ("json", None)
    assert infer_format("a/*.parquet") == ("parquet", None)


def test_csv_roundtrip_with_options(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a;x", 2.5), (2, None, 3.5)], "id int, s string, v double"
    )
    out = str(tmp_path / "t.csv")
    copy_to(df, out, fmt="csv", sep=";", nullValue="\\N")
    back = read_files(spark, out, fmt="csv", sep=";", nullValue="\\N")
    assert back.count() == 2
    assert dict(back.dtypes)["v"] == "double"
    assert back.filter("s IS NULL").count() == 1
    assert back.filter("s = 'a;x'").count() == 1  # quoted field with delimiter


def test_filename_column_and_glob(spark, tmp_path):
    for i in range(3):
        spark.range(10).coalesce(1).withColumn("part", F.lit(i)).write.json(
            str(tmp_path / f"p{i}.json")
        )
    df = read_files(spark, str(tmp_path / "p*.json"), fmt="json", filename=True)
    assert df.count() == 30
    assert df.select("_filename").distinct().count() == 3


def test_list_files_and_preview(spark, tmp_path):
    listing = list_files(spark, f"{SF_DIR}/*.parquet")
    assert listing.count() == 10
    assert listing.filter(F.col("size_bytes") <= 0).count() == 0
    prev = preview_schema(spark, f"{SF_DIR}/lineitem.parquet")
    cols = {r.column_name: r.column_type for r in prev.collect()}
    assert cols["l_orderkey"] == "bigint"
    assert cols["l_shipdate"].startswith("timestamp")


def test_nested_json_inference(spark, tmp_path):
    p = str(tmp_path / "nested.json")
    with open(p, "w") as f:
        f.write('{"a": 1, "s": {"x": 2, "y": [1,2]}, "m": {"k": "v"}}\n')
        f.write('{"a": 2, "s": {"x": 3, "y": []}, "m": {"j": "w"}}\n')
    df = read_files(spark, p, fmt="json")
    assert df.select("s.x").count() == 2
    assert df.filter(F.col("a") == 1).select(F.explode("s.y")).count() == 2


def test_incremental_ingest_exactly_once(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(pa.table({"id": list(range(100))}), src + "/batch1.parquet")
    schema = spark.read.parquet(src).schema
    got = []

    def sink(df, bid):
        got.append(df.count())

    ck = str(tmp_path / "ckpt")
    incremental_file_ingest(spark, src + "/*", schema, ck, sink)
    assert sum(got) == 100
    # second drain with same checkpoint: nothing new
    incremental_file_ingest(spark, src + "/*", schema, ck, sink)
    assert sum(got) == 100
    # new file appears → only it is ingested
    pq.write_table(pa.table({"id": list(range(50))}), src + "/batch2.parquet")
    incremental_file_ingest(spark, src + "/*", schema, ck, sink)
    assert sum(got) == 150


def test_iceberg_stream_sink_exactly_once(spark, tmp_path):
    """Streaming → Iceberg: one snapshot per micro-batch; a crash
    replay (commit marker lost AFTER the snapshot landed) re-runs the
    batch with the same id and the sink skips it — the table never
    double-ingests."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_datalake_spark.streaming import iceberg_stream_sink
    from pg_datalake_spark.tables.iceberg_external import (
        iceberg_snapshots,
        read_iceberg_table,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(pa.table({"id": list(range(100))}), src + "/batch1.parquet")
    schema = spark.read.parquet(src).schema
    ck = str(tmp_path / "ckpt")
    loc = str(tmp_path / "ice")

    s1 = iceberg_stream_sink(spark, src + "/*", schema, ck, loc)
    assert s1["batches"] == 1 and s1["skipped"] == 0 and len(s1["snapshots"]) == 1
    assert read_iceberg_table(spark, loc).count() == 100

    # drained checkpoint: no new batches at all
    s2 = iceberg_stream_sink(spark, src + "/*", schema, ck, loc)
    assert s2["batches"] == 0
    # new file → new snapshot
    pq.write_table(pa.table({"id": list(range(50))}), src + "/batch2.parquet")
    s3 = iceberg_stream_sink(spark, src + "/*", schema, ck, loc)
    assert s3["batches"] == 1 and len(s3["snapshots"]) == 1
    assert read_iceberg_table(spark, loc).count() == 150

    # the crash window: snapshot committed but the source checkpoint
    # advance was lost → the engine re-delivers the batch with the
    # SAME id; the summary lookup must skip it (idempotent commit)
    from pg_datalake_spark.streaming import iceberg_commit_batch

    replay_df = spark.read.parquet(src + "/batch2.parquet")
    assert iceberg_commit_batch(replay_df, 1, loc, ck) is None  # already in
    assert read_iceberg_table(spark, loc).count() == 150
    # an UNSEEN batch id from the same stream commits normally
    snap = iceberg_commit_batch(replay_df, 99, loc, ck)
    assert snap is not None
    assert read_iceberg_table(spark, loc).count() == 200

    # ops are labeled in the snapshot history
    ops = [r.operation for r in iceberg_snapshots(spark, loc).collect()]
    assert ops == ["append", "append", "append"]

    # a deliberately NEW checkpoint is a new stream → re-ingests
    shutil.rmtree(ck)
    s5 = iceberg_stream_sink(spark, src + "/*", schema, str(tmp_path / "ck2"), loc)
    assert s5["skipped"] == 0 and len(s5["snapshots"]) == 1
    assert read_iceberg_table(spark, loc).count() == 350


def test_iceberg_commit_batch_retries_conflicts(spark, tmp_path, monkeypatch):
    """A concurrent writer advancing the table between the sink's read
    and commit raises CommitConflictError — the batch commit must
    reload and retry, not fail the stream."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_datalake_spark.streaming import iceberg_commit_batch
    from pg_datalake_spark.tables import iceberg_external as ice

    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(pa.table({"id": list(range(10))}), src + "/b.parquet")
    df = spark.read.parquet(src)
    loc = str(tmp_path / "ice")
    iceberg_commit_batch(df, 0, loc, "ck")

    real_append = ice.append_snapshot
    fails = {"n": 2}

    def flaky_append(d, location, extra_summary=None):
        if fails["n"] > 0:
            fails["n"] -= 1
            # simulate the other writer: claim the next version first
            meta_dir = os.path.join(location, "metadata")
            v = int(open(os.path.join(meta_dir, "version-hint.text")).read()) + 1
            with open(os.path.join(meta_dir, f"v{v}.metadata.json"), "x") as fh:
                fh.write("{}")
            try:
                return real_append(d, location, extra_summary=extra_summary)
            finally:
                # the conflicting claim is consumed; clean for the retry
                os.unlink(os.path.join(meta_dir, f"v{v}.metadata.json"))
        return real_append(d, location, extra_summary=extra_summary)

    monkeypatch.setattr(ice, "append_snapshot", flaky_append)
    snap = iceberg_commit_batch(df, 1, loc, "ck")
    assert snap is not None and fails["n"] == 0
    from pg_datalake_spark.tables.iceberg_external import read_iceberg_table

    assert read_iceberg_table(spark, loc).count() == 20


def test_file_exists_and_delete(spark, tmp_path):
    from pg_datalake_spark.sources.readers import delete_files, file_exists

    p = tmp_path / "a.csv"
    p.write_text("x,y\n1,2\n")
    assert file_exists(str(p))
    removed = delete_files(str(tmp_path / "*.csv"))
    assert removed == [str(p)]
    assert not file_exists(str(p))


def test_copy_to_partitioned(spark, tmp_path):
    """COPY TO with PARTITION_BY: hive-layout dirs, partition values
    recoverable on read, per-partition filters read only their files."""
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(i)) for i in range(30)],
        "id long, g string, v double",
    )
    out = str(tmp_path / "exp")
    copy_to(df, out, fmt="parquet", partition_by=["g"])
    dirs = {d for d in os.listdir(out) if d.startswith("g=")}
    assert dirs == {"g=g0", "g=g1", "g=g2"}
    back = spark.read.parquet(out)
    assert back.count() == 30
    assert back.filter("g = 'g1'").count() == 10

    with pytest.raises(ValueError, match="mutually exclusive"):
        copy_to(df, out, fmt="parquet", partition_by=["g"], single_file=True)


def test_delta_scan_dispatch(spark, tmp_path):
    """Delta scan (§2.1): read_files(format='delta') prefers the
    delta-spark DataSourceV2 when jars exist; offline it routes to the
    pure-Python _delta_log reader (r7 — tables/delta_log.py), so a
    real Delta table reads either way and a non-Delta path fails with
    a clear not-a-Delta-table error, never a classloader stack."""
    import pytest
    from pyspark.sql import functions as F

    from pg_datalake_spark.sources.readers import delta_available, read_files
    from pg_datalake_spark.tables.delta_log import write_delta_table

    missing = str(tmp_path / "not_a_table")
    os.makedirs(missing, exist_ok=True)
    with pytest.raises(Exception, match="[Dd]elta"):
        read_files(spark, missing, fmt="delta")

    path = str(tmp_path / "delta_t")
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    if delta_available(spark):
        df.write.format("delta").save(path)
    else:
        write_delta_table(df, path)
    back = read_files(spark, path, fmt="delta")
    assert back.count() == 10
    assert {r["id"] for r in back.collect()} == set(range(10))


def _hf_fixture(spark, root, org="acme", name="docs"):
    """Build a huggingface_hub-layout snapshot cache: refs/main ->
    snapshots/<commit> with convention-named parquet/csv shards."""
    import os

    commit = "0123456789abcdef0123456789abcdef01234567"
    repo = os.path.join(str(root), f"datasets--{org}--{name}")
    snap = os.path.join(repo, "snapshots", commit)
    os.makedirs(os.path.join(repo, "refs"))
    with open(os.path.join(repo, "refs", "main"), "w") as fh:
        fh.write(commit + "\n")
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    train = df.filter("id % 5 != 0")
    test = df.filter("id % 5 = 0")
    os.makedirs(os.path.join(snap, "default"))
    for i, part in enumerate(train.randomSplit([0.5, 0.5], seed=7)):
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(snap, "_stage")
        )
        import glob as g

        src = g.glob(os.path.join(snap, "_stage", "*.parquet"))[0]
        os.replace(
            src, os.path.join(snap, "default", f"train-{i:05d}-of-00002.parquet")
        )
    test.coalesce(1).write.mode("overwrite").parquet(os.path.join(snap, "_stage"))
    import glob as g

    src = g.glob(os.path.join(snap, "_stage", "*.parquet"))[0]
    os.replace(src, os.path.join(snap, "default", "test-00000-of-00001.parquet"))
    # a second config with a csv shard (mixed-format guard material)
    os.makedirs(os.path.join(snap, "alt"))
    with open(os.path.join(snap, "alt", "train.csv"), "w") as fh:
        fh.write("id,v\n1,10\n2,20\n")
    return str(root), df, train, test


def test_hf_offline_snapshot_read(spark, tmp_path):
    """r8: hf:// resolves against the PUBLIC huggingface_hub snapshot
    cache layout — refs/main indirection, shard-name convention,
    config/split filtering — with no network and no hf libraries."""
    from pg_datalake_spark.sources.readers import read_files

    cache, df, train, test = _hf_fixture(spark, tmp_path)
    got_train = read_files(
        spark, "hf://datasets/acme/docs", split="train", config="default",
        cache_dir=cache,
    )
    assert got_train.count() == train.count()
    assert {r.id for r in got_train.collect()} == {r.id for r in train.collect()}
    got_test = read_files(
        spark, "hf://acme/docs", split="test", config="default", cache_dir=cache
    )  # shorthand URL form
    assert {r.id for r in got_test.collect()} == {r.id for r in test.collect()}
    # explicit path-in-repo read + pinned revision ref
    one = read_files(
        spark,
        "hf://datasets/acme/docs@main/default/test-00000-of-00001.parquet",
        cache_dir=cache,
    )
    assert one.count() == test.count()
    # csv config reads through the csv reader
    alt = read_files(
        spark, "hf://datasets/acme/docs", config="alt", cache_dir=cache
    )
    assert alt.count() == 2 and set(alt.columns) == {"id", "v"}


def test_hf_offline_failure_modes(spark, tmp_path):
    import pytest

    from pg_datalake_spark.sources.hf_reader import parse_hf_url
    from pg_datalake_spark.sources.readers import read_files

    cache, *_ = _hf_fixture(spark, tmp_path)
    # repo not in cache -> loud recipe, not a resolver stack
    with pytest.raises(FileNotFoundError, match="snapshot_download"):
        read_files(spark, "hf://datasets/foo/bar", cache_dir=cache)
    # unknown revision -> loud, lists what's cached
    with pytest.raises(FileNotFoundError, match="snapshots present"):
        read_files(spark, "hf://datasets/acme/docs@deadbeef", cache_dir=cache)
    # no matching split -> loud, lists what exists
    with pytest.raises(FileNotFoundError, match="no data shards"):
        read_files(
            spark, "hf://datasets/acme/docs", split="validation", cache_dir=cache
        )
    # mixed formats across configs -> must disambiguate
    with pytest.raises(ValueError, match="mixed shard formats"):
        read_files(spark, "hf://datasets/acme/docs", split="train", cache_dir=cache)
    u = parse_hf_url("hf://datasets/a/b@rev/path/file.parquet")
    assert (u.org, u.name, u.revision, u.path_in_repo) == (
        "a", "b", "rev", "path/file.parquet"
    )


def test_csv_roundtrip_unicode_quotes_newlines(spark, tmp_path):
    """CSV dialect handling under hostile content: embedded commas,
    double quotes, newlines inside fields, and non-ASCII text must
    round-trip COPY TO → schema-inferred read exactly (the reference's
    sniffed-dialect path; Spark needs multiLine for quoted newlines)."""
    from pg_datalake_spark.sources import copy_to, read_files

    rows = [
        (1, 'plain'),
        (2, 'comma, inside'),
        (3, 'quote " inside'),
        (4, 'line\nbreak'),
        (5, 'häße-ünïcode 中文 🚀'),
        (6, ''),
    ]
    df = spark.createDataFrame(rows, "id long, txt string")
    out = str(tmp_path / "u.csv")
    copy_to(df, out, fmt="csv")
    back = read_files(spark, out, fmt="csv", multiLine=True)
    got = {r.id: (r.txt if r.txt is not None else "") for r in back.collect()}
    assert got == dict(rows)


def test_python_datasource_log_format(spark, tmp_path):
    """Spark 4 Python Data Source API (the imperative-parsing escape
    hatch next to read_log's codegen path): register pglake_log, read
    two templated log files, typed columns + all-NULL malformed rows,
    and agreement with read_log on the same input."""
    from pg_datalake_spark.sources.log_datasource import LogDataSource
    from pg_datalake_spark.sources.readers import read_log

    d = tmp_path / "logs"
    d.mkdir()
    (d / "a.log").write_text("1 10 click 3.50\n2 20 view 1.25\nmalformed line\n")
    (d / "b.log").write_text("3 30 error 9.00\n")
    spark.dataSource.register(LogDataSource)
    schema = "event_id long, user_id long, event_type string, value double"
    pattern = r"^(\d+) (\d+) (\w+) ([\d.,]+)$"
    df = (
        spark.read.format("pglake_log")
        .schema(schema)
        .option("path", str(d / "*.log"))
        .option("pattern", pattern)
        .load()
    )
    rows = sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: (t[0] is None, t[0]),
    )
    assert rows == [
        (1, 10, "click", 3.5),
        (2, 20, "view", 1.25),
        (3, 30, "error", 9.0),
        (None, None, None, None),
    ]
    # agreement with the codegen'd read_log path on the same files
    via_regex = read_log(
        spark, str(d / "*.log"), pattern,
        [("event_id", "long"), ("user_id", "long"),
         ("event_type", "string"), ("value", "double")],
    )
    assert sorted(
        [tuple(r) for r in via_regex.collect()],
        key=lambda t: (t[0] is None, t[0]),
    ) == rows


def test_stream_stream_join_multi_batch(spark, tmp_path):
    """Cross-micro-batch stream-stream join state: with one file per
    trigger, a purchase arriving several batches after its view must
    still pair (the left row is held in join state until the watermark
    passes view_ts + max_lag). Pair set must equal the batch join."""
    from pyspark.sql import functions as F

    from pg_datalake_spark.streaming.ingest import streaming_interval_join

    base = "2024-01-01 10:{:02d}:00"
    views = [(i, base.format(i), i % 3, "view", 0.0) for i in range(0, 12, 2)]
    buys = [(100 + i, base.format(i + 5), i % 3, "purchase", 10.0) for i in range(0, 12, 2)]
    schema = "event_id long, ts string, user_id long, event_type string, value double"
    vdf = spark.createDataFrame(views, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    bdf = spark.createDataFrame(buys, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    vdir, bdir = str(tmp_path / "v"), str(tmp_path / "b")
    # several files per side → several triggers at maxFilesPerTrigger=1
    vdf.repartition(3).write.parquet(vdir)
    bdf.repartition(3).write.parquet(bdir)
    sink_dir = str(tmp_path / "sink")

    def sink(df, batch_id):
        df.write.mode("append").parquet(sink_dir)

    n_batches = streaming_interval_join(
        spark,
        vdir,
        bdir,
        spark.read.parquet(vdir).schema,
        str(tmp_path / "ckpt"),
        sink,
        key_col="user_id",
        time_col="ts",
        max_lag="30 minutes",
        watermark="10 hours",  # nothing is ever late → equals batch join
        max_files_per_trigger=1,
    )
    assert n_batches > 1, "expected multiple micro-batches"
    got = spark.read.parquet(sink_dir)
    expected = (
        vdf.alias("v")
        .join(
            bdf.alias("b"),
            (F.col("v.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("v.ts"))
            & (F.col("b.ts") <= F.col("v.ts") + F.expr("INTERVAL 30 minutes")),
        )
        .count()
    )
    assert got.count() == expected > 0
    # exactly-once: no duplicated pair
    assert got.select("l_event_id", "r_event_id").distinct().count() == expected


def test_streaming_lsh_pairs_cross_batch_and_redelivery(spark, tmp_path):
    """A near-dup pair whose members arrive in DIFFERENT micro-batches
    must still be emitted, exactly once — even when one member's file
    is delivered twice (at-least-once upstream). The accumulated raw
    sink (no dedup applied) must equal the batch LSH candidate set."""
    from pg_datalake_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from pg_datalake_spark.streaming.ingest import streaming_lsh_candidates

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    rows = [
        (1, base),
        (2, base + " extra"),            # near-dup of 1
        (3, "completely different content about databases and query "
            "planning with columnar execution engines at scale"),
        (4, base + " another"),          # near-dup of 1 and 2
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    landing = str(tmp_path / "landing")
    # one file per doc -> one micro-batch per doc; file for doc 2
    # delivered twice (re-delivery must not duplicate pairs)
    for i in (1, 2, 3, 4, 2):
        docs.filter(F.col("doc_id") == i).repartition(1).write.mode(
            "append"
        ).parquet(landing)
    sink_dir = str(tmp_path / "sink")

    def sink(df, batch_id):
        df.write.mode("append").parquet(sink_dir)

    schema = spark.read.parquet(landing).schema
    streaming_lsh_candidates(
        spark, landing, schema, str(tmp_path / "ckpt"), sink,
        id_col="doc_id", text_col="text",
    )
    raw = [(r.id_a, r.id_b) for r in spark.read.parquet(sink_dir).collect()]
    got = sorted(set(raw))
    sigs = minhash_signatures(docs, "doc_id", "text")
    expected = sorted(
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id").collect()
    )
    assert got == expected
    assert (1, 2) in got and (1, 4) in got  # cross-batch pairs found
    # per-bucket exactly-once: raw emissions equal the batch
    # (pair, band) count — the duplicate file delivery added nothing
    from pg_datalake_spark.operators.dedup import band_keys

    bk = band_keys(sigs, "doc_id")
    a = bk.select(F.col("doc_id").alias("id_a"), "band", "band_key")
    b = bk.select(F.col("doc_id").alias("id_b"), "band", "band_key")
    per_band = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("band", "id_a", "id_b")
        .distinct()
        .count()
    )
    assert len(raw) == per_band


def test_streaming_lsh_bucket_cap_bounds_state(spark, tmp_path):
    """With max_bucket=2, a 4-member hot bucket emits pairs only
    against the 2 retained members — every later doc still links into
    the cluster (downstream components unaffected) but state and
    emissions are O(cap), not O(bucket)."""
    from pg_datalake_spark.streaming.ingest import streaming_lsh_candidates

    text = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    docs = spark.createDataFrame(
        [(i, text) for i in (1, 2, 3, 4)], ["doc_id", "text"]
    )
    landing = str(tmp_path / "landing")
    for i in (1, 2, 3, 4):
        docs.filter(F.col("doc_id") == i).repartition(1).write.mode(
            "append"
        ).parquet(landing)
    sink_dir = str(tmp_path / "sink")

    def sink(df, batch_id):
        df.write.mode("append").parquet(sink_dir)

    schema = spark.read.parquet(landing).schema
    streaming_lsh_candidates(
        spark, landing, schema, str(tmp_path / "ckpt"), sink,
        id_col="doc_id", text_col="text", max_bucket=2,
    )
    got = set(
        (r.id_a, r.id_b) for r in spark.read.parquet(sink_dir).collect()
    )
    # identical docs share all 4 band buckets; retained members are
    # {1, 2}, so 3 and 4 each pair only against 1 and 2 — (3,4) absent
    assert got == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)}


def test_delta_streaming_source_appends_exactly_once(spark, tmp_path):
    """pglake_delta (r10): Delta as a readStream source via the Spark 4
    Python Data Source API — three append commits arrive exactly once
    across two availableNow runs sharing a checkpoint; OPTIMIZE
    (dataChange=false) contributes nothing; schema comes from the log."""
    import pyspark.sql.functions as F

    from pg_datalake_spark.sources.delta_stream_source import (
        DeltaStreamDataSource,
    )
    from pg_datalake_spark.tables import delta_log as dl

    loc = str(tmp_path / "t")
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("string").alias("grp")
    )
    dl.write_delta_table(mk(0, 40).repartition(2), loc,
                         partition_by=["grp"])                       # v0
    dl.append_delta(mk(40, 70), loc)                                 # v1

    spark.dataSource.register(DeltaStreamDataSource)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.format("pglake_delta")
            .option("path", loc)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = spark.read.parquet(sink)
    assert sorted(r.k for r in got.collect()) == list(range(70))
    # partition column re-injected from add.partitionValues
    assert {r.grp for r in got.collect()} == {str(i) for i in range(5)}

    dl.optimize_delta(spark, loc, target_file_mb=128)                # v2
    dl.append_delta(mk(70, 90), loc)                                 # v3
    run()  # resumes from the checkpointed offset
    assert sorted(r.k for r in spark.read.parquet(sink).collect()) \
        == list(range(90))


def test_delta_streaming_source_change_commits(spark, tmp_path):
    """Non-append commits: ERROR by default (delta-spark semantics),
    skipped wholesale with skipChangeCommits=true; a later append
    still flows."""
    import pyspark.sql.functions as F

    from pg_datalake_spark.sources.delta_stream_source import (
        DeltaStreamDataSource,
    )
    from pg_datalake_spark.tables import delta_log as dl

    loc = str(tmp_path / "t")
    df = spark.range(50).select(F.col("id").alias("k"))
    dl.write_delta_table(df.repartition(2), loc)                     # v0
    dl.delete_where_delta(spark, loc, "k < 10", mode="dv")           # v1
    dl.append_delta(spark.range(50, 60).select(F.col("id").alias("k")),
                    loc)                                             # v2

    spark.dataSource.register(DeltaStreamDataSource)

    def run(opts: dict, sink: str, ckpt: str):
        q = (
            spark.readStream.format("pglake_delta")
            .option("path", loc)
            .options(**opts)
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / sink))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with pytest.raises(Exception, match="skipChangeCommits"):
        run({}, "s1", "c1")
    run({"skipChangeCommits": "true"}, "s2", "c2")
    got = sorted(
        r.k for r in spark.read.parquet(str(tmp_path / "s2")).collect()
    )
    # v0's 50 rows + v2's 10; v1 (the DV delete) skipped wholesale
    assert got == list(range(60))


def test_delta_streaming_source_starting_options(spark, tmp_path):
    """startingVersion / startingTimestamp (delta-spark parity): a
    stream started at v1 skips v0's rows; startingTimestamp resolves
    the first commit at-or-after the instant; both together, or a
    timestamp after the last commit, fail loud."""
    import pyspark.sql.functions as F

    from pg_datalake_spark.sources.delta_stream_source import (
        DeltaStreamDataSource,
    )
    from pg_datalake_spark.tables import delta_log as dl

    loc = str(tmp_path / "t")
    dl.write_delta_table(
        spark.range(10).select(F.col("id").alias("k")), loc
    )                                                                # v0
    dl.append_delta(
        spark.range(10, 30).select(F.col("id").alias("k")), loc
    )                                                                # v1
    spark.dataSource.register(DeltaStreamDataSource)

    def run(opts: dict, tag: str):
        q = (
            spark.readStream.format("pglake_delta")
            .option("path", loc)
            .options(**opts)
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / f"s_{tag}"))
            .option("checkpointLocation", str(tmp_path / f"c_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            r.k for r in spark.read.parquet(str(tmp_path / f"s_{tag}")).collect()
        )

    assert run({"startingVersion": "1"}, "v1") == list(range(10, 30))
    # v1's commit time: at-or-after its timestamp -> v1 only
    ts1 = next(
        e["timestamp_ms"] for e in dl.delta_history(spark, loc)
        if e["version"] == 1
    )
    assert run({"startingTimestamp": str(ts1)}, "ts") == list(range(10, 30))
    with pytest.raises(Exception, match="exclusive"):
        run({"startingVersion": "0", "startingTimestamp": "1"}, "both")
    with pytest.raises(Exception, match="after the last commit"):
        run({"startingTimestamp": str(ts1 + 10_000_000)}, "late")


def test_delta_streaming_cdf(spark, tmp_path):
    """readChangeFeed=true (r10 tail): the stream emits row-level
    changes — append commits as inserts, DV-delete commits as deletes
    with the per-file position diff decoded executor-side; OPTIMIZE
    invisible; COW rewrites fail loud pointing at the batch API;
    _change_type/_commit_version columns match the batch delta_changes
    reconstruction exactly."""
    import pyspark.sql.functions as F

    from pg_datalake_spark.sources.delta_stream_source import (
        DeltaStreamDataSource,
    )
    from pg_datalake_spark.tables import delta_log as dl

    loc = str(tmp_path / "t")
    dl.write_delta_table(
        spark.range(40).select(F.col("id").alias("k")).repartition(2), loc
    )                                                                # v0
    dl.append_delta(spark.range(40, 50).select(F.col("id").alias("k")), loc)  # v1
    dl.delete_where_delta(spark, loc, "k % 4 = 1", mode="dv")        # v2
    dl.optimize_delta(spark, loc, target_file_mb=128)                # v3
    dl.delete_where_delta(spark, loc, "k % 4 = 2", mode="dv")        # v4 (stacked)

    spark.dataSource.register(DeltaStreamDataSource)
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    q = (
        spark.readStream.format("pglake_delta")
        .option("path", loc)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(sink)
    stream_set = {
        (r.k, r._change_type, r._commit_version) for r in got.collect()
    }
    batch_set = {
        (r.k, r._change_type, r._commit_version)
        for r in dl.delta_changes(spark, loc, from_version=0).collect()
    }
    # the batch API's lower bound is exclusive (can't express v0's
    # create); the stream includes v0 — compare the overlap exactly
    assert {e for e in stream_set if e[2] >= 1} == batch_set
    assert {k for k, t, v in stream_set if v == 0 and t == "insert"} \
        == set(range(40))
    # sanity on the shape: 50 inserts across v0+v1, deletes in v2+v4
    assert sum(1 for _k, t, _v in stream_set if t == "insert") == 50
    assert {v for _k, t, v in stream_set if t == "delete"} == {2, 4}
    # stacked DV: v4 deletes are ONLY the newly-deleted positions
    v4 = sorted(k for k, t, v in stream_set if v == 4)
    assert v4 == [k for k in range(50) if k % 4 == 2]

    # COW rewrite: CDF stream fails loud naming the batch API
    dl.delete_where_delta(spark, loc, "k % 4 = 3", mode="cow")       # v5
    q2 = (
        spark.readStream.format("pglake_delta")
        .option("path", loc)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="delta_changes"):
        q2.awaitTermination(180)


def test_iceberg_streaming_source(spark, tmp_path):
    """pglake_iceberg (r10 tail): external Iceberg as a readStream
    source — two append snapshots arrive exactly once across two
    checkpointed availableNow runs; identity partition values re-typed
    from the manifests; an overwrite snapshot errors by default and
    skips with skipOverwrites=true while later appends still flow."""
    import pyspark.sql.functions as F

    from pg_datalake_spark.sources.iceberg_stream_source import (
        IcebergStreamDataSource,
    )
    from pg_datalake_spark.tables import iceberg_external as ie

    loc = str(tmp_path / "t")
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("b")
    )
    ie.export_iceberg_snapshot(mk(0, 40), loc, partition_by=["b"])   # seq 1
    ie.append_snapshot(mk(40, 60), loc)                              # seq 2
    spark.dataSource.register(IcebergStreamDataSource)

    def run(opts: dict, sink: str, ckpt: str):
        q = (
            spark.readStream.format("pglake_iceberg")
            .option("path", loc)
            .options(**opts)
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / sink))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(str(tmp_path / sink))

    got = run({}, "s", "c")
    assert sorted(r.k for r in got.collect()) == list(range(60))
    assert {r.b for r in got.collect()} == {0, 1, 2, 3}  # typed re-inject
    # second run on the same checkpoint: a new append arrives once
    ie.append_snapshot(mk(60, 70), loc)                              # seq 3
    got = run({}, "s", "c")
    assert sorted(r.k for r in got.collect()) == list(range(70))

    # an overwrite snapshot breaks append-only streaming
    ie.overwrite_snapshot(
        ie.read_iceberg_table(spark, loc).filter("k >= 10"), loc
    )                                                                # seq 4
    ie.append_snapshot(mk(70, 80), loc)                              # seq 5
    with pytest.raises(Exception, match="skipOverwrites"):
        run({}, "s", "c")
    got = run({"skipOverwrites": "true"}, "s2", "c2")
    # full replay minus the skipped overwrite: all three appends + the
    # final one — the overwrite's rewritten files never stream
    assert sorted(r.k for r in got.collect()) == list(range(80))
