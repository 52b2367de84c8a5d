"""Incremental ingestion and streaming aggregation.

The reference is batch-only; its streaming idioms are (a) staging
table + periodic flush and (b) exactly-once incremental file ingestion
via pg_incremental filtering on _filename
(docs/use-case-log-management.md:1-40, SURVEY §2.10). The Spark-native
equivalents below exceed that surface:

- incremental_file_ingest: Structured Streaming file source with
  Trigger.AvailableNow + checkpoint — exactly-once file tracking is
  built into the source (the _filename bookkeeping the reference
  bolts on), draining all available input then stopping, cron-able
  exactly like pg_incremental.
- windowed_event_counts: watermarked tumbling-window aggregation of
  late-arriving events — no reference counterpart (SURVEY notes the
  gap); included because a 100 TB event pipeline needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def incremental_file_ingest(
    spark: SparkSession,
    source_glob: str,
    schema,
    checkpoint_dir: str,
    sink_fn,
    fmt: str = "parquet",
    **reader_options,
) -> int:
    """Drain all currently-available files exactly once into sink_fn.

    ``sink_fn(batch_df, batch_id)`` is the foreachBatch body (append to
    a LakeTable, write parquet, ...). Re-running with the same
    checkpoint ingests only files not seen before — restart-safe
    exactly-once, the pg_incremental contract.

    Returns the number of micro-batches executed.
    """
    n_batches = 0

    def _wrapped(df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        sink_fn(df, batch_id)

    reader = spark.readStream.schema(schema).options(
        **{k: str(v) for k, v in reader_options.items()}
    )
    stream = reader.parquet(source_glob) if fmt == "parquet" else reader.format(fmt).load(
        source_glob
    )
    q = (
        stream.writeStream.foreachBatch(_wrapped)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts/sums over a (possibly
    streaming) events frame. On a batch frame this degrades to a plain
    window aggregation — same code path both ways."""
    g = [F.window(F.col(ts_col), window).alias("w")] + [F.col(c) for c in (group_cols or [])]
    out = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        out.groupBy(*g)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *(group_cols or []),
            "n_events",
            "total_value",
        )
    )


def iceberg_commit_batch(
    df: DataFrame, batch_id: int, table_location: str, stream_id: str
) -> int | None:
    """Idempotently commit one micro-batch as an Iceberg APPEND
    snapshot (the first batch bootstraps the table). The snapshot
    summary records the (stream, batch) identity; a replay of an
    already-committed batch — the crash window between a successful
    commit and the source checkpoint advance — is detected from the
    summaries and skipped. Returns the snapshot id, or None when the
    batch was already committed (the replay case)."""
    from pg_datalake_spark.tables.iceberg_external import (
        append_snapshot,
        export_iceberg_snapshot,
        load_table_metadata,
    )

    from pg_datalake_spark.tables.iceberg_external import CommitConflictError

    bid = str(batch_id)
    summary = {"streaming-batch-id": bid, "streaming-checkpoint": stream_id}
    # retry on commit conflicts: another writer advancing the table
    # between our read and commit is not a failure of THIS batch —
    # reload the state (which also re-checks the already-committed set)
    # and try again
    for attempt in range(3):
        try:
            meta = load_table_metadata(table_location)
        except FileNotFoundError:
            meta = None
        if meta is not None:
            for s in meta.get("snapshots", []):
                summ = s.get("summary", {})
                if (
                    summ.get("streaming-batch-id") == bid
                    and summ.get("streaming-checkpoint") == stream_id
                ):
                    return None
        try:
            if meta is not None:
                return append_snapshot(df, table_location, extra_summary=summary)
            return export_iceberg_snapshot(df, table_location, extra_summary=summary)
        except CommitConflictError:
            if attempt == 2:
                raise
    raise AssertionError("unreachable")


def iceberg_stream_sink(
    spark: SparkSession,
    source_glob: str,
    schema,
    checkpoint_dir: str,
    table_location: str,
    fmt: str = "parquet",
) -> dict:
    """Exactly-once streaming ingestion INTO an external Iceberg table:
    every micro-batch goes through :func:`iceberg_commit_batch`, so the
    table sees each batch exactly once even across crash-replays (the
    same idempotent-commit contract Flink/Spark Iceberg sinks
    implement). A deliberately fresh checkpoint is a new ingestion
    stream and re-ingests.

    Returns {"batches": executed, "skipped": replays_detected,
    "snapshots": committed_snapshot_ids}.
    """
    stats = {"batches": 0, "skipped": 0, "snapshots": []}

    def _sink(df: DataFrame, batch_id: int) -> None:
        stats["batches"] += 1
        snap = iceberg_commit_batch(df, batch_id, table_location, checkpoint_dir)
        if snap is None:
            stats["skipped"] += 1
        else:
            stats["snapshots"].append(snap)

    incremental_file_ingest(
        spark, source_glob, schema, checkpoint_dir, _sink, fmt=fmt
    )
    return stats


def stateful_user_counts(
    spark: SparkSession,
    landing_dir: str,
    schema,
    checkpoint_dir: str,
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    a per-user running event counter whose state survives across
    micro-batches. The reference has no streaming at all (SURVEY
    §2.10); this is the Spark-native primitive its staging-table
    idiom would grow into.

    Runs the stream to completion (AvailableNow) against a memory sink
    and returns the per-user counts for users updated in THIS drain
    (state resumes across drains with the same checkpoint, but the
    memory sink only receives this drain's updates — use a fresh
    checkpoint for a complete snapshot).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_counts(key, pdfs, state: GroupState):
        n = 0
        total = 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        if state.exists:
            running, running_total = state.get
        else:
            running, running_total = 0, 0.0
        state.update((running + n, running_total + total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [running + n], "total_value": [running_total + total]}
        )

    stream = spark.readStream.schema(schema).parquet(landing_dir)
    counts = stream.groupBy("user_id").applyInPandasWithState(
        update_counts,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    import re as _re
    import uuid as _uuid

    safe = _re.sub(r"[^A-Za-z0-9_]", "_", checkpoint_dir)[-32:].strip("_")
    name = f"stateful_counts_{safe}_{_uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per user wins (update mode appends each revision)
    latest = spark.table(name)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        latest.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def streaming_dedup_ingest(
    spark: SparkSession,
    source_glob: str,
    schema,
    checkpoint_dir: str,
    sink_fn,
    key_cols: list[str],
    event_time_col: str | None = None,
    watermark: str = "1 hour",
    fmt: str = "parquet",
    **reader_options,
) -> int:
    """Exactly-once ingest with STREAMING DEDUPLICATION: duplicate
    keys arriving across micro-batches (at-least-once upstreams,
    replayed files) are dropped before the sink ever sees them.

    With ``event_time_col`` set, uses ``dropDuplicatesWithinWatermark``
    — state for a key is held only until the watermark passes it, so
    state size is bounded by the watermark window at any scale (the
    unbounded-state ``dropDuplicates`` variant is what melts on a
    100 TB replay). Without an event-time column, falls back to plain
    ``dropDuplicates`` (bounded sources only). Returns the number of
    micro-batches executed."""
    n_batches = 0

    def _wrapped(df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        sink_fn(df, batch_id)

    reader = spark.readStream.schema(schema).options(
        **{k: str(v) for k, v in reader_options.items()}
    )
    stream = reader.parquet(source_glob) if fmt == "parquet" else reader.format(
        fmt
    ).load(source_glob)
    if event_time_col is not None:
        stream = stream.withWatermark(event_time_col, watermark)
        deduped = stream.dropDuplicatesWithinWatermark(key_cols)
    else:
        deduped = stream.dropDuplicates(key_cols)
    q = (
        deduped.writeStream.foreachBatch(_wrapped)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches


def streaming_interval_join(
    spark: SparkSession,
    left_glob: str,
    right_glob: str,
    schema,
    checkpoint_dir: str,
    sink_fn,
    key_col: str,
    time_col: str = "ts",
    max_lag: str = "30 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> int:
    """STREAM-STREAM interval join (Structured Streaming's hardest
    stateful operator; the reference has no streaming at all — SURVEY
    §2.10 beyond-reference tier): left events join right events with
    the same ``key_col`` where the right event time falls in
    ``(left_time, left_time + max_lag]``.

    Both sides carry watermarks AND the join carries the two-sided
    event-time constraint — the combination is what lets Spark expire
    join state: a left row is held only until the watermark passes
    ``left_time + max_lag``, so state is bounded by (rate × lag
    window) at any scale. An equi-join without the time bounds would
    accumulate both streams forever — the thing that melts on an
    unbounded 100 TB replay.

    Columns are prefixed ``l_`` / ``r_`` in the output. Returns the
    number of micro-batches executed."""
    n_batches = 0

    def _wrapped(df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        sink_fn(df, batch_id)

    def _side(glob: str, prefix: str) -> DataFrame:
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        s = reader.parquet(glob)
        s = s.select([F.col(c).alias(f"{prefix}{c}") for c in s.columns])
        return s.withWatermark(f"{prefix}{time_col}", watermark)

    left = _side(left_glob, "l_")
    right = _side(right_glob, "r_")
    cond = (
        (F.col(f"l_{key_col}") == F.col(f"r_{key_col}"))
        & (F.col(f"r_{time_col}") > F.col(f"l_{time_col}"))
        & (
            F.col(f"r_{time_col}")
            <= F.col(f"l_{time_col}") + F.expr(f"INTERVAL {max_lag}")
        )
    )
    joined = left.join(right, cond, "inner")
    q = (
        joined.writeStream.foreachBatch(_wrapped)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches


def streaming_lsh_candidates(
    spark: SparkSession,
    landing_dir: str,
    schema,
    checkpoint_dir: str,
    sink,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = 16,
    bands: int = 4,
    max_files_per_trigger: int = 1,
    max_bucket: int | None = None,
) -> None:
    """STREAMING MinHash-LSH near-duplicate candidate detection: as
    documents land, each one is checked against every PREVIOUSLY
    arrived document through per-(band, band_key) bucket state, and
    candidate pairs are emitted the moment the second member arrives.

    Pair semantics are ARRIVAL-ORDER INDEPENDENT: a pair (min_id,
    max_id) is emitted exactly once when the later-arriving member
    lands, so the accumulated sink equals the batch formulation
    ("distinct id pairs sharing any band key" —
    operators/dedup.py:lsh_candidate_pairs) no matter how files are
    chunked into micro-batches. The shingle → signature → band-key
    projection is the SAME code as the batch path (band_keys), so
    bucketing is bit-identical.

    State per bucket = member id list (plus a seen-set guard against
    at-least-once re-delivery). At 100 TB the same hot-bucket caveat
    as batch LSH applies: ``max_bucket`` caps the per-bucket member
    list — arrivals past the cap still pair against the retained
    members (every doc keeps at least one link into a hot cluster, so
    connected-component folding downstream is unaffected) but are not
    themselves retained, trading full pair enumeration inside
    boilerplate mega-clusters for O(max_bucket) state and emission.
    (The re-delivery guard only tracks RETAINED ids, so under a cap a
    re-delivered overflow doc re-emits its pairs — at-least-once on
    overflow, exactly-once under the cap.) None = unbounded (exact;
    the oracle-checked configuration).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from pg_datalake_spark.operators.dedup import (
        band_keys,
        signatures_from_shingles,
        with_shingles,
    )

    def emit_pairs(key, pdfs, state: GroupState):
        arrivals: list[int] = []
        for pdf in pdfs:
            arrivals.extend(int(x) for x in pdf[id_col])
        members: list[int] = list(state.get[0]) if state.exists else []
        seen = set(members)
        out_a: list[int] = []
        out_b: list[int] = []
        for i in sorted(arrivals):
            if i in seen:
                continue  # duplicate delivery of the same doc
            for m in members:
                out_a.append(min(m, i))
                out_b.append(max(m, i))
            if max_bucket is None or len(members) < max_bucket:
                members.append(i)
            seen.add(i)
        state.update((members,))
        yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )
    sh = with_shingles(stream, id_col, text_col).filter(F.size("sh") > 0)
    sigs = signatures_from_shingles(sh, id_col, num_perms)
    banded = band_keys(sigs, id_col, num_perms, bands)
    pairs = banded.groupBy("band", "band_key").applyInPandasWithState(
        emit_pairs,
        outputStructType="id_a long, id_b long",
        stateStructType="members array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # a pair sharing several band buckets fires once per BUCKET (never
    # more — the member-set state absorbs re-deliveries); the
    # cross-band distinct belongs to the consumer. (A chained
    # dropDuplicates stage after applyInPandasWithState trips a
    # columnar/UnsafeRow cast bug in this Spark build, so the global
    # dedup is deliberately not in-stream.)
    q = (
        pairs.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def delta_stream_sink(
    spark: SparkSession,
    source_glob: str,
    schema,
    checkpoint_dir: str,
    table_location: str,
    app_id: str = "delta-stream",
    fmt: str = "parquet",
) -> dict:
    """Exactly-once streaming ingestion INTO a Delta table: every
    micro-batch appends through :func:`tables.delta_log.append_delta`
    with a ``txn`` watermark (appId = ``app_id``, version = batch id)
    — the idempotence contract Delta streaming sinks implement
    (PROTOCOL.md "Transaction Identifiers"), so a foreachBatch retry or
    a crash-replayed batch is detected against the table's own log and
    skipped, even by a DIFFERENT sink instance. The first batch of a
    fresh table creates it.

    Returns {"batches": executed, "skipped": replays_detected,
    "versions": committed_versions}."""
    import os

    from pg_datalake_spark.tables import delta_log as dl

    stats = {"batches": 0, "skipped": 0, "versions": []}

    def _sink(df: DataFrame, batch_id: int) -> None:
        stats["batches"] += 1
        if not os.path.isdir(os.path.join(table_location, "_delta_log")):
            v = dl.write_delta_table(df, table_location)
            dl._write_commit(
                table_location,
                v + 1,
                [{"txn": {"appId": app_id, "version": int(batch_id)}}],
            )
            stats["versions"].append(v + 1)
            return
        before = dl.delta_table_version(table_location)
        v = dl.append_delta(
            df, table_location, txn_app_id=app_id, txn_version=int(batch_id)
        )
        if v == before:
            stats["skipped"] += 1
        else:
            stats["versions"].append(v)

    incremental_file_ingest(
        spark, source_glob, schema, checkpoint_dir, _sink, fmt=fmt
    )
    return stats
