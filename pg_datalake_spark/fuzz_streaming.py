"""Streaming restart/replay fuzzing: randomized kill points vs a
one-shot batch oracle.

The st01–st12 suites assert exactly-once on FIXED scripts; this
module randomizes the two axes those scripts pin down (r15 VERDICT
item 2 — the generated-corpus analog of the reference's
pg_incremental exactly-once contract,
docs/use-case-log-management.md:1-40):

- **micro-batch boundaries** — seeded ``maxFilesPerTrigger`` and a
  seeded split of the input corpus across multiple drain sessions
  (files land between drains, like a cron-driven pg_incremental);
- **kill/restart points** — an injected crash inside ``foreachBatch``
  at seeded global batch ordinals, in BOTH windows: ``before`` the
  sink effect (pure replay — the restarted batch must deliver again)
  and ``after`` it (the effect landed but the checkpoint never
  advanced — the replay must be absorbed idempotently).

After the schedule completes, the accumulated sink state must equal
the one-shot batch result over the same corpus — computed by an
INDEPENDENT DuckDB oracle where aggregation is involved. Three
pipelines cover the three state shapes:

- ``ingest``  exactly-once Delta append (txn appId/version watermark,
              PROTOCOL.md "Transaction Identifiers") — the replay of
              a committed batch must be skipped against the table's
              own log;
- ``rollup``  watermarked tumbling-window update-mode aggregation —
              streaming-state recovery across restarts, diffed
              against a DuckDB ``date_trunc`` rollup;
- ``dedup``   ``dropDuplicates`` ingest with a per-batch-id
              idempotent file sink — the dedup state store must
              recover so keys committed before a crash never re-emit.

Rows are fully key-determined where kept-row identity would otherwise
be arbitrary, and event times span < 3 h under a 6 h watermark so the
batch/stream semantics provably coincide (no late-data drops).
"""

from __future__ import annotations

import glob
import os
import random
from typing import Callable

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_CRASH_TOKEN = "INJECTED_STREAM_CRASH"
_MAX_RESTARTS = 10


class InjectedCrash(RuntimeError):
    pass


# ---------------------------------------------------------------------------
# plan generation
# ---------------------------------------------------------------------------


class StreamPlanGen:
    """Seeded corpus + drain schedule.

    ``files``: list of row batches (one parquet file each).
    ``sessions``: how many files land before each drain (covers the
    whole corpus; every drain sees at least one new file).
    ``crashes``: sorted global batch-delivery ordinals to kill at,
    each tagged 'before'/'after' — ≥2 per seed so every schedule
    exercises both replay windows at least twice in aggregate.
    ``mfpt``: maxFilesPerTrigger for every drain of this seed.
    """

    def __init__(self, seed: int):
        self.seed = seed
        self.rng = random.Random(0x57E0 + seed)

    def generate(self) -> dict:
        rng = self.rng
        n_files = rng.randint(5, 8)
        files = []
        for fi in range(n_files):
            n = rng.randint(12, 30)
            rows = []
            for _ in range(n):
                uid = rng.randint(1, 40)
                rows.append(
                    {
                        "user_id": uid,
                        # key-determined payload: whichever duplicate a
                        # dedup keeps, the row is identical
                        "value": uid * 0.25,
                        # seconds offset inside a < 3 h span
                        "ts_off": rng.randint(0, 9_000),
                    }
                )
            files.append(rows)
        # split corpus across 2-3 sessions, every session non-empty
        n_sessions = rng.randint(2, 3)
        cuts = sorted(rng.sample(range(1, n_files), n_sessions - 1))
        session_files = [
            list(range(lo, hi))
            for lo, hi in zip([0] + cuts, cuts + [n_files])
        ]
        n_crashes = rng.randint(2, 3)
        mfpt = rng.choice([1, 1, 2, 3])
        # sample kill ordinals within the plausible delivery count
        # (≈ files/mfpt plus replays) so nearly every schedule
        # actually fires its crashes
        hi = max(4, n_files // mfpt + 3)
        crashes = sorted(rng.sample(range(1, hi), min(n_crashes, hi - 1)))
        phases = [rng.choice(["before", "after"]) for _ in crashes]
        return {
            "files": files,
            "sessions": session_files,
            "crashes": list(zip(crashes, phases)),
            "mfpt": mfpt,
        }


def _write_file(landing: str, idx: int, rows: list[dict],
                ts_base: pd.Timestamp) -> None:
    df = pd.DataFrame(rows)
    # microsecond precision: pandas' default ns timestamps would land
    # as TIMESTAMP(NANOS) parquet, which a vanilla Spark session
    # cannot read (the events.parquet gotcha, TESTDATA.md)
    df["ts"] = (
        ts_base + pd.to_timedelta(df.pop("ts_off"), unit="s")
    ).astype("datetime64[us]")
    df.to_parquet(os.path.join(landing, f"f{idx:03d}.parquet"),
                  index=False)


class _FaultInjector:
    """Crash at seeded GLOBAL batch-delivery ordinals (replays count
    as fresh deliveries, so progress past a crash point is
    guaranteed). Call ``before()`` / ``after()`` around the sink
    effect."""

    def __init__(self, crashes: list[tuple[int, str]]):
        self.pending = sorted(crashes)
        self.ordinal = 0
        self.fired = 0
        self.fired_phases: list[str] = []

    def _check(self, phase: str) -> None:
        if self.pending and self.pending[0][0] == self.ordinal \
                and self.pending[0][1] == phase:
            self.pending.pop(0)
            self.fired += 1
            self.fired_phases.append(phase)
            raise InjectedCrash(_CRASH_TOKEN)

    def begin_batch(self) -> None:
        self.ordinal += 1
        self._check("before")

    def end_batch(self) -> None:
        self._check("after")


def _drain(run_once: Callable[[], None], fault: _FaultInjector,
           problems: list[str], seed: int) -> int:
    """One drain session with crash-restart: rerun until the drain
    completes without an injected crash. Returns restarts used."""
    restarts = 0
    while True:
        try:
            run_once()
            return restarts
        except Exception as e:  # noqa: BLE001
            # the injected crash surfaces wrapped in Spark's
            # StreamingQueryException — match by token
            if _CRASH_TOKEN in str(e) or _CRASH_TOKEN in repr(e):
                restarts += 1
                if restarts > _MAX_RESTARTS:
                    problems.append(
                        f"seed {seed}: > {_MAX_RESTARTS} restarts — "
                        "crash schedule never drains"
                    )
                    return restarts
                continue
            raise


def _corpus_pdf(plan: dict, ts_base: pd.Timestamp) -> pd.DataFrame:
    rows = [r for f in plan["files"] for r in f]
    df = pd.DataFrame(rows)
    df["ts"] = ts_base + pd.to_timedelta(df.pop("ts_off"), unit="s")
    return df


_TS_BASE = pd.Timestamp("2024-03-01 06:00:00")


# ---------------------------------------------------------------------------
# pipeline 1: exactly-once Delta ingest (txn watermark)
# ---------------------------------------------------------------------------


def run_streaming_ingest_fuzz(spark: SparkSession, con, seed: int,
                              root: str, compare) -> tuple[list[str], dict]:
    from pg_datalake_spark.streaming.ingest import incremental_file_ingest
    from pg_datalake_spark.tables import delta_log as dl

    plan = StreamPlanGen(seed).generate()
    landing = os.path.join(root, "landing")
    ckpt = os.path.join(root, "ckpt")
    table = os.path.join(root, "tbl")
    os.makedirs(landing)
    problems: list[str] = []
    fault = _FaultInjector(plan["crashes"])

    schema = "user_id long, value double, ts timestamp"
    dl.write_delta_table(spark.createDataFrame([], schema), table)

    def sink(df, batch_id: int) -> None:
        fault.begin_batch()
        dl.append_delta(df, table, txn_app_id=f"fuzz{seed}",
                        txn_version=int(batch_id))
        fault.end_batch()

    restarts = 0
    nxt = 0
    for sess in plan["sessions"]:
        for fi in sess:
            _write_file(landing, nxt, plan["files"][fi], _TS_BASE)
            nxt += 1
        restarts += _drain(
            lambda: incremental_file_ingest(
                spark, landing, schema, ckpt, sink,
                maxFilesPerTrigger=plan["mfpt"],
            ),
            fault, problems, seed,
        )
        if problems:
            break

    cov = {"restarts": restarts, "crashes": fault.fired,
           "phases": list(fault.fired_phases),
           "files": len(plan["files"]), "sessions": len(plan["sessions"])}
    if not problems:
        got = (
            dl.read_delta_table(spark, table)
            .select("user_id", "value", "ts").toPandas()
        )
        want = _corpus_pdf(plan, _TS_BASE)[["user_id", "value", "ts"]]
        want["ts"] = want["ts"].astype("datetime64[us]")
        step = compare(got, want)
        if step:
            problems.append(
                f"ingest seed {seed}: final state != corpus: {step[:2]}"
            )
    return problems, cov


# ---------------------------------------------------------------------------
# pipeline 2: watermarked rollup (update mode, last-write-wins sink)
# ---------------------------------------------------------------------------


def run_streaming_rollup_fuzz(spark: SparkSession, con, seed: int,
                              root: str, compare) -> tuple[list[str], dict]:
    from pg_datalake_spark.streaming.ingest import windowed_event_counts

    plan = StreamPlanGen(seed).generate()
    landing = os.path.join(root, "landing")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(landing)
    problems: list[str] = []
    fault = _FaultInjector(plan["crashes"])
    schema = "user_id long, value double, ts timestamp"

    # last-write-wins per (window_start, user): a replayed update
    # overwrites with the identical revision — idempotent by shape
    acc: dict[tuple, tuple] = {}

    def sink(df, batch_id: int) -> None:
        fault.begin_batch()
        for r in df.collect():
            acc[(r["window_start"], r["user_id"])] = (
                r["n_events"], r["total_value"]
            )
        fault.end_batch()

    def run_once() -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(plan["mfpt"]))
            .parquet(landing)
        )
        agg = windowed_event_counts(
            stream, ts_col="ts", window="1 hour", watermark="6 hours",
            group_cols=["user_id"],
        )
        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    restarts = 0
    nxt = 0
    for sess in plan["sessions"]:
        for fi in sess:
            _write_file(landing, nxt, plan["files"][fi], _TS_BASE)
            nxt += 1
        restarts += _drain(run_once, fault, problems, seed)
        if problems:
            break

    cov = {"restarts": restarts, "crashes": fault.fired,
           "phases": list(fault.fired_phases),
           "files": len(plan["files"]), "sessions": len(plan["sessions"])}
    if not problems:
        got = pd.DataFrame(
            [
                {"window_start": k[0], "user_id": k[1],
                 "n_events": v[0], "total_value": v[1]}
                for k, v in acc.items()
            ]
        )
        con.register("stream_corpus_src", _corpus_pdf(plan, _TS_BASE))
        want = con.execute(
            "SELECT date_trunc('hour', ts) AS window_start, user_id, "
            "COUNT(*) AS n_events, SUM(value) AS total_value "
            "FROM stream_corpus_src GROUP BY 1, 2"
        ).df()
        step = compare(got, want)
        if step:
            problems.append(
                f"rollup seed {seed}: final state != batch oracle: "
                f"{step[:2]}"
            )
    return problems, cov


# ---------------------------------------------------------------------------
# pipeline 3: dedup ingest (per-batch idempotent file sink)
# ---------------------------------------------------------------------------


def run_streaming_dedup_fuzz(spark: SparkSession, con, seed: int,
                             root: str, compare) -> tuple[list[str], dict]:
    from pg_datalake_spark.streaming.ingest import streaming_dedup_ingest

    plan = StreamPlanGen(seed).generate()
    landing = os.path.join(root, "landing")
    ckpt = os.path.join(root, "ckpt")
    out = os.path.join(root, "out")
    os.makedirs(landing)
    os.makedirs(out)
    problems: list[str] = []
    fault = _FaultInjector(plan["crashes"])
    schema = "user_id long, value double, ts timestamp"

    def sink(df, batch_id: int) -> None:
        fault.begin_batch()
        # idempotent per-batch-id sink: a replayed batch (same id,
        # same planned offsets) overwrites its own file byte-for-byte
        df.select("user_id", "value").toPandas().to_parquet(
            os.path.join(out, f"batch-{batch_id:05d}.parquet"),
            index=False,
        )
        fault.end_batch()

    restarts = 0
    nxt = 0
    for sess in plan["sessions"]:
        for fi in sess:
            _write_file(landing, nxt, plan["files"][fi], _TS_BASE)
            nxt += 1
        restarts += _drain(
            lambda: streaming_dedup_ingest(
                spark, landing, schema, ckpt, sink,
                key_cols=["user_id"],
                maxFilesPerTrigger=plan["mfpt"],
            ),
            fault, problems, seed,
        )
        if problems:
            break

    cov = {"restarts": restarts, "crashes": fault.fired,
           "phases": list(fault.fired_phases),
           "files": len(plan["files"]), "sessions": len(plan["sessions"])}
    if not problems:
        parts = sorted(glob.glob(os.path.join(out, "batch-*.parquet")))
        got = (
            pd.concat([pd.read_parquet(p) for p in parts])
            if parts else pd.DataFrame({"user_id": [], "value": []})
        )
        # exactly-once: every distinct key exactly ONCE with its
        # key-determined payload
        corpus = _corpus_pdf(plan, _TS_BASE)
        want = (
            corpus[["user_id", "value"]]
            .drop_duplicates("user_id")
            .reset_index(drop=True)
        )
        step = compare(got.reset_index(drop=True), want)
        if step:
            problems.append(
                f"dedup seed {seed}: sink != distinct corpus: {step[:2]}"
            )
    return problems, cov


STREAM_RUNNERS = {
    "ingest": run_streaming_ingest_fuzz,
    "rollup": run_streaming_rollup_fuzz,
    "dedup": run_streaming_dedup_fuzz,
}
