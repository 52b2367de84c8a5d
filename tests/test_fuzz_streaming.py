"""Streaming restart/replay fuzz gate (r15, VERDICT item 2).

Seeded randomized micro-batch boundaries (maxFilesPerTrigger + corpus
split across drain sessions) and kill/restart points (injected
foreachBatch crashes before AND after the sink effect — the two
halves of the commit-vs-checkpoint crash window), asserted against a
one-shot batch oracle over the same corpus. Pipelines: exactly-once
Delta ingest (txn watermark), watermarked update-mode rollup (DuckDB
date_trunc oracle), dropDuplicates ingest (per-batch idempotent
sink). The generated-corpus analog of the reference's pg_incremental
exactly-once contract (docs/use-case-log-management.md:1-40).

No finds yet. Any diverging seed gets pinned in
STREAM_REGRESSION_SEEDS plus a deterministic repro in
tests/test_sources_streaming.py.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts"))
from check_exact import compare_exact  # noqa: E402

from pg_datalake_spark.fuzz_streaming import STREAM_RUNNERS

# r16: randomized differential sweeps and stress probes run in the
# explicit fuzz tier (pytest -m fuzz) — the default `pytest tests/`
# must finish inside the driver's verify budget (VERDICT r15 item 6).
pytestmark = pytest.mark.fuzz

# 18 seeds × 3 pipelines, ≥2 planned kills per seed → >100 randomized
# kill/restart points across the default gate
N_SEEDS = int(os.environ.get("SPARK_GRAFT_FUZZ_STREAM_N", "18"))

STREAM_REGRESSION_SEEDS: dict[str, list[int]] = {
    "ingest": [],
    "rollup": [],
    "dedup": [],
}


@pytest.fixture(scope="module")
def stream_con():
    con = duckdb.connect()
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("pipeline", sorted(STREAM_RUNNERS))
def test_streaming_restart_fuzz(spark, stream_con, tmp_path_factory,
                                pipeline):
    runner = STREAM_RUNNERS[pipeline]
    base = tmp_path_factory.mktemp(f"stfuzz_{pipeline}")
    failures: list[str] = []
    crashes = 0
    phases: set[str] = set()
    restarts = 0
    seeds = sorted(
        set(range(N_SEEDS)) | set(STREAM_REGRESSION_SEEDS[pipeline])
    )
    for seed in seeds:
        root = str(base / f"s{seed}")
        try:
            problems, cov = runner(spark, stream_con, seed, root,
                                   compare_exact)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{pipeline} seed {seed}: HARNESS ERROR {e}")
            continue
        failures.extend(problems)
        crashes += cov.get("crashes", 0)
        restarts += cov.get("restarts", 0)
        phases.update(cov.get("phases", []))
    assert not failures, f"{len(failures)} failures: " + "; ".join(
        failures[:5]
    )
    # the sweep must actually kill-and-restart, in BOTH crash windows
    assert crashes >= N_SEEDS, (
        f"only {crashes} injected crashes fired across {len(seeds)} seeds"
    )
    assert phases == {"before", "after"}, f"missing crash window: {phases}"
    assert restarts == crashes  # every kill forced a checkpoint recovery
