"""Concurrent-writer interleaving fuzz gate (r15, VERDICT item 1).

Seeded 2–3-writer races against one table per backend (LakeTable /
Delta / external Iceberg), with the backend's commit primitive
instrumented to record the committed history and inject seeded
pre-commit jitter. The invariant is SERIALIZABILITY: the table state
at every committed version (time travel) must equal a DuckDB twin
replaying the ops in COMMIT order, plus loser-retry convergence (no
writer starves, no engine error). Behavioral reference: the
reference's isolation-tester specs
(pg_lake_table/tests/isolation/specs, isolation_schedule).

Finds already credited to this harness (fixed + pinned):

- external-Iceberg COW verbs' read→commit lost-update window
  (overwrite_snapshot re-loaded metadata for the commit slot, so a
  concurrent append was silently overwritten) — fixed via
  _pinned_cow_read; deterministic repro in
  test_isolation_stress.py::test_iceberg_cow_delete_conflicts_…;
- read_iceberg_table crashing on a zero-data-file snapshot (a COW
  truncate racing other writers left readers with ValueError; now an
  empty typed scan) — iceberg seed 0 in the smoke sweep.

The OS schedule is nondeterministic, so a given seed's interleaving
varies run to run — any failure here is a REAL serializability
violation regardless of schedule (the invariant quantifies over all
schedules); diagnose it into a deterministic repro and pin that.
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

from pg_datalake_spark.fuzz_concurrent import RUNNERS, ConcurrentPlanGen

# r16: randomized differential sweeps and stress probes run in the
# explicit fuzz tier (pytest -m fuzz) — the default `pytest tests/`
# must finish inside the driver's verify budget (VERDICT r15 item 6).
pytestmark = pytest.mark.fuzz

# ≥100 interleavings across the three backends in the default gate
N_LAKE = int(os.environ.get("SPARK_GRAFT_FUZZ_CONC_N", "35"))
N_DELTA = int(os.environ.get("SPARK_GRAFT_FUZZ_CONC_DELTA_N", "35"))
N_ICEBERG = int(os.environ.get("SPARK_GRAFT_FUZZ_CONC_ICE_N", "35"))

# Seeds whose op mix surfaced an engine bug, pinned forever (the
# schedule is not replayable, but the op mix is — and the fixed bugs
# also have deterministic repros in their backend's test files).
CONC_REGRESSION_SEEDS: dict[str, list[int]] = {
    "lake": [],
    "delta": [],
    # seed 0: truncate + concurrent update/merge → readers crashed on
    # the zero-data-file snapshot (empty-scan fix in read_iceberg_table)
    "iceberg": [0],
}


@pytest.fixture(scope="module")
def conc_con():
    con = duckdb.connect()
    yield con
    con.close()


def _sweep(spark, con, tmp_path_factory, backend: str, n: int):
    runner = RUNNERS[backend]
    base = tmp_path_factory.mktemp(f"conc_{backend}")
    failures: list[str] = []
    agg = {"conflicts": 0, "commits": 0, "noop_ops": 0}
    op_counts: dict[str, int] = {}
    seeds = sorted(set(range(n)) | set(CONC_REGRESSION_SEEDS[backend]))
    for seed in seeds:
        root = str(base / f"t{seed}")
        try:
            problems, cov = runner(spark, con, seed, root, compare_exact)
        except Exception as e:  # noqa: BLE001 - harness error = failure
            failures.append(f"{backend} seed {seed}: HARNESS ERROR {e}")
            continue
        failures.extend(problems)
        for k in agg:
            agg[k] += cov.get(k, 0)
        for op, c in cov.get("ops", {}).items():
            op_counts[op] = op_counts.get(op, 0) + c
    assert not failures, f"{len(failures)} failures: " + "; ".join(
        failures[:5]
    )
    # the sweep must actually RACE: commit conflicts must have
    # occurred somewhere, or the jitter/barrier machinery is dead
    assert agg["conflicts"] > 0, f"no commit conflicts across {n} seeds"
    # every op kind must have run at least once
    missing = set(ConcurrentPlanGen.KINDS) - set(op_counts)
    assert not missing, f"op kinds never generated: {missing}"
    return agg, op_counts


@pytest.mark.slow
def test_concurrent_fuzz_lake(spark, conc_con, tmp_path_factory):
    agg, ops = _sweep(spark, conc_con, tmp_path_factory, "lake", N_LAKE)
    assert agg["commits"] >= N_LAKE  # at least the non-noop ops landed


@pytest.mark.slow
def test_concurrent_fuzz_delta(spark, conc_con, tmp_path_factory):
    agg, ops = _sweep(spark, conc_con, tmp_path_factory, "delta", N_DELTA)
    assert agg["commits"] >= N_DELTA


@pytest.mark.slow
def test_concurrent_fuzz_iceberg(spark, conc_con, tmp_path_factory):
    agg, ops = _sweep(
        spark, conc_con, tmp_path_factory, "iceberg", N_ICEBERG
    )
    assert agg["commits"] >= N_ICEBERG
