"""Evolved-table read fuzz gate (grammar v6, r15 VERDICT item 7).

The SELECT grammar's v1–v5 shapes query the static star schema; this
gate replays >=20 evolution-tier DML sequences into LakeTables
(mixed partition layouts from spec evolution, renamed/dropped
columns, field-id mappings, constant defaults, MOR tombstones), keeps
their DuckDB twins, and runs >=500 seeded query shapes across them —
including the ``scan(filters=...)`` STATS + PARTITION pruning path,
where a pruning bug over evolved metadata silently drops or
resurrects rows that the full-state diff can never see.

No finds yet; any diverging (table_seed, qseed) pair gets pinned in
EVOLVED_READ_REGRESSION_PAIRS.
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

from pg_datalake_spark.fuzz_dml import SCHEMA_EVO_BASE
from pg_datalake_spark.fuzz_evolved import (
    EvolvedQueryGen,
    build_evolved_table,
    run_evolved_read_seed,
)

# r16: randomized differential sweeps and stress probes run in the
# explicit fuzz tier (pytest -m fuzz) — the default `pytest tests/`
# must finish inside the driver's verify budget (VERDICT r15 item 6).
pytestmark = pytest.mark.fuzz

N_TABLES = int(os.environ.get("SPARK_GRAFT_FUZZ_EVREAD_TABLES", "20"))
N_QUERIES_PER_TABLE = int(
    os.environ.get("SPARK_GRAFT_FUZZ_EVREAD_Q", "25")
)

# (table_seed, qseed) pairs that ever diverged, pinned forever.
EVOLVED_READ_REGRESSION_PAIRS: list[tuple[int, int]] = []


@pytest.fixture(scope="module")
def evread_con():
    con = duckdb.connect()
    yield con
    con.close()


@pytest.mark.slow
def test_evolved_read_fuzz(spark, evread_con, tmp_path_factory):
    base = tmp_path_factory.mktemp("evread")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    failures: list[str] = []
    shapes: dict[str, int] = {}
    evolved_cols_seen = 0
    try:
        for ti in range(N_TABLES):
            tseed = SCHEMA_EVO_BASE + ti
            built = build_evolved_table(
                spark, evread_con, tseed,
                str(base / f"t{tseed}"), compare_exact,
            )
            if len(built["cols"]) > 5:
                evolved_cols_seen += 1
            for j in range(N_QUERIES_PER_TABLE):
                qseed = ti * N_QUERIES_PER_TABLE + j
                problems, shape = run_evolved_read_seed(
                    spark, evread_con, built, qseed, compare_exact
                )
                shapes[shape] = shapes.get(shape, 0) + 1
                failures.extend(
                    f"table {tseed}: {p}" for p in problems
                )
        for tseed, qseed in EVOLVED_READ_REGRESSION_PAIRS:
            built = build_evolved_table(
                spark, evread_con, tseed,
                str(base / f"pin{tseed}"), compare_exact,
            )
            problems, _ = run_evolved_read_seed(
                spark, evread_con, built, qseed, compare_exact
            )
            failures.extend(f"pinned {tseed}/{qseed}: {p}"
                            for p in problems)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    assert not failures, (
        f"{len(failures)} failures: " + "; ".join(failures[:5])
    )
    if N_TABLES >= 10:
        # the corpus must actually be EVOLVED and every shape must run
        assert evolved_cols_seen >= 3, (
            f"only {evolved_cols_seen} tables had evolution-added columns"
        )
        missing = {"pruned_scan", "pruned_agg", "filter_agg",
                   "group_agg", "window_rank", "distinct_limit"} \
            - set(shapes)
        assert not missing, f"shapes never generated: {missing}"


def test_evolved_query_gen_deterministic():
    cols = ["k", "seg", "qty", "price", "note", "x1"]
    a = EvolvedQueryGen(7).generate(cols)
    b = EvolvedQueryGen(7).generate(cols)
    assert a["shape"] == b["shape"] and a["duck_sql"] == b["duck_sql"]
