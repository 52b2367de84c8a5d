"""Randomized differential fuzzing: generated queries vs DuckDB.

The reference's strongest correctness idea is a differential oracle
over arbitrary queries, not a hand-picked corpus (reference:
pg_lake_table tests' assert_query_results_on_tables and the
regress-derived test_postgres_compat_sql.py corpora). This suite runs
the seeded common-dialect generator (pg_datalake_spark.fuzz) through
the driver-fidelity EXACT comparator (scripts/check_exact.compare_exact
— stricter than conftest's rounded comparator): every seed is a fresh
query, every query is its own oracle.

Default: seeds 0..N_SEEDS at the test SF. A per-round 500-seed sweep at
sf0.01 runs via scripts/fuzz_differential.py (the gate recipe). Any
mismatch found by either is pinned in REGRESSION_SEEDS forever.
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

from pg_datalake_spark.catalog import TABLE_NAMES, load_tables, table_path
from pg_datalake_spark.fuzz import QueryGen, gen_query

from tests.conftest import SF_DIR

# r16: randomized differential sweeps and stress probes run in the
# explicit fuzz tier (pytest -m fuzz) — the default `pytest tests/`
# must finish inside the driver's verify budget (VERDICT r15 item 6).
pytestmark = pytest.mark.fuzz

N_SEEDS = int(os.environ.get("SPARK_GRAFT_FUZZ_N", "150"))

# Seeds that ever produced a mismatch, pinned forever (currently the
# two divergence classes found in round 12 while building the fuzzer:
# Spark grouping-sets-over-empty-input dropping the grand-total row —
# fixed via pgcompat.pg_grouping_agg / the q_rollup rewrite — and the
# all-NULL boolean pandas-dtype comparator artifact — plus seed 437,
# the non-unique synthetic (l_orderkey, l_linenumber) making window
# ORDER BYs partial; the generator now orders by a verified-unique
# 9-column prefix. r13 / grammar v3: seed 20125 exposed DuckDB
# 1.0.0's comma-LATERAL dropping outer rows whose ungrouped-aggregate
# subquery group is empty — PG and Spark keep the row with NULL
# aggregates; the oracle side of q_lateral_agg now uses the
# PG-equivalent correlated scalar form, see
# test_duckdb_lateral_agg_bug_documented).
REGRESSION_SEEDS = [62, 66, 75, 110, 115, 437, 20125]


@pytest.fixture(scope="module")
def fuzz_env(spark):
    for name, df in load_tables(spark, SF_DIR).items():
        df.createOrReplaceTempView(name)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_DIR, t)}')")
    yield spark, con
    con.close()


def _run_seed(spark, con, seed: int) -> tuple[str, list[str], int]:
    shape, spark_sql, duck_sql = gen_query(seed)
    spark_pdf = spark.sql(spark_sql).toPandas()
    oracle_pdf = con.execute(duck_sql).df()
    return shape, compare_exact(spark_pdf, oracle_pdf), len(spark_pdf)


def test_fuzz_sweep(fuzz_env):
    """N_SEEDS fresh random queries, exact-hash equivalent comparison.

    Also asserts the sweep is exercising real data: non-empty results
    must dominate (a generator drifting into always-empty predicates
    would 'pass' while proving nothing — the CLAUDE.md empty-result
    lesson applied to the fuzzer itself)."""
    spark, con = fuzz_env
    failures: list[str] = []
    n_nonempty = 0
    for seed in range(N_SEEDS):
        try:
            shape, problems, n_rows = _run_seed(spark, con, seed)
        except Exception as e:  # noqa: BLE001 - engine error = failure
            failures.append(f"seed {seed}: ENGINE ERROR {e}")
            continue
        if problems:
            failures.append(f"seed {seed} [{shape}]: {problems[:3]}")
        if n_rows > 0:
            n_nonempty += 1
    assert not failures, "\n".join(failures[:10])
    assert n_nonempty > N_SEEDS * 0.6, (
        f"only {n_nonempty}/{N_SEEDS} non-empty results — generator "
        f"predicates no longer hit the data")


def test_fuzz_sweep_v2(fuzz_env):
    """A slice of the v2 seed space (r12 grammar extensions: FILTER
    aggregates + HAVING) through the same exact comparator."""
    spark, con = fuzz_env
    failures: list[str] = []
    for seed in range(QueryGen.V2_BASE, QueryGen.V2_BASE + max(N_SEEDS // 3, 30)):
        try:
            shape, problems, _ = _run_seed(spark, con, seed)
        except Exception as e:  # noqa: BLE001
            failures.append(f"seed {seed}: ENGINE ERROR {e}")
            continue
        if problems:
            failures.append(f"seed {seed} [{shape}]: {problems[:3]}")
    assert not failures, "\n".join(failures[:10])


def test_fuzz_sweep_v3(fuzz_env):
    """A slice of the v3 seed space (r13 grammar extensions:
    correlated/lateral subqueries, explode in FROM, grouped set ops,
    dialect-paired PG scalars, NULL-heavy domains) through the same
    exact comparator."""
    spark, con = fuzz_env
    failures: list[str] = []
    for seed in range(QueryGen.V3_BASE, QueryGen.V3_BASE + max(N_SEEDS // 3, 30)):
        try:
            shape, problems, _ = _run_seed(spark, con, seed)
        except Exception as e:  # noqa: BLE001
            failures.append(f"seed {seed}: ENGINE ERROR {e}")
            continue
        if problems:
            failures.append(f"seed {seed} [{shape}]: {problems[:3]}")
    assert not failures, "\n".join(failures[:10])


def test_fuzz_sweep_v4(fuzz_env):
    """A slice of the v4 seed space (r13-tail grammar extensions:
    RANGE frames, HAVING scalar subqueries, CASE group keys, UNION ALL
    in FROM, two-level IN chains) through the same exact comparator."""
    spark, con = fuzz_env
    failures: list[str] = []
    for seed in range(QueryGen.V4_BASE, QueryGen.V4_BASE + max(N_SEEDS // 3, 30)):
        try:
            shape, problems, _ = _run_seed(spark, con, seed)
        except Exception as e:  # noqa: BLE001
            failures.append(f"seed {seed}: ENGINE ERROR {e}")
            continue
        if problems:
            failures.append(f"seed {seed} [{shape}]: {problems[:3]}")
    assert not failures, "\n".join(failures[:10])


def test_fuzz_sweep_v5(fuzz_env):
    """A slice of the v5 seed space (r14 grammar extensions: FULL
    OUTER dim×fact-agg with null-bucket regrouping, RIGHT-join
    null-row windows, DECIMAL(38,x) arithmetic/rounding/sums, interval
    date/timestamp arithmetic) through the same exact comparator."""
    spark, con = fuzz_env
    failures: list[str] = []
    for seed in range(QueryGen.V5_BASE, QueryGen.V5_BASE + max(N_SEEDS // 3, 30)):
        try:
            shape, problems, _ = _run_seed(spark, con, seed)
        except Exception as e:  # noqa: BLE001
            failures.append(f"seed {seed}: ENGINE ERROR {e}")
            continue
        if problems:
            failures.append(f"seed {seed} [{shape}]: {problems[:3]}")
    assert not failures, "\n".join(failures[:10])


def test_duckdb_lateral_agg_bug_documented():
    """The r13 fuzz find, minimally: DuckDB 1.0.0 drops the outer row
    when a comma-LATERAL ungrouped-aggregate subquery's group is empty;
    PG (and Spark) keep it with NULL aggregates — an ungrouped
    aggregate subquery has exactly one row by definition. This pin
    documents why q_lateral_agg's oracle is the correlated scalar
    form; if a DuckDB upgrade fixes it, this test fails and the oracle
    can go back to literal LATERAL."""
    con = duckdb.connect()
    con.execute("CREATE TABLE p(id INT); INSERT INTO p VALUES (1),(2)")
    con.execute("CREATE TABLE c(pid INT, v INT); INSERT INTO c VALUES (1, 10)")
    lateral = con.execute(
        "SELECT p.id, x.s FROM p, LATERAL "
        "(SELECT MIN(v) AS s FROM c WHERE c.pid = p.id) x ORDER BY p.id"
    ).fetchall()
    scalar = con.execute(
        "SELECT p.id, (SELECT MIN(v) FROM c WHERE c.pid = p.id) AS s "
        "FROM p ORDER BY p.id"
    ).fetchall()
    con.close()
    assert scalar == [(1, 10), (2, None)]  # PG semantics
    assert lateral == [(1, 10)], (
        "DuckDB now keeps empty-group LATERAL rows — the q_lateral_agg "
        "oracle can use literal LATERAL again"
    )


def test_fuzz_regression_seeds(fuzz_env):
    """Every historical mismatch seed stays green."""
    spark, con = fuzz_env
    for seed in REGRESSION_SEEDS:
        shape, problems, _ = _run_seed(spark, con, seed)
        assert not problems, f"seed {seed} [{shape}] regressed: {problems[:3]}"


def test_fuzz_generator_deterministic():
    """Same seed -> byte-identical SQL (resumability of any failure)."""
    for seed in (0, 7, 62, 123):
        assert gen_query(seed) == gen_query(seed)


def test_fuzz_shapes_all_reachable():
    """Every grammar shape is generated within the default sweep —
    v1 shapes in the base seed space, v2 extensions (r12) above
    V2_BASE (kept separate so pinned seeds stay byte-stable)."""
    seen = {gen_query(s)[0] for s in range(N_SEEDS)}
    assert seen == {name for name, _ in QueryGen.SHAPES}
    seen_v2 = {
        gen_query(QueryGen.V2_BASE + s)[0] for s in range(N_SEEDS)
    }
    assert seen_v2 >= {name for name, _ in QueryGen.SHAPES_V2}
    seen_v3 = {
        gen_query(QueryGen.V3_BASE + s)[0] for s in range(2 * N_SEEDS)
    }
    assert seen_v3 >= {name for name, _ in QueryGen.SHAPES_V3}
    seen_v4 = {
        gen_query(QueryGen.V4_BASE + s)[0] for s in range(2 * N_SEEDS)
    }
    assert seen_v4 >= {name for name, _ in QueryGen.SHAPES_V4}
    seen_v5 = {
        gen_query(QueryGen.V5_BASE + s)[0] for s in range(2 * N_SEEDS)
    }
    assert seen_v5 >= {name for name, _ in QueryGen.SHAPES_V5}
