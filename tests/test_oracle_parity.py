"""Differential test: every registered query vs its DuckDB oracle.

This is the same gate the driver runs (CORRECTNESS_r{N}.json), executed
at sf0.001 for speed. Each @register'd query either hash-matches the
oracle or (oracle=None) must at least execute and return a stable frame.
"""

from __future__ import annotations

import pytest

from pg_datalake_spark import plans
from pg_datalake_spark.plans.registry import ORACLES, QUERIES
from tests.conftest import run_parity

plans.load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    run_parity(spark, ddb, QUERIES[name], ORACLES.get(name), name)


def test_every_query_has_oracle_or_is_flagged():
    missing = sorted(set(QUERIES) - set(ORACLES))
    # rows-only queries are allowed but should stay a short, deliberate list
    assert len(missing) <= 15, f"too many oracle-less queries: {missing}"
