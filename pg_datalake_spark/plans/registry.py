"""Registry of named queries and their DuckDB oracle SQL.

Each query is a ``Callable[[SparkSession, str], DataFrame]`` taking the
session and a scale-factor directory. The oracle is equivalent ANSI SQL
that DuckDB runs over the same parquet tables (views pre-registered with
the bare table names). Column names/types are aligned on both sides —
the driver's comparator sorts columns by name and hashes values.

Queries with no SQL-expressible oracle (custom stateful streaming,
iterative algorithms) register with ``oracle=None`` and get a
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
