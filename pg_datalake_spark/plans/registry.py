"""Registry of named queries and their DuckDB oracle SQL.

Each query is a ``Callable[[SparkSession, str], DataFrame]`` taking the
session and a scale-factor directory. The oracle is equivalent ANSI SQL
that DuckDB runs over the same parquet tables (views pre-registered with
the bare table names). Column names/types are aligned on both sides —
the driver's comparator sorts columns by name and hashes values.

Queries with no SQL-expressible oracle (custom stateful streaming,
iterative algorithms) register with ``oracle=None`` and get a
rows-only check.

An oracle may also be a zero-arg callable returning the SQL string.
Merged driver-window suites use this to compose the oracle SQL of
feeder queries that register LATER in the load order (suites load
first so they land inside the verified window); the callable is
resolved — and cached — on first read, after ``load_all()`` has
registered everything.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
OracleSrc = str | Callable[[], str]


class _OracleDict(dict):
    """dict[str, str] whose values may be registered lazily.

    Callable values are resolved (and cached) on read, so suite
    oracles can reference feeder oracles registered after them.
    """

    def __getitem__(self, key: str) -> str:
        val = super().__getitem__(key)
        if callable(val):
            val = val()
            super().__setitem__(key, val)
        return val

    def get(self, key: str, default: str | None = None) -> str | None:
        return self[key] if key in self else default

    def resolved(self) -> dict[str, str]:
        return {k: self[k] for k in self}


QUERIES: dict[str, QueryFn] = {}
ORACLES: _OracleDict = _OracleDict()


def register(name: str, oracle: OracleSrc | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            dict.__setitem__(ORACLES, name, oracle)
        return fn

    return deco
