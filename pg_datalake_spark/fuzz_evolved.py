"""Read-side fuzzing over EVOLVED tables (grammar v6, r15).

The SELECT fuzzer (:mod:`pg_datalake_spark.fuzz`) queries the static
star schema; the DML fuzzer's evolution tier produces tables this
schema never sees — mixed partition layouts from spec evolution
(none / identity / bucket files coexisting), renamed and dropped
columns bound through field-id mapping, constant defaults surfaced
for pre-evolution files, and live MOR tombstones. This module points
seeded QUERY shapes at those tables, so the scan / prune / projection
paths over evolved metadata get the same differential treatment the
operators got.

Two layers per (table_seed, query_seed):

- the table is built by replaying the evolution-tier sequence
  (``DmlSequenceGen``, seeds >= SCHEMA_EVO_BASE) through
  ``apply_op`` with the DuckDB twin KEPT (no per-step diff — the
  evo gate owns that; one final-state diff guards the build);
- queries run Spark-side against the LakeTable and twin-side as SQL.
  The highest-value shape routes the predicate through
  ``LakeTable.scan(filters=...)`` — the STATS + PARTITION pruning
  path, where a pruning bug over mixed evolved layouts silently
  drops or resurrects rows that a bare full-state diff would never
  notice.

Determinism rules inherited from the v1–v5 grammar: double sums go
through the exact-decimal formulation, SUM(BIGINT) casts back from
HUGEINT, ORDER BY under LIMIT orders by every output column with
explicit NULLS LAST, and AVG is never emitted.
"""

from __future__ import annotations

import random
from typing import Any

from pg_datalake_spark.fuzz_dml import (
    _BASE_COLS,
    SCHEMA,
    SCHEMA_EVO_BASE,
    DmlSequenceGen,
    apply_op,
)
from pg_datalake_spark.tables.format import LakeTable, PartitionField

_SEGS = ["A", "B", "C", "D", "E"]


def build_evolved_table(spark, con, table_seed: int, root: str,
                        compare) -> dict[str, Any]:
    """Replay table_seed's evolution sequence, keeping the LakeTable
    AND its DuckDB twin. One final-state diff guards the build (the
    per-step diff belongs to the evo gate). Returns
    ``{"root", "twin", "cols"}``; the caller owns the twin's
    lifetime."""
    if table_seed < SCHEMA_EVO_BASE:
        raise ValueError("evolved-read tables use evolution-tier seeds")
    gen = DmlSequenceGen(table_seed).generate()
    part = gen["partition"]
    partition_by = None
    if part is not None:
        partition_by = (
            [PartitionField(part[1])]
            if part[0] == "identity"
            else [PartitionField(part[1], "bucket", part[2])]
        )
    table = LakeTable.create(spark, root, SCHEMA, partition_by=partition_by)
    twin = f"evread_twin_{table_seed}"
    con.execute(f"DROP TABLE IF EXISTS {twin}")
    con.execute(
        f"CREATE TABLE {twin} "
        "(k BIGINT, seg VARCHAR, qty BIGINT, price DOUBLE, note VARCHAR)"
    )
    cols = list(_BASE_COLS)
    for op in gen["ops"]:
        apply_op(spark, table, con, twin, op)
        cols = op.get("cols_after") or cols
    got = table.scan().select(*cols).toPandas()
    want = con.execute(f"SELECT {', '.join(cols)} FROM {twin}").df()
    problems = compare(got, want)
    if problems:
        raise AssertionError(
            f"evolved table build diverged (table seed {table_seed}): "
            f"{problems[:2]}"
        )
    return {"root": root, "twin": twin, "cols": cols}


class EvolvedQueryGen:
    """One seeded query over an evolved table's FINAL column set.

    ``generate(cols)`` returns a dict:
      {"shape", "spark": callable(spark, table) -> DataFrame,
       "duck_sql": str}
    """

    def __init__(self, seed: int):
        self.seed = seed
        self.rng = random.Random(0xE60 + seed)

    # -- predicate pools ------------------------------------------------
    def _simple_filter(self, cols: list[str]) -> tuple[list[tuple], str]:
        """A scan(filters=...)-shaped predicate list + its SQL twin.
        Columns restricted to the stats-pruned set (base + extras)."""
        rng = self.rng
        pool: list[tuple[str, str, Any]] = [
            ("k", rng.choice(["<", "<=", ">", ">=", "="]),
             rng.randint(1, 400)),
            ("seg", "=", rng.choice(_SEGS)),
            ("qty", rng.choice(["<", ">="]), rng.randint(5, 80)),
            ("price", rng.choice(["<", ">="]), rng.randint(0, 40000) / 4.0),
        ]
        extras = [c for c in cols if c not in _BASE_COLS]
        if extras:
            pool.append(
                (rng.choice(extras), rng.choice(["<", ">="]),
                 rng.randint(0, 99))
            )
        n = rng.randint(1, 2)
        filters = rng.sample(pool, n)
        sql = " AND ".join(
            f"{c} {op} {v!r}" if isinstance(v, str) else f"{c} {op} {v}"
            for c, op, v in filters
        )
        return filters, sql

    def _rich_predicate(self, cols: list[str]) -> str:
        rng = self.rng
        extras = [c for c in cols if c not in _BASE_COLS]
        opts = [
            lambda: "k BETWEEN {} AND {}".format(
                *sorted((rng.randint(1, 400), rng.randint(1, 400)))
            ),
            lambda: "seg IN ({})".format(
                ", ".join(f"'{s}'" for s in rng.sample(_SEGS, 2))
            ),
            lambda: "qty IS NULL",
            lambda: "note IS NOT NULL",
            lambda: f"qty % 7 = {rng.randint(0, 6)}",
        ]
        if extras:
            x = rng.choice(extras)
            opts.append(lambda: f"{x} IS NULL")
            opts.append(lambda: f"{x} > {rng.randint(0, 99)}")
        p = rng.choice(opts)()
        if rng.random() < 0.4:
            q = rng.choice(opts)()
            p = f"({p}) {'AND' if rng.random() < 0.5 else 'OR'} ({q})"
        return p

    def _num_col(self, cols: list[str]) -> str:
        extras = [c for c in cols if c not in _BASE_COLS]
        return self.rng.choice(["qty", "k"] + extras)

    # -- shapes ---------------------------------------------------------
    def generate(self, cols: list[str]) -> dict[str, Any]:
        rng = self.rng
        shape = rng.choices(
            ["pruned_scan", "pruned_agg", "filter_agg", "group_agg",
             "window_rank", "distinct_limit"],
            [3.0, 2.0, 2.0, 2.5, 1.5, 1.5],
        )[0]
        col_list = ", ".join(cols)
        if shape == "pruned_scan":
            filters, fsql = self._simple_filter(cols)

            def run(spark, table):
                return table.scan(filters=filters).select(*cols)

            return {"shape": shape, "spark": run,
                    "duck_sql": f"SELECT {col_list} FROM {{twin}} "
                                f"WHERE {fsql}"}
        if shape == "pruned_agg":
            filters, fsql = self._simple_filter(cols)
            nc = self._num_col(cols)

            def run(spark, table):
                from pyspark.sql import functions as F

                return table.scan(filters=filters).groupBy("seg").agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum(F.col(nc).cast("decimal(30,4)"))
                    .cast("double").alias("s"),
                )

            return {
                "shape": shape, "spark": run,
                "duck_sql": (
                    f"SELECT seg, CAST(COUNT(*) AS BIGINT) AS n, "
                    f"CAST(SUM(CAST({nc} AS DECIMAL(30,4))) AS DOUBLE) "
                    f"AS s FROM {{twin}} WHERE {fsql} GROUP BY seg"
                ),
            }
        if shape == "filter_agg":
            pred = self._rich_predicate(cols)
            nc = self._num_col(cols)

            def run(spark, table):
                from pyspark.sql import functions as F

                return table.scan().filter(pred).agg(
                    F.count("*").cast("long").alias("n"),
                    F.min("k").alias("mn"),
                    F.max(nc).alias("mx"),
                )

            return {
                "shape": shape, "spark": run,
                "duck_sql": (
                    f"SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(k) AS mn, "
                    f"MAX({nc}) AS mx FROM {{twin}} WHERE {pred}"
                ),
            }
        if shape == "group_agg":
            keys = self.rng.sample(
                ["seg", "note"] + [c for c in cols if c not in _BASE_COLS],
                1,
            )
            key = keys[0]
            nc = self._num_col(cols)

            def run(spark, table):
                from pyspark.sql import functions as F

                return table.scan().groupBy(key).agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum(F.col(nc)).cast("long").alias("s"),
                    F.sum(F.col("price").cast("decimal(30,4)"))
                    .cast("double").alias("p"),
                )

            return {
                "shape": shape, "spark": run,
                "duck_sql": (
                    f"SELECT {key}, CAST(COUNT(*) AS BIGINT) AS n, "
                    f"CAST(SUM({nc}) AS BIGINT) AS s, "
                    f"CAST(SUM(CAST(price AS DECIMAL(30,4))) AS DOUBLE) "
                    f"AS p FROM {{twin}} GROUP BY {key}"
                ),
            }
        if shape == "window_rank":
            # rn over ORDER BY every column (ties = identical rows, so
            # the output multiset is deterministic either way)
            ob_cols = cols

            def run(spark, table):
                from pyspark.sql import Window as W
                from pyspark.sql import functions as F

                w = W.partitionBy("seg").orderBy(
                    *[F.col(c).asc_nulls_last() for c in ob_cols]
                )
                return (
                    table.scan()
                    .withColumn("rn", F.row_number().over(w))
                    .filter(F.col("rn") <= 3)
                    .select("seg", "k", "rn")
                )

            ob = ", ".join(f"{c} ASC NULLS LAST" for c in ob_cols)
            return {
                "shape": shape, "spark": run,
                "duck_sql": (
                    f"SELECT seg, k, rn FROM (SELECT seg, k, ROW_NUMBER() "
                    f"OVER (PARTITION BY seg ORDER BY {ob}) AS rn "
                    f"FROM {{twin}}) t WHERE rn <= 3"
                ),
            }
        # distinct_limit
        pick = rng.sample([c for c in cols if c != "price"],
                          min(2, len(cols) - 1))
        pl = ", ".join(pick)

        def run(spark, table):
            return table.scan().select(*pick).distinct()

        return {
            "shape": shape, "spark": run,
            "duck_sql": f"SELECT DISTINCT {pl} FROM {{twin}}",
        }


def run_evolved_read_seed(spark, con, built: dict, qseed: int,
                          compare) -> tuple[list[str], str]:
    """One query seed against one built evolved table. Returns
    (problems, shape)."""
    q = EvolvedQueryGen(qseed).generate(built["cols"])
    table = LakeTable(spark, built["root"])
    try:
        got = q["spark"](spark, table).toPandas()
        want = con.execute(
            q["duck_sql"].format(twin=built["twin"])
        ).df()
    except Exception as e:  # noqa: BLE001
        return (
            [f"qseed {qseed} [{q['shape']}]: ENGINE ERROR "
             f"{type(e).__name__}: {str(e)[:240]}"],
            q["shape"],
        )
    problems = compare(got, want)
    if problems:
        return (
            [f"qseed {qseed} [{q['shape']}]: {problems[:2]} "
             f"(sql={q['duck_sql'][:160]})"],
            q["shape"],
        )
    return [], q["shape"]
