"""Randomized differential query fuzzing vs the DuckDB oracle.

The reference's strongest correctness idea is a differential oracle
over *arbitrary* queries, not a hand-picked corpus (reference:
pg_lake_table/tests (assert_query_results_on_tables), regress-derived
test_postgres_compat_sql.py). This module is the Spark-side analog: a
seeded generator that emits random queries over the star schema in a
COMMON SQL dialect executable by both Spark SQL and DuckDB, so every
query is its own oracle.

Determinism rules baked into the grammar (the hard-won exact-hash
lessons from scripts/check_exact.py / CLAUDE.md):

- Multi-row accumulation of doubles is order-dependent -> any SUM over
  a double measure goes through the exact-decimal formulation
  ``CAST(SUM(CAST(x AS DECIMAL(30,4))) AS DOUBLE)`` (the tpch.dsum
  pattern, proven across the 354-query registry).
- Per-row double arithmetic IS deterministic (same IEEE ops, same
  inputs, no FMA on either engine) -> scalar projections of doubles
  are allowed.
- SUM(BIGINT) is HUGEINT in DuckDB -> always CAST(... AS BIGINT).
- AVG is never emitted (half-way rounding ties differ); MIN/MAX/COUNT
  are exact on every type.
- ORDER BY only matters under LIMIT; there the generator orders by ALL
  output columns with explicit NULLS LAST so the kept multiset is
  deterministic even with ties (the comparator sorts rows anyway).
- Timestamp literals differ by dialect (Spark timestamp_ntz columns
  need TIMESTAMP_NTZ literals; DuckDB plain TIMESTAMP) -> the
  generator emits a placeholder resolved at render time.
- EXTRACT(DOW) numbering differs between engines -> only
  YEAR/MONTH/DAY are generated.

Every other construct emitted (joins, group-by, grouping sets, window
frames, set ops, IN/EXISTS/scalar subqueries, HAVING, CASE, string
fns, BETWEEN, LIKE, %) has identical semantics in both dialects.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

_TS = "⟦TS⟧"  # timestamp-literal placeholder


def render(sql: str, dialect: str) -> str:
    """Resolve dialect placeholders: dialect in {'spark', 'duckdb'}."""
    kw = "TIMESTAMP_NTZ" if dialect == "spark" else "TIMESTAMP"
    return sql.replace(_TS, kw)


# --- schema model (domains sampled from /root/testdata/sf0.01) ---

@dataclass
class Table:
    name: str
    alias: str
    ukey: list[str]                      # unique row key (for total orders)
    ints: dict[str, tuple[int, int]]     # col -> (lo, hi) literal domain
    doubles: dict[str, tuple[float, float]]
    strings: dict[str, list[str]]        # low-cardinality value domains
    timestamps: dict[str, tuple[str, str]] = field(default_factory=dict)

    def cols(self) -> list[str]:
        return (list(self.ints) + list(self.doubles) + list(self.strings)
                + list(self.timestamps))


LINEITEM = Table(
    "lineitem", "l",
    # the synthetic lineitem does NOT have TPC-H's unique
    # (l_orderkey, l_linenumber) — seed-437 fuzz find; this 9-column
    # prefix is verified unique at sf0.001/0.01/0.1, making window
    # ORDER BYs total
    ukey=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_shipdate"],
    ints={"l_orderkey": (1, 60000), "l_partkey": (1, 2000),
          "l_suppkey": (1, 100), "l_linenumber": (1, 7)},
    doubles={"l_quantity": (1, 50), "l_extendedprice": (900, 105000),
             "l_discount": (0.0, 0.1), "l_tax": (0.0, 0.08)},
    strings={"l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"]},
    timestamps={"l_shipdate": ("1995-01-02", "2001-11-04")},
)
ORDERS = Table(
    "orders", "o",
    ukey=["o_orderkey"],
    ints={"o_orderkey": (1, 60000), "o_custkey": (1, 1500)},
    doubles={"o_totalprice": (1000, 500000)},
    strings={"o_orderstatus": ["P", "O", "F"],
             "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                                 "4-NOT SPECIFIED", "5-LOW"]},
    timestamps={"o_orderdate": ("1995-01-01", "2001-08-01")},
)
CUSTOMER = Table(
    "customer", "c",
    ukey=["c_custkey"],
    ints={"c_custkey": (1, 1500), "c_nationkey": (0, 24)},
    doubles={"c_acctbal": (-1000, 10000)},
    strings={"c_mktsegment": ["MACHINERY", "HOUSEHOLD", "AUTOMOBILE",
                              "FURNITURE", "BUILDING"]},
)
SUPPLIER = Table(
    "supplier", "s",
    ukey=["s_suppkey"],
    ints={"s_suppkey": (1, 100), "s_nationkey": (0, 24)},
    doubles={"s_acctbal": (-1000, 10000)},
    strings={},
)
PART = Table(
    "part", "p",
    ukey=["p_partkey"],
    ints={"p_partkey": (1, 2000), "p_size": (1, 50)},
    doubles={"p_retailprice": (900, 1000)},
    strings={"p_type": ["ECONOMY", "STANDARD", "LARGE", "MEDIUM",
                        "SMALL", "PROMO"],
             "p_brand": [f"Brand#{i}" for i in range(1, 25)]},
)
NATION = Table(
    "nation", "n",
    ukey=["n_nationkey"],
    ints={"n_nationkey": (0, 24), "n_regionkey": (0, 4)},
    doubles={},
    strings={"n_name": [f"NATION_{i}" for i in range(25)]},
)
REGION = Table(
    "region", "r",
    ukey=["r_regionkey"],
    ints={"r_regionkey": (0, 4)},
    doubles={},
    strings={"r_name": [f"REGION_{i}" for i in range(5)]},
)
EVENTS = Table(
    "events", "e",
    ukey=["event_id"],
    ints={"event_id": (1, 100000), "user_id": (1, 2000)},
    doubles={"value": (0.0, 490.0)},
    strings={"event_type": ["click", "signup", "error", "view", "purchase"]},
    timestamps={"ts": ("2024-01-01", "2024-01-30")},
)
DOCUMENTS = Table(
    "documents", "d",
    ukey=["doc_id"],
    ints={"doc_id": (1, 5000), "n_chars": (48, 553)},
    doubles={},
    strings={"lang": ["de", "zh", "fr", "es", "en"],
             "source": [f"src{i}" for i in range(20)]},
)

TABLES = [LINEITEM, ORDERS, CUSTOMER, SUPPLIER, PART, NATION, REGION,
          EVENTS, DOCUMENTS]

# FK edges: (from_table, from_col, to_table, to_col)
FK = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]
_BY_NAME = {t.name: t for t in TABLES}


class QueryGen:
    """Seeded random query generator over the common dialect."""

    def __init__(self, seed: int):
        self.rng = random.Random(seed)
        self.seed = seed

    # --- scalar building blocks ---

    def _int_lit(self, lo: int, hi: int) -> str:
        return str(self.rng.randint(lo, hi))

    def _cmp(self) -> str:
        return self.rng.choice(["<", "<=", ">", ">=", "=", "<>"])

    def _pred(self, t: Table) -> str:
        kind = self.rng.choice(
            ["int", "int", "between", "mod", "str_eq", "str_in", "like",
             "double"] + (["ts"] if t.timestamps else [])
        )
        if kind in ("int", "between", "mod"):
            col, (lo, hi) = self.rng.choice(list(t.ints.items()))
            if kind == "int":
                return f"{col} {self._cmp()} {self._int_lit(lo, hi)}"
            if kind == "between":
                a = self.rng.randint(lo, hi)
                b = self.rng.randint(a, hi)
                return f"{col} BETWEEN {a} AND {b}"
            m = self.rng.randint(2, 13)
            return f"{col} % {m} = {self.rng.randrange(m)}"
        if kind in ("str_eq", "str_in", "like"):
            if not t.strings:
                return self._pred(t)
            col, dom = self.rng.choice(list(t.strings.items()))
            if kind == "str_eq":
                op = self.rng.choice(["=", "<>"])
                return f"{col} {op} '{self.rng.choice(dom)}'"
            if kind == "str_in":
                vals = self.rng.sample(dom, k=min(len(dom),
                                                  self.rng.randint(1, 3)))
                return f"{col} IN ({', '.join(repr(v) for v in vals)})"
            v = self.rng.choice(dom)
            cut = self.rng.randint(1, max(1, len(v) - 1))
            pat = self.rng.choice([v[:cut] + "%", "%" + v[cut:],
                                   v[:1] + "%" + v[-1:]])
            return f"{col} LIKE '{pat}'"
        if kind == "double":
            if not t.doubles:
                return self._pred(t)
            col, (lo, hi) = self.rng.choice(list(t.doubles.items()))
            v = round(self.rng.uniform(lo, hi), 2)
            return f"{col} {self.rng.choice(['<', '>', '<=', '>='])} {v}"
        col, (lo, hi) = self.rng.choice(list(t.timestamps.items()))
        y0, y1 = int(lo[:4]), int(hi[:4])
        y = self.rng.randint(y0, y1)
        mo = self.rng.randint(1, 12)
        op = self.rng.choice(["<", ">", "<=", ">="])
        return f"{col} {op} {_TS} '{y}-{mo:02d}-01'"

    def _where(self, t: Table, n_min: int = 0, n_max: int = 3) -> str:
        n = self.rng.randint(n_min, n_max)
        if n == 0:
            return ""
        preds = [self._pred(t) for _ in range(n)]
        glue = [self.rng.choice([" AND ", " OR "]) for _ in range(n - 1)]
        expr = preds[0]
        for g, p in zip(glue, preds[1:]):
            expr = f"({expr}{g}{p})"
        return f" WHERE {expr}"

    def _scalar_expr(self, t: Table, i: int) -> str:
        """A deterministic per-row scalar projection, aliased e_{i}."""
        kind = self.rng.choice(
            ["arith", "case", "coalesce"]
            + (["string"] if t.strings else [])
            + (["date"] if t.timestamps else [])
            + (["dbl"] if t.doubles else [])
        )
        a = f"e_{i}"
        if kind == "arith":
            col, _ = self.rng.choice(list(t.ints.items()))
            m = self.rng.randint(2, 13)
            op = self.rng.choice(
                [f"({col} % {m}) * {self.rng.randint(1, 9)}",
                 f"{col} + {self.rng.randint(-5, 5)}",
                 f"ABS({col} % {m} - {m // 2})"])
            return f"CAST({op} AS BIGINT) AS {a}"
        if kind == "case":
            return f"CASE WHEN {self._pred(t)} THEN {self.rng.randint(0, 9)} " \
                   f"ELSE {self.rng.randint(10, 19)} END AS {a}"
        if kind == "string":
            col = self.rng.choice(list(t.strings))
            f = self.rng.choice(
                [f"UPPER({col})", f"LOWER({col})", f"LENGTH({col})",
                 f"SUBSTR({col}, 1, {self.rng.randint(1, 4)})",
                 f"{col} || '_x'",
                 f"REPLACE({col}, 'A', 'z')"])
            return f"{f} AS {a}"
        if kind == "coalesce":
            col, (lo, hi) = self.rng.choice(list(t.ints.items()))
            v = self.rng.randint(lo, hi)
            return f"COALESCE(NULLIF({col}, {v}), {-1}) AS {a}"
        if kind == "date":
            col = self.rng.choice(list(t.timestamps))
            f = self.rng.choice(
                [f"EXTRACT(YEAR FROM {col})", f"EXTRACT(MONTH FROM {col})",
                 f"EXTRACT(DAY FROM {col})",
                 f"DATE_TRUNC('month', {col})"])
            if f.startswith("EXTRACT"):
                f = f"CAST({f} AS BIGINT)"
            return f"{f} AS {a}"
        col, _ = self.rng.choice(list(t.doubles.items()))
        # per-row double arithmetic: deterministic on both engines
        f = self.rng.choice(
            [f"{col} * {self.rng.randint(2, 9)}",
             f"{col} + {round(self.rng.uniform(0, 10), 2)}",
             f"ABS({col} - {round(self.rng.uniform(0, 100), 2)})"])
        return f"({f}) AS {a}"

    def _agg_expr(self, t: Table, i: int) -> str:
        a = f"agg_{i}"
        kind = self.rng.choice(
            ["count_star", "count", "count_distinct", "sum_int", "min_max",
             "dsum", "bool"])
        if kind == "count_star":
            return f"COUNT(*) AS {a}"
        if kind == "count":
            return f"COUNT({self.rng.choice(t.cols())}) AS {a}"
        if kind == "count_distinct":
            return f"COUNT(DISTINCT {self.rng.choice(t.cols())}) AS {a}"
        if kind == "sum_int":
            col, _ = self.rng.choice(list(t.ints.items()))
            m = self.rng.randint(2, 1000)
            return f"CAST(SUM({col} % {m}) AS BIGINT) AS {a}"
        if kind == "min_max":
            col = self.rng.choice(t.cols())
            return f"{self.rng.choice(['MIN', 'MAX'])}({col}) AS {a}"
        if kind == "dsum" and t.doubles:
            col, _ = self.rng.choice(list(t.doubles.items()))
            return (f"CAST(SUM(CAST({col} AS DECIMAL(30,4))) AS DOUBLE) "
                    f"AS {a}")
        # COALESCE: the global aggregate over EMPTY input is NULL, and
        # an all-NULL boolean column round-trips to pandas differently
        # per engine (object None vs float64 NaN) — a comparator
        # artifact, not a semantic difference
        return (f"COALESCE(BOOL_{self.rng.choice(['AND', 'OR'])}"
                f"({self._pred(t)}), FALSE) AS {a}")

    def _group_keys(self, t: Table, n: int) -> list[str]:
        pool = list(t.strings) + [
            f"{c} % {self.rng.randint(2, 10)}" for c in list(t.ints)[:2]
        ] + [f"EXTRACT(YEAR FROM {c})" for c in t.timestamps]
        self.rng.shuffle(pool)
        return pool[:n]

    # --- query shapes ---

    def q_aggregate(self) -> str:
        t = self.rng.choice(TABLES)
        n_keys = self.rng.randint(0, 2)
        keys = self._group_keys(t, n_keys)
        key_sel = [f"{k} AS k_{i}" for i, k in enumerate(keys)]
        aggs = [self._agg_expr(t, i) for i in range(self.rng.randint(1, 4))]
        sql = f"SELECT {', '.join(key_sel + aggs)} FROM {t.name}"
        sql += self._where(t)
        if keys:
            sql += f" GROUP BY {', '.join(keys)}"
            if self.rng.random() < 0.3:
                sql += f" HAVING COUNT(*) > {self.rng.randint(0, 5)}"
        return sql

    def q_scalar_project(self) -> str:
        t = self.rng.choice(TABLES)
        exprs = [self._scalar_expr(t, i)
                 for i in range(self.rng.randint(1, 4))]
        uk = ", ".join(t.ukey)
        m = self.rng.randint(7, 23)
        sql = (f"SELECT {uk}, {', '.join(exprs)} FROM {t.name}"
               f" WHERE {t.ukey[0]} % {m} = {self.rng.randrange(m)}")
        extra = self._where(t, 0, 1).replace(" WHERE ", " AND ", 1)
        return sql + extra

    def _join_chain(self) -> tuple[list[Table], str]:
        start = self.rng.choice(["lineitem", "orders", "customer",
                                 "supplier", "lineitem"])
        chain = [_BY_NAME[start]]
        frm = start
        cur = start
        for _ in range(self.rng.randint(1, 3)):
            edges = [e for e in FK if e[0] == cur]
            if not edges:
                break
            _, fc, to, tc = self.rng.choice(edges)
            jt = self.rng.choice(["JOIN", "JOIN", "LEFT JOIN"])
            frm += f" {jt} {to} ON {fc} = {tc}"
            chain.append(_BY_NAME[to])
            cur = to
        return chain, frm

    def q_join_agg(self) -> str:
        chain, frm = self._join_chain()
        keyed = [t for t in chain if t.strings]
        kt = self.rng.choice(keyed) if keyed else chain[0]
        keys = self._group_keys(kt, self.rng.randint(0, 2))
        key_sel = [f"{k} AS k_{i}" for i, k in enumerate(keys)]
        agg_t = self.rng.choice(chain)
        aggs = [self._agg_expr(agg_t, i)
                for i in range(self.rng.randint(1, 3))]
        sql = f"SELECT {', '.join(key_sel + aggs)} FROM {frm}"
        wt = self.rng.choice(chain)
        sql += self._where(wt, 0, 2)
        if keys:
            sql += f" GROUP BY {', '.join(keys)}"
        return sql

    def q_window(self) -> str:
        t = self.rng.choice([LINEITEM, ORDERS, CUSTOMER, EVENTS, PART])
        part = self.rng.choice(list(t.strings) + list(t.ints))
        part_k = (part if part in t.strings
                  else f"{part} % {self.rng.randint(2, 8)}")
        uk = ", ".join(t.ukey)
        order = f"ORDER BY {uk}"
        over = f"OVER (PARTITION BY {part_k} {order})"
        icol = self.rng.choice(list(t.ints))
        wins = []
        picks = self.rng.sample(
            ["rn", "rank", "sum", "lag", "lead", "cnt", "ntile"],
            k=self.rng.randint(1, 3))
        for i, p in enumerate(picks):
            a = f"w_{i}"
            if p == "rn":
                wins.append(f"ROW_NUMBER() {over} AS {a}")
            elif p == "rank":
                lc = self.rng.choice(list(t.strings) or list(t.ints))
                wins.append(
                    f"RANK() OVER (PARTITION BY {part_k} ORDER BY {lc}, "
                    f"{uk}) AS {a}")
            elif p == "sum":
                k = self.rng.randint(1, 5)
                frame = self.rng.choice(
                    [f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW",
                     "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"])
                wins.append(
                    f"CAST(SUM({icol} % 1000) OVER (PARTITION BY {part_k} "
                    f"{order} {frame}) AS BIGINT) AS {a}")
            elif p in ("lag", "lead"):
                wins.append(f"{p.upper()}({icol}, {self.rng.randint(1, 3)}) "
                            f"{over} AS {a}")
            elif p == "cnt":
                wins.append(f"COUNT(*) OVER (PARTITION BY {part_k}) AS {a}")
            else:
                wins.append(f"NTILE({self.rng.randint(2, 5)}) {over} AS {a}")
        m = self.rng.randint(5, 17)
        inner = (f"SELECT * FROM {t.name} WHERE {t.ukey[0]} % {m} = "
                 f"{self.rng.randrange(m)}")
        return f"SELECT {uk}, {', '.join(wins)} FROM ({inner}) sub"

    def q_setop(self) -> str:
        t = self.rng.choice([LINEITEM, ORDERS, CUSTOMER, PART, EVENTS])
        cols = [t.ukey[0]] + self.rng.sample(
            list(t.strings) + list(t.ints),
            k=min(2, len(t.strings) + len(t.ints)))
        cols = list(dict.fromkeys(cols))
        sel = ", ".join(cols)
        op = self.rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT",
                              "INTERSECT ALL", "EXCEPT ALL"])
        w1 = self._where(t, 1, 2)
        w2 = self._where(t, 1, 2)
        return (f"SELECT {sel} FROM {t.name}{w1} {op} "
                f"SELECT {sel} FROM {t.name}{w2}")

    def q_subquery(self) -> str:
        kind = self.rng.choice(["in", "exists", "scalar", "not_in_safe"])
        if kind in ("in", "not_in_safe"):
            fk = self.rng.choice(FK)
            ft, fc, dt, dc = _BY_NAME[fk[0]], fk[1], _BY_NAME[fk[2]], fk[3]
            sub = f"SELECT {dc} FROM {dt.name}{self._where(dt, 1, 2)}"
            neg = "NOT " if kind == "not_in_safe" else ""
            # dc is a non-null PK, so NOT IN has no tri-valued surprise
            sql = (f"SELECT COUNT(*) AS agg_0, "
                   f"COUNT(DISTINCT {fc}) AS agg_1 FROM {ft.name} "
                   f"WHERE {fc} {neg}IN ({sub})")
            return sql
        if kind == "exists":
            fk = self.rng.choice(FK)
            ft, fc, dt, dc = _BY_NAME[fk[0]], fk[1], _BY_NAME[fk[2]], fk[3]
            p = self._pred(dt)
            neg = self.rng.choice(["", "NOT "])
            return (f"SELECT COUNT(*) AS agg_0 FROM {ft.name} t WHERE "
                    f"{neg}EXISTS (SELECT 1 FROM {dt.name} d WHERE "
                    f"d.{dc} = t.{fc} AND {p})")
        t = self.rng.choice([LINEITEM, ORDERS, CUSTOMER, PART])
        col, _ = self.rng.choice(list(t.ints.items()))
        f = self.rng.choice(["MIN", "MAX"])
        sub = f"SELECT {f}({col}) FROM {t.name}{self._where(t, 1, 1)}"
        return (f"SELECT COUNT(*) AS agg_0 FROM {t.name} "
                f"WHERE {col} <= ({sub})")

    def q_orderby_limit(self) -> str:
        t = self.rng.choice(TABLES)
        cols = [*t.ukey] + self.rng.sample(t.cols(),
                                           k=min(2, len(t.cols())))
        cols = list(dict.fromkeys(cols))
        order = ", ".join(
            f"{c} {self.rng.choice(['ASC', 'DESC'])} NULLS LAST"
            for c in cols)
        return (f"SELECT {', '.join(cols)} FROM {t.name}{self._where(t)}"
                f" ORDER BY {order} LIMIT {self.rng.randint(1, 200)}")

    def q_rollup(self):
        t = self.rng.choice([LINEITEM, ORDERS, CUSTOMER, PART, EVENTS,
                             DOCUMENTS])
        keys = self._group_keys(t, 2)
        if len(keys) < 2:
            return self.q_aggregate()
        form = self.rng.choice(
            [f"ROLLUP({keys[0]}, {keys[1]})",
             f"CUBE({keys[0]}, {keys[1]})",
             f"GROUPING SETS (({keys[0]}), ({keys[1]}), ())"])
        aggs = [self._agg_expr(t, i)
                for i in range(self.rng.randint(1, 2))]
        sel = [f"{k} AS k_{i}" for i, k in enumerate(keys)]
        sel.append(f"CAST(GROUPING({keys[0]}) AS BIGINT) AS g_0")
        where = self._where(t, 0, 2)
        common = (f"SELECT {', '.join(sel + aggs)} FROM {t.name}"
                  f"{where} GROUP BY {form}")
        # PG/DuckDB emit the grand-total () row even over EMPTY input;
        # Spark's grouping sets return an empty relation. The engine's
        # compat rewrite (functions.pgcompat.grouping_sets_pg) appends
        # the global-aggregate row gated on HAVING COUNT(*) = 0 — a row
        # exists iff the input was empty, and every grouping form here
        # (ROLLUP/CUBE/the () set) contains the grand total.
        appendix = (
            f" UNION ALL SELECT NULL AS k_0, NULL AS k_1, "
            f"CAST(1 AS BIGINT) AS g_0, {', '.join(aggs)} "
            f"FROM {t.name}{where} HAVING COUNT(*) = 0")
        return common + appendix, common

    def q_distinct(self) -> str:
        t = self.rng.choice(TABLES)
        pool = list(t.strings) + list(t.ints)[:2]
        cols = self.rng.sample(pool, k=min(self.rng.randint(1, 2),
                                           len(pool)))
        return (f"SELECT DISTINCT {', '.join(cols)} FROM {t.name}"
                f"{self._where(t)}")

    def q_filter_agg(self) -> str:
        """FILTER-clause aggregates + HAVING (identical semantics in
        both dialects; PG surface the reference regress corpus leans
        on). r12 grammar extension — active for seeds >= 10_000 so
        the pinned regression seeds keep generating their original
        queries."""
        t = self.rng.choice([LINEITEM, ORDERS, CUSTOMER, PART, EVENTS,
                             DOCUMENTS])
        keys = self._group_keys(t, self.rng.randint(0, 2))
        key_sel = [f"{k} AS k_{i}" for i, k in enumerate(keys)]
        aggs = []
        for i in range(self.rng.randint(1, 3)):
            p = self._pred(t)
            kind = self.rng.choice(["count", "sum_int", "min"])
            if kind == "count":
                aggs.append(f"COUNT(*) FILTER (WHERE {p}) AS agg_{i}")
            elif kind == "sum_int":
                col, _ = self.rng.choice(list(t.ints.items()))
                m = self.rng.randint(2, 500)
                aggs.append(
                    f"CAST(SUM({col} % {m}) FILTER (WHERE {p}) AS BIGINT)"
                    f" AS agg_{i}"
                )
            else:
                col = self.rng.choice(t.cols())
                aggs.append(f"MIN({col}) FILTER (WHERE {p}) AS agg_{i}")
        sql = f"SELECT {', '.join(key_sel + aggs)} FROM {t.name}"
        sql += self._where(t, 0, 1)
        if keys:
            sql += f" GROUP BY {', '.join(keys)}"
            if self.rng.random() < 0.5:
                sql += f" HAVING COUNT(*) >= {self.rng.randint(1, 5)}"
        return sql

    # --- grammar v3 shapes (r13): the construct mixes hand-picked
    # queries skip — correlated/lateral subqueries, explode in FROM,
    # set ops over grouped subqueries, dialect-paired PG scalar shims,
    # NULL-heavy domains ---

    def _parent_child(self):
        """A random FK edge as (parent, parent_key, child, child_fk)."""
        fk = self.rng.choice(FK)
        return _BY_NAME[fk[2]], fk[3], _BY_NAME[fk[0]], fk[1]

    def q_correlated_scalar(self) -> str:
        """Correlated scalar subqueries in SELECT (always aggregated,
        so single-row by construction; COUNT over an empty group is 0
        and MIN/SUM are NULL — identical in both engines)."""
        parent, pk, child, fc = self._parent_child()
        m = self.rng.randint(5, 19)
        subs = []
        for i in range(self.rng.randint(1, 2)):
            kind = self.rng.choice(["count", "min", "sum"])
            extra = self._where(child, 0, 1).replace(" WHERE ", " AND ", 1)
            corr = f"WHERE {child.name}.{fc} = {parent.name}.{pk}{extra}"
            if kind == "count":
                agg = "CAST(COUNT(*) AS BIGINT)"
            elif kind == "min":
                agg = f"MIN({self.rng.choice(list(child.ints))})"
            else:
                col, _ = self.rng.choice(list(child.ints.items()))
                agg = f"CAST(SUM({col} % {self.rng.randint(2, 500)}) AS BIGINT)"
            subs.append(
                f"(SELECT {agg} FROM {child.name} {corr}) AS sub_{i}"
            )
        return (
            f"SELECT {parent.name}.{pk}, {', '.join(subs)} "
            f"FROM {parent.name} "
            f"WHERE {pk} % {m} = {self.rng.randrange(m)}"
        )

    def q_lateral_agg(self) -> tuple[str, str]:
        """LATERAL aggregate subquery in FROM on the Spark side; the
        DuckDB oracle is the semantically-identical correlated scalar
        subquery form. PG semantics: an UNGROUPED aggregate subquery
        produces exactly one row, so comma-LATERAL keeps every outer
        row (NULL aggregates for empty groups). Spark agrees; DuckDB
        1.0.0's comma-LATERAL DROPS outer rows whose group is empty —
        found by this very shape on its first sweep (seed 20125,
        pinned; minimal repro in tests/test_fuzz_differential.py) —
        so the oracle uses the scalar form PG defines as equivalent."""
        parent, pk, child, fc = self._parent_child()
        m = self.rng.randint(5, 19)
        aggs, scalars = [], []
        for i in range(self.rng.randint(1, 2)):
            kind = self.rng.choice(["count", "sum", "min"])
            if kind == "count":
                agg = "CAST(COUNT(*) AS BIGINT)"
            elif kind == "sum":
                col, _ = self.rng.choice(list(child.ints.items()))
                agg = (f"CAST(SUM({col} % {self.rng.randint(2, 500)}) "
                       f"AS BIGINT)")
            else:
                agg = f"MIN({self.rng.choice(list(child.ints))})"
            aggs.append((agg, f"s_{i}"))
        extra = self._where(child, 0, 1).replace(" WHERE ", " AND ", 1)
        r = self.rng.randrange(m)
        sel_s = ", ".join(f"x.{a}" for _, a in aggs)
        spark = (
            f"SELECT p.{pk}, {sel_s} FROM {parent.name} p, "
            f"LATERAL (SELECT "
            f"{', '.join(f'{e} AS {a}' for e, a in aggs)} "
            f"FROM {child.name} c WHERE c.{fc} = p.{pk}{extra}) x "
            f"WHERE p.{pk} % {m} = {r}"
        )
        scalars = ", ".join(
            f"(SELECT {e} FROM {child.name} c "
            f"WHERE c.{fc} = p.{pk}{extra}) AS {a}"
            for e, a in aggs
        )
        duck = (
            f"SELECT p.{pk}, {scalars} FROM {parent.name} p "
            f"WHERE p.{pk} % {m} = {r}"
        )
        return spark, duck

    def q_explode(self) -> tuple[str, str]:
        """Explode a per-row bounded sequence in FROM — Spark's
        Generate operator (LATERAL VIEW explode(sequence(...))) vs the
        equivalent bounded VALUES cross join on the DuckDB side."""
        t = self.rng.choice([LINEITEM, ORDERS, PART, EVENTS])
        icol, _ = self.rng.choice(list(t.ints.items()))
        k = self.rng.randint(2, 4)  # per-row count n = icol % k + 1
        m = self.rng.randint(11, 29)
        base = (f"SELECT * FROM {t.name} WHERE {t.ukey[0]} % {m} = "
                f"{self.rng.randrange(m)}")
        uk = ", ".join(t.ukey)
        vals = ", ".join(f"({i})" for i in range(1, k + 1))
        if self.rng.random() < 0.5:  # projection form
            spark = (
                f"SELECT {uk}, u.i AS i FROM ({base}) b LATERAL VIEW "
                f"explode(sequence(1, CAST({icol} % {k} + 1 AS INT))) u AS i"
            )
            duck = (
                f"SELECT {uk}, u.i AS i FROM ({base}) b CROSS JOIN "
                f"(VALUES {vals}) u(i) WHERE u.i <= {icol} % {k} + 1"
            )
        else:  # aggregate over the exploded rows
            spark = (
                f"SELECT CAST(SUM(u.i) AS BIGINT) AS agg_0, "
                f"COUNT(*) AS agg_1 FROM ({base}) b LATERAL VIEW "
                f"explode(sequence(1, CAST({icol} % {k} + 1 AS INT))) u AS i"
            )
            duck = (
                f"SELECT CAST(SUM(u.i) AS BIGINT) AS agg_0, "
                f"COUNT(*) AS agg_1 FROM ({base}) b CROSS JOIN "
                f"(VALUES {vals}) u(i) WHERE u.i <= {icol} % {k} + 1"
            )
        return spark, duck

    def q_setop_grouped(self) -> str:
        """Set operations over GROUPED subqueries (set op input is an
        aggregate, not a scan — the mix the v1 q_setop never emits)."""
        t = self.rng.choice([LINEITEM, ORDERS, CUSTOMER, PART, EVENTS,
                             DOCUMENTS])
        keys = self._group_keys(t, 1)
        if not keys:
            return self.q_setop()
        key = keys[0]
        op = self.rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT",
                              "INTERSECT ALL", "EXCEPT ALL"])
        agg = self.rng.choice(
            ["COUNT(*)",
             f"CAST(SUM({self.rng.choice(list(t.ints))} % "
             f"{self.rng.randint(2, 200)}) AS BIGINT)",
             f"MIN({self.rng.choice(t.cols())})"])
        w1, w2 = self._where(t, 1, 2), self._where(t, 1, 2)
        b1 = (f"SELECT {key} AS k_0, {agg} AS agg_0 FROM {t.name}{w1} "
              f"GROUP BY {key}")
        b2 = (f"SELECT {key} AS k_0, {agg} AS agg_0 FROM {t.name}{w2} "
              f"GROUP BY {key}")
        return f"{b1} {op} {b2}"

    def q_pg_scalars(self) -> tuple[str, str]:
        """Dialect-paired scalar shims: integer division (Spark DIV vs
        DuckDB // — identical on the non-negative int domains), to_char
        (date_format vs strftime), and the PG decade-truncation formula
        vs DuckDB's native date_trunc('decade'). Each pair is the
        engine-side algebra the pgcompat shims implement, checked
        against an independent implementation."""
        t = self.rng.choice([ORDERS, LINEITEM, EVENTS])
        s_exprs, d_exprs = [], []
        for i in range(self.rng.randint(1, 3)):
            kind = self.rng.choice(["intdiv", "to_char", "decade"])
            a = f"e_{i}"
            if kind == "intdiv":
                col, _ = self.rng.choice(list(t.ints.items()))
                k = self.rng.randint(2, 13)
                s_exprs.append(f"{col} DIV {k} AS {a}")
                d_exprs.append(f"{col} // {k} AS {a}")
            elif kind == "to_char":
                col = self.rng.choice(list(t.timestamps))
                sf, df = self.rng.choice(
                    [("yyyy-MM-dd", "%Y-%m-%d"), ("yyyy-MM", "%Y-%m"),
                     ("yyyy", "%Y"), ("MM-dd", "%m-%d")])
                s_exprs.append(f"date_format({col}, '{sf}') AS {a}")
                d_exprs.append(f"strftime({col}, '{df}') AS {a}")
            else:
                col = self.rng.choice(list(t.timestamps))
                s_exprs.append(
                    f"make_timestamp_ntz(CAST(EXTRACT(YEAR FROM {col}) - "
                    f"(EXTRACT(YEAR FROM {col}) % 10) AS INT),1,1,0,0,0) "
                    f"AS {a}")
                d_exprs.append(f"date_trunc('decade', {col}) AS {a}")
        m = self.rng.randint(7, 23)
        uk = ", ".join(t.ukey)
        w = f" WHERE {t.ukey[0]} % {m} = {self.rng.randrange(m)}"
        return (
            f"SELECT {uk}, {', '.join(s_exprs)} FROM {t.name}{w}",
            f"SELECT {uk}, {', '.join(d_exprs)} FROM {t.name}{w}",
        )

    def q_null_heavy(self) -> str:
        """NULL-heavy domains: NULLIF-manufactured NULLs flow through
        group keys, aggregates and IS [NOT] NULL / IS NOT DISTINCT
        FROM predicates — where the r12 finds lived."""
        t = self.rng.choice([LINEITEM, ORDERS, CUSTOMER, PART, EVENTS,
                             DOCUMENTS])

        def nly():
            col, _ = self.rng.choice(list(t.ints.items()))
            k = self.rng.randint(2, 6)
            return f"NULLIF({col} % {k}, {self.rng.randrange(k)})"

        key = nly()
        aggs = []
        for i in range(self.rng.randint(1, 3)):
            kind = self.rng.choice(["count_nullif", "sum_nullif",
                                    "min_nullif", "count_star"])
            if kind == "count_nullif":
                aggs.append(f"COUNT({nly()}) AS agg_{i}")
            elif kind == "sum_nullif":
                aggs.append(
                    f"COALESCE(CAST(SUM({nly()}) AS BIGINT), -1) AS agg_{i}"
                )
            elif kind == "min_nullif":
                aggs.append(f"MIN({nly()}) AS agg_{i}")
            else:
                aggs.append(f"COUNT(*) AS agg_{i}")
        pred_kind = self.rng.choice(["is_null", "not_null", "ind", "none"])
        if pred_kind == "is_null":
            w = f" WHERE {nly()} IS NULL"
        elif pred_kind == "not_null":
            w = f" WHERE {nly()} IS NOT NULL"
        elif pred_kind == "ind":
            w = f" WHERE {nly()} IS NOT DISTINCT FROM {nly()}"
        else:
            w = self._where(t, 0, 1)
        sql = (f"SELECT {key} AS k_0, {', '.join(aggs)} FROM {t.name}{w}"
               f" GROUP BY {key}")
        if self.rng.random() < 0.3:
            sql += f" HAVING COUNT(*) > {self.rng.randint(0, 3)}"
        return sql

    # --- grammar v4 shapes (r13 tail): frame/having/group-key mixes ---

    def q_range_frame(self) -> str:
        """RANGE (value-based) frames over an int ORDER BY — peers
        share the frame, so the result is deterministic even with
        duplicate order values (the reason RANGE differs from ROWS)."""
        t = self.rng.choice([LINEITEM, ORDERS, CUSTOMER, EVENTS, PART])
        part = self.rng.choice(list(t.strings) + list(t.ints))
        part_k = (part if part in t.strings
                  else f"{part} % {self.rng.randint(2, 8)}")
        ocol, _ = self.rng.choice(list(t.ints.items()))
        mcol, _ = self.rng.choice(list(t.ints.items()))
        k = self.rng.randint(1, 20)
        frame = self.rng.choice(
            [f"RANGE BETWEEN {k} PRECEDING AND CURRENT ROW",
             f"RANGE BETWEEN CURRENT ROW AND {k} FOLLOWING",
             "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"])
        m = self.rng.randint(5, 17)
        uk = ", ".join(t.ukey)
        inner = (f"SELECT * FROM {t.name} WHERE {t.ukey[0]} % {m} = "
                 f"{self.rng.randrange(m)}")
        return (
            f"SELECT {uk}, CAST(SUM({mcol} % 1000) OVER (PARTITION BY "
            f"{part_k} ORDER BY {ocol} {frame}) AS BIGINT) AS w_0, "
            f"CAST(COUNT(*) OVER (PARTITION BY {part_k} ORDER BY {ocol} "
            f"{frame}) AS BIGINT) AS w_1 "
            f"FROM ({inner}) sub"
        )

    def q_having_subquery(self) -> str:
        """HAVING against an uncorrelated scalar subquery."""
        t = self.rng.choice([LINEITEM, ORDERS, CUSTOMER, PART, EVENTS,
                             DOCUMENTS])
        keys = self._group_keys(t, 1)
        if not keys:
            return self.q_aggregate()
        key = keys[0]
        other = self.rng.choice([ORDERS, CUSTOMER, PART])
        col, _ = self.rng.choice(list(other.ints.items()))
        m = self.rng.randint(50, 400)
        sub = (f"SELECT COUNT(*) / {m} FROM {other.name}"
               f"{self._where(other, 0, 1)}")
        agg = self._agg_expr(t, 0)
        return (
            f"SELECT {key} AS k_0, {agg} FROM {t.name}{self._where(t)} "
            f"GROUP BY {key} HAVING COUNT(*) > ({sub})"
        )

    def q_case_group_key(self) -> str:
        """GROUP BY a CASE expression (and the same CASE repeated in
        the SELECT — both engines must match them up)."""
        t = self.rng.choice([LINEITEM, ORDERS, CUSTOMER, PART, EVENTS,
                             DOCUMENTS])
        p1, p2 = self._pred(t), self._pred(t)
        case = (f"CASE WHEN {p1} THEN 'hi' WHEN {p2} THEN 'mid' "
                f"ELSE 'lo' END")
        aggs = [self._agg_expr(t, i)
                for i in range(self.rng.randint(1, 2))]
        return (
            f"SELECT {case} AS k_0, {', '.join(aggs)} "
            f"FROM {t.name}{self._where(t, 0, 1)} GROUP BY {case}"
        )

    def q_union_in_from(self) -> str:
        """Aggregate over a UNION ALL derived table (set op feeding a
        group-by instead of terminating the query)."""
        t = self.rng.choice([LINEITEM, ORDERS, CUSTOMER, PART, EVENTS])
        keys = self._group_keys(t, 1)
        if not keys:
            return self.q_aggregate()
        key = keys[0]
        icol, _ = self.rng.choice(list(t.ints.items()))
        m = self.rng.randint(2, 500)
        w1, w2 = self._where(t, 1, 2), self._where(t, 1, 2)
        branch = (f"SELECT {key} AS k_0, {icol} % {m} AS v FROM "
                  f"{t.name}")
        return (
            f"SELECT k_0, COUNT(*) AS agg_0, CAST(SUM(v) AS BIGINT) AS "
            f"agg_1, MIN(v) AS agg_2 FROM ({branch}{w1} UNION ALL "
            f"{branch}{w2}) u GROUP BY k_0"
        )

    def q_nested_in(self) -> str:
        """Two-level IN-subquery chain along FK edges (orders in a
        customer set defined by a nation set, etc.)."""
        chains = [
            ("lineitem", "l_orderkey", "orders", "o_orderkey",
             "o_custkey", "customer", "c_custkey"),
            ("orders", "o_custkey", "customer", "c_custkey",
             "c_nationkey", "nation", "n_nationkey"),
            ("customer", "c_nationkey", "nation", "n_nationkey",
             "n_regionkey", "region", "r_regionkey"),
        ]
        f_name, f_col, m_name, m_key, m_fk, d_name, d_key = (
            self.rng.choice(chains))
        inner = (f"SELECT {d_key} FROM {d_name}"
                 f"{self._where(_BY_NAME[d_name], 1, 1)}")
        mid = (f"SELECT {m_key} FROM {m_name} WHERE {m_fk} IN ({inner})")
        ft = _BY_NAME[f_name]
        extra = self._where(ft, 0, 1).replace(" WHERE ", " AND ", 1)
        return (
            f"SELECT COUNT(*) AS agg_0, COUNT(DISTINCT {f_col}) AS agg_1 "
            f"FROM {f_name} WHERE {f_col} IN ({mid}){extra}"
        )

    # ---- grammar v5 (r14): outer-join + decimal/interval edges -------

    def q_full_outer_agg(self) -> str:
        """FULL OUTER between a FILTERED dim and a keyed fact aggregate
        — null-generating rows on BOTH sides feed COUNT(col) vs
        COUNT(*) and grouped sums. The unmatched-fact rows collapse
        into one COALESCE bucket, so the null-key group aggregates
        across many rows; sums there stay integer (order-safe)."""
        fact, fk_col, dim, dim_key = self.rng.choice(
            [("customer", "c_nationkey", "nation", "n_nationkey"),
             ("supplier", "s_nationkey", "nation", "n_nationkey"),
             ("nation", "n_regionkey", "region", "r_regionkey")]
        )
        ft, dt = _BY_NAME[fact], _BY_NAME[dim]
        dim_name = list(dt.strings)[0]
        cut = self.rng.randint(0, 3)
        # filter the dim so the fact side has unmatched (right-null) rows
        dim_sub = (f"SELECT * FROM {dim} WHERE "
                   f"{list(dt.ints)[-1]} <= {cut}")
        agg_sub = (
            f"SELECT {fk_col}, COUNT(*) AS f_cnt, "
            f"CAST(SUM({ft.ukey[0]} % 1000) AS BIGINT) AS f_sum "
            f"FROM {fact}{self._where(ft, 0, 2)} GROUP BY {fk_col}"
        )
        return (
            f"SELECT COALESCE({dim_name}, '∅') AS k_0, "
            f"COUNT(f_cnt) AS agg_0, COUNT(*) AS agg_1, "
            f"CAST(SUM(f_sum) AS BIGINT) AS agg_2, "
            f"CAST(SUM(f_cnt) AS BIGINT) AS agg_3 "
            f"FROM ({dim_sub}) d FULL OUTER JOIN ({agg_sub}) f "
            f"ON {dim_key} = {fk_col} "
            f"GROUP BY COALESCE({dim_name}, '∅')"
        )

    def q_right_join_window(self) -> str:
        """RIGHT JOIN producing left-NULL rows, then window functions
        whose partition sees one NULL row per unmatched key — where
        PG/Spark/DuckDB frame semantics historically diverge. The
        order (c_custkey, o_orderkey NULLS LAST) is total: an
        unmatched customer yields exactly ONE null-order row."""
        m = self.rng.randint(5, 17)
        r = self.rng.randrange(m)
        k = self.rng.randint(1, 4)
        inner = (f"SELECT o_orderkey, o_custkey, o_orderkey % 997 AS okm "
                 f"FROM orders WHERE o_orderkey % {m} = {r}")
        wins = [
            "COUNT(o_orderkey) OVER (PARTITION BY c_custkey) AS w_0",
            "COUNT(*) OVER (PARTITION BY c_custkey) AS w_1",
            "ROW_NUMBER() OVER (PARTITION BY c_custkey "
            "ORDER BY o_orderkey NULLS LAST) AS w_2",
            f"CAST(SUM(okm) OVER (PARTITION BY c_custkey "
            f"ORDER BY o_orderkey NULLS LAST "
            f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW) AS BIGINT) "
            f"AS w_3",
            "LAG(okm, 1) OVER (PARTITION BY c_custkey "
            "ORDER BY o_orderkey NULLS LAST) AS w_4",
        ]
        picked = self.rng.sample(wins, k=self.rng.randint(2, 4))
        cpred = self._where(CUSTOMER, 0, 1).replace(" WHERE ", " AND ", 1)
        return (
            f"SELECT c_custkey, o_orderkey, {', '.join(picked)} "
            f"FROM ({inner}) o RIGHT JOIN customer "
            f"ON o_custkey = c_custkey WHERE c_custkey % 3 = 0{cpred}"
        )

    def q_decimal_edges(self) -> str:
        """High-precision DECIMAL(38,x) arithmetic: double→decimal
        rounding at CAST, add/multiply within provable bounds (no
        overflow under ANSI), round() on decimals, and a scale-10
        decimal SUM — all CAST to DOUBLE at the end (decimal→double is
        the same round-to-nearest on both engines, while the exact
        decimal VALUES must agree digit-for-digit)."""
        m = self.rng.randint(7, 23)
        r = self.rng.randrange(m)
        s = self.rng.choice([6, 8, 10])
        rd = self.rng.randint(0, 3)
        exprs = [
            f"CAST(CAST(l_extendedprice AS DECIMAL(38,{s})) + "
            f"CAST(l_tax AS DECIMAL(38,{s})) AS DOUBLE) AS x_0",
            "CAST(CAST(l_quantity AS DECIMAL(12,4)) * "
            "CAST(l_discount AS DECIMAL(8,4)) AS DOUBLE) AS x_1",
            f"CAST(ROUND(CAST(l_extendedprice AS DECIMAL(30,6)), {rd}) "
            f"AS DOUBLE) AS x_2",
            f"CAST(CAST(l_extendedprice AS DECIMAL(38,{s})) - "
            f"CAST(l_quantity AS DECIMAL(38,{s})) AS DOUBLE) AS x_3",
        ]
        picked = self.rng.sample(exprs, k=self.rng.randint(2, 4))
        agg = (
            f"SELECT l_returnflag AS k_0, "
            f"CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,{s}))) "
            f"AS DOUBLE) AS agg_0, "
            f"CAST(MIN(CAST(l_discount AS DECIMAL(20,{s}))) AS DOUBLE) "
            f"AS agg_1, "
            f"CAST(MAX(CAST(l_tax AS DECIMAL(20,{s}))) AS DOUBLE) AS agg_2 "
            f"FROM lineitem WHERE l_orderkey % {m} = {r} "
            f"GROUP BY l_returnflag"
        )
        proj = (
            f"SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, "
            f"{', '.join(picked)} "
            f"FROM lineitem WHERE l_orderkey % {m} = {r}"
        )
        return self.rng.choice([agg, proj])

    def q_interval_arith(self) -> str:
        """Date/timestamp ± INTERVAL literals: day offsets, month adds
        (end-of-month clamping — PG semantics on both engines), hour
        subtraction, and interval-shifted predicate comparisons."""
        t, ts_col = self.rng.choice(
            [(LINEITEM, "l_shipdate"), (ORDERS, "o_orderdate"),
             (EVENTS, "ts")]
        )
        m = self.rng.randint(7, 23)
        r = self.rng.randrange(m)
        nd = self.rng.randint(1, 45)
        nm = self.rng.randint(1, 14)
        nh = self.rng.randint(1, 72)
        exprs = [
            f"{ts_col} + INTERVAL '{nd}' DAY AS x_0",
            f"{ts_col} + INTERVAL '{nm}' MONTH AS x_1",
            f"{ts_col} - INTERVAL '{nh}' HOUR AS x_2",
        ]
        picked = self.rng.sample(exprs, k=self.rng.randint(1, 3))
        uk = ", ".join(t.ukey)
        lo, hi = t.timestamps[ts_col]
        lit = f"{_TS} '{lo} 00:00:00'"
        cnt = (
            f"SELECT COUNT(*) AS agg_0 FROM {t.name} "
            f"WHERE {ts_col} + INTERVAL '{nd}' DAY > {lit} "
            f"AND {t.ukey[0]} % {m} = {r}"
        )
        proj = (
            f"SELECT {uk}, {', '.join(picked)} FROM {t.name} "
            f"WHERE {t.ukey[0]} % {m} = {r}"
        )
        return self.rng.choice([cnt, proj])

    SHAPES = [
        ("q_aggregate", 4), ("q_scalar_project", 2), ("q_join_agg", 4),
        ("q_window", 2), ("q_setop", 2), ("q_subquery", 2),
        ("q_orderby_limit", 1), ("q_rollup", 2), ("q_distinct", 1),
    ]
    # grammar v2 (r12): extensions joined at seed >= 10_000 so every
    # previously pinned seed keeps generating its original query
    SHAPES_V2 = [("q_filter_agg", 3)]
    V2_BASE = 10_000
    # grammar v3 (r13): joined at seed >= 20_000 — same byte-stability
    # rule (pinned seeds < 20_000 keep their original shape choice)
    SHAPES_V3 = [
        ("q_correlated_scalar", 2), ("q_lateral_agg", 2),
        ("q_explode", 2), ("q_setop_grouped", 2), ("q_pg_scalars", 2),
        ("q_null_heavy", 3),
    ]
    V3_BASE = 20_000
    # grammar v4 (r13 tail): joined at seed >= 30_000 (seed 20125 is
    # pinned, so the v3 mix below 30k must stay byte-stable)
    SHAPES_V4 = [
        ("q_range_frame", 2), ("q_having_subquery", 2),
        ("q_case_group_key", 2), ("q_union_in_from", 2),
        ("q_nested_in", 2),
    ]
    V4_BASE = 30_000
    # grammar v5 (r14): joined at seed >= 40_000 — outer-join
    # null-generation into aggregates/windows plus decimal(38,x) and
    # interval-arithmetic edges (SURVEY §4.5's historic divergence
    # surface). Same byte-stability rule: pinned seeds < 40k keep
    # their original shape choice.
    SHAPES_V5 = [
        ("q_full_outer_agg", 3), ("q_right_join_window", 3),
        ("q_decimal_edges", 3), ("q_interval_arith", 2),
    ]
    V5_BASE = 40_000

    def generate(self) -> tuple[str, str, str]:
        """Return (shape_name, spark_sql, duckdb_sql), placeholders
        resolved. Most shapes emit one common-dialect string; shapes
        with a documented compat rewrite (q_rollup) or dialect-paired
        syntax (q_explode, q_pg_scalars) differ."""
        shapes = self.SHAPES + (
            self.SHAPES_V2 if self.seed >= self.V2_BASE else []
        ) + (
            self.SHAPES_V3 if self.seed >= self.V3_BASE else []
        ) + (
            self.SHAPES_V4 if self.seed >= self.V4_BASE else []
        ) + (
            self.SHAPES_V5 if self.seed >= self.V5_BASE else []
        )
        total = sum(w for _, w in shapes)
        r = self.rng.uniform(0, total)
        acc = 0.0
        name = shapes[-1][0]
        for n, w in shapes:
            acc += w
            if r <= acc:
                name = n
                break
        q = getattr(self, name)()
        spark_sql, duck_sql = q if isinstance(q, tuple) else (q, q)
        return name, render(spark_sql, "spark"), render(duck_sql, "duckdb")


def gen_query(seed: int) -> tuple[str, str, str]:
    """One seeded query: (shape, spark_sql, duckdb_sql)."""
    return QueryGen(seed).generate()
