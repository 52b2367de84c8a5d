"""Randomized differential fuzzing of the WRITE path vs a DuckDB twin.

The SELECT fuzzer (pg_datalake_spark.fuzz) covers the read surface;
this module points the same differential idea at DML/maintenance —
the reference's second-densest test area (behavioral reference:
pg_lake_table/tests/pytests/test_update_delete_iceberg.py and
writable_table.c:478-650, which exercise update/delete sequences
against expected table states).

A seeded generator emits a random MUTATION SEQUENCE against a
:class:`~pg_datalake_spark.tables.format.LakeTable`; the same sequence
is replayed against a DuckDB-maintained twin table, and the FULL table
state is diffed (driver-fidelity exact comparator) after EVERY step —
so a wrong MOR tombstone, a COW rewrite that loses rows, a merge that
double-applies, or a compaction that changes visible state is caught
at the exact op that introduced it.

Sequence space (each op seeded, all engine-agnostic semantics):

- ``append``       random batches: overlapping keys, NULL qty/note;
- ``delete``       predicate deletes across every strategy tier —
                   partition-pruned no-ops, whole-partition
                   metadata-only drops (identity spec), MOR
                   position-deletes and COW rewrites: ``k % 100 < P``
                   predicates target per-file match fractions that
                   STRADDLE the 20% COW_THRESHOLD explicitly;
- ``delete_eq``    equality-delete on a key batch (MOR content=2
                   analog; twin: DELETE ... IN);
- ``update``       SET exprs (arith on qty/price, string fns, NULL)
                   under predicates incl. NULL-predicate rows (which
                   must keep their original values on both engines);
- ``merge``        unique-key source → upsert / matched-delete /
                   insert-only (twin: UPDATE..FROM / DELETE..USING /
                   anti-join INSERT materialized against PRE-state,
                   matching LakeTable.merge's snapshot semantics);
- ``truncate``     metadata-only empty snapshot;
- ``compact`` / ``expire`` maintenance ops — the twin does NOTHING,
                   so the diff asserts they never change visible state.

Determinism: prices are exact binary fractions (quarters), updates use
exactly-representable arithmetic (+0.25, *2), and the diff is a full
multiset comparison of raw values — no aggregation, no float
accumulation, so any mismatch is a real engine divergence.

Tables are partitioned per-sequence by NOTHING, identity(seg) or
bucket(k, 4), so partition transforms and bucket pruning sit inside
the fuzzed space rather than beside it.
"""

from __future__ import annotations

import random
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from pg_datalake_spark.tables.format import LakeTable, PartitionField

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("seg", T.StringType()),
        T.StructField("qty", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("note", T.StringType()),
    ]
)

_SEGS = ["A", "B", "C", "D", "E"]
_NOTES = ["alpha", "beta", "gamma", "delta", None]


# seeds >= this base add SCHEMA EVOLUTION ops (add/rename/drop column)
# to the sequence space — a NEW base so seeds below it stay byte-stable
# (the pinned-regression rule from fuzz.py applied to DML sequences)
SCHEMA_EVO_BASE = 10_000

# fresh base for the DELTA CROSS-FEATURE COMBO tier (r15): column
# mapping (name/id) × schema evolution × dv/cow deletes × mid-sequence
# checkpoint rewrites (classic/V2-sidecar/multipart) in ONE sequence —
# the two r14 finds both lived in two-feature interactions, so this
# tier generates the deeper ones on purpose
DELTA_COMBO_BASE = 20_000


class DmlSequenceGen:
    """One seeded mutation sequence (pure data — no engine objects).

    For seeds >= SCHEMA_EVO_BASE the op pool adds column evolution:
    ``add_column`` (bigint, optional constant default — old files must
    surface the default via field-id mapping), ``rename_column`` and
    ``drop_column`` (both metadata-only; only evolution-added columns
    are renamed/dropped so base-column references in later predicates
    stay valid — dropped names are never re-added, keeping default
    semantics unambiguous). Every op carries ``cols_after`` — the
    authoritative visible-column list for the post-op state diff —
    and appends/updates cover the live extra columns."""

    def __init__(self, seed: int):
        self.seed = seed
        self.rng = random.Random(0x5EED0 + seed)
        self.extras: list[str] = []       # live evolution-added columns
        self._next_x = 1

    # -- row batches --------------------------------------------------
    def _rows(self, n: int, k_lo: int = 1, k_hi: int = 400,
              with_extras: bool = False) -> list[tuple]:
        rng = self.rng
        out = []
        for _ in range(n):
            k = rng.randint(k_lo, k_hi)
            seg = rng.choice(_SEGS)
            qty = None if rng.random() < 0.1 else rng.randint(0, 100)
            price = rng.randint(0, 40000) / 4.0  # exact quarters
            note = rng.choice(_NOTES)
            row = (k, seg, qty, price, note)
            if with_extras:
                row += tuple(
                    None if rng.random() < 0.2 else rng.randint(0, 99)
                    for _ in self.extras
                )
            out.append(row)
        return out

    def _unique_key_rows(self, n: int) -> list[tuple]:
        rows = self._rows(n)
        seen: set[int] = set()
        out = []
        for r in rows:
            if r[0] not in seen:
                seen.add(r[0])
                out.append(r)
        return out

    # -- predicates ----------------------------------------------------
    def _predicate(self) -> str:
        rng = self.rng
        choices = [
            lambda: "k BETWEEN {} AND {}".format(
                *sorted((rng.randint(1, 400), rng.randint(1, 400)))
            ),
            lambda: f"seg = '{rng.choice(_SEGS)}'",
            lambda: "seg IN ({})".format(
                ", ".join(f"'{s}'" for s in rng.sample(_SEGS, 2))
            ),
            lambda: f"qty < {rng.randint(5, 60)}",
            lambda: "qty IS NULL",
            lambda: "note IS NULL",
            # fraction-targeted: P straddles the 20% COW threshold so
            # per-file match fractions land on BOTH sides of it
            lambda: f"k % 100 < {rng.choice([5, 12, 18, 21, 25, 35, 50])}",
        ]
        p = rng.choice(choices)()
        if rng.random() < 0.3:
            q = rng.choice(choices)()
            p = f"({p}) {'AND' if rng.random() < 0.5 else 'OR'} ({q})"
        return p

    def _set_exprs(self) -> dict[str, str]:
        rng = self.rng
        pool = {
            "qty": rng.choice(
                [f"qty + {rng.randint(1, 9)}", "qty * 2", "NULL",
                 f"{rng.randint(0, 99)}"]
            ),
            "price": rng.choice(["price + 0.25", "price * 2", "0.0"]),
            # note || '!' NULL-propagates on BOTH engines; concat()
            # does NOT (Spark: NULL-if-any-NULL; DuckDB/PG: skips
            # NULLs) — r14 code-review find, seed 100 proved it
            "note": rng.choice(["upper(note)", "'edited'", "NULL",
                                "note || '!'"]),
            "seg": f"'{rng.choice(_SEGS)}'",
        }
        for x in self.extras:
            pool[x] = rng.choice([f"{x} + 1", "NULL", f"{rng.randint(0, 99)}"])
        cols = rng.sample(list(pool), rng.randint(1, 2))
        return {c: pool[c] for c in cols}

    # -- the sequence ---------------------------------------------------
    def generate(self) -> dict[str, Any]:
        rng = self.rng
        evo = self.seed >= SCHEMA_EVO_BASE
        partition = rng.choice([None, ("identity", "seg"), ("bucket", "k", 4)])
        ops: list[dict[str, Any]] = [
            {"op": "append", "rows": self._rows(rng.randint(150, 350))}
        ]
        n_ops = rng.randint(4, 8)
        kinds = ["append", "delete", "delete_eq", "update", "merge",
                 "truncate", "compact", "expire"]
        weights = [3, 4, 2, 3, 3, 0.3, 1, 1]
        if evo:
            # PARTITION-SPEC evolution rides the same tier: metadata-
            # only relayout — later appends use the new spec, existing
            # files keep their recorded layout, and subsequent deletes
            # must prune correctly across the MIXED layouts; visible
            # state never changes (twin no-op at the repartition step)
            kinds += ["add_column", "rename_column", "drop_column",
                      "repartition"]
            weights += [2.0, 1.2, 1.0, 1.0]
        for _ in range(n_ops):
            kind = rng.choices(kinds, weights=weights)[0]
            if kind == "append":
                ops.append(
                    {"op": "append",
                     "rows": self._rows(rng.randint(50, 200),
                                        with_extras=True),
                     "extras": list(self.extras)}
                )
            elif kind == "delete":
                ops.append({"op": "delete", "predicate": self._predicate()})
            elif kind == "delete_eq":
                ks = sorted({rng.randint(1, 400) for _ in range(rng.randint(3, 25))})
                ops.append({"op": "delete_eq", "keys": ks})
            elif kind == "update":
                ops.append(
                    {"op": "update", "set": self._set_exprs(),
                     "predicate": self._predicate()}
                )
            elif kind == "merge":
                mode = rng.choice(["upsert", "delete", "insert_only"])
                ops.append(
                    {"op": "merge", "mode": mode,
                     "rows": self._unique_key_rows(rng.randint(20, 80)),
                     "extras": list(self.extras)}
                )
            elif kind == "add_column":
                name = f"x{self._next_x}"
                self._next_x += 1
                default = rng.choice([None, rng.randint(0, 9)])
                self.extras.append(name)
                ops.append({"op": "add_column", "name": name,
                            "default": default})
            elif kind == "rename_column":
                if not self.extras:
                    ops.append({"op": "compact"})
                else:
                    old = rng.choice(self.extras)
                    new = old + "r"
                    self.extras[self.extras.index(old)] = new
                    ops.append({"op": "rename_column", "old": old,
                                "new": new})
            elif kind == "drop_column":
                if not self.extras:
                    ops.append({"op": "compact"})
                else:
                    name = self.extras.pop(
                        rng.randrange(len(self.extras)))
                    ops.append({"op": "drop_column", "name": name})
            elif kind == "repartition":
                ops.append({
                    "op": "repartition",
                    "spec": rng.choice(
                        [None, ("identity", "seg"), ("bucket", "k", 4)]
                    ),
                })
            else:
                ops.append({"op": kind})
            ops[-1]["cols_after"] = (
                ["k", "seg", "qty", "price", "note"] + list(self.extras)
            )
        return {"partition": partition, "ops": ops}


# ---------------------------------------------------------------------------
# dual application
# ---------------------------------------------------------------------------

_TWIN_COLS = "k, seg, qty, price, note"
_BASE_COLS = ["k", "seg", "qty", "price", "note"]


def _twin_insert(con, twin: str, rows: list[tuple],
                 extras: list[str] | None = None) -> None:
    cols = _BASE_COLS + list(extras or [])
    ph = ", ".join("?" for _ in cols)
    con.executemany(
        f"INSERT INTO {twin} ({', '.join(cols)}) VALUES ({ph})", rows
    )


def _schema_with(extras: list[str]) -> T.StructType:
    return T.StructType(
        list(SCHEMA.fields)
        + [T.StructField(x, T.LongType()) for x in extras]
    )


def _src_view(con, name: str, rows: list[tuple]) -> None:
    con.execute(f"DROP TABLE IF EXISTS {name}")
    con.execute(
        f"CREATE TEMP TABLE {name} "
        "(k BIGINT, seg VARCHAR, qty BIGINT, price DOUBLE, note VARCHAR)"
    )
    con.executemany(f"INSERT INTO {name} VALUES (?, ?, ?, ?, ?)", rows)


def apply_twin(con, twin: str, op: dict) -> None:
    """Apply one op's DuckDB twin-side effect only. Shared by
    the single-writer runners (which apply both engines in lockstep)
    and the concurrent-interleaving runner (which replays the twin
    serially in COMMIT order after the race). Maintenance ops
    (compact/expire/repartition) are twin no-ops by design — the diff
    then asserts they never change visible state."""
    kind = op["op"]
    if kind == "append":
        _twin_insert(con, twin, op["rows"], op.get("extras") or [])
    elif kind == "delete":
        con.execute(f"DELETE FROM {twin} WHERE {op['predicate']}")
    elif kind == "delete_eq":
        ks = ", ".join(str(k) for k in op["keys"])
        con.execute(f"DELETE FROM {twin} WHERE k IN ({ks})")
    elif kind == "update":
        sets = ", ".join(f"{c} = {e}" for c, e in op["set"].items())
        con.execute(f"UPDATE {twin} SET {sets} WHERE {op['predicate']}")
    elif kind == "merge":
        mode = op["mode"]
        # the twin source view is base-schema; combo-tier rows carry
        # None-padded extras (inserted as CAST(NULL AS BIGINT) below)
        _src_view(con, "fuzz_src", [r[:5] for r in op["rows"]])
        # inserts are selected against the PRE-merge state (the lake
        # merge anti-joins scan() before committing) — materialize
        # them first, then apply the matched clause, then insert
        con.execute("DROP TABLE IF EXISTS fuzz_ins")
        con.execute(
            "CREATE TEMP TABLE fuzz_ins AS "
            f"SELECT s.* FROM fuzz_src s "
            f"WHERE NOT EXISTS (SELECT 1 FROM {twin} t WHERE t.k = s.k)"
        )
        if mode == "upsert":
            con.execute(
                f"UPDATE {twin} SET seg = s.seg, qty = s.qty, "
                f"price = s.price, note = s.note "
                f"FROM fuzz_src s WHERE {twin}.k = s.k"
            )
        elif mode == "delete":
            con.execute(
                f"DELETE FROM {twin} USING fuzz_src s WHERE {twin}.k = s.k"
            )
        extras = op.get("extras") or []
        ins_cols = _BASE_COLS + list(extras)
        ins_sel = ", ".join(_BASE_COLS) + "".join(
            f", CAST(NULL AS BIGINT) AS {x}" for x in extras
        )
        con.execute(
            f"INSERT INTO {twin} ({', '.join(ins_cols)}) "
            f"SELECT {ins_sel} FROM fuzz_ins"
        )
    elif kind == "truncate":
        con.execute(f"DELETE FROM {twin}")
    elif kind in ("compact", "expire", "repartition"):
        pass  # maintenance: visible state must not move
    else:  # pragma: no cover
        raise ValueError(f"no twin mapping for op {kind}")


def apply_op(
    spark: SparkSession, table: LakeTable, con, twin: str, op: dict
) -> dict:
    """Apply one op to BOTH engines; returns the lake op's result dict
    (strategy counters) for coverage accounting."""
    kind = op["op"]
    info: dict = {}
    if kind == "append":
        # a handful of slices per batch: realistic multi-file layout
        # (per-file delete fractions vary around the predicate's
        # global fraction) without 32 near-empty files per append
        extras = op.get("extras") or []
        df = spark.createDataFrame(
            op["rows"], _schema_with(extras)
        ).coalesce(4)
        table.append(df)
        apply_twin(con, twin, op)
    elif kind == "delete":
        info = table.delete(op["predicate"]) or {}
        apply_twin(con, twin, op)
    elif kind == "delete_eq":
        keys_df = spark.createDataFrame(
            [(k,) for k in op["keys"]], "k long"
        )
        table.delete_equality(keys_df, ["k"])
        apply_twin(con, twin, op)
    elif kind == "update":
        table.update(op["set"], op["predicate"])
        apply_twin(con, twin, op)
    elif kind == "merge":
        src = spark.createDataFrame(op["rows"], SCHEMA)
        mode = op["mode"]
        info = table.merge(
            src,
            on="k",
            when_matched_update=(
                {"seg": "src.seg", "qty": "src.qty", "price": "src.price",
                 "note": "src.note"}
                if mode == "upsert"
                else None
            ),
            when_matched_delete=(mode == "delete"),
            when_not_matched_insert=True,
        )
        apply_twin(con, twin, op)
    elif kind == "add_column":
        table.add_column(op["name"], "bigint", op["default"])
        d = op["default"]
        con.execute(
            f"ALTER TABLE {twin} ADD COLUMN {op['name']} BIGINT"
            + (f" DEFAULT {d}" if d is not None else "")
        )
    elif kind == "rename_column":
        table.rename_column(op["old"], op["new"])
        con.execute(
            f"ALTER TABLE {twin} RENAME COLUMN {op['old']} TO {op['new']}"
        )
    elif kind == "drop_column":
        table.drop_column(op["name"])
        con.execute(f"ALTER TABLE {twin} DROP COLUMN {op['name']}")
    elif kind == "repartition":
        spec = op["spec"]
        if spec is None:
            table.set_partition_spec([])
        elif spec[0] == "identity":
            table.set_partition_spec([PartitionField(spec[1])])
        else:
            table.set_partition_spec(
                [PartitionField(spec[1], "bucket", spec[2])]
            )
        # twin: partition layout is physical only — state must not move
    elif kind == "truncate":
        table.truncate()
        apply_twin(con, twin, op)
    elif kind == "compact":
        info = table.compact() or {}
    elif kind == "expire":
        table.expire_snapshots(keep_last=1)
    else:  # pragma: no cover
        raise ValueError(f"unknown op {kind}")
    return info if isinstance(info, dict) else {}


def run_sequence(
    spark: SparkSession, con, seed: int, root: str, compare
) -> tuple[list[str], dict]:
    """Generate + dual-apply the seed's sequence under ``root``;
    ``compare(spark_pdf, duck_pdf) -> problems`` is the comparator
    (scripts/check_exact.compare_exact in the gate). Returns
    (problems, coverage counters incl. mor/cow/dropped sums)."""
    gen = DmlSequenceGen(seed).generate()
    part = gen["partition"]
    partition_by = None
    if part is not None:
        if part[0] == "identity":
            partition_by = [PartitionField(part[1])]
        else:
            partition_by = [PartitionField(part[1], "bucket", part[2])]
    table = LakeTable.create(spark, root, SCHEMA, partition_by=partition_by)
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    twin = f"fuzz_twin_{seed}"
    con.execute(f"DROP TABLE IF EXISTS {twin}")
    con.execute(
        f"CREATE TABLE {twin} "
        "(k BIGINT, seg VARCHAR, qty BIGINT, price DOUBLE, note VARCHAR)"
    )
    problems: list[str] = []
    cov = {"mor": 0, "cow": 0, "dropped": 0, "ops": {}}
    try:
        # hundreds-of-rows tables: big shuffle fan-out and AQE
        # re-planning are pure overhead at this size
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        for i, op in enumerate(gen["ops"]):
            info = apply_op(spark, table, con, twin, op)
            for key in ("mor", "cow", "dropped"):
                cov[key] += int(info.get(key, 0) or 0)
            cov["ops"][op["op"]] = cov["ops"].get(op["op"], 0) + 1
            cols = op.get("cols_after") or _BASE_COLS
            got = table.scan().select(*cols).toPandas()
            want = con.execute(
                f"SELECT {', '.join(cols)} FROM {twin}"
            ).df()
            step_problems = compare(got, want)
            if step_problems:
                problems.append(
                    f"seed {seed} step {i} [{op['op']}]: "
                    f"{step_problems[:2]} (op={str(op)[:160]})"
                )
                break  # state diverged; later steps are noise
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        con.execute(f"DROP TABLE IF EXISTS {twin}")
    return problems, cov


# ---------------------------------------------------------------------------
# Delta-backend runner: the SAME generated sequences replayed through
# the Delta writer verb surface (tables/delta_log.py) — the repo's
# second write path, previously covered only by hand-picked lake
# arms. Op mapping: append→append_delta, delete→delete_where_delta
# (mode alternates dv/cow per step so MOR deletion vectors AND COW
# rewrites both sit in the fuzzed space), delete_eq→IN-list delete,
# update→update_delta, merge→merge_delta (s./t. refs),
# truncate→delete TRUE, compact→optimize_delta, expire→vacuum_delta —
# the last two twin-side no-ops, so the diff asserts OPTIMIZE (incl.
# DV materialization) and VACUUM never change visible state.
# ---------------------------------------------------------------------------


def apply_op_delta(spark, root: str, con, twin: str, op: dict,
                   mode: str) -> None:
    from pg_datalake_spark.tables import delta_log as dl

    kind = op["op"]
    if kind == "append":
        df = spark.createDataFrame(
            op["rows"], _schema_with(op.get("extras") or [])
        ).coalesce(4)
        dl.append_delta(df, root)
    elif kind == "delete":
        dl.delete_where_delta(spark, root, op["predicate"], mode=mode)
    elif kind == "delete_eq":
        ks = ", ".join(str(k) for k in op["keys"])
        dl.delete_where_delta(spark, root, f"k IN ({ks})", mode=mode)
    elif kind == "update":
        dl.update_delta(spark, root, op["set"], where=op["predicate"])
    elif kind == "merge":
        src = spark.createDataFrame(
            op["rows"], _schema_with(op.get("extras") or [])
        )
        m = op["mode"]
        dl.merge_delta(
            spark, root, src, on="t.k = s.k",
            when_matched_update=(
                {"seg": "s.seg", "qty": "s.qty", "price": "s.price",
                 "note": "s.note"}
                if m == "upsert" else None
            ),
            when_matched_delete=("true" if m == "delete" else None),
            when_not_matched_insert=True,
        )
    elif kind == "truncate":
        dl.delete_where_delta(spark, root, "true", mode="cow")
    elif kind == "compact":
        dl.optimize_delta(spark, root)
    elif kind == "expire":
        dl.vacuum_delta(spark, root, retain_last=1, retention_ms=0)
    # --- combo-tier kinds (seeds >= DELTA_COMBO_BASE) ------------------
    elif kind == "add_column":
        dl.add_column_delta(spark, root, op["name"], "bigint")
        con.execute(f"ALTER TABLE {twin} ADD COLUMN {op['name']} BIGINT")
        return  # twin ALTER applied here, not via apply_twin
    elif kind == "rename_column":
        dl.rename_column_delta(spark, root, op["old"], op["new"])
        con.execute(
            f"ALTER TABLE {twin} RENAME COLUMN {op['old']} TO {op['new']}"
        )
        return
    elif kind == "drop_column":
        dl.drop_column_delta(spark, root, op["name"])
        con.execute(f"ALTER TABLE {twin} DROP COLUMN {op['name']}")
        return
    elif kind == "checkpoint":
        # twin no-op: a checkpoint rewrite must never change visible
        # state — across column mapping, DVs and evolved schemas
        style = op["style"]
        if style == "v2":
            dl.write_delta_checkpoint(spark, root, v2=True, n_sidecars=2)
        elif style == "multipart":
            dl.write_delta_checkpoint(spark, root, multipart=2)
        else:
            dl.write_delta_checkpoint(spark, root)
        return
    else:  # pragma: no cover
        raise ValueError(f"unknown op {kind}")
    apply_twin(con, twin, op)


def run_sequence_delta(spark, con, seed: int, root: str, compare):
    """Dual-apply the seed's sequence through the DELTA writer path.
    Same generator as :func:`run_sequence` (bucket partitioning maps
    to unpartitioned — hidden bucket transforms are a lake-format
    concept; schema-evolution seeds >= SCHEMA_EVO_BASE are rejected —
    the minimal Delta writer has no ALTER verb surface). Returns
    (problems, op-coverage dict)."""
    from pg_datalake_spark.tables import delta_log as dl

    if seed >= SCHEMA_EVO_BASE:
        raise ValueError(
            "delta runner covers seeds < SCHEMA_EVO_BASE (no ALTER "
            "verbs on the minimal Delta writer)"
        )

    gen = DmlSequenceGen(seed).generate()
    part = gen["partition"]
    partition_by = [part[1]] if part and part[0] == "identity" else None
    twin = f"fuzz_twin_d{seed}"
    con.execute(f"DROP TABLE IF EXISTS {twin}")
    con.execute(
        f"CREATE TABLE {twin} "
        "(k BIGINT, seg VARCHAR, qty BIGINT, price DOUBLE, note VARCHAR)"
    )
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    problems: list[str] = []
    cov = {"ops": {}, "modes": set()}
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        first = gen["ops"][0]
        df = spark.createDataFrame(first["rows"], SCHEMA).coalesce(4)
        dl.write_delta_table(df, root, partition_by=partition_by)
        _twin_insert(con, twin, first["rows"])
        for i, op in enumerate(gen["ops"]):
            if i == 0:
                got = dl.read_delta_table(spark, root).toPandas()
            else:
                # dv/cow alternates per step so both delete paths fuzz
                mode = "dv" if (seed + i) % 2 else "cow"
                if op["op"] in ("delete", "delete_eq"):
                    cov["modes"].add(mode)
                apply_op_delta(spark, root, con, twin, op, mode)
                got = dl.read_delta_table(spark, root).toPandas()
            cov["ops"][op["op"]] = cov["ops"].get(op["op"], 0) + 1
            want = con.execute(f"SELECT {_TWIN_COLS} FROM {twin}").df()
            step_problems = compare(got[["k", "seg", "qty", "price",
                                         "note"]], want)
            if step_problems:
                problems.append(
                    f"delta seed {seed} step {i} [{op['op']}]: "
                    f"{step_problems[:2]} (op={str(op)[:160]})"
                )
                break
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        con.execute(f"DROP TABLE IF EXISTS {twin}")
    cov["modes"] = sorted(cov["modes"])
    return problems, cov


# ---------------------------------------------------------------------------
# Delta cross-feature COMBO tier (r15): the r14 finds were both
# two-feature interactions (COW×NULL-predicate, truncate×DV), so this
# tier generates the deeper ones deliberately — ONE sequence mixes
# column mapping (name/id), schema evolution (add/rename/drop, which
# REQUIRE mapping), dv/cow deletes, merges over evolved schemas, and
# mid-sequence checkpoint rewrites in all three layouts
# (classic / V2+sidecars / V1 multipart), each checkpoint a
# twin-invisible no-op the next step's full-state diff must confirm.
# ---------------------------------------------------------------------------


class DeltaComboGen:
    """Seeded combo sequence (seeds >= DELTA_COMBO_BASE). Reuses the
    base generator's row/predicate/SET pools and evolution
    bookkeeping; renames/drops touch only evolution-added columns so
    base-column predicates stay valid, and dropped names never
    return."""

    KINDS = ["append", "delete", "delete_eq", "update", "merge",
             "add_column", "rename_column", "drop_column",
             "checkpoint", "compact", "expire", "truncate"]
    WEIGHTS = [3.0, 2.5, 1.5, 2.5, 2.0, 1.5, 1.2, 1.0, 1.8, 0.8, 0.5, 0.2]

    def __init__(self, seed: int):
        if seed < DELTA_COMBO_BASE:
            raise ValueError(
                f"combo tier seeds start at {DELTA_COMBO_BASE}"
            )
        self.seed = seed
        self._g = DmlSequenceGen(seed)
        self.rng = self._g.rng

    def generate(self) -> dict[str, Any]:
        rng = self.rng
        g = self._g
        column_mapping = rng.choice(["name", "name", "id"])
        partition = rng.choice([None, ("identity", "seg")])
        ops: list[dict[str, Any]] = [
            {"op": "append", "rows": g._rows(rng.randint(150, 300)),
             "extras": []}
        ]
        for _ in range(rng.randint(6, 10)):
            kind = rng.choices(self.KINDS, self.WEIGHTS)[0]
            if kind == "append":
                ops.append(
                    {"op": "append",
                     "rows": g._rows(rng.randint(50, 150),
                                     with_extras=True),
                     "extras": list(g.extras)}
                )
            elif kind == "delete":
                ops.append({"op": "delete", "predicate": g._predicate(),
                            "dmode": rng.choice(["dv", "cow"])})
            elif kind == "delete_eq":
                ks = sorted({rng.randint(1, 400)
                             for _ in range(rng.randint(3, 20))})
                ops.append({"op": "delete_eq", "keys": ks,
                            "dmode": rng.choice(["dv", "cow"])})
            elif kind == "update":
                ops.append({"op": "update", "set": g._set_exprs(),
                            "predicate": g._predicate()})
            elif kind == "merge":
                # pad rows with None per live extra AFTER drawing them,
                # so the rng stream (and every seed's shape) is
                # untouched — a 5-tuple against the widened
                # _schema_with(extras) schema crashes createDataFrame
                # (r15 code-review find, seed 20025)
                mrows = [
                    r + (None,) * len(g.extras)
                    for r in g._unique_key_rows(rng.randint(20, 60))
                ]
                ops.append(
                    {"op": "merge",
                     "mode": rng.choice(["upsert", "delete",
                                         "insert_only"]),
                     "rows": mrows,
                     "extras": list(g.extras)}
                )
            elif kind == "add_column":
                name = f"x{g._next_x}"
                g._next_x += 1
                g.extras.append(name)
                ops.append({"op": "add_column", "name": name})
            elif kind == "rename_column":
                if not g.extras:
                    ops.append({"op": "compact"})
                else:
                    old = rng.choice(g.extras)
                    new = old + "r"
                    g.extras[g.extras.index(old)] = new
                    ops.append({"op": "rename_column", "old": old,
                                "new": new})
            elif kind == "drop_column":
                if not g.extras:
                    ops.append({"op": "compact"})
                else:
                    name = g.extras.pop(rng.randrange(len(g.extras)))
                    ops.append({"op": "drop_column", "name": name})
            elif kind == "checkpoint":
                ops.append({"op": "checkpoint",
                            "style": rng.choice(["classic", "v2",
                                                 "multipart"])})
            else:
                ops.append({"op": kind})
            ops[-1]["cols_after"] = _BASE_COLS + list(g.extras)
        return {"column_mapping": column_mapping, "partition": partition,
                "ops": ops}


def run_sequence_delta_combo(spark, con, seed: int, root: str, compare):
    """Dual-apply a combo-tier sequence through the Delta verbs.
    Returns (problems, coverage) — coverage records the combo axes
    (column-mapping mode, checkpoint styles, delete modes, evolution
    op counts) so the gate can assert every axis actually fuzzed."""
    from pg_datalake_spark.tables import delta_log as dl

    gen = DeltaComboGen(seed).generate()
    part = gen["partition"]
    partition_by = [part[1]] if part and part[0] == "identity" else None
    twin = f"fuzz_twin_c{seed}"
    con.execute(f"DROP TABLE IF EXISTS {twin}")
    con.execute(
        f"CREATE TABLE {twin} "
        "(k BIGINT, seg VARCHAR, qty BIGINT, price DOUBLE, note VARCHAR)"
    )
    problems: list[str] = []
    cov: dict[str, Any] = {
        "ops": {}, "modes": set(), "styles": set(),
        "cm": gen["column_mapping"],
    }
    try:
        first = gen["ops"][0]
        df = spark.createDataFrame(first["rows"], SCHEMA).coalesce(4)
        dl.write_delta_table(
            df, root, partition_by=partition_by,
            column_mapping=gen["column_mapping"],
        )
        _twin_insert(con, twin, first["rows"])
        for i, op in enumerate(gen["ops"]):
            if i > 0:
                mode = op.get("dmode", "cow")
                if op["op"] in ("delete", "delete_eq"):
                    cov["modes"].add(mode)
                if op["op"] == "checkpoint":
                    cov["styles"].add(op["style"])
                apply_op_delta(spark, root, con, twin, op, mode)
            cov["ops"][op["op"]] = cov["ops"].get(op["op"], 0) + 1
            cols = op.get("cols_after") or _BASE_COLS
            got = dl.read_delta_table(spark, root).select(*cols).toPandas()
            want = con.execute(
                f"SELECT {', '.join(cols)} FROM {twin}"
            ).df()
            step_problems = compare(got, want)
            if step_problems:
                problems.append(
                    f"combo seed {seed} step {i} [{op['op']}]: "
                    f"{step_problems[:2]} (op={str(op)[:160]})"
                )
                break
    finally:
        con.execute(f"DROP TABLE IF EXISTS {twin}")
    cov["modes"] = sorted(cov["modes"])
    cov["styles"] = sorted(cov["styles"])
    return problems, cov
