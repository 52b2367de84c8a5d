"""Cross-table transaction semantics of the object-store catalog
(r11): the reference gets multi-table atomicity from Postgres MVCC
(docs/iceberg-tables.md:528-538); this repo re-creates the property
with one catalog-manifest CAS over pinned table pointers. These tests
drive the ACTUAL DML paths (LakeTable append/delete) through
CatalogTransaction and pin the MVCC-visible behaviors: all-or-nothing
visibility, crash invisibility, repeatable read at a pinned catalog
version, disjoint-writer rebase, and write-write conflict detection.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pg_datalake_spark.tables import LakeTable
from pg_datalake_spark.tables.catalog_store import (
    CatalogConflictError,
    ObjectStoreCatalog,
)


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("string").alias("grp")
    )


@pytest.fixture()
def two_tables(spark, tmp_path):
    cat = ObjectStoreCatalog(str(tmp_path / "cat"))
    roots = {}
    for name, hi in (("a", 40), ("b", 60)):
        root = str(tmp_path / name)
        lt = LakeTable.create(spark, root, _mk(spark, 0, hi).schema)
        lt.append(_mk(spark, 0, hi))
        roots[name] = root
    (
        cat.transaction()
        .stage_lake("a", roots["a"], pin=True)
        .stage_lake("b", roots["b"], pin=True)
        .commit()
    )
    return cat, roots


def _counts(spark, view_or_cat, names=("a", "b")):
    return {n: view_or_cat.read_table(spark, n).count() for n in names}


def test_multi_table_dml_atomic_visibility(spark, two_tables):
    cat, roots = two_tables
    v0 = cat.current_version()
    pinned = cat.at_version(v0)

    # table-level DML commits land in the TABLE logs...
    LakeTable(spark, roots["a"]).append(_mk(spark, 100, 130))   # +30
    LakeTable(spark, roots["b"]).delete("k < 10")               # −10
    # ...but catalog readers still resolve the OLD pins: atomicity
    assert _counts(spark, cat) == {"a": 40, "b": 60}

    # one manifest swap flips BOTH tables at once
    cat.transaction().refresh("a").refresh("b").commit()
    assert cat.current_version() == v0 + 1
    assert _counts(spark, cat) == {"a": 70, "b": 50}

    # repeatable read: the pre-commit view still sees the old world
    assert _counts(spark, pinned) == {"a": 40, "b": 60}
    # and a fresh pin of the new version sees the new one
    assert _counts(spark, cat.at_version(v0 + 1)) == {"a": 70, "b": 50}


def test_abandoned_transaction_is_invisible(spark, two_tables):
    cat, roots = two_tables
    v0 = cat.current_version()
    LakeTable(spark, roots["a"]).append(_mk(spark, 200, 250))
    txn = cat.transaction().refresh("a")  # staged, never committed
    del txn  # crash before the manifest swap
    assert cat.current_version() == v0
    assert _counts(spark, cat)["a"] == 40  # orphan snapshot invisible


def test_disjoint_writers_rebase(spark, two_tables):
    cat, roots = two_tables
    v0 = cat.current_version()
    LakeTable(spark, roots["a"]).append(_mk(spark, 300, 310))
    LakeTable(spark, roots["b"]).append(_mk(spark, 300, 320))
    t1 = cat.transaction().refresh("a")
    t2 = cat.transaction().refresh("b")
    # t2 wins the first CAS; t1's base is stale but touches only a —
    # it rebases onto the new tip and succeeds (disjoint writers)
    t2.commit()
    res = t1.commit()
    assert res["version"] == v0 + 2
    assert _counts(spark, cat) == {"a": 50, "b": 80}


def test_write_write_conflict_raises(spark, two_tables):
    cat, roots = two_tables
    t1 = cat.transaction().refresh("a")
    LakeTable(spark, roots["a"]).append(_mk(spark, 400, 410))
    cat.transaction().refresh("a").commit()  # concurrent writer wins
    with pytest.raises(CatalogConflictError, match="'a' changed"):
        t1.commit()


def test_multi_table_swap_is_single_version_bump(spark, two_tables):
    cat, roots = two_tables
    v0 = cat.current_version()
    LakeTable(spark, roots["a"]).append(_mk(spark, 500, 510))
    LakeTable(spark, roots["b"]).append(_mk(spark, 500, 505))
    res = cat.transaction().refresh("a").refresh("b").commit()
    assert res["version"] == v0 + 1 == cat.current_version()
    # both pins advanced in the one commit
    assert cat.describe("a")["snapshot-id"] is not None
    assert _counts(spark, cat) == {"a": 50, "b": 65}
