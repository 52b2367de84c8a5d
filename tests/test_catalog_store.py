"""Object-store catalog: a second engine discovers tables from the
root alone (reference: object_store_catalog.c pointer-file catalog)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.tables import LakeTable
from pg_datalake_spark.tables.catalog_store import ObjectStoreCatalog
from pg_datalake_spark.tables.iceberg_external import (
    _local,
    add_position_deletes,
    export_iceberg_snapshot,
    snapshot_files,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def populated_catalog(spark):
    """A catalog root holding one exported Iceberg table and one
    LakeTable, built by the 'first engine'."""
    t = load_tables(spark, SF_DIR, ["orders", "nation"])
    cat_root = tempfile.mkdtemp(prefix="cat_")
    cat = ObjectStoreCatalog(cat_root)

    ice_loc = tempfile.mkdtemp(prefix="cat_ice_") + "/t"
    export_iceberg_snapshot(t["orders"], ice_loc)
    cat.register_iceberg("orders_ice", ice_loc)

    lake_root = tempfile.mkdtemp(prefix="cat_lake_") + "/t"
    lt = LakeTable.create(spark, lake_root, t["nation"].schema)
    lt.append(t["nation"])
    cat.register_lake("nation_lake", lake_root)

    return cat_root, t["orders"].count(), t["nation"].count(), ice_loc


def test_second_engine_discovers_and_reads(spark, populated_catalog):
    cat_root, n_orders, n_nation, _ = populated_catalog
    # a fresh session state, knowing ONLY the catalog root string
    engine2 = spark.newSession()
    cat = ObjectStoreCatalog(cat_root)
    assert cat.list_tables() == ["nation_lake", "orders_ice"]
    assert cat.read_table(engine2, "orders_ice").count() == n_orders
    assert cat.read_table(engine2, "nation_lake").count() == n_nation
    desc = cat.describe("orders_ice")
    assert desc["format"] == "iceberg" and desc["catalog-version"] == 1


def test_pointer_pinning_and_recommit(spark, populated_catalog):
    """The pointer pins a metadata version: new snapshots are invisible
    until re-register, and re-registering bumps the catalog version."""
    cat_root, n_orders, _, ice_loc = populated_catalog
    cat = ObjectStoreCatalog(cat_root)

    data_files, _ = snapshot_files(ice_loc)
    doomed = (
        spark.read.parquet(*[_local(p) for p in data_files])
        .select(
            F.col("_metadata.file_path").alias("fp"),
            F.col("_metadata.row_index").alias("pos"),
            "o_orderkey",
        )
        .filter((F.col("o_orderkey") % 10) == 0)
        .collect()
    )
    add_position_deletes(ice_loc, [(r.fp, r.pos) for r in doomed])

    # pinned pointer still reads the pre-delete snapshot
    assert cat.read_table(spark, "orders_ice").count() == n_orders
    # catalog commit: pointer moves to the new metadata version
    entry = cat.register_iceberg("orders_ice", ice_loc)
    assert entry["catalog-version"] == 2
    assert cat.read_table(spark, "orders_ice").count() == n_orders - len(doomed)


def test_tables_view(spark, populated_catalog):
    cat_root, *_ = populated_catalog
    cat = ObjectStoreCatalog(cat_root)
    rows = {r.table_name: r for r in cat.tables_view(spark).collect()}
    assert rows["orders_ice"].format == "iceberg"
    assert rows["orders_ice"].metadata_location.endswith(".metadata.json")
    assert rows["nation_lake"].format == "lake"
    assert rows["nation_lake"].catalog_version >= 1


def test_name_validation_and_drop(populated_catalog):
    cat_root, *_ = populated_catalog
    cat = ObjectStoreCatalog(cat_root)
    with pytest.raises(ValueError):
        cat.register_lake("../escape", "/tmp/x")
    cat.register_lake("tmp_tbl", "/tmp/nowhere")
    assert cat.exists("tmp_tbl")
    cat.drop("tmp_tbl")
    assert not cat.exists("tmp_tbl")
    assert "tmp_tbl" not in cat.list_tables()


def test_manifest_commit_is_atomic_and_corrupt_tip_falls_back(tmp_path):
    """r8 (ADVICE): commits link a fully-written temp file into place, so a
    reader can never see a partial manifest; a corrupt tip (pre-link-era
    crash, lying fs) degrades to the previous version instead of wedging."""
    import os

    cat = ObjectStoreCatalog(str(tmp_path / "cat"))
    cat.register_lake("a", "/tmp/a")
    cat.register_lake("b", "/tmp/b")
    assert cat.current_version() == 2
    # no stray .commit temp files survive a commit
    leftovers = [
        f
        for f in os.listdir(cat._manifest_dir)
        if f.endswith(".commit")
    ]
    assert leftovers == []
    # corrupt the tip: default read falls back one version, commits rebase
    # from the readable state instead of crashing
    with open(cat._manifest_path(2), "w") as fh:
        fh.write("{not json")
    m = cat._load_manifest()
    assert m["version"] == 1 and "a" in m["tables"]
    # pinned read of the corrupt version still fails loudly
    with pytest.raises(Exception):
        cat._load_manifest(2)


def test_commit_past_corrupt_tip_quarantines_and_succeeds(tmp_path):
    """r9 (ADVICE): the corrupt-tip fallback must not wedge WRITES — a
    commit on the fallback base targets the corrupt version, detects it
    is unreadable (not a real winner), quarantines it aside, and retries
    into the freed slot instead of spinning to CatalogConflictError."""
    import os

    cat = ObjectStoreCatalog(str(tmp_path / "cat"))
    cat.register_lake("a", "/tmp/a")
    cat.register_lake("b", "/tmp/b")
    with open(cat._manifest_path(2), "w") as fh:
        fh.write("{not json")
    # write through the corrupt tip: previously spun 5 CAS rounds and
    # raised; now quarantines v2 and commits a NEW v2
    cat.register_lake("c", "/tmp/c")
    assert cat.current_version() == 2
    m = cat._load_manifest()
    assert set(m["tables"]) == {"a", "c"}  # b's commit was the corrupted one
    quarantined = [
        f for f in os.listdir(cat._manifest_dir) if ".corrupt-" in f
    ]
    assert len(quarantined) == 1
    # subsequent commits proceed normally on the repaired chain
    cat.register_lake("d", "/tmp/d")
    assert cat.current_version() == 3
    assert set(cat._load_manifest()["tables"]) == {"a", "c", "d"}
