"""Delta Lake read-path parity queries (off-window, oracle-checked).

The reference reads Delta natively (pg_lake_engine/src/pgduck/
read_data.c:286, docs/file-formats-reference.md:33-37). Offline, the
pure-Python ``_delta_log`` reader (tables/delta_log.py) replays a real
multi-commit history — create, append, copy-on-write DELETE, classic
checkpoint, post-checkpoint append — and the scan plus a VERSION AS OF
time travel are verified value-exact against DuckDB computing the same
state relationally from the source parquet (the oracle never sees the
Delta format, so the whole log-replay path is what's being checked).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.plans.registry import register
from pg_datalake_spark.tables import LakeTable


@register(
    "lake09_delta_scan",
    oracle="""
    WITH final_state AS (
      SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 100 = 0
    )
    SELECT 'current' AS phase, o_orderstatus,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM final_state GROUP BY o_orderstatus
    UNION ALL
    SELECT 'v1' AS phase, o_orderstatus,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders GROUP BY o_orderstatus
    """,
)
def lake09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta table end-to-end offline: v0 create (partitioned on
    o_orderstatus, even keys), v1 append (odd keys), v2 copy-on-write
    DELETE (o_orderkey % 7 = 0), checkpoint at v2, v3 append
    (o_orderkey % 100 = 0 re-added). The ``current`` phase reads
    checkpoint + tail through read_files(fmt="delta"); the ``v1``
    phase time-travels (VERSION AS OF 1) across the checkpoint back to
    the full order set. Partition values come from the log's
    ``add.partitionValues``, not the data files."""
    from pg_datalake_spark.sources.readers import read_files
    from pg_datalake_spark.tables import delta_log as dl

    t = load_tables(spark, sf_dir, ["orders"])
    loc = tempfile.mkdtemp(prefix="lake09_") + "/delta_orders"
    dl.write_delta_table(
        t["orders"].filter(F.col("o_orderkey") % 2 == 0), loc,
        partition_by=["o_orderstatus"],
    )
    dl.append_delta(t["orders"].filter(F.col("o_orderkey") % 2 == 1), loc)
    dl.delete_where_delta(spark, loc, "o_orderkey % 7 = 0")
    dl.write_delta_checkpoint(spark, loc)
    dl.append_delta(t["orders"].filter(F.col("o_orderkey") % 100 == 0), loc)

    agg = [
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_cents"),
    ]
    cur = (
        read_files(spark, loc, fmt="delta")
        .groupBy("o_orderstatus")
        .agg(*agg)
        .select(F.lit("current").alias("phase"), "o_orderstatus", "n", "total_cents")
    )
    v1 = (
        read_files(spark, loc, fmt="delta", versionAsOf=1)
        .groupBy("o_orderstatus")
        .agg(*agg)
        .select(F.lit("v1").alias("phase"), "o_orderstatus", "n", "total_cents")
    )
    return cur.unionByName(v1)


@register(
    "lake10_bucketed_iceberg",
    oracle="""
    SELECT 'k41' AS phase, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders WHERE o_custkey = 41
    UNION ALL
    SELECT 'k77' AS phase, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders WHERE o_custkey = 77
    UNION ALL
    SELECT 'all' AS phase, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    """,
)
def lake10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec-bucket external Iceberg end-to-end (r7: tables/
    spec_bucket.py): orders exported bucket(16, o_custkey)-partitioned,
    then two single-customer reads whose equality filters prune via
    the RECORDED murmur3 bucket values (plan_scan must skip files) and
    a full-table read — all three value-exact against DuckDB on the
    source parquet, which never saw the bucket transform."""
    from pg_datalake_spark.tables.iceberg_external import (
        export_iceberg_snapshot,
        plan_scan,
        read_iceberg_table,
    )

    t = load_tables(spark, sf_dir, ["orders"])
    loc = tempfile.mkdtemp(prefix="lake10_") + "/bucketed_orders"
    export_iceberg_snapshot(t["orders"], loc, partition_by=["bucket(16, o_custkey)"])

    agg = [
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_cents"),
    ]

    def phase(name: str, key: int | None) -> DataFrame:
        filters = [("o_custkey", "=", key)] if key is not None else None
        if key is not None:
            plan = plan_scan(loc, filters)
            assert plan["skipped"], "bucket equality pruning skipped no files"
        return (
            read_iceberg_table(spark, loc, filters=filters)
            .agg(*agg)
            .select(F.lit(name).alias("phase"), "n", "total_cents")
        )

    return (
        phase("k41", 41).unionByName(phase("k77", 77)).unionByName(phase("all", None))
    )


@register(
    "lake12_delta_deletion_vectors",
    oracle="""
    SELECT 'current' AS phase, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderkey % 5 <> 0
    UNION ALL
    SELECT 'v1' AS phase, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders WHERE o_orderkey % 7 <> 0
    UNION ALL
    SELECT 'v0' AS phase, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    """,
)
def lake12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta DELETION VECTORS end-to-end (r8; PROTOCOL.md "Deletion
    Vectors" via tables/dv_codec.py — the row-delete flavor modern
    Delta writers emit by default, which the reference reads natively
    through delta_scan, pg_lake_engine/src/pgduck/read_data.c:286):
    v0 create (partitioned on o_orderstatus), v1 merge-on-read DV
    delete of ``o_orderkey % 7 = 0`` FORCED to sidecar-file storage
    ('u', roaring bitmaps at CRC-checked offsets), v2 DV delete of
    ``o_orderkey % 5 = 0`` FORCED inline ('i', Z85) — its bitmaps must
    UNION with v1's — then a classic checkpoint that must carry the
    deletionVector structs. ``current`` reads checkpoint-seeded state
    (both DV generations applied, decoded executor-side and
    anti-joined on ``_metadata`` row positions); ``v1``/``v0``
    time-travel across the DV commits. DuckDB reproduces every phase
    relationally from the source parquet — it never sees the Delta log
    or the bitmaps, so the whole descriptor→roaring→anti-join path is
    what's being value-checked."""
    from pg_datalake_spark.sources.readers import read_files
    from pg_datalake_spark.tables import delta_log as dl

    t = load_tables(spark, sf_dir, ["orders"])
    loc = tempfile.mkdtemp(prefix="lake12_") + "/delta_dv_orders"
    dl.write_delta_table(t["orders"], loc, partition_by=["o_orderstatus"])
    dl.delete_where_delta(spark, loc, "o_orderkey % 7 = 0", mode="dv",
                          inline_threshold=0)
    dl.delete_where_delta(spark, loc, "o_orderkey % 5 = 0", mode="dv",
                          inline_threshold=1 << 20)
    dl.write_delta_checkpoint(spark, loc)

    agg = [
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_cents"),
    ]

    def phase(name: str, version: int | None) -> DataFrame:
        return (
            read_files(spark, loc, fmt="delta", versionAsOf=version)
            .agg(*agg)
            .select(F.lit(name).alias("phase"), "n", "total_cents")
        )

    return phase("current", None).unionByName(phase("v1", 1)).unionByName(
        phase("v0", 0)
    )


@register(
    "lake11_cross_table_txn",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    pre_a AS (SELECT * FROM src WHERE o_orderkey % 3 = 0),
    pre_b AS (SELECT * FROM src WHERE o_orderkey % 3 <> 0),
    post_a AS (SELECT * FROM pre_a
               UNION ALL SELECT * FROM pre_b WHERE o_orderstatus = 'F'),
    post_b AS (SELECT * FROM pre_b WHERE o_orderstatus <> 'F'),
    lbl AS (
      SELECT 'pre'  AS phase, 'acct_a' AS tbl, * FROM pre_a
      UNION ALL SELECT 'pre',  'acct_b', * FROM pre_b
      UNION ALL SELECT 'post', 'acct_a', * FROM post_a
      UNION ALL SELECT 'post', 'acct_b', * FROM post_b
    )
    SELECT phase, tbl, count(*) AS n,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f
    FROM lbl GROUP BY phase, tbl
    """,
)
def lake11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table ACID transaction through the object-store catalog
    (reference: Postgres MVCC makes multi-table lake transactions
    atomic for every engine-mediated reader — SURVEY §2.9; Spark-side
    analog = one catalog-manifest CAS swap,
    tables/catalog_store.py:CatalogTransaction). Two pinned LakeTables
    (orders split on o_orderkey % 3); the txn moves every 'F'-status
    row from acct_b to acct_a — append to A, MOR-delete from B at the
    table level, then ONE manifest swap publishes both. The 'pre'
    phase reads through ``at_version`` captured BEFORE the swap but
    executed AFTER the table-level writes — snapshot isolation is what
    is being value-checked; DuckDB reproduces both phases relationally
    from orders (it never sees the catalog or the table format)."""
    cat_root = tempfile.mkdtemp(prefix="lake11_cat_")
    from pg_datalake_spark.tables.catalog_store import ObjectStoreCatalog

    t = load_tables(spark, sf_dir, ["orders"])
    src = t["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cat = ObjectStoreCatalog(cat_root)
    tables = {}
    for name, pred in (("acct_a", "= 0"), ("acct_b", "<> 0")):
        lt = LakeTable.create(
            spark, tempfile.mkdtemp(prefix=f"lake11_{name}_") + "/t", src.schema
        )
        lt.append(src.filter(F.expr(f"o_orderkey % 3 {pred}")))
        cat.register_lake(name, lt.root, pin=True)
        tables[name] = lt
    pre = cat.at_version(cat.current_version())

    # the transaction: table-level writes, then one atomic swap
    txn = cat.transaction()
    moved = tables["acct_b"].scan(filters=[("o_orderstatus", "=", "F")])
    tables["acct_a"].append(moved)
    tables["acct_b"].delete("o_orderstatus = 'F'")
    txn.refresh("acct_a").refresh("acct_b").commit()
    post = cat.at_version(cat.current_version())

    def phase(view, label: str) -> DataFrame:
        out = None
        for name in ("acct_a", "acct_b"):
            agg = (
                view.read_table(spark, name)
                .agg(
                    F.count("*").alias("n"),
                    F.sum("cents").alias("total_cents"),
                    F.count_if(F.col("o_orderstatus") == "F").alias("n_f"),
                )
                .select(
                    F.lit(label).alias("phase"), F.lit(name).alias("tbl"),
                    "n", "total_cents", "n_f",
                )
            )
            out = agg if out is None else out.unionByName(agg)
        return out

    return phase(pre, "pre").unionByName(phase(post, "post"))


# lake08 standalone feeder: the function + oracle live in lakeops.py;
# the WINDOW row is the merged lake08_lake09_lake10_lake12_lake13_lake14_formats
# suite (r8 widening), so the standalone registration moved here —
# after the window — to keep it in the local parity gate without
# occupying a second driver slot.
from pg_datalake_spark.plans.lakeops import LAKE08_ORACLE, lake08  # noqa: E402

register("lake08_external_iceberg", oracle=LAKE08_ORACLE)(lake08)


@register(
    "lake13_delta_changes",
    oracle="""
    WITH ch AS (
      SELECT 1 AS v, 'insert' AS ct, o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT 2, 'delete', o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT 4, 'delete', o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 = 0
    )
    SELECT CAST(v AS BIGINT) AS commit_version, ct AS change_type,
           count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM ch GROUP BY 1, 2
    """,
)
def lake13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta CHANGE FEED reconstruction (r10; tables/delta_log.
    delta_changes — the table_changes/CDF surface rebuilt from the
    log, no _change_data files): v0 create (orders with key % 3 <> 0),
    v1 append (% 3 = 0 → inserts from a direct scan of the new
    files), v2 DV delete (% 7 = 0 → deletes from the per-file
    position-set difference), v3 OPTIMIZE (dataChange=false →
    contributes NOTHING — the flag's whole purpose), v4 copy-on-write
    delete (% 11 = 0 among survivors → deletes from the exact
    multiset snapshot diff). The oracle reproduces every commit's
    change set relationally; a phantom row from any of the three
    derivation strategies (or anything leaking from the OPTIMIZE
    rewrite) breaks the hash."""
    from pg_datalake_spark.tables import delta_log as dl

    t = load_tables(spark, sf_dir, ["orders"])
    src = t["orders"].select("o_orderkey", "o_totalprice")
    loc = tempfile.mkdtemp(prefix="lake13_") + "/delta_cdf_orders"
    dl.write_delta_table(src.filter("o_orderkey % 3 <> 0").repartition(4), loc)
    dl.append_delta(src.filter("o_orderkey % 3 = 0").repartition(2), loc)
    dl.delete_where_delta(spark, loc, "o_orderkey % 7 = 0", mode="dv")
    dl.optimize_delta(spark, loc, target_file_mb=128)
    dl.delete_where_delta(spark, loc, "o_orderkey % 11 = 0", mode="cow")
    return (
        dl.delta_changes(spark, loc, from_version=0)
        .groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long").alias("total_cents"),
        )
    )


@register(
    "lake14_delta_dml",
    oracle="""
    WITH tgt AS (
      SELECT o_orderkey AS k, o_totalprice AS tp, o_orderstatus AS st
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    merged AS (
      -- matched (k%5=0): tp+1000; unmatched source rows inserted
      SELECT k, CASE WHEN k % 5 = 0 THEN tp + 1000 ELSE tp END AS tp, st
      FROM tgt
      UNION ALL
      SELECT o_orderkey, o_totalprice + 1000, o_orderstatus
      FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0
    ),
    updated AS (
      SELECT k, CASE WHEN st = 'F' THEN tp * 2 ELSE tp END AS tp, st
      FROM merged
    ),
    phases AS (
      SELECT 'merge' AS phase, st, count(*) AS n,
             CAST(sum(CAST(round(tp * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM merged GROUP BY st
      UNION ALL
      SELECT 'update', st, count(*),
             CAST(sum(CAST(round(tp * 100) AS BIGINT)) AS BIGINT)
      FROM updated GROUP BY st
      UNION ALL
      SELECT 'restore', st, count(*),
             CAST(sum(CAST(round(tp * 100) AS BIGINT)) AS BIGINT)
      FROM merged GROUP BY st
    )
    SELECT phase, st AS o_orderstatus, n, total_cents FROM phases
    """,
)
def lake14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta DML completion tier (r10 tail; tables/delta_log.py
    merge_delta / update_delta / restore_delta — the COW writer verbs
    delta-spark ships, rebuilt on the minimal log writer). One table,
    three phases, every phase's aggregate reproduced relationally by
    the oracle:

    - MERGE: target = orders with key%3=0; source = key%5=0 rows with
      price+1000 — matched rows update (t.tp ← s.tp), unmatched insert;
    - UPDATE: price doubled WHERE status 'F' (expression assignment);
    - RESTORE to the post-merge version: its aggregate must equal the
      merge phase's EXACTLY (a forward commit reproducing a prior
      snapshot — hash-proves restore correctness relationally).
    """
    import os as _os

    from pg_datalake_spark.tables import delta_log as dl

    t = load_tables(spark, sf_dir, ["orders"])
    src = t["orders"].select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("tp"),
        F.col("o_orderstatus").alias("st"),
    )
    loc = tempfile.mkdtemp(prefix="lake14_") + "/delta_dml_orders"
    dl.write_delta_table(src.filter("k % 3 = 0").repartition(4), loc)   # v0
    merge_src = src.filter("k % 5 = 0").select(
        "k", (F.col("tp") + 1000).alias("tp"), "st"
    )
    dl.merge_delta(
        spark, loc, merge_src,
        on="t.k = s.k",
        when_matched_update={"tp": "s.tp"},
        when_not_matched_insert=True,
    )                                                                   # v1
    dl.update_delta(spark, loc, {"tp": "tp * 2"}, where="st = 'F'")     # v2

    def agg(tag: str, version: int | None = None) -> DataFrame:
        return (
            dl.read_delta_table(spark, loc, version_as_of=version)
            .groupBy(F.col("st").alias("o_orderstatus"))
            .agg(
                F.count("*").alias("n"),
                F.sum(F.round(F.col("tp") * 100).cast("long"))
                .cast("long").alias("total_cents"),
            )
            .select(F.lit(tag).alias("phase"), "*")
        )

    merge_agg = agg("merge", version=1)
    update_agg = agg("update", version=2)
    dl.restore_delta(spark, loc, version=1)                             # v3
    restore_agg = agg("restore")
    return merge_agg.unionByName(update_agg).unionByName(restore_agg)
