"""Object-store catalog: table discovery over a shared storage root.

The reference exposes its tables to other engines through a catalog
whose source of truth lives IN object storage — per-table pointer
files mapping table name → current metadata location, so any engine
that can list the catalog root can discover and read every table with
no catalog service running (reference behavior:
pg_lake_iceberg/src/object_store_catalog/object_store_catalog.c:28-60;
the REST-catalog half lives in tables/rest_catalog.py).

Layout (all JSON, KB-scale, driver-side):

    <root>/tables/<name>.json   — {"name", "format": "iceberg"|"lake",
                                   "location", "metadata-location"?,
                                   "catalog-version"}

Pointer updates are atomic (tempfile + os.replace) and carry a
monotonically increasing per-table version, so a re-register after a
new snapshot is a catalog commit, not a blind overwrite. Reads go
through the normal scan paths (Iceberg metadata parse → distributed
parquet scan with pushdown; LakeTable scan), so a "second engine" —
any fresh SparkSession — needs only the catalog root string.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class ObjectStoreCatalog:
    def __init__(self, root: str):
        self.root = root
        self._tables_dir = os.path.join(root, "tables")
        os.makedirs(self._tables_dir, exist_ok=True)

    # -- write half ---------------------------------------------------------

    def _pointer_path(self, name: str) -> str:
        if "/" in name or name.startswith("."):
            raise ValueError(f"invalid table name: {name!r}")
        return os.path.join(self._tables_dir, f"{name}.json")

    def _write_pointer(self, name: str, entry: dict) -> dict:
        prev = self.describe(name) if self.exists(name) else None
        entry["catalog-version"] = (prev or {}).get("catalog-version", 0) + 1
        fd, tmp = tempfile.mkstemp(dir=self._tables_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(entry, fh, indent=2)
        os.replace(tmp, self._pointer_path(name))  # atomic on POSIX
        return entry

    def register_iceberg(self, name: str, location: str) -> dict:
        """Point ``name`` at an Iceberg table's CURRENT metadata file
        (pinned — later snapshots need a re-register, exactly like the
        reference's metadata-location pointer semantics)."""
        from pg_datalake_spark.tables.iceberg_external import load_table_metadata

        meta_dir = os.path.join(location, "metadata")
        hint = os.path.join(meta_dir, "version-hint.text")
        if os.path.exists(hint):
            with open(hint) as fh:
                metadata_location = os.path.join(
                    meta_dir, f"v{fh.read().strip()}.metadata.json"
                )
        else:
            load_table_metadata(location)  # validates the table exists
            metadata_location = None
        return self._write_pointer(
            name,
            {
                "name": name,
                "format": "iceberg",
                "location": location,
                "metadata-location": metadata_location,
            },
        )

    def register_lake(self, name: str, root: str) -> dict:
        return self._write_pointer(
            name, {"name": name, "format": "lake", "location": root}
        )

    def drop(self, name: str) -> None:
        os.unlink(self._pointer_path(name))

    # -- read half (all an external engine needs) ---------------------------

    def exists(self, name: str) -> bool:
        return os.path.exists(self._pointer_path(name))

    def list_tables(self) -> list[str]:
        return sorted(
            f[: -len(".json")]
            for f in os.listdir(self._tables_dir)
            if f.endswith(".json")
        )

    def describe(self, name: str) -> dict:
        with open(self._pointer_path(name)) as fh:
            return json.load(fh)

    def tables_view(self, spark: SparkSession) -> DataFrame:
        """JDBC-catalog-style listing of every registered table — the
        union of internal (LakeTable) and external (Iceberg) entries
        (reference: the `iceberg_tables` view unioning
        `lake_iceberg.tables_internal/_external`)."""
        rows = []
        for name in self.list_tables():
            e = self.describe(name)
            rows.append(
                (
                    name,
                    e["format"],
                    e["location"],
                    e.get("metadata-location"),
                    e.get("catalog-version"),
                )
            )
        return spark.createDataFrame(
            rows,
            "table_name string, format string, location string, "
            "metadata_location string, catalog_version int",
        )

    def read_table(self, spark: SparkSession, name: str) -> DataFrame:
        """Resolve a pointer and scan the table — Iceberg through the
        metadata layer (pinned to the registered metadata-location),
        LakeTable through its own scan."""
        entry = self.describe(name)
        if entry["format"] == "iceberg":
            from pg_datalake_spark.tables.iceberg_external import read_iceberg_table

            return read_iceberg_table(
                spark, entry["location"], metadata_file=entry.get("metadata-location")
            )
        if entry["format"] == "lake":
            from pg_datalake_spark.tables import LakeTable

            return LakeTable(spark, entry["location"]).scan()
        raise ValueError(f"unknown table format {entry['format']!r} for {name}")
