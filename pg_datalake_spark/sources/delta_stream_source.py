"""Delta tables as a Spark STRUCTURED STREAMING SOURCE (Spark 4
Python Data Source API).

delta-spark exposes every Delta table as a streaming source:
``spark.readStream.format("delta")`` tails the transaction log and
emits each commit's new rows exactly once, erroring on non-append
commits unless ``skipChangeCommits`` is set. This module rebuilds that
contract on the repo's pure-Python Delta log reader
(tables/delta_log.py) through the sanctioned Spark 4 extension point:

    spark.dataSource.register(DeltaStreamDataSource)
    (spark.readStream.format("pglake_delta")
          .option("path", "/data/events_delta")
          .load()
          .writeStream...)

Semantics (matching the delta-spark source):

- the OFFSET is the last fully-consumed commit version (JSON
  ``{"version": N}``); ``startingVersion`` (default 0) replays the
  table from its creation commit;
- append commits (dataChange adds, no removes) emit their files' rows;
- ``dataChange=false`` commits (OPTIMIZE / clustering) are always
  skipped — rearrangements are not changes;
- a commit carrying removes or deletion-vector adds RAISES (the
  stream would silently miss deletes) unless
  ``.option("skipChangeCommits", "true")``, which skips the whole
  commit — both halves exactly delta-spark's behavior;
- partition-column values are re-injected from ``add.partitionValues``
  (hive-layout data files don't store them);
- column-mapped tables fail loud (physical-name indirection is a
  batch-reader feature; the jar-based source is the cluster path).

Scale shape: offset resolution and commit classification touch ONLY
the JSON log (O(actions) driver metadata, same class as snapshot
replay); row reads are one InputPartition per (commit, data file),
scheduled across executors, each yielding Arrow RecordBatches straight
from the parquet footer — no per-row Python in the data path.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

__all__ = ["DeltaStreamDataSource"]


class _FilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        partition_values: dict,
        fields: list[tuple[str, str]],
        part_cols: list[str],
    ):
        self.path = path
        self.partition_values = partition_values
        self.fields = fields            # (name, simpleString type) in order
        self.part_cols = part_cols


def _commit_actions(location: str, version: int) -> list[dict]:
    from pg_datalake_spark.tables.delta_log import _commit_path

    path = _commit_path(location, version)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Delta commit v{version} under {location} is missing "
            "(vacuumed log?): streaming cannot replay it"
        )
    with open(path) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def _latest_meta(location: str) -> dict:
    """Newest metaData action from the JSON log alone (the streaming
    source replays JSON commits, so it requires them to exist — a
    fully-checkpoint-cleaned log fails loud rather than pulling a
    SparkSession into the data source)."""
    from pg_datalake_spark.tables.delta_log import (
        _list_commit_versions,
        _norm_location,
    )

    location = _norm_location(location)
    for v in reversed(_list_commit_versions(location)):
        for a in _commit_actions(location, v):
            if "metaData" in a:
                return a["metaData"]
    raise NotImplementedError(
        f"no metaData action in the JSON log under {location} "
        "(checkpoint-only log?): the streaming source replays JSON "
        "commits — retain them or use the delta-spark source"
    )


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.location = options.get("path")
        if not self.location:
            raise ValueError("pglake_delta requires .option('path', ...)")
        if "startingversion" in options and "startingtimestamp" in options:
            raise ValueError(
                "startingVersion and startingTimestamp are exclusive"
            )
        if "startingtimestamp" in options:
            # delta-spark semantics: start at the first commit AT OR
            # AFTER the timestamp
            from pg_datalake_spark.tables.delta_log import delta_history

            ts = int(options["startingtimestamp"])
            later = [
                e["version"]
                for e in delta_history(None, self.location)
                if e["timestamp_ms"] >= ts
            ]
            if not later:
                raise ValueError(
                    f"startingTimestamp {ts} is after the last commit of "
                    f"{self.location} (delta-spark raises here too)"
                )
            self.starting_version = min(later)
        else:
            self.starting_version = int(options.get("startingversion", 0))
        self.skip_change_commits = (
            str(options.get("skipchangecommits", "false")).lower() == "true"
        )
        self.schema = schema
        from pg_datalake_spark.tables import delta_log as dl

        meta = _latest_meta(self.location)
        if dl._cm_mode(meta) != "none":
            raise NotImplementedError(
                "pglake_delta streaming does not support column-mapped "
                "tables; use the delta-spark source on a cluster"
            )
        self.part_cols = list(meta.get("partitionColumns") or [])

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        from pg_datalake_spark.tables.delta_log import delta_table_version

        return {"version": delta_table_version(self.location)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from pg_datalake_spark.tables.delta_log import _make_abs

        _abs = _make_abs(self.location)
        fields = [(f.name, f.dataType.simpleString()) for f in self.schema.fields]
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            adds, has_change = [], False
            for a in _commit_actions(self.location, v):
                if "remove" in a and a["remove"].get("dataChange", True):
                    has_change = True
                elif "add" in a:
                    ad = a["add"]
                    if not ad.get("dataChange", True):
                        continue  # OPTIMIZE rearrangement: never data
                    if ad.get("deletionVector"):
                        has_change = True
                    adds.append(ad)
            if has_change:
                if self.skip_change_commits:
                    continue
                raise ValueError(
                    f"Delta commit v{v} under {self.location} changes or "
                    "deletes existing rows; streaming it as inserts would "
                    "be wrong. Set .option('skipChangeCommits', 'true') "
                    "to skip such commits (delta-spark semantics)."
                )
            parts += [
                _FilePartition(
                    _abs(ad["path"]),
                    ad.get("partitionValues") or {},
                    fields,
                    self.part_cols,
                )
                for ad in adds
            ]
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        import datetime as _dt

        pf = pq.ParquetFile(partition.path)
        part_vals = partition.partition_values
        for batch in pf.iter_batches():
            n = batch.num_rows
            cols = []
            for name, stype in partition.fields:
                if name in partition.part_cols:
                    # hive-layout files don't store partition columns:
                    # re-inject the add.partitionValues literal, typed
                    raw = part_vals.get(name)
                    pa_type = {
                        "bigint": pa.int64(), "int": pa.int32(),
                        "double": pa.float64(), "date": pa.date32(),
                        "boolean": pa.bool_(),
                    }.get(stype, pa.string())
                    if raw is None:
                        cols.append(pa.nulls(n, pa_type))
                    else:
                        py = (
                            raw if pa_type == pa.string()
                            else raw.lower() == "true" if stype == "boolean"
                            else float(raw) if stype == "double"
                            else _dt.date.fromisoformat(raw) if stype == "date"
                            else int(raw)
                        )
                        cols.append(pa.array([py] * n, pa_type))
                else:
                    cols.append(
                        batch.column(batch.schema.get_field_index(name))
                    )
            yield pa.RecordBatch.from_arrays(
                cols, names=[f[0] for f in partition.fields]
            )

    def commit(self, end: dict) -> None:
        pass  # progress is checkpointed by the engine


class DeltaStreamDataSource(DataSource):
    """``format("pglake_delta")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "pglake_delta"

    def schema(self) -> T.StructType:
        meta = _latest_meta(self.options.get("path"))
        return T.StructType.fromJson(json.loads(meta["schemaString"]))

    def streamReader(self, schema: T.StructType) -> DeltaStreamReader:
        return DeltaStreamReader(schema, self.options)
