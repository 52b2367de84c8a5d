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
- ``startingVersion`` / ``startingTimestamp`` (first commit at or
  after the instant; mutually exclusive, after-last-commit errors);
- ``readChangeFeed=true`` streams ROW-LEVEL changes instead: appends
  surface as inserts, DV-transition commits as deletes (the per-file
  position diff new ∖ old decoded with pyarrow executor-side — stacked
  DVs emit only newly-deleted rows), with ``_change_type`` /
  ``_commit_version`` / ``_commit_timestamp`` columns; COW rewrites
  cannot be derived per-file and fail loud naming the batch
  ``delta_changes`` API;
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
        cdf: tuple | None = None,
        table_location: str | None = None,
        old_dv: dict | None = None,
        new_dv: dict | None = None,
    ):
        self.path = path
        self.partition_values = partition_values
        self.fields = fields            # (name, simpleString type) in order
        self.part_cols = part_cols
        # CDF mode: (change_type, commit_version, commit_ts_ms); for
        # 'delete' rows the position set is new_dv ∖ old_dv
        self.cdf = cdf
        self.table_location = table_location
        self.old_dv = old_dv
        self.new_dv = new_dv


def _arrow_type(stype: str):
    """Spark simpleString → Arrow type via Spark's own pandas mapping.
    The DataSource read() runs in a worker subprocess with no
    SparkContext, so the simpleString is parsed here (scalars +
    decimal; complex types fail loud naming the type) instead of via
    ``_parse_datatype_string``."""
    import re

    from pyspark.sql.pandas.types import to_arrow_type

    scalars = {
        "string": T.StringType(), "boolean": T.BooleanType(),
        "tinyint": T.ByteType(), "smallint": T.ShortType(),
        "int": T.IntegerType(), "bigint": T.LongType(),
        "float": T.FloatType(), "double": T.DoubleType(),
        "date": T.DateType(), "binary": T.BinaryType(),
        "timestamp": T.TimestampType(),
        "timestamp_ntz": T.TimestampNTZType(),
    }
    s = stype.strip().lower()
    if s in scalars:
        return to_arrow_type(scalars[s])
    m = re.fullmatch(r"decimal\((\d+),\s*(-?\d+)\)", s)
    if m:
        return to_arrow_type(T.DecimalType(int(m[1]), int(m[2])))
    raise NotImplementedError(
        f"streaming-source type {stype!r}: only scalar/decimal columns "
        "are synthesized (partition literals / schema-evolution NULLs)"
    )


def _typed_literal_array(raw: str | None, stype: str, n: int):
    """add.partitionValues literal → a typed n-row Arrow array (hive
    layout stores partition values only in the log, never the file)."""
    import datetime as _dt
    import decimal as _dec

    import pyarrow as pa

    pa_type = _arrow_type(stype)
    if raw is None:
        return pa.nulls(n, pa_type)
    base = stype.split("(")[0]
    if base == "string":
        py = raw
    elif base == "boolean":
        py = raw.lower() == "true"
    elif base in ("double", "float"):
        py = float(raw)
    elif base == "date":
        py = _dt.date.fromisoformat(raw)
    elif base == "timestamp":
        # Delta serializes partition timestamps as 'YYYY-MM-DD HH:MM:SS[.ffffff]'
        py = _dt.datetime.fromisoformat(raw)
    elif base == "decimal":
        py = _dec.Decimal(raw)
    elif base in ("bigint", "int", "smallint", "tinyint"):
        py = int(raw)
    else:
        raise NotImplementedError(
            f"partition column of type {stype!r}: the streaming source "
            "cannot re-inject this partition literal — supported types are "
            "string/boolean/float/double/date/timestamp/decimal/integers"
        )
    return pa.array([py] * n, pa_type)


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
        self.cdf = (
            str(options.get("readchangefeed", "false")).lower() == "true"
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
        data_fields = [
            (f.name, f.dataType.simpleString())
            for f in self.schema.fields
            if f.name not in ("_change_type", "_commit_version",
                              "_commit_timestamp")
        ]
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            adds, removes, ts_ms = [], [], None
            for a in _commit_actions(self.location, v):
                if "commitInfo" in a:
                    ts_ms = a["commitInfo"].get("timestamp", ts_ms)
                elif "remove" in a and a["remove"].get("dataChange", True):
                    removes.append(a["remove"])
                elif "add" in a:
                    ad = a["add"]
                    if not ad.get("dataChange", True):
                        continue  # OPTIMIZE rearrangement: never data
                    adds.append(ad)
            if ts_ms is None:
                from pg_datalake_spark.tables.delta_log import _commit_path

                ts_ms = int(
                    os.path.getmtime(_commit_path(self.location, v)) * 1000
                )
            dv_adds = [ad for ad in adds if ad.get("deletionVector")]
            removed_paths = {r["path"] for r in removes}
            is_dv_transition = (
                dv_adds
                and len(dv_adds) == len(adds)
                and removed_paths == {ad["path"] for ad in adds}
            )
            if not removes and not dv_adds:
                # append-only commit: plain inserts
                parts += [
                    _FilePartition(
                        _abs(ad["path"]),
                        ad.get("partitionValues") or {},
                        data_fields,
                        self.part_cols,
                        cdf=("insert", v, ts_ms) if self.cdf else None,
                    )
                    for ad in adds
                ]
            elif self.cdf and is_dv_transition:
                # per-file position diff, decoded executor-side — the
                # batch delta_changes DV strategy, streamed
                old_by_path = {
                    r["path"]: r.get("deletionVector") for r in removes
                }
                parts += [
                    _FilePartition(
                        _abs(ad["path"]),
                        ad.get("partitionValues") or {},
                        data_fields,
                        self.part_cols,
                        cdf=("delete", v, ts_ms),
                        table_location=self.location,
                        old_dv=old_by_path.get(ad["path"]),
                        new_dv=ad["deletionVector"],
                    )
                    for ad in adds
                ]
            elif self.skip_change_commits:
                continue
            else:
                raise ValueError(
                    f"Delta commit v{v} under {self.location} changes or "
                    "deletes existing rows"
                    + (
                        " in a shape the streaming CDF cannot derive "
                        "per-file (COW rewrite); use the batch "
                        "delta_changes API"
                        if self.cdf
                        else "; streaming it as inserts would be wrong. "
                        "Set .option('skipChangeCommits', 'true') to skip "
                        "such commits, or .option('readChangeFeed', "
                        "'true') for row-level changes (delta-spark "
                        "semantics)"
                    )
                    + "."
                )
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        import datetime as _dt

        if partition.cdf and partition.cdf[0] == "delete":
            yield from self._read_dv_deletes(partition)
            return
        pf = pq.ParquetFile(partition.path)
        part_vals = partition.partition_values
        for batch in pf.iter_batches():
            n = batch.num_rows
            cols = []
            for name, stype in partition.fields:
                if name in partition.part_cols:
                    # hive-layout files don't store partition columns:
                    # re-inject the add.partitionValues literal, typed
                    cols.append(
                        _typed_literal_array(part_vals.get(name), stype, n)
                    )
                else:
                    idx = batch.schema.get_field_index(name)
                    if idx < 0:
                        # column added after this file was written
                        # (schema evolution): old files read as NULLs —
                        # get_field_index returns -1 which pyarrow would
                        # silently normalize to the LAST column
                        cols.append(pa.nulls(n, _arrow_type(stype)))
                    else:
                        cols.append(batch.column(idx))
            names = [f[0] for f in partition.fields]
            if partition.cdf:
                ct, cv, cts = partition.cdf
                cols += [
                    pa.array([ct] * n, pa.string()),
                    pa.array([cv] * n, pa.int64()),
                    pa.array([cts] * n, pa.int64()),
                ]
                names += ["_change_type", "_commit_version", "_commit_timestamp"]
            yield pa.RecordBatch.from_arrays(cols, names=names)

    def _read_dv_deletes(self, partition: _FilePartition) -> Iterator:
        """CDF 'delete' rows of a DV-transition commit: the file's rows
        at positions newly present in the descriptor (new ∖ old),
        decoded and taken with pyarrow — no Spark-side diff."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pg_datalake_spark.tables.dv_codec import (
            decode_descriptor_positions,
        )

        new_pos = decode_descriptor_positions(
            partition.new_dv, partition.table_location
        )
        old_pos = (
            decode_descriptor_positions(
                partition.old_dv, partition.table_location
            )
            if partition.old_dv
            else np.array([], dtype="int64")
        )
        fresh = np.setdiff1d(new_pos, old_pos)
        if len(fresh) == 0:
            return
        tbl = pq.read_table(partition.path).take(pa.array(fresh))
        n = len(fresh)
        ct, cv, cts = partition.cdf
        cols, names = [], []
        for name, stype in partition.fields:
            if name in partition.part_cols:
                cols.append(_typed_literal_array(
                    partition.partition_values.get(name), stype, n
                ))
            else:
                col = tbl.column(name).combine_chunks()
                cols.append(
                    col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
                )
            names.append(name)
        cols += [
            pa.array([ct] * n, pa.string()),
            pa.array([cv] * n, pa.int64()),
            pa.array([cts] * n, pa.int64()),
        ]
        names += ["_change_type", "_commit_version", "_commit_timestamp"]
        yield pa.RecordBatch.from_arrays(cols, names=names)

    def commit(self, end: dict) -> None:
        pass  # progress is checkpointed by the engine


class DeltaStreamDataSource(DataSource):
    """``format("pglake_delta")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "pglake_delta"

    def schema(self) -> T.StructType:
        meta = _latest_meta(self.options.get("path"))
        schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
        if str(self.options.get("readchangefeed", "false")).lower() == "true":
            schema = T.StructType(
                [
                    *schema.fields,
                    T.StructField("_change_type", T.StringType()),
                    T.StructField("_commit_version", T.LongType()),
                    T.StructField("_commit_timestamp", T.LongType()),
                ]
            )
        return schema

    def streamReader(self, schema: T.StructType) -> DeltaStreamReader:
        return DeltaStreamReader(schema, self.options)
