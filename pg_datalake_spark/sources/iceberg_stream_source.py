"""External Iceberg tables as a Spark STRUCTURED STREAMING SOURCE
(Spark 4 Python Data Source API) — the Iceberg half of the pattern
established by delta_stream_source (st11): the Iceberg Spark runtime
exposes every table as a streaming source that tails the snapshot
history and emits each append's new rows exactly once; this rebuilds
that contract on the pure-Python metadata reader
(tables/iceberg_external.py):

    spark.dataSource.register(IcebergStreamDataSource)
    (spark.readStream.format("pglake_iceberg")
          .option("path", "/tables/events")
          .load() ...)

Semantics (matching iceberg-spark's streaming read):

- the OFFSET is the last fully-consumed snapshot SEQUENCE NUMBER
  (JSON ``{"seq": N}``) — sequence numbers are the spec's total
  commit order, stable under ref/rollback games where snapshot ids
  are not; ``startingSequence`` (default 0) replays from the first
  snapshot;
- append snapshots emit their ADDED data files' rows (manifest
  entries with status ADDED and the snapshot's own id);
- overwrite / delete / replace snapshots RAISE (iceberg-spark's
  streaming read refuses non-append history) unless
  ``.option("skipOverwrites", "true")`` skips them wholesale;
- identity-partition columns are re-injected TYPED from the manifest
  partition tuples (hive-layout files don't store them), exactly like
  the batch reader;
- position/equality delete files make a snapshot non-append and
  follow the same error/skip rule.

Scale shape: offset resolution walks snapshot summaries only; file
discovery reads the new snapshot's manifests (O(new files) driver
metadata, pure-Python avro); row bytes flow executor-side, one
InputPartition per data file yielding Arrow RecordBatches.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["IcebergStreamDataSource"]


class _IceFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        partition: dict,
        fields: list[tuple[str, str]],
        part_cols: list[str],
    ):
        self.path = path
        self.partition = partition        # typed manifest tuple
        self.fields = fields
        self.part_cols = part_cols


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.location = options.get("path")
        if not self.location:
            raise ValueError("pglake_iceberg requires .option('path', ...)")
        self.starting_seq = int(options.get("startingsequence", 0))
        self.skip_overwrites = (
            str(options.get("skipoverwrites", "false")).lower() == "true"
        )
        self.schema = schema
        from pg_datalake_spark.tables import iceberg_external as ie

        meta = ie.load_table_metadata(self.location)
        spec = next(
            s for s in meta["partition-specs"]
            if s["spec-id"] == meta["default-spec-id"]
        )
        ice_schema = ie.current_schema(meta)
        id_to_name = {f["id"]: f["name"] for f in ice_schema["fields"]}
        # identity transforms only are re-injected; transform partitions
        # keep the source column inside the data files (writer note in
        # export_iceberg_snapshot)
        self.part_cols = [
            f["name"] for f in spec["fields"] if f["transform"] == "identity"
        ]
        self.id_to_name = id_to_name

    def initialOffset(self) -> dict:
        return {"seq": self.starting_seq - 1 if self.starting_seq else 0}

    def latestOffset(self) -> dict:
        from pg_datalake_spark.tables import iceberg_external as ie

        meta = ie.load_table_metadata(self.location)
        return {"seq": meta.get("last-sequence-number", 0)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from pg_datalake_spark.tables import iceberg_external as ie
        from pg_datalake_spark.tables.avro_codec import read_avro

        meta = ie.load_table_metadata(self.location)
        fields = [
            (f.name, f.dataType.simpleString()) for f in self.schema.fields
        ]
        snaps = sorted(
            (
                s for s in meta.get("snapshots", [])
                if start["seq"] < s["sequence-number"] <= end["seq"]
            ),
            key=lambda s: s["sequence-number"],
        )
        parts: list[InputPartition] = []
        for s in snaps:
            op = (s.get("summary") or {}).get("operation", "append")
            if op != "append":
                if self.skip_overwrites:
                    continue
                raise ValueError(
                    f"Iceberg snapshot {s['snapshot-id']} (seq "
                    f"{s['sequence-number']}) is {op!r}, not append; "
                    "streaming it as inserts would be wrong. Set "
                    ".option('skipOverwrites', 'true') to skip such "
                    "snapshots (iceberg-spark streaming semantics)."
                )
            _, manifests = read_avro(ie._local(s["manifest-list"]))
            for m in manifests:
                if m.get("content", 0) != 0:
                    if self.skip_overwrites:
                        continue
                    raise ValueError(
                        f"Iceberg snapshot {s['snapshot-id']} carries a "
                        "DELETE manifest; set skipOverwrites to skip"
                    )
                if m.get("added_snapshot_id") not in (None, s["snapshot-id"]):
                    continue  # carried-forward manifest: nothing new here
                _, entries = read_avro(ie._local(m["manifest_path"]))
                for e in entries:
                    if e.get("status", 0) != 1:  # ADDED only
                        continue
                    if e.get("snapshot_id") not in (None, s["snapshot-id"]):
                        continue
                    df_rec = e["data_file"]
                    parts.append(
                        _IceFilePartition(
                            ie._local(df_rec["file_path"]),
                            dict(df_rec.get("partition") or {}),
                            fields,
                            self.part_cols,
                        )
                    )
        return parts

    def read(self, partition: _IceFilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches():
            n = batch.num_rows
            cols = []
            for name, stype in partition.fields:
                if name in partition.part_cols:
                    # typed manifest tuple value (already int/str/...,
                    # dates as epoch days per the Avro logical type)
                    val = partition.partition[name]
                    pa_type = {
                        "bigint": pa.int64(), "int": pa.int32(),
                        "double": pa.float64(), "date": pa.date32(),
                        "boolean": pa.bool_(),
                    }.get(stype, pa.string())
                    cols.append(
                        pa.nulls(n, pa_type) if val is None
                        else pa.array([val] * n, pa_type)
                    )
                else:
                    idx = batch.schema.get_field_index(name)
                    if idx < 0:
                        # column added after this file was written
                        # (schema evolution): old files read as NULLs —
                        # get_field_index returns -1 which pyarrow would
                        # silently normalize to the LAST column
                        from pg_datalake_spark.sources.delta_stream_source import (
                            _arrow_type,
                        )

                        cols.append(pa.nulls(n, _arrow_type(stype)))
                    else:
                        cols.append(batch.column(idx))
            yield pa.RecordBatch.from_arrays(
                cols, names=[f[0] for f in partition.fields]
            )

    def commit(self, end: dict) -> None:
        pass  # progress is checkpointed by the engine


class IcebergStreamDataSource(DataSource):
    """``format("pglake_iceberg")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "pglake_iceberg"

    def schema(self) -> str:
        # a DDL string, not StructType: DataSource.schema() runs in a
        # worker subprocess with no SparkContext to parse types with
        from pg_datalake_spark.tables import iceberg_external as ie

        meta = ie.load_table_metadata(self.options.get("path"))
        return ie._spark_ddl(ie.current_schema(meta))

    def streamReader(self, schema: T.StructType) -> IcebergStreamReader:
        return IcebergStreamReader(schema, self.options)
