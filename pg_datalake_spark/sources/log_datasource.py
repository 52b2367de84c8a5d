"""Templated log files as a Spark 4 PYTHON DATA SOURCE.

The reference exposes `log_format 's3'` foreign tables whose reader
parses templated log lines into typed columns inside the engine
(pg_lake_engine/src/pgduck/read_data.c:1409-1495). `sources.read_log`
already covers the Column-algebra path (read text → regexp_extract);
this module exposes the same capability through Spark 4's Python Data
Source API — the sanctioned extension point when a format needs real
imperative parsing (binary framing, stateful record assembly) that a
regex projection can't express:

    spark.dataSource.register(LogDataSource)
    spark.read.format("pglake_log")
         .schema("event_id long, user_id long, ...")
         .option("path", "/logs/*.log")
         .option("pattern", r"^(\\d+) (\\d+) (\\w+) ([\\d.,]+)$")
         .load()

Scale notes: one InputPartition per file — Spark schedules files
across executors exactly like any other source; each partition
streams its file line-by-line (no whole-file materialization). Rows
failing the template yield NULLs, matching the reference's malformed-
row behavior and `read_log`. Prefer `read_log` when the pattern is a
plain regex (whole-stage codegen beats per-row Python); this source
is the escape hatch — and the API demo the SURVEY §2.11 UDF surface
calls for.
"""

from __future__ import annotations

import glob as _glob
import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _LogPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class LogDataSourceReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pglake_log requires .option('path', ...)")
        self.pattern = options.get("pattern")
        if not self.pattern:
            raise ValueError("pglake_log requires .option('pattern', ...)")
        self.field_names = [f.name for f in schema.fields]
        self.field_types = [f.dataType.simpleString() for f in schema.fields]

    def partitions(self):
        files = sorted(
            p for p in _glob.glob(self.path, recursive=True)
        )
        if not files:
            raise FileNotFoundError(f"no files match {self.path}")
        return [_LogPartition(p) for p in files]

    def read(self, partition: _LogPartition):
        rx = re.compile(self.pattern)

        def conv(val: str | None, t: str):
            if val is None:
                return None
            try:
                if t in ("bigint", "long", "int", "smallint"):
                    return int(val)
                if t in ("double", "float"):
                    return float(val.replace(",", ""))
                return val
            except ValueError:
                return None

        n = len(self.field_names)
        with open(partition.path, "r", errors="replace") as fh:
            for line in fh:
                m = rx.match(line.rstrip("\n"))
                if m:
                    groups = m.groups()
                    yield tuple(
                        conv(groups[i] if i < len(groups) else None, self.field_types[i])
                        for i in range(n)
                    )
                else:
                    # malformed row -> all-NULL record (reference behavior)
                    yield tuple(None for _ in range(n))


class LogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pglake_log"

    def schema(self):
        raise NotImplementedError(
            "pglake_log has no self-describing schema; pass .schema(...)"
        )

    def reader(self, schema) -> DataSourceReader:
        return LogDataSourceReader(schema, self.options)
