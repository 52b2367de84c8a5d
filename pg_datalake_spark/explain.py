"""EXPLAIN introspection: the reference's vectorization report, Spark-side.

The reference's EXPLAIN shows the pushed ``Vectorized SQL``, the files
scanned/skipped, and a list of ``Not Vectorized Constructs`` with
reasons (pg_lake_table/src/planner/explain.c; query_pushdown.c:1688).
Spark's equivalents live in the formatted plan string; this module
parses them into a dict so tests and users can ASSERT on pushdown
health instead of eyeballing plans:

- ``pushed_filters`` / ``partition_filters`` — what reached the scan
  (the reference's vectorized WHERE);
- ``read_schema`` — column pruning (the deparsed SELECT list);
- ``python_stages`` — Arrow/Batch-eval Python operators, the analog of
  "not vectorized constructs" (work that left the JVM);
- ``codegen_stages`` — whole-stage-codegen span count (wider = more of
  the plan fused into vectorized loops);
- ``joins`` — physical join strategies chosen (a NestedLoop here is
  the classic scale smell).

File-level scanned/skipped accounting is the table layer's job
(LakeTable.scan_stats / iceberg_external.plan_scan) because pruning
happens before Spark sees a path list.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def _plan_str(df: DataFrame, mode: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _formatted_plan(df: DataFrame) -> str:
    return _plan_str(df, "formatted")


def explain_pushdown(df: DataFrame) -> dict:
    """Parse the formatted physical plan into a pushdown report."""
    plan = _formatted_plan(df)
    report = {
        "pushed_filters": [],
        "partition_filters": [],
        "read_schemas": [],
        "python_stages": [],
        "codegen_stages": 0,
        "joins": [],
        # each node appears once in the tree ("Scan parquet (1)") and
        # once in the details ("(1) Scan parquet") — count node ids
        "scans": len(set(re.findall(r"\((\d+)\) Scan parquet", plan))),
    }
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            report["pushed_filters"].extend(
                f.strip() for f in m.group(1).split(",") if f.strip()
            )
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            report["partition_filters"].extend(
                f.strip() for f in m.group(1).split(",") if f.strip()
            )
    for m in re.finditer(r"ReadSchema: (.+)", plan):
        report["read_schemas"].append(m.group(1).strip())
    for name in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        n = len(set(re.findall(rf"\((\d+)\) {name}\b", plan)))
        if n:
            report["python_stages"].append({"operator": name, "count": n})
    # codegen span ids only appear as "*(N)" markers in the simple
    # rendering (the formatted AQE plan hides them pre-execution)
    report["codegen_stages"] = len(set(re.findall(r"\*\((\d+)\)", _plan_str(df, "simple"))))
    for jt in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        n = len(set(re.findall(rf"\((\d+)\) {jt}\b", plan)))
        if n:
            report["joins"].append({"strategy": jt, "count": n})
    return report
