"""Driver-fidelity exactness check.

The driver's correctness gate hashes EXACT values (no float tolerance,
rows sorted on raw columns) — stricter than tests/conftest.py's
rounded-key comparator. This script replays that comparison for a set
of registered queries so hash-mismatches are caught before the driver
runs.

Usage:
    python scripts/check_exact.py [--sf /root/testdata/sf0.01] [names...]
    python scripts/check_exact.py --window          # the driver-verified window
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-like canonicalization: sorted columns, rows sorted by value."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif s.dtype == object:
            import datetime as _dt
            import decimal as _dec

            def _norm(v):
                if isinstance(v, _dec.Decimal):
                    return float(v)
                if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                    return pd.Timestamp(v)
                return v

            s = s.map(_norm)
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64") + 0.0  # fold -0.0
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype("boolean")
        out[c] = s
    res = pd.DataFrame(out)
    if len(res):
        def _key(v):
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return "\0NULL"
            if isinstance(v, float):
                return v.hex()  # EXACT float key — this is the whole point
            return str(v)

        sort_key = res.apply(lambda row: tuple(_key(v) for v in row), axis=1)
        res = res.iloc[np.argsort(sort_key.values, kind="stable")].reset_index(drop=True)
    return res


def compare_exact(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of problems; empty list = driver hash would match."""
    problems: list[str] = []
    a, b = canon(spark_pdf), canon(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: {list(a.columns)} vs {list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count {len(a)} vs {len(b)}"]
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype) != str(bv.dtype):
            problems.append(f"dtype[{c}]: {av.dtype} vs {bv.dtype}")
        an, bn = av.isna(), bv.isna()
        if not (an.values == bn.values).all():
            problems.append(f"null-mask[{c}] differs")
            continue
        mask = ~an
        x, y = av[mask].to_numpy(), bv[mask].to_numpy()
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            neq = x.astype("float64") != y.astype("float64")
        else:
            neq = np.array([str(p) != str(q) for p, q in zip(x, y)])
        if neq.any():
            i = int(np.where(neq)[0][0])
            problems.append(
                f"value[{c}] {int(neq.sum())} rows differ, first: {x[i]!r} vs {y[i]!r}"
            )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--window", action="store_true")
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="use a plain SparkSession like the DRIVER does (no tuned "
        "confs) — catches queries that silently depend on "
        "build_session settings the driver won't have",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pg_datalake_spark import plans
    from pg_datalake_spark.plans.registry import ORACLES, QUERIES
    from pg_datalake_spark.catalog import TABLE_NAMES, table_path
    from pg_datalake_spark.session import build_session

    plans.load_all()
    if args.window:
        # the driver verifies the first 50 entries of queries() in
        # registration order — replay exactly that slice
        names = list(QUERIES)[:50]
    else:
        names = args.names or list(QUERIES)

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[16]")
            .config("spark.sql.shuffle.partitions", "16")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory", "8g")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = build_session("exactcheck", cpus=16)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(args.sf, t)}')"
        )

    n_fail = 0
    for name in names:
        if name not in QUERIES:
            print(f"{name}: NOT REGISTERED")
            n_fail += 1
            continue
        try:
            spark_pdf = QUERIES[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if name not in ORACLES:
            status = "rows-only" if len(spark_pdf) > 0 else "rows-only EMPTY(!)"
            print(f"{name}: {status} ({len(spark_pdf)} rows)")
            continue
        try:
            oracle_pdf = con.execute(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = compare_exact(spark_pdf, oracle_pdf)
        if problems:
            n_fail += 1
            print(f"{name}: FAIL ({len(spark_pdf)} rows)")
            for p in problems[:6]:
                print(f"    {p}")
        else:
            print(f"{name}: exact-match ({len(spark_pdf)} rows)")
    print(f"\n{n_fail} failures / {len(names)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
