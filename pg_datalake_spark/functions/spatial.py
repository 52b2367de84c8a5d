"""Minimal planar geospatial surface (st_* functions).

The reference ships ~70 shippable st_* functions by delegating to its
engine's GEOMETRY type (reference surface:
pg_lake_engine/src/pgduck/shippable_spatial_functions.c). This runtime
has no geo libraries (no Sedona jars, no shapely, no DuckDB spatial
extension offline), so this module implements the core planar subset
Spark-first:

- POINT geometry  = ``struct<x double, y double>`` — a native Tungsten
  struct, so every function below is pure Column algebra inside
  whole-stage codegen (zero UDFs in the hot path).
- RING geometry   = ``array<struct<x double, y double>>`` (closed or
  open; functions close it implicitly) — area/perimeter/contains run
  via higher-order functions (``aggregate``/``filter``), still JVM-side.
- WKB interop at the boundary only: ``st_aswkb``/``st_geomfromwkb``
  are Arrow-vectorized pandas UDFs emitting/parsing standard
  little-endian WKB points, so external GIS tools can exchange data.

At 100 TB this matters: a distance filter over struct columns is a
codegen'd arithmetic expression with full predicate pushdown on the
underlying doubles — no geometry-object allocation per row.
"""

from __future__ import annotations

import struct as _struct
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "st_point",
    "st_x",
    "st_y",
    "st_distance",
    "st_dwithin",
    "st_astext",
    "st_centroid",
    "st_npoints",
    "st_envelope",
    "st_area",
    "st_perimeter",
    "st_contains",
    "st_aswkb",
    "st_geomfromwkb",
]


def st_point(x: Column, y: Column) -> Column:
    """Construct a point geometry from x/y expressions."""
    return F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))


def st_x(p: Column) -> Column:
    return p["x"]


def st_y(p: Column) -> Column:
    return p["y"]


def st_distance(a: Column, b: Column) -> Column:
    """Euclidean point-point distance (planar)."""
    return F.sqrt(
        F.pow(a["x"] - b["x"], F.lit(2)) + F.pow(a["y"] - b["y"], F.lit(2))
    )


def st_dwithin(a: Column, b: Column, d) -> Column:
    """True when the two points are within distance ``d``. Compares
    squared distances so the predicate stays sqrt-free (cheaper, and
    exactly the rewrite a planner would do)."""
    dd = F.lit(d) if not isinstance(d, Column) else d
    return (
        F.pow(a["x"] - b["x"], F.lit(2)) + F.pow(a["y"] - b["y"], F.lit(2))
    ) <= dd * dd


def st_astext(p: Column) -> Column:
    """WKT for a point: ``POINT (x y)``."""
    return F.format_string("POINT (%s %s)", p["x"], p["y"])


def st_centroid(ring: Column) -> Column:
    """Centroid of the vertex multiset (point cloud / ring vertices)."""
    n = F.size(ring).cast("double")
    sx = F.aggregate(ring, F.lit(0.0), lambda acc, p: acc + p["x"])
    sy = F.aggregate(ring, F.lit(0.0), lambda acc, p: acc + p["y"])
    return F.struct((sx / n).alias("x"), (sy / n).alias("y"))


def st_npoints(ring: Column) -> Column:
    return F.size(ring)


def st_envelope(ring: Column) -> Column:
    """Bounding box of a ring as struct(xmin, ymin, xmax, ymax)."""
    return F.struct(
        F.array_min(F.transform(ring, lambda p: p["x"])).alias("xmin"),
        F.array_min(F.transform(ring, lambda p: p["y"])).alias("ymin"),
        F.array_max(F.transform(ring, lambda p: p["x"])).alias("xmax"),
        F.array_max(F.transform(ring, lambda p: p["y"])).alias("ymax"),
    )


def _closed_edges(ring: Column) -> Column:
    """Array of (a, b) vertex pairs for each edge, implicitly closing
    the ring (last→first)."""
    rotated = F.concat(F.slice(ring, 2, F.size(ring) - 1), F.slice(ring, 1, 1))
    return F.zip_with(
        ring, rotated, lambda a, b: F.struct(a.alias("a"), b.alias("b"))
    )


def st_area(ring: Column) -> Column:
    """Shoelace area of a simple polygon ring (orientation-agnostic)."""
    signed2 = F.aggregate(
        _closed_edges(ring),
        F.lit(0.0),
        lambda acc, e: acc + (e["a"]["x"] * e["b"]["y"] - e["b"]["x"] * e["a"]["y"]),
    )
    return F.abs(signed2) / 2.0


def st_perimeter(ring: Column) -> Column:
    return F.aggregate(
        _closed_edges(ring),
        F.lit(0.0),
        lambda acc, e: acc
        + F.sqrt(
            F.pow(e["a"]["x"] - e["b"]["x"], F.lit(2))
            + F.pow(e["a"]["y"] - e["b"]["y"], F.lit(2))
        ),
    )


def st_contains(ring: Column, p: Column) -> Column:
    """Point-in-polygon by ray casting (odd crossing number), pure
    Column algebra: an upward ray from the point crosses edge (a,b)
    when the edge spans the point's y and the intersection x lies to
    the right. Boundary points are implementation-defined (as in most
    engines); use strictly-interior test data."""
    px, py = p["x"], p["y"]

    def crosses(e: Column) -> Column:
        ay, by = e["a"]["y"], e["b"]["y"]
        spans = (ay > py) != (by > py)
        xint = e["a"]["x"] + (e["b"]["x"] - e["a"]["x"]) * (py - ay) / (by - ay)
        return spans & (px < xint)

    return F.size(F.filter(_closed_edges(ring), crosses)) % 2 == 1


# ---------------------------------------------------------------------------
# WKB interop (boundary only — Arrow-vectorized)
# ---------------------------------------------------------------------------

_WKB_POINT_HDR = b"\x01\x01\x00\x00\x00"  # little-endian, type=Point


@F.pandas_udf(T.BinaryType())
def st_aswkb(xs: pd.Series, ys: pd.Series) -> pd.Series:
    """Standard little-endian WKB for a point (call with st_x, st_y)."""
    return pd.Series(
        [
            None
            if pd.isna(x) or pd.isna(y)
            else _WKB_POINT_HDR + _struct.pack("<dd", x, y)
            for x, y in zip(xs, ys)
        ]
    )


@F.pandas_udf(T.StructType([T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]))
def st_geomfromwkb(wkb: pd.Series) -> pd.DataFrame:
    """Parse little-endian WKB points back to the struct form."""
    xs, ys = [], []
    for b in wkb:
        if b is None or len(b) < 21 or bytes(b[:5]) != _WKB_POINT_HDR:
            xs.append(None)
            ys.append(None)
        else:
            x, y = _struct.unpack_from("<dd", bytes(b), 5)
            xs.append(x)
            ys.append(y)
    return pd.DataFrame({"x": xs, "y": ys})
