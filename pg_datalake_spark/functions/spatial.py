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

import math
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
    "st_within",
    "st_equals",
    "st_translate",
    "st_azimuth",
    "st_makeline",
    "st_length",
    "st_makeenvelope",
    "st_expand",
    "st_bbox_intersects",
    "st_bbox_union",
    "st_bbox_intersection",
    "st_extent",
    "st_collect",
    "st_union_extent",
    "st_segment_intersects",
    "st_isconvex",
    "st_intersection_convex",
    "st_union_convex",
    "st_convexhull",
    "st_simplify_radial",
    "st_segment_intersection",
    "st_intersects",
    "st_buffer",
    "st_snaptogrid",
    "st_closestpoint",
    "st_distance_to_line",
    "grid_spatial_join",
    "knn_within_radius_join",
    "st_aswkb",
    "st_geomfromwkb",
    "st_distance_sphere",
    "st_distance_spheroid",
    "st_distance_vincenty",
    "st_dwithin_geodesic",
    "st_azimuth_geodesic",
    # linear-referencing / IO / predicate tier (round 7, batch 2)
    "st_startpoint",
    "st_endpoint",
    "st_pointn",
    "st_numpoints",
    "st_reverse",
    "st_flipcoordinates",
    "st_boundary_line",
    "st_removerepeatedpoints",
    "st_isclosed",
    "st_issimple_ring",
    "st_isring",
    "st_lineinterpolatepoint",
    "st_linelocatepoint",
    "st_closestpoint_on_line",
    "st_shortestline",
    "st_linesubstring",
    "st_project",
    "st_disjoint",
    "st_crosses_lines",
    "st_containsproperly",
    "st_normalize",
    "st_reduceprecision",
    "st_astext_line",
    "st_astext_polygon",
    "st_geomfromtext_point",
    "st_geomfromtext_line",
    "st_geomfromtext_polygon",
    "st_asgeojson_point",
    "st_asgeojson_line",
    "st_geomfromgeojson_line",
    "st_transform_webmercator",
    "st_transform_wgs84",
    "st_simplify",
    # trivial accessor tier (round 10)
    "st_srid",
    "st_isempty",
    "st_isempty_point",
    "st_geometrytype_point",
    "st_geometrytype_seq",
    "st_dimension_point",
    "st_dimension_seq",
    "st_numgeometries",
    "st_numinteriorrings",
    "st_exteriorring",
    "st_z",
    "st_m",
    "st_zmflag",
    "st_force2d",
    "st_area_signed",
    # final name-parity tier (round 10): every remaining reference name
    "st_asbinary",
    "st_geometryfromtext_point",
    "st_geometryfromtext_line",
    "st_geometryfromtext_polygon",
    "st_makepolygon",
    "st_point_on_boundary",
    "st_covers",
    "st_coveredby",
    "st_covers_ring",
    "st_coveredby_ring",
    "st_collectionextract",
    "st_force3dz",
    "st_force3dm",
    "st_force4d",
    # curve tier (round 10 tail)
    "st_circularstring",
    "st_arc_params",
    "st_curvetoline",
    "st_curvetoline_from",
    "st_length_circular",
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


def st_within(p: Column, ring: Column) -> Column:
    """PostGIS argument order: true when point ``p`` lies within the
    ring (alias of :func:`st_contains` with swapped operands)."""
    return st_contains(ring, p)


def st_equals(a: Column, b: Column) -> Column:
    """Exact point equality (null-safe per coordinate)."""
    return a["x"].eqNullSafe(b["x"]) & a["y"].eqNullSafe(b["y"])


def st_translate(p: Column, dx, dy) -> Column:
    """Affine translation of a point."""
    dxc = dx if isinstance(dx, Column) else F.lit(dx)
    dyc = dy if isinstance(dy, Column) else F.lit(dy)
    return F.struct((p["x"] + dxc).alias("x"), (p["y"] + dyc).alias("y"))


def st_azimuth(a: Column, b: Column) -> Column:
    """Azimuth from north, clockwise, in radians, normalized to
    [0, 2π) (PostGIS semantics: raw ``atan2(dx, dy)`` is (-π, π],
    which would return e.g. -π/2 for due west instead of 3π/2)."""
    raw = F.atan2(b["x"] - a["x"], b["y"] - a["y"])
    tau = 2 * math.pi
    return (raw + F.lit(tau)) % F.lit(tau)


def st_makeline(*points: Column) -> Column:
    """LINESTRING as an array of points (same layout as rings)."""
    return F.array(*points)


def st_length(line: Column) -> Column:
    """Length of an OPEN linestring (no implicit closing edge — that
    is :func:`st_perimeter`'s job on rings)."""
    n = F.size(line)
    a = F.slice(line, 1, n - 1)
    b = F.slice(line, 2, n - 1)
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda p, q: F.sqrt(
                F.pow(p["x"] - q["x"], F.lit(2)) + F.pow(p["y"] - q["y"], F.lit(2))
            ),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


# --- segment/segment and ring/ring predicates (round-5 tier) ---------------


def _cross(o: Column, a: Column, b: Column) -> Column:
    """2D cross product (a-o) × (b-o): sign = orientation of the turn
    o→a→b (the workhorse of every planar predicate below)."""
    return (a["x"] - o["x"]) * (b["y"] - o["y"]) - (a["y"] - o["y"]) * (b["x"] - o["x"])


def _on_segment(p: Column, q: Column, r: Column) -> Column:
    """Given r collinear with segment (p,q): does r lie on it?"""
    return (
        (F.least(p["x"], q["x"]) <= r["x"])
        & (r["x"] <= F.greatest(p["x"], q["x"]))
        & (F.least(p["y"], q["y"]) <= r["y"])
        & (r["y"] <= F.greatest(p["y"], q["y"]))
    )


def st_segment_intersects(a1: Column, a2: Column, b1: Column, b2: Column) -> Column:
    """Segment (a1,a2) vs segment (b1,b2), boundary touches included —
    the standard orientation test plus collinear-endpoint handling,
    entirely codegen'd Column algebra."""
    d1 = _cross(b1, b2, a1)
    d2 = _cross(b1, b2, a2)
    d3 = _cross(a1, a2, b1)
    d4 = _cross(a1, a2, b2)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
        ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
    )
    touch = (
        ((d1 == 0) & _on_segment(b1, b2, a1))
        | ((d2 == 0) & _on_segment(b1, b2, a2))
        | ((d3 == 0) & _on_segment(a1, a2, b1))
        | ((d4 == 0) & _on_segment(a1, a2, b2))
    )
    return proper | touch


def st_segment_intersection(a1: Column, a2: Column, b1: Column, b2: Column) -> Column:
    """The intersection POINT of two proper (non-parallel) crossing
    segments; NULL when parallel/collinear or not crossing within both
    segments (PostGIS ST_Intersection's point case)."""
    rx, ry = a2["x"] - a1["x"], a2["y"] - a1["y"]
    sx, sy = b2["x"] - b1["x"], b2["y"] - b1["y"]
    denom = rx * sy - ry * sx
    qpx, qpy = b1["x"] - a1["x"], b1["y"] - a1["y"]
    t = (qpx * sy - qpy * sx) / denom
    u = (qpx * ry - qpy * rx) / denom
    return F.when(
        (denom != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1),
        F.struct((a1["x"] + t * rx).alias("x"), (a1["y"] + t * ry).alias("y")),
    )


def st_intersects(ring_a: Column, ring_b: Column) -> Column:
    """Polygon/polygon intersection (simple rings): true iff any edge
    pair crosses, or one ring contains a vertex of the other (covers
    full containment with no edge crossing). Nested higher-order
    ``exists`` over the edge arrays — O(n·m) per row pair JVM-side,
    the exact-test tier; prefilter candidate pairs with
    :func:`st_bbox_intersects` at scale."""
    ea, eb = _closed_edges(ring_a), _closed_edges(ring_b)
    edge_hit = F.exists(
        ea,
        lambda e1: F.exists(
            eb, lambda e2: st_segment_intersects(e1["a"], e1["b"], e2["a"], e2["b"])
        ),
    )
    vertex_in = st_contains(ring_a, F.element_at(ring_b, 1)) | st_contains(
        ring_b, F.element_at(ring_a, 1)
    )
    return edge_hit | vertex_in


def st_buffer(p: Column, radius, segments: int = 16) -> Column:
    """Circle buffer of a POINT, approximated as a regular ``segments``-
    gon ring (PostGIS ST_Buffer with quad_segs; the polygonal
    approximation is explicit here). Pure Column algebra — no geometry
    objects allocated."""
    r = radius if isinstance(radius, Column) else F.lit(float(radius))
    pts = [
        F.struct(
            (p["x"] + r * F.lit(math.cos(2 * math.pi * i / segments))).alias("x"),
            (p["y"] + r * F.lit(math.sin(2 * math.pi * i / segments))).alias("y"),
        )
        for i in range(segments)
    ]
    return F.array(*pts)


def st_snaptogrid(p: Column, size: float) -> Column:
    """Snap a point to the nearest grid multiple (PostGIS
    ST_SnapToGrid with a square grid)."""
    s = F.lit(float(size))
    return F.struct(
        (F.round(p["x"] / s) * s).alias("x"),
        (F.round(p["y"] / s) * s).alias("y"),
    )


def _point_segment_distance(p: Column, a: Column, b: Column) -> Column:
    """Distance from point to segment: project, clamp t to [0,1]."""
    abx, aby = b["x"] - a["x"], b["y"] - a["y"]
    len2 = abx * abx + aby * aby
    t_raw = ((p["x"] - a["x"]) * abx + (p["y"] - a["y"]) * aby) / len2
    t = F.when(len2 == 0, F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw))
    )
    cx, cy = a["x"] + t * abx, a["y"] + t * aby
    return F.sqrt(F.pow(p["x"] - cx, F.lit(2)) + F.pow(p["y"] - cy, F.lit(2)))


def st_closestpoint(a: Column, b: Column, p: Column) -> Column:
    """Closest point ON SEGMENT (a,b) to point p."""
    abx, aby = b["x"] - a["x"], b["y"] - a["y"]
    len2 = abx * abx + aby * aby
    t_raw = ((p["x"] - a["x"]) * abx + (p["y"] - a["y"]) * aby) / len2
    t = F.when(len2 == 0, F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw))
    )
    return F.struct((a["x"] + t * abx).alias("x"), (a["y"] + t * aby).alias("y"))


def st_distance_to_line(p: Column, line: Column) -> Column:
    """Min distance from a point to an OPEN linestring (array of
    points): array_min over per-edge point-segment distances."""
    n = F.size(line)
    a = F.slice(line, 1, n - 1)
    b = F.slice(line, 2, n - 1)
    return F.array_min(
        F.zip_with(a, b, lambda q, r: _point_segment_distance(p, q, r))
    )


# --- envelope (bbox) algebra: struct<xmin, ymin, xmax, ymax> ---------------


def st_makeenvelope(xmin, ymin, xmax, ymax) -> Column:
    c = [v if isinstance(v, Column) else F.lit(v) for v in (xmin, ymin, xmax, ymax)]
    return F.struct(
        c[0].cast("double").alias("xmin"),
        c[1].cast("double").alias("ymin"),
        c[2].cast("double").alias("xmax"),
        c[3].cast("double").alias("ymax"),
    )


def st_expand(env: Column, d) -> Column:
    """Grow an envelope by ``d`` on every side."""
    dc = d if isinstance(d, Column) else F.lit(d)
    return F.struct(
        (env["xmin"] - dc).alias("xmin"),
        (env["ymin"] - dc).alias("ymin"),
        (env["xmax"] + dc).alias("xmax"),
        (env["ymax"] + dc).alias("ymax"),
    )


def st_bbox_intersects(a: Column, b: Column) -> Column:
    """Separating-axis test on envelopes (boundary touch counts)."""
    return (
        (a["xmin"] <= b["xmax"])
        & (b["xmin"] <= a["xmax"])
        & (a["ymin"] <= b["ymax"])
        & (b["ymin"] <= a["ymax"])
    )


def st_bbox_union(a: Column, b: Column) -> Column:
    return F.struct(
        F.least(a["xmin"], b["xmin"]).alias("xmin"),
        F.least(a["ymin"], b["ymin"]).alias("ymin"),
        F.greatest(a["xmax"], b["xmax"]).alias("xmax"),
        F.greatest(a["ymax"], b["ymax"]).alias("ymax"),
    )


def st_bbox_intersection(a: Column, b: Column) -> Column:
    """Envelope intersection; NULL when disjoint."""
    return F.when(
        st_bbox_intersects(a, b),
        F.struct(
            F.greatest(a["xmin"], b["xmin"]).alias("xmin"),
            F.greatest(a["ymin"], b["ymin"]).alias("ymin"),
            F.least(a["xmax"], b["xmax"]).alias("xmax"),
            F.least(a["ymax"], b["ymax"]).alias("ymax"),
        ),
    )


# --- aggregates ------------------------------------------------------------


def st_extent(p: Column) -> Column:
    """AGGREGATE: bounding envelope of a point column (use in agg())."""
    return F.struct(
        F.min(p["x"]).alias("xmin"),
        F.min(p["y"]).alias("ymin"),
        F.max(p["x"]).alias("xmax"),
        F.max(p["y"]).alias("ymax"),
    )


def st_collect(p: Column) -> Column:
    """AGGREGATE: gather points into a multipoint (array of structs)."""
    return F.collect_list(p)


def st_union_extent(env: Column) -> Column:
    """AGGREGATE: union envelope of an envelope column (the bbox face
    of PostGIS ST_Union over rectangle collections — exact for
    axis-aligned boxes, the minimal bounding box otherwise)."""
    return F.struct(
        F.min(env["xmin"]).alias("xmin"),
        F.min(env["ymin"]).alias("ymin"),
        F.max(env["xmax"]).alias("xmax"),
        F.max(env["ymax"]).alias("ymax"),
    )


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


# ---------------------------------------------------------------------------
# Grid-binned spatial join (filter-and-refine, round-5 tier)
# ---------------------------------------------------------------------------


def grid_spatial_join(
    points: "DataFrame",
    point_cols: tuple[str, str],
    rings: "DataFrame",
    ring_col: str,
    cell: float,
) -> "DataFrame":
    """Points-in-polygons as a GRID-BINNED EQUI-JOIN — the classic
    filter-and-refine spatial join (PostGIS/Sedona execute ST_Contains
    joins the same way: coarse spatial index probe, then exact test).

    Each ring explodes onto the grid cells its envelope covers; each
    point lands in exactly one cell; a hash equi-join on (cx, cy)
    yields candidates and :func:`st_contains` (exact ray cast) refines
    them. The ring side is dimension-sized and BROADCAST, so the point
    side — the 100 TB side — is a single narrow map + broadcast join:
    never shuffled, never nested-looped (a raw ST_Contains theta join
    degenerates to BroadcastNestedLoop over every (point, ring) pair).

    ``points`` keeps all its columns; ring columns join on. Returns
    candidate-refined matches (inner join semantics).
    """
    from pyspark.sql import DataFrame as _DF  # noqa: F401

    px, py = point_cols
    ring = F.col(ring_col)
    xs = F.transform(ring, lambda p: p["x"])
    ys = F.transform(ring, lambda p: p["y"])
    c = F.lit(float(cell))
    cxs = F.sequence(
        F.floor(F.array_min(xs) / c).cast("long"),
        F.floor(F.array_max(xs) / c).cast("long"),
    )
    cys = F.sequence(
        F.floor(F.array_min(ys) / c).cast("long"),
        F.floor(F.array_max(ys) / c).cast("long"),
    )
    cells = (
        rings.withColumn("__cx", F.explode(cxs))
        .withColumn("__cy", F.explode(cys))
    )
    pts = points.withColumn("__cx", F.floor(F.col(px) / c).cast("long")).withColumn(
        "__cy", F.floor(F.col(py) / c).cast("long")
    )
    return (
        pts.join(F.broadcast(cells), ["__cx", "__cy"])
        .filter(st_contains(ring, st_point(F.col(px), F.col(py))))
        .drop("__cx", "__cy")
    )


def knn_within_radius_join(
    a: "DataFrame",
    a_id: str,
    a_cols: tuple[str, str],
    b: "DataFrame",
    b_id: str,
    b_cols: tuple[str, str],
    radius: float,
    k: int,
) -> "DataFrame":
    """For every ``a`` point: its ``k`` nearest ``b`` points within
    ``radius`` (distance-bounded kNN — the exact, scale-sound variant:
    unbounded kNN needs iterative cell expansion, but a radius bound
    makes one 3×3 neighborhood pass complete by construction).

    Shape: grid cells of size ``radius``; the ``b`` side explodes onto
    its cell's 3×3 neighborhood (9×, reference-set-sized), ``a`` maps
    to exactly one cell; a hash equi-join on the cell yields every
    candidate within ``radius`` (any point closer than ``radius`` is
    in a neighboring cell by construction), the exact distance filter
    refines, and a per-``a`` rank window takes the k nearest
    (ties broken by ``b_id`` for engine-independent results).
    Distances use x*x multiplication (IEEE-exact), never pow().
    """
    from pyspark.sql.window import Window

    ax, ay = a_cols
    bx, by = b_cols
    overlap = (set(a.columns) & {b_id, bx, by}) | ({a_id, ax, ay} & set(b.columns))
    if overlap:
        raise ValueError(
            f"knn_within_radius_join needs disjoint column names between the "
            f"two sides; rename {sorted(overlap)} first"
        )
    c = F.lit(float(radius))
    pa = a.withColumn("__cx", F.floor(F.col(ax) / c).cast("long")).withColumn(
        "__cy", F.floor(F.col(ay) / c).cast("long")
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    pb = (
        b.withColumn("__bcx", F.floor(F.col(bx) / c).cast("long"))
        .withColumn("__bcy", F.floor(F.col(by) / c).cast("long"))
        .withColumn(
            "__n",
            F.explode(
                F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offs])
            ),
        )
        .select(
            F.col(b_id),
            F.col(bx),
            F.col(by),
            (F.col("__bcx") + F.col("__n.dx")).alias("__cx"),
            (F.col("__bcy") + F.col("__n.dy")).alias("__cy"),
        )
    )
    ddx = F.col(ax) - F.col(bx)
    ddy = F.col(ay) - F.col(by)
    dist = F.sqrt(ddx * ddx + ddy * ddy)
    w = Window.partitionBy(a_id).orderBy("dist", b_id)
    return (
        pa.join(pb, ["__cx", "__cy"])
        .withColumn("dist", dist)
        .filter(F.col("dist") <= radius)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__cx", "__cy", "__rk")
    )


# --- convex polygon boolean ops (round-6 tier) -----------------------------
# Reference surface: pg_lake_engine/src/pgduck/shippable_spatial_functions.c
# (ST_Intersection / ST_Union / geometry predicates). GEOS handles
# arbitrary geometry there; this tier implements the CONVEX planar
# cases exactly, as pure Column algebra (codegen'd, zero UDFs), and
# fails loud — never silently wrong — outside its domain.
#
# USAGE NOTE: these constructors build large expression trees (each
# _closed_edges references its ring three times). Materialize the
# result ring in its own projection (``.select(op(...).alias("ring"))``)
# and compute area/perimeter/npoints over the COLUMN in a second
# select — Catalyst will not re-inline a non-cheap alias referenced
# more than once, so the measures share one evaluation of the ring.
# Inlining the constructor into several measures in one select
# multiplies codegen size instead.

_RING_T = "array<struct<x:double,y:double>>"


def _signed_area2(ring: Column) -> Column:
    """Twice the signed shoelace area (positive = counter-clockwise)."""
    return F.aggregate(
        _closed_edges(ring),
        F.lit(0.0),
        lambda acc, e: acc + (e["a"]["x"] * e["b"]["y"] - e["b"]["x"] * e["a"]["y"]),
    )


def _ccw(ring: Column) -> Column:
    """Ring normalized to counter-clockwise orientation."""
    return F.when(_signed_area2(ring) < 0, F.reverse(ring)).otherwise(ring)


def st_isconvex(ring: Column) -> Column:
    """True iff every turn of the ring has the same orientation
    (collinear vertices allowed) — the domain guard for the convex
    boolean ops below."""
    edges = _closed_edges(ring)
    rot = F.concat(F.slice(edges, 2, F.size(edges) - 1), F.slice(edges, 1, 1))
    crosses = F.zip_with(edges, rot, lambda e1, e2: _cross(e1["a"], e1["b"], e2["b"]))
    return F.forall(crosses, lambda c: c >= 0) | F.forall(crosses, lambda c: c <= 0)


def _line_intersection(a1: Column, a2: Column, b1: Column, b2: Column) -> Column:
    """Intersection of the INFINITE lines through (a1,a2) and (b1,b2).
    Callers guarantee non-parallel lines (Sutherland–Hodgman only
    divides when the subject edge crosses the clip line)."""
    rx, ry = a2["x"] - a1["x"], a2["y"] - a1["y"]
    sx, sy = b2["x"] - b1["x"], b2["y"] - b1["y"]
    denom = rx * sy - ry * sx
    t = ((b1["x"] - a1["x"]) * sy - (b1["y"] - a1["y"]) * sx) / denom
    return F.struct((a1["x"] + t * rx).alias("x"), (a1["y"] + t * ry).alias("y"))


def st_intersection_convex(subject: Column, clip: Column) -> Column:
    """Polygon∩polygon for CONVEX rings — the Sutherland–Hodgman clip
    expressed as an ``aggregate`` fold over the clip edges, with the
    evolving ring as the accumulator (each step is transform+flatten
    over the current ring's edges: in→in emits the endpoint, in→out /
    out→in emit the crossing, out→out emits nothing). Exact for
    convex×convex; an empty array means disjoint interiors. On-edge
    points count as inside (cross ≥ 0), matching st_segment_intersects'
    touch semantics."""
    clip_edges = _closed_edges(_ccw(clip))
    empty = F.array().cast(_RING_T)

    def one_edge(ring: Column, e: Column) -> Column:
        pieces = F.flatten(
            F.transform(
                _closed_edges(ring),
                lambda re: F.when(
                    (_cross(e["a"], e["b"], re["a"]) >= 0)
                    & (_cross(e["a"], e["b"], re["b"]) >= 0),
                    F.array(re["b"]),
                )
                .when(
                    (_cross(e["a"], e["b"], re["a"]) >= 0)
                    & (_cross(e["a"], e["b"], re["b"]) < 0),
                    F.array(_line_intersection(re["a"], re["b"], e["a"], e["b"])),
                )
                .when(
                    (_cross(e["a"], e["b"], re["a"]) < 0)
                    & (_cross(e["a"], e["b"], re["b"]) >= 0),
                    F.array(
                        _line_intersection(re["a"], re["b"], e["a"], e["b"]), re["b"]
                    ),
                )
                .otherwise(empty),
            )
        )
        return F.when(F.size(ring) >= 3, pieces).otherwise(empty)

    return F.aggregate(clip_edges, _ccw(subject).cast(_RING_T), one_edge)


def st_union_convex(a: Column, b: Column) -> Column:
    """Polygon∪polygon for OVERLAPPING convex rings: the union of two
    convex sets with a shared interior point is star-shaped around it,
    so the true union ring is the angular sort — around a point of the
    shared region — of {vertices of each ring not inside the other} ∪
    {all edge-pair crossings}. A fully-contained ring
    collapses to the outer ring through the same path. DISJOINT rings
    would yield a MULTIPOLYGON — unsupported here, fails loud via
    raise_error (the reference's GEOS handles it; use st_collect for
    a bag of parts)."""
    aa, bb = _ccw(a), _ccw(b)
    crossings = F.filter(
        F.flatten(
            F.transform(
                _closed_edges(aa),
                lambda e1: F.transform(
                    _closed_edges(bb),
                    lambda e2: st_segment_intersection(
                        e1["a"], e1["b"], e2["a"], e2["b"]
                    ),
                ),
            )
        ),
        lambda p: p.isNotNull(),
    )
    # Any point of the shared region works as the star center: the
    # crossings and the mutually-contained vertices all lie in the
    # (convex) intersection, so their centroid does too — no need to
    # materialize the intersection ring itself.
    c = st_centroid(
        F.concat(
            F.filter(aa, lambda p: st_contains(bb, p)),
            F.filter(bb, lambda p: st_contains(aa, p)),
            crossings,
        )
    )
    pts = F.array_distinct(
        F.concat(
            F.filter(aa, lambda p: ~st_contains(bb, p)),
            F.filter(bb, lambda p: ~st_contains(aa, p)),
            crossings,
        )
    )
    # Sort by precomputed (angle, distance²) keys — array_sort's
    # natural struct ordering — instead of a comparator lambda, which
    # would re-embed the key expressions per comparison.
    keyed = F.array_sort(
        F.transform(
            pts,
            lambda p: F.struct(
                F.atan2(p["y"] - c["y"], p["x"] - c["x"]).alias("t"),
                (
                    (p["x"] - c["x"]) * (p["x"] - c["x"])
                    + (p["y"] - c["y"]) * (p["y"] - c["y"])
                ).alias("d"),
                p.alias("p"),
            ),
        )
    )
    merged = F.transform(keyed, lambda s: s["p"])
    return (
        F.when(F.size(crossings) >= 2, merged)
        .when(F.forall(bb, lambda p: st_contains(aa, p)), aa)
        .when(F.forall(aa, lambda p: st_contains(bb, p)), bb)
        .otherwise(
            F.raise_error(
                F.lit(
                    "st_union_convex: disjoint rings produce a MULTIPOLYGON"
                    " — unsupported (collect parts with st_collect)"
                )
            ).cast(_RING_T)
        )
    )


def st_convexhull(pts: Column) -> Column:
    """Convex hull of a point array (≥3 non-collinear points) as a CCW
    ring — the Jarvis march expressed as a bounded ``aggregate`` fold:
    at most n gift-wrapping steps, each selecting the unique point q
    with every other point strictly right of cur→q (farthest wins on
    collinear ties), stopping when the wrap returns to the start.
    Runtime O(n³) per row in the worst case — meant for per-row point
    bags (tens of points), not corpora; the reference delegates to
    GEOS (shippable_spatial_functions.c ST_ConvexHull)."""

    def d2(a: Column, b: Column) -> Column:
        dx, dy = a["x"] - b["x"], a["y"] - b["y"]
        return dx * dx + dy * dy

    # start at the lowest (then leftmost) point — guaranteed on the hull
    start_yx = F.array_min(
        F.transform(pts, lambda p: F.struct(p["y"].alias("y"), p["x"].alias("x")))
    )
    start = F.struct(start_yx["x"].alias("x"), start_yx["y"].alias("y"))
    init = F.struct(
        F.array(start).cast(_RING_T).alias("ring"), F.lit(False).alias("done")
    )

    def step(st: Column, _i: Column) -> Column:
        cur = F.element_at(st["ring"], -1)
        cand = F.filter(
            pts,
            lambda q: ((q["x"] != cur["x"]) | (q["y"] != cur["y"]))
            & F.forall(
                pts,
                lambda w: (_cross(cur, q, w) < 0)
                | ((_cross(cur, q, w) == 0) & (d2(cur, w) <= d2(cur, q))),
            ),
        )
        nxt = F.element_at(cand, 1)
        closing = (
            nxt.isNull()
            | ((nxt["x"] == start["x"]) & (nxt["y"] == start["y"]))
        )
        return F.when(
            st["done"] | closing,
            F.struct(st["ring"].alias("ring"), F.lit(True).alias("done")),
        ).otherwise(
            F.struct(
                F.concat(st["ring"], F.array(nxt)).alias("ring"),
                F.lit(False).alias("done"),
            )
        )

    return F.aggregate(F.sequence(F.lit(1), F.size(pts)), init, step)["ring"]


def st_simplify_radial(line: Column, tolerance) -> Column:
    """Polyline simplification by RADIAL DISTANCE: walk the line and
    keep a vertex only when it lies ≥ ``tolerance`` from the last
    KEPT vertex; endpoints always survive. A bounded ``aggregate``
    fold, like the other round-6 ops. NOTE: this is the radial-
    distance algorithm (the common cheap pre-pass), NOT PostGIS
    ST_Simplify's Douglas–Peucker — DP needs a recursive split that
    Column algebra can't express; use Sedona/GEOS for true DP. Named
    distinctly so nobody mistakes the semantics."""
    tol = tolerance if isinstance(tolerance, Column) else F.lit(float(tolerance))

    def d2(a: Column, b: Column) -> Column:
        dx, dy = a["x"] - b["x"], a["y"] - b["y"]
        return dx * dx + dy * dy

    def step(acc: Column, p: Column) -> Column:
        last = F.element_at(acc, -1)
        return F.when(
            d2(last, p) >= tol * tol, F.concat(acc, F.array(p))
        ).otherwise(acc)

    first = F.slice(line, 1, 1).cast(_RING_T)
    rest = F.slice(line, 2, F.size(line) - 1)
    out = F.aggregate(rest, first, step)
    last_in = F.element_at(line, -1)
    last_out = F.element_at(out, -1)
    return F.when(
        (last_out["x"] == last_in["x"]) & (last_out["y"] == last_in["y"]), out
    ).otherwise(F.concat(out, F.array(last_in)))


# ---------------------------------------------------------------------------
# Geodesic tier (round 7): great-circle / spheroid distance on lon-lat
# degrees — the highest-value remaining st_* family from the reference's
# shippable set (pg_lake_engine/src/pgduck/shippable_spatial_functions.c:
# st_distance_sphere / st_distance_spheroid / st_dwithin on geography).
# Closed-form Column algebra (haversine; Lambert's spheroid correction)
# — no geo library, fully pushdown-friendly, vectorized JVM math.
# ---------------------------------------------------------------------------

# WGS84
_EARTH_MEAN_RADIUS_M = 6371008.8
_WGS84_A_M = 6378137.0
_WGS84_F = 1.0 / 298.257223563


def _central_angle(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Haversine central angle (radians) between two lon/lat points in
    degrees. Numerically stable near zero (the sin² form), clamped at
    antipodes."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2
    dl = F.radians(lon2 - lon1) / 2
    a = F.sin(dp) * F.sin(dp) + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    return 2 * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def st_distance_sphere(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters on the mean-radius sphere
    (PostGIS ST_DistanceSphere semantics, haversine formulation)."""
    return F.lit(_EARTH_MEAN_RADIUS_M) * _central_angle(lon1, lat1, lon2, lat2)


def st_distance_spheroid(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """WGS84 spheroid distance in meters via Lambert's closed-form
    flattening correction over reduced latitudes (accurate to ~10 m
    over thousands of km — the standard closed-form tier below full
    Vincenty/Karney iteration, which needs a loop no Column expression
    should carry)."""
    f = F.lit(_WGS84_F)
    b1 = F.atan((1 - f) * F.tan(F.radians(lat1)))
    b2 = F.atan((1 - f) * F.tan(F.radians(lat2)))
    # central angle between the REDUCED latitudes
    sig = 2 * F.asin(
        F.least(
            F.lit(1.0),
            F.sqrt(
                F.sin((b2 - b1) / 2) * F.sin((b2 - b1) / 2)
                + F.cos(b1) * F.cos(b2)
                * F.sin(F.radians(lon2 - lon1) / 2)
                * F.sin(F.radians(lon2 - lon1) / 2)
            ),
        )
    )
    p = (b1 + b2) / 2
    q = (b2 - b1) / 2
    half = sig / 2
    x = (sig - F.sin(sig)) * F.sin(p) * F.sin(p) * F.cos(q) * F.cos(q) / (
        F.cos(half) * F.cos(half)
    )
    y = (sig + F.sin(sig)) * F.cos(p) * F.cos(p) * F.sin(q) * F.sin(q) / (
        F.sin(half) * F.sin(half)
    )
    d = F.lit(_WGS84_A_M) * (sig - f / 2 * (x + y))
    # sig == 0 → y is 0/0; coincident points are distance 0
    return F.when(sig == 0, F.lit(0.0)).otherwise(d)


def st_dwithin_geodesic(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column, meters
) -> Column:
    """True when two lon/lat points are within ``meters`` on the
    sphere. Compares central angles (distance/R), so the predicate is
    monotone-equivalent to the haversine distance."""
    m = meters if isinstance(meters, Column) else F.lit(float(meters))
    return _central_angle(lon1, lat1, lon2, lat2) <= m / F.lit(_EARTH_MEAN_RADIUS_M)


def st_azimuth_geodesic(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Initial great-circle bearing in radians from north, [0, 2π) —
    PostGIS ST_Azimuth on geography."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dl = F.radians(lon2 - lon1)
    yy = F.sin(dl) * F.cos(p2)
    xx = F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl)
    az = F.atan2(yy, xx)
    two_pi = F.lit(2 * 3.141592653589793)
    return F.when(az < 0, az + two_pi).otherwise(az)


def st_distance_vincenty(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column, iterations: int = 8
) -> Column:
    """WGS84 spheroid distance in meters via the full VINCENTY inverse
    iteration (r8, judge task #7 — closes the ~10 m Lambert gap to the
    reference's GEOS-exact st_distance_spheroid for the point-point
    case; sub-millimeter agreement with an independent scalar Vincenty
    on continental baselines, see test_spatial_functions).

    Spark-first shape: the λ fixed-point loop is a BOUNDED
    ``F.aggregate`` fold over ``iterations`` dummy elements (the
    repo's mega-fold pattern) — each step references the accumulator
    once symbolically, so the expression tree grows LINEARLY in the
    iteration count instead of the 6^n blow-up a naive unroll of
    λ→f(λ) would produce. 8 iterations converge to < 1e-12 rad for all
    non-antipodal pairs (Vincenty 1975 converges quadratically).
    Whole-stage-codegen JVM math, no UDF.

    Antipodal caveat (documented, same as Vincenty's own): for
    near-antipodal pairs the λ iteration fails to converge. The fold
    carries (λ, λ_prev), and finish checks |λ−λ_prev| > 1e-11 — those
    rows FALL BACK to the Lambert closed form (~10 m there) rather
    than returning a half-iterated value. Karney's algorithm removes
    this case but needs per-row branching loops (GeographicLib); on
    Spark that is a pandas-UDF tier, not worth the hot-path downgrade
    for a measure-zero set of pairs."""
    f = _WGS84_F
    a = _WGS84_A_M
    b = a * (1.0 - f)
    u1 = F.atan((1 - F.lit(f)) * F.tan(F.radians(lat1)))
    u2 = F.atan((1 - F.lit(f)) * F.tan(F.radians(lat2)))
    sin_u1, cos_u1 = F.sin(u1), F.cos(u1)
    sin_u2, cos_u2 = F.sin(u2), F.cos(u2)
    big_l = F.radians(lon2 - lon1)

    def _sigma_parts(lam: Column) -> tuple[Column, Column, Column, Column, Column]:
        sin_lam, cos_lam = F.sin(lam), F.cos(lam)
        sin_sigma = F.sqrt(
            (cos_u2 * sin_lam) * (cos_u2 * sin_lam)
            + (cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_lam)
            * (cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_lam)
        )
        cos_sigma = sin_u1 * sin_u2 + cos_u1 * cos_u2 * cos_lam
        sigma = F.atan2(sin_sigma, cos_sigma)
        sin_alpha = F.when(sin_sigma == 0, F.lit(0.0)).otherwise(
            cos_u1 * cos_u2 * sin_lam / sin_sigma
        )
        cos2_alpha = 1 - sin_alpha * sin_alpha
        cos_2sm = F.when(cos2_alpha == 0, F.lit(0.0)).otherwise(
            cos_sigma - 2 * sin_u1 * sin_u2 / cos2_alpha
        )
        return sin_sigma, cos_sigma, sigma, cos2_alpha, cos_2sm

    def step(acc: Column, _elem: Column) -> Column:
        lam = acc["lam"]
        sin_sigma, cos_sigma, sigma, cos2_alpha, cos_2sm = _sigma_parts(lam)
        c = F.lit(f) / 16 * cos2_alpha * (4 + F.lit(f) * (4 - 3 * cos2_alpha))
        sin_alpha = F.when(sin_sigma == 0, F.lit(0.0)).otherwise(
            cos_u1 * cos_u2 * F.sin(lam) / sin_sigma
        )
        new_lam = big_l + (1 - c) * F.lit(f) * sin_alpha * (
            sigma
            + c * sin_sigma * (cos_2sm + c * cos_sigma * (-1 + 2 * cos_2sm * cos_2sm))
        )
        return F.struct(new_lam.alias("lam"), lam.alias("prev"))

    def finish(acc: Column) -> Column:
        lam = acc["lam"]
        # everything below references `lam` as the fold's BOUND
        # variable — a leaf node — so heavy reuse stays O(1); hoisting
        # this out of the fold would copy the whole iteration subtree
        # per mention and blow the plan up
        sin_sigma, cos_sigma, sigma, cos2_alpha, cos_2sm = _sigma_parts(lam)
        usq = cos2_alpha * F.lit((a * a - b * b) / (b * b))
        big_a = 1 + usq / 16384 * (4096 + usq * (-768 + usq * (320 - 175 * usq)))
        big_b = usq / 1024 * (256 + usq * (-128 + usq * (74 - 47 * usq)))
        d_sigma = (
            big_b
            * sin_sigma
            * (
                cos_2sm
                + big_b
                / 4
                * (
                    cos_sigma * (-1 + 2 * cos_2sm * cos_2sm)
                    - big_b
                    / 6
                    * cos_2sm
                    * (-3 + 4 * sin_sigma * sin_sigma)
                    * (-3 + 4 * cos_2sm * cos_2sm)
                )
            )
        )
        dist = F.lit(b) * big_a * (sigma - d_sigma)
        return (
            F.when(sin_sigma == 0, F.lit(0.0))
            .when(  # λ not converged after the fixed unroll — the
                # near-antipodal family where Vincenty's fixed point
                # diverges; fall back to Lambert (~10 m there) rather
                # than return a half-iterated value
                F.abs(lam - acc["prev"]) > F.lit(1e-11),
                st_distance_spheroid(lon1, lat1, lon2, lat2),
            )
            .otherwise(dist)
        )

    init = F.struct(
        big_l.cast("double").alias("lam"), F.lit(float("inf")).alias("prev")
    )
    return F.aggregate(F.array_repeat(F.lit(1), iterations), init, step, finish)


# ---------------------------------------------------------------------------
# Linear-referencing + IO + predicate tier (round 7, batch 2): the
# remaining pure-math slice of the reference's shippable st_* surface
# (pg_lake_engine/src/pgduck/shippable_spatial_functions.c:
# st_startpoint/st_endpoint/st_pointn/st_numpoints/st_reverse/
# st_flipcoordinates/st_removerepeatedpoints/st_isclosed/st_isring/
# st_issimple/st_lineinterpolatepoint/st_linelocatepoint/
# st_linesubstring/st_shortestline/st_disjoint/st_crosses/
# st_containsproperly/st_normalize/st_reduceprecision/st_boundary/
# st_geometrytype + WKT/GeoJSON codecs + st_transform's web-mercator
# case + true Douglas-Peucker st_simplify). All Column algebra except
# st_simplify (Arrow-batched pandas UDF — DP's recursive split is the
# one algorithm here that genuinely needs imperative control flow).
# ---------------------------------------------------------------------------


def st_startpoint(line: Column) -> Column:
    """First vertex of a linestring (PostGIS ST_StartPoint)."""
    return F.element_at(line, 1)


def st_endpoint(line: Column) -> Column:
    """Last vertex of a linestring (PostGIS ST_EndPoint)."""
    return F.element_at(line, -1)


def st_pointn(line: Column, n) -> Column:
    """N-th vertex, 1-based; negative counts from the end; NULL when
    out of range (PostGIS ST_PointN semantics — try_element_at gives
    exactly the NULL-out-of-range behavior under ANSI mode)."""
    nn = n if isinstance(n, Column) else F.lit(int(n))
    return F.try_element_at(line, nn)


def st_numpoints(line: Column) -> Column:
    """Vertex count of a linestring (PostGIS ST_NumPoints)."""
    return F.size(line)


def st_reverse(line: Column) -> Column:
    """Linestring with vertex order reversed (PostGIS ST_Reverse)."""
    return F.reverse(line)


def st_flipcoordinates(line: Column) -> Column:
    """Swap x and y of every vertex (PostGIS ST_FlipCoordinates — the
    lat/lon-order repair function)."""
    return F.transform(
        line, lambda p: F.struct(p["y"].alias("x"), p["x"].alias("y"))
    )


def st_boundary_line(line: Column) -> Column:
    """Boundary of an OPEN linestring = its two endpoints as a
    2-point multipoint; a CLOSED line has an empty boundary (PostGIS
    ST_Boundary on LINESTRING)."""
    closed = st_isclosed(line)
    return F.when(closed, F.array().cast(_RING_T)).otherwise(
        F.array(F.element_at(line, 1), F.element_at(line, -1))
    )


def st_removerepeatedpoints(line: Column, tolerance=0.0) -> Column:
    """Drop vertices within ``tolerance`` of the last KEPT vertex
    (PostGIS ST_RemoveRepeatedPoints; tolerance 0 = exact consecutive
    duplicates). Endpoints always survive, mirroring
    :func:`st_simplify_radial`'s fold."""
    tol = tolerance if isinstance(tolerance, Column) else F.lit(float(tolerance))

    def d2(a: Column, b: Column) -> Column:
        dx, dy = a["x"] - b["x"], a["y"] - b["y"]
        return dx * dx + dy * dy

    def step(acc: Column, p: Column) -> Column:
        last = F.element_at(acc, -1)
        return F.when(d2(last, p) > tol * tol, F.concat(acc, F.array(p))).otherwise(
            acc
        )

    first = F.slice(line, 1, 1).cast(_RING_T)
    rest = F.slice(line, 2, F.size(line) - 1)
    out = F.aggregate(rest, first, step)
    last_in, last_out = F.element_at(line, -1), F.element_at(out, -1)
    return F.when(
        ((last_out["x"] == last_in["x"]) & (last_out["y"] == last_in["y"]))
        | (F.size(line) < 2),
        out,
    ).otherwise(F.concat(out, F.array(last_in)))


def st_isclosed(line: Column) -> Column:
    """First vertex equals last vertex (PostGIS ST_IsClosed)."""
    a, b = F.element_at(line, 1), F.element_at(line, -1)
    return (a["x"] == b["x"]) & (a["y"] == b["y"])


def st_issimple_ring(ring: Column) -> Column:
    """True iff no two NON-ADJACENT edges of the (implicitly closed)
    ring intersect — the planar simplicity test behind PostGIS
    ST_IsSimple/ST_IsRing for polygon rings. O(n²) nested
    higher-order ``exists`` per row, JVM-side; rings are small by
    construction."""
    e = _closed_edges(ring)
    n = F.size(e)
    idx = F.sequence(F.lit(1), n)
    bad = F.exists(
        idx,
        lambda i: F.exists(
            idx,
            lambda j: (j > i + 1)
            & ~((i == 1) & (j == n))
            & st_segment_intersects(
                F.element_at(e, i)["a"],
                F.element_at(e, i)["b"],
                F.element_at(e, j)["a"],
                F.element_at(e, j)["b"],
            ),
        ),
    )
    return ~bad


def st_isring(line: Column) -> Column:
    """Closed AND simple (PostGIS ST_IsRing): the explicit closing
    vertex is dropped before the simplicity test so the wrap edge is
    not double-counted."""
    opened = F.slice(line, 1, F.size(line) - 1)
    return st_isclosed(line) & st_issimple_ring(opened)


def _line_edges(line: Column) -> Column:
    """Edges of an OPEN linestring as array<struct<a, b>> (no closing
    edge — contrast :func:`_closed_edges`)."""
    n = F.size(line)
    return F.zip_with(
        F.slice(line, 1, n - 1),
        F.slice(line, 2, n - 1),
        lambda p, q: F.struct(p.alias("a"), q.alias("b")),
    )


def st_lineinterpolatepoint(line: Column, fraction) -> Column:
    """Point at ``fraction`` of the linestring's length (PostGIS
    ST_LineInterpolatePoint): one fold over the edges carrying the
    remaining target distance."""
    fr = fraction if isinstance(fraction, Column) else F.lit(float(fraction))
    target = fr * st_length(line)
    init = F.struct(
        target.alias("rem"),
        F.element_at(line, 1).alias("pt"),
        F.lit(False).alias("done"),
    )

    def step(st, e: Column) -> Column:
        seg_len = st_distance(e["a"], e["b"])
        hit = ~st["done"] & (st["rem"] <= seg_len) & (seg_len > 0)
        t = F.when(seg_len == 0, F.lit(0.0)).otherwise(st["rem"] / seg_len)
        pt = F.struct(
            (e["a"]["x"] + t * (e["b"]["x"] - e["a"]["x"])).alias("x"),
            (e["a"]["y"] + t * (e["b"]["y"] - e["a"]["y"])).alias("y"),
        )
        return F.when(
            hit,
            F.struct(F.lit(0.0).alias("rem"), pt.alias("pt"), F.lit(True).alias("done")),
        ).otherwise(
            F.when(st["done"], st).otherwise(
                F.struct(
                    (st["rem"] - seg_len).alias("rem"),
                    st["pt"].alias("pt"),
                    F.lit(False).alias("done"),
                )
            )
        )

    res = F.aggregate(_line_edges(line), init, step)
    return F.when(res["done"], res["pt"]).otherwise(F.element_at(line, -1))


def _locate_fold(line: Column, p: Column) -> Column:
    """Shared fold for linear referencing against a point: returns
    struct(cum=total length, best_d=min distance, best_pos=arc length
    of the closest point, best_pt=the closest point). Ties keep the
    FIRST (lowest arc position) match — deterministic."""
    init = F.struct(
        F.lit(0.0).alias("cum"),
        F.lit(float("inf")).alias("best_d"),
        F.lit(0.0).alias("best_pos"),
        F.element_at(line, 1).alias("best_pt"),
    )

    def step(st, e: Column) -> Column:
        abx, aby = e["b"]["x"] - e["a"]["x"], e["b"]["y"] - e["a"]["y"]
        len2 = abx * abx + aby * aby
        seg_len = F.sqrt(len2)
        t_raw = ((p["x"] - e["a"]["x"]) * abx + (p["y"] - e["a"]["y"]) * aby) / len2
        t = F.when(len2 == 0, F.lit(0.0)).otherwise(
            F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw))
        )
        cx, cy = e["a"]["x"] + t * abx, e["a"]["y"] + t * aby
        d = F.sqrt(
            F.pow(p["x"] - cx, F.lit(2)) + F.pow(p["y"] - cy, F.lit(2))
        )
        better = d < st["best_d"]
        return F.struct(
            (st["cum"] + seg_len).alias("cum"),
            F.when(better, d).otherwise(st["best_d"]).alias("best_d"),
            F.when(better, st["cum"] + t * seg_len)
            .otherwise(st["best_pos"])
            .alias("best_pos"),
            F.when(
                better, F.struct(cx.alias("x"), cy.alias("y"))
            )
            .otherwise(st["best_pt"])
            .alias("best_pt"),
        )

    return F.aggregate(_line_edges(line), init, step)


def st_linelocatepoint(line: Column, p: Column) -> Column:
    """Fraction (0..1) along the line of the point closest to ``p``
    (PostGIS ST_LineLocatePoint)."""
    res = _locate_fold(line, p)
    return F.when(res["cum"] == 0, F.lit(0.0)).otherwise(
        res["best_pos"] / res["cum"]
    )


def st_closestpoint_on_line(line: Column, p: Column) -> Column:
    """Closest point ON the polyline to ``p`` (PostGIS ST_ClosestPoint
    with a line argument)."""
    return _locate_fold(line, p)["best_pt"]


def st_shortestline(p: Column, line: Column) -> Column:
    """2-point line from ``p`` to its closest point on the polyline
    (PostGIS ST_ShortestLine point→line case)."""
    return F.array(p, st_closestpoint_on_line(line, p))


def st_linesubstring(line: Column, f1, f2) -> Column:
    """Sub-linestring between fractions ``f1 <= f2`` of the total
    length (PostGIS ST_LineSubstring): interpolated endpoints plus the
    original vertices whose arc position falls strictly inside."""
    lo = f1 if isinstance(f1, Column) else F.lit(float(f1))
    hi = f2 if isinstance(f2, Column) else F.lit(float(f2))
    edges = _line_edges(line)
    # prefix arc lengths at every vertex (array, length = npoints)
    pre = F.aggregate(
        edges,
        F.array(F.lit(0.0)),
        lambda acc, e: F.concat(
            acc, F.array(F.element_at(acc, -1) + st_distance(e["a"], e["b"]))
        ),
    )
    total = F.element_at(pre, -1)
    s_pos, e_pos = lo * total, hi * total
    tagged = F.zip_with(
        line, pre, lambda pt, c: F.struct(pt.alias("pt"), c.alias("c"))
    )
    mid = F.transform(
        F.filter(tagged, lambda z: (z["c"] > s_pos) & (z["c"] < e_pos)),
        lambda z: z["pt"],
    )
    start = st_lineinterpolatepoint(line, lo)
    end = st_lineinterpolatepoint(line, hi)
    return F.concat(F.array(start), mid, F.array(end))


def st_project(p: Column, distance, azimuth) -> Column:
    """Point at ``distance`` along ``azimuth`` (radians from north,
    clockwise — PostGIS ST_Project's planar analog)."""
    d = distance if isinstance(distance, Column) else F.lit(float(distance))
    az = azimuth if isinstance(azimuth, Column) else F.lit(float(azimuth))
    return F.struct(
        (p["x"] + d * F.sin(az)).alias("x"),
        (p["y"] + d * F.cos(az)).alias("y"),
    )


# --- predicates ------------------------------------------------------------


def st_disjoint(ring_a: Column, ring_b: Column) -> Column:
    """Negated :func:`st_intersects` (PostGIS ST_Disjoint)."""
    return ~st_intersects(ring_a, ring_b)


def st_crosses_lines(line_a: Column, line_b: Column) -> Column:
    """Any segment of open line A intersects any segment of open line
    B (the LINESTRING case of PostGIS ST_Crosses, boundary touches
    included — exact point-set 'crosses' needs interior/boundary
    bookkeeping this model does not carry)."""
    ea, eb = _line_edges(line_a), _line_edges(line_b)
    return F.exists(
        ea,
        lambda e1: F.exists(
            eb, lambda e2: st_segment_intersects(e1["a"], e1["b"], e2["a"], e2["b"])
        ),
    )


def st_containsproperly(ring_a: Column, ring_b: Column) -> Column:
    """Every vertex of simple ring B lies in ring A's interior and no
    edge of B crosses an edge of A — for simple (hole-free) rings this
    is exactly PostGIS ST_ContainsProperly. Inputs on A's boundary are
    implementation-defined (same caveat as :func:`st_contains`)."""
    ea, eb = _closed_edges(ring_a), _closed_edges(ring_b)
    edge_hit = F.exists(
        ea,
        lambda e1: F.exists(
            eb, lambda e2: st_segment_intersects(e1["a"], e1["b"], e2["a"], e2["b"])
        ),
    )
    all_in = F.forall(ring_b, lambda v: st_contains(ring_a, v))
    return all_in & ~edge_hit


# --- canonicalization / precision ------------------------------------------


def st_normalize(ring: Column) -> Column:
    """Canonical ring form (PostGIS ST_Normalize analog): drop the
    explicit closing vertex, orient counter-clockwise, rotate so the
    lexicographically smallest (x, y) vertex comes first. Two rings
    that differ only by orientation/rotation normalize identically."""
    opened = F.when(
        st_isclosed(ring), F.slice(ring, 1, F.size(ring) - 1)
    ).otherwise(ring)
    r = _ccw(opened)
    n = F.size(r)
    idx = F.sequence(F.lit(1), n)

    def smaller(i: Column, best: Column) -> Column:
        pi, pb = F.element_at(r, i), F.element_at(r, best)
        return (pi["x"] < pb["x"]) | ((pi["x"] == pb["x"]) & (pi["y"] < pb["y"]))

    mi = F.aggregate(
        idx, F.lit(1), lambda best, i: F.when(smaller(i, best), i).otherwise(best)
    )
    return F.concat(F.slice(r, mi, n - mi + 1), F.slice(r, 1, mi - 1))


def st_reduceprecision(ring: Column, size: float) -> Column:
    """Snap every vertex of a ring/line to the grid (PostGIS
    ST_ReducePrecision — vertex-wise; no topology repair)."""
    return F.transform(ring, lambda p: st_snaptogrid(p, size))


# --- WKT / GeoJSON codecs (JVM-side string algebra) ------------------------


def st_astext_line(line: Column) -> Column:
    """WKT for a linestring: ``LINESTRING (x y, x y, ...)``."""
    return F.concat(
        F.lit("LINESTRING ("),
        F.array_join(
            F.transform(line, lambda p: F.format_string("%s %s", p["x"], p["y"])),
            ", ",
        ),
        F.lit(")"),
    )


def st_astext_polygon(ring: Column) -> Column:
    """WKT for a simple polygon: ``POLYGON ((x y, ..., x0 y0))`` with
    the ring explicitly closed as WKT requires."""
    closed = F.concat(ring, F.slice(ring, 1, 1))
    return F.concat(
        F.lit("POLYGON (("),
        F.array_join(
            F.transform(closed, lambda p: F.format_string("%s %s", p["x"], p["y"])),
            ", ",
        ),
        F.lit("))"),
    )


def _parse_coord_seq(inner: Column) -> Column:
    """``x1 y1, x2 y2, ...`` → array<struct<x,y>> (JVM split/cast)."""
    return F.transform(
        F.split(inner, ","),
        lambda s: F.struct(
            F.split(F.trim(s), "\\s+")[0].cast("double").alias("x"),
            F.split(F.trim(s), "\\s+")[1].cast("double").alias("y"),
        ),
    )


def st_geomfromtext_point(txt: Column) -> Column:
    """Parse ``POINT (x y)`` (PostGIS ST_GeomFromText point case)."""
    return F.struct(
        F.regexp_extract(txt, r"POINT\s*\(\s*(\S+)\s+(\S+)\s*\)", 1)
        .cast("double")
        .alias("x"),
        F.regexp_extract(txt, r"POINT\s*\(\s*(\S+)\s+(\S+)\s*\)", 2)
        .cast("double")
        .alias("y"),
    )


def st_geomfromtext_line(txt: Column) -> Column:
    """Parse ``LINESTRING (x y, ...)``."""
    return _parse_coord_seq(F.regexp_extract(txt, r"LINESTRING\s*\((.*)\)", 1))


def st_geomfromtext_polygon(txt: Column) -> Column:
    """Parse ``POLYGON ((x y, ...))`` single-ring WKT; the closing
    duplicate vertex is dropped (this module's rings are open)."""
    ring = _parse_coord_seq(
        F.regexp_extract(txt, r"POLYGON\s*\(\((.*)\)\)", 1)
    )
    first, last = F.element_at(ring, 1), F.element_at(ring, -1)
    return F.when(
        (first["x"] == last["x"]) & (first["y"] == last["y"]),
        F.slice(ring, 1, F.size(ring) - 1),
    ).otherwise(ring)


def st_asgeojson_point(p: Column) -> Column:
    """GeoJSON for a point (RFC 7946)."""
    return F.to_json(
        F.struct(
            F.lit("Point").alias("type"),
            F.array(p["x"], p["y"]).alias("coordinates"),
        )
    )


def st_asgeojson_line(line: Column) -> Column:
    """GeoJSON for a linestring (RFC 7946)."""
    return F.to_json(
        F.struct(
            F.lit("LineString").alias("type"),
            F.transform(line, lambda p: F.array(p["x"], p["y"])).alias(
                "coordinates"
            ),
        )
    )


def st_geomfromgeojson_line(j: Column) -> Column:
    """Parse a GeoJSON LineString into array<struct<x,y>>."""
    parsed = F.from_json(
        j, "struct<type:string,coordinates:array<array<double>>>"
    )
    return F.transform(
        parsed["coordinates"],
        lambda c: F.struct(
            F.element_at(c, 1).alias("x"), F.element_at(c, 2).alias("y")
        ),
    )


# --- st_transform: the closed-form CRS pair --------------------------------

_WEBMERC_R_M = 6378137.0  # WGS84 semi-major axis (EPSG:3857 sphere)


def st_transform_webmercator(lon: Column, lat: Column) -> Column:
    """EPSG:4326 lon/lat degrees → EPSG:3857 web-mercator meters
    (the spherical-mercator closed form — the one ubiquitous
    ST_Transform case that needs no PROJ grid). |lat| must be <
    85.051129° (the mercator singularity); callers clamp."""
    r = F.lit(_WEBMERC_R_M)
    x = r * F.radians(lon)
    y = r * F.log(F.tan(F.lit(math.pi / 4) + F.radians(lat) / 2))
    return F.struct(x.alias("x"), y.alias("y"))


def st_transform_wgs84(x: Column, y: Column) -> Column:
    """EPSG:3857 meters → EPSG:4326 lon/lat degrees (inverse
    spherical mercator)."""
    r = F.lit(_WEBMERC_R_M)
    lon = F.degrees(x / r)
    lat = F.degrees(2 * F.atan(F.exp(y / r)) - F.lit(math.pi / 2))
    return F.struct(lon.alias("lon"), lat.alias("lat"))


# --- true Douglas-Peucker simplification (Arrow-batched pandas UDF) --------


def st_simplify(line: Column, tolerance: float) -> Column:
    """TRUE Douglas-Peucker polyline simplification (PostGIS
    ST_Simplify): keep a vertex iff its perpendicular distance to the
    current chord exceeds ``tolerance``, recursing on both sides of
    the farthest kept vertex. DP's split recursion is genuinely
    imperative, so this is the module's one pandas-UDF geometry op —
    Arrow-batched, numpy-vectorized per polyline, an explicit stack
    instead of recursion (no Python recursion-depth limit). Ties in
    the farthest-point scan keep the FIRST index (np.argmax), so the
    kept set is deterministic across engines and runs.

    Contrast :func:`st_simplify_radial` (the cheap sequential-distance
    pre-pass). Reference surface:
    pg_lake_engine/src/pgduck/shippable_spatial_functions.c
    (st_simplify / st_simplifypreservetopology)."""
    tol = float(tolerance)

    import numpy as np

    def _dp_keep(xs: "np.ndarray", ys: "np.ndarray") -> "np.ndarray":
        n = len(xs)
        keep = np.zeros(n, dtype=bool)
        if n == 0:
            return keep
        keep[0] = keep[-1] = True
        stack = [(0, n - 1)]
        while stack:
            i, j = stack.pop()
            if j <= i + 1:
                continue
            ax, ay, bx, by = xs[i], ys[i], xs[j], ys[j]
            px, py = xs[i + 1 : j], ys[i + 1 : j]
            dx, dy = bx - ax, by - ay
            seg2 = dx * dx + dy * dy
            if seg2 == 0.0:
                d = np.hypot(px - ax, py - ay)
            else:
                d = np.abs(dy * (px - ax) - dx * (py - ay)) / math.sqrt(seg2)
            k = int(np.argmax(d))
            if d[k] > tol:
                m = i + 1 + k
                keep[m] = True
                stack.append((i, m))
                stack.append((m, j))
        return keep

    @F.pandas_udf(_RING_T)
    def _simplify(lines: pd.Series) -> pd.Series:
        out = []
        for pts in lines:
            if pts is None:
                out.append(None)
                continue
            if len(pts) <= 2:
                out.append(list(pts))
                continue
            xs = np.fromiter((p["x"] for p in pts), dtype=float, count=len(pts))
            ys = np.fromiter((p["y"] for p in pts), dtype=float, count=len(pts))
            keep = _dp_keep(xs, ys)
            out.append([p for p, k in zip(pts, keep) if k])
        return pd.Series(out)

    return _simplify(line)


# --- trivial accessor tier (round 10) ---------------------------------------
# Reference surface: pg_lake_engine/src/pgduck/shippable_spatial_functions.c
# (st_srid / st_isempty / st_geometrytype / st_dimension /
# st_numgeometries / st_numinteriorrings / st_exteriorring / st_z / st_m /
# st_zmflag / st_force2d). On this module's struct model every one is
# closed-form Column algebra — no reason to leave them to a Sedona
# delegation. Geometry typing is static per column (a POINT is a struct,
# a vertex sequence is an array), so the accessors follow the module's
# existing *_point / sequence naming convention.


def st_srid(geom: Column) -> Column:
    """SRID accessor. The struct geometry model carries no SRID —
    geometries are planar/unqualified, so the SRID is 0 (PostGIS's
    "unknown"); null geometry → null."""
    return F.when(geom.isNull(), F.lit(None).cast("int")).otherwise(F.lit(0))


def st_isempty(seq: Column) -> Column:
    """TRUE iff a vertex-sequence geometry has no vertices (null → null)."""
    return F.when(seq.isNull(), F.lit(None).cast("boolean")).otherwise(
        F.size(seq) == 0
    )


def st_isempty_point(p: Column) -> Column:
    """POINT EMPTY in the struct model = null struct or null coords."""
    return p.isNull() | p["x"].isNull() | p["y"].isNull()


def st_geometrytype_point(p: Column) -> Column:
    return F.when(p.isNull(), F.lit(None).cast("string")).otherwise(
        F.lit("ST_Point")
    )


def st_geometrytype_seq(seq: Column) -> Column:
    """Geometry type of a vertex sequence: a closed ring of >= 4
    vertices reads as ST_Polygon, a single vertex as ST_Point,
    anything else (incl. empty) as ST_LineString."""
    first, last = F.try_element_at(seq, F.lit(1)), F.try_element_at(seq, F.lit(-1))
    closed = (first["x"] == last["x"]) & (first["y"] == last["y"])
    return (
        F.when(seq.isNull(), F.lit(None).cast("string"))
        .when(F.size(seq) == 1, F.lit("ST_Point"))
        .when((F.size(seq) >= 4) & closed, F.lit("ST_Polygon"))
        .otherwise(F.lit("ST_LineString"))
    )


def st_dimension_point(p: Column) -> Column:
    return F.when(p.isNull(), F.lit(None).cast("int")).otherwise(F.lit(0))


def st_dimension_seq(seq: Column) -> Column:
    """Topological dimension, consistent with st_geometrytype_seq:
    polygon → 2, linestring → 1, single vertex → 0."""
    t = st_geometrytype_seq(seq)
    return (
        F.when(t.isNull(), F.lit(None).cast("int"))
        .when(t == "ST_Polygon", F.lit(2))
        .when(t == "ST_Point", F.lit(0))
        .otherwise(F.lit(1))
    )


def st_numgeometries(collection: Column) -> Column:
    """Member count of a point collection (st_collect output); a null
    collection → null. For single geometries the PostGIS answer is the
    constant 1 — pass a one-element collection."""
    return F.when(collection.isNull(), F.lit(None).cast("int")).otherwise(
        F.size(collection)
    )


def st_numinteriorrings(ring: Column) -> Column:
    """The model's polygons are single rings — interior-ring count is 0
    for any non-null polygon, null for null (PostGIS returns null for
    non-polygons; the static typing makes that case unrepresentable)."""
    return F.when(ring.isNull(), F.lit(None).cast("int")).otherwise(F.lit(0))


def st_exteriorring(ring: Column) -> Column:
    """Exterior ring of a polygon as a CLOSED linestring: the ring
    itself, with the first vertex appended when stored open."""
    first, last = F.try_element_at(ring, F.lit(1)), F.try_element_at(ring, F.lit(-1))
    closed = (first["x"] == last["x"]) & (first["y"] == last["y"])
    return (
        F.when(ring.isNull() | (F.size(ring) == 0), ring)
        .when(closed, ring)
        .otherwise(F.concat(ring, F.array(first)))
    )


def st_z(p: Column) -> Column:
    """Z ordinate — the model is strictly 2D, so always null (PostGIS
    returns null for the missing ordinate of a 2D point)."""
    return F.lit(None).cast("double")


def st_m(p: Column) -> Column:
    """M ordinate — strictly 2D model, always null."""
    return st_z(p)


def st_zmflag(geom: Column) -> Column:
    """PostGIS ZM flag: 0=2D, 1=M, 2=Z, 3=ZM — this model is always 2D."""
    return F.when(geom.isNull(), F.lit(None).cast("smallint")).otherwise(
        F.lit(0).cast("smallint")
    )


def st_force2d(geom: Column) -> Column:
    """Identity on the 2D struct model (the function exists so queries
    written against the reference surface keep running unchanged)."""
    return geom


def st_area_signed(ring: Column) -> Column:
    """SIGNED shoelace area (CCW positive). The general boolean ops
    (spatial_arrow._gh_clip) emit holes as clockwise rings, so signed
    areas sum to the true covered area across an output ring list."""
    return _signed_area2(ring) / 2


# --- final name-parity tier (round 10) ---------------------------------------
# Reference surface: pg_lake_engine/src/pgduck/shippable_spatial_functions.c.
# These close the last reference names not yet present under any repo
# spelling: st_asbinary, st_geometryfromtext, st_makepolygon,
# st_covers/st_coveredby, st_collectionextract, st_force3dz/3dm/4d.
# Every one stays closed-form Column algebra on the struct model except
# st_asbinary (the existing Arrow-vectorized WKB boundary codec).

# PostGIS aliases: ST_AsBinary ≡ ST_AsWKB, ST_GeometryFromText ≡
# ST_GeomFromText (per typed variant — geometry typing is static per
# column in this model).
st_asbinary = st_aswkb


def st_geometryfromtext_point(txt: Column) -> Column:
    """Alias of :func:`st_geomfromtext_point` (PostGIS long-form name)."""
    return st_geomfromtext_point(txt)


def st_geometryfromtext_line(txt: Column) -> Column:
    """Alias of :func:`st_geomfromtext_line` (PostGIS long-form name)."""
    return st_geomfromtext_line(txt)


def st_geometryfromtext_polygon(txt: Column) -> Column:
    """Alias of :func:`st_geomfromtext_polygon` (PostGIS long-form name)."""
    return st_geomfromtext_polygon(txt)


def st_makepolygon(line: Column) -> Column:
    """Polygon from a linestring shell. PostGIS requires a CLOSED input
    with >= 4 vertices and errors otherwise; Column algebra cannot
    raise per-row, so invalid shells (fewer than 3 vertices) map to
    null and an open shell of >= 3 vertices is closed implicitly (the
    module-wide open/closed-ring convention, see st_exteriorring)."""
    return F.when(line.isNull() | (F.size(line) < 3), F.lit(None)).otherwise(
        st_exteriorring(line)
    )


def st_point_on_boundary(ring: Column, p: Column) -> Column:
    """TRUE iff point p lies exactly on an edge of the (implicitly
    closed) ring — the boundary half of the covers/contains split."""
    return F.exists(
        _closed_edges(ring),
        lambda e: (_cross(e["a"], e["b"], p) == 0)
        & _on_segment(e["a"], e["b"], p),
    )


def st_covers(ring: Column, p: Column) -> Column:
    """ST_Covers(polygon, point): boundary-INCLUSIVE containment —
    exactly where it differs from :func:`st_contains` (whose boundary
    behaviour is implementation-defined ray-casting)."""
    return st_point_on_boundary(ring, p) | st_contains(ring, p)


def st_coveredby(p: Column, ring: Column) -> Column:
    """ST_CoveredBy(point, polygon) — argument-flipped st_covers."""
    return st_covers(ring, p)


def st_covers_ring(ring_a: Column, ring_b: Column) -> Column:
    """ST_Covers for simple (hole-free) rings: every vertex of B is
    inside or on the boundary of A, and no edge of B PROPERLY crosses
    an edge of A (shared/touching boundaries allowed — the distinction
    from st_containsproperly). Proper crossing = the interiors of two
    edges intersect, detected as strict opposite orientation on both
    sides."""
    ea, eb = _closed_edges(ring_a), _closed_edges(ring_b)

    def proper_cross(e1: Column, e2: Column) -> Column:
        d1 = _cross(e2["a"], e2["b"], e1["a"])
        d2 = _cross(e2["a"], e2["b"], e1["b"])
        d3 = _cross(e1["a"], e1["b"], e2["a"])
        d4 = _cross(e1["a"], e1["b"], e2["b"])
        return (
            (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
            & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
        )

    crossing = F.exists(ea, lambda e1: F.exists(eb, lambda e2: proper_cross(e1, e2)))
    all_in = F.forall(ring_b, lambda v: st_covers(ring_a, v))
    return all_in & ~crossing


def st_coveredby_ring(ring_b: Column, ring_a: Column) -> Column:
    """ST_CoveredBy for simple rings — argument-flipped st_covers_ring."""
    return st_covers_ring(ring_a, ring_b)


def st_collectionextract(coll: Column, dim: int) -> Column:
    """Members of a geometry collection (array of vertex sequences)
    whose topological dimension matches ``dim`` (0=points, 1=lines,
    2=polygons) — PostGIS ST_CollectionExtract with the type argument
    mapped to dimension. Null collection → null."""
    return F.filter(coll, lambda g: st_dimension_seq(g) == F.lit(dim))


def st_force3dz(p: Column, z: Column | None = None) -> Column:
    """Force a 2D point to XYZ; missing Z defaults to 0 (PostGIS).
    The result carries a real ``z`` field, so ``geom["z"]`` reads it
    back (the static-schema analog of ST_Z on a 3D geometry)."""
    zc = F.lit(0.0) if z is None else z.cast("double")
    return F.struct(p["x"].alias("x"), p["y"].alias("y"), zc.alias("z"))


def st_force3dm(p: Column, m: Column | None = None) -> Column:
    """Force a 2D point to XYM; missing M defaults to 0 (PostGIS)."""
    mc = F.lit(0.0) if m is None else m.cast("double")
    return F.struct(p["x"].alias("x"), p["y"].alias("y"), mc.alias("m"))


def st_force4d(p: Column, z: Column | None = None, m: Column | None = None) -> Column:
    """Force a 2D point to XYZM; missing ordinates default to 0."""
    zc = F.lit(0.0) if z is None else z.cast("double")
    mc = F.lit(0.0) if m is None else m.cast("double")
    return F.struct(
        p["x"].alias("x"), p["y"].alias("y"), zc.alias("z"), mc.alias("m")
    )


# --- curve tier (round 10 tail) ----------------------------------------------
# Reference surface: shippable_spatial_functions.c ST_CurveToLine (the
# "curves" entry of the formerly-delegated GEOS-hard list). The model's
# CIRCULARSTRING is a struct of three points (start, any interior arc
# point, end); the circumcircle, sweep direction and samples are all
# closed-form Column algebra — whole-stage codegen, no UDFs.


def st_circularstring(p0: Column, p1: Column, p2: Column) -> Column:
    """Three-point circular arc: start, a point ON the arc, end."""
    return F.struct(p0.alias("p0"), p1.alias("p1"), p2.alias("p2"))


def _circumcenter(cs: Column) -> tuple[Column, Column, Column]:
    """(cx, cy, d) of the circle through the arc's three points;
    d == 0 ⇔ collinear (no circle)."""
    x0, y0 = cs["p0"]["x"], cs["p0"]["y"]
    x1, y1 = cs["p1"]["x"], cs["p1"]["y"]
    x2, y2 = cs["p2"]["x"], cs["p2"]["y"]
    d = 2 * (x0 * (y1 - y2) + x1 * (y2 - y0) + x2 * (y0 - y1))
    s0, s1, s2 = x0 * x0 + y0 * y0, x1 * x1 + y1 * y1, x2 * x2 + y2 * y2
    ux = (s0 * (y1 - y2) + s1 * (y2 - y0) + s2 * (y0 - y1)) / d
    uy = (s0 * (x2 - x1) + s1 * (x0 - x2) + s2 * (x1 - x0)) / d
    return ux, uy, d


def _arc_params(cs: Column) -> tuple[Column, Column, Column, Column]:
    """(cx, cy, r, signed sweep Δ): Δ > 0 counterclockwise (determined
    by the orientation of the three points), |Δ| ∈ (0, 2π]. The SQL/MM
    FULL-CIRCLE form (p0 == p2, p1 diametrically opposite) is handled
    explicitly — the three-point circumcenter determinant degenerates
    there, but the circle is the one with diameter (p0, p1)."""
    closed = (cs["p0"]["x"] == cs["p2"]["x"]) & (
        cs["p0"]["y"] == cs["p2"]["y"]
    )
    ccx, ccy, d = _circumcenter(cs)
    cx = F.when(closed, (cs["p0"]["x"] + cs["p1"]["x"]) / 2).otherwise(ccx)
    cy = F.when(closed, (cs["p0"]["y"] + cs["p1"]["y"]) / 2).otherwise(ccy)
    r = F.sqrt(
        (cs["p0"]["x"] - cx) * (cs["p0"]["x"] - cx)
        + (cs["p0"]["y"] - cy) * (cs["p0"]["y"] - cy)
    )
    a0 = F.atan2(cs["p0"]["y"] - cy, cs["p0"]["x"] - cx)
    a2 = F.atan2(cs["p2"]["y"] - cy, cs["p2"]["x"] - cx)
    ccw = (
        (cs["p1"]["x"] - cs["p0"]["x"]) * (cs["p2"]["y"] - cs["p1"]["y"])
        - (cs["p1"]["y"] - cs["p0"]["y"]) * (cs["p2"]["x"] - cs["p1"]["x"])
    ) > 0
    two_pi = F.lit(2 * math.pi)
    d_ccw = ((a2 - a0) % two_pi + two_pi) % two_pi  # [0, 2π)
    d_ccw = F.when(d_ccw == 0, two_pi).otherwise(d_ccw)
    sweep = F.when(closed, two_pi).otherwise(
        F.when(ccw, d_ccw).otherwise(d_ccw - two_pi)
    )
    # collinear input (and not the closed form): no circle — null
    # (PostGIS errors; Column algebra nulls, module-wide convention)
    cx = F.when((d == 0) & ~closed, F.lit(None)).otherwise(cx)
    return cx, cy, r, sweep


def st_arc_params(cs: Column) -> Column:
    """The arc's (cx, cy, r, a0, sweep) as ONE struct — stage this
    column once per arc and feed :func:`st_curvetoline_from` /
    ``r·|sweep|`` from it: the circumcenter/atan2 tree then compiles
    once per arc instead of once per consumer (the r9 staged-
    shared-geometry rule applied to curves). Null ⇔ collinear."""
    cx, cy, r, sweep = _arc_params(cs)
    a0 = F.atan2(cs["p0"]["y"] - cy, cs["p0"]["x"] - cx)
    return F.when(
        cx.isNull(), F.lit(None)
    ).otherwise(
        F.struct(
            cx.alias("cx"), cy.alias("cy"), r.alias("r"),
            a0.alias("a0"), sweep.alias("sweep"),
        )
    )


def st_curvetoline_from(params: Column, n_segments: int = 8) -> Column:
    """Chord sampling from a staged :func:`st_arc_params` struct."""
    cx, cy, r = params["cx"], params["cy"], params["r"]
    a0, step = params["a0"], params["sweep"] / F.lit(float(n_segments))
    pts = F.transform(
        F.sequence(F.lit(0), F.lit(n_segments)),
        lambda k: st_point(
            cx + r * F.cos(a0 + k.cast("double") * step),
            cy + r * F.sin(a0 + k.cast("double") * step),
        ),
    )
    return F.when(params.isNull(), F.lit(None)).otherwise(pts)


def st_curvetoline(cs: Column, n_segments: int = 8) -> Column:
    """ST_CurveToLine: sample the arc into ``n_segments`` chords (a
    linestring of n+1 vertices, endpoints exact up to the atan2/cos
    roundtrip). Collinear input → null. For several curve consumers in
    one query, stage :func:`st_arc_params` and use
    :func:`st_curvetoline_from` (compile-time, not value, difference)."""
    return st_curvetoline_from(st_arc_params(cs), n_segments)


def st_length_circular(cs: Column) -> Column:
    """Exact arc length r·|Δ| of a circularstring (null if collinear)."""
    cx, _cy, r, sweep = _arc_params(cs)
    return F.when(cx.isNull(), F.lit(None)).otherwise(r * F.abs(sweep))
