"""Unit tests for the round-7 batch-2 spatial tier: linear
referencing, WKT/GeoJSON codecs, predicates, normalization, the
web-mercator transform pair, and true Douglas-Peucker st_simplify.

Complements the geo08/geo09/geo10 parity queries (closed-form oracles)
with edge cases the constructed oracle lines can't hit: out-of-range
pointn, degenerate lines, DP recursion depth ≥ 2 (checked against an
independent recursive reference implementation), normalize
rotation-invariance, and mercator roundtrip over the whole domain.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pg_datalake_spark.functions import spatial as S


def _line(*pts):
    return F.array(*[S.st_point(F.lit(float(x)), F.lit(float(y))) for x, y in pts])


def _one(spark, col, alias="v"):
    return spark.range(1).select(col.alias(alias)).collect()[0][alias]


def test_pointn_out_of_range_is_null(spark):
    line = _line((0, 0), (1, 1), (2, 0))
    assert _one(spark, S.st_pointn(line, 4)) is None
    assert _one(spark, S.st_pointn(line, -4)) is None
    got = _one(spark, S.st_pointn(line, -1))
    assert (got["x"], got["y"]) == (2.0, 0.0)


def test_boundary_of_closed_line_is_empty(spark):
    ring = _line((0, 0), (1, 0), (1, 1), (0, 0))
    assert _one(spark, S.st_boundary_line(ring)) == []


def test_removerepeatedpoints_tolerance(spark):
    # vertices 0.1 apart collapse under tolerance 0.5; endpoint survives
    line = _line((0, 0), (0.1, 0), (0.2, 0), (3, 0), (3.05, 0))
    got = _one(spark, S.st_removerepeatedpoints(line, 0.5))
    assert [(p["x"], p["y"]) for p in got] == [(0.0, 0.0), (3.0, 0.0), (3.05, 0.0)]


def test_interpolate_endpoints_and_degenerate(spark):
    line = _line((0, 0), (2, 0))
    assert _one(spark, S.st_lineinterpolatepoint(line, 0.0))["x"] == 0.0
    assert _one(spark, S.st_lineinterpolatepoint(line, 1.0))["x"] == 2.0
    # zero-length line: every fraction lands on the only location
    degen = _line((1, 1), (1, 1))
    got = _one(spark, S.st_lineinterpolatepoint(degen, 0.5))
    assert (got["x"], got["y"]) == (1.0, 1.0)
    assert _one(spark, S.st_linelocatepoint(degen, S.st_point(F.lit(9.0), F.lit(9.0)))) == 0.0


def test_linesubstring_full_and_point(spark):
    line = _line((0, 0), (1, 0), (2, 0))
    full = _one(spark, S.st_linesubstring(line, 0.0, 1.0))
    assert [p["x"] for p in full] == [0.0, 1.0, 2.0]
    # f1 == f2 → both interpolated endpoints coincide
    pt = _one(spark, S.st_linesubstring(line, 0.5, 0.5))
    assert [p["x"] for p in pt] == [1.0, 1.0]


def test_isring_bowtie_vs_square(spark):
    square = _line((0, 0), (2, 0), (2, 2), (0, 2), (0, 0))
    bowtie = _line((0, 0), (2, 2), (2, 0), (0, 2), (0, 0))
    assert _one(spark, S.st_isring(square).cast("int")) == 1
    assert _one(spark, S.st_isring(bowtie).cast("int")) == 0
    # open line is not a ring even if simple
    assert _one(spark, S.st_isring(_line((0, 0), (1, 1))).cast("int")) == 0


def test_normalize_rotation_and_orientation_invariant(spark):
    base = [(0, 0), (3, 0), (3, 2), (0, 2)]
    variants = []
    for rot in range(4):
        rotated = base[rot:] + base[:rot]
        variants.append(rotated)
        variants.append(list(reversed(rotated)))
    cols = [
        S.st_astext_polygon(S.st_normalize(_line(*v))).alias(f"v{i}")
        for i, v in enumerate(variants)
    ]
    row = spark.range(1).select(*cols).collect()[0]
    texts = {row[f"v{i}"] for i in range(len(variants))}
    assert len(texts) == 1, texts


def test_wkt_polygon_roundtrip_and_string_form(spark):
    ring = _line((0, 0), (4, 0), (4, 4), (0, 4))
    txt = _one(spark, S.st_astext_polygon(ring))
    assert txt == "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))"
    back = _one(spark, S.st_geomfromtext_polygon(S.st_astext_polygon(ring)))
    assert [(p["x"], p["y"]) for p in back] == [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]


def test_geojson_point_roundtrip(spark):
    p = S.st_point(F.lit(1.5), F.lit(-2.25))
    txt = _one(spark, S.st_asgeojson_point(p))
    assert txt == '{"type":"Point","coordinates":[1.5,-2.25]}'


def test_containsproperly_shared_edge_is_false(spark):
    big = _line((0, 0), (10, 0), (10, 10), (0, 10))
    touching = _line((0, 0), (5, 0), (5, 5), (0, 5))  # shares two edges
    assert _one(spark, S.st_containsproperly(big, touching).cast("int")) == 0


def test_mercator_roundtrip_domain(spark):
    rows = [(lon, lat) for lon in (-179.9, -60.0, 0.0, 121.7)
            for lat in (-84.9, -45.0, 0.0, 52.3, 84.9)]
    df = spark.createDataFrame(rows, ["lon", "lat"])
    out = df.select(
        "lon", "lat",
        S.st_transform_wgs84(
            S.st_transform_webmercator(F.col("lon"), F.col("lat"))["x"],
            S.st_transform_webmercator(F.col("lon"), F.col("lat"))["y"],
        ).alias("back"),
    ).collect()
    for r in out:
        assert abs(r.back["lon"] - r.lon) < 1e-9
        assert abs(r.back["lat"] - r.lat) < 1e-9


def _dp_reference(pts, tol):
    """Independent recursive Douglas-Peucker (the textbook algorithm)."""
    if len(pts) <= 2:
        return list(pts)
    ax, ay = pts[0]
    bx, by = pts[-1]
    dx, dy = bx - ax, by - ay
    seg = math.hypot(dx, dy)
    best_d, best_i = -1.0, -1
    for i in range(1, len(pts) - 1):
        px, py = pts[i]
        if seg == 0:
            d = math.hypot(px - ax, py - ay)
        else:
            d = abs(dy * (px - ax) - dx * (py - ay)) / seg
        if d > best_d:
            best_d, best_i = d, i
    if best_d > tol:
        left = _dp_reference(pts[: best_i + 1], tol)
        right = _dp_reference(pts[best_i:], tol)
        return left[:-1] + right
    return [pts[0], pts[-1]]


def test_simplify_matches_recursive_reference(spark):
    import random

    rng = random.Random(42)
    lines, expected = [], []
    for _ in range(40):
        n = rng.randint(3, 25)
        pts = [(round(rng.uniform(0, 10), 3), round(rng.uniform(0, 10), 3))
               for _ in range(n)]
        lines.append([{"x": x, "y": y} for x, y in pts])
        expected.append(_dp_reference(pts, 0.75))
    df = spark.createDataFrame(
        [(i, line) for i, line in enumerate(lines)],
        "id int, line array<struct<x:double,y:double>>",
    )
    got = {
        r.id: [(p["x"], p["y"]) for p in r.simp]
        for r in df.select("id", S.st_simplify(F.col("line"), 0.75).alias("simp")).collect()
    }
    for i, exp in enumerate(expected):
        assert got[i] == exp, f"line {i}: {got[i]} != {exp}"


def test_simplify_zero_tolerance_drops_only_collinear(spark):
    # strictly > tol: collinear interior points (d == 0) drop even at
    # tol=0, and nothing else does
    flat = _line((0, 0), (1, 0), (2, 0), (4, 0))
    got = _one(spark, S.st_simplify(flat, 0.0))
    assert [(p["x"], p["y"]) for p in got] == [(0.0, 0.0), (4.0, 0.0)]
    # a bump survives at tol=0, and the split re-examines both sides
    bump = _line((0, 0), (1, 0), (2, 1), (3, 0), (4, 0))
    got2 = _one(spark, S.st_simplify(bump, 0.0))
    assert [(p["x"], p["y"]) for p in got2] == [
        (0.0, 0.0), (1.0, 0.0), (2.0, 1.0), (3.0, 0.0), (4.0, 0.0)]
