"""Unit tests for the st_* spatial functions (known-value geometry).

Complements the geo01_spatial parity query (plain-SQL arithmetic
oracle) with hand-computed reference values for the ring functions and
the WKB boundary codecs.
"""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from pg_datalake_spark.functions import spatial as S


@pytest.fixture(scope="module")
def geo_df(spark):
    # (px, py) probe points against a fixed triangle (0,0)-(4,0)-(0,4)
    rows = [
        (1.0, 1.0, True),    # inside
        (3.9, 3.9, False),   # outside (beyond hypotenuse)
        (-1.0, 2.0, False),  # left of triangle
        (1.0, 2.9, True),    # inside, near hypotenuse (1+2.9 < 4)
        (5.0, 0.5, False),   # right of triangle
    ]
    return spark.createDataFrame(rows, ["px", "py", "expect_inside"])


def _triangle():
    # built lazily — Column construction needs an active JVM session
    return F.array(
        S.st_point(F.lit(0.0), F.lit(0.0)),
        S.st_point(F.lit(4.0), F.lit(0.0)),
        S.st_point(F.lit(0.0), F.lit(4.0)),
    )


def test_point_accessors_and_distance(spark):
    row = (
        spark.range(1)
        .select(
            S.st_x(S.st_point(F.lit(3.0), F.lit(-4.0))).alias("x"),
            S.st_y(S.st_point(F.lit(3.0), F.lit(-4.0))).alias("y"),
            S.st_distance(
                S.st_point(F.lit(0.0), F.lit(0.0)), S.st_point(F.lit(3.0), F.lit(4.0))
            ).alias("d"),
            S.st_dwithin(
                S.st_point(F.lit(0.0), F.lit(0.0)), S.st_point(F.lit(3.0), F.lit(4.0)), 5.0
            ).alias("within5"),
            S.st_dwithin(
                S.st_point(F.lit(0.0), F.lit(0.0)), S.st_point(F.lit(3.0), F.lit(4.0)), 4.99
            ).alias("within499"),
            S.st_astext(S.st_point(F.lit(1.5), F.lit(2.5))).alias("wkt"),
        )
        .collect()[0]
    )
    assert (row.x, row.y) == (3.0, -4.0)
    assert row.d == 5.0
    assert row.within5 is True and row.within499 is False
    assert row.wkt == "POINT (1.5 2.5)"


def test_ring_area_perimeter_centroid(spark):
    row = (
        spark.range(1)
        .select(
            S.st_area(_triangle()).alias("area"),
            S.st_perimeter(_triangle()).alias("perim"),
            S.st_x(S.st_centroid(_triangle())).alias("cx"),
            S.st_y(S.st_centroid(_triangle())).alias("cy"),
            S.st_npoints(_triangle()).alias("n"),
            S.st_envelope(_triangle()).alias("env"),
        )
        .collect()[0]
    )
    assert row.area == pytest.approx(8.0)  # 4*4/2
    assert row.perim == pytest.approx(8 + math.sqrt(32))
    assert (row.cx, row.cy) == (pytest.approx(4 / 3), pytest.approx(4 / 3))
    assert row.n == 3
    assert (row.env.xmin, row.env.ymin, row.env.xmax, row.env.ymax) == (0.0, 0.0, 4.0, 4.0)


def test_contains_ray_casting(geo_df):
    rows = geo_df.select(
        "expect_inside", S.st_contains(_triangle(), S.st_point(F.col("px"), F.col("py"))).alias("got")
    ).collect()
    for r in rows:
        assert r.got == r.expect_inside


def test_relations_translate_azimuth(spark):
    p = S.st_point(F.lit(1.0), F.lit(1.0))
    row = (
        spark.range(1)
        .select(
            S.st_within(p, _triangle()).alias("within"),
            S.st_equals(p, S.st_point(F.lit(1.0), F.lit(1.0))).alias("eq"),
            S.st_equals(p, S.st_point(F.lit(1.0), F.lit(2.0))).alias("neq"),
            S.st_x(S.st_translate(p, 2.5, -1.0)).alias("tx"),
            S.st_y(S.st_translate(p, 2.5, -1.0)).alias("ty"),
            S.st_azimuth(
                S.st_point(F.lit(0.0), F.lit(0.0)), S.st_point(F.lit(1.0), F.lit(0.0))
            ).alias("az_east"),
            S.st_azimuth(
                S.st_point(F.lit(0.0), F.lit(0.0)), S.st_point(F.lit(0.0), F.lit(1.0))
            ).alias("az_north"),
            S.st_azimuth(
                S.st_point(F.lit(0.0), F.lit(0.0)), S.st_point(F.lit(-1.0), F.lit(0.0))
            ).alias("az_west"),
        )
        .collect()[0]
    )
    assert row.within is True and row.eq is True and row.neq is False
    assert (row.tx, row.ty) == (3.5, 0.0)
    assert row.az_east == pytest.approx(math.pi / 2)  # due east = 90° from north
    assert row.az_north == pytest.approx(0.0)
    assert row.az_west == pytest.approx(3 * math.pi / 2)  # normalized to [0, 2π)


def test_line_length_and_envelope_algebra(spark):
    line = S.st_makeline(
        S.st_point(F.lit(0.0), F.lit(0.0)),
        S.st_point(F.lit(3.0), F.lit(4.0)),
        S.st_point(F.lit(3.0), F.lit(6.0)),
    )
    a = S.st_makeenvelope(0.0, 0.0, 4.0, 4.0)
    b = S.st_makeenvelope(3.0, 3.0, 6.0, 6.0)
    c = S.st_makeenvelope(10.0, 10.0, 11.0, 11.0)
    row = (
        spark.range(1)
        .select(
            S.st_length(line).alias("len"),  # 5 + 2
            S.st_bbox_intersects(a, b).alias("ab"),
            S.st_bbox_intersects(a, c).alias("ac"),
            S.st_bbox_union(a, b).alias("u"),
            S.st_bbox_intersection(a, b).alias("i"),
            S.st_bbox_intersection(a, c).alias("none"),
            S.st_expand(a, 1.0).alias("e"),
        )
        .collect()[0]
    )
    assert row.len == pytest.approx(7.0)
    assert row.ab is True and row.ac is False
    assert (row.u.xmin, row.u.ymin, row.u.xmax, row.u.ymax) == (0.0, 0.0, 6.0, 6.0)
    assert (row.i.xmin, row.i.ymin, row.i.xmax, row.i.ymax) == (3.0, 3.0, 4.0, 4.0)
    assert row.none is None
    assert (row.e.xmin, row.e.ymin, row.e.xmax, row.e.ymax) == (-1.0, -1.0, 5.0, 5.0)


def test_extent_and_collect_aggregates(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 5.0), (1, 3.0, -1.0), (2, 0.0, 0.0)], ["g", "x", "y"]
    )
    p = S.st_point(F.col("x"), F.col("y"))
    rows = {
        r.g: r
        for r in df.groupBy("g")
        .agg(
            S.st_extent(p).alias("ext"),
            F.size(S.st_collect(p)).alias("np"),
        )
        .collect()
    }
    assert (rows[1].ext.xmin, rows[1].ext.ymin, rows[1].ext.xmax, rows[1].ext.ymax) == (
        1.0, -1.0, 3.0, 5.0,
    )
    assert rows[1].np == 2 and rows[2].np == 1


def test_wkb_roundtrip(spark):
    df = spark.createDataFrame([(1.5, -2.25), (0.0, 1e9)], ["x", "y"])
    out = (
        df.select(S.st_aswkb(F.col("x"), F.col("y")).alias("wkb"), "x", "y")
        .select(S.st_geomfromwkb(F.col("wkb")).alias("p"), "x", "y", "wkb")
        .collect()
    )
    for r in out:
        assert (r.p.x, r.p.y) == (r.x, r.y)
        # standard WKB: little-endian marker + point type + packed doubles
        assert bytes(r.wkb) == b"\x01\x01\x00\x00\x00" + struct.pack("<dd", r.x, r.y)


def test_segment_predicates_and_intersection(spark):
    """Proper crossing, endpoint touch, collinear overlap/disjoint, and
    the crossing-point coordinates."""
    P = lambda x, y: S.st_point(F.lit(float(x)), F.lit(float(y)))
    row = (
        spark.range(1)
        .select(
            S.st_segment_intersects(P(0, 0), P(2, 2), P(0, 2), P(2, 0)).alias("cross"),
            S.st_segment_intersects(P(0, 0), P(1, 1), P(1, 1), P(2, 0)).alias("touch"),
            S.st_segment_intersects(P(0, 0), P(1, 1), P(2, 2), P(3, 3)).alias("col_gap"),
            S.st_segment_intersects(P(0, 0), P(2, 2), P(1, 1), P(3, 3)).alias("col_lap"),
            S.st_segment_intersects(P(0, 0), P(1, 0), P(0, 1), P(1, 1)).alias("parallel"),
            S.st_x(S.st_segment_intersection(P(0, 0), P(2, 2), P(0, 2), P(2, 0))).alias("ix"),
            S.st_y(S.st_segment_intersection(P(0, 0), P(2, 2), P(0, 2), P(2, 0))).alias("iy"),
            S.st_segment_intersection(P(0, 0), P(1, 0), P(0, 1), P(1, 1)).alias("none"),
        )
        .collect()[0]
    )
    assert row.cross is True
    assert row.touch is True          # shared endpoint counts (boundary)
    assert row.col_gap is False       # collinear but disjoint
    assert row.col_lap is True        # collinear overlap
    assert row.parallel is False
    assert (row.ix, row.iy) == (1.0, 1.0)
    assert row.none is None           # parallel → no point


def test_ring_intersects_cases(spark):
    """Edge-crossing, containment without edge crossing, disjoint."""
    P = lambda x, y: S.st_point(F.lit(float(x)), F.lit(float(y)))

    def ring(*xy):
        return F.array(*[P(x, y) for x, y in xy])

    sq = ring((0, 0), (4, 0), (4, 4), (0, 4))
    overlap = ring((2, 2), (6, 2), (6, 6), (2, 6))
    inner = ring((1, 1), (2, 1), (2, 2), (1, 2))
    far = ring((10, 10), (12, 10), (12, 12), (10, 12))
    row = (
        spark.range(1)
        .select(
            S.st_intersects(sq, overlap).alias("edge_cross"),
            S.st_intersects(sq, inner).alias("contained"),
            S.st_intersects(inner, sq).alias("contains_rev"),
            S.st_intersects(sq, far).alias("disjoint"),
        )
        .collect()[0]
    )
    assert row.edge_cross is True
    assert row.contained is True
    assert row.contains_rev is True
    assert row.disjoint is False


def test_buffer_snap_closest_distance_union(spark):
    P = lambda x, y: S.st_point(F.lit(float(x)), F.lit(float(y)))
    line = S.st_makeline(P(0, 0), P(10, 0), P(10, 10))
    row = (
        spark.range(1)
        .select(
            S.st_npoints(S.st_buffer(P(1, 1), 2.0, segments=12)).alias("buf_n"),
            S.st_area(S.st_buffer(P(1, 1), 2.0, segments=720)).alias("buf_area"),
            S.st_x(S.st_snaptogrid(P(1.26, -0.74), 0.5)).alias("snap_x"),
            S.st_y(S.st_snaptogrid(P(1.26, -0.74), 0.5)).alias("snap_y"),
            S.st_distance_to_line(P(5, 3), line).alias("d_line"),
            S.st_x(S.st_closestpoint(P(0, 0), P(10, 0), P(5, 3))).alias("cp_x"),
            S.st_y(S.st_closestpoint(P(0, 0), P(10, 0), P(5, 3))).alias("cp_y"),
            S.st_distance_to_line(P(-3, -4), line).alias("d_clamped"),
            S.st_union_extent(
                S.st_makeenvelope(F.col("id"), F.lit(0.0), F.col("id") + 1, F.lit(2.0))
            ).alias("uext"),
        )
        .collect()[0]
    )
    assert row.buf_n == 12
    # 720-gon ≈ circle: area within 0.01% of πr²
    assert abs(row.buf_area - math.pi * 4) / (math.pi * 4) < 1e-4
    assert (row.snap_x, row.snap_y) == (1.5, -0.5)
    assert row.d_line == pytest.approx(3.0)
    assert (row.cp_x, row.cp_y) == (5.0, 0.0)
    # off the start of the line → clamped to endpoint (0,0)
    assert row.d_clamped == pytest.approx(5.0)
    assert (row.uext.xmin, row.uext.xmax) == (0.0, 1.0)


def test_convex_boolean_ops(spark):
    """Round-6 tier: Sutherland–Hodgman clip, star-shaped union,
    st_isconvex — values against closed forms; disjoint fails loud.
    Rings are materialized per the module usage note (measures read
    the column, not re-inlined constructors)."""
    P = lambda x, y: S.st_point(F.lit(float(x)), F.lit(float(y)))

    def square(cx, cy, h):
        return F.array(P(cx - h, cy - h), P(cx + h, cy - h),
                       P(cx + h, cy + h), P(cx - h, cy + h))

    def diamond(cx, cy, r):
        return F.array(P(cx + r, cy), P(cx, cy + r), P(cx - r, cy), P(cx, cy - r))

    h, r = 1.0, 1.5
    ringed = spark.range(1).select(
        S.st_intersection_convex(diamond(0, 0, r), square(0, 0, h)).alias("inter"),
        S.st_union_convex(diamond(0, 0, r), square(0, 0, h)).alias("uni"),
        S.st_union_convex(diamond(0, 0, r), square(0.2, -0.1, 0.25)).alias("cont"),
        S.st_intersection_convex(square(10, 10, 1), square(0, 0, 1)).alias("disj"),
    )
    row = ringed.select(
        S.st_area(F.col("inter")).alias("ia"),
        S.st_npoints(F.col("inter")).alias("inp"),
        S.st_isconvex(F.col("inter")).alias("icvx"),
        S.st_area(F.col("uni")).alias("ua"),
        S.st_npoints(F.col("uni")).alias("unp"),
        S.st_isconvex(F.col("uni")).alias("ucvx"),
        S.st_area(F.col("cont")).alias("ca"),
        F.size(F.col("disj")).alias("dn"),
    ).collect()[0]
    assert row.ia == pytest.approx(2 * r * r - 4 * (r - h) ** 2)
    assert row.inp == 8 and row.icvx
    assert row.ua == pytest.approx(4 * h * h + 4 * (r - h) ** 2)
    assert row.unp == 16 and not row.ucvx
    assert row.ca == pytest.approx(2 * r * r)  # contained ring collapses
    assert row.dn == 0  # disjoint clip → empty ring, no error
    # disjoint UNION is a multipolygon → fail-loud, never silently wrong
    with pytest.raises(Exception, match="MULTIPOLYGON"):
        spark.range(1).select(
            S.st_union_convex(square(0, 0, 1), square(9, 9, 1)).alias("u")
        ).select(F.size(F.col("u"))).collect()


def test_convexhull_collinear_and_duplicates(spark):
    """Jarvis-march hull: edge-midpoint (collinear) and duplicate
    input points must be excluded — only the four square corners
    survive, in convex order."""
    P = lambda x, y: S.st_point(F.lit(float(x)), F.lit(float(y)))
    pts = F.array(
        P(1, 0), P(0, 1), P(2, 1),  # edge midpoints (collinear)
        P(1, 1), P(1, 1),           # duplicated interior point
        P(0, 0), P(2, 0), P(2, 2), P(0, 2),  # the true hull
        P(1, 2),                    # top edge midpoint
    )
    row = (
        spark.range(1)
        .select(S.st_convexhull(pts).alias("hull"))
        .select(
            S.st_npoints(F.col("hull")).alias("n"),
            S.st_area(F.col("hull")).alias("a"),
            S.st_isconvex(F.col("hull")).alias("c"),
        )
        .collect()[0]
    )
    assert row.n == 4
    assert row.a == pytest.approx(4.0)
    assert row.c


def test_convex_inclusion_exclusion_random(spark):
    """Randomized consistency check of the whole convex boolean tier:
    for overlapping convex polygons, area(A) + area(B) must equal
    area(A∩B) + area(A∪B) (inclusion–exclusion), with the
    intersection bounded by either input and the union bounding both.
    Any systematic Sutherland–Hodgman or star-merge bug breaks the
    identity — this covers shapes the closed-form geo04 cases can't."""
    import math
    import random

    rng = random.Random(20240814)
    rows = []
    for _ in range(30):
        def poly():
            m = rng.randint(3, 8)
            rx, ry = rng.uniform(0.5, 2.0), rng.uniform(0.5, 2.0)
            cx, cy = rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2)
            rot = rng.uniform(0, 2 * math.pi)
            return [
                {"x": cx + rx * math.cos(rot + 2 * math.pi * i / m),
                 "y": cy + ry * math.sin(rot + 2 * math.pi * i / m)}
                for i in range(m)
            ]
        rows.append({"a": poly(), "b": poly()})

    schema = ("a array<struct<x:double,y:double>>, "
              "b array<struct<x:double,y:double>>")
    df = spark.createDataFrame(rows, schema)
    ringed = df.select(
        "a", "b",
        S.st_intersection_convex(F.col("a"), F.col("b")).alias("i"),
        S.st_union_convex(F.col("a"), F.col("b")).alias("u"),
    )
    out = ringed.select(
        S.st_area(F.col("a")).alias("aa"),
        S.st_area(F.col("b")).alias("ab"),
        S.st_area(F.col("i")).alias("ai"),
        S.st_area(F.col("u")).alias("au"),
    ).collect()
    assert len(out) == 30
    for r in out:
        assert r.ai <= min(r.aa, r.ab) + 1e-9, r
        assert r.au >= max(r.aa, r.ab) - 1e-9, r
        assert abs(r.aa + r.ab - r.ai - r.au) < 1e-6, r


def test_geodesic_distance_known_values(spark):
    """Haversine/spheroid sanity against well-known city pairs:
    LHR→JFK great-circle ≈ 5,539 km (sphere) / ≈ 5,548 km (WGS84
    geodesic); the Lambert closed form must land within ~10 km of the
    published geodesic value and within 0.5 % of the sphere."""
    df = spark.createDataFrame(
        [(-0.4614, 51.4700, -73.7781, 40.6413)],
        "lon1 double, lat1 double, lon2 double, lat2 double",
    )
    r = df.select(
        S.st_distance_sphere(
            F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
        ).alias("sphere"),
        S.st_distance_spheroid(
            F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
        ).alias("spheroid"),
    ).first()
    assert abs(r.sphere - 5_539_000) < 15_000, r.sphere
    assert abs(r.spheroid - 5_548_000) < 15_000, r.spheroid
    assert abs(r.spheroid - r.sphere) / r.sphere < 0.005


def test_geodesic_properties(spark):
    """Symmetry, identity at coincident points, dwithin consistency,
    azimuth in [0, 2π) — over a deterministic lon/lat grid."""
    df = spark.range(200).select(
        ((F.col("id") % 17).cast("double") * 10 - 80).alias("lat1"),
        ((F.col("id") % 23).cast("double") * 15 - 170).alias("lon1"),
        (((F.col("id") + 7) % 17).cast("double") * 10 - 80).alias("lat2"),
        (((F.col("id") + 11) % 23).cast("double") * 15 - 170).alias("lon2"),
    )
    r = df.select(
        S.st_distance_sphere(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d12"),
        S.st_distance_sphere(F.col("lon2"), F.col("lat2"), F.col("lon1"), F.col("lat1")).alias("d21"),
        S.st_distance_sphere(F.col("lon1"), F.col("lat1"), F.col("lon1"), F.col("lat1")).alias("dself"),
        S.st_distance_spheroid(F.col("lon1"), F.col("lat1"), F.col("lon1"), F.col("lat1")).alias("sself"),
        S.st_dwithin_geodesic(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2"), 6_000_000).alias("within"),
        S.st_azimuth_geodesic(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("az"),
    ).collect()
    for row in r:
        assert abs(row.d12 - row.d21) < 1e-6
        assert row.dself == 0.0
        assert row.sself == 0.0
        assert row.within == (row.d12 <= 6_000_000 + 1e-6)
        assert 0.0 <= row.az < 2 * math.pi + 1e-12
        # half Earth circumference is the ceiling
        assert row.d12 <= math.pi * 6371008.8 + 1.0


def _vincenty_scalar(lon1, lat1, lon2, lat2, iters=200):
    """Independent scalar Vincenty inverse (textbook 1975 formulation)
    used as the oracle for the Column-algebra fold."""
    a, f = 6378137.0, 1 / 298.257223563
    b = a * (1 - f)
    u1 = math.atan((1 - f) * math.tan(math.radians(lat1)))
    u2 = math.atan((1 - f) * math.tan(math.radians(lat2)))
    big_l = math.radians(lon2 - lon1)
    lam = big_l
    for _ in range(iters):
        sl, cl = math.sin(lam), math.cos(lam)
        ss = math.sqrt(
            (math.cos(u2) * sl) ** 2
            + (math.cos(u1) * math.sin(u2) - math.sin(u1) * math.cos(u2) * cl) ** 2
        )
        if ss == 0:
            return 0.0
        cs = math.sin(u1) * math.sin(u2) + math.cos(u1) * math.cos(u2) * cl
        sig = math.atan2(ss, cs)
        sa = math.cos(u1) * math.cos(u2) * sl / ss
        c2a = 1 - sa * sa
        c2sm = cs - 2 * math.sin(u1) * math.sin(u2) / c2a if c2a else 0.0
        c = f / 16 * c2a * (4 + f * (4 - 3 * c2a))
        new = big_l + (1 - c) * f * sa * (
            sig + c * ss * (c2sm + c * cs * (-1 + 2 * c2sm * c2sm))
        )
        done = abs(new - lam) < 1e-13
        lam = new
        if done:
            break
    sl, cl = math.sin(lam), math.cos(lam)
    ss = math.sqrt(
        (math.cos(u2) * sl) ** 2
        + (math.cos(u1) * math.sin(u2) - math.sin(u1) * math.cos(u2) * cl) ** 2
    )
    cs = math.sin(u1) * math.sin(u2) + math.cos(u1) * math.cos(u2) * cl
    sig = math.atan2(ss, cs)
    sa = math.cos(u1) * math.cos(u2) * sl / ss
    c2a = 1 - sa * sa
    c2sm = cs - 2 * math.sin(u1) * math.sin(u2) / c2a if c2a else 0.0
    usq = c2a * (a * a - b * b) / (b * b)
    big_a = 1 + usq / 16384 * (4096 + usq * (-768 + usq * (320 - 175 * usq)))
    big_b = usq / 1024 * (256 + usq * (-128 + usq * (74 - 47 * usq)))
    ds = big_b * ss * (
        c2sm
        + big_b / 4 * (
            cs * (-1 + 2 * c2sm * c2sm)
            - big_b / 6 * c2sm * (-3 + 4 * ss * ss) * (-3 + 4 * c2sm * c2sm)
        )
    )
    return b * big_a * (sig - ds)


def test_vincenty_fold_matches_scalar_reference(spark):
    """r8: the bounded-fold Vincenty agrees with an independent scalar
    implementation to sub-millimeter on converged pairs, returns 0 for
    coincident points, and falls back to Lambert (not a half-iterated
    value) when the fixed unroll has not converged (near-antipodal)."""
    pairs = [
        ("london-nyc", -0.1278, 51.5074, -74.0060, 40.7128),
        ("sydney-tokyo", 151.2093, -33.8688, 139.6917, 35.6895),
        ("equator-short", 10.0, 0.0, 10.5, 0.0),
        ("same-point", 5.0, 5.0, 5.0, 5.0),
        ("pole-ish", 30.0, 89.0, -150.0, 88.0),
        ("meridian", 7.0, -45.0, 7.0, 60.0),
        ("cross-dateline", 179.5, 12.0, -179.5, 12.5),
    ]
    df = spark.createDataFrame(
        [(n, a, b, c, d) for n, a, b, c, d in pairs],
        "name string, lon1 double, lat1 double, lon2 double, lat2 double",
    )
    got = {
        r.name: r.d
        for r in df.select(
            "name",
            S.st_distance_vincenty(
                F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
            ).alias("d"),
        ).collect()
    }
    for n, lo1, la1, lo2, la2 in pairs:
        ref = _vincenty_scalar(lo1, la1, lo2, la2)
        assert abs(got[n] - ref) < 1e-3, (n, got[n], ref)
    # Vincenty beats Lambert against itself: on a long meridian arc the
    # two differ by meters, and the fold lands on the Vincenty value
    assert abs(got["meridian"] - 11639017.1975) < 0.01
    # non-convergence fallback: the near-antipodal pair returns the
    # LAMBERT value exactly (never a half-iterated Vincenty number)
    anti = spark.createDataFrame(
        [(0.0, 0.0, 179.6, 0.4)], "lon1 double, lat1 double, lon2 double, lat2 double"
    )
    r = anti.select(
        S.st_distance_vincenty(
            F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
        ).alias("v"),
        S.st_distance_spheroid(
            F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
        ).alias("lam"),
    ).first()
    assert r.v == r.lam


def test_convex_arrow_matches_fold(spark):
    """r9: the Arrow kernels (functions/spatial_arrow.py) must be
    RESULT-IDENTICAL to the Column-fold st_intersection_convex /
    st_union_convex — same vertices, same order, same counts — over
    the full geo04 parameter grid plus a containment case. The folds
    stay as the reference implementation; geo04 runs the Arrow path
    for its ~40x lower plan-compile cost."""
    from pg_datalake_spark.functions import spatial_arrow as SA

    rows = [
        (nk, 1.0 + (nk % 4) * 0.25, 1.5 + (nk % 4) * 0.25,
         float(nk % 7), float(nk * 3 % 5))
        for nk in range(25)
    ]
    base = spark.createDataFrame(rows, "nk int, h double, r double, cx double, cy double")
    h, r, cx, cy = F.col("h"), F.col("r"), F.col("cx"), F.col("cy")
    square = F.array(
        S.st_point(cx - h, cy - h), S.st_point(cx + h, cy - h),
        S.st_point(cx + h, cy + h), S.st_point(cx - h, cy + h),
    )
    diamond = F.array(
        S.st_point(cx + r, cy), S.st_point(cx, cy + r),
        S.st_point(cx - r, cy), S.st_point(cx, cy - r),
    )
    eighth = F.lit(0.125)
    small = F.array(
        S.st_point(cx + 0.25 - eighth, cy - 0.25 - eighth),
        S.st_point(cx + 0.25 + eighth, cy - 0.25 - eighth),
        S.st_point(cx + 0.25 + eighth, cy - 0.25 + eighth),
        S.st_point(cx + 0.25 - eighth, cy - 0.25 + eighth),
    )
    got = base.select(
        "nk",
        S.st_intersection_convex(diamond, square).alias("f_i"),
        SA.st_intersection_convex_arrow(diamond, square).alias("a_i"),
        S.st_union_convex(diamond, square).alias("f_u"),
        SA.st_union_convex_arrow(diamond, square).alias("a_u"),
        S.st_union_convex(diamond, small).alias("f_c"),
        SA.st_union_convex_arrow(diamond, small).alias("a_c"),
    ).collect()
    for row in got:
        for fold_col, arrow_col in (("f_i", "a_i"), ("f_u", "a_u"), ("f_c", "a_c")):
            fold = [(p["x"], p["y"]) for p in row[fold_col]]
            arrow = [(p["x"], p["y"]) for p in row[arrow_col]]
            assert fold == arrow, (row.nk, fold_col, fold, arrow)


def test_buffer_ring_capsule_and_spt_kernels(spark):
    """r9 GEOS-tail kernels: non-axis-aligned ring buffer (triangle —
    exterior angles are not multiples of the chord angle, exercising
    the ceil step count), capsule fail-loud on multi-segment lines,
    and SPT validity floor on a minimal ring."""
    import math

    from pg_datalake_spark.functions import spatial_arrow as SA

    df = spark.createDataFrame([(1,)], "id int")
    tri = F.array(
        S.st_point(F.lit(0.0), F.lit(0.0)),
        S.st_point(F.lit(4.0), F.lit(0.0)),
        S.st_point(F.lit(0.0), F.lit(3.0)),
    )
    r = 0.5
    got = df.select(
        SA.st_buffer_ring_arrow(tri, r, 8).alias("buf"),
        SA.st_simplifypreservetopology_arrow(tri, 100.0).alias("spt"),
    ).first()
    buf = [(p["x"], p["y"]) for p in got["buf"]]
    # exact expectations: area = A + P*r + (sum of corner fans);
    # the fans tile a full disc split at the three corners, each
    # approximated at chord angle <= pi/16, so area is within the
    # polygon-vs-circle gap of A + P*r + pi*r^2
    A, P = 6.0, 12.0
    sh = 0.5 * abs(
        sum(
            buf[i][0] * buf[(i + 1) % len(buf)][1]
            - buf[(i + 1) % len(buf)][0] * buf[i][1]
            for i in range(len(buf))
        )
    )
    assert A + P * r < sh < A + P * r + math.pi * r * r
    assert sh > A + P * r + math.pi * r * r * 0.98  # fans ~ disc
    # SPT on a triangle (already minimal): returned unchanged even at
    # huge tolerance — the validity guarantee
    assert [(p["x"], p["y"]) for p in got["spt"]] == [
        (0.0, 0.0), (4.0, 0.0), (0.0, 3.0)
    ]
    # capsule fail-loud on a 3-point line
    bent = F.array(
        S.st_point(F.lit(0.0), F.lit(0.0)),
        S.st_point(F.lit(1.0), F.lit(0.0)),
        S.st_point(F.lit(1.0), F.lit(1.0)),
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="single-segment"):
        df.select(SA.st_buffer_line_arrow(bent, 0.5, 2)).collect()


def test_erosion_buffer_inradius_guard(spark):
    """r9: negative-radius buffer (convex erosion) fails loud past the
    inradius instead of emitting an inverted ring; a triangle erodes to
    a similar triangle (vertex count preserved)."""
    from pg_datalake_spark.functions import spatial_arrow as SA

    df = spark.createDataFrame([(1,)], "id int")
    tri = F.array(
        S.st_point(F.lit(0.0), F.lit(0.0)),
        S.st_point(F.lit(8.0), F.lit(0.0)),
        S.st_point(F.lit(0.0), F.lit(6.0)),
    )
    # inradius of the 6-8-10 right triangle = (6+8-10)/2 = 2
    [r] = df.select(SA.st_buffer_ring_arrow(tri, -1.0, 4).alias("er")).collect()
    assert len(r.er) == 3
    xs = [(p.x, p.y) for p in r.er]
    assert (1.0, 1.0) in xs  # right-angle corner moves in by (1, 1)
    import pytest as _pytest

    with _pytest.raises(Exception, match="inradius"):
        df.select(SA.st_buffer_ring_arrow(tri, -3.0, 4)).collect()


# --- r10 GEOS-tail kernels: difference / overlaps / touches /
# point-on-surface / linemerge (functions/spatial_arrow.py) ---------------


def test_difference_convex_cases():
    from pg_datalake_spark.functions import spatial_arrow as SA

    A = [(0, 0), (2, 0), (2, 2), (0, 2)]
    # corner bite -> L-shape: area 3, perimeter-preserving, 6 vertices
    d = SA._difference_convex(A, [(1, 1), (3, 1), (3, 3), (1, 3)])
    assert SA._ring_area(d) == 3.0 and len(d) == 6
    # edge slice with NO subtrahend vertex inside A (B-chain empty)
    d2 = SA._difference_convex(A, [(1.0, 2.6), (2.6, 1.0), (4.0, 4.0)])
    assert abs(SA._ring_area(d2) - 3.92) < 1e-12 and len(d2) == 5
    # bite across the MIDDLE of an edge (both crossings on one A edge)
    d3 = SA._difference_convex(A, [(0.5, -0.5), (1.5, -0.5), (1.5, 0.5), (0.5, 0.5)])
    assert abs(SA._ring_area(d3) - 3.5) < 1e-12 and len(d3) == 8
    # disjoint -> identity; covered -> empty
    assert SA._difference_convex(A, [(5, 0), (7, 0), (7, 2), (5, 2)]) == A
    assert SA._difference_convex(A, [(-1, -1), (9, -1), (9, 9), (-1, 9)]) == []
    # strictly-contained subtrahend = HOLE -> still fails loud (the
    # single-ring model cannot represent it; the mring ops carry it)
    import pytest as _pt

    with _pt.raises(NotImplementedError, match="HOLE"):
        SA._difference_convex(A, [(0.5, 0.5), (1.0, 0.5), (1.0, 1.0), (0.5, 1.0)])
    # tangent configuration (crossing through A's corner): r12 routes
    # it through the planar-face arrangement instead of failing loud
    dt = SA._difference_convex(A, [(1.5, -0.5), (2.5, 0.5), (1.5, 1.5)])
    assert abs(SA._ring_area(dt) - 3.375) < 1e-12


def test_overlaps_touches_convex():
    from pg_datalake_spark.functions import spatial_arrow as SA

    A = [(0, 0), (2, 0), (2, 2), (0, 2)]
    assert SA._overlaps_convex(A, [(1, 1), (3, 1), (3, 3), (1, 3)]) is True
    assert SA._overlaps_convex(A, [(5, 0), (7, 0), (7, 2), (5, 2)]) is False
    # containment and equality are NOT overlaps (PostGIS)
    assert SA._overlaps_convex(A, [(0.5, 0.5), (1, 0.5), (1, 1), (0.5, 1)]) is False
    assert SA._overlaps_convex(A, A) is False
    # full shared edge = collinear span (segment-intersection denom 0)
    assert SA._touches_convex(A, [(2, 0), (4, 0), (4, 2), (2, 2)]) is True
    assert SA._touches_convex(A, [(2, 2), (3, 2), (3, 3), (2, 3)]) is True  # corner
    assert SA._touches_convex(A, [(1, 1), (3, 1), (3, 3), (1, 3)]) is False
    assert SA._touches_convex(A, [(5, 5), (6, 5), (6, 6), (5, 6)]) is False


def test_point_on_surface_deterministic():
    from pg_datalake_spark.functions import spatial_arrow as SA

    A = [(0, 0), (2, 0), (2, 2), (0, 2)]
    assert SA._point_on_surface(A) == (1.0, 1.0)
    # L-shape: mid-height grazes vertices + a horizontal edge -> the
    # kernel drops to the sub-interval midpoint, strictly inside
    L = SA._difference_convex(A, [(1, 1), (3, 1), (3, 3), (1, 3)])
    p = SA._point_on_surface(L)
    assert p == (1.0, 0.5)
    assert SA._contains(L, p)
    assert SA._point_on_surface([(0, 0), (1, 0)]) is None  # degenerate


def test_linemerge_paths_junctions_cycles():
    from pg_datalake_spark.functions import spatial_arrow as SA

    # path + disjoint segment
    assert SA._linemerge(
        [((0, 0), (1, 0)), ((1, 0), (1, 1)), ((2, 2), (3, 2))]
    ) == [[(0, 0), (1, 0), (1, 1)], [(2, 2), (3, 2)]]
    # degree-3 junction splits (GEOS semantics)
    assert len(
        SA._linemerge([((0, 0), (1, 1)), ((2, 0), (1, 1)), ((1, 1), (1, 2))])
    ) == 3
    # pure cycle closes on its smallest node
    (cyc,) = SA._linemerge([((0, 0), (1, 0)), ((1, 0), (1, 1)), ((1, 1), (0, 0))])
    assert cyc[0] == cyc[-1] == (0, 0) and len(cyc) == 4
    # reversed segment orientation merges the same
    assert SA._linemerge([((1, 0), (0, 0)), ((1, 0), (1, 1))]) == [
        [(0, 0), (1, 0), (1, 1)]
    ]


def test_makevalid_bowtie_and_guards():
    from pg_datalake_spark.functions import spatial_arrow as SA

    bow = [(0, 0), (2, 2), (2, 0), (0, 2)]  # diagonals cross at (1,1)
    lobes = SA._make_valid(bow)
    assert len(lobes) == 2
    assert sorted(SA._ring_area(l) for l in lobes) == [1.0, 1.0]
    for l in lobes:
        assert not SA._self_intersections(l)  # each lobe is simple
        assert SA._signed_area2(l) > 0  # CCW
    # valid ring: identity (one-element list containing itself)
    sq = [(0, 0), (2, 0), (2, 2), (0, 2)]
    assert SA._make_valid(sq) == [sq]
    assert SA._self_intersections(sq) == []
    # multi-crossing input decomposes into simple CCW faces (r11:
    # generalized — GEOS linework semantics, even-odd keep rule)
    star = [(0, 0), (4, 1), (0, 2), (4, 3), (2, -1)]
    assert len(SA._self_intersections(star)) == 2
    faces = SA._make_valid(star)
    assert len(faces) == 3
    for f in faces:
        assert not SA._self_intersections(f) and SA._signed_area2(f) > 0


def test_makevalid_pentagram_linework():
    """GEOS MakeValid(linework) on a pentagram: the five point
    triangles survive (winding 1), the doubly-wound center pentagon is
    dropped (even-odd) — each triangle area matches the closed form."""
    import math

    from pg_datalake_spark.functions import spatial_arrow as SA

    R = 2.0
    pts = [
        (
            R * math.cos(math.pi / 2 + 2 * math.pi * k / 5),
            R * math.sin(math.pi / 2 + 2 * math.pi * k / 5),
        )
        for k in range(5)
    ]
    star = [pts[(2 * k) % 5] for k in range(5)]
    assert len(SA._self_intersections(star)) == 5
    faces = SA._make_valid(star)
    assert len(faces) == 5
    # closed form: inner-pentagon circumradius r = R·sin(π/10)/sin(3π/10);
    # each point triangle has base = inner side, height = R − r·cos(π/5)
    r_in = R * math.sin(math.pi / 10) / math.sin(3 * math.pi / 10)
    s_in = 2 * r_in * math.sin(math.pi / 5)
    h = R - r_in * math.cos(math.pi / 5)
    want = s_in * h / 2
    for f in faces:
        assert abs(SA._ring_area(f) - want) < 1e-9
        assert not SA._self_intersections(f) and SA._signed_area2(f) > 0
    # zigzag ribbon with 2 properly-nested crossings -> 4 lobes
    z = [(0, 0), (1, 1), (2, 0), (3, 1), (3, 0), (2, 1), (1, 0), (0, 1)]
    assert sorted(round(SA._ring_area(f), 9) for f in SA._make_valid(z)) == [
        0.25,
        0.25,
        0.5,
        0.5,
    ]


def test_general_boolean_ops_concave_and_random_crosscheck():
    """r10: Greiner–Hormann general clip. Planted concave shapes pin
    multi-ring outputs and hole orientation; 400 random convex pairs
    cross-check intersection against the INDEPENDENT Sutherland–
    Hodgman kernel and union/difference against the area identities."""
    import math
    import random

    from pg_datalake_spark.functions import spatial_arrow as SA

    def sa(rings):
        return sorted(round(SA._signed_area2(r) / 2, 9) for r in rings)

    U = [(0, 0), (6, 0), (6, 4), (4, 4), (4, 1), (2, 1), (2, 4), (0, 4)]
    BAR = [(-1, 2), (7, 2), (7, 3), (-1, 3)]
    assert sa(SA._gh_clip(U, BAR, "and")) == [2.0, 2.0]  # two arm slices
    uu = sa(SA._gh_clip(U, BAR, "or"))
    assert uu == [-2.0, 24.0] and sum(uu) == 22.0  # CW hole + CCW outer
    dd = sa(SA._gh_clip(U, BAR, "sub"))
    assert dd == [2.0, 2.0, 10.0] and sum(dd) == 14.0  # three pieces
    # concave subject against a convex clip
    L = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]
    SQ = [(0.5, 0.5), (3, 0.5), (3, 3), (0.5, 3)]
    assert sa(SA._gh_clip(L, SQ, "and")) == [1.25]
    assert abs(sum(sa(SA._gh_clip(L, SQ, "sub"))) - 1.75) < 1e-9
    # containment / disjoint short-circuits
    SM = [(1.2, 0.2), (1.8, 0.2), (1.8, 0.8), (1.2, 0.8)]
    assert sa(SA._gh_clip(L, SM, "and")) == [round(SA._ring_area(SM), 9)]
    DIS = [(10, 10), (11, 10), (11, 11), (10, 11)]
    assert SA._gh_clip(L, DIS, "and") == []
    assert sum(sa(SA._gh_clip(L, DIS, "or"))) == 4.0  # both rings, no hole
    import pytest as _pt

    # strictly-contained subtrahend: outer + CW hole (r11 — was fail-loud)
    hole_out = SA._gh_clip(L, SM, "sub")
    assert sa(hole_out) == sorted(
        [round(-SA._ring_area(SM), 9), round(SA._ring_area(SA._ccw(L)), 9)]
    )
    # shared collinear edge (r12 — previously fail-loud): the faces
    # fallback nodes the collinear overlap and merges across it
    shared = SA._gh_clip(L, [(2, 0), (4, 0), (4, 2), (2, 2)], "or")
    assert len(shared) == 1 and abs(sum(sa(shared)) - 7.0) < 1e-9

    # self-intersecting input = garbage-in: guarded, points at makevalid
    with _pt.raises(ValueError, match="self-intersecting"):
        SA._gh_clip([(0, 0), (2, 2), (2, 0), (0, 2)], SQ, "and")

    random.seed(7)

    def rand_convex(cx, cy, r, k):
        angs = sorted(random.uniform(0, 2 * math.pi) for _ in range(k))
        return [(cx + r * math.cos(a), cy + r * math.sin(a)) for a in angs]

    checked = 0
    for _ in range(400):
        P = rand_convex(0, 0, 2.0, random.randint(3, 8))
        Q = rand_convex(
            random.uniform(-1.5, 1.5), random.uniform(-1.5, 1.5), 2.0,
            random.randint(3, 8),
        )
        try:
            a_gh = sum(SA._signed_area2(r) / 2 for r in SA._gh_clip(P, Q, "and"))
            a_un = sum(SA._signed_area2(r) / 2 for r in SA._gh_clip(P, Q, "or"))
            a_df = sum(SA._signed_area2(r) / 2 for r in SA._gh_clip(P, Q, "sub"))
        except NotImplementedError:
            continue  # vertex-grazing random pair: out of clean-crossing scope
        a_sh = SA._ring_area(SA._sh_clip(P, Q))
        aP, aQ = SA._ring_area(P), SA._ring_area(Q)
        assert abs(a_gh - a_sh) < 1e-9
        assert abs(a_un - (aP + aQ - a_sh)) < 1e-9
        assert abs(a_df - (aP - a_sh)) < 1e-9
        checked += 1
    assert checked > 350  # degenerate skips must stay rare

    # CONCAVE sweep: random star-shaped (one radius per sorted angle ->
    # always simple, usually concave) pairs must satisfy the boolean
    # area identities across all three ops — internal consistency no
    # single-op bug can fake
    def rand_star(cx, cy, k):
        angs = sorted(random.uniform(0, 2 * math.pi) for _ in range(k))
        out = []
        for a in angs:
            r = random.uniform(0.5, 2.5)
            out.append((cx + r * math.cos(a), cy + r * math.sin(a)))
        return out

    checked_cc = 0
    for _ in range(300):
        P = rand_star(0, 0, random.randint(5, 10))
        Q = rand_star(
            random.uniform(-1.5, 1.5), random.uniform(-1.5, 1.5),
            random.randint(5, 10),
        )
        try:
            ai = sum(SA._signed_area2(r) / 2 for r in SA._gh_clip(P, Q, "and"))
            au = sum(SA._signed_area2(r) / 2 for r in SA._gh_clip(P, Q, "or"))
            ad = sum(SA._signed_area2(r) / 2 for r in SA._gh_clip(P, Q, "sub"))
            ad2 = sum(SA._signed_area2(r) / 2 for r in SA._gh_clip(Q, P, "sub"))
        except (NotImplementedError, ValueError, RuntimeError):
            continue  # degenerate contact fails loud, never silently wrong
        aP, aQ = SA._ring_area(P), SA._ring_area(Q)
        assert ai >= -1e-9
        assert abs(au - (aP + aQ - ai)) < 1e-9
        assert abs(ad - (aP - ai)) < 1e-9
        assert abs(ad2 - (aQ - ai)) < 1e-9
        checked_cc += 1
    assert checked_cc > 230  # loud-fail skips must stay the minority


def test_curve_tier_edge_cases(spark):
    """Curve tier (r10 tail): full-circle arcs (p0 == p2 → sweep ±2π),
    CW vs CCW sweep by the interior point's side, collinear → null,
    and st_curvetoline ≡ st_curvetoline_from over staged params."""
    import math

    from pyspark.sql import functions as F

    from pg_datalake_spark.functions import spatial as S

    df = spark.range(1).select(
        F.lit(2.0).alias("cx"), F.lit(3.0).alias("cy"), F.lit(1.5).alias("r")
    )
    cx, cy, r = F.col("cx"), F.col("cy"), F.col("r")
    full = S.st_circularstring(
        S.st_point(cx + r, cy), S.st_point(cx - r, cy), S.st_point(cx + r, cy)
    )
    ccw = S.st_circularstring(
        S.st_point(cx + r, cy), S.st_point(cx, cy + r), S.st_point(cx - r, cy)
    )
    cw = S.st_circularstring(
        S.st_point(cx + r, cy), S.st_point(cx, cy - r), S.st_point(cx - r, cy)
    )
    col = S.st_circularstring(
        S.st_point(cx, cy), S.st_point(cx + 1, cy), S.st_point(cx + 2, cy)
    )
    [row] = df.select(
        S.st_curvetoline(full, 8).alias("full"),
        S.st_length_circular(full).alias("full_len"),
        S.st_arc_params(ccw)["sweep"].alias("ccw_sweep"),
        S.st_arc_params(cw)["sweep"].alias("cw_sweep"),
        S.st_curvetoline(col, 8).alias("col"),
        S.st_length_circular(col).alias("col_len"),
        S.st_curvetoline_from(S.st_arc_params(ccw), 8).alias("from_staged"),
        S.st_curvetoline(ccw, 8).alias("direct"),
    ).collect()
    # full circle: 9 samples, closed, length 2πr
    assert len(row.full) == 9
    assert abs(row.full[0].x - row.full[8].x) < 1e-9
    assert abs(row.full_len - 2 * math.pi * 1.5) < 1e-9
    # sweep signs: north interior → CCW (+π), south → CW (−π)
    assert abs(row.ccw_sweep - math.pi) < 1e-9
    assert abs(row.cw_sweep + math.pi) < 1e-9
    # collinear has no circumcircle
    assert row.col is None and row.col_len is None
    # staged-params and direct forms are value-identical
    assert [(p.x, p.y) for p in row.from_staged] \
        == [(p.x, p.y) for p in row.direct]


# --- r11: multi-ring geometry model (holes / MULTIPOLYGON) -----------------


def _sq(x0, y0, s):
    return [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s)]


def _cw(r):
    return list(reversed(r))


def test_mring_area_perimeter_contains():
    from pg_datalake_spark.functions import spatial_arrow as SA

    ann = [_sq(0, 0, 10), _cw(_sq(3, 3, 4))]  # 10x10 with 4x4 hole
    assert SA._mring_area(ann) == 84.0
    assert SA._mring_perimeter(ann) == 56.0
    assert SA._mring_contains(ann, (5, 5)) is False  # in the hole
    assert SA._mring_contains(ann, (1, 1)) is True
    # MULTIPOLYGON: two disjoint squares
    mp = [_sq(0, 0, 2), _sq(5, 0, 2)]
    assert SA._mring_area(mp) == 8.0
    assert SA._mring_contains(mp, (6, 1)) is True
    assert SA._mring_contains(mp, (3.5, 1)) is False


def test_mring_boolean_ops_closed_forms():
    from pg_datalake_spark.functions import spatial_arrow as SA

    ann = [_sq(0, 0, 10), _cw(_sq(3, 3, 4))]
    # intersection with a square that covers the hole entirely
    inter = SA._mring_op(ann, [_sq(2, 2, 6)], "and")
    assert SA._mring_area(inter) == 20.0  # 36 − 16
    assert SA._mring_contains(inter, (5, 5)) is False
    assert SA._mring_contains(inter, (2.5, 2.5)) is True
    # difference: bite strictly inside the solid part -> extra hole
    diff = SA._mring_op(ann, [_sq(1, 1, 1)], "sub")
    assert SA._mring_area(diff) == 83.0 and len(diff) == 3
    # subtracting an ANNULUS adds back its hole: sq ∖ ann2
    ann2 = [_sq(4, 4, 10), _cw(_sq(6, 6, 2))]
    e = SA._mring_op([_sq(0, 0, 10)], ann2, "sub")
    assert SA._mring_area(e) == 68.0  # 100 − 36 + 4
    # union of two annuli: disjoint -> concatenation (4 rings)
    ann_b = [_sq(20, 0, 10), _cw(_sq(23, 3, 4))]
    u = SA._mring_op(ann, ann_b, "or")
    assert SA._mring_area(u) == 168.0 and len(u) == 4
    # normal form: outers CCW, holes CW
    assert sorted(SA._signed_area2(r) > 0 for r in u) == [
        False,
        False,
        True,
        True,
    ]


def test_mring_union_hole_survival():
    """Union hole algebra: a hole survives where the OTHER polygon
    doesn't cover it — filled / kept / shrunk / hole∩hole cases."""
    from pg_datalake_spark.functions import spatial_arrow as SA

    Q = [_sq(4, -1, 6), _cw(_sq(7, 0, 2))]
    # both holes outside the other polygon -> both survive
    p = [_sq(0, 0, 6), _cw(_sq(1, 1, 1))]
    assert SA._mring_area(SA._mring_op(p, Q, "or")) == 57.0
    # P's hole covered by Q's interior -> filled
    p2 = [_sq(0, 0, 6), _cw(_sq(4.5, 1, 1))]
    assert SA._mring_area(SA._mring_op(p2, Q, "or")) == 58.0
    # P's hole straddles Q's boundary -> shrinks to the uncovered part
    p3 = [_sq(0, 0, 6), _cw(_sq(3.5, 1, 1))]
    assert SA._mring_area(SA._mring_op(p3, Q, "or")) == 57.5
    # overlapping holes: Ah ∩ Bh survives as the union's hole
    pa = [_sq(0, 0, 6), _cw(_sq(2, 2, 2))]
    qa = [_sq(1, -1, 6), _cw(_sq(2.5, 2.5, 2))]
    assert SA._mring_area(SA._mring_op(pa, qa, "or")) == 44.75


def test_mring_multipolygon_ops():
    from pg_datalake_spark.functions import spatial_arrow as SA
    import pytest as _pt

    mp = [_sq(0, 0, 2), _sq(5, 0, 2)]
    y = SA._mring_op(mp, [_sq(1, -1, 5.5)], "and")
    assert SA._mring_area(y) == 5.0 and len(y) == 2
    # disjoint third component concatenates; overlapping pair merges
    assert SA._mring_area(SA._mring_op(mp, [_sq(10, 0, 3)], "or")) == 17.0
    assert SA._mring_area(SA._mring_op(mp, [_sq(1, 1, 2)], "or")) == 11.0
    # a bridge overlapping BOTH components: the r11 planar-face N-way
    # union resolves the cascade for hole-free inputs
    # (4 + 4 + 25 − 1.5 − 1.5)
    bridged = SA._mring_op(mp, [_sq(1, 0.5, 5)], "or")
    assert SA._mring_area(bridged) == 30.0 and len(bridged) == 1
    # holed cascade (r12 — previously fail-loud): the planar-face
    # fallback carries it; the hole survives where B doesn't cover it
    # (7.75 + 25 − overlap 3.5 = 29.25; the 0.25 hole touches B at x=1)
    mph = [_sq(0, 0, 2), _sq(5, 0, 2), _cw(_sq(0.5, 0.5, 0.5))]
    cascaded = SA._mring_op(mph, [_sq(1, 0.25, 5)], "or")
    assert SA._mring_area(cascaded) == 29.25 and len(cascaded) == 2


def test_mring_normalize_cancels_pairs():
    from pg_datalake_spark.functions import spatial_arrow as SA

    s = _sq(1, 1, 2)
    # identical CCW/CW pair encloses nothing -> cancelled
    out = SA._mring_normalize([_sq(0, 0, 10), s, _cw(s)])
    assert len(out) == 1 and SA._mring_area(out) == 100.0
    # rotated copy still cancels (canonical cycle key)
    rot = s[2:] + s[:2]
    out2 = SA._mring_normalize([_sq(0, 0, 10), rot, _cw(s)])
    assert len(out2) == 1


def test_buffer_polyline_general():
    """r11: GENERAL multi-segment line buffer (the last named hole of
    the delegated-GEOS buffer family) — per-segment capsules merged by
    the planar-face N-way union. Pinned against the INDEPENDENT
    Sutherland–Hodgman kernel by inclusion-exclusion (capsules are
    convex), the collinear pre-merge, a non-grid turn angle, and the
    closed-loop cavity emitted as a CW hole."""
    import math

    import pytest as _pt

    from pg_datalake_spark.functions import spatial_arrow as SA

    # right-angle L: union area == incl-excl with SH intersection
    g = SA._buffer_polyline([(0, 0), (10, 0), (10, 10)], 1.0, 8)
    c1 = SA._ccw(SA._buffer_line_capsule([(0, 0), (10, 0)], 1.0, 8))
    c2 = SA._ccw(SA._buffer_line_capsule([(10, 0), (10, 10)], 1.0, 8))
    want = (
        SA._ring_area(c1) + SA._ring_area(c2)
        - SA._ring_area(SA._sh_clip(c1, c2))
    )
    assert len(g) == 1 and abs(SA._mring_area(g) - want) < 1e-9

    # exactly-collinear run pre-merges into one capsule
    g2 = SA._buffer_polyline([(0, 0), (5, 0), (10, 0)], 1.0, 8)
    cap = SA._ccw(SA._buffer_line_capsule([(0, 0), (10, 0)], 1.0, 8))
    assert len(g2) == 1
    assert abs(SA._mring_area(g2) - SA._ring_area(cap)) < 1e-12

    # 30° turn: fan vertices at non-grid angles (transversal crossings)
    t = [(0, 0), (5, 0),
         (5 + 4 * math.cos(math.radians(30)), 4 * math.sin(math.radians(30)))]
    g3 = SA._buffer_polyline(t, 0.7, 8)
    assert len(g3) == 1 and SA._mring_area(g3) > 0

    # closed square path: the enclosed cavity is a CW hole; even-odd
    # containment sees the stroke but not the cavity
    sq = [(0, 0), (8, 0), (8, 8), (0, 8), (0, 0.0001)]
    g4 = SA._buffer_polyline(sq, 0.5, 8)
    signs = sorted(SA._signed_area2(r) > 0 for r in g4)
    assert len(g4) == 2 and signs == [False, True]
    assert SA._mring_contains(g4, (4.0, 0.0)) is True   # on the stroke
    assert SA._mring_contains(g4, (4.0, 4.0)) is False  # in the cavity

    # guards
    with _pt.raises(ValueError, match="positive radius"):
        SA._buffer_polyline([(0, 0), (1, 0)], -1.0)
    with _pt.raises(ValueError, match=">= 2 points"):
        SA._buffer_polyline([(0, 0)], 1.0)


def test_union_rings_via_faces_tangent_contacts():
    """The face-union path handles every configuration the pairwise GH
    kernel rejects — including (r12) corner-only touches, which used to
    fail loud as pinch points: the boundary re-polygonization walks
    through a degree-4 vertex angularly, emitting the two touching
    squares as two CCW outer rings."""
    from pg_datalake_spark.functions import spatial_arrow as SA

    # overlapping squares sharing crossing edges -> one outline
    u = SA._union_rings_via_faces(
        [[(0, 0), (4, 0), (4, 4), (0, 4)], [(2, 2), (6, 2), (6, 6), (2, 6)]]
    )
    assert len(u) == 1 and SA._mring_area(u) == 28.0
    # identical duplicate rings dedupe to the ring itself
    sq = [(0, 0), (4, 0), (4, 4), (0, 4)]
    u2 = SA._union_rings_via_faces([sq, list(sq)])
    assert SA._mring_area(u2) == 16.0
    # corner-touching squares (r12 — previously fail-loud): both kept
    u3 = SA._union_rings_via_faces([sq, [(4, 4), (8, 4), (8, 8), (4, 8)]])
    assert SA._mring_area(u3) == 32.0 and len(u3) == 2
    u4 = SA._union_rings_via_faces([sq, [(4, 4), (8, 5), (8, 8), (5, 8)]])
    assert SA._mring_area(u4) == 16.0 + SA._ring_area(
        [(4, 4), (8, 5), (8, 8), (5, 8)]
    )


def test_mring_ops_random_inclusion_exclusion():
    """Property check for the multi-ring boolean ops: on random CONVEX
    pairs (via the INDEPENDENT Sutherland–Hodgman kernel for the
    reference intersection), area(A∪B) = areaA + areaB − area(A∩B)
    and area(A∖B) = areaA − area(A∩B), with even-odd point containment
    agreeing with the set algebra on random probes."""
    import math
    import random

    from pg_datalake_spark.functions import spatial_arrow as SA

    random.seed(11)

    def rand_convex(cx, cy, r, k):
        angs = sorted(random.uniform(0, 2 * math.pi) for _ in range(k))
        return [(cx + r * math.cos(a), cy + r * math.sin(a)) for a in angs]

    checked = 0
    for _ in range(200):
        A = [rand_convex(0, 0, 2.0, random.randint(4, 8))]
        B = [rand_convex(random.uniform(-1.5, 1.5),
                         random.uniform(-1.5, 1.5), 2.0,
                         random.randint(4, 8))]
        try:
            inter = SA._mring_op(A, B, "and")
            union = SA._mring_op(A, B, "or")
            diff = SA._mring_op(A, B, "sub")
        except NotImplementedError:
            continue  # degenerate contact — fail-loud path, not wrong
        ia = SA._mring_area(inter)
        ref_i = SA._ring_area(SA._sh_clip(A[0], B[0]))
        assert abs(ia - ref_i) < 1e-9
        aa, ab = SA._ring_area(A[0]), SA._ring_area(B[0])
        assert abs(SA._mring_area(union) - (aa + ab - ia)) < 1e-9
        assert abs(SA._mring_area(diff) - (aa - ia)) < 1e-9
        # even-odd containment agrees with the set algebra on probes
        for _p in range(10):
            p = (random.uniform(-4, 4), random.uniform(-4, 4))
            in_a, in_b = SA._contains(A[0], p), SA._contains(B[0], p)
            assert SA._mring_contains(inter, p) == (in_a and in_b)
            assert SA._mring_contains(union, p) == (in_a or in_b)
            assert SA._mring_contains(diff, p) == (in_a and not in_b)
        checked += 1
    assert checked >= 150  # degenerate-contact skips must stay rare


def test_makevalid_random_even_odd_area():
    """Property check for the generalized makevalid: on random
    self-crossing closed polylines, the output faces are simple, CCW,
    disjoint, and their total area equals the Monte-Carlo even-odd
    area of the original boundary (the linework rule)."""
    import random

    from pg_datalake_spark.functions import spatial_arrow as SA

    random.seed(23)
    done = 0
    while done < 12:
        ring = [
            (random.uniform(0, 10), random.uniform(0, 10)) for _ in range(7)
        ]
        xs = SA._self_intersections(ring)
        if not xs:
            continue
        try:
            faces = SA._make_valid(ring)
        except Exception:
            continue  # exotic degeneracy
        if not faces:
            continue
        for f in faces:
            assert not SA._self_intersections(f)
            assert SA._signed_area2(f) > 0
        total = sum(SA._ring_area(f) for f in faces)
        hits, n = 0, 4000
        for _ in range(n):
            p = (random.uniform(0, 10), random.uniform(0, 10))
            if SA._contains(ring, p):
                hits += 1
        mc = hits / n * 100.0
        sigma = 100.0 * ((hits / n) * (1 - hits / n) / n) ** 0.5
        assert abs(total - mc) < max(5 * sigma, 1.0), (total, mc)
        done += 1


def test_boolean_via_faces_tangent_edge_contact_tier():
    """r12 GEOS-residue closure: tangent, shared-edge, pinch-point and
    collinear-partial-overlap boolean configurations — every case the
    pairwise fast paths used to reject — resolved by the planar-face
    arrangement (_boolean_via_faces), with hole/island structure intact
    (signed areas sum to the true covered area)."""
    from pg_datalake_spark.functions import spatial_arrow as SA

    def area(rings):
        return sum(SA._signed_area2(r) / 2 for r in rings)

    def sq(x, y, s):
        return [(x, y), (x + s, y), (x + s, y + s), (x, y + s)]

    A = sq(0, 0, 2)
    # shared full edge: merges across the collinear span
    assert area(SA._gh_clip(A, sq(2, 0, 2), "or")) == 8.0
    assert SA._gh_clip(A, sq(2, 0, 2), "and") == []
    assert area(SA._gh_clip(A, sq(2, 0, 2), "sub")) == 4.0
    # corner-only touch: two outers
    u = SA._gh_clip(A, sq(2, 2, 2), "or")
    assert area(u) == 8.0 and len(u) == 2
    # collinear PARTIAL edge overlap
    B2 = [(1, 0), (3, 0), (3, 2), (1, 2)]
    assert area(SA._gh_clip(A, B2, "or")) == 6.0
    assert area(SA._gh_clip(A, B2, "and")) == 2.0
    assert area(SA._gh_clip(A, B2, "sub")) == 2.0
    # subtrahend tangent to the boundary from inside: pinched region,
    # one self-touching ring of area 3.5
    diamond = [(1.0, 0.0), (1.5, 0.5), (1.0, 1.0), (0.5, 0.5)]
    s = SA._boolean_via_faces([A], [diamond], "sub")
    assert len(s) == 1 and area(s) == 3.5
    # strictly-contained subtrahend through the mring path: outer + CW hole
    s2 = SA._boolean_via_faces([A], [sq(0.5, 0.5, 0.5)], "sub")
    assert len(s2) == 2 and area(s2) == 3.75
    # island-in-hole union: three rings, CCW/CW/CCW by nesting parity
    ann = [sq(0, 0, 2), list(reversed(sq(0.5, 0.5, 1.0)))]
    isl = SA._boolean_via_faces(ann, [sq(0.75, 0.75, 0.25)], "or")
    assert len(isl) == 3 and abs(area(isl) - 3.0625) < 1e-12
    # double-bite (concave subtrahend) through the single-ring wrapper
    bite = [(0.25, -0.5), (1.75, -0.5), (1.75, 0.75), (1.25, 0.75),
            (1.25, -0.25), (0.75, -0.25), (0.75, 0.75), (0.25, 0.75)]
    d = SA._difference_convex(A, bite)
    assert abs(SA._ring_area(d) - 3.25) < 1e-12
    # identical rings: and/or = self, sub = empty
    assert area(SA._gh_clip(A, A, "and")) == 4.0
    assert area(SA._gh_clip(A, A, "or")) == 4.0
    assert SA._gh_clip(A, A, "sub") == []


def test_boolean_via_faces_lattice_differential():
    """600 integer-lattice square pairs — tangencies and shared edges
    everywhere — against the closed-form rectangle overlap: the
    gh_clip fast path + faces fallback must be exact on all three ops."""
    import random

    from pg_datalake_spark.functions import spatial_arrow as SA

    def area(rings):
        return sum(SA._signed_area2(r) / 2 for r in rings)

    def sq(x, y, s):
        return [(x, y), (x + s, y), (x + s, y + s), (x, y + s)]

    random.seed(3)
    for _ in range(600):
        x, y, s = random.randint(0, 4), random.randint(0, 4), random.randint(1, 3)
        u, v, t = random.randint(0, 4), random.randint(0, 4), random.randint(1, 3)
        P, Q = sq(x, y, s), sq(u, v, t)
        ix = max(0, min(x + s, u + t) - max(x, u))
        iy = max(0, min(y + s, v + t) - max(y, v))
        inter = ix * iy
        assert abs(area(SA._gh_clip(P, Q, "and")) - inter) < 1e-9
        assert abs(area(SA._gh_clip(P, Q, "or")) - (s * s + t * t - inter)) < 1e-9
        assert abs(area(SA._gh_clip(P, Q, "sub")) - (s * s - inter)) < 1e-9
