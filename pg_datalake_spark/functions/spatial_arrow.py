"""Arrow-batched kernels for the heaviest convex-geometry operators.

The Column-fold versions in :mod:`pg_datalake_spark.functions.spatial`
(``st_intersection_convex`` / ``st_union_convex``) are exact and fully
codegen'd, but their expression TREES are enormous: the Sutherland–
Hodgman fold re-embeds the evolving ring per clip edge and Catalyst
pays for it twice — geo04's plan measured ~41 s to BUILD + ~41 s to
execute at sf0.01 for 25 output rows, a pure plan/codegen constant
(r8 verdict, "What's wrong" #3). That cost is constant in data, so it
is not a 100 TB scaling bug — but a minute of driver-side Catalyst
work per query is real latency and flirts with codegen-size fallbacks.

This module is the measured escape hatch (precedent: true DP
st_simplify, the module's one pre-existing pandas-UDF op): the SAME
algorithms, step for step and formula for formula, evaluated per row
in an Arrow-batched pandas UDF. Per-row geometry on a handful of ring
vertices is exactly what the reference runs natively in GEOS
(pg_lake_engine/src/pgduck/shippable_spatial_functions.c
ST_Intersection / ST_Union); the fold versions remain exported as the
reference implementations, and
tests/test_spatial.py::test_convex_arrow_matches_fold pins
fold == arrow on the full geo04 parameter grid.

Formula parity matters even under round(6) hashing: every predicate
(cross ≥ 0, denom ≠ 0, t/u ∈ [0,1]) and every arithmetic expression
here mirrors the Column version exactly, in IEEE doubles, including
emission order — so vertex COUNTS (st_npoints, hashed un-rounded)
and boundary decisions are bit-identical, not merely close.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_RING_T = "array<struct<x:double,y:double>>"

Pt = tuple[float, float]


def _closed_edges(ring: list[Pt]) -> list[tuple[Pt, Pt]]:
    n = len(ring)
    return [(ring[i], ring[(i + 1) % n]) for i in range(n)]


def _signed_area2(ring: list[Pt]) -> float:
    return sum(a[0] * b[1] - b[0] * a[1] for a, b in _closed_edges(ring))


def _ccw(ring: list[Pt]) -> list[Pt]:
    return list(reversed(ring)) if _signed_area2(ring) < 0 else ring


def _cross(o: Pt, a: Pt, b: Pt) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _line_intersection(a1: Pt, a2: Pt, b1: Pt, b2: Pt) -> Pt:
    rx, ry = a2[0] - a1[0], a2[1] - a1[1]
    sx, sy = b2[0] - b1[0], b2[1] - b1[1]
    denom = rx * sy - ry * sx
    t = ((b1[0] - a1[0]) * sy - (b1[1] - a1[1]) * sx) / denom
    return (a1[0] + t * rx, a1[1] + t * ry)


def _segment_intersection(a1: Pt, a2: Pt, b1: Pt, b2: Pt) -> Pt | None:
    rx, ry = a2[0] - a1[0], a2[1] - a1[1]
    sx, sy = b2[0] - b1[0], b2[1] - b1[1]
    denom = rx * sy - ry * sx
    if denom == 0:
        return None
    qpx, qpy = b1[0] - a1[0], b1[1] - a1[1]
    t = (qpx * sy - qpy * sx) / denom
    u = (qpx * ry - qpy * rx) / denom
    if 0 <= t <= 1 and 0 <= u <= 1:
        return (a1[0] + t * rx, a1[1] + t * ry)
    return None


def _contains(ring: list[Pt], p: Pt) -> bool:
    """Ray cast, mirroring spatial.st_contains: upward ray, edge spans
    the point's y, intersection x strictly right of the point."""
    px, py = p
    hits = 0
    for (ax, ay), (bx, by) in _closed_edges(ring):
        if (ay > py) != (by > py):
            xint = ax + (bx - ax) * (py - ay) / (by - ay)
            if px < xint:
                hits += 1
    return hits % 2 == 1


def _sh_clip(subject: list[Pt], clip: list[Pt]) -> list[Pt]:
    """Sutherland–Hodgman, identical emission order to the fold:
    in→in emits the endpoint, in→out the crossing, out→in the crossing
    then the endpoint; a ring degenerated below 3 points clips to []."""
    ring = _ccw(subject)
    for e_a, e_b in _closed_edges(_ccw(clip)):
        if len(ring) < 3:
            return []
        out: list[Pt] = []
        for r_a, r_b in _closed_edges(ring):
            ca = _cross(e_a, e_b, r_a)
            cb = _cross(e_a, e_b, r_b)
            if ca >= 0 and cb >= 0:
                out.append(r_b)
            elif ca >= 0 > cb:
                out.append(_line_intersection(r_a, r_b, e_a, e_b))
            elif ca < 0 <= cb:
                out.append(_line_intersection(r_a, r_b, e_a, e_b))
                out.append(r_b)
        ring = out
    return ring if len(ring) >= 3 else []


def _star_union(a: list[Pt], b: list[Pt]) -> list[Pt]:
    """Star-shaped merge of two OVERLAPPING convex rings, mirroring
    spatial.st_union_convex: angular sort — around the centroid of the
    shared region's witness points — of {vertices of each ring not
    inside the other} ∪ {edge-pair crossings}."""
    aa, bb = _ccw(a), _ccw(b)
    crossings: list[Pt] = []
    for e1a, e1b in _closed_edges(aa):
        for e2a, e2b in _closed_edges(bb):
            p = _segment_intersection(e1a, e1b, e2a, e2b)
            if p is not None:
                crossings.append(p)
    if len(crossings) >= 2:
        shared = (
            [p for p in aa if _contains(bb, p)]
            + [p for p in bb if _contains(aa, p)]
            + crossings
        )
        cx = sum(p[0] for p in shared) / len(shared)
        cy = sum(p[1] for p in shared) / len(shared)
        pts: list[Pt] = []
        seen: set[Pt] = set()
        for p in (
            [p for p in aa if not _contains(bb, p)]
            + [p for p in bb if not _contains(aa, p)]
            + crossings
        ):
            if p not in seen:
                seen.add(p)
                pts.append(p)
        return [
            p
            for _t, _d, p in sorted(
                (
                    math.atan2(p[1] - cy, p[0] - cx),
                    (p[0] - cx) * (p[0] - cx) + (p[1] - cy) * (p[1] - cy),
                    p,
                )
                for p in pts
            )
        ]
    if all(_contains(aa, p) for p in bb):
        return aa
    if all(_contains(bb, p) for p in aa):
        return bb
    raise ValueError(
        "st_union_convex: disjoint rings produce a MULTIPOLYGON"
        " — unsupported (collect parts with st_collect)"
    )


def _to_pts(ring) -> list[Pt]:
    return [(float(p["x"]), float(p["y"])) for p in ring]


def _to_rows(ring: list[Pt]) -> list[dict]:
    return [{"x": x, "y": y} for x, y in ring]


# --- GEOS-tail ops (r9): buffer on lines/polygons + topology-safe DP ------
# Reference surface: pg_lake_engine/src/pgduck/
# shippable_spatial_functions.c (ST_Buffer on non-point geometry,
# ST_SimplifyPreserveTopology) — previously listed as the delegated
# GEOS tail; these close the polyline-capsule and convex-ring cases
# with closed-form-checkable constructions (geo12).


def _unit(dx: float, dy: float) -> Pt:
    h = math.hypot(dx, dy)
    return (dx / h, dy / h)


def _buffer_convex_ring(ring: list[Pt], r: float, quad_segs: int) -> list[Pt]:
    """Buffer of a CONVEX ring (PostGIS ST_Buffer with quad_segs).

    Positive r (dilation): every edge offsets outward by r, every
    vertex joins with a circular-arc fan whose chord angle is
    π/(2·quad_segs). The emitted polygon decomposes EXACTLY into
    original ring + edge strips + vertex fans, so area/perimeter have
    closed forms the geo12 oracle states directly.

    Negative r (EROSION): Minkowski erosion of a convex polygon is the
    intersection of its inward-translated edge half-planes — each new
    vertex is the line intersection of its two adjacent offset edges
    (no arcs; vertex count is preserved). |r| past the inradius would
    invert the polygon — fail loud, never emit a bowtie."""
    ring = _ccw(ring)
    if r < 0:
        n = len(ring)
        out: list[Pt] = []
        dirs: list[Pt] = []
        for i in range(n):
            prev, cur, nxt = ring[(i - 1) % n], ring[i], ring[(i + 1) % n]
            din = _unit(cur[0] - prev[0], cur[1] - prev[1])
            dout = _unit(nxt[0] - cur[0], nxt[1] - cur[1])
            dirs.append(dout)
            # outward normal (dy,-dx); r < 0 translates edges inward
            p1 = (prev[0] + r * din[1], prev[1] - r * din[0])
            p2 = (cur[0] + r * din[1], cur[1] - r * din[0])
            q1 = (cur[0] + r * dout[1], cur[1] - r * dout[0])
            q2 = (nxt[0] + r * dout[1], nxt[1] - r * dout[0])
            out.append(_line_intersection(p1, p2, q1, q2))
        # past the inradius the polygon INVERTS — the reflected shape is
        # still convex-CCW, so orientation checks miss it; the telltale
        # is an eroded edge running AGAINST its source edge's direction
        for i in range(n):
            e = (out[(i + 1) % n][0] - out[i][0], out[(i + 1) % n][1] - out[i][1])
            if e[0] * dirs[i][0] + e[1] * dirs[i][1] <= 0:
                raise ValueError(
                    f"st_buffer_ring_arrow: erosion radius {r} exceeds the "
                    "ring's inradius (result would invert)"
                )
        return out
    n = len(ring)
    step_max = math.pi / (2 * quad_segs)
    out: list[Pt] = []
    for i in range(n):
        prev, cur, nxt = ring[(i - 1) % n], ring[i], ring[(i + 1) % n]
        din = _unit(cur[0] - prev[0], cur[1] - prev[1])
        dout = _unit(nxt[0] - cur[0], nxt[1] - cur[1])
        # outward normal of a CCW ring's edge is the RIGHT normal (dy,-dx)
        a1 = math.atan2(-din[0], din[1])
        a2 = math.atan2(-dout[0], dout[1])
        delta = a2 - a1
        while delta < 0:  # CCW ring: exterior angle in (0, pi)
            delta += 2 * math.pi
        steps = max(1, math.ceil(delta / step_max - 1e-12))
        for j in range(steps + 1):
            a = a1 + delta * j / steps
            out.append((cur[0] + r * math.cos(a), cur[1] + r * math.sin(a)))
    return out


def _buffer_line_capsule(line: list[Pt], r: float, quad_segs: int) -> list[Pt]:
    """Buffer of a straight SEGMENT (the polyline-capsule case):
    offset sides + semicircular end fans of 2·quad_segs chords each —
    4·quad_segs + 2 vertices, area 2Lr + k-gon circle, perimeter
    2L + k-gon circumference (k = 4·quad_segs). Multi-segment lines
    with turns need an arc-join sweep (general GEOS buffer) and fail
    loud rather than return a wrong ring."""
    if len(line) != 2:
        raise ValueError(
            "st_buffer_line_arrow supports the single-segment (capsule) "
            f"case; got a {len(line)}-point line — split it or use GEOS"
        )
    p0, p1 = line
    d = _unit(p1[0] - p0[0], p1[1] - p0[1])
    theta_n = math.atan2(d[0], -d[1])  # LEFT normal (-dy, dx) angle
    q2 = 2 * quad_segs
    out: list[Pt] = []
    for j in range(q2 + 1):  # semicircle around p1: +n -> -n through +dir
        a = theta_n - math.pi * j / q2
        out.append((p1[0] + r * math.cos(a), p1[1] + r * math.sin(a)))
    for j in range(q2 + 1):  # semicircle around p0: -n -> +n through -dir
        a = theta_n - math.pi - math.pi * j / q2
        out.append((p0[0] + r * math.cos(a), p0[1] + r * math.sin(a)))
    return out


def _dp_keep(pts: list[Pt], tol: float) -> list[bool]:
    n = len(pts)
    keep = [False] * n
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        ax, ay = pts[i]
        bx, by = pts[j]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        best, best_d2 = -1, -1.0
        for m in range(i + 1, j):
            px, py = pts[m]
            if seg2 == 0:
                d2 = (px - ax) * (px - ax) + (py - ay) * (py - ay)
            else:
                t = ((px - ax) * dx + (py - ay) * dy) / seg2
                t = 0.0 if t < 0 else (1.0 if t > 1 else t)
                cx, cy = ax + t * dx, ay + t * dy
                d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
            if d2 > best_d2:
                best, best_d2 = m, d2
        if best_d2 > tol * tol:
            keep[best] = True
            stack.append((i, best))
            stack.append((best, j))
    return keep


def _simplify_preserve_topology_ring(ring: list[Pt], tol: float) -> list[Pt]:
    """ST_SimplifyPreserveTopology for a simple RING: Douglas–Peucker
    anchored at the ring's first vertex and the vertex farthest from
    it (so the closed walk never degenerates to a chord), with the
    PostGIS validity guarantee — if simplification would leave fewer
    than 3 distinct vertices (an invalid polygon), the ORIGINAL ring
    is returned unchanged rather than a collapsed one."""
    n = len(ring)
    if n <= 3:
        return ring
    far = max(
        range(1, n),
        key=lambda m: (ring[m][0] - ring[0][0]) ** 2 + (ring[m][1] - ring[0][1]) ** 2,
    )
    arc1 = ring[: far + 1]
    arc2 = ring[far:] + [ring[0]]
    keep1 = _dp_keep(arc1, tol)
    keep2 = _dp_keep(arc2, tol)
    kept = [p for p, k in zip(arc1, keep1) if k]
    kept += [p for p, k in zip(arc2[1:-1], keep2[1:-1]) if k]
    if len(kept) < 3:
        return ring
    return kept


# NOTE: the pandas UDFs are built INSIDE the public wrappers (the
# st_simplify pattern) — a module-level @F.pandas_udf decorator would
# re-execute on every executor worker that imports this module to
# unpickle the kernels, where no SparkSession exists to parse the
# return type.


def st_buffer_ring_arrow(ring: Column, radius: float, quad_segs: int = 8) -> Column:
    """PostGIS ST_Buffer on a CONVEX polygon ring (outward, positive
    radius), Arrow-batched. Closed-form-checkable: area grows by
    P·r + circle(4·quad_segs-gon), perimeter by its circumference."""
    r, q = float(radius), int(quad_segs)

    @F.pandas_udf(_RING_T)
    def _buf(rings: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if g is None else _to_rows(_buffer_convex_ring(_to_pts(g), r, q))
                for g in rings
            ]
        )

    return _buf(ring)


def st_buffer_line_arrow(line: Column, radius: float, quad_segs: int = 8) -> Column:
    """PostGIS ST_Buffer on a single-segment LINESTRING (capsule),
    Arrow-batched; multi-segment input fails loud."""
    r, q = float(radius), int(quad_segs)

    @F.pandas_udf(_RING_T)
    def _buf(lines: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if g is None else _to_rows(_buffer_line_capsule(_to_pts(g), r, q))
                for g in lines
            ]
        )

    return _buf(line)


def st_simplifypreservetopology_arrow(ring: Column, tolerance: float) -> Column:
    """PostGIS ST_SimplifyPreserveTopology for simple rings: DP
    simplification that never returns an invalid (<3 distinct vertex)
    polygon — over-aggressive tolerances yield the original ring."""
    tol = float(tolerance)

    @F.pandas_udf(_RING_T)
    def _spt(rings: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if g is None
                else _to_rows(_simplify_preserve_topology_ring(_to_pts(g), tol))
                for g in rings
            ]
        )

    return _spt(ring)


def st_intersection_convex_arrow(subject: Column, clip: Column) -> Column:
    """Arrow-batched Sutherland–Hodgman clip — result-identical to
    spatial.st_intersection_convex (pinned by test) at a tiny fraction
    of its plan-compile cost."""

    @F.pandas_udf(_RING_T)
    def _clip_udf(s: pd.Series, c: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if rs is None or rc is None
                else _to_rows(_sh_clip(_to_pts(rs), _to_pts(rc)))
                for rs, rc in zip(s, c)
            ]
        )

    return _clip_udf(subject, clip)


def st_union_convex_arrow(a: Column, b: Column) -> Column:
    """Arrow-batched star-shaped convex union — result-identical to
    spatial.st_union_convex (pinned by test)."""

    @F.pandas_udf(_RING_T)
    def _union_udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if ra is None or rb is None
                else _to_rows(_star_union(_to_pts(ra), _to_pts(rb)))
                for ra, rb in zip(sa, sb)
            ]
        )

    return _union_udf(a, b)


# --- GEOS-tail ops (r10): difference / overlaps / touches /
# point-on-surface / linemerge. Reference surface:
# pg_lake_engine/src/pgduck/shippable_spatial_functions.c
# (ST_Difference, ST_Overlaps, ST_Touches, ST_PointOnSurface,
# ST_LineMerge) — previously on the delegated GEOS list; the convex /
# single-ring cases close here with closed-form-checkable
# constructions (geo14). Holes/MULTIPOLYGON live in the multi-ring
# model (_mring_op, r11); tangent / shared-edge / pinch / concave
# configurations route through the planar-face arrangement
# (_boolean_via_faces, r12). The single-ring difference still fails
# loud when the RESULT needs a hole (use the mring ops).


def _ring_area(ring: list[Pt]) -> float:
    return abs(_signed_area2(ring)) / 2.0 if len(ring) >= 3 else 0.0


def _boundary_crossings(aa: list[Pt], bb: list[Pt]) -> list[tuple[Pt, int, float, int, float]]:
    """Distinct ∂A×∂B crossing points with parametric positions:
    (point, a_edge, t_along_a_edge, b_edge, u_along_b_edge)."""
    out: dict[Pt, tuple[Pt, int, float, int, float]] = {}
    for i, (a1, a2) in enumerate(_closed_edges(aa)):
        for j, (b1, b2) in enumerate(_closed_edges(bb)):
            p = _segment_intersection(a1, a2, b1, b2)
            if p is None:
                continue
            alen2 = (a2[0] - a1[0]) ** 2 + (a2[1] - a1[1]) ** 2
            blen2 = (b2[0] - b1[0]) ** 2 + (b2[1] - b1[1]) ** 2
            t = ((p[0] - a1[0]) * (a2[0] - a1[0]) + (p[1] - a1[1]) * (a2[1] - a1[1])) / alen2
            u = ((p[0] - b1[0]) * (b2[0] - b1[0]) + (p[1] - b1[1]) * (b2[1] - b1[1])) / blen2
            # keep the first parametric slot per distinct point (a
            # crossing at a shared vertex shows up once per edge pair)
            out.setdefault(p, (p, i, t, j, u))
    return list(out.values())


def _collinear_overlap(a1: Pt, a2: Pt, b1: Pt, b2: Pt) -> bool:
    if _cross(a1, a2, b1) != 0 or _cross(a1, a2, b2) != 0:
        return False
    if abs(a2[0] - a1[0]) >= abs(a2[1] - a1[1]):
        lo, hi = sorted((a1[0], a2[0]))
        p, q = sorted((b1[0], b2[0]))
    else:
        lo, hi = sorted((a1[1], a2[1]))
        p, q = sorted((b1[1], b2[1]))
    return max(lo, p) <= min(hi, q)


def _on_open_segment(a: Pt, b: Pt, p: Pt) -> bool:
    """True iff p lies on segment (a, b) STRICTLY between its
    endpoints (collinearity is exact — used on already-collinear
    configurations where the cross product vanished)."""
    if _cross(a, b, p) != 0:
        return False
    if abs(b[0] - a[0]) >= abs(b[1] - a[1]):
        lo, hi = sorted((a[0], b[0]))
        return lo < p[0] < hi
    lo, hi = sorted((a[1], b[1]))
    return lo < p[1] < hi


def _boundary_contact(aa: list[Pt], bb: list[Pt]) -> bool:
    """True iff ∂A and ∂B share at least one point — transversal or
    endpoint crossings via _segment_intersection, shared collinear
    spans (full-edge touches, which have denom == 0) checked apart."""
    for a1, a2 in _closed_edges(aa):
        for b1, b2 in _closed_edges(bb):
            if _segment_intersection(a1, a2, b1, b2) is not None:
                return True
            if _collinear_overlap(a1, a2, b1, b2):
                return True
    return False


def _aug_positions(ring: list[Pt], crossings: list[tuple[Pt, int, float]]):
    """Ring vertices + crossings merged in boundary order. Returns
    (points list, crossing-index positions) where each vertex k sorts
    as (k, 0.0) and a crossing on edge i at parameter t as (i, t)."""
    items: list[tuple[tuple[int, float], Pt, int]] = [
        ((k, 0.0), p, -1) for k, p in enumerate(ring)
    ]
    for c_idx, (p, i, t) in enumerate(crossings):
        if t <= 0.0 or t >= 1.0:
            # crossing AT a ring vertex: tangency the 2-crossing walk
            # below cannot orient reliably
            raise NotImplementedError(
                "convex difference: boundary crossing coincides with a "
                "ring vertex (tangent configuration)"
            )
        items.append(((i, t), p, c_idx))
    items.sort(key=lambda it: it[0])
    pts = [p for _k, p, _c in items]
    pos = {c: n for n, (_k, _p, c) in enumerate(items) if c >= 0}
    return pts, pos[0], pos[1]


def _arc_between(pts: list[Pt], i: int, j: int) -> list[Pt]:
    """Points strictly between positions i and j walking forward
    (cyclically) from i to j."""
    n = len(pts)
    out = []
    k = (i + 1) % n
    while k != j:
        out.append(pts[k])
        k = (k + 1) % n
    return out


def _pick_arc(pts: list[Pt], i: int, j: int, other: list[Pt], want_inside: bool):
    """Of the two boundary arcs between crossing positions i and j,
    return (start_pos, intermediates) for the arc whose probe point —
    first intermediate vertex, or the chord midpoint when the arc is
    direct — is (not) strictly inside ``other``."""
    for start, end in ((i, j), (j, i)):
        mid = _arc_between(pts, start, end)
        probe = mid[0] if mid else (
            (pts[start][0] + pts[end][0]) / 2.0,
            (pts[start][1] + pts[end][1]) / 2.0,
        )
        if _contains(other, probe) == want_inside and all(
            _contains(other, p) == want_inside for p in mid
        ):
            return start, mid
    raise NotImplementedError(
        "convex difference: could not orient the boundary walk "
        "(tangent or degenerate configuration)"
    )


def _ring_is_convex(ring: list[Pt]) -> bool:
    """All turns the same way (collinear runs allowed)."""
    n = len(ring)
    sign = 0
    for i in range(n):
        c = _cross(ring[i], ring[(i + 1) % n], ring[(i + 2) % n])
        if c == 0:
            continue
        s = 1 if c > 0 else -1
        if sign == 0:
            sign = s
        elif s != sign:
            return False
    return True


def _difference_convex(a: list[Pt], b: list[Pt]) -> list[Pt]:
    """A \\ B in the SINGLE-RING model: the convex two-crossing walk,
    with tangent / multi-bite / CONCAVE-input configurations falling
    back to the planar-face arrangement (r12 — the convex core's
    Sutherland–Hodgman gate silently misjudges a concave subtrahend,
    so non-convex inputs route straight to the arrangement). A
    strictly-contained subtrahend still fails loud — the result has a
    HOLE, unrepresentable here; the multi-ring ops carry it."""
    try:
        if not (_ring_is_convex(a) and _ring_is_convex(b)):
            raise NotImplementedError("non-convex input")
        return _difference_convex_core(a, b)
    except NotImplementedError as exc:
        rings = _boolean_via_faces([a], [b], "sub")
        if not rings:
            return []
        if len(rings) == 1 and _signed_area2(rings[0]) > 0:
            return rings[0]
        raise NotImplementedError(
            "st_difference_convex: result needs a HOLE or multiple "
            "outer rings — unrepresentable in the single-ring model "
            "(use the multi-ring difference)"
        ) from exc


def _difference_convex_core(a: list[Pt], b: list[Pt]) -> list[Pt]:
    """A \\ B for CONVEX rings. Cases: disjoint/touching → A unchanged;
    B covers A → empty ring; B strictly inside A → fail loud (the
    result has a HOLE, unrepresentable in the single-ring model);
    generic single bite (exactly two boundary crossings) → the walk:
    ∂A's outside-B arc plus ∂B's inside-A arc traversed back from the
    entry crossing to the exit crossing. The result is a simple
    (generally non-convex) CCW ring."""
    aa, bb = _ccw(a), _ccw(b)
    inter = _sh_clip(aa, bb)
    ia = _ring_area(inter)
    if ia == 0.0:
        return list(aa)
    if ia >= _ring_area(aa):
        return []
    crossings = _boundary_crossings(aa, bb)
    if not crossings:
        raise NotImplementedError(
            "st_difference_convex: subtrahend strictly inside the minuend "
            "produces a polygon with a HOLE — unrepresentable in the "
            "single-ring model (keep the parts separately)"
        )
    if len(crossings) != 2:
        raise NotImplementedError(
            f"st_difference_convex: expected 2 boundary crossings, got "
            f"{len(crossings)} (tangent or degenerate configuration)"
        )
    a_pts, a_c0, a_c1 = _aug_positions(
        aa, [(p, i, t) for p, i, t, _j, _u in crossings]
    )
    b_pts, b_c0, b_c1 = _aug_positions(
        bb, [(p, j, u) for p, _i, _t, j, u in crossings]
    )
    # chain along A: the arc of augmented-A whose probe is outside B
    a_start, a_mid = _pick_arc(a_pts, a_c0, a_c1, bb, want_inside=False)
    a_end_pos = a_c1 if a_start == a_c0 else a_c0
    chain = [a_pts[a_start], *a_mid, a_pts[a_end_pos]]
    # chain along B: the arc whose probe is inside A, appended from the
    # entry crossing (where chain ended) back to the exit crossing
    b_start, b_mid = _pick_arc(b_pts, b_c0, b_c1, aa, want_inside=True)
    entry = chain[-1]
    if b_pts[b_start] == entry:
        chain.extend(b_mid)
    else:
        chain.extend(reversed(b_mid))
    return chain


def _overlaps_convex(a: list[Pt], b: list[Pt]) -> bool:
    """PostGIS ST_Overlaps for convex rings: interiors intersect and
    neither contains the other (equal rings do NOT overlap)."""
    aa, bb = _ccw(a), _ccw(b)
    ia = _ring_area(_sh_clip(aa, bb))
    return 0.0 < ia < _ring_area(aa) and ia < _ring_area(bb)


def _touches_convex(a: list[Pt], b: list[Pt]) -> bool:
    """PostGIS ST_Touches for convex rings: boundaries share at least
    one point while the interiors do not intersect (shared full edges
    — collinear spans — included)."""
    aa, bb = _ccw(a), _ccw(b)
    if _ring_area(_sh_clip(aa, bb)) > 0.0:
        return False
    return _boundary_contact(aa, bb)


def _point_on_surface(ring: list[Pt]) -> Pt | None:
    """A point guaranteed strictly inside a simple ring (PostGIS
    ST_PointOnSurface contract): horizontal scanline at the mid-height,
    nudged to the midpoint of the vertex-y interval below when the
    mid-height coincides with a vertex y (which would graze vertices or
    run along horizontal edges); the returned point is the midpoint of
    the scanline's first inside interval. Deterministic — no RNG."""
    if len(ring) < 3:
        return None
    ys = sorted({p[1] for p in ring})
    if len(ys) == 1:
        return None  # degenerate: zero height
    y = (ys[0] + ys[-1]) / 2.0
    if y in ys:
        idx = ys.index(y)
        y = (ys[idx - 1] + ys[idx]) / 2.0
    xs = []
    for (ax, ay), (bx, by) in _closed_edges(ring):
        if (ay > y) != (by > y):
            xs.append(ax + (bx - ax) * (y - ay) / (by - ay))
    xs.sort()
    return ((xs[0] + xs[1]) / 2.0, y)


def _linemerge(segs: list[tuple[Pt, Pt]]) -> list[list[Pt]]:
    """PostGIS ST_LineMerge semantics on a segment set: stitch segments
    end-to-end THROUGH DEGREE-2 NODES ONLY (a junction of 3+ segments
    splits the output, exactly like GEOS); leftover cycles close on
    their lexicographically smallest node. Output lines sorted by
    their first point — deterministic across engines and runs."""
    adj: dict[Pt, list[tuple[int, Pt]]] = {}
    for idx, (p, q) in enumerate(segs):
        adj.setdefault(p, []).append((idx, q))
        adj.setdefault(q, []).append((idx, p))
    used = [False] * len(segs)

    def walk(start: Pt) -> list[Pt]:
        path = [start]
        cur = start
        while True:
            nxt = sorted(
                [(o, i) for i, o in adj[cur] if not used[i]]
            )
            if not nxt:
                break
            o, i = nxt[0]
            used[i] = True
            path.append(o)
            cur = o
            if len(adj[cur]) != 2:  # junction or endpoint: stop merging
                break
        return path

    lines: list[list[Pt]] = []
    # open paths first: start at every node that is not degree-2
    for node in sorted(n for n in adj if len(adj[n]) != 2):
        while any(not used[i] for i, _o in adj[node]):
            lines.append(walk(node))
    # remaining segments are pure cycles
    for idx, (p, q) in enumerate(segs):
        if not used[idx]:
            lines.append(walk(min(p, q)))
    return sorted(lines)


_POINT_T = "struct<x:double,y:double>"
_LINES_T = "array<array<struct<x:double,y:double>>>"
_SEGS_T = "array<struct<x1:double,y1:double,x2:double,y2:double>>"


def st_difference_convex_arrow(a: Column, b: Column) -> Column:
    """Arrow-batched convex polygon difference (see
    :func:`_difference_convex` for the case analysis)."""

    @F.pandas_udf(_RING_T)
    def _diff_udf(s: pd.Series, c: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if ra is None or rb is None
                else _to_rows(_difference_convex(_to_pts(ra), _to_pts(rb)))
                for ra, rb in zip(s, c)
            ]
        )

    return _diff_udf(a, b)


def st_overlaps_convex_arrow(a: Column, b: Column) -> Column:
    @F.pandas_udf("boolean")
    def _ov_udf(s: pd.Series, c: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if ra is None or rb is None
                else _overlaps_convex(_to_pts(ra), _to_pts(rb))
                for ra, rb in zip(s, c)
            ]
        )

    return _ov_udf(a, b)


def st_touches_convex_arrow(a: Column, b: Column) -> Column:
    @F.pandas_udf("boolean")
    def _tc_udf(s: pd.Series, c: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if ra is None or rb is None
                else _touches_convex(_to_pts(ra), _to_pts(rb))
                for ra, rb in zip(s, c)
            ]
        )

    return _tc_udf(a, b)


def st_pointonsurface_arrow(ring: Column) -> Column:
    @F.pandas_udf(_POINT_T)
    def _pos_udf(s: pd.Series) -> pd.DataFrame:
        xs, ys = [], []
        for r in s:
            p = None if r is None else _point_on_surface(_to_pts(r))
            xs.append(None if p is None else p[0])
            ys.append(None if p is None else p[1])
        return pd.DataFrame({"x": xs, "y": ys})

    return _pos_udf(ring)


def st_linemerge_arrow(segments: Column) -> Column:
    """Merge a row's segment set (array<struct<x1,y1,x2,y2>>) into
    maximal linestrings (array of vertex lists)."""

    @F.pandas_udf(_LINES_T)
    def _lm_udf(s: pd.Series) -> pd.Series:
        out = []
        for segs in s:
            if segs is None:
                out.append(None)
                continue
            pairs = [
                (
                    (float(g["x1"]), float(g["y1"])),
                    (float(g["x2"]), float(g["y2"])),
                )
                for g in segs
            ]
            out.append([_to_rows(line) for line in _linemerge(pairs)])
        return pd.Series(out)

    return _lm_udf(segments)


def _self_intersections(ring: list[Pt]) -> list[tuple[int, int, Pt]]:
    """Crossing points between NON-ADJACENT edges of a ring (adjacent
    edges share a vertex by construction — not a defect)."""
    edges = _closed_edges(ring)
    n = len(edges)
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            if j == i + 1 or (i == 0 and j == n - 1):
                continue
            p = _segment_intersection(*edges[i], *edges[j])
            if p is not None:
                out.append((i, j, p))
    return out


def _node_ring(ring: list[Pt]) -> list[Pt]:
    """Insert every self-intersection point into the vertex cycle, each
    crossing appearing once per edge it lies on (twice total), ordered
    by parameter t along its edge — the NODED closed polyline GEOS
    builds as step 1 of MakeValid's linework method."""
    by_edge: dict[int, list[Pt]] = {}
    for i, j, p in _self_intersections(ring):
        by_edge.setdefault(i, []).append(p)
        by_edge.setdefault(j, []).append(p)
    out: list[Pt] = []
    for k, (a, b) in enumerate(_closed_edges(ring)):
        out.append(a)
        pts = by_edge.get(k)
        if pts:
            dx, dy = b[0] - a[0], b[1] - a[1]
            den = dx * dx + dy * dy
            out.extend(
                sorted(
                    pts,
                    key=lambda p: ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy)
                    / den,
                )
            )
    return out


def _planar_faces(segments: list[tuple[Pt, Pt]]) -> list[list[Pt]]:
    """Bounded faces of the planar subdivision induced by NODED
    segments (segments meet only at shared endpoints) — the
    polygonize step of GEOS MakeValid's linework method. Half-edge
    traversal: from directed edge u→v the face continues along the
    neighbor of v immediately CLOCKWISE of u in the angular order
    around v, so every bounded face is traced CCW (kept) and the
    unbounded face CW (dropped). Faces are canonicalized (rotated to
    start at their min vertex) and sorted for determinism."""
    adj: dict[Pt, list[Pt]] = {}
    segs: set[tuple[Pt, Pt]] = set()
    for a, b in segments:
        if a == b:
            continue
        key = (a, b) if a <= b else (b, a)
        if key in segs:
            continue
        segs.add(key)
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for u, nbrs in adj.items():
        nbrs.sort(key=lambda v: math.atan2(v[1] - u[1], v[0] - u[0]))
    idx = {u: {v: i for i, v in enumerate(ns)} for u, ns in adj.items()}
    used: set[tuple[Pt, Pt]] = set()
    faces: list[list[Pt]] = []
    for a, b in sorted(segs):
        for u0, v0 in ((a, b), (b, a)):
            if (u0, v0) in used:
                continue
            face: list[Pt] = []
            u, v = u0, v0
            while (u, v) not in used:
                used.add((u, v))
                face.append(u)
                ns = adj[v]
                w = ns[(idx[v][u] - 1) % len(ns)]
                u, v = v, w
            if len(face) >= 3 and _signed_area2(face) > 0:
                i = min(range(len(face)), key=lambda k: face[k])
                faces.append(face[i:] + face[:i])
    return sorted(faces)


def _make_valid(ring: list[Pt]) -> list[list[Pt]]:
    """PostGIS/GEOS ST_MakeValid (linework method, the GEOS ≥3.10
    default) for an arbitrarily self-intersecting ring: node the
    boundary at every crossing, decompose the noded cycle into simple
    loops, and keep each loop whose interior is covered an ODD number
    of times by the original boundary (even-odd rule — the bowtie
    yields both lobes; a pentagram yields its five point-triangles and
    drops the doubly-wound center pentagon, exactly GEOS). An already
    simple ring passes through unchanged (one-element list). Output
    loops are CCW and sorted (r11: generalized from the single-crossing
    bowtie repair)."""
    if len(ring) < 3:
        return [list(ring)]
    if not _self_intersections(ring):
        return [list(ring)]
    cycle = _node_ring(ring)
    segs = list(zip(cycle, cycle[1:] + cycle[:1]))
    out: list[list[Pt]] = []
    for face in _planar_faces(segs):
        if _ring_area(face) == 0.0:
            continue  # degenerate sliver
        probe = _point_on_surface(face) or face[0]
        # even-odd winding of the face's interior w.r.t. the ORIGINAL
        # (noded, still self-crossing) boundary
        if _contains(cycle, probe):
            out.append(face)
    return sorted(out)


def st_makevalid_arrow(ring: Column) -> Column:
    """Repair an invalid (self-intersecting) ring into its simple
    lobes (see :func:`_make_valid`). Returns array-of-rings — a valid
    input comes back as a one-element list containing itself."""

    @F.pandas_udf(_LINES_T)
    def _mv_udf(s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if r is None
                else [_to_rows(lobe) for lobe in _make_valid(_to_pts(r))]
                for r in s
            ]
        )

    return _mv_udf(ring)


def st_isvalid_arrow(ring: Column) -> Column:
    """TRUE iff the ring has no non-adjacent edge crossings (the
    complement of what st_makevalid repairs; PostGIS ST_IsValid's
    self-intersection clause on the single-ring model)."""

    @F.pandas_udf("boolean")
    def _iv_udf(s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if r is None else not _self_intersections(_to_pts(r))
                for r in s
            ]
        )

    return _iv_udf(ring)


# --- GEOS-tail ops (r10, batch 2): GENERAL (concave) boolean ops ----------
# Greiner–Hormann clipping (Greiner & Hormann 1998, "Efficient clipping
# of arbitrary polygons", ACM TOG 17(2) — public algorithm) for simple
# polygons WITHOUT holes: intersection / union / difference of concave
# shapes, multiple output rings supported (a U ∩ a bar is two disjoint
# pieces). Degenerate contact (a crossing AT a vertex, collinear edge
# overlap) fails loud rather than guessing — the planted-shape tests
# and the convex cross-check pin the clean-crossing behavior.


class _GHNode:
    __slots__ = ("pt", "next", "prev", "neighbor", "is_inter", "entry",
                 "visited", "_t")

    def __init__(self, pt: Pt, is_inter: bool = False):
        self.pt = pt
        self.next = self.prev = self.neighbor = None
        self.is_inter = is_inter
        self.entry = False
        self.visited = False
        self._t = 0.0


def _gh_ring(pts: list[Pt]) -> _GHNode:
    nodes = [_GHNode(p) for p in pts]
    n = len(nodes)
    for i, nd in enumerate(nodes):
        nd.next = nodes[(i + 1) % n]
        nd.prev = nodes[(i - 1) % n]
    return nodes[0]


def _gh_vertices(head: _GHNode):
    nd = head
    while True:
        yield nd
        nd = nd.next
        if nd is head:
            break


def _gh_insert(start: _GHNode, end: _GHNode, node: _GHNode, t: float) -> None:
    """Insert an intersection node between start and its edge-end,
    ordered by parameter t among already-inserted intersections."""
    cur = start
    while cur.next is not end and cur.next.is_inter and cur.next._t < t:
        cur = cur.next
    node._t = t
    node.next = cur.next
    node.prev = cur
    cur.next.prev = node
    cur.next = node


def _gh_clip(subject: list[Pt], clip: list[Pt], op: str) -> list[list[Pt]]:
    """Greiner–Hormann boolean op on two SIMPLE rings — the fast path;
    tangent / shared-edge / vertex-grazing configurations it cannot
    orient fall back to the planar-face arrangement (r12,
    :func:`_boolean_via_faces`). ValueError (self-intersecting input)
    stays loud — repair with st_makevalid first."""
    try:
        return _gh_clip_core(subject, clip, op)
    except NotImplementedError:
        return _boolean_via_faces([subject], [clip], op)


def _gh_clip_core(subject: list[Pt], clip: list[Pt], op: str) -> list[list[Pt]]:
    """Greiner–Hormann boolean op on two SIMPLE rings (CCW enforced).
    op: 'and' (intersection), 'or' (union), 'sub' (subject minus
    clip). Returns a LIST of rings (concave ops legitimately produce
    several)."""
    aa, bb = _ccw(subject), _ccw(clip)
    # garbage-in guard: entry/exit marking assumes SIMPLE rings — a
    # self-intersecting input silently yields nonsense regions, so
    # detect it (O(n²) on ring-sized n) and fail loud toward makevalid
    for r in (aa, bb):
        if _self_intersections(r):
            raise ValueError(
                "general clip: input ring is self-intersecting — repair it "
                "first (st_makevalid)"
            )
    s_head, c_head = _gh_ring(aa), _gh_ring(bb)

    # 1. find pairwise edge crossings, inserting paired nodes
    s_orig = [nd for nd in _gh_vertices(s_head)]
    c_orig = [nd for nd in _gh_vertices(c_head)]
    n_inter = 0
    for s_nd in s_orig:
        # the original edge end is the next ORIGINAL vertex
        for c_nd in c_orig:
            a1, a2 = s_nd.pt, _next_orig(s_nd).pt
            b1, b2 = c_nd.pt, _next_orig(c_nd).pt
            denom = (a2[0] - a1[0]) * (b2[1] - b1[1]) - (a2[1] - a1[1]) * (
                b2[0] - b1[0]
            )
            if denom == 0:
                if _collinear_overlap(a1, a2, b1, b2):
                    raise NotImplementedError(
                        "general clip: collinear edge overlap (degenerate "
                        "contact) — perturb the input or use GEOS/Sedona"
                    )
                continue
            qpx, qpy = b1[0] - a1[0], b1[1] - a1[1]
            t = (qpx * (b2[1] - b1[1]) - qpy * (b2[0] - b1[0])) / denom
            u = (qpx * (a2[1] - a1[1]) - qpy * (a2[0] - a1[0])) / denom
            if 0 < t < 1 and 0 < u < 1:
                p = (a1[0] + t * (a2[0] - a1[0]), a1[1] + t * (a2[1] - a1[1]))
                sn = _GHNode(p, True)
                cn = _GHNode(p, True)
                sn.neighbor, cn.neighbor = cn, sn
                _gh_insert(s_nd, _next_orig(s_nd), sn, t)
                _gh_insert(c_nd, _next_orig(c_nd), cn, u)
                n_inter += 1
            elif (0 <= t <= 1 and u in (0.0, 1.0)) or (
                0 <= u <= 1 and t in (0.0, 1.0)
            ):
                raise NotImplementedError(
                    "general clip: boundary crossing AT a vertex (tangent "
                    "configuration) — perturb the input or use GEOS/Sedona"
                )

    # 2. no crossings: pure containment / disjoint cases
    if n_inter == 0:
        a_in_b = _contains(bb, aa[0])
        b_in_a = _contains(aa, bb[0])
        if op == "and":
            return [aa] if a_in_b else [bb] if b_in_a else []
        if op == "or":
            return [bb] if a_in_b else [aa] if b_in_a else sorted([aa, bb])
        if a_in_b:
            return []
        if b_in_a:
            # clip strictly inside subject: polygon with a HOLE — emitted
            # in the multi-ring model as outer (CCW) + hole (CW), so
            # signed areas sum to the covered area and even-odd point
            # containment is exact (r11; previously fail-loud).
            return sorted([aa, list(reversed(bb))])
        return [aa]

    # 3. mark entry/exit: walking each ring, the inside/outside status
    # w.r.t. the OTHER ring flips at every crossing
    inside = _contains(bb, s_head.pt)
    for nd in _gh_vertices(s_head):
        if nd.is_inter:
            inside = not inside
            nd.entry = inside  # True: this crossing ENTERS the clip ring
    inside = _contains(aa, c_head.pt)
    for nd in _gh_vertices(c_head):
        if nd.is_inter:
            inside = not inside
            nd.entry = inside

    # 4. traversal rules per op (the GH table): at an entry crossing
    # walk FORWARD along the current ring, at an exit walk BACKWARD —
    # with per-op inversions of the entry flags (union inverts both;
    # subject-minus-clip inverts the SUBJECT side)
    s_invert = op in ("or", "sub")
    c_invert = op in ("or",)

    def _entry(nd: _GHNode, on_subject: bool) -> bool:
        e = nd.entry
        return (not e) if (s_invert if on_subject else c_invert) else e

    out: list[list[Pt]] = []
    inters = [nd for nd in _gh_vertices(s_head) if nd.is_inter]
    for start in inters:
        if start.visited:
            continue
        ring: list[Pt] = []
        nd, on_subject = start, True
        while True:
            nd.visited = True
            nd.neighbor.visited = True
            forward = _entry(nd, on_subject)
            step = 0
            while True:
                ring.append(nd.pt)
                nd = nd.next if forward else nd.prev
                step += 1
                if nd.is_inter:
                    break
                if step > 10000:
                    raise RuntimeError("general clip: traversal runaway")
            nd = nd.neighbor
            on_subject = not on_subject
            if nd is start or nd.neighbor is start or nd.visited:
                break
        if len(ring) >= 3:
            out.append(ring)
    return _orient_boolean_outputs(out)


def _orient_boolean_outputs(rings: list[list[Pt]]) -> list[list[Pt]]:
    """Normalize boolean-op output orientation: outer rings CCW, rings
    enclosed by an odd number of other output rings CW — a union that
    encloses a cavity (a bar across a U) legitimately emits that cavity
    as a clockwise HOLE ring, so SIGNED areas sum to the true covered
    area and callers can tell holes by sign."""
    out = []
    for i, r in enumerate(rings):
        probe = _point_on_surface(r) or r[0]
        # only a STRICTLY larger ring can enclose this one (a probe that
        # grazes a smaller sibling's boundary must not count)
        depth = sum(
            1
            for j, o in enumerate(rings)
            if j != i and _ring_area(o) > _ring_area(r) and _contains(o, probe)
        )
        ccw = _ccw(r)
        out.append(list(reversed(ccw)) if depth % 2 else ccw)
    return sorted(out)


def _next_orig(nd: _GHNode) -> _GHNode:
    cur = nd.next
    while cur.is_inter:
        cur = cur.next
    return cur


def _rings_to_rows(rings: list[list[Pt]]) -> list[list[dict]]:
    return [_to_rows(r) for r in rings]


def st_intersection_general_arrow(a: Column, b: Column) -> Column:
    """General (concave-capable) polygon intersection — returns the
    ring LIST (concave ∩ concave legitimately yields several)."""

    @F.pandas_udf(_LINES_T)
    def _ig_udf(s: pd.Series, c: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if ra is None or rb is None
                else _rings_to_rows(_gh_clip(_to_pts(ra), _to_pts(rb), "and"))
                for ra, rb in zip(s, c)
            ]
        )

    return _ig_udf(a, b)


def st_union_general_arrow(a: Column, b: Column) -> Column:
    """General polygon union (disjoint inputs return both rings)."""

    @F.pandas_udf(_LINES_T)
    def _ug_udf(s: pd.Series, c: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if ra is None or rb is None
                else _rings_to_rows(_gh_clip(_to_pts(ra), _to_pts(rb), "or"))
                for ra, rb in zip(s, c)
            ]
        )

    return _ug_udf(a, b)


def st_difference_general_arrow(a: Column, b: Column) -> Column:
    """General polygon difference a ∖ b (r11: a strictly-contained b
    emits outer + CW hole in the multi-ring model)."""

    @F.pandas_udf(_LINES_T)
    def _dg_udf(s: pd.Series, c: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if ra is None or rb is None
                else _rings_to_rows(_gh_clip(_to_pts(ra), _to_pts(rb), "sub"))
                for ra, rb in zip(s, c)
            ]
        )

    return _dg_udf(a, b)


# --- Multi-ring geometry model (r11): POLYGON-with-holes / MULTIPOLYGON ----
# A GEOMETRY is a list of rings (array<array<struct<x,y>>>): boundaries
# whose even-odd union is the covered region. Normal form orients by
# nesting depth — outer rings CCW (positive signed area), holes CW
# (negative) — so SIGNED areas sum to the covered area, matching what
# _orient_boolean_outputs already emits for cavity-producing unions.
# This is the uniform representation the reference gets from GEOS's
# Polygon/MultiPolygon (pg_lake_engine/src/pgduck/
# shippable_spatial_functions.c ST_Area/ST_Perimeter/ST_Contains/
# ST_Intersection on POLYGON(outer, holes...)); here every op is pure
# ring algebra composed from the Greiner–Hormann kernel above, and the
# even-odd rule makes ring bookkeeping exact: duplicate CCW/CW pairs
# cancel, disjoint-region unions are plain concatenation.


def _mring_area(geom: list[list[Pt]]) -> float:
    """Covered area: sum of SIGNED ring areas (holes subtract)."""
    return sum(_signed_area2(r) for r in geom) / 2.0


def _mring_perimeter(geom: list[list[Pt]]) -> float:
    """Total boundary length — every ring counts, holes included
    (PostGIS ST_Perimeter on a polygon with holes)."""
    return sum(
        sum(math.hypot(b[0] - a[0], b[1] - a[1]) for a, b in _closed_edges(r))
        for r in geom
    )


def _mring_contains(geom: list[list[Pt]], p: Pt) -> bool:
    """Even-odd point-in-geometry: inside an odd number of rings
    (inside an outer and not inside its hole)."""
    return sum(1 for r in geom if _contains(r, p)) % 2 == 1


def _ring_canon(r: list[Pt]) -> tuple[Pt, ...]:
    """Orientation-insensitive canonical cycle key (CCW, min-first)."""
    rr = _ccw(r)
    i = min(range(len(rr)), key=lambda k: rr[k])
    return tuple(rr[i:] + rr[:i])


def _mring_normalize(rings: list[list[Pt]]) -> list[list[Pt]]:
    """Normal form: drop zero-area rings, cancel identical CCW/CW ring
    pairs (they enclose no net region under even-odd), then orient
    every survivor by nesting depth and sort."""
    live = [r for r in rings if len(r) >= 3 and _signed_area2(r) != 0.0]
    pos: dict[tuple, list[list[Pt]]] = {}
    neg: dict[tuple, list[list[Pt]]] = {}
    for r in live:
        (pos if _signed_area2(r) > 0 else neg).setdefault(
            _ring_canon(r), []
        ).append(r)
    kept: list[list[Pt]] = []
    for key in set(pos) | set(neg):
        p, n = pos.get(key, []), neg.get(key, [])
        m = min(len(p), len(n))
        kept.extend(p[m:])
        kept.extend(n[m:])
    return _orient_boolean_outputs(kept)


def _flip_rings(rings: list[list[Pt]]) -> list[list[Pt]]:
    return [list(reversed(r)) for r in rings]


def _mring_sub_ring(geom: list[list[Pt]], clip: list[Pt]) -> list[list[Pt]]:
    """geom ∖ clip for one SIMPLE CCW clip ring. Positive rings clip
    directly; a hole ring H transforms as H ∖ clip (the part of the
    hole inside the removed region is removed anyway:
    (O∖H)∖C = (O∖C)∖(H∖C)), computed by the same kernel on the
    CCW form and flipped back."""
    out: list[list[Pt]] = []
    for r in geom:
        if _signed_area2(r) > 0:
            out.extend(_gh_clip(r, clip, "sub"))
        else:
            out.extend(_flip_rings(_gh_clip(_ccw(r), clip, "sub")))
    return out


def _split_outer_holes(
    geom: list[list[Pt]],
) -> tuple[list[list[Pt]], list[list[Pt]]]:
    """Outers (CCW, as-is) and holes (returned in CCW working form)."""
    outers = [r for r in geom if _signed_area2(r) > 0]
    holes = [_ccw(r) for r in geom if _signed_area2(r) < 0]
    return outers, holes


def _mring_op(
    A: list[list[Pt]], B: list[list[Pt]], op: str
) -> list[list[Pt]]:
    """Boolean op on multi-ring geometries — decomposed fast path,
    falling back to the planar-face arrangement (r12,
    :func:`_boolean_via_faces`) for the configurations the pairwise
    kernels reject: tangent contacts, shared edges, pinch points,
    holed multi-polygon union cascades."""
    try:
        return _mring_op_core(A, B, op)
    except NotImplementedError:
        return _mring_normalize(_boolean_via_faces(A, B, op))


def _mring_op_core(
    A: list[list[Pt]], B: list[list[Pt]], op: str
) -> list[list[Pt]]:
    """Boolean op on multi-ring geometries (even-odd semantics,
    outer-CCW/hole-CW normal form in and out). op ∈ {'and','sub','or'}.

    intersection: (Ao∖Ah) ∩ (Bo∖Bh) = ⋃ᵢⱼ(Aoᵢ∩Boⱼ) ∖ Ah ∖ Bh —
    outer×outer kernel intersections, then every hole subtracted via
    _mring_sub_ring (holes of disjoint outers subtract as no-ops).

    difference: A ∖ B = (A ∖ Bo…) ∪ (A ∩ Bh…) — subtract B's outers,
    then add back A's overlap with B's holes; the two parts cover
    disjoint regions, so the union is ring concatenation (even-odd).

    union (single-outer geometries, the POLYGON ∪ POLYGON case):
    A ∪ B = (Ao ∪ Bo) ∖ [(Ah∩Bh) ∪ (Ah∖Bo) ∪ (Bh∖Ao)] — the three
    hole families are pairwise disjoint, so they concatenate as CW
    rings. Multi-outer unions fold pairwise while disjoint and fail
    loud if two already-merged components must merge again."""
    A = _mring_normalize(A)
    B = _mring_normalize(B)
    ao, ah = _split_outer_holes(A)
    bo, bh = _split_outer_holes(B)
    if op == "and":
        pieces: list[list[Pt]] = []
        for oa in ao:
            for ob in bo:
                pieces.extend(_gh_clip(oa, ob, "and"))
        for h in ah + bh:
            pieces = _mring_sub_ring(pieces, h)
        return _mring_normalize(pieces)
    if op == "sub":
        pieces = list(A)
        for ob in bo:
            pieces = _mring_sub_ring(pieces, ob)
        # add back A ∩ (each hole of B) — disjoint from pieces by
        # construction, so even-odd concatenation IS the union
        for h in bh:
            add = _mring_op(A, [h], "and")
            pieces = pieces + add
        return _mring_normalize(pieces)
    if op == "or":
        if len(ao) > 1 or len(bo) > 1:
            return _mring_union_multi(A, B)
        (oa,), (ob,) = ao, bo
        rings = _gh_clip(oa, ob, "or")
        hole_rings: list[list[Pt]] = []
        for haa in ah:
            for hbb in bh:
                hole_rings.extend(_gh_clip(haa, hbb, "and"))
            hole_rings.extend(
                r for r in _gh_clip(haa, ob, "sub") if _signed_area2(r) > 0
            )
        for hbb in bh:
            hole_rings.extend(
                r for r in _gh_clip(hbb, oa, "sub") if _signed_area2(r) > 0
            )
        return _mring_normalize(rings + _flip_rings(hole_rings))
    raise ValueError(f"unknown multi-ring op: {op}")


def _mring_union_multi(
    A: list[list[Pt]], B: list[list[Pt]]
) -> list[list[Pt]]:
    """Union when either side is a MULTIPOLYGON: fold components
    pairwise. Components whose outers are disjoint concatenate;
    overlapping pairs merge through the single-outer path. A merge
    whose RESULT would need to merge again with a third overlapping
    component (an iterated cascade) falls back to the planar-face
    N-way union for HOLE-FREE inputs and fails loud when the cascading
    components carry holes (hole-coverage bookkeeping across a cascade
    needs a sweep-line union — use GEOS/Sedona)."""
    if not any(_signed_area2(r) < 0 for r in A + B):
        try:
            return _union_rings_via_faces(
                [r for r in A + B if _signed_area2(r) != 0]
            )
        except NotImplementedError:
            pass  # degenerate contact: the pairwise fold may still work

    def components(geom: list[list[Pt]]) -> list[list[list[Pt]]]:
        outers, holes = _split_outer_holes(geom)
        comps = []
        for o in outers:
            mine = [
                list(reversed(h))
                for h in holes
                if _contains(o, _point_on_surface(h) or h[0])
            ]
            comps.append([o] + mine)
        return comps

    comps = components(A) + components(B)
    out: list[list[list[Pt]]] = []
    for c in comps:
        merged = c
        again: list[list[list[Pt]]] = []
        hit = False
        for existing in out:
            eo = [r for r in existing if _signed_area2(r) > 0][0]
            mo = [r for r in merged if _signed_area2(r) > 0][0]
            disjoint = not _boundary_crossings(eo, mo) and not (
                _contains(eo, mo[0]) or _contains(mo, eo[0])
            )
            if disjoint:
                again.append(existing)
            elif hit:
                raise NotImplementedError(
                    "multi-polygon union: cascaded overlap between three+ "
                    "components — use GEOS/Sedona for iterated unions"
                )
            else:
                merged = _mring_op(existing, merged, "or")
                if len([r for r in merged if _signed_area2(r) > 0]) > 1:
                    raise NotImplementedError(
                        "multi-polygon union: merge produced a multi-outer "
                        "component — use GEOS/Sedona"
                    )
                hit = True
        out = again + [merged]
    return _mring_normalize([r for c in out for r in c])


def _mrings(col) -> list[list[Pt]]:
    return [_to_pts(r) for r in col]


def st_area_mring_arrow(geom: Column) -> Column:
    """ST_Area of a multi-ring geometry (holes subtract)."""

    @F.pandas_udf("double")
    def _a_udf(s: pd.Series) -> pd.Series:
        return pd.Series(
            [None if g is None else _mring_area(_mrings(g)) for g in s]
        )

    return _a_udf(geom)


def st_perimeter_mring_arrow(geom: Column) -> Column:
    """ST_Perimeter of a multi-ring geometry (hole rings count)."""

    @F.pandas_udf("double")
    def _p_udf(s: pd.Series) -> pd.Series:
        return pd.Series(
            [None if g is None else _mring_perimeter(_mrings(g)) for g in s]
        )

    return _p_udf(geom)


def st_contains_mring_arrow(geom: Column, point: Column) -> Column:
    """ST_Contains(geometry, point) under even-odd (point in a hole is
    NOT contained)."""

    @F.pandas_udf("boolean")
    def _c_udf(s: pd.Series, p: pd.DataFrame) -> pd.Series:
        # a struct input arrives as a pandas DataFrame (one column per
        # field), not a Series of dicts
        xs, ys = p["x"].tolist(), p["y"].tolist()
        return pd.Series(
            [
                None
                if g is None or x is None
                else _mring_contains(_mrings(g), (float(x), float(y)))
                for g, x, y in zip(s, xs, ys)
            ]
        )

    return _c_udf(geom, point)


def _mring_op_udf(op: str):
    @F.pandas_udf(_LINES_T)
    def _udf(s: pd.Series, c: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if ga is None or gb is None
                else _rings_to_rows(_mring_op(_mrings(ga), _mrings(gb), op))
                for ga, gb in zip(s, c)
            ]
        )

    return _udf


def st_intersection_mring_arrow(a: Column, b: Column) -> Column:
    """ST_Intersection of multi-ring geometries (holes on either side
    handled; result in outer-CCW/hole-CW normal form)."""
    return _mring_op_udf("and")(a, b)


def st_union_mring_arrow(a: Column, b: Column) -> Column:
    """ST_Union of multi-ring geometries (see _mring_op for the
    multi-outer scope)."""
    return _mring_op_udf("or")(a, b)


def st_difference_mring_arrow(a: Column, b: Column) -> Column:
    """ST_Difference of multi-ring geometries."""
    return _mring_op_udf("sub")(a, b)


def _node_segments(
    segs: list[tuple[Pt, Pt]]
) -> list[tuple[Pt, Pt]]:
    """Node a segment soup: dedupe identical (shared) segments, split
    every segment at its crossings with the others (each unordered
    pair's crossing computed ONCE so both sides carry the identical
    float point), snap crossings that land on an endpoint to that
    endpoint exactly. Collinear PARTIAL overlaps node at each other's
    interior endpoints (r12 — the shared sub-span then dedupes), so
    edge-contact configurations polygonize instead of failing loud."""
    uniq: list[tuple[Pt, Pt]] = []
    seen: set[tuple[Pt, Pt]] = set()
    for a, b in segs:
        if a == b:
            continue
        k = (a, b) if a <= b else (b, a)
        if k in seen:
            continue
        seen.add(k)
        uniq.append(k)
    cuts: dict[int, list[Pt]] = {i: [] for i in range(len(uniq))}
    for i in range(len(uniq)):
        a1, a2 = uniq[i]
        for j in range(i + 1, len(uniq)):
            b1, b2 = uniq[j]
            rx, ry = a2[0] - a1[0], a2[1] - a1[1]
            sx, sy = b2[0] - b1[0], b2[1] - b1[1]
            denom = rx * sy - ry * sx
            if denom == 0:
                if _collinear_overlap(a1, a2, b1, b2):
                    # collinear partial overlap: split both segments at
                    # the other's interior endpoints; the common span
                    # becomes an identical sub-segment on both sides
                    # and dedupes below
                    for p in (b1, b2):
                        if _on_open_segment(a1, a2, p):
                            cuts[i].append(p)
                    for p in (a1, a2):
                        if _on_open_segment(b1, b2, p):
                            cuts[j].append(p)
                continue
            qpx, qpy = b1[0] - a1[0], b1[1] - a1[1]
            t = (qpx * sy - qpy * sx) / denom
            u = (qpx * ry - qpy * rx) / denom
            if not (0 <= t <= 1 and 0 <= u <= 1):
                continue
            # snap to shared endpoints so the planar graph stays exact
            if u == 0.0:
                pnt = b1
            elif u == 1.0:
                pnt = b2
            elif t == 0.0:
                pnt = a1
            elif t == 1.0:
                pnt = a2
            else:
                pnt = (a1[0] + t * rx, a1[1] + t * ry)
            if pnt not in (a1, a2):
                cuts[i].append(pnt)
            if pnt not in (b1, b2):
                cuts[j].append(pnt)
    out: list[tuple[Pt, Pt]] = []
    for i, (a, b) in enumerate(uniq):
        pts = cuts[i]
        if not pts:
            out.append((a, b))
            continue
        dx, dy = b[0] - a[0], b[1] - a[1]
        den = dx * dx + dy * dy
        ordered = [a] + sorted(
            set(pts),
            key=lambda p: ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / den,
        ) + [b]
        for q1, q2 in zip(ordered, ordered[1:]):
            if q1 != q2:
                out.append((q1, q2))
    # collinear-overlap splits can produce the same sub-segment from
    # two different parents — dedupe so the planar graph stays simple
    final_seen: set[tuple[Pt, Pt]] = set()
    res: list[tuple[Pt, Pt]] = []
    for a, b in out:
        k = (a, b) if a <= b else (b, a)
        if k not in final_seen:
            final_seen.add(k)
            res.append((a, b))
    return res


def _union_rings_via_faces(rings: list[list[Pt]]) -> list[list[Pt]]:
    """N-way polygon union through planar-face polygonization (the
    same machinery as the generalized makevalid): node ALL boundary
    segments, extract the bounded faces, keep each face covered by at
    least one input ring, then reassemble the kept region's OUTLINE —
    the undirected edges bordering exactly one kept face — into
    rings, oriented by nesting (cavities come back as CW holes).
    Handles tangent contacts, shared vertices and (r12) pinch-point
    boundary vertices that the pairwise Greiner–Hormann path
    rejects."""
    ccw_rings = [_ccw(r) for r in rings]
    segs: list[tuple[Pt, Pt]] = []
    for r in ccw_rings:
        segs.extend(_closed_edges(r))
    noded = _node_segments(segs)
    return _region_outline(
        noded, lambda p: any(_contains(r, p) for r in ccw_rings)
    )


def _cell_probe(f: list[Pt], faces: list[list[Pt]]) -> Pt:
    """A point strictly inside face ``f``'s CELL — inside f but outside
    every smaller face nested within it. Nesting only happens across
    DISJOINT components of the noded graph (a touching cycle would have
    been noded into the same component), so nested faces sit at
    positive distance from ∂f and a validated inward offset from an
    edge midpoint eventually clears them; the common case (no nesting)
    is the plain scanline interior point."""
    area_f = _ring_area(f)
    nested = [
        g
        for g in faces
        if g is not f
        and _ring_area(g) < area_f
        and _contains(f, _point_on_surface(g) or g[0])
    ]
    p = _point_on_surface(f) or f[0]
    if not any(_contains(g, p) for g in nested):
        return p
    for a, b in _closed_edges(f):
        ex, ey = b[0] - a[0], b[1] - a[1]
        ln = math.hypot(ex, ey)
        if ln == 0.0:
            continue
        nx, ny = -ey / ln, ex / ln  # inward normal of a CCW ring
        mx, my = (a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0
        eps = ln
        for _ in range(80):
            eps /= 2.0
            q = (mx + nx * eps, my + ny * eps)
            if _contains(f, q) and not any(_contains(g, q) for g in nested):
                return q
    raise NotImplementedError(
        "boolean via faces: no probe point clears the nested faces "
        "(degenerate geometry) — use GEOS/Sedona"
    )


def _region_outline(
    noded: list[tuple[Pt, Pt]], member
) -> list[list[Pt]]:
    """Normal-form rings of the region defined by the exact point
    predicate ``member`` over a noded arrangement. Combinatorial
    construction (no epsilon probes at edges — robust on dense float
    arc geometry): classify every bounded arrangement face by its cell
    probe, resolve each component's ENCLOSING cell for hull edges
    (cross-component nesting), mark an edge boundary iff the two sides'
    kept-status differs, then re-polygonize the boundary graph — the
    angular face walk handles pinch vertices of any degree, and each
    re-polygonized face inherits its region/cavity status from the
    directed arrangement edge it shares. A cavity in the same graph
    component as a region face is already carved out by that face's
    self-touching cycle and is skipped; a disjoint-component cavity
    (no shared edges) is emitted as a CW hole ring."""
    noded = [(a, b) for a, b in noded if a != b]
    faces = _planar_faces(noded)
    dir_face: dict[tuple[Pt, Pt], int] = {}
    for fi, f in enumerate(faces):
        for a, b in _closed_edges(f):
            dir_face[(a, b)] = fi
    kept = [member(_cell_probe(f, faces)) for f in faces]

    # union-find components over the noded graph
    parent: dict[Pt, Pt] = {}

    def find(x: Pt) -> Pt:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in noded:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    face_comp = [find(f[0]) for f in faces]

    # the cell ENCLOSING each component: smallest face of another
    # component containing one of its vertices (unbounded -> not kept)
    enc_kept: dict[Pt, bool] = {}
    comps = {find(a) for a, _b in noded}
    for c in comps:
        v = next(a for a, _b in noded if find(a) == c)
        best, best_area = None, math.inf
        for fi, f in enumerate(faces):
            if face_comp[fi] != c and _contains(f, v):
                ar = _ring_area(f)
                if ar < best_area:
                    best, best_area = fi, ar
        enc_kept[c] = kept[best] if best is not None else False

    def side(a: Pt, b: Pt) -> bool:
        """kept-status of the open cell on the LEFT of directed a→b."""
        fi = dir_face.get((a, b))
        return kept[fi] if fi is not None else enc_kept[find(a)]

    boundary = [
        (a, b) for a, b in noded if side(a, b) != side(b, a)
    ]
    if not boundary:
        return []
    region, cavities = [], []
    for f in _planar_faces(boundary):
        (region if side(f[0], f[1]) else cavities).append(f)
    region_edges = {
        (a, b) if a <= b else (b, a)
        for f in region
        for a, b in _closed_edges(f)
    }
    out = list(region)
    for c in cavities:
        edges_c = {(a, b) if a <= b else (b, a) for a, b in _closed_edges(c)}
        if not (edges_c & region_edges):
            out.append(list(reversed(c)))
    return sorted(out)


def _eo_contains(rings: list[list[Pt]], p: Pt) -> bool:
    """Even-odd point membership in a multi-ring geometry (ring
    orientation irrelevant)."""
    return sum(1 for r in rings if len(r) >= 3 and _contains(r, p)) % 2 == 1


def _boolean_via_faces(
    A: list[list[Pt]], B: list[list[Pt]], op: str
) -> list[list[Pt]]:
    """Fully general boolean op on multi-ring geometries via
    planar-face polygonization (r12) — the fallback the fast paths
    (Greiner–Hormann, convex walks, pairwise multi-polygon folds)
    route to when they hit a tangent, shared-edge, pinch-point or
    cascaded configuration. Node EVERY boundary segment of both
    geometries (including collinear overlaps), classify membership by
    the op's even-odd truth table — evaluated EXACTLY on the input
    rings, so no face/cell bookkeeping — and reassemble the region's
    outline. O(E²) noding — this is the exactness path; scale joins
    pre-filter by bounding box before any kernel runs."""
    segs: list[tuple[Pt, Pt]] = []
    for r in A + B:
        segs.extend(_closed_edges(r))
    noded = _node_segments(segs)

    def member(p: Pt) -> bool:
        ina, inb = _eo_contains(A, p), _eo_contains(B, p)
        if op == "and":
            return ina and inb
        if op == "or":
            return ina or inb
        return ina and not inb

    return _region_outline(noded, member)



def _merge_collinear(line: list[Pt]) -> list[Pt]:
    """Drop interior vertices where consecutive segments are exactly
    collinear and co-directed (the common sampled-polyline case that
    would otherwise be a degenerate capsule-union contact)."""
    if len(line) <= 2:
        return list(line)
    out = [line[0]]
    for i in range(1, len(line) - 1):
        a, b, c = out[-1], line[i], line[i + 1]
        cross = (b[0] - a[0]) * (c[1] - b[1]) - (b[1] - a[1]) * (c[0] - b[0])
        dot_ = (b[0] - a[0]) * (c[0] - b[0]) + (b[1] - a[1]) * (c[1] - b[1])
        if cross == 0.0 and dot_ > 0:
            continue
        out.append(b)
    out.append(line[-1])
    return out


def _buffer_polyline(
    line: list[Pt], r: float, quad_segs: int = 8
) -> list[list[Pt]]:
    """GENERAL multi-segment polyline buffer (GEOS ST_Buffer on a
    LINESTRING with turns — the last named hole of the delegated-GEOS
    buffer family): each segment becomes the exact capsule
    (_buffer_line_capsule), and the capsules merge through the
    multi-ring union — round joins arise naturally because adjacent
    capsules share the full end-fan circle around the joint vertex.
    Exactly-collinear co-directed runs are pre-merged (they would be a
    degenerate capsule contact); a residual degenerate contact
    (U-turn, tangency) fails loud through the GH kernel. A
    self-approaching polyline whose buffer encloses a cavity
    legitimately returns that cavity as a CW hole ring."""
    if len(line) < 2:
        raise ValueError("buffer_polyline needs >= 2 points")
    if r <= 0:
        raise ValueError("buffer_polyline needs a positive radius")
    pts = _merge_collinear(line)
    caps = [
        _ccw(_buffer_line_capsule([pts[i], pts[i + 1]], r, quad_segs))
        for i in range(len(pts) - 1)
    ]
    return _union_rings_via_faces(caps)


def st_buffer_polyline_arrow(
    line: Column, radius: float, quad_segs: int = 8
) -> Column:
    """ST_Buffer of a multi-segment LINESTRING (see
    :func:`_buffer_polyline`); returns the multi-ring geometry."""

    @F.pandas_udf(_LINES_T)
    def _bp_udf(s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if ln is None
                else _rings_to_rows(
                    _buffer_polyline(_to_pts(ln), radius, quad_segs)
                )
                for ln in s
            ]
        )

    return _bp_udf(line)
