"""Geospatial coverage query (st_* minimal surface).

Occupies driver-window slot 50 (src01+src02 were merged to free it),
so every column below is exact-hash-checked against a plain-SQL
arithmetic oracle — planar point/ring/envelope geometry over struct
columns is exactly expressible in ANSI SQL, giving the st_*
implementations a hard value-level check without DuckDB's spatial
extension (not loadable offline). Reference surface:
pg_lake_engine/src/pgduck/shippable_spatial_functions.c (~70 st_*
functions; this is the core planar subset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.functions import spatial as S
from pg_datalake_spark.plans.registry import register


@register(
    "geo01_spatial",
    oracle="""
    WITH pts AS (
      SELECT c_mktsegment, c_acctbal / 1000 AS x, (c_custkey % 100) / 10.0 AS y
      FROM customer
    ), g AS (
      SELECT c_mktsegment,
             count(*) AS n,
             count(*) FILTER (power(x - 5, 2) + power(y - 5, 2) <= 9.0) AS n_near,
             CAST(sum(CAST(sqrt(power(x - 5, 2) + power(y - 5, 2)) AS DECIMAL(30,10)))
                  AS DOUBLE) AS sum_dist,
             min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y,
             count(*) FILTER (x > -0.500005 AND x < 10.000005
                              AND y > -0.05 AND y < 9.85) AS n_inside
      FROM pts GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n, n_near, sum_dist, min_x, max_x, n_inside,
           round((max_x - min_x) * (max_y - min_y), 6)       AS bbox_area,
           round(2 * ((max_x - min_x) + (max_y - min_y)), 6) AS bbox_perim,
           round((min_x + max_x) / 2, 6) AS cx, round((min_y + max_y) / 2, 6) AS cy,
           CAST(4 AS INT) AS ring_n,
           round(2 * (max_x - min_x) + (max_y - min_y), 6) AS corner_len,
           round((min_x + max_x) / 2 + 1.5, 6) AS tx,
           round((min_y + max_y) / 2 - 0.25, 6) AS ty,
           CAST(min_x - 0.5 <= 6.0 AND 4.0 <= max_x + 0.5
                AND min_y - 0.5 <= 6.0 AND 4.0 <= max_y + 0.5 AS INT) AS hits_env,
           round(CASE WHEN min_x - 0.5 <= 6.0 AND 4.0 <= max_x + 0.5
                       AND min_y - 0.5 <= 6.0 AND 4.0 <= max_y + 0.5
                      THEN least(max_x + 0.5, 6.0) - greatest(min_x - 0.5, 4.0)
                 END, 6) AS ix_w,
           CAST(1 AS INT) AS diag_hit,
           CAST(0 AS INT) AS diag_gap,
           round((min_x + max_x) / 2, 6) AS dix_x,
           round((min_y + max_y) / 2, 6) AS dix_y,
           CAST(min_x - 0.5 <= 6.0 AND 4.0 <= max_x + 0.5
                AND min_y - 0.5 <= 6.0 AND 4.0 <= max_y + 0.5 AS INT) AS ring_hit,
           round(0.5 * 16 * 4.0 * sin(2 * pi() / 16), 6) AS buf_area,
           round(16 * 2 * 2.0 * sin(pi() / 16), 6) AS buf_perim,
           round(least(
             sqrt(power(greatest(min_x - 5.0, 5.0 - max_x, 0), 2)
                  + power(5.0 - min_y, 2)),
             sqrt(power(max_x - 5.0, 2)
                  + power(greatest(min_y - 5.0, 5.0 - max_y, 0), 2)),
             sqrt(power(greatest(min_x - 5.0, 5.0 - max_x, 0), 2)
                  + power(5.0 - max_y, 2))
           ), 6) AS office_line_dist,
           round(greatest(max_x + 0.5, 6.0) - least(min_x - 0.5, 4.0), 6) AS union_w
    FROM g
    """,
)
def geo01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st_point/st_x/st_y/st_distance/st_dwithin/st_contains (ray
    cast) over a synthetic point cloud derived from customer, plus
    ring functions (st_area/st_perimeter/st_centroid/st_npoints) on
    the per-group bounding-box polygon. The oracle states the same
    geometry as scalar arithmetic, so every st_* value is hash-checked
    against an engine with no geometry type at all. Rectangle bounds
    sit off the representable grid of the derived coordinates so no
    point lies on a boundary (st_contains boundary behavior is
    implementation-defined)."""
    t = load_tables(spark, sf_dir, ["customer"])
    home = S.st_point(F.col("c_acctbal") / 1000, (F.col("c_custkey") % 100) / 10)
    office = S.st_point(F.lit(5.0), F.lit(5.0))
    rect = F.array(
        S.st_point(F.lit(-0.500005), F.lit(-0.05)),
        S.st_point(F.lit(10.000005), F.lit(-0.05)),
        S.st_point(F.lit(10.000005), F.lit(9.85)),
        S.st_point(F.lit(-0.500005), F.lit(9.85)),
    )
    g = (
        t["customer"]
        .select("c_mktsegment", home.alias("home"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.count(
                F.when(S.st_dwithin(F.col("home"), office, 3.0), 1)
            ).alias("n_near"),
            F.sum(
                S.st_distance(F.col("home"), office).cast("decimal(30,10)")
            )
            .cast("double")
            .alias("sum_dist"),
            S.st_extent(F.col("home")).alias("ext"),
            F.count(F.when(S.st_contains(rect, F.col("home")), 1)).alias("n_inside"),
        )
        .select(
            "*",
            F.col("ext.xmin").alias("min_x"),
            F.col("ext.xmax").alias("max_x"),
            F.col("ext.ymin").alias("min_y"),
            F.col("ext.ymax").alias("max_y"),
        )
    )
    bbox = F.array(
        S.st_point(F.col("min_x"), F.col("min_y")),
        S.st_point(F.col("max_x"), F.col("min_y")),
        S.st_point(F.col("max_x"), F.col("max_y")),
        S.st_point(F.col("min_x"), F.col("max_y")),
    )
    # envelope algebra arm: expand the group bbox, test against a fixed
    # probe envelope, measure the intersection width
    probe = S.st_makeenvelope(4.0, 4.0, 6.0, 6.0)
    grown = S.st_expand(F.col("ext"), 0.5)
    inter = S.st_bbox_intersection(grown, probe)
    # open 4-point corner walk (3 edges) for st_makeline/st_length
    corner = S.st_makeline(
        S.st_point(F.col("min_x"), F.col("min_y")),
        S.st_point(F.col("max_x"), F.col("min_y")),
        S.st_point(F.col("max_x"), F.col("max_y")),
        S.st_point(F.col("min_x"), F.col("max_y")),
    )
    moved = S.st_translate(S.st_centroid(bbox), 1.5, -0.25)
    # round-5 tier: segment predicates/intersection, ring-ring
    # intersects, point buffer, point-to-line distance, bbox union
    mn = S.st_point(F.col("min_x"), F.col("min_y"))
    mx = S.st_point(F.col("max_x"), F.col("max_y"))
    lo_hi = S.st_point(F.col("min_x"), F.col("max_y"))
    hi_lo = S.st_point(F.col("max_x"), F.col("min_y"))
    center = S.st_centroid(bbox)
    gap_a2 = center
    gap_b1 = S.st_point(S.st_x(center) + 1.0, S.st_y(center))
    gap_b2 = S.st_point(S.st_x(center) + 2.0, S.st_y(center))
    dix = S.st_segment_intersection(mn, mx, lo_hi, hi_lo)
    grown_ring = F.array(
        S.st_point(grown["xmin"], grown["ymin"]),
        S.st_point(grown["xmax"], grown["ymin"]),
        S.st_point(grown["xmax"], grown["ymax"]),
        S.st_point(grown["xmin"], grown["ymax"]),
    )
    probe_ring = F.array(
        S.st_point(F.lit(4.0), F.lit(4.0)),
        S.st_point(F.lit(6.0), F.lit(4.0)),
        S.st_point(F.lit(6.0), F.lit(6.0)),
        S.st_point(F.lit(4.0), F.lit(6.0)),
    )
    buf = S.st_buffer(center, 2.0, segments=16)
    office_pt = S.st_point(F.lit(5.0), F.lit(5.0))
    union_env = S.st_bbox_union(grown, probe)
    return g.select(
        "c_mktsegment",
        "n",
        "n_near",
        "sum_dist",
        "min_x",
        "max_x",
        "n_inside",
        # round(6): shoelace/edge-walk evaluation order differs from the
        # oracle's factored arithmetic by last-ulp floats
        F.round(S.st_area(bbox), 6).alias("bbox_area"),
        F.round(S.st_perimeter(bbox), 6).alias("bbox_perim"),
        F.round(S.st_x(S.st_centroid(bbox)), 6).alias("cx"),
        F.round(S.st_y(S.st_centroid(bbox)), 6).alias("cy"),
        S.st_npoints(bbox).alias("ring_n"),
        F.round(S.st_length(corner), 6).alias("corner_len"),
        F.round(S.st_x(moved), 6).alias("tx"),
        F.round(S.st_y(moved), 6).alias("ty"),
        S.st_bbox_intersects(grown, probe).cast("int").alias("hits_env"),
        F.round(inter["xmax"] - inter["xmin"], 6).alias("ix_w"),
        S.st_segment_intersects(mn, mx, lo_hi, hi_lo).cast("int").alias("diag_hit"),
        S.st_segment_intersects(mn, gap_a2, gap_b1, gap_b2).cast("int").alias("diag_gap"),
        F.round(S.st_x(dix), 6).alias("dix_x"),
        F.round(S.st_y(dix), 6).alias("dix_y"),
        S.st_intersects(grown_ring, probe_ring).cast("int").alias("ring_hit"),
        F.round(S.st_area(buf), 6).alias("buf_area"),
        F.round(S.st_perimeter(buf), 6).alias("buf_perim"),
        F.round(S.st_distance_to_line(office_pt, corner), 6).alias("office_line_dist"),
        F.round(union_env["xmax"] - union_env["xmin"], 6).alias("union_w"),
    )


@register(
    "geo02_grid_spatial_join",
    oracle="""
    WITH pts AS (
      SELECT c_custkey, c_acctbal / 1000 AS x, (c_custkey % 100) / 10.0 AS y
      FROM customer
    ),
    rings AS (
      SELECT * FROM (VALUES (1, 3.0000005, 3.0000005, 2.0),
                            (2, 7.0000005, 5.0000005, 2.5),
                            (3, 5.0000005, 8.0000005, 1.5))
             r(ring_id, cx, cy, rr)
    )
    SELECT ring_id, count(*) AS n_pts, CAST(sum(c_custkey) AS BIGINT) AS key_sum
    FROM pts JOIN rings ON abs(x - cx) + abs(y - cy) < rr
    GROUP BY ring_id
    """,
)
def geo02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points-in-polygons via the grid-binned filter-and-refine spatial
    join (functions.spatial.grid_spatial_join): three diamond rings
    (L1 balls — their ray-cast containment equals the oracle's
    |x-cx|+|y-cy| < r arithmetic, with off-grid centers so no point
    sits on a boundary), customer-derived point cloud. The key-sum
    hash-checks that both engines put the IDENTICAL points in each
    polygon; the plan is a broadcast equi-join on grid cells — the
    point side never shuffles and never nested-loops."""
    t = load_tables(spark, sf_dir, ["customer"])
    pts = t["customer"].select(
        "c_custkey",
        (F.col("c_acctbal") / 1000).alias("x"),
        ((F.col("c_custkey") % 100) / 10.0).alias("y"),
    )

    def diamond(cx: float, cy: float, r: float):
        return F.array(
            S.st_point(F.lit(cx + r), F.lit(cy)),
            S.st_point(F.lit(cx), F.lit(cy + r)),
            S.st_point(F.lit(cx - r), F.lit(cy)),
            S.st_point(F.lit(cx), F.lit(cy - r)),
        )

    rings = spark.createDataFrame(
        [(1,), (2,), (3,)], "ring_id int"
    ).withColumn(
        "ring",
        F.when(F.col("ring_id") == 1, diamond(3.0000005, 3.0000005, 2.0))
        .when(F.col("ring_id") == 2, diamond(7.0000005, 5.0000005, 2.5))
        .otherwise(diamond(5.0000005, 8.0000005, 1.5)),
    )
    joined = S.grid_spatial_join(pts, ("x", "y"), rings, "ring", cell=1.0)
    return joined.groupBy("ring_id").agg(
        F.count("*").alias("n_pts"),
        F.sum("c_custkey").cast("long").alias("key_sum"),
    )


@register(
    "geo03_knn_radius_join",
    oracle="""
    WITH pts AS (
      SELECT c_custkey, c_acctbal / 1000 AS x, (c_custkey % 100) / 10.0 AS y
      FROM customer
    ),
    a AS (SELECT c_custkey AS a_id, x, y FROM pts WHERE c_custkey % 10 = 1),
    b AS (SELECT c_custkey AS b_id, x AS bx, y AS by FROM pts WHERE c_custkey % 7 = 0),
    cand AS (
      SELECT a_id, b_id,
             sqrt((a.x - b.bx) * (a.x - b.bx) + (a.y - b.by) * (a.y - b.by)) AS dist
      FROM a JOIN b ON (a.x - b.bx) * (a.x - b.bx) + (a.y - b.by) * (a.y - b.by) <= 1.0
    ),
    ranked AS (
      SELECT a_id, b_id, dist,
             row_number() OVER (PARTITION BY a_id ORDER BY dist, b_id) AS rk
      FROM cand
    )
    SELECT a_id, b_id, dist FROM ranked WHERE rk <= 3
    """,
)
def geo03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-bounded k-nearest-neighbor join (3 nearest facilities
    within radius 1.0 per query point) via the 3×3 grid-neighborhood
    equi-join (functions.spatial.knn_within_radius_join) — exact by
    construction, vs the oracle's quadratic theta join. Distances are
    x*x-form (IEEE-exact, no libm pow), so the doubles hash-match
    unrounded; ties break on b_id for engine-independent ranking."""
    t = load_tables(spark, sf_dir, ["customer"])
    pts = t["customer"].select(
        "c_custkey",
        (F.col("c_acctbal") / 1000).alias("x"),
        ((F.col("c_custkey") % 100) / 10.0).alias("y"),
    )
    a = pts.filter(F.col("c_custkey") % 10 == 1).select(
        F.col("c_custkey").alias("a_id"), "x", "y"
    )
    b = pts.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
    )
    from pg_datalake_spark.functions.spatial import knn_within_radius_join

    out = knn_within_radius_join(a, "a_id", ("x", "y"), b, "b_id", ("bx", "by"),
                                 radius=1.0, k=3)
    return out.select("a_id", "b_id", "dist")


@register(
    "geo04_convex_clip_union",
    oracle="""
    WITH g AS (
      SELECT n_nationkey AS nk,
             1.0 + (n_nationkey % 4) * 0.25 AS h,
             1.5 + (n_nationkey % 4) * 0.25 AS r
      FROM nation
    )
    SELECT nk, h, r,
           round(2 * r * r - 4 * (r - h) * (r - h), 6) AS ia,
           round(4 * sqrt(2) * (2 * h - r) + 8 * (r - h), 6) AS ip,
           CAST(8 AS INT) AS inp,
           CAST(1 AS INT) AS icvx,
           round(4 * h * h + 4 * (r - h) * (r - h), 6) AS ua,
           round(4 * sqrt(2) * (2 * r - 2 * h) + 8 * (2 * h - r), 6) AS up,
           CAST(16 AS INT) AS unp,
           CAST(0 AS INT) AS ucvx,
           round(2 * r * r, 6) AS ca,
           CAST(4 AS INT) AS cnp
    FROM g
    """,
)
def geo04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convex polygon boolean ops (round-6 tier: st_intersection_convex
    = Sutherland–Hodgman clip as a Column-algebra fold,
    st_union_convex = star-shaped merge, st_isconvex): a diamond
    (L1 ball, radius r) clipped by / merged with a co-centered square
    (half-width h, with h < r < 2h so the overlap is a proper octagon
    and the union a non-convex 16-gon), plus the containment case
    (tiny square inside the diamond collapses to the diamond). The
    oracle states every measure in closed form — intersection area
    2r²−4(r−h)², union area 4h²+4(r−h)², the √2 perimeter identities
    — so the clip machinery is value-checked against an engine with no
    geometry type. Per the module's usage note, each result ring is
    materialized once per projection and measured from the column.
    Reference surface:
    pg_lake_engine/src/pgduck/shippable_spatial_functions.c
    (ST_Intersection/ST_Union)."""
    t = load_tables(spark, sf_dir, ["nation"])
    base = t["nation"].select(
        F.col("n_nationkey").cast("int").alias("nk"),
        (1.0 + (F.col("n_nationkey") % 4) * 0.25).alias("h"),
        (1.5 + (F.col("n_nationkey") % 4) * 0.25).alias("r"),
        ((F.col("n_nationkey") % 7)).cast("double").alias("cx"),
        ((F.col("n_nationkey") * 3 % 5)).cast("double").alias("cy"),
    )
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
    ringed = base.select(
        "nk", "h", "r",
        S.st_intersection_convex(diamond, square).alias("inter"),
        S.st_union_convex(diamond, square).alias("uni"),
        S.st_union_convex(diamond, small).alias("ucont"),
    )
    inter, uni, ucont = F.col("inter"), F.col("uni"), F.col("ucont")
    return ringed.select(
        "nk", "h", "r",
        F.round(S.st_area(inter), 6).alias("ia"),
        F.round(S.st_perimeter(inter), 6).alias("ip"),
        S.st_npoints(inter).alias("inp"),
        S.st_isconvex(inter).cast("int").alias("icvx"),
        F.round(S.st_area(uni), 6).alias("ua"),
        F.round(S.st_perimeter(uni), 6).alias("up"),
        S.st_npoints(uni).alias("unp"),
        S.st_isconvex(uni).cast("int").alias("ucvx"),
        F.round(S.st_area(ucont), 6).alias("ca"),
        S.st_npoints(ucont).alias("cnp"),
    )


@register(
    "geo05_convex_hull",
    oracle="""
    WITH g AS (
      SELECT n_nationkey AS nk,
             5 + n_nationkey % 4 AS k,
             1.0 + (n_nationkey % 3) * 0.5 AS big_r
      FROM nation
    )
    SELECT nk, CAST(k AS INT) AS k,
           round(k * big_r * big_r * sin(2 * pi() / k) / 2, 6) AS ha,
           round(2 * k * big_r * sin(pi() / k), 6) AS hp,
           CAST(k AS INT) AS hn,
           CAST(1 AS INT) AS hcvx
    FROM g
    """,
)
def geo05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st_convexhull (Jarvis-march fold) value check: per nation row,
    a regular k-gon on a circle of radius R plus three strictly
    interior points (listed FIRST, so the hull must exclude them and
    re-order the rest). Hull area/perimeter have closed forms
    (k·R²·sin(2π/k)/2, 2kR·sin(π/k)); the oracle computes those
    directly, proving the wrap keeps exactly the k circle points in
    convex order. Reference surface:
    pg_lake_engine/src/pgduck/shippable_spatial_functions.c
    (ST_ConvexHull)."""
    import math

    t = load_tables(spark, sf_dir, ["nation"])
    base = t["nation"].select(
        F.col("n_nationkey").cast("int").alias("nk"),
        (5 + F.col("n_nationkey") % 4).cast("int").alias("k"),
        (1.0 + (F.col("n_nationkey") % 3) * 0.5).alias("big_r"),
        (F.col("n_nationkey") % 7).cast("double").alias("cx"),
        (F.col("n_nationkey") * 3 % 5).cast("double").alias("cy"),
    )
    k, R, cx, cy = F.col("k"), F.col("big_r"), F.col("cx"), F.col("cy")
    tau = F.lit(2 * math.pi)
    circle = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda j: S.st_point(cx + R * F.cos(tau * j / k), cy + R * F.sin(tau * j / k)),
    )
    interior = F.array(
        S.st_point(cx, cy),
        S.st_point(cx + R / 4, cy - R / 8),
        S.st_point(cx - R / 8, cy + R / 4),
    )
    ringed = base.select(
        "nk", "k", S.st_convexhull(F.concat(interior, circle)).alias("hull")
    )
    return ringed.select(
        "nk", "k",
        F.round(S.st_area(F.col("hull")), 6).alias("ha"),
        F.round(S.st_perimeter(F.col("hull")), 6).alias("hp"),
        S.st_npoints(F.col("hull")).alias("hn"),
        S.st_isconvex(F.col("hull")).cast("int").alias("hcvx"),
    )


@register(
    "geo06_simplify_radial",
    oracle="""
    WITH g AS (
      SELECT n_nationkey AS nk, 4 + n_nationkey % 4 AS k FROM nation
    )
    SELECT nk, CAST(3 * k + 1 AS INT) AS n_in,
           CAST(k + 1 AS INT) AS n_kept,
           round(2.6 * k, 6) AS kept_length
    FROM g
    """,
)
def geo06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st_simplify_radial value check with a closed-form oracle: a
    collinear path repeating spacings (0.3, 0.3, 2.0) under tolerance
    1.0 keeps exactly the start plus every third point (the two 0.3
    hops stay under tolerance, the cumulative 2.6 hop exceeds it), so
    kept count = k+1 and simplified length = 2.6·k exactly."""
    t = load_tables(spark, sf_dir, ["nation"])
    base = t["nation"].select(
        F.col("n_nationkey").cast("int").alias("nk"),
        (4 + F.col("n_nationkey") % 4).cast("int").alias("k"),
    )
    k = F.col("k")
    # x_i for i in 0..3k: cumulative of the repeating (0.3, 0.3, 2.0)
    xs = F.transform(
        F.sequence(F.lit(0), 3 * k),
        lambda i: F.floor(i / 3) * 2.6
        + F.when(i % 3 == 1, 0.3).when(i % 3 == 2, 0.6).otherwise(0.0),
    )
    line = F.transform(xs, lambda x: S.st_point(x, F.lit(0.0)))
    ringed = base.select(
        "nk", "k", F.size(line).cast("int").alias("n_in"),
        S.st_simplify_radial(line, 1.0).alias("simp"),
    )
    return ringed.select(
        "nk",
        "n_in",
        S.st_npoints(F.col("simp")).alias("n_kept"),
        F.round(S.st_length(F.col("simp")), 6).alias("kept_length"),
    )


@register(
    "geo07_geodesic",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey % 160 AS DOUBLE) - 80.0 + 0.25 AS lat,
             CAST((c_custkey * 7) % 360 AS DOUBLE) - 180.0 + 0.5 AS lon
      FROM customer
    ),
    anchors(aname, alat, alon) AS (
      VALUES ('alpha', 51.5, -0.1), ('beta', 40.7, -74.0),
             ('gamma', -33.9, 151.2), ('delta', 35.7, 139.7)
    ),
    d AS (
      SELECT c_custkey, aname,
             CAST(round(6371008.8 * 2 * asin(least(1.0, sqrt(
               sin(radians(alat - lat) / 2) * sin(radians(alat - lat) / 2)
               + cos(radians(lat)) * cos(radians(alat))
                 * sin(radians(alon - lon) / 2) * sin(radians(alon - lon) / 2)
             ))), 0) AS BIGINT) AS d_m,
             round(CASE WHEN atan2(sin(radians(alon - lon)) * cos(radians(alat)),
                                   cos(radians(lat)) * sin(radians(alat))
                                   - sin(radians(lat)) * cos(radians(alat))
                                     * cos(radians(alon - lon))) < 0
                        THEN atan2(sin(radians(alon - lon)) * cos(radians(alat)),
                                   cos(radians(lat)) * sin(radians(alat))
                                   - sin(radians(lat)) * cos(radians(alat))
                                     * cos(radians(alon - lon))) + 2 * pi()
                        ELSE atan2(sin(radians(alon - lon)) * cos(radians(alat)),
                                   cos(radians(lat)) * sin(radians(alat))
                                   - sin(radians(lat)) * cos(radians(alat))
                                     * cos(radians(alon - lon)))
                   END, 6) AS az
      FROM pts CROSS JOIN anchors
    ),
    nearest AS (
      SELECT c_custkey, aname, d_m, az,
             row_number() OVER (PARTITION BY c_custkey
                                ORDER BY d_m, aname) AS rk
      FROM d
    )
    SELECT aname,
           count(*) AS n_nearest,
           round(CAST(sum(d_m) AS DOUBLE) / count(*), 6) AS avg_m,
           CAST(sum(CASE WHEN d_m <= 5000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within_5000km,
           CAST(sum(CAST(az AS DECIMAL(30,6))) AS DOUBLE) AS sum_az
    FROM nearest WHERE rk = 1
    GROUP BY aname
    """,
)
def geo07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic tier (reference: st_distance_sphere / geography
    st_dwithin in shippable_spatial_functions.c): customers get
    deterministic lon/lat from their keys, every customer is assigned
    its nearest of four anchor sites by great-circle distance
    (haversine, WGS84 mean radius), and each anchor reports audience
    size, mean distance, a 5,000 km st_dwithin count, and the sum of
    initial bearings. Distances round to whole METERS and hash as
    integers — the one libm-sensitive value never reaches the hash as
    a raw double. The anchor table is 4 rows (broadcast); the rank
    runs per customer over 4 candidates."""
    from pg_datalake_spark.functions.spatial import (
        st_azimuth_geodesic,
        st_distance_sphere,
    )
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["customer"])
    pts = t["customer"].select(
        "c_custkey",
        ((F.col("c_custkey") % 160).cast("double") - 80.0 + 0.25).alias("lat"),
        (((F.col("c_custkey") * 7) % 360).cast("double") - 180.0 + 0.5).alias("lon"),
    )
    anchors = spark.createDataFrame(
        [("alpha", 51.5, -0.1), ("beta", 40.7, -74.0),
         ("gamma", -33.9, 151.2), ("delta", 35.7, 139.7)],
        "aname string, alat double, alon double",
    )
    d = pts.crossJoin(F.broadcast(anchors)).select(
        "c_custkey",
        "aname",
        F.round(
            st_distance_sphere(
                F.col("lon"), F.col("lat"), F.col("alon"), F.col("alat")
            ),
            0,
        )
        .cast("long")
        .alias("d_m"),
        F.round(
            st_azimuth_geodesic(
                F.col("lon"), F.col("lat"), F.col("alon"), F.col("alat")
            ),
            6,
        ).alias("az"),
    )
    win = W.partitionBy("c_custkey").orderBy("d_m", "aname")
    nearest = d.withColumn("rk", F.row_number().over(win)).filter(F.col("rk") == 1)
    return nearest.groupBy("aname").agg(
        F.count("*").alias("n_nearest"),
        F.round(F.sum("d_m").cast("double") / F.count("*"), 6).alias("avg_m"),
        F.sum((F.col("d_m") <= 5_000_000).cast("int")).alias("n_within_5000km"),
        F.sum(F.col("az").cast("decimal(30,6)")).cast("double").alias("sum_az"),
    )
