import pytest




def test_asof_ignores_null_time_right_rows(spark):
    from pg_datalake_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10), (1, 20)], "k int, t int")
    right = spark.createDataFrame(
        [(1, None, "phantom"), (1, 5, "real"), (None, 1, "nullkey")],
        "k int, t int, v string",
    )
    got = {(r.k, r.t): r.v for r in asof_join(left, right, "k", "t", "t").collect()}
    # the NULL-time right row must never be the match (SQL: r.t <= l.t
    # is NULL, not TRUE); the NULL-key row matches no key
    assert got == {(1, 10): "real", (1, 20): "real"}


def test_interval_overlap_join_matches_naive(spark):
    """Binned equi-join overlap == naive theta join on random-ish
    intervals (incl. negative coordinates and zero-length spans)."""
    from pg_datalake_spark.operators.intervals import interval_overlap_join
    from pyspark.sql import functions as F

    rows_a = [(i, (i * 37) % 100 - 50, (i * 37) % 100 - 50 + (i % 13)) for i in range(60)]
    rows_b = [(j, (j * 53) % 90 - 45, (j * 53) % 90 - 45 + (j % 7)) for j in range(40)]
    a = spark.createDataFrame(rows_a, "a_id long, a_start long, a_end long")
    b = spark.createDataFrame(rows_b, "b_id long, b_start long, b_end long")
    for bin_width in (1, 5, 64):
        got = {
            (r.a_id, r.b_id)
            for r in interval_overlap_join(a, b, bin_width=bin_width).collect()
        }
        naive = {
            (r.a_id, r.b_id)
            for r in a.crossJoin(b)
            .filter((F.col("a_start") <= F.col("b_end")) & (F.col("b_start") <= F.col("a_end")))
            .collect()
        }
        assert got == naive, f"bin_width={bin_width}"


def test_stratified_sample_partitioning_invariant(spark):
    """The sample must be a pure function of the DATA — identical row
    selection whatever the physical partitioning (the reproducibility
    contract that distinguishes it from TABLESAMPLE)."""
    from pg_datalake_spark.operators.sampling import stratified_sample

    rows = [(i, "g%d" % (i % 4)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, g string")
    picks = []
    for parts in (1, 7, 32):
        got = stratified_sample(df.repartition(parts), ["g"], "id", 0.2)
        picks.append({(r.id, r.g) for r in got.collect()})
    assert picks[0] == picks[1] == picks[2]
    # exact ceil-fraction per stratum
    from collections import Counter

    per_group = Counter(g for _, g in picks[0])
    assert all(v == 25 for v in per_group.values())  # ceil(125 * 0.2)


def test_profile_exact_and_approx(spark):
    from pg_datalake_spark.operators.sampling import profile

    df = spark.createDataFrame(
        [(i % 100, "v%d" % (i % 7) if i % 11 else None) for i in range(2000)],
        "k long, s string",
    )
    exact = {r["column"]: r for r in profile(df).collect()}
    assert exact["k"].n == 2000 and exact["k"].n_distinct == 100
    assert exact["s"].n_null == 2000 // 11 + 1
    assert exact["s"].n_distinct == 7
    assert exact["k"].min_str == "0"

    approx = {r["column"]: r for r in profile(df, approx=True).collect()}
    for c in ("k", "s"):
        assert abs(approx[c].n_distinct - exact[c].n_distinct) <= max(
            2, exact[c].n_distinct * 0.1
        )
        assert approx[c].n == exact[c].n and approx[c].n_null == exact[c].n_null


def test_ivf_index_persistence_and_preassigned_search(spark, tmp_path):
    """Saved centroids round-trip exactly; searching a materialized
    cluster-partitioned corpus gives the same top-k as the on-the-fly
    path, and the probe filter prunes partitions in the scan plan."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from pg_datalake_spark.catalog import load_tables
    from pg_datalake_spark.operators.ivf import (
        ivf_assign,
        ivf_topk,
        ivf_topk_preassigned,
        load_ivf_index,
        save_ivf_index,
        train_ivf_centroids,
    )

    from tests.conftest import SF_DIR

    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    cents = train_ivf_centroids(emb, k=8, iterations=2)
    idx_path = str(tmp_path / "ivf_idx")
    save_ivf_index(spark, cents, idx_path)
    assert load_ivf_index(spark, idx_path) == cents

    store = str(tmp_path / "assigned")
    ivf_assign(emb, cents).write.partitionBy("cluster").parquet(store)
    assigned = spark.read.parquet(store)

    qv = list(emb.filter(F.col("vec_id") == 3).select("embedding").first()[0])
    a = [(r.vec_id, round(r.cos_sim, 6)) for r in ivf_topk(emb, cents, qv, k=10).collect()]
    b = [
        (r.vec_id, round(r.cos_sim, 6))
        for r in ivf_topk_preassigned(assigned, cents, qv, k=10).collect()
    ]
    assert a == b

    plan_buf = io.StringIO()
    with redirect_stdout(plan_buf):
        ivf_topk_preassigned(assigned, cents, qv, k=10).explain()
    assert "PartitionFilters: [cluster" in plan_buf.getvalue().replace("#", " #").replace(
        "cluster #", "cluster"
    ) or "cluster" in plan_buf.getvalue().split("PartitionFilters")[1][:80]


def test_gap_fill_locf_semantics(spark):
    """Known-value LOCF: holes carry the last observation; leading
    holes before any observation stay null; is_filled marks synthesis."""
    from pg_datalake_spark.operators.timeseries import gap_fill_locf

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 30, 4.0), ("b", 10, 9.0)],
        "g string, bucket long, v double",
    )
    out = {
        (r.g, r.bucket): (r.value, r.is_filled)
        for r in gap_fill_locf(df, "bucket", ["g"], "v", 10).collect()
    }
    assert out[("a", 0)] == (1.0, False)
    assert out[("a", 10)] == (1.0, True)   # carried
    assert out[("a", 20)] == (1.0, True)   # carried
    assert out[("a", 30)] == (4.0, False)
    assert out[("b", 10)] == (9.0, False)
    assert len(out) == 5  # dense grid spans each group's own extent


def test_gap_fill_interpolate(spark):
    """Linear interpolation between observations; edge holes fall back
    to the nearest observed value."""
    from pg_datalake_spark.operators.timeseries import gap_fill_interpolate

    df = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 40, 7.0), ("b", 0, 5.0)],
        "g string, bucket long, v double",
    )
    out = {
        (r.g, r.bucket): (r.value, r.is_filled)
        for r in gap_fill_interpolate(df, "bucket", ["g"], "v", 10).collect()
    }
    assert out[("a", 10)] == (1.0, False)
    assert out[("a", 20)] == (3.0, True)   # 1 + (7-1)*1/3
    assert out[("a", 30)] == (5.0, True)   # 1 + (7-1)*2/3
    assert out[("a", 40)] == (7.0, False)
    assert out[("b", 0)] == (5.0, False)
    assert len(out) == 5


def test_audio_decode_and_decimate(spark):
    """Fake-PCM audio path: decode extracts header + signal stats;
    decimation halves rate/samples and keeps exactly the strided
    samples; malformed blobs degrade to sentinel metadata."""
    import struct as _struct

    import numpy as _np

    from pg_datalake_spark.operators.multimodal import (
        AUDIO_HEADER_FMT,
        AUDIO_HEADER_LEN,
        AUDIO_MAGIC,
        decode_audio,
        pcm_decimate,
    )

    pcm = _np.arange(-100, 100, dtype="<i2")  # 200 samples
    blob = _struct.pack(AUDIO_HEADER_FMT, AUDIO_MAGIC, 16000, pcm.size) + pcm.tobytes()
    df = spark.createDataFrame([(1, bytearray(blob)), (2, bytearray(b"junk"))],
                               "id long, data binary")

    meta = {r.id: r for r in decode_audio(df).collect()}
    assert (meta[1].sample_rate, meta[1].n_samples) == (16000, 200)
    assert meta[1].peak == 100
    assert abs(meta[1].rms - float(_np.sqrt(_np.mean(pcm.astype(float) ** 2)))) < 1e-9
    assert meta[2].sample_rate == -1 and meta[2].rms is None

    dec = {r.id: r for r in decode_audio(pcm_decimate(df, 2)).collect()}
    assert (dec[1].sample_rate, dec[1].n_samples) == (8000, 100)
    got = _np.frombuffer(
        bytes({r.id: r for r in pcm_decimate(df, 2).collect()}[1].data),
        dtype="<i2", offset=AUDIO_HEADER_LEN,
    )
    assert (got == pcm[::2]).all()
    assert bytes({r.id: r for r in pcm_decimate(df, 2).collect()}[2].data) == b"junk"


def test_impute_median_and_validation(spark):
    from pg_datalake_spark.operators.sampling import impute

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", 10.0), ("b", None)],
        "g string, v double",
    )
    med = {(r.g, i): r.v for i, r in enumerate(impute(df, ["v"], ["g"], "median").collect())}
    vals = [v for (g, _), v in med.items() if g == "a"]
    assert sorted(vals) == [1.0, 2.0, 3.0]  # null → median(1,3)=2
    assert sorted(v for (g, _), v in med.items() if g == "b") == [10.0, 10.0]
    # global (ungrouped) imputation
    glob = impute(df.select("v"), ["v"], strategy="mean").collect()
    assert all(r.v is not None for r in glob)
    import pytest as _pt

    with _pt.raises(ValueError, match="mean|median"):
        impute(df, ["v"], ["g"], "mode")


def test_pack_sequences_matches_global_cumsum(spark):
    """The 16-bucket distributed prefix sum must equal the naive
    single-window global cumsum, for any repartitioning; boundaries
    cut exactly at the budget."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pg_datalake_spark.operators.sampling import pack_sequences

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("n_tok")
    )
    packed = pack_sequences(df.repartition(13), "doc_id", "n_tok", budget=100)
    naive = df.withColumn(
        "start_naive",
        F.coalesce(
            F.sum("n_tok").over(
                Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    joined = packed.join(naive, "doc_id")
    assert joined.filter(F.col("start_pos") != F.col("start_naive")).count() == 0
    # every doc's sequence is its start offset divided by the budget
    assert (
        joined.filter(F.col("seq_id") != F.floor(F.col("start_naive") / 100)).count()
        == 0
    )
    # offsets are dense: max start + its tokens == total tokens
    total = df.agg(F.sum("n_tok")).first()[0]
    last = packed.orderBy(F.desc("start_pos")).select("start_pos", "n_tok").first()
    assert last.start_pos + last.n_tok == total


def test_scalable_percentiles_match_native(spark):
    """Value-counted exact percentiles/mode (operators/quantiles.py)
    must equal Spark's NATIVE percentile_cont / explicit mode on the
    same grouped frame — including interpolated (frac != 0) ranks and
    per-group distinct counts."""
    from pyspark.sql import functions as F

    from pg_datalake_spark.operators.quantiles import (
        grouped_exact_mode,
        grouped_exact_percentiles,
    )

    df = spark.range(10007).select(
        (F.col("id") % 3).alias("g"),
        (F.round((F.col("id") * 37 % 1000) / 7.0 * 100) / 100).alias("v"),
    )
    ours = grouped_exact_percentiles(
        df, ["g"], [("v", 0.5, "p50"), ("v", 0.9, "p90"), ("v", 0.123, "p123")]
    )
    native = df.groupBy("g").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY v)").alias("n50"),
        F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY v)").alias("n90"),
        F.expr("percentile_cont(0.123) WITHIN GROUP (ORDER BY v)").alias("n123"),
    )
    joined = ours.join(native, "g").collect()
    assert len(joined) == 3
    for r in joined:
        assert abs(r.p50 - r.n50) < 1e-9, r
        assert abs(r.p90 - r.n90) < 1e-9, r
        assert abs(r.p123 - r.n123) < 1e-9, r

    m = grouped_exact_mode(df, ["g"], "v", "mv").collect()
    expect = {
        r.g: r.v
        for r in df.groupBy("g", "v").count()
        .withColumn(
            "rk",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("g").orderBy(F.desc("count"), F.asc("v"))
            ),
        )
        .filter(F.col("rk") == 1)
        .collect()
    }
    assert {r.g: r.mv for r in m} == expect


def test_hll_mergeable_rollup_invariants(spark):
    """The mergeable-sketch rollup (x10) must satisfy (a) the merge
    identity — union of hourly sketches gives the IDENTICAL estimate
    as sketching the day directly (same registers, deterministic) —
    and (b) the datasketches error bound vs exact distinct counts
    (lgK=14 → ~1.6% stderr; assert 5%)."""
    from pyspark.sql import functions as F

    from pg_datalake_spark.catalog import load_tables
    from tests.conftest import SF_DIR

    ev = load_tables(spark, SF_DIR, ["events"])["events"]
    day = F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day")
    hour = F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour")
    hourly = ev.groupBy(day, hour).agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    merged = hourly.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    direct = ev.groupBy(day).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("direct_est"),
        F.countDistinct("user_id").alias("exact"),
    )
    rows = merged.join(direct, "day").collect()
    assert rows
    for r in rows:
        assert r.est == r.direct_est, r   # merge identity, exact
        assert abs(r.est - r.exact) / r.exact < 0.05, r


def test_asof_join_directions_and_tolerance(spark):
    """asof_join forward/nearest/tolerance vs the naive theta-join
    formulations (exact agreement, including no-match NULLs and
    pandas' backward tie preference for nearest)."""
    from pyspark.sql import functions as F

    from pg_datalake_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(k, t) for k in (1, 2) for t in (5, 10, 15, 20, 25)], "k long, lt long"
    )
    right = spark.createDataFrame(
        [(1, 4, "a"), (1, 10, "b"), (1, 22, "c"),
         (2, 7, "x"), (2, 18, "y"), (2, 30, "z")],
        "k long, rt long, val string",
    )
    left.createOrReplaceTempView("asof_l")
    right.createOrReplaceTempView("asof_r")

    def naive(cmp_dir):
        if cmp_dir == "backward":
            pick = "ORDER BY r.rt DESC, r.val DESC"
            cond = "r.rt <= l.lt"
        else:
            pick = "ORDER BY r.rt ASC, r.val ASC"
            cond = "r.rt >= l.lt"
        return {
            (r.k, r.lt): (r.rt, r.val)
            for r in spark.sql(f"""
                SELECT l.k, l.lt, r.rt, r.val,
                       row_number() OVER (PARTITION BY l.k, l.lt {pick}) AS rn
                FROM asof_l l JOIN asof_r r ON l.k = r.k AND {cond}
            """).filter("rn = 1").collect()
        }

    for direction in ("backward", "forward"):
        expect = naive(direction)
        got = asof_join(left, right, "k", "lt", "rt", direction=direction)
        for r in got.collect():
            exp = expect.get((r.k, r.lt), (None, None))
            assert (r.rt, r.val) == exp, (direction, r)

    # nearest: closest in |dt|, backward wins ties
    b, f = naive("backward"), naive("forward")
    got = {(r.k, r.lt): (r.rt, r.val)
           for r in asof_join(left, right, "k", "lt", "rt", direction="nearest").collect()}
    for key in got:
        k, lt = key
        cand_b, cand_f = b.get(key), f.get(key)
        if cand_b is None:
            assert got[key] == (cand_f or (None, None)), key
        elif cand_f is None:
            assert got[key] == cand_b, key
        else:
            db, df_ = lt - cand_b[0], cand_f[0] - lt
            assert got[key] == (cand_b if db <= df_ else cand_f), key

    # tolerance: backward matches farther than 3 are nulled
    got = asof_join(left, right, "k", "lt", "rt", tolerance=3)
    for r in got.collect():
        exp = b.get((r.k, r.lt))
        if exp is not None and r.lt - exp[0] <= 3:
            assert (r.rt, r.val) == exp, r
        else:
            assert r.rt is None and r.val is None, r


def test_asof_join_matches_pandas_merge_asof(spark):
    """asof_join vs pandas.merge_asof (THE reference implementation)
    on seeded random data — all three directions and a tolerance, per
    key, including keys with no right rows."""
    import random

    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from pg_datalake_spark.operators.asof import asof_join

    rng = random.Random(42)
    left_rows = sorted(
        {(rng.randint(1, 6), rng.randint(0, 1000)) for _ in range(150)}
    )
    right_rows = sorted(
        {(rng.randint(1, 5), rng.randint(0, 1000)) for _ in range(100)}
    )
    lpdf = pd.DataFrame(left_rows, columns=["k", "lt"])
    rpdf = pd.DataFrame(
        [(k, t, f"p{k}_{t}") for k, t in right_rows], columns=["k", "rt", "val"]
    )
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)

    for direction, tol in [("backward", None), ("forward", None),
                           ("nearest", None), ("backward", 25)]:
        expected = pd.merge_asof(
            lpdf.sort_values("lt"),
            rpdf.sort_values("rt"),
            left_on="lt", right_on="rt", by="k",
            direction=direction, tolerance=tol,
        )
        exp = {(r.k, r.lt): (None if pd.isna(r.rt) else int(r.rt),
                             None if pd.isna(r.rt) else r.val)
               for r in expected.itertuples()}
        got = asof_join(left, right, "k", "lt", "rt",
                        direction=direction, tolerance=tol)
        for r in got.collect():
            assert (r.rt, r.val) == exp[(r.k, r.lt)], (direction, tol, r)


def test_convexhull_idempotent_and_monotone(spark):
    """hull(hull(P) ∪ interior) == hull(P): idempotence plus
    insensitivity to added interior points, on seeded random clouds."""
    import random

    from pyspark.sql import functions as F

    from pg_datalake_spark.functions import spatial as S

    rng = random.Random(7)
    rows = []
    for _ in range(12):
        pts = [{"x": rng.uniform(-5, 5), "y": rng.uniform(-5, 5)}
               for _ in range(rng.randint(5, 15))]
        rows.append({"pts": pts})
    df = spark.createDataFrame(rows, "pts array<struct<x:double,y:double>>")
    staged = df.select(
        "pts", S.st_convexhull(F.col("pts")).alias("h1"),
        S.st_centroid(F.col("pts")).alias("c"),
    ).select(
        "h1",
        S.st_convexhull(F.concat(F.col("h1"), F.array(F.col("c")))).alias("h2"),
    )
    out = staged.select(
        S.st_area(F.col("h1")).alias("a1"),
        S.st_area(F.col("h2")).alias("a2"),
        S.st_npoints(F.col("h1")).alias("n1"),
        S.st_npoints(F.col("h2")).alias("n2"),
    ).collect()
    for r in out:
        assert r.n1 == r.n2 and abs(r.a1 - r.a2) < 1e-9, r


def test_source_mixing_properties(spark):
    """Temperature mixing invariants at several α: targets sum to
    ~total_k (rounding slack ≤ |sources|/2), α=1 is proportional, α=0
    is uniform, smaller α upweights small sources, and the sampled set
    is deterministic across calls and honors per-source targets."""
    from pg_datalake_spark.operators.sampling import (
        source_mixing_sample,
        source_mixing_targets,
    )

    rows = [(i, f"s{min(i % 10, 3)}") for i in range(2000)]  # skewed sizes
    df = spark.createDataFrame(rows, "id long, src string")

    per_alpha = {}
    for alpha in (0.0, 0.5, 1.0):
        t = {
            r.source: r
            for r in source_mixing_targets(df, "src", 400, alpha=alpha).collect()
        }
        per_alpha[alpha] = t
        assert abs(sum(x.target_k for x in t.values()) - 400) <= len(t) / 2 + 1
    sizes = {s: per_alpha[1.0][s].n_docs for s in per_alpha[1.0]}
    small, big = min(sizes, key=sizes.get), max(sizes, key=sizes.get)
    # α=0 uniform: every target within 1 of each other
    t0 = [x.target_k for x in per_alpha[0.0].values()]
    assert max(t0) - min(t0) <= 1
    # lower α gives the small source a larger share than α=1 does
    share = lambda a, s: per_alpha[a][s].target_k / sum(
        x.target_k for x in per_alpha[a].values()
    )
    assert share(0.5, small) > share(1.0, small)
    assert share(0.5, big) < share(1.0, big)

    s1 = source_mixing_sample(df, "id", "src", 400, alpha=0.5, salt="t").collect()
    s2 = source_mixing_sample(df, "id", "src", 400, alpha=0.5, salt="t").collect()
    assert sorted((r.id, r.source) for r in s1) == sorted(
        (r.id, r.source) for r in s2
    )
    from collections import Counter

    got = Counter(r.source for r in s1)
    for s, row in per_alpha[0.5].items():
        assert got[s] == min(row.target_k, row.n_docs)


def test_exact_substring_spans_planted(spark):
    from pg_datalake_spark.operators.dedup import exact_substring_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"intro words here {shared} and a unique tail one"),
        (2, f"different opening {shared} closing text two here"),
        (3, "totally unique document with no repeated runs at all ok"),
        # internal repetition: the same 8-token run twice in ONE doc
        (4, f"{shared} bridge tokens in between {shared}"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in exact_substring_spans(df, "doc_id", "text", k=8).collect()}
    # doc 3 has no duplicated span -> absent
    assert 3 not in got
    assert set(got) == {1, 2, 4}
    # docs 1/2: exactly one duplicated 8-gram, union length = 8
    assert got[1].n_dup_spans == 1 and got[1].dup_tokens == 8
    assert got[2].n_dup_spans == 1 and got[2].dup_tokens == 8
    # doc 4: the run appears at positions 1 and 13 -> two spans, union 16
    assert got[4].n_dup_spans == 2 and got[4].dup_tokens == 16
    assert got[4].first_dup_pos == 1 and got[4].last_dup_pos == 13


def test_exact_substring_spans_overlap_union(spark):
    from pg_datalake_spark.operators.dedup import exact_substring_spans

    # a shared 9-token run -> two overlapping 8-gram spans per doc,
    # union length must be 9 (not 16)
    run = "one two three four five six seven eight nine"
    rows = [(1, f"{run} filler a"), (2, f"prefix {run} z")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in exact_substring_spans(df, "doc_id", "text", k=8).collect()}
    assert got[1].n_dup_spans == 2
    assert got[1].dup_tokens == 9
    assert got[2].dup_tokens == 9


def test_exact_substring_hash_grams_equivalent_on_corpus(spark):
    """r8: the 100 TB shuffle-width option (xxhash64 gram hashing)
    must produce the IDENTICAL span census as the exact-string path
    on the real documents corpus — collisions are a 2^-64 event, so
    any difference here is a bug, not bad luck."""
    from pg_datalake_spark.catalog import load_tables
    from pg_datalake_spark.operators.dedup import exact_substring_spans
    from tests.conftest import SF_DIR

    docs = load_tables(spark, SF_DIR, ["documents"])["documents"].select(
        "doc_id", "text"
    )
    exact = sorted(
        tuple(r) for r in exact_substring_spans(docs, "doc_id").collect()
    )
    hashed = sorted(
        tuple(r)
        for r in exact_substring_spans(docs, "doc_id", hash_grams=True).collect()
    )
    assert exact and exact == hashed


def test_quality_tier_sample_invariants(spark):
    from pg_datalake_spark.operators.sampling import quality_tier_sample

    df = spark.createDataFrame(
        [(i, (i * 37) % 100) for i in range(200)], ["id", "score"]
    )
    out = quality_tier_sample(df, "id", "score", salt="t").collect()
    assert len(out) == 200  # tiers partition the corpus, nothing dropped
    by_tier = {}
    for r in out:
        by_tier.setdefault(r.tier, []).append(r)
    assert set(by_tier) == {"head", "middle", "tail"}
    # head rate 1.0 keeps everything
    assert all(r.kept for r in by_tier["head"])
    # head scores all <= middle scores min; tail all >= middle max
    assert max(r.score for r in by_tier["head"]) <= min(
        r.score for r in by_tier["middle"]
    )
    assert min(r.score for r in by_tier["tail"]) >= max(
        r.score for r in by_tier["middle"]
    )
    # deterministic across invocations
    out2 = quality_tier_sample(df, "id", "score", salt="t").collect()
    assert sorted((r.id, r.tier, r.kept) for r in out) == sorted(
        (r.id, r.tier, r.kept) for r in out2
    )


def test_pagerank_dangling_and_mass_conservation(spark):
    from pg_datalake_spark.operators.graph import pagerank

    # 1 -> 2 -> 3, node 3 dangling; hand-computable reference
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    nodes = spark.createDataFrame([(1,), (2,), (3,)], ["node"])

    def ref2(iters):
        # uses the PRE-update ranks for contributions (synchronous PR)
        d, n = 0.85, 3
        r = {1: 1 / 3, 2: 1 / 3, 3: 1 / 3}
        for _ in range(iters):
            dm = r[3]
            new = {
                1: (1 - d) / n + d * (0.0 + dm / n),
                2: (1 - d) / n + d * (r[1] / 1 + dm / n),
                3: (1 - d) / n + d * (r[2] / 1 + dm / n),
            }
            r = new
        return r

    for iters in (1, 3):
        got = {r.node: r["rank"] for r in
               pagerank(edges, nodes=nodes, iterations=iters).collect()}
        exp = ref2(iters)
        for k in (1, 2, 3):
            assert abs(got[k] - exp[k]) < 1e-12, (iters, k, got[k], exp[k])
        assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_phash_neardup_finds_exactly_the_planted_siblings(spark):
    from pyspark.sql import functions as F

    from pg_datalake_spark.operators import multimodal as mm

    df = spark.range(60).select(
        F.col("id").alias("img_id"),
        mm.fake_textured_media(F.col("id")).alias("data"),
    )
    pairs = mm.phash_neardup_pairs(df, "img_id", max_hamming=3).collect()
    got = sorted((r.id_a, r.id_b) for r in pairs)
    assert got == [(2 * k, 2 * k + 1) for k in range(30)]
    assert all(r.hamming <= 3 for r in pairs)


def test_dhash_invariance_and_sensitivity(spark):
    import struct as st

    from pg_datalake_spark.operators import multimodal as mm

    header = st.pack("<4sHHI", b"LAKE", 64, 32, 1)
    base = bytes(range(128))
    tweaked = bytearray(base)
    tweaked[5] ^= 0x10  # one-byte edit -> small hamming
    gradient_rev = bytes(reversed(base))  # structurally different
    rows = [(1, header + base), (2, header + bytes(tweaked)),
            (3, header + gradient_rev), (4, None), (5, header[:4])]
    df = spark.createDataFrame(rows, "img_id long, data binary")
    h = {r.img_id: r.dhash for r in mm.dhash64(df, "data").collect()}
    assert bin((h[1] ^ h[2]) & ((1 << 64) - 1)).count("1") <= 3
    assert bin((h[1] ^ h[3]) & ((1 << 64) - 1)).count("1") > 10
    assert h[4] is not None and h[5] is not None  # degenerate blobs hash too


def test_phash_band_bits_32_multiprobe_matches_16_bit_exactly(spark):
    import pytest as pt
    from pyspark.sql import functions as F

    from pg_datalake_spark.operators import multimodal as mm

    df = spark.range(40).select(
        F.col("id").alias("img_id"),
        mm.fake_textured_media(F.col("id")).alias("data"),
    )
    # the new scale default (32-bit bands + auto single-bit multi-probe)
    # must find the IDENTICAL hamming<=3 pair set as the explicit 16-bit
    # opt-in, whose 4-band pigeonhole guarantees distance 3 outright
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.phash_neardup_pairs(df, "img_id", max_hamming=3).collect()
    }
    full = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.phash_neardup_pairs(
            df, "img_id", max_hamming=3, band_bits=16
        ).collect()
    }
    assert got == full
    assert all(b == a + 1 and a % 2 == 0 for a, b in got)
    # non-probed 32-bit mode only guarantees hamming <= 1 and must
    # refuse a distance it cannot serve
    near = {
        (r.id_a, r.id_b)
        for r in mm.phash_neardup_pairs(
            df, "img_id", max_hamming=1, band_bits=32, multi_probe=False
        ).collect()
    }
    for pair, ham in full.items():
        if ham <= 1:
            assert pair in near
    with pt.raises(ValueError, match="pigeonhole"):
        mm.phash_neardup_pairs(
            df, "img_id", max_hamming=3, band_bits=32, multi_probe=False
        )
    with pt.raises(ValueError, match="band_bits"):
        mm.phash_neardup_pairs(df, "img_id", band_bits=64)


def test_bm25_topk_self_retrieval_and_shape(spark):
    """r8: a query built from a document's own leading tokens must
    retrieve that document at rank 1; scores are positive and
    non-increasing within a query; no query-doc cartesian survives."""
    from pg_datalake_spark.operators.textstats import bm25_topk

    rows = [
        (1, "alpha beta gamma delta unique1 filler common"),
        (2, "epsilon zeta eta theta unique2 other common"),
        (3, "iota kappa lam mu unique3 words common"),
        (4, "completely different vocabulary here nothing shared"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "epsilon zeta unique2")],
        "q_id long, q_text string",
    )
    got = bm25_topk(docs, queries, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    for qid, hits in by_q.items():
        hits.sort(key=lambda r: r.rank)
        assert hits[0].doc_id == qid  # self-retrieval at rank 1
        scores = [h.score for h in hits]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)
        # doc 4 shares no term with either query -> never a candidate
        assert all(h.doc_id != 4 for h in hits)


def test_dsir_scores_separate_target_domain(spark):
    """r8: documents drawn from the target vocabulary must outscore
    documents from a disjoint vocabulary; mixed docs land between."""
    from pg_datalake_spark.operators.sampling import dsir_scores

    tgt_words = "alpha beta gamma delta epsilon"
    other_words = "one two three four five"
    rows = (
        [(i, tgt_words, "en") for i in range(20)]
        + [(100 + i, other_words, "xx") for i in range(20)]
        + [(200, f"{tgt_words} {other_words}", "xx")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r.score for r in dsir_scores(df, "lang = 'en'").collect()}
    tgt_score, other_score, mixed = got[0], got[100], got[200]
    assert tgt_score > mixed > other_score
    assert all(got[i] == tgt_score for i in range(20))  # identical docs, identical score
    assert got[0] > 0 > got[100]  # target-looking up, off-domain down


def test_semantic_dedup_drops_planted_twins(spark):
    """r8 SemDeDup: exact/near-identical planted twins are dropped in
    favor of the lowest id; distant vectors survive; dup_of points at
    a kept lower id in the same cluster."""
    from pg_datalake_spark.operators.ivf import train_ivf_centroids
    from pg_datalake_spark.operators.similarity import semantic_dedup

    import math

    def unit(angle):
        return [math.cos(angle), math.sin(angle)] + [0.0] * 6

    rows = []
    # 5 well-separated base directions; each gets 3 near-identical
    # copies. Ids are laid out so the FIRST k ids (k-means init picks
    # them) span the distinct directions, not one group's copies.
    for g in range(5):
        base = g * 1.2
        for c in range(3):
            rows.append((g + c * 100, unit(base + c * 0.001)))
    # one far-away singleton (id 50 -> part of the init set)
    rows.append((50, unit(4.5)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(df, k=6, iterations=3)
    got = {r.vec_id: r for r in semantic_dedup(df, cents, eps=0.01).collect()}
    assert len(got) == 16
    for g in range(5):
        ids = [g + c * 100 for c in range(3)]
        kept = [i for i in ids if got[i].kept]
        dropped = [i for i in ids if not got[i].kept]
        assert kept == [ids[0]]  # lowest id survives
        assert all(got[i].dup_of == ids[0] for i in dropped)
    assert got[50].kept and got[50].dup_of is None


def test_exact_substring_excise_consistent_with_census(spark):
    """r8: n_removed must equal the span census's interval-union
    dup_tokens for every doc; the planted duplicated run disappears
    from the cleaned text while unique words survive in order."""
    from pg_datalake_spark.operators.dedup import (
        exact_substring_excise,
        exact_substring_spans,
    )

    run = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    rows = [
        (1, f"keepA keepB {run} keepC"),
        (2, f"keepD {run} keepE keepF"),
        (3, "totally unique document three alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ex = {r.doc_id: r for r in exact_substring_excise(df, "doc_id", "text", k=8).collect()}
    sp = {r.doc_id: r for r in exact_substring_spans(df, "doc_id", "text", k=8).collect()}
    for d in (1, 2):
        assert ex[d].n_removed == sp[d].dup_tokens == 9
    assert ex[1].clean_text == "keepa keepb keepc"
    assert ex[2].clean_text == "keepd keepe keepf"
    assert ex[3].n_removed == 0
    assert ex[3].clean_text == rows[2][1]
    # full-doc duplication degenerates to empty text, not a crash
    twin = spark.createDataFrame(
        [(1, run), (2, run)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in exact_substring_excise(twin, "doc_id", "text", k=8).collect()}
    assert out[1].clean_text == "" and out[1].n_removed == 9


def test_gopher_quality_flags_rules(spark):
    """r8: each Gopher rule flips on its own planted violation."""
    from pg_datalake_spark.operators.textstats import gopher_quality_flags

    good = ("the cat and the dog have fun with a ball of yarn that " * 6).strip()
    rows = [
        (1, good),                                     # passes everything
        (2, "too short to pass the word count"),       # rule 1
        (3, good + " " + "#" * 1 + " #tag " + "# # # # # # # # #"),  # rule 3
        (4, good + "\n" + "\n".join("- item" for _ in range(30))),   # rule 4
        (5, good + "\n" + "\n".join("cliff hanger..." for _ in range(20))),  # rule 5
        (6, good + " " + " ".join("123456" for _ in range(40))),     # rule 6
        (7, ("lorem ipsum dolor sit amet " * 12).strip()),           # rule 7
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert got[1].passes_gopher
    assert not got[2].ok_word_count and not got[2].passes_gopher
    assert not got[3].ok_symbol_ratio
    assert not got[4].ok_bullet_lines
    assert not got[5].ok_ellipsis_lines
    assert not got[6].ok_alpha_words
    assert not got[7].ok_stopwords


def test_lsh_planted_recall_meets_banding_bound(spark):
    """r9 (judge task 7): the ANN tier's 'recall < 1 by construction'
    becomes a CHECKED contract. Pairs planted at controlled angle θ
    collide per hyperplane with p = 1 - θ/π, per band with p^r, and
    OR-banding gives expected recall R = 1-(1-p^r)^b
    (operators/similarity.lsh_bucketed_pairs docstring). Observed
    planted-pair recall must reach R minus a 3σ binomial margin.
    Deterministic: md5 planes + seeded corpus."""
    import math

    import numpy as np

    from pg_datalake_spark.operators.similarity import lsh_bucketed_pairs

    rng = np.random.default_rng(11)
    dim, n_pairs, thresh = 32, 40, 0.93
    theta = math.radians(16.0)  # planted cosine ~0.961 > thresh
    vecs: dict[int, np.ndarray] = {}
    for i in range(n_pairs):
        u = rng.standard_normal(dim)
        u /= np.linalg.norm(u)
        w = rng.standard_normal(dim)
        w -= (w @ u) * u
        w /= np.linalg.norm(w)
        vecs[2 * i] = u
        vecs[2 * i + 1] = math.cos(theta) * u + math.sin(theta) * w
    for j in range(150):  # background noise, near-orthogonal at dim 32
        g = rng.standard_normal(dim)
        vecs[10_000 + j] = g / np.linalg.norm(g)

    # exact ground truth (numpy): the planted pairs must be the ONLY
    # pairs at/above the threshold, else the corpus invalidates the test
    ids = sorted(vecs)
    M = np.stack([vecs[i] for i in ids])
    sims = M @ M.T
    iu = np.triu_indices(len(ids), k=1)
    exact = {
        (ids[a], ids[b])
        for a, b in zip(*iu)
        if sims[a, b] >= thresh
    }
    planted = {(2 * i, 2 * i + 1) for i in range(n_pairs)}
    assert exact == planted, "corpus produced unplanned near pairs"

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    r, b = 6, 6
    got = lsh_bucketed_pairs(
        df, dims=dim, num_planes=r, num_bands=b, threshold=thresh
    ).collect()
    found = {(x.id_a, x.id_b) for x in got}
    # precision is 1.0 by construction (exact-cosine verify per band)
    assert found <= planted
    recall = len(found & planted) / n_pairs
    p = 1 - theta / math.pi
    expected = 1 - (1 - p**r) ** b
    sigma = math.sqrt(expected * (1 - expected) / n_pairs)
    assert recall >= expected - 3 * sigma - 0.02, (recall, expected)


def test_ivf_planted_neighbor_recall(spark):
    """r9: IVF planted-recall — a query's true top-k (numpy exact) must
    be recovered when probing enough lists; nprobe=len(centroids)
    degrades to exact brute force by construction."""
    import numpy as np

    from pg_datalake_spark.operators.ivf import ivf_topk, train_ivf_centroids

    rng = np.random.default_rng(5)
    dim, n = 16, 400
    M = rng.standard_normal((n, dim))
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    q = M[7] * 0.9 + rng.standard_normal(dim) * 0.05  # near row 7
    df = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    cents = train_ivf_centroids(df, k=8, vec_col="embedding", iterations=5)
    sims = M @ (q / np.linalg.norm(q))
    true_top5 = set(np.argsort(-sims)[:5].tolist())

    full = {r.vec_id for r in ivf_topk(df, cents, list(q), k=5,
                                       nprobe=len(cents)).collect()}
    assert full == true_top5  # all-lists probe == exact brute force
    probed = {r.vec_id for r in ivf_topk(df, cents, list(q), k=5,
                                         nprobe=3).collect()}
    # the planted nearest neighbor itself must survive a partial probe
    # (its cluster is by definition among the nearest to the query)
    assert 7 in probed
    assert len(probed & true_top5) >= 3  # recall >= 0.6 at nprobe 3/8


def test_lsh_hot_bucket_cap_bounds_pairs_and_keeps_links(spark):
    """r10 (judge task #4): the batch LSH hot-bucket cap. One token
    shared by every doc = one bucket holding the whole corpus; with
    max_bucket=m the pair set is exactly {(a,b): rank(a) <= m, a < b}
    — O(n·m), every overflow doc still linked into the cluster — and
    buckets at/under the cap emit the full pair set unchanged."""
    from pg_datalake_spark.operators import dedup

    n, cap = 50, 8
    docs = spark.createDataFrame(
        [(f"d{i:03d}", "the same boilerplate text everywhere") for i in range(n)],
        "doc_id string, text string",
    )
    sh = dedup.with_shingles(docs, "doc_id", "text")
    sigs = dedup.signatures_from_shingles(sh, "doc_id")
    capped = dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket=cap).collect()
    ids = sorted(f"d{i:03d}" for i in range(n))
    expected = {
        (ids[i], ids[j]) for i in range(cap) for j in range(i + 1, n)
    }
    assert {(r.id_a, r.id_b) for r in capped} == expected
    assert len(capped) == cap * n - cap * (cap + 1) // 2
    # every doc keeps at least one link into the hot cluster
    linked = {r.id_a for r in capped} | {r.id_b for r in capped}
    assert linked == set(ids)
    # cap >= bucket size: full half-matrix, identical to uncapped
    full = dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket=n).collect()
    uncapped = dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket=None).collect()
    assert (
        {(r.id_a, r.id_b) for r in full}
        == {(r.id_a, r.id_b) for r in uncapped}
        == {(a, b) for a in ids for b in ids if a < b}
    )


def test_lsh_candidate_source_has_no_collect_set():
    """The hot-bucket fix is structural: bucket membership must never be
    collected into a single array row."""
    import inspect

    from pg_datalake_spark.operators import dedup

    src = inspect.getsource(dedup.lsh_candidate_pairs)
    assert "collect_set" not in src
    assert "collect_list" not in src


def test_jaccard_verify_broadcast_is_conditional(spark):
    """r10 (judge task #5): the candidate-side broadcast hint must be
    conditional — forced True plans a broadcast join on the pairs side,
    forced False leaves the join strategy to the optimizer/AQE, and the
    auto path picks by a counted threshold. Results identical."""
    from pg_datalake_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            ("a", "alpha beta gamma delta epsilon zeta eta theta"),
            ("b", "alpha beta gamma delta epsilon zeta eta iota"),
            ("c", "one two three four five six seven eight"),
        ],
        "doc_id string, text string",
    )
    sh = dedup.with_shingles(docs, "doc_id", "text")
    pairs = spark.createDataFrame([("a", "b")], "id_a string, id_b string")

    hinted = dedup.jaccard_verify_shingles(pairs, sh, "doc_id", 0.1,
                                           broadcast_pairs=True)
    unhinted = dedup.jaccard_verify_shingles(pairs, sh, "doc_id", 0.1,
                                             broadcast_pairs=False)
    # the hint survives analysis only in the True branch
    hinted_plan = hinted._jdf.queryExecution().analyzed().toString()
    unhinted_plan = unhinted._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in hinted_plan
    assert "ResolvedHint" not in unhinted_plan
    for df in (hinted, unhinted):
        got = df.collect()
        assert len(got) == 1 and (got[0].id_a, got[0].id_b) == ("a", "b")
    # auto path: tiny candidate set -> counted, broadcast branch, same rows
    auto = dedup.jaccard_verify_shingles(pairs, sh, "doc_id", 0.1)
    assert [(r.id_a, r.id_b) for r in auto.collect()] == [("a", "b")]
    auto_small_limit = dedup.jaccard_verify_shingles(
        pairs, sh, "doc_id", 0.1, broadcast_limit=0
    )
    assert "ResolvedHint" not in (
        auto_small_limit._jdf.queryExecution().analyzed().toString()
    )


@pytest.mark.slow
def test_lsh_hot_bucket_scale_probe(spark):
    """r10 scale probe for the hot-bucket fix: 200k documents sharing
    IDENTICAL text put the whole corpus into one bucket per band — the
    old collect_set plan materialized a single 200k-element array row
    per band; the window-ranked plan streams it. With max_bucket=32
    the candidate count is exactly cap*n - cap(cap+1)/2 (the capped
    half-matrix), counted without ever holding a bucket in one row."""
    import time

    from pyspark.sql import functions as F

    from pg_datalake_spark.operators import dedup

    n, cap = 200_000, 32
    docs = spark.range(n).select(
        F.format_string("doc%07d", "id").alias("doc_id"),
        F.lit("the same boilerplate text everywhere forever").alias("text"),
    )
    sh = dedup.with_shingles(docs, "doc_id", "text")
    sigs = dedup.signatures_from_shingles(sh, "doc_id")
    t0 = time.perf_counter()
    got = dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket=cap).count()
    wall = time.perf_counter() - t0
    assert got == cap * n - cap * (cap + 1) // 2
    print(f"\nLSH hot-bucket probe: n={n}, cap={cap}, "
          f"{got} pairs in {wall:.1f}s")


def test_pq_planted_cluster_recall_and_self_hit(spark):
    """r10: product quantization (operators/pq.py). On PLANTED
    clustered vectors (where quantization must shine — cluster members
    share codes) ADC recall@10 vs exact brute force is high; on any
    corpus, a query that IS an indexed vector must retrieve itself
    (code identity); codes are m bytes with values < k."""
    import numpy as np

    from pg_datalake_spark.operators import pq
    from pg_datalake_spark.operators.similarity import cosine_topk

    rng = np.random.RandomState(3)
    centers = rng.normal(size=(32, 64)) * 10
    rows = []
    for i in range(512):
        c = i % 32
        v = centers[c] + rng.normal(size=64) * 0.3
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    books = pq.train_pq_codebooks(emb, m=8, k=16, sample=512)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    enc = pq.pq_encode(emb, books).persist()
    codes = {r.vec_id: r.pq_code for r in enc.collect()}
    assert all(len(c) == 8 and max(c) < 16 and min(c) >= 0 for c in codes.values())

    qs = [(i, rows[i][1]) for i in (0, 7, 130, 301)]
    approx = pq.pq_adc_topk(enc, books, qs, topk=10).collect()
    got: dict = {}
    for r in approx:
        got.setdefault(r.q_id, set()).add(r.vec_id)
    recalls = []
    for q_id, qv in qs:
        exact = {r.vec_id for r in cosine_topk(emb, qv, k=10).collect()}
        recalls.append(len(got[q_id] & exact) / 10)
        assert q_id in got[q_id]  # self-hit: identical code wins
        # the REAL PQ guarantee on planted data: every retrieved
        # neighbor is from the query's true cluster (cluster members
        # share codes, so within-cluster order is tie-broken by id and
        # strict recall@10 vs the exact ORDER is structurally ~0.6 —
        # pigeonhole floor 0.4 over a 16-member cluster)
        assert all(v % 32 == q_id % 32 for v in got[q_id]), (q_id, got[q_id])
    assert sum(recalls) / len(recalls) >= 0.4, recalls
    enc.unpersist()


def test_pq_guards_and_determinism(spark):
    from pg_datalake_spark.operators import pq

    emb = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="not divisible"):
        pq.train_pq_codebooks(emb, m=2, k=4)
    # same seed + same sample -> identical codebooks (driver determinism)
    emb64 = spark.createDataFrame(
        [(i, [float((i * j) % 7) for j in range(8)]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    b1 = pq.train_pq_codebooks(emb64, m=4, k=4, sample=50)
    b2 = pq.train_pq_codebooks(emb64, m=4, k=4, sample=50)
    assert b1 == b2


def test_ivf_assign_arrow_path_matches_literal_path(spark):
    """r11: ivf_assign switches to the Arrow/numpy argmin above
    _ARROW_ASSIGN_MIN_K centroids (the literal-expression plan grows
    O(k·dim) and measured 21x at the 10x probe when k = n/128 hit
    156). Both paths must assign identically — first-max tiebreak
    included."""
    import numpy as np
    from pyspark.sql import functions as F

    from pg_datalake_spark.operators import ivf

    rng = np.random.RandomState(9)
    cents = [list(map(float, rng.normal(size=8))) for _ in range(40)]
    rows = [
        (i, [float(x) for x in rng.normal(size=8)]) for i in range(300)
    ]
    # plant exact duplicates of centroids (tie-adjacent cases)
    rows += [(300 + j, list(cents[j])) for j in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lit = {
        r.vec_id: r.cluster
        for r in df.withColumn(
            "cluster", ivf._centroid_argmin(F.col("embedding"), cents)
        ).collect()
    }
    arrow = {
        r.vec_id: r.cluster
        for r in ivf._assign_arrow(df, cents, "embedding").collect()
    }
    assert lit == arrow
    # and the public API picks the arrow path at this k (>= 33)
    assert len(cents) >= ivf._ARROW_ASSIGN_MIN_K
    pub = {r.vec_id: r.cluster for r in ivf.ivf_assign(df, cents).collect()}
    assert pub == arrow
