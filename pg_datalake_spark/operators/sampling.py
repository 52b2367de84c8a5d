"""Deterministic sampling operators for training-data pipelines.

TABLESAMPLE is engine-specific randomness (rows-only checkable, o04);
these operators are fully deterministic — hash-ordered, so any engine
reproduces the identical sample — which is what a reproducible
training-data pipeline actually wants (seeded selection that survives
re-runs, engine swaps, and partial recomputation).

Scale: one window per group (single shuffle on the group key); the
hash order is computed per-row JVM-side. Skewed groups parallelize
like any windowed aggregate under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stratified_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    fraction: float,
    min_rows: int = 1,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of each group: rows are ranked
    by md5(id) within the group and the first ceil(fraction * n) kept
    (at least ``min_rows``). Per-group proportions are exact (ceil),
    unlike Bernoulli sampling whose per-group counts fluctuate —
    stratification is the point at 100 TB where small groups must not
    vanish."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    wall = Window.partitionBy(*group_cols)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(wall))
        .filter(
            F.col("__rk")
            <= F.greatest(
                F.ceil(F.col("__n") * F.lit(fraction)), F.lit(min_rows)
            )
        )
        .drop("__rk", "__n")
    )


def profile(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Per-column data profile: count, nulls, distinct count,
    lexicographic min/max (stringified for a uniform schema) — the
    SUMMARIZE-style health check run before a table feeds a pipeline.

    ALL columns' metrics are computed in ONE ``df.agg`` — a single
    scan of the input however many columns are profiled — then the
    one-row result is exploded into the tagged per-column layout
    (driver-trivial: the explode runs over one row).

    ``approx=True`` swaps in HLL ``approx_count_distinct`` (±~2 %):
    every metric is then partial-aggregable, so the whole profile is
    one map-side-combine pass + one tiny reduce — the mode to run on
    a 100 TB table. ``approx=False`` (default) counts distincts
    exactly, which is still one scan but Spark plans the N DISTINCT
    aggregates via expand (each input row is replicated N+1 times
    before the shuffle) — the oracle-checkable mode.
    """
    cols = columns or df.columns
    distinct = F.approx_count_distinct if approx else F.countDistinct
    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.count("*").alias(f"__{i}_n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__{i}_null"),
            distinct(c).alias(f"__{i}_dist"),
            F.min(F.col(c).cast("string")).alias(f"__{i}_min"),
            F.max(F.col(c).cast("string")).alias(f"__{i}_max"),
        ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__{i}_n").alias("n"),
                F.col(f"__{i}_null").alias("n_null"),
                F.col(f"__{i}_dist").alias("n_distinct"),
                F.col(f"__{i}_min").alias("min_str"),
                F.col(f"__{i}_max").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return row.select(F.explode(entries).alias("e")).select("e.*")


def corr_matrix(df: DataFrame, columns: list[str]) -> DataFrame:
    """Pairwise Pearson correlations as tagged rows (col_a, col_b,
    corr), upper triangle only. ONE aggregate pass computes all pairs
    (every F.corr is partial-aggregable — a single map-side-combine
    shuffle regardless of column count); the quadratic blowup is in
    the number of COLUMNS, never rows."""
    pairs = [
        (a, b) for i, a in enumerate(columns) for b in columns[i + 1 :]
    ]
    aggs = [
        F.corr(a, b).alias(f"__c_{i}") for i, (a, b) in enumerate(pairs)
    ]
    row = df.agg(*aggs)
    arms = [
        row.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"__c_{i}").alias("corr"),
        )
        for i, (a, b) in enumerate(pairs)
    ]
    out = arms[0]
    for x in arms[1:]:
        out = out.unionByName(x)
    return out


def impute(
    df: DataFrame,
    value_cols: list[str],
    group_cols: list[str] | None = None,
    strategy: str = "mean",
) -> DataFrame:
    """Fill nulls in ``value_cols`` with the per-group mean or median
    (global when ``group_cols`` is empty) — the feature-cleanup pass
    before model training. Group statistics come from unbounded window
    aggregates, so imputation is one shuffle on the group key with no
    second join; median = exact percentile(0.5) (matches PG/DuckDB
    percentile_cont)."""
    if strategy not in ("mean", "median"):
        raise ValueError(f"strategy must be mean|median, got {strategy!r}")
    w = Window.partitionBy(*(group_cols or []))
    out = df
    for c in value_cols:
        stat = (
            F.avg(c).over(w)
            if strategy == "mean"
            else F.expr(f"percentile({c}, 0.5)").over(w)
        )
        out = out.withColumn(c, F.coalesce(F.col(c), stat))
    return out


def split_by_hash(
    df: DataFrame, id_col: str, splits: dict[str, float], salt: str = ""
) -> DataFrame:
    """Deterministic train/validation/test assignment: each row's
    split comes from md5(salt + id) reduced mod 10_000, carved into
    cumulative weight ranges. Pure function of the id (stable across
    runs, engines, repartitioning, and data appends — rows never
    migrate between splits when the corpus grows, unlike fraction
    sampling). Adds a ``split`` column."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % 10_000
    )
    expr = None
    acc = 0.0
    items = list(splits.items())
    for name, w in items[:-1]:
        acc += w
        cond = bucket < int(round(acc * 10_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
) -> DataFrame:
    """GPT-style sequence packing: order documents deterministically
    (md5(id) — engine-reproducible), concatenate token counts, and cut
    at every ``budget`` tokens; each doc is assigned to the sequence
    its FIRST token lands in. Returns the input plus
    (start_pos, seq_id).

    Scale shape — distributed exclusive prefix sum, never a global
    single-partition window: the md5 hex's first character range-
    buckets the order into 16 runs (the bucket is a PREFIX of the sort
    key, so bucket-major order equals global order); a windowed cumsum
    runs within each bucket in parallel, a 16-row window computes the
    bucket offsets, and a broadcast join stitches them together.
    """
    h = F.md5(F.col(id_col).cast("string"))
    base = df.select("*", h.alias("__h"), F.substring(h, 1, 1).alias("__b"))
    w_in = (
        Window.partitionBy("__b")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum(n_tokens_col).over(w_in), F.lit(0))
    totals = base.groupBy("__b").agg(F.sum(n_tokens_col).alias("__tot"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__tot").over(w_b), F.lit(0)).alias("__off")
    )
    return (
        base.withColumn("__within", within)
        .join(F.broadcast(offsets), "__b")
        .withColumn("start_pos", (F.col("__off") + F.col("__within")).cast("long"))
        .withColumn(
            "seq_id", F.floor(F.col("start_pos") / F.lit(budget)).cast("long")
        )
        .drop("__h", "__b", "__within", "__off")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
    round_digits: int | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-Res,
    Efraimidis-Spirakis): each row draws u ∈ (0,1) from md5(salt+id)
    — reproducible on any engine, any partitioning — and the k rows
    with the largest u^(1/w) are kept, giving inclusion probability
    proportional to ``weight_col``. The quality-weighted corpus
    subsample every data-mixing pipeline needs, stable across re-runs.

    One narrow map + TakeOrdered(k) — the corpus never shuffles.
    Exact-oracle note: both engines derive the IDENTICAL u (md5,
    substring, hex→int are bit-exact everywhere); only ln is libm.
    With ``round_digits`` set, the ranking key is round(ln(u)/w, d)
    with the id tiebreak — the repo's rounded-rank rule — making the
    sample value-hash reproducible against a DuckDB oracle. Without
    it, verification is by property (determinism, weight
    monotonicity).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 13),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**13 + 2))  # strictly inside (0, 1)
    key = F.log(u) / F.col(weight_col)  # maximize u^(1/w) ⇔ maximize ln(u)/w
    if round_digits is not None:
        key = F.round(key, round_digits)
    # A-Res is defined for positive weights only; non-positive rows are
    # unsampleable (a w<0 key would flip sign and dominate the ranking)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__key", key)
        .orderBy(F.desc("__key"), id_col)
        .limit(k)
        .drop("__key")
    )


def source_mixing_targets(
    df: DataFrame,
    source_col: str,
    total_k: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual/multi-source
    pretraining recipe: sample source s with probability ∝ n_s^α,
    α < 1 upweights small sources): per-source target counts for a
    ``total_k``-document budget.

    Exactness discipline: α = 0.5 keeps the per-source weight at
    sqrt(n) (IEEE-exact in every engine); the weight is rounded to 8
    digits and summed as DECIMAL so the normalizing constant is
    order-independent; only the final per-source ratio is a double.
    Other α come from pow() — documented as libm, verify by property.

    One aggregate over the corpus → |sources| rows. Returns
    (source, n_docs, weight, target_k).
    """
    if alpha == 0.5:
        w = F.round(F.sqrt(F.col("n_docs")), 8)
    else:
        w = F.round(F.pow(F.col("n_docs"), F.lit(alpha)), 8)
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs")
    ).withColumn("w", w.cast("decimal(30,8)"))
    total_w = per.agg(F.sum("w").alias("tw")).select(
        F.col("tw").cast("decimal(30,8)").alias("tw")
    )
    return (
        per.crossJoin(F.broadcast(total_w))
        .select(
            "source",
            "n_docs",
            F.col("w").cast("double").alias("weight"),
            F.round(
                F.lit(float(total_k)) * (F.col("w").cast("double") / F.col("tw").cast("double")),
                0,
            )
            .cast("long")
            .alias("target_k"),
        )
    )


def source_mixing_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    total_k: int,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Materialize the temperature-mixed subsample: within each
    source, keep the ``target_k`` documents with the smallest
    md5(salt+id) — deterministic across engines, runs and
    partitionings (same md5-order trick as the hash split / A-Res
    sampler).

    The per-source rank is a window partitioned by source; a single
    giant source makes that partition hot — at 100 TB replace the
    window with a per-source hash-threshold (approx k-th quantile of
    the md5 key, then filter), which needs no per-source sort. At
    verification scale the window IS the exact spec.
    """
    targets = source_mixing_targets(df, source_col, total_k, alpha)
    keyed = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))).alias("__h"),
    )
    win = Window.partitionBy("source").orderBy("__h", id_col)
    ranked = keyed.withColumn("__rk", F.row_number().over(win))
    return (
        ranked.join(F.broadcast(targets.select("source", "target_k")), "source")
        .filter(F.col("__rk") <= F.col("target_k"))
        .select(id_col, "source")
    )


def quality_tier_sample(
    df: DataFrame,
    id_col: str,
    score_col: str,
    q_lo: float = 0.25,
    q_hi: float = 0.75,
    rates: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """CCNet-style quality-tier bucketing + per-tier rate sampling
    (Wenzek et al. 2020: score every document with a cheap quality
    proxy, split the corpus at score quantiles into head/middle/tail,
    keep the tiers at different rates). ``score_col`` must be an
    INTEGER-discretized score (e.g. ``floor(entropy_bits·100)``) so
    the quantile boundaries are exact and engine-reproducible —
    LOWER score = higher quality (head).

    Scale shape: the boundaries come from the value-counted exact
    percentile plan (shuffle = |distinct scores|, not |rows| — the
    a06 machinery), broadcast back as ONE row; tier assignment and
    the md5-rate keep-decision are a narrow map. No global sort, no
    driver collect. Adds ``tier`` and ``kept`` columns."""
    from pg_datalake_spark.operators.quantiles import grouped_exact_percentiles

    if rates is None:
        rates = {"head": 1.0, "middle": 0.5, "tail": 0.1}
    if set(rates) != {"head", "middle", "tail"}:
        raise ValueError(
            "rates must cover exactly {'head','middle','tail'}; "
            f"got {sorted(rates)}"
        )
    bounds = grouped_exact_percentiles(
        df.withColumn("__g", F.lit(1)),
        ["__g"],
        [(score_col, q_lo, "__q_lo"), (score_col, q_hi, "__q_hi")],
        scale=1,
    ).drop("__g")
    tiered = df.crossJoin(F.broadcast(bounds)).withColumn(
        "tier",
        F.when(F.col(score_col) <= F.col("__q_lo"), "head")
        .when(F.col(score_col) >= F.col("__q_hi"), "tail")
        .otherwise("middle"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 10_000
    )
    rate = None
    for name, r in rates.items():
        cond = F.col("tier") == name
        lim = F.lit(int(round(r * 10_000)))
        rate = F.when(cond, lim) if rate is None else rate.when(cond, lim)
    return tiered.withColumn("kept", bucket < rate).drop("__q_lo", "__q_hi")


def dsir_scores(
    docs: DataFrame,
    target_predicate: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    alpha: float = 0.01,
) -> DataFrame:
    """DSIR importance weighting (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its hashed-unigram bag is under the TARGET
    distribution than under the RAW corpus distribution —
    ``score = mean_tokens ln(p_target(bucket)/p_raw(bucket))`` with
    add-α smoothing over ``n_buckets`` hash buckets. High scores mark
    documents that look like the target domain; resample by score to
    shift a 100 TB crawl toward it.

    ``target_predicate`` is a SQL boolean over the doc columns that
    defines the target set (e.g. ``"lang = 'en' AND n_chars > 400"``)
    — in the paper's terms, the target distribution is estimated from
    those rows, the raw distribution from ALL rows.

    Scale shape: the token explosion feeds ONE partial-aggregable
    count per (bucket, is_target) — at most ``2·n_buckets`` rows ever
    shuffle, regardless of corpus size; the per-bucket log-ratio table
    (``n_buckets`` rows, bounded by construction) broadcasts back to
    the token stream, and per-doc scores are one more hash aggregate.
    Buckets use md5-mod (the repo's engine-reproducible hash), so an
    oracle engine lands every token in the identical bucket. Returns
    ``(id_col, n_toks, score)`` with score rounded to 6 decimals
    (mean, not sum, so doc length doesn't dominate).
    """
    from pg_datalake_spark.operators.textstats import tokens

    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).alias("bucket")
    toks = docs.select(
        F.col(id_col),
        F.expr(target_predicate).cast("boolean").alias("__tgt"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).select(id_col, "__tgt", bucket)

    counts = toks.groupBy("bucket").agg(
        F.count("*").alias("n_raw"),
        F.count_if(F.col("__tgt")).alias("n_tgt"),
    )
    totals = toks.agg(
        F.count("*").alias("tot_raw"),
        F.count_if(F.col("__tgt")).alias("tot_tgt"),
    )
    ratios = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log(
                (F.col("n_tgt") + F.lit(alpha))
                / (F.col("tot_tgt") + F.lit(alpha * n_buckets))
            )
            - F.log(
                (F.col("n_raw") + F.lit(alpha))
                / (F.col("tot_raw") + F.lit(alpha * n_buckets))
            )
        ).alias("log_ratio"),
    )
    scored = (
        toks.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.round(F.sum("log_ratio") / F.count("*"), 6).alias("score"),
        )
    )
    return scored
