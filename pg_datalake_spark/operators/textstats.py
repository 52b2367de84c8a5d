"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own surface (BASELINE.json north star): language
ID heuristic, quality scoring, token counting, and document
fingerprinting over a ``documents(doc_id, text, ...)`` table. All pure
Column algebra — per-row, no shuffle, whole-stage codegen — so they
stream over 100 TB as a narrow map stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\s+"

# tiny per-language function-word lists for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "et", "de", "un"],
    "de": ["der", "die", "und", "das", "ein"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens, lowercased. Trim first and drop empty tokens:
    Spark's split keeps leading/trailing empty strings, which would
    inflate counts and plant phantom shingles for padded documents."""
    return F.array_remove(F.split(F.trim(F.lower(text)), TOKEN_RE), "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def avg_token_len(text: Column) -> Column:
    t = tokens(text)
    total = F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.size(t)


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\w\s]", "")
    return (F.length(text) - F.length(stripped)).cast("double") / F.length(text)


def digit_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[0-9]", "")
    return (F.length(text) - F.length(stripped)).cast("double") / F.length(text)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    sw = LANG_STOPWORDS[lang]
    t = tokens(text)
    hits = F.size(F.filter(t, lambda x: x.isin(*sw)))
    return hits.cast("double") / F.size(t)


def token_count_arr(toks: Column) -> Column:
    """token_count over an ALREADY-STAGED token array (see t01: staging
    the split once removes the N-fold re-tokenization the logical plan
    otherwise carries into every stat — HOF lambdas don't participate
    in codegen subexpression elimination)."""
    return F.size(toks).cast("long")


def avg_token_len_arr(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.size(toks)


def stopword_ratio_arr(toks: Column, lang: str = "en") -> Column:
    sw = LANG_STOPWORDS[lang]
    hits = F.size(F.filter(toks, lambda x: x.isin(*sw)))
    return hits.cast("double") / F.size(toks)


def quality_score_from(
    n_tok: Column, awl: Column, punct: Column, stop: Column
) -> Column:
    """quality_score recomposed from already-computed stat columns —
    identical arithmetic to :func:`quality_score`, zero re-tokenization."""
    return (
        F.when((n_tok >= 50) & (n_tok <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((awl >= 3.0) & (awl <= 10.0), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct < 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop > 0.01, F.lit(0.25)).otherwise(F.lit(0.0))
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + word-length band
    + low punctuation + some stopwords. Mirrors common LLM-corpus
    filters (C4/Gopher-style rules)."""
    n_tok = token_count(text)
    awl = avg_token_len(text)
    score = (
        F.when((n_tok >= 50) & (n_tok <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((awl >= 3.0) & (awl <= 10.0), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio(text) < 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stopword_ratio(text) > 0.01, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return score


def language_guess(text: Column) -> Column:
    """Stopword-overlap language ID: score = fraction of tokens in each
    language's function-word list; argmax with deterministic tiebreak
    (lexicographic language code)."""
    return language_guess_arr(tokens(text))


def language_guess_arr(t: Column) -> Column:
    """language_guess over an already-staged token array (r11: the
    text form re-embedded the split per language score — 28 split()
    nodes in t02's optimized plan)."""
    out = F.lit("und")
    best = F.lit(-1.0)
    # fold over languages in reverse-lex order so earlier codes win ties
    for code in sorted(LANG_STOPWORDS, reverse=True):
        sw = LANG_STOPWORDS[code]
        sc = F.size(F.filter(t, lambda x: x.isin(*sw))).cast("double") / F.size(t)
        out = F.when(sc >= best, F.lit(code)).otherwise(out)
        best = F.greatest(sc, best)
    return F.when(best > 0, out).otherwise(F.lit("und"))


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip punctuation,
    collapse whitespace."""
    c = F.lower(text)
    c = F.regexp_replace(c, r"[^\w\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit document fingerprint (md5 of the
    normalized text) — the exact-dedup key."""
    return F.md5(normalize_text(text))


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard per-document stat columns."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        avg_token_len(c).alias("avg_token_len"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fp"),
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token-window chunks (the
    standard pre-tokenization step for LLM training corpora).

    Emits (id, chunk_idx, chunk_text, n_chunk_tokens); stride =
    chunk_size - overlap; the final partial window is kept. Pure
    Column algebra: the token array is materialized once, windows are
    slices — no UDF, no shuffle beyond the parent's layout.
    """
    if overlap >= chunk_size:
        raise ValueError(f"overlap ({overlap}) must be < chunk_size ({chunk_size})")
    stride = chunk_size - overlap
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    n = F.size("__toks")
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return (
        toks.select(F.col(id_col), F.col("__toks"), F.explode(idx).alias("chunk_idx"))
        .select(
            F.col(id_col),
            "chunk_idx",
            F.slice(
                F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_size
            ).alias("__chunk"),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            F.concat_ws(" ", F.col("__chunk")).alias("chunk_text"),
            F.size("__chunk").cast("long").alias("n_chunk_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# PII-style redaction (training-data scrubbing)
# ---------------------------------------------------------------------------

# identical regexes on both engines (DuckDB RE2 / Java regex common
# subset: no backreferences, no lookaround)
REDACTION_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^ \t\n]+", "<URL>"),
    ("phone", r"\+[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
]


def redact(text: Column) -> Column:
    """Replace emails, URLs, and international-format phone numbers
    with typed placeholder tags — the scrub pass a training pipeline
    runs before tokenization. Chained JVM-side regexp_replace (order
    matters: URLs can contain '@', so emails are replaced first and
    the URL pattern runs on the already-email-scrubbed text).
    """
    out = text
    for _, pattern, tag in REDACTION_PATTERNS:
        out = F.regexp_replace(out, pattern, tag)
    return out


def redaction_counts(text: Column) -> list[Column]:
    """Per-pattern match counts (computed on the ORIGINAL text), for
    audit columns next to the redacted output."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).alias(f"n_{name}")
        for name, pattern, _ in REDACTION_PATTERNS
    ]


def char_entropy(df, id_col: str, text_col: str):
    """Per-document character-level Shannon entropy (bits/char) — the
    cheap perplexity proxy pretraining pipelines use to flag
    gibberish/binary-pasted/boilerplate documents (very low or very
    high entropy). Two hash aggregates, both partial-aggregable:
    explode to (doc, char) counts, then recompose
    -Σ p·log2(p) per document. Shuffle volume is |doc|·|distinct
    chars| (≤ ~100 per doc), never raw text."""
    from pyspark.sql import functions as F

    chars = df.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.col(text_col), ""), lambda c: c != "")).alias("_ch"),
    )
    counts = chars.groupBy(id_col, "_ch").agg(F.count("*").alias("_c"))
    n = F.sum("_c")
    # -Σ (c/n)·log2(c/n) = log2(n) - Σ c·log2(c) / n
    return counts.groupBy(id_col).agg(
        n.cast("long").alias("n_chars"),
        F.count("*").alias("n_distinct_chars"),
        F.round(
            F.log2(n) - F.sum(F.col("_c") * F.log2("_c")) / n, 6
        ).alias("entropy_bits"),
    )


# GPT-2-style pretokenizer, restricted to the RE2 ∩ Java-regex subset
# (no lookahead): contractions, letter runs, digit runs, punctuation
# runs — each optionally preceded by one space — then whitespace runs.
BPE_TOKEN_PATTERN = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pretokenization regex — the
    budget estimate LLM pipelines use before real tokenization (true
    BPE merges only split pretokens further, so this lower-bounds and
    tracks the real count). JVM-side regexp_extract_all; the pattern
    avoids lookaheads so DuckDB's RE2 reproduces it exactly."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id_col: str = "q_id",
    q_text_col: str = "q_text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """BM25 top-k retrieval (Robertson/Spärck Jones, the Lucene-style
    ``ln(1 + (N-df+0.5)/(df+0.5))`` idf) — the lexical-retrieval
    counterpart to the cosine ANN tier (similarity.py), and the
    standard first stage of RAG / data-curation pipelines.

    Scale shape: an INVERTED-INDEX join, never a doc×query product —
    term frequencies and document frequencies are two
    partial-aggregable hash aggregates over the token explosion
    (exactly t11's TF-IDF shape); the (tiny) query-term list joins the
    postings on ``term``, so only documents sharing a term with a
    query are ever touched; per-(query, doc) scores are one more
    partial-aggregable sum; top-k ranks candidates per query, not the
    corpus. Corpus-level constants (N, avgdl) travel as ONE broadcast
    row. Scores are ROUNDED to 6 decimals before ranking so two
    engines rank identical values (the repo's windowed-double rule).
    Returns (q_id, doc_id, score, rank).
    """
    from pyspark.sql import Window as W

    spark = docs.sparkSession  # noqa: F841  (documents the session flow)
    toks = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("_tf"))
    # df per term: tf is already one row per (doc, term)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    dl = docs.select(F.col(id_col), token_count(F.col(text_col)).alias("_dl"))
    consts = docs.agg(
        F.count("*").alias("_n_docs"),
        (F.sum(token_count(F.col(text_col))).cast("double") / F.count("*")).alias(
            "_avgdl"
        ),
    )
    qterms = (
        queries.select(
            F.col(q_id_col), F.explode(tokens(F.col(q_text_col))).alias("term")
        )
        .distinct()
    )
    cand = (
        qterms.join(tf, "term")
        .join(dfreq, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(consts))
    )
    idf = F.log(
        1.0
        + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    tf_part = (
        F.col("_tf")
        * (k1 + 1)
        / (F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl")))
    )
    scored = (
        cand.select(q_id_col, id_col, (idf * tf_part).alias("_s"))
        .groupBy(q_id_col, id_col)
        .agg(F.round(F.sum("_s"), 6).alias("score"))
    )
    win = W.partitionBy(q_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "score", "rank")
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The FULL published Gopher/MassiveText document-quality rule set
    (Rae et al. 2021, Table A1) as one zero-shuffle Column map —
    complements t09's repetition rules with the seven structural
    filters:

    1. 50 ≤ word count ≤ 100,000
    2. 3 ≤ mean word length ≤ 10
    3. symbol-to-word ratio ≤ 0.1 (``#`` and ``...``/``…``)
    4. ≤ 90 % of lines start with a bullet (``•``, ``-``, ``*``)
    5. ≤ 30 % of lines end with an ellipsis
    6. ≥ 80 % of words contain ≥ 1 alphabetic character
    7. ≥ 2 of the 8 Gopher stop words present

    Emits the per-rule metrics (rounded for hashing), the seven
    booleans, and the conjunction ``passes_gopher``. Every ratio is an
    integer-count division, so an independent engine computes the
    identical doubles and flips the identical flags.
    """
    # stage the token and line arrays ONCE (r11): every later mention
    # references the staged column, not a re-embedded split — the naive
    # form carried 39 split() nodes into the optimized plan and HOF
    # lambdas sit outside codegen subexpression elimination
    df = df.select(
        F.col(id_col),
        F.col(text_col),
        tokens(F.col(text_col)).alias("__toks"),
        F.filter(
            F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != ""
        ).alias("__lines"),
    )
    t = F.col("__toks")
    n_words = F.size(t)
    sum_len = F.aggregate(t, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    mean_len = sum_len.cast("double") / n_words
    n_hash = (
        F.length(F.col(text_col))
        - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit("")))
    )
    n_ellipsis = (
        F.length(F.col(text_col))
        - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
    ) / 3 + (
        F.length(F.col(text_col))
        - F.length(F.replace(F.col(text_col), F.lit("…"), F.lit("")))
    )
    sym_ratio = (n_hash + n_ellipsis).cast("double") / n_words
    lines = F.col("__lines")
    n_lines = F.size(lines)
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda x: F.trim(x).startswith("•")
                | F.trim(x).startswith("-")
                | F.trim(x).startswith("*"),
            )
        ).cast("double")
        / F.greatest(n_lines, F.lit(1))
    )
    ellipsis_frac = (
        F.size(
            F.filter(
                lines,
                lambda x: F.rtrim(x).endswith("...") | F.rtrim(x).endswith("…"),
            )
        ).cast("double")
        / F.greatest(n_lines, F.lit(1))
    )
    alpha_frac = (
        F.size(F.filter(t, lambda x: x.rlike("[a-z]"))).cast("double")
        / F.greatest(n_words, F.lit(1))
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(t), F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
        )
    )
    flags = {
        "ok_word_count": (n_words >= 50) & (n_words <= 100_000),
        "ok_mean_word_len": (mean_len >= 3.0) & (mean_len <= 10.0),
        "ok_symbol_ratio": sym_ratio <= 0.1,
        "ok_bullet_lines": bullet_frac <= 0.9,
        "ok_ellipsis_lines": ellipsis_frac <= 0.3,
        "ok_alpha_words": alpha_frac >= 0.8,
        "ok_stopwords": n_stop >= 2,
    }
    overall = None
    for c in flags.values():
        overall = c if overall is None else (overall & c)
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stop.cast("int").alias("n_stopwords"),
        *[v.alias(k) for k, v in flags.items()],
        overall.alias("passes_gopher"),
    )
