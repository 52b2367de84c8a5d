"""Product quantization (PQ) for embedding search — the compression
tier of the ANN family (next to brute force `similarity.cosine_topk`,
hyperplane LSH `similarity.ann_lsh`, and the IVF coarse quantizer
`ivf.py`). Jégou, Douze & Schmid 2011, "Product Quantization for
Nearest Neighbor Search" (IEEE TPAMI) — the public algorithm every
vector store implements.

Shape: a D-dim vector is split into ``m`` subvectors of D/m dims; each
subspace gets its own k-means codebook of ``k`` centroids (k ≤ 256 so
a code is one byte); a vector compresses to ``m`` bytes. Search uses
ASYMMETRIC DISTANCE COMPUTATION (ADC): per query, an m×k lookup table
of subvector dot-products/norms is built once, and each candidate's
approximate similarity is m table lookups — no float vector is ever
touched at scan time.

Scale design (100 TB): codebooks are m × k × (D/m) floats — KBs,
always broadcastable; TRAINING samples a bounded slice to the driver
(deterministic first-n-by-id, like ivf.py's init) — the classic
sample-train/full-encode split every PQ deployment uses; ENCODING is
one Arrow-batched pass over the corpus (mapInPandas, numpy argmin per
subspace); the ADC scan is a narrow map + TakeOrdered top-k, no
shuffle of the corpus. Reference scope: the reference engine has no
vector index at all — this exceeds it (BASELINE.json north star), so
the registry row is rows-only with a pytest recall contract against
exact brute force (the same verification pattern as v03/v04).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    sample: int = 2048,
    iterations: int = 8,
    seed: int = 7,
) -> list[list[list[float]]]:
    """Train per-subspace k-means codebooks on a deterministic bounded
    sample (first ``sample`` rows by id — the driver never holds more
    than sample × D floats). Lloyd iterations in numpy with k-means++-
    style farthest-point init seeded deterministically; empty clusters
    re-seed to the farthest point (no NaN centroids). Returns
    ``m × k × (D/m)`` nested lists (broadcast-sized)."""
    rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    )
    x = np.asarray([r[1] for r in rows], dtype=np.float64)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    rng = np.random.RandomState(seed)
    books: list[list[list[float]]] = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        # farthest-point init from a seeded start: deterministic and
        # spread-out (plain first-k collapses on duplicated prefixes)
        idx = [int(rng.randint(n))]
        for _ in range(1, min(k, n)):
            d2 = np.min(
                ((xs[:, None, :] - xs[idx][None, :, :]) ** 2).sum(-1), axis=1
            )
            idx.append(int(np.argmax(d2)))
        cents = xs[idx].copy()
        for _ in range(iterations):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                mask = assign == c
                if mask.any():
                    cents[c] = xs[mask].mean(axis=0)
                else:  # re-seed empty cluster to the farthest point
                    cents[c] = xs[int(np.argmax(d2.min(axis=1)))]
        books.append(cents.tolist())
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Append ``pq_code array<int>`` (m entries, each < k): one
    Arrow-batched numpy pass, argmin per subspace against the
    broadcast codebooks. The float vector column is kept (callers
    drop it when they want the 4-8x storage cut)."""
    import pandas as pd

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", pq_code array<int>"

    def encode(batches):
        for pdf in batches:
            vecs = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                xs = vecs[:, j * sub : (j + 1) * sub]
                d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = d2.argmin(axis=1)
            pdf = pdf.copy()
            pdf["pq_code"] = [c.tolist() for c in codes]
            yield pdf

    return df.mapInPandas(encode, out_schema)


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    queries: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    topk: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k: per query an m × k dot-product /
    norm lookup table is precomputed DRIVER-side (m·k floats), shipped
    as literals, and each candidate's approximate cosine is m array
    lookups over its byte code — the corpus float vectors are never
    read. Output: (q_id, vec_id, approx_cos, rank ≤ topk)."""
    from pyspark.sql import Window

    m = len(codebooks)
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]
    # per-code squared norms (query-independent)
    norm_tab = [
        (books[j] ** 2).sum(axis=1).tolist() for j in range(m)
    ]
    arms = []
    for q_id, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        qn = float(np.sqrt((q * q).sum())) or 1e-12
        dot_tab = [
            (books[j] @ q[j * sub : (j + 1) * sub]).tolist() for j in range(m)
        ]
        dot_expr = None
        n2_expr = None
        for j in range(m):
            code_j = F.element_at("pq_code", j + 1) + 1
            d_j = F.element_at(
                F.array(*[F.lit(float(v)) for v in dot_tab[j]]), code_j
            )
            n_j = F.element_at(
                F.array(*[F.lit(float(v)) for v in norm_tab[j]]), code_j
            )
            dot_expr = d_j if dot_expr is None else dot_expr + d_j
            n2_expr = n_j if n2_expr is None else n2_expr + n_j
        approx = dot_expr / (F.sqrt(n2_expr) * F.lit(qn))
        arms.append(
            encoded.select(
                F.lit(q_id).alias("q_id"),
                F.col(id_col),
                approx.alias("approx_cos"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    w = Window.partitionBy("q_id").orderBy(
        F.desc("approx_cos"), F.col(id_col)
    )
    return (
        out.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
    )
