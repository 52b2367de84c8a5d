"""Multimodal (image/audio/video) columns as binary + typed metadata.

Treats media as opaque ``binary`` columns with a typed metadata struct
(BASELINE.json north star: multimodal columns for training pipelines).
The container has no image/audio codecs, so the *codec* is a
deterministic fake ("LAKE" header + little-endian dims + payload):
encode/decode round-trips are real binary processing through real
Arrow-batched ``mapInPandas`` plumbing — schema, batch shape, and
partitioning are exactly what a libjpeg/ffmpeg-backed version would
use; only the byte interpretation is stubbed (swap `_decode_payload`
for PIL/ffmpeg on a real cluster).

Scale design: mapInPandas streams Arrow batches (no per-row Python
serde); decode is a narrow map, so media pipelines shard by file and
never shuffle the payload bytes unless grouping requires it.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"LAKE"
HEADER_FMT = "<4sHHI"  # magic, width, height, n_frames
HEADER_LEN = struct.calcsize(HEADER_FMT)

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


# ---------------------------------------------------------------------------
# encode (test-data synthesis) — pure Column algebra, JVM-side
# ---------------------------------------------------------------------------


def fake_media(id_col: F.Column, kind: str = "image", frames: int | None = None) -> F.Column:
    """Deterministic fake media blob derived from an id: header with
    width = 64 + id % 192, height = 32 + id % 96, n_frames, then a
    repeating payload. Closed-form in the id so an oracle can verify
    decoded metadata without parsing bytes."""
    width = (F.lit(64) + id_col % 192).cast("int")
    height = (F.lit(32) + id_col % 96).cast("int")
    n_frames = F.lit(int(frames or (1 if kind == "image" else 16))).cast("int")

    def le16(c):  # little-endian uint16 as 2 hex bytes
        lo = F.lpad(F.hex(c % 256), 2, "0")
        hi = F.lpad(F.hex((c / 256).cast("int") % 256), 2, "0")
        return F.concat(lo, hi)

    def le32(c):
        lo = le16(c % 65536)
        hi = le16((c / 65536).cast("int"))
        return F.concat(lo, hi)

    header_hex = F.concat(
        F.lit(MAGIC.hex().upper()), le16(width), le16(height), le32(n_frames)
    )
    payload_hex = F.repeat(F.lpad(F.hex(id_col % 256), 2, "0"), 128)
    return F.unhex(F.concat(header_hex, payload_hex))


# ---------------------------------------------------------------------------
# decode / transform — Arrow-batched mapInPandas
# ---------------------------------------------------------------------------


def _decode_payload(blob: bytes) -> tuple[int, int, int, int]:
    """STUB decode point: replace with PIL/ffmpeg for real codecs."""
    if blob is None or len(blob) < HEADER_LEN or blob[:4] != MAGIC:
        return (-1, -1, -1, len(blob or b""))
    _, w, h, n = struct.unpack(HEADER_FMT, blob[:HEADER_LEN])
    return (w, h, n, len(blob))


def decode_media(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Attach the decoded metadata struct. Arrow batches in/out; the
    payload bytes never round-trip through Python row objects."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("meta", MEDIA_META)])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                dict(zip(("width", "height", "n_frames", "n_bytes"), _decode_payload(b)))
                for b in pdf[data_col]
            ]
            yield pdf.assign(meta=meta)

    return df.mapInPandas(op, out_schema)


def media_features(df: DataFrame, data_col: str = "data", dims: int = 8) -> DataFrame:
    """Real (non-stub) feature extraction: normalized byte histogram of
    the payload as a fixed-dim array<float> — the shape an image
    embedding would have, computed vectorized in numpy per Arrow batch."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[data_col]:
                payload = np.frombuffer(b[HEADER_LEN:] if b and len(b) > HEADER_LEN else b"", dtype=np.uint8)
                if payload.size == 0:
                    feats.append([0.0] * dims)
                    continue
                hist, _ = np.histogram(payload, bins=dims, range=(0, 256))
                feats.append((hist / payload.size).astype("float32").tolist())
            yield pdf.assign(features=feats)

    return df.mapInPandas(op, out_schema)


def resize_media(df: DataFrame, scale: float, data_col: str = "data") -> DataFrame:
    """Rewrite header dims by ``scale`` (payload untouched — the stub
    point where a real implementation resamples pixels)."""
    out_schema = df.schema

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def rs(b: bytes) -> bytes:
                w, h, n, _ = _decode_payload(b)
                if w < 0:
                    return b
                nw = min(65535, max(1, int(w * scale)))  # header dims are uint16
                nh = min(65535, max(1, int(h * scale)))
                return struct.pack(HEADER_FMT, MAGIC, nw, nh, n) + b[HEADER_LEN:]

            yield pdf.assign(**{data_col: pdf[data_col].map(rs)})

    return df.mapInPandas(op, out_schema)


def frame_sample(df: DataFrame, every_n: int, data_col: str = "data") -> DataFrame:
    """Explode a video blob into sampled frame rows (frame_idx every
    ``every_n``) — one row per kept frame, frame payload sliced from
    the blob. The explode happens inside the Arrow batch, not via
    per-row Python UDF calls."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != data_col]
        + [T.StructField("frame_idx", T.IntegerType()), T.StructField("frame", T.BinaryType())]
    )
    other_cols = [f.name for f in df.schema.fields if f.name != data_col]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        magic = np.frombuffer(MAGIC, dtype=np.uint8)
        for pdf in batches:
            blobs = pdf[data_col].to_numpy()
            m = len(blobs)
            if m == 0:
                yield pd.DataFrame({c: [] for c in other_cols + ["frame_idx", "frame"]})
                continue
            # header fields for the whole batch in one compact uint8
            # matrix — no per-row struct.unpack, no iterrows
            lens = np.fromiter(
                ((len(b) if b is not None else 0) for b in blobs), dtype=np.int64, count=m
            )
            # >= so a header-only blob with n_frames>0 still emits its
            # ceil(n/every_n) rows (with empty/minimal frame payloads),
            # matching the pre-vectorization behavior
            valid = lens >= HEADER_LEN
            n = np.zeros(m, dtype=np.int64)
            if valid.any():
                hdr = np.frombuffer(
                    b"".join(bytes(b[:HEADER_LEN]) for b in blobs[valid]), dtype=np.uint8
                ).reshape(-1, HEADER_LEN)
                nf = hdr[:, 8:12].copy().view("<u4").ravel().astype(np.int64)
                nf[~(hdr[:, :4] == magic).all(axis=1)] = 0
                n[valid] = nf
            keep = n > 0
            k = np.zeros(m, dtype=np.int64)
            k[keep] = (n[keep] + every_n - 1) // every_n  # frames kept per row
            total = int(k.sum())
            if total == 0:
                yield pd.DataFrame({c: [] for c in other_cols + ["frame_idx", "frame"]})
                continue
            # explode via offset arithmetic: output row r comes from input
            # row row_idx[r], sampling frame frame_idx[r]
            row_idx = np.repeat(np.arange(m), k)
            frame_idx = (np.arange(total) - np.repeat(np.cumsum(k) - k, k)) * every_n
            frame_len = np.maximum(1, (lens - HEADER_LEN) // np.maximum(n, 1))[row_idx]
            start = HEADER_LEN + frame_idx * frame_len
            end = start + frame_len
            out = pdf.iloc[row_idx][other_cols].reset_index(drop=True)
            out["frame_idx"] = frame_idx.astype(np.int32)
            # bytes slicing is the only remaining per-output-row step
            # (Arrow needs one bytes object per row); it's a C-level
            # buffer copy, not Python-level parsing
            out["frame"] = [bytes(blobs[r][a:b]) for r, a, b in zip(row_idx, start, end)]
            yield out

    return df.mapInPandas(op, out_schema)


# ---------------------------------------------------------------------------
# audio (fake-PCM convention): "LAKA" header + int16 little-endian PCM
# ---------------------------------------------------------------------------

AUDIO_MAGIC = b"LAKA"
AUDIO_HEADER_FMT = "<4sHI"  # magic, sample_rate, n_samples
AUDIO_HEADER_LEN = struct.calcsize(AUDIO_HEADER_FMT)


def decode_audio(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Attach audio metadata + signal stats (sample_rate, n_samples,
    rms, peak) decoded from the fake-PCM blobs. Same stub contract as
    the image path: swap the header parse for soundfile/ffmpeg on a
    real cluster — the Arrow-batched mapInPandas plumbing, schema and
    batch shape stay identical. Malformed blobs yield (-1, -1, null,
    null) rather than failing the batch."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.IntegerType()),
        ]
    )

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srs, ns, rmss, peaks = [], [], [], []
            for b in pdf[data_col]:
                b = bytes(b) if b is not None else None
                if b is None or len(b) < AUDIO_HEADER_LEN or b[:4] != AUDIO_MAGIC:
                    srs.append(-1), ns.append(-1), rmss.append(None), peaks.append(None)
                    continue
                _, sr, n = struct.unpack(AUDIO_HEADER_FMT, b[:AUDIO_HEADER_LEN])
                pcm = np.frombuffer(
                    b,
                    dtype="<i2",
                    offset=AUDIO_HEADER_LEN,
                    count=min(n, (len(b) - AUDIO_HEADER_LEN) // 2),
                )
                srs.append(sr)
                ns.append(n)
                if pcm.size:
                    rmss.append(float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))))
                    peaks.append(int(np.max(np.abs(pcm.astype(np.int32)))))
                else:
                    rmss.append(0.0), peaks.append(0)
            pdf = pdf.copy()
            pdf["sample_rate"], pdf["n_samples"] = srs, ns
            pdf["rms"], pdf["peak"] = rmss, peaks
            yield pdf

    return df.mapInPandas(it, out_schema)


def pcm_decimate(df: DataFrame, factor: int, data_col: str = "data") -> DataFrame:
    """Integer-decimation resample: keep every ``factor``-th sample,
    sample_rate scaled down to match (the anti-aliasing filter a real
    DSP chain would add lives behind the same stub boundary as image
    decode). The blob is rewritten with the updated header; slicing is
    vectorized numpy per batch."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    out_schema = df.schema

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[data_col]:
                b = bytes(b) if b is not None else None
                if b is None or len(b) < AUDIO_HEADER_LEN or b[:4] != AUDIO_MAGIC:
                    out.append(b)
                    continue
                _, sr, n = struct.unpack(AUDIO_HEADER_FMT, b[:AUDIO_HEADER_LEN])
                pcm = np.frombuffer(
                    b,
                    dtype="<i2",
                    offset=AUDIO_HEADER_LEN,
                    count=min(n, (len(b) - AUDIO_HEADER_LEN) // 2),
                )
                dec = pcm[::factor]
                hdr = struct.pack(
                    AUDIO_HEADER_FMT, AUDIO_MAGIC, max(1, sr // factor), dec.size
                )
                out.append(hdr + dec.tobytes())
            pdf = pdf.copy()
            pdf[data_col] = out
            yield pdf

    return df.mapInPandas(it, out_schema)


# ---------------------------------------------------------------------------
# perceptual-hash near-duplicate detection (dHash over the payload)
# ---------------------------------------------------------------------------


def fake_textured_media(id_col: F.Column) -> F.Column:
    """Fake image blob with VARIED payload bytes (contrast
    :func:`fake_media`'s constant fill): payload = 8 chained md5
    blocks of a base id, with the LAST block perturbed for odd ids —
    so (2k, 2k+1) are planted near-duplicate siblings sharing 7/8 of
    their texture, and different bases look random to a perceptual
    hash. Pure Column algebra (md5/unhex), oracle-reconstructible."""
    base = (id_col / 2).cast("long")
    blocks = [F.md5(F.concat(F.lit(f"b{i}:"), base.cast("string"))) for i in range(7)]
    clean = F.md5(F.concat(F.lit("b7:"), base.cast("string")))
    # odd siblings: overwrite the last 2 payload bytes (4 hex chars) —
    # a small edit a perceptual hash must absorb (hamming ≤ 3)
    last = F.when(id_col % 2 == 0, clean).otherwise(
        F.concat(
            F.substring(clean, 1, 28),
            F.substring(F.md5(F.concat(F.lit("b7x:"), base.cast("string"))), 1, 4),
        )
    )
    width = (F.lit(64) + id_col % 192).cast("int")
    height = (F.lit(32) + id_col % 96).cast("int")

    def le16(c):
        lo = F.lpad(F.hex(c % 256), 2, "0")
        hi = F.lpad(F.hex((c / 256).cast("int") % 256), 2, "0")
        return F.concat(lo, hi)

    header_hex = F.concat(
        F.lit(MAGIC.hex().upper()), le16(width), le16(height),
        le16(F.lit(1).cast("int")), le16(F.lit(0).cast("int")),
    )
    return F.unhex(F.concat(header_hex, *blocks, last))


def dhash64(df: DataFrame, data_col: str = "data", out_col: str = "dhash") -> DataFrame:
    """64-bit perceptual DIFFERENCE hash of the payload: the byte
    stream is resampled to an 8×9 grid of cell means and each bit is
    the left<right comparison of adjacent cells — the classic dHash,
    invariant to payload length and robust to small byte edits. With
    a real codec the input is the decoded grayscale raster; here it
    is the fake payload (swap at `_decode_payload`, same shape).
    Arrow-batched, numpy per blob, zero per-row Python serde."""
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.LongType())])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for b in pdf[data_col]:
                payload = (
                    np.frombuffer(b[HEADER_LEN:], dtype=np.uint8)
                    if b is not None and len(b) > HEADER_LEN
                    else np.zeros(1, dtype=np.uint8)
                )
                cells = np.array_split(payload.astype(np.float64), 72)
                means = np.array(
                    [c.mean() if c.size else 0.0 for c in cells]
                ).reshape(8, 9)
                bits = (means[:, 1:] < means[:, :-1]).astype(np.uint8).ravel()
                h = int.from_bytes(np.packbits(bits).tobytes(), "big", signed=False)
                # store as signed int64 (Spark LongType)
                hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pdf.assign(**{out_col: hashes})

    return df.mapInPandas(op, out_schema)


def phash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    data_col: str = "data",
    max_hamming: int = 3,
    band_bits: int = 32,
    multi_probe: bool | None = None,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual hash: dHash each blob,
    band the 64-bit hash into 64/band_bits keys and equi-join on any
    shared band — by pigeonhole every pair within hamming distance
    (64/band_bits − 1) shares at least one intact band — then verify
    exact hamming with ``bit_count(a XOR b)``. The same bucket-join
    shape as text LSH (d02): no cartesian product, candidates
    distributed through the shuffle.

    SCALE DEFAULT (r8): band_bits=32 — two bands, random-collision
    rate ~n²/2³² instead of the quadratic-at-corpus-scale n²/2¹⁶ of
    16-bit bands. The bare pigeonhole guarantee of two bands is only
    hamming ≤ 1, so when ``max_hamming`` exceeds it, single-bit
    MULTI-PROBE turns on automatically: the probe side additionally
    emits every 1-bit flip of each band key (33 keys/band at 32 bits),
    which catches any pair whose MINIMUM per-band distance is ≤ 1 —
    by pigeonhole that is every pair with total hamming
    ≤ 2·n_bands − 1 (= 3 at the default). Probe keys multiply the
    shuffle by (band_bits+1) but collisions stay ~n²·66/2³² —
    linear-dominated far past 10⁹ images. band_bits=16 (guarantee
    hamming ≤ 3 with no probing, collisions n²/2¹⁶) remains an
    explicit opt-in for small corpora. Pass ``multi_probe`` to force
    either mode. Returns (id_a, id_b, hamming)."""
    if band_bits not in (1, 2, 4, 8, 16, 32):
        raise ValueError(
            "band_bits must be one of 1,2,4,8,16,32 (64-bit hash banded "
            "via long shifts; 64 would overflow the LongType mask)"
        )
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    if multi_probe is None:
        # auto: probe only when the intact-band guarantee can't reach
        # the requested distance
        multi_probe = max_hamming > n_bands - 1
    if multi_probe and max_hamming > 2 * n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the single-bit multi-probe "
            f"guarantee 2*n_bands-1={2 * n_bands - 1}; use smaller band_bits"
        )
    if not multi_probe and max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole guarantee "
            f"n_bands-1={n_bands - 1} without multi_probe"
        )
    hashed = dhash64(df.select(id_col, data_col), data_col).select(id_col, "dhash")

    def band_val(b: int):
        return F.shiftrightunsigned(F.col("dhash"), band_bits * b).bitwiseAND(
            F.lit(mask)
        )

    bands = hashed.select(
        id_col,
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_val(b).alias("band_val"))
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "dhash", "bk.band", "bk.band_val")
    if multi_probe:
        # probe side: the exact band key plus all single-bit flips —
        # collides whenever the pair's band differs by <= 1 bit
        probes = hashed.select(
            id_col,
            "dhash",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            (band_val(b).bitwiseXOR(F.lit(flip))).alias("band_val"),
                        )
                        for b in range(n_bands)
                        for flip in [0] + [1 << i for i in range(band_bits)]
                    ]
                )
            ).alias("bk"),
        ).select(id_col, "dhash", "bk.band", "bk.band_val")
    else:
        probes = bands
    a = probes.select(
        F.col(id_col).alias("id_a"), F.col("dhash").alias("h_a"), "band", "band_val"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("dhash").alias("h_b"), "band", "band_val"
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
