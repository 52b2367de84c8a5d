"""Baseline JPEG codec (sources/jpeg_codec.py, r12) — pure-numpy
ITU-T T.81 sequential DCT.

No reference JPEG library exists in this container, so conformance
rests on (a) closed-form cases where lossy-JPEG output is EXACTLY
predictable, (b) the DCT pair checked against its mathematical
inverse, (c) encoder->decoder roundtrip error bounded by the
quantization step, and (d) byte-level marker-layout checks against
the public spec (Annex B) — the same evidentiary model as the LZW /
Avro / FlatGeoBuf codecs in this repo.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pg_datalake_spark.sources import jpeg_codec as J


def test_dct_pair_is_exact_inverse():
    rng = np.random.default_rng(0)
    for _ in range(100):
        x = rng.uniform(-128, 127, (8, 8))
        assert np.abs(J.idct2(J.dct2(x)) - x).max() < 1e-9
    # Parseval: energy preserved by the orthonormal basis
    x = rng.uniform(-128, 127, (8, 8))
    assert abs((J.dct2(x) ** 2).sum() - (x ** 2).sum()) < 1e-6


def test_solid_color_exact():
    """A solid image has all AC coefficients exactly 0; the DC path
    is integer-exact through quantize/dequantize for values whose
    shifted DC is a multiple of the quantizer — and within 1 LSB for
    every other value."""
    for val in (0, 7, 42, 128, 200, 255):
        for shape in ((8, 8), (24, 16), (11, 13)):  # incl. MCU padding
            img = np.full(shape, val, np.uint8)
            out = J.decode_jpeg(J.encode_jpeg(img, quality=90))
            assert out.shape == (*shape, 1)
            assert np.abs(out.astype(int) - val).max() <= 1


def test_gradient_roundtrip_bounds():
    g = np.clip(np.add.outer(np.arange(24) * 3, np.arange(40) * 2),
                0, 255).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(g, quality=95))[:, :, 0]
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2


def test_rgb_444_and_420():
    rgb = np.zeros((17, 23, 3), np.uint8)
    rgb[:, :, 0] = np.add.outer(np.arange(17) * 5, np.arange(23) * 2) % 256
    rgb[:, :, 1] = 100
    rgb[:, :, 2] = np.arange(23)[None, :] * 9 % 256
    out = J.decode_jpeg(J.encode_jpeg(rgb, quality=95))
    assert out.shape == (17, 23, 3)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 20
    out420 = J.decode_jpeg(J.encode_jpeg(rgb, quality=95,
                                         subsampling="420"))
    # chroma at quarter resolution: bounded but looser
    assert np.abs(out420.astype(int) - rgb.astype(int)).max() <= 64
    # luma survives subsampling nearly untouched on this fixture
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    y2 = (0.299 * out420[..., 0] + 0.587 * out420[..., 1]
          + 0.114 * out420[..., 2])
    assert np.abs(y - y2).max() <= 6


def test_abbreviated_stream_equals_full():
    g = np.clip(np.add.outer(np.arange(24) * 3, np.arange(40) * 2),
                0, 255).astype(np.uint8)
    full = J.decode_jpeg(J.encode_jpeg(g, quality=90))
    ab = J.decode_jpeg(J.encode_jpeg(g, quality=90, abbreviated=True),
                       tables=J.jpeg_tables(90))
    assert np.array_equal(full, ab)


def test_marker_layout_and_stuffing():
    """Byte-level spec checks: SOI first, EOI last, segment walk
    consistent, no bare FF inside the entropy segment except markers."""
    g = (np.arange(16 * 16, dtype=np.uint8) % 251).reshape(16, 16)
    data = J.encode_jpeg(g, quality=50)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    pos = 2
    seen = []
    while data[pos + 1] != 0xDA:
        assert data[pos] == 0xFF
        seen.append(data[pos + 1])
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        pos += 2 + ln
    assert 0xDB in seen and 0xC4 in seen and 0xC0 in seen
    (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
    scan = data[pos + 2 + ln : -2]
    i = 0
    while i < len(scan) - 1:
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00, f"unstuffed FF at {i}"
            i += 2
        else:
            i += 1


def test_fail_louds():
    g = np.zeros((8, 8), np.uint8)
    ok = J.encode_jpeg(g)
    # progressive SOF2
    bad = ok.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="progressive"):
        J.decode_jpeg(bad)
    # arithmetic-coded SOF9 (in the parse-tables walk)
    bad = ok.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError, match="FFC9"):
        J.decode_jpeg(bad)
    # 12-bit precision
    i = ok.index(b"\xff\xc0")
    bad = bytearray(ok)
    bad[i + 4] = 12
    with pytest.raises(NotImplementedError, match="precision"):
        J.decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((4, 4), np.uint16))


def test_jpeg_property_roundtrip_dimensions_subsampling_restarts():
    """Hypothesis (r13, judge task #8): across random dimensions
    (including single-pixel and non-multiple-of-MCU edges), channel
    counts, qualities, subsampling modes and restart intervals:

    - decode(encode(x)) preserves shape;
    - RESTART EQUIVALENCE: restart markers only reset the lossless DC
      prediction, so decode(encode(x, restart_interval=k)) is
      BIT-IDENTICAL to decode(encode(x)) — and the stream contains
      RSTn markers plus a DRI segment;
    - at 4:4:4 / q>=90 the max pixel error stays within the
      quantization bound even on pure noise;
    - abbreviated streams + jpeg_tables at the same quality decode
      bit-identically to the full stream.
    """
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pg_datalake_spark.sources.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        jpeg_tables,
    )

    @given(
        st.integers(1, 40),          # height
        st.integers(1, 40),          # width
        st.sampled_from([1, 3]),     # channels
        st.integers(60, 100),        # quality
        st.sampled_from(["444", "422", "420"]),
        st.integers(1, 6),           # restart interval (MCUs)
        st.integers(0, 2**32 - 1),   # pixel seed
    )
    @settings(max_examples=40, deadline=None)
    def check(h, w, nc, q, ss, ri, seed):
        if nc == 1:
            ss = "444"  # grayscale has one sampling factor
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (h, w, nc)).astype(np.uint8)
        plain = encode_jpeg(arr, quality=q, subsampling=ss)
        base = decode_jpeg(plain)
        assert base.shape == (h, w, nc)
        with_rst = encode_jpeg(
            arr, quality=q, subsampling=ss, restart_interval=ri
        )
        assert np.array_equal(decode_jpeg(with_rst), base)
        hmax = 2 if (nc == 3 and ss in ("422", "420")) else 1
        vmax = 2 if (nc == 3 and ss == "420") else 1
        n_mcu = -(-h // (8 * vmax)) * -(-w // (8 * hmax))
        if n_mcu > ri:  # restarts actually fire
            assert b"\xff\xdd" in with_rst
            assert any(bytes([0xFF, 0xD0 + k]) in with_rst
                       for k in range(8))
        if ss == "444" and q >= 90:
            # quantization-bounded, not tight: q>=90 luma steps are
            # <=~24; multi-coefficient rounding on pure noise stacks to
            # the high 30s (observed max 37). Real codec breakage
            # (wrong predictor, mis-aligned restart) lands 100+.
            err = np.abs(base.astype(int) - arr.astype(int)).max()
            assert err <= 60, (h, w, nc, q, err)
        # abbreviated + tables == full, bit for bit
        abbr = encode_jpeg(
            arr, quality=q, subsampling=ss, abbreviated=True,
            restart_interval=ri,
        )
        assert np.array_equal(
            decode_jpeg(abbr, tables=jpeg_tables(q)), decode_jpeg(with_rst)
        )

    check()
