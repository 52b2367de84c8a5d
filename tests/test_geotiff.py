"""GeoTIFF minimum-slice reader/writer (sources/geotiff.py, r11).

Reference surface: docs/file-formats-reference.md:96-138 (raster
GeoTIFF through GDAL). Planted-array roundtrips pin the strip layout,
both compressions, integer and float sample formats, the geo
transform, and the fail-loud guards for everything out of scope.
"""

from __future__ import annotations

import os
import struct
import tempfile

import numpy as np
import pytest

from pg_datalake_spark.sources.geotiff import (
    _read_ifd,
    read_geotiff,
    write_geotiff,
)


def _planted(h=48, w=64, b=2, dtype=np.uint16):
    ys, xs, bs = np.indices((h, w, b))
    return ((xs * 31 + ys * 17 + bs * 7) % 997).astype(dtype)


def test_ifd_roundtrip_and_strips():
    d = tempfile.mkdtemp()
    arr = _planted()
    p = os.path.join(d, "t.tif")
    write_geotiff(p, arr, rows_per_strip=16, pixel_scale=(0.5, 0.25),
                  tiepoint=(100.0, 50.0))
    ifd = _read_ifd(p)
    assert (ifd["width"], ifd["height"], ifd["bands"]) == (64, 48, 2)
    assert len(ifd["strip_offsets"]) == 3  # 48 rows / 16 per strip
    assert ifd["dtype"] == "<u2" and ifd["compression"] == 1
    assert (ifd["sx"], ifd["sy"], ifd["tx"], ifd["ty"]) == (
        0.5, 0.25, 100.0, 50.0,
    )


@pytest.mark.parametrize("comp", ["none", "deflate"])
def test_read_geotiff_values_and_geo(spark, comp):
    d = tempfile.mkdtemp()
    arr = _planted()
    p = os.path.join(d, "t.tif")
    write_geotiff(p, arr, compression=comp, rows_per_strip=16,
                  pixel_scale=(0.5, 0.25), tiepoint=(100.0, 50.0))
    df = read_geotiff(spark, p)
    # one task per strip: 3 partitions
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 48 * 64 * 2
    got = {(r.x, r.y, r.band): r for r in rows}
    for probe in [(0, 0, 0), (63, 47, 1), (10, 20, 1)]:
        x, y, b = probe
        r = got[probe]
        assert r.value == float((x * 31 + y * 17 + b * 7) % 997)
        assert r.geo_x == 100.0 + x * 0.5
        assert r.geo_y == 50.0 - y * 0.25


def test_float32_and_int32_samples(spark):
    d = tempfile.mkdtemp()
    f32 = (np.arange(12, dtype=np.float32) / 4.0).reshape(3, 4, 1)
    i32 = (np.arange(12, dtype=np.int32) - 6).reshape(3, 4, 1)
    pf, pi = os.path.join(d, "f.tif"), os.path.join(d, "i.tif")
    write_geotiff(pf, f32, compression="deflate")
    write_geotiff(pi, i32)
    vf = sorted(r.value for r in read_geotiff(spark, pf).collect())
    vi = sorted(r.value for r in read_geotiff(spark, pi).collect())
    assert vf == [i / 4.0 for i in range(12)]
    assert vi == [float(i - 6) for i in range(12)]


def test_fail_loud_guards(tmp_path):
    d = str(tmp_path)
    arr = _planted(h=4, w=4, b=1)
    p = os.path.join(d, "ok.tif")
    write_geotiff(p, arr)
    # truncated/garbage MM header (big-endian is SUPPORTED since r11 —
    # a 6-zero-byte body is bad magic, not an endianness rejection)
    pb = os.path.join(d, "be.tif")
    with open(pb, "wb") as fh:
        fh.write(b"MM" + b"\x00" * 6)
    with pytest.raises(ValueError, match="bad TIFF magic"):
        _read_ifd(pb)
    # BigTIFF magic 43 is SUPPORTED since r12 — a tiny one reads
    pg = os.path.join(d, "big.tif")
    write_geotiff(pg, arr, bigtiff=True)
    assert _read_ifd(pg)["width"] == 4
    # not a TIFF
    pn = os.path.join(d, "no.tif")
    with open(pn, "wb") as fh:
        fh.write(b"PK\x03\x04____")
    with pytest.raises(ValueError, match="not a TIFF"):
        _read_ifd(pn)
    # unsupported compression: patch the tag in place (259 ->
    # old-style JPEG=6; new-style 7 is SUPPORTED since r12)
    data = bytearray(open(p, "rb").read())
    (ifd_off,) = struct.unpack("<I", data[4:8])
    (n,) = struct.unpack("<H", data[ifd_off : ifd_off + 2])
    for i in range(n):
        e = ifd_off + 2 + i * 12
        tag = struct.unpack("<H", data[e : e + 2])[0]
        if tag == 259:
            data[e + 8 : e + 10] = struct.pack("<H", 6)
    pl = os.path.join(d, "lzw.tif")
    open(pl, "wb").write(bytes(data))
    with pytest.raises(NotImplementedError, match="compression 6"):
        _read_ifd(pl)


def test_lzw_codec_roundtrip():
    """TIFF-variant LZW (MSB-first, early change): empty, repetitive,
    random (forces the 9→10→11-bit widenings), and >4094-entry input
    (forces a mid-stream CLEAR/reset)."""
    import random

    from pg_datalake_spark.sources.geotiff import lzw_decode, lzw_encode

    random.seed(1)
    cases = [
        b"", b"a", b"ababababab" * 50,
        bytes(random.randrange(256) for _ in range(5000)),
        bytes(5000),
        bytes(random.randrange(256) for _ in range(60000)),
    ]
    for data in cases:
        assert lzw_decode(lzw_encode(data)) == data


def test_lzw_eoi_width_boundary():
    """EOI code width when the final data code lands exactly on the
    decoder's early-change boundary (table sizes 510/1022/2046): the
    decoder appends its lagging entry after the last data code and
    widens, so the encoder must emit EOI at the widened width too.
    Sweeps lengths around each boundary for an all-fresh-pairs pattern
    (every byte pair distinct -> one table entry per input byte)."""
    import random

    from pg_datalake_spark.sources.geotiff import lzw_decode, lzw_encode

    # (i*7) % 251 never repeats a bigram within <251*? window: each
    # emit adds exactly one table entry, so length L puts the decoder
    # table at 258+L-2 after the tail -- lengths ~254/766/1790 hit the
    # 510/1022/2046 boundaries exactly (the ADVICE repro is L=254)
    random.seed(3)
    for center in (254, 766, 1790):
        for L in range(center - 4, center + 5):
            data = bytes((i * 7) % 251 for i in range(L))
            assert lzw_decode(lzw_encode(data)) == data, f"pattern L={L}"
            rnd = bytes(random.randrange(256) for _ in range(L))
            assert lzw_decode(lzw_encode(rnd)) == rnd, f"random L={L}"


def test_predictor2_float_fails_loud(tmp_path):
    """Predictor=2 is reserved for integer samples (floats use 3):
    both writer and reader fail loud instead of silently truncating
    through the int differencing path."""
    import numpy as np
    import pytest

    from pg_datalake_spark.sources.geotiff import _read_ifd, write_geotiff

    arr = np.linspace(0.0, 1.0, 16, dtype=np.float32).reshape(4, 4)
    p = str(tmp_path / "f32_pred2.tif")
    with pytest.raises(NotImplementedError, match="Predictor=2 with float"):
        write_geotiff(p, arr, predictor=2)
    # reader side: write a valid int tiff, then patch SampleFormat to
    # float so the parser sees Predictor=2 + SampleFormat=3
    import struct

    pi = str(tmp_path / "int_pred2.tif")
    write_geotiff(pi, np.arange(16, dtype=np.uint32).reshape(4, 4) * 1000,
                  predictor=2)
    data = bytearray(open(pi, "rb").read())
    (ifd_off,) = struct.unpack("<I", data[4:8])
    (n,) = struct.unpack("<H", data[ifd_off : ifd_off + 2])
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack("<H", data[e : e + 2])
        if tag == 339:  # SampleFormat -> 3 (IEEE float)
            data[e + 8 : e + 10] = struct.pack("<H", 3)
    pf = str(tmp_path / "float_pred2.tif")
    open(pf, "wb").write(bytes(data))
    with pytest.raises(NotImplementedError, match="Predictor=2 with float"):
        _read_ifd(pf)


def test_tiled_cog_with_overviews(spark):
    """Tiled layout + LZW + chained overview IFDs (the COG shape):
    one task per tile, edge tiles clipped back to the image, overview
    levels selectable and carrying the doubled pixel scale."""
    import tempfile

    from pg_datalake_spark.sources.geotiff import (
        _read_ifds,
        read_geotiff,
        write_geotiff,
    )

    d = tempfile.mkdtemp()
    arr = _planted(h=50, w=70)  # non-multiple of the tile size
    p = os.path.join(d, "cog.tif")
    write_geotiff(p, arr, tile=(32, 16), compression="lzw",
                  pixel_scale=(0.5, 0.25), tiepoint=(100.0, 50.0),
                  overviews=[2, 4])
    chain = _read_ifds(p)
    assert [(i["width"], i["height"]) for i in chain] == [
        (70, 50), (35, 25), (18, 13),
    ]
    assert all(i["tiled"] and i["compression"] == 5 for i in chain)
    df = read_geotiff(spark, p)
    assert df.rdd.getNumPartitions() == 12  # ceil(70/32)*ceil(50/16)
    rows = df.collect()
    assert len(rows) == 50 * 70 * 2  # edge padding clipped
    got = {(r.x, r.y, r.band): r for r in rows}
    r = got[(69, 49, 1)]
    assert r.value == float((69 * 31 + 49 * 17 + 7) % 997)
    assert (r.geo_x, r.geo_y) == (100.0 + 69 * 0.5, 50.0 - 49 * 0.25)
    # overview level 1: every-2nd-pixel decimation, doubled scale
    ov = {(r.x, r.y, r.band): r
          for r in read_geotiff(spark, p, level=1).collect()}
    assert len(ov) == 35 * 25 * 2
    r1 = ov[(3, 4, 0)]
    assert r1.value == float((6 * 31 + 8 * 17) % 997)
    assert (r1.geo_x, r1.geo_y) == (100.0 + 3 * 1.0, 50.0 - 4 * 0.5)
    with pytest.raises(ValueError, match="level 5"):
        read_geotiff(spark, p, level=5)


def test_gdal_dispatch_routes_tif(spark, tmp_path):
    """The reference reads .tif through its format-'gdal' dispatcher
    (docs/file-formats-reference.md raster row) — read_gdal routes
    .tif/.tiff to the GeoTIFF reader, with layer= selecting the COG
    overview level (the reference's layer option analog)."""
    from pg_datalake_spark.sources.gdal_dispatch import read_gdal
    from pg_datalake_spark.sources.geotiff import write_geotiff

    arr = _planted(h=8, w=8, b=1)
    p = os.path.join(str(tmp_path), "r.tif")
    write_geotiff(p, arr, tile=(8, 8), compression="lzw", overviews=[2])
    full = read_gdal(spark, p)
    assert full.count() == 64
    ov = read_gdal(spark, p, layer="1")
    assert ov.count() == 16


def test_big_endian_mm_roundtrip(spark, tmp_path):
    """Big-endian (MM) classic TIFF (r11): same IFD chain, tiles,
    DEFLATE and overview machinery with every struct field and the
    sample dtype byte-flipped — values and geo transform identical to
    the II form."""
    from pg_datalake_spark.sources.geotiff import (
        _read_ifds,
        read_geotiff,
        write_geotiff,
    )

    arr = _planted(h=20, w=30)
    p = os.path.join(str(tmp_path), "be.tif")
    write_geotiff(p, arr, byte_order=">", compression="deflate",
                  tile=(16, 8), pixel_scale=(0.5, 0.25),
                  tiepoint=(100.0, 50.0), overviews=[2])
    assert open(p, "rb").read(2) == b"MM"
    chain = _read_ifds(p)
    assert [i["dtype"] for i in chain] == [">u2", ">u2"]
    rows = read_geotiff(spark, p).collect()
    assert len(rows) == 20 * 30 * 2
    got = {(r.x, r.y, r.band): r for r in rows}
    r = got[(29, 19, 1)]
    assert r.value == float((29 * 31 + 19 * 17 + 7) % 997)
    assert (r.geo_x, r.geo_y) == (100.0 + 29 * 0.5, 50.0 - 19 * 0.25)
    assert read_geotiff(spark, p, level=1).count() == 15 * 10 * 2


def test_packbits_roundtrip_and_read(spark, tmp_path):
    """PackBits (32773), the third classic TIFF codec: byte-level RLE
    roundtrips (runs, literals, mixed, 128-boundary), and a
    PackBits-compressed raster reads back exactly."""
    import random

    from pg_datalake_spark.sources.geotiff import (
        packbits_decode,
        packbits_encode,
        read_geotiff,
        write_geotiff,
    )

    random.seed(3)
    cases = [
        b"", b"a", b"aaaa", b"abcabc", bytes([7] * 300),
        bytes([1] * 128), bytes([1] * 129),
        bytes(random.randrange(4) for _ in range(5000)),
        bytes(random.randrange(256) for _ in range(5000)),
    ]
    for d in cases:
        assert packbits_decode(packbits_encode(d)) == d
    arr = _planted(h=12, w=16, b=1)
    p = os.path.join(str(tmp_path), "pb.tif")
    write_geotiff(p, arr, compression="packbits", rows_per_strip=4)
    rows = read_geotiff(spark, p).collect()
    assert len(rows) == 12 * 16
    got = {(r.x, r.y): r.value for r in rows}
    assert got[(15, 11)] == float((15 * 31 + 11 * 17) % 997)


def test_predictor_horizontal_differencing(spark, tmp_path):
    """Predictor=2 (tag 317, horizontal differencing) — what GDAL
    pairs with LZW/DEFLATE by default. Without it a real-world file
    would decode WRONG silently, so the tag is parsed, undone with a
    per-row modular cumulative sum (uint8 wraparound covered), and
    unknown predictors fail loud."""
    from pg_datalake_spark.sources.geotiff import (
        _read_ifd,
        read_geotiff,
        write_geotiff,
    )

    arr = _planted(h=12, w=16)
    for name, kw in [
        ("p_lzw.tif", dict(compression="lzw", predictor=2,
                           rows_per_strip=4)),
        ("p_tile.tif", dict(compression="deflate", predictor=2,
                            tile=(8, 4))),
    ]:
        p = os.path.join(str(tmp_path), name)
        write_geotiff(p, arr, **kw)
        got = {(r.x, r.y, r.band): r.value
               for r in read_geotiff(spark, p).collect()}
        assert all(
            got[(x, y, b)] == float(arr[y, x, b])
            for x in range(16) for y in range(12) for b in range(2)
        )
    # uint8 wraparound under differencing
    import numpy as np

    ys, xs = np.indices((6, 40))
    a8 = (xs * 91 + ys * 53).astype(np.uint8)
    p8 = os.path.join(str(tmp_path), "p_u8.tif")
    write_geotiff(p8, a8, compression="packbits", predictor=2,
                  rows_per_strip=3)
    got = {(r.x, r.y): r.value for r in read_geotiff(spark, p8).collect()}
    assert all(
        got[(x, y)] == float(a8[y, x]) for x in range(40) for y in range(6)
    )
    # unknown predictor fails loud: patch tag 317 to 3 (fp predictor)
    import struct

    data = bytearray(open(p8, "rb").read())
    (ifd_off,) = struct.unpack("<I", data[4:8])
    (n,) = struct.unpack("<H", data[ifd_off : ifd_off + 2])
    for i in range(n):
        e = ifd_off + 2 + i * 12
        if struct.unpack("<H", data[e : e + 2])[0] == 317:
            data[e + 8 : e + 10] = struct.pack("<H", 3)
    pbad = os.path.join(str(tmp_path), "p_bad.tif")
    open(pbad, "wb").write(bytes(data))
    with pytest.raises(NotImplementedError, match="Predictor=3"):
        _read_ifd(pbad)


def test_bigtiff_read_full_roundtrip(spark):
    """BigTIFF (magic 43, r12): 16-byte header, u64 offsets, 20-byte
    IFD entries — same pixel values, georeferencing, tiling and
    overview chain as the classic variant, both byte orders."""
    import numpy as np

    d = tempfile.mkdtemp()
    arr = _planted()
    for bo in ("<", ">"):
        p = os.path.join(d, f"big_{'le' if bo == '<' else 'be'}.tif")
        write_geotiff(p, arr, tile=(32, 16), compression="lzw",
                      pixel_scale=(0.5, 0.25), tiepoint=(100.0, 50.0),
                      overviews=[2], byte_order=bo, bigtiff=True)
        df = read_geotiff(spark, p)
        rows = df.collect()
        assert len(rows) == 48 * 64 * 2
        got = {(r.x, r.y, r.band): r for r in rows}
        for x, y, b in [(0, 0, 0), (63, 47, 1), (10, 20, 1)]:
            r = got[(x, y, b)]
            assert r.value == float((x * 31 + y * 17 + b * 7) % 997)
            assert r.geo_x == 100.0 + x * 0.5
            assert r.geo_y == 50.0 - y * 0.25
        # the COG overview level reads through the 8-byte IFD chain
        ov = read_geotiff(spark, p, level=1).collect()
        assert len(ov) == 24 * 32 * 2
    # a classic file is NOT misparsed as BigTIFF and vice versa
    pc = os.path.join(d, "classic.tif")
    write_geotiff(pc, arr, rows_per_strip=16)
    from pg_datalake_spark.sources.geotiff import _read_ifds

    assert _read_ifds(pc)[0]["width"] == 64


def test_bigtiff_malformed_header_fails_loud(tmp_path):
    import struct

    p = str(tmp_path / "bad.tif")
    with open(p, "wb") as fh:  # offset size 4 is not legal BigTIFF
        fh.write(b"II" + struct.pack("<HHHQ", 43, 4, 0, 16))
    from pg_datalake_spark.sources.geotiff import _read_ifds

    with pytest.raises(ValueError, match="BigTIFF"):
        _read_ifds(p)


def test_planar_config_2_band_separate(spark):
    """PlanarConfiguration=2 (r12 — previously fail-loud): chunks are
    per-band, band-major; one Spark task per (band, spatial cell);
    values/geo identical to the interleaved layout, including the
    predictor and BigTIFF combinations."""
    import numpy as np

    d = tempfile.mkdtemp()
    arr = _planted()
    pi_ = os.path.join(d, "interleaved.tif")
    pp = os.path.join(d, "planar2.tif")
    write_geotiff(pi_, arr, rows_per_strip=16)
    write_geotiff(pp, arr, rows_per_strip=16, planar=2, predictor=2,
                  compression="lzw", bigtiff=True)
    a = sorted((r.x, r.y, r.band, r.value) for r in read_geotiff(spark, pi_).collect())
    b = sorted((r.x, r.y, r.band, r.value) for r in read_geotiff(spark, pp).collect())
    assert a == b
    # band-separate doubles the task count (2 bands x strips)
    assert read_geotiff(spark, pp).rdd.getNumPartitions() == 2 * 3


def test_palette_color_expansion(spark):
    """Photometric=3 palette images (r12 — previously fail-loud):
    8-bit indices expand through the 768-entry u16 ColorMap into three
    R/G/B bands, GDAL-style."""
    import numpy as np

    d = tempfile.mkdtemp()
    idx = (np.arange(12 * 10) % 256).reshape(12, 10, 1).astype(np.uint8)
    cmap = (
        [(i * 257) % 65536 for i in range(256)]
        + [(i * 131) % 65536 for i in range(256)]
        + [(i * 7) % 65536 for i in range(256)]
    )
    p = os.path.join(d, "pal.tif")
    write_geotiff(p, idx, palette=cmap, compression="deflate")
    rows = read_geotiff(spark, p).collect()
    assert len(rows) == 12 * 10 * 3
    got = {(r.x, r.y, r.band): r.value for r in rows}
    for x, y in [(0, 0), (9, 11), (3, 7)]:
        i = int(idx[y, x, 0])
        assert got[(x, y, 0)] == float(cmap[i])
        assert got[(x, y, 1)] == float(cmap[256 + i])
        assert got[(x, y, 2)] == float(cmap[512 + i])
    # malformed palette metadata fails loud
    import struct as _struct

    from pg_datalake_spark.sources.geotiff import _read_ifds

    data = bytearray(open(p, "rb").read())
    # patch ColorMap (320) count down to 3 entries -> invalid
    (ifd_off,) = _struct.unpack("<I", data[4:8])
    (n,) = _struct.unpack("<H", data[ifd_off : ifd_off + 2])
    for i in range(n):
        e = ifd_off + 2 + i * 12
        tag = _struct.unpack("<H", data[e : e + 2])[0]
        if tag == 320:
            data[e + 4 : e + 8] = _struct.pack("<I", 3)
    bad = os.path.join(d, "badpal.tif")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(NotImplementedError, match="ColorMap"):
        _read_ifds(bad)


def test_sub8bit_bilevel_and_4bit_palette(spark):
    """1-bit bilevel and 4-bit (raw + palette) images (r12 — the last
    named sub-8-bit residue): rows unpack byte-aligned per the spec
    (MSB / high-nibble first), composing with strips, tiles, packbits/
    deflate/lzw and the ColorMap expansion."""
    import numpy as np

    d = tempfile.mkdtemp()
    # odd width forces per-row bit padding
    bil = ((np.arange(13 * 21) % 3) == 0).astype(np.uint8).reshape(13, 21, 1)
    p1 = os.path.join(d, "bilevel.tif")
    write_geotiff(p1, bil, sub_bits=1, rows_per_strip=5,
                  compression="packbits")
    got = {(r.x, r.y): r.value for r in read_geotiff(spark, p1).collect()}
    assert len(got) == 13 * 21
    assert all(got[(x, y)] == float(bil[y, x, 0])
               for y in range(13) for x in range(21))

    idx = (np.arange(9 * 7) % 16).astype(np.uint8).reshape(9, 7, 1)
    cmap = ([i * 4097 % 65536 for i in range(16)]
            + [i * 999 % 65536 for i in range(16)]
            + [i * 77 for i in range(16)])
    p4 = os.path.join(d, "pal4.tif")
    write_geotiff(p4, idx, sub_bits=4, palette=cmap, compression="deflate")
    rows = read_geotiff(spark, p4).collect()
    assert len(rows) == 9 * 7 * 3
    got4 = {(r.x, r.y, r.band): r.value for r in rows}
    assert all(
        got4[(x, y, c)] == float(cmap[c * 16 + int(idx[y, x, 0])])
        for y in range(9) for x in range(7) for c in range(3)
    )
    # writer guards: out-of-range values / wrong map size fail loud
    with pytest.raises(ValueError, match="sub_bits"):
        write_geotiff(os.path.join(d, "bad.tif"), idx, sub_bits=3)
    with pytest.raises(ValueError, match="ColorMap"):
        write_geotiff(os.path.join(d, "bad2.tif"), idx, sub_bits=4,
                      palette=cmap[:30])


def test_jpeg_in_tiff_strips_tiles_and_jpegtables(spark):
    """Compression=7 new-style JPEG (r12 — the final raster residue):
    per-strip/tile baseline streams via sources/jpeg_codec, including
    the abbreviated form with shared tables in the JPEGTables tag (the
    libtiff/GDAL layout). Lossy: values bounded by the quantizer."""
    import numpy as np

    from pg_datalake_spark.sources.geotiff import _read_ifds

    d = tempfile.mkdtemp()
    g = np.clip(np.add.outer(np.arange(40) * 2, np.arange(56) * 3),
                0, 255).astype(np.uint8)[:, :, None]
    for tile, abbr in ((None, False), ((16, 16), False), (None, True)):
        p = os.path.join(d, f"j_{bool(tile)}_{abbr}.tif")
        write_geotiff(p, g, compression="jpeg", rows_per_strip=16,
                      tile=tile, jpeg_abbreviated=abbr,
                      pixel_scale=(0.5, 0.25), tiepoint=(10.0, 20.0))
        if abbr:
            assert _read_ifds(p)[0]["jpeg_tables"]
        rows = read_geotiff(spark, p).collect()
        assert len(rows) == 40 * 56
        got = np.zeros((40, 56))
        for r in rows:
            got[r.y, r.x] = r.value
        assert np.abs(got - g[:, :, 0]).max() <= 3, (tile, abbr)
        r0 = next(r for r in rows if (r.x, r.y) == (2, 4))
        assert r0.geo_x == 10.0 + 2 * 0.5 and r0.geo_y == 20.0 - 4 * 0.25
    # 3-band RGB through the YCbCr path
    rgb = np.zeros((24, 40, 3), np.uint8)
    rgb[:, :, 0] = np.add.outer(np.arange(24) * 4, np.arange(40) * 2) % 256
    rgb[:, :, 1] = 90
    rgb[:, :, 2] = (np.arange(40)[None, :] * 5) % 256
    p = os.path.join(d, "jrgb.tif")
    write_geotiff(p, rgb, compression="jpeg", rows_per_strip=8)
    rows = read_geotiff(spark, p).collect()
    assert len(rows) == 24 * 40 * 3
    got = np.zeros((24, 40, 3))
    for r in rows:
        got[r.y, r.x, r.band] = r.value
    assert np.abs(got - rgb).max() <= 16
    # JPEG + incompatible options fail loud at write
    with pytest.raises(ValueError, match="jpeg"):
        write_geotiff(os.path.join(d, "bad.tif"),
                      rgb.astype(np.uint16), compression="jpeg")


def test_chunk_count_mismatch_fails_loud(spark, tmp_path, monkeypatch):
    """A TIFF whose StripOffsets count disagrees with the geometry-
    implied planes x grid enumeration must raise a named ValueError
    (r13 — previously a bare IndexError deep in task building)."""
    import pg_datalake_spark.sources.geotiff as gt

    p = str(tmp_path / "trunc.tif")
    write_geotiff(p, _planted(), rows_per_strip=16)
    real = gt._read_ifds

    def tampered(path):
        chain = real(path)
        chain[0]["offsets"] = chain[0]["offsets"][:-1]  # truncated tag
        return chain

    monkeypatch.setattr(gt, "_read_ifds", tampered)
    with pytest.raises(ValueError, match="truncated or corrupt"):
        gt.read_geotiff(spark, p)
