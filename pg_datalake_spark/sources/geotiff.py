"""Minimal GeoTIFF raster reader + fixture writer — pure Python.

The reference reads raster GeoTIFF through GDAL (`.tif | GeoTIFF |
docs/file-formats-reference.md:96-138`) — the one documented format
family this repo had scoped out. This closes the MINIMUM slice:
classic little-endian TIFF, stripped (not tiled), band-interleaved
(PlanarConfiguration=1), compression none(1) or DEFLATE(8/32946),
integer and float sample formats, plus the two GeoTIFF georeferencing
tags actually needed to place pixels — ModelPixelScaleTag (33550) and
ModelTiepointTag (33922). Everything else fails loud by name (BigTIFF,
tiles, palettes, JPEG/LZW, PlanarConfiguration=2).

Scale shape: the driver parses ONLY the IFD — a few hundred bytes per
file, O(strips) metadata — and builds a strip-descriptor DataFrame;
strip decode runs executor-side in mapInPandas, one task per strip
(a 100 GB raster with 8 MB strips fans out to ~12k tasks). Pixels are
emitted long-form ``(path, band, x, y, value, geo_x, geo_y)`` so the
result joins/aggregates like any other table.
"""

from __future__ import annotations

import glob as _glob
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

# TIFF type sizes: 1 BYTE, 2 ASCII, 3 SHORT, 4 LONG, 5 RATIONAL,
# 8 SSHORT, 9 SLONG, 11 FLOAT, 12 DOUBLE
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d"}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 8: 2, 9: 4, 11: 4, 12: 8}

_TAG = {
    "ImageWidth": 256,
    "ImageLength": 257,
    "BitsPerSample": 258,
    "Compression": 259,
    "Photometric": 262,
    "StripOffsets": 273,
    "SamplesPerPixel": 277,
    "RowsPerStrip": 278,
    "StripByteCounts": 279,
    "PlanarConfig": 284,
    "SampleFormat": 339,
    "TileWidth": 322,
    "ModelPixelScale": 33550,
    "ModelTiepoint": 33922,
}
_TAG_NAME = {v: k for k, v in _TAG.items()}

# (SampleFormat, BitsPerSample) -> numpy dtype string (little-endian)
_DTYPES = {
    (1, 8): "u1", (1, 16): "<u2", (1, 32): "<u4",
    (2, 8): "i1", (2, 16): "<i2", (2, 32): "<i4",
    (3, 32): "<f4", (3, 64): "<f8",
}


def _read_ifd(path: str) -> dict:
    """Parse the TIFF header + first IFD. Driver-side, O(IFD bytes)."""
    with open(path, "rb") as fh:
        head = fh.read(8)
        if head[:2] == b"MM":
            raise NotImplementedError(
                f"geotiff: big-endian (MM) TIFF not supported: {path}"
            )
        if head[:2] != b"II":
            raise ValueError(f"geotiff: not a TIFF (bad byte order): {path}")
        magic = struct.unpack("<H", head[2:4])[0]
        if magic == 43:
            raise NotImplementedError(f"geotiff: BigTIFF not supported: {path}")
        if magic != 42:
            raise ValueError(f"geotiff: bad TIFF magic {magic}: {path}")
        (ifd_off,) = struct.unpack("<I", head[4:8])
        fh.seek(ifd_off)
        (n_entries,) = struct.unpack("<H", fh.read(2))
        raw = fh.read(n_entries * 12)
        tags: dict[str, tuple] = {}
        pending: list[tuple[str, int, int, int]] = []
        for i in range(n_entries):
            tag, typ, count, val_raw = struct.unpack(
                "<HHI4s", raw[i * 12 : i * 12 + 12]
            )
            name = _TAG_NAME.get(tag)
            if name is None:
                continue
            size = _TYPE_SIZE.get(typ, 1) * count
            if size <= 4:
                fmt = _TYPE_FMT.get(typ)
                if fmt:
                    tags[name] = struct.unpack(f"<{count}{fmt}", val_raw[:size])
            else:
                (off,) = struct.unpack("<I", val_raw)
                pending.append((name, typ, count, off))
        for name, typ, count, off in pending:
            fh.seek(off)
            fmt = _TYPE_FMT.get(typ)
            if fmt:
                tags[name] = struct.unpack(
                    f"<{count}{fmt}", fh.read(_TYPE_SIZE[typ] * count)
                )
    if "TileWidth" in tags:
        raise NotImplementedError(f"geotiff: tiled TIFF not supported: {path}")
    comp = tags.get("Compression", (1,))[0]
    if comp not in (1, 8, 32946):
        raise NotImplementedError(
            f"geotiff: compression {comp} not supported (only none/DEFLATE):"
            f" {path}"
        )
    if tags.get("PlanarConfig", (1,))[0] != 1:
        raise NotImplementedError(
            f"geotiff: PlanarConfiguration=2 (band-separate) not supported:"
            f" {path}"
        )
    spp = tags.get("SamplesPerPixel", (1,))[0]
    bits = tags.get("BitsPerSample", (1,) * spp)
    sfmt = tags.get("SampleFormat", (1,) * spp)
    if len(set(bits)) != 1 or len(set(sfmt)) != 1:
        raise NotImplementedError(
            f"geotiff: mixed per-band sample types not supported: {path}"
        )
    key = (sfmt[0], bits[0])
    if key not in _DTYPES:
        raise NotImplementedError(
            f"geotiff: SampleFormat={sfmt[0]} BitsPerSample={bits[0]} not "
            f"supported: {path}"
        )
    scale = tags.get("ModelPixelScale", (1.0, 1.0, 0.0))
    tie = tags.get("ModelTiepoint", (0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    return {
        "width": tags["ImageWidth"][0],
        "height": tags["ImageLength"][0],
        "bands": spp,
        "dtype": _DTYPES[key],
        "compression": comp,
        "rows_per_strip": tags.get("RowsPerStrip", (tags["ImageLength"][0],))[0],
        "strip_offsets": list(tags["StripOffsets"]),
        "strip_byte_counts": list(tags["StripByteCounts"]),
        # pixel (px, py) -> geo: gx = tx + (px - tpx) * sx ;
        #                        gy = ty - (py - tpy) * sy
        "sx": float(scale[0]),
        "sy": float(scale[1]),
        "tpx": float(tie[0]),
        "tpy": float(tie[1]),
        "tx": float(tie[3]),
        "ty": float(tie[4]),
    }


def read_geotiff(spark: SparkSession, path_or_glob: str) -> DataFrame:
    """Read GeoTIFF file(s) long-form: one row per (pixel, band) —
    ``path, band, x, y, value, geo_x, geo_y``. The driver reads only
    each file's IFD; strips decode executor-side, one task per strip."""
    paths = sorted(_glob.glob(path_or_glob)) or [path_or_glob]
    tasks = []  # one per strip
    for p in paths:
        ifd = _read_ifd(p)
        for si, (off, cnt) in enumerate(
            zip(ifd["strip_offsets"], ifd["strip_byte_counts"])
        ):
            row0 = si * ifd["rows_per_strip"]
            nrows = min(ifd["rows_per_strip"], ifd["height"] - row0)
            tasks.append(
                (
                    p, off, cnt, row0, nrows, ifd["width"], ifd["bands"],
                    ifd["dtype"], ifd["compression"], ifd["sx"], ifd["sy"],
                    ifd["tpx"], ifd["tpy"], ifd["tx"], ifd["ty"],
                )
            )

    def decode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for t in pdf.itertuples(index=False):
                with open(t.path, "rb") as fh:
                    fh.seek(int(t.off))
                    buf = fh.read(int(t.cnt))
                if int(t.comp) in (8, 32946):
                    buf = zlib.decompress(buf)
                arr = np.frombuffer(buf, dtype=t.dtype).reshape(
                    int(t.nrows), int(t.width), int(t.bands)
                )
                ys, xs, bs = np.indices(arr.shape).reshape(3, -1)
                px = xs.astype("int64")
                py = (ys + int(t.row0)).astype("int64")
                yield pd.DataFrame(
                    {
                        "path": t.path,
                        "band": bs.astype("int32"),
                        "x": px,
                        "y": py,
                        "value": arr.reshape(-1).astype("float64"),
                        "geo_x": t.tx + (px - t.tpx) * t.sx,
                        "geo_y": t.ty - (py - t.tpy) * t.sy,
                    }
                )

    cols = (
        "path string, off long, cnt long, row0 long, nrows long, "
        "width long, bands long, dtype string, comp long, sx double, "
        "sy double, tpx double, tpy double, tx double, ty double"
    )
    files = spark.createDataFrame(tasks, cols)
    out_schema = (
        "path string, band int, x long, y long, value double, "
        "geo_x double, geo_y double"
    )
    return files.repartition(max(len(tasks), 1)).mapInPandas(
        decode, out_schema
    )


def write_geotiff(
    path: str,
    array,
    *,
    rows_per_strip: int = 16,
    compression: str = "none",
    pixel_scale: tuple[float, float] = (1.0, 1.0),
    tiepoint: tuple[float, float] = (0.0, 0.0),
) -> None:
    """Write a (height, width, bands) numpy array as a classic
    little-endian stripped GeoTIFF (fixture writer for tests/queries;
    band-interleaved, compression 'none' or 'deflate')."""
    import numpy as np

    arr = np.ascontiguousarray(array)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, bands = arr.shape
    dt = arr.dtype
    if dt.kind == "u":
        sfmt, bits = 1, dt.itemsize * 8
    elif dt.kind == "i":
        sfmt, bits = 2, dt.itemsize * 8
    elif dt.kind == "f":
        sfmt, bits = 3, dt.itemsize * 8
    else:
        raise ValueError(f"geotiff writer: unsupported dtype {dt}")
    if (sfmt, bits) not in _DTYPES:
        raise ValueError(f"geotiff writer: unsupported dtype {dt}")
    arr = arr.astype(dt.newbyteorder("<"))
    comp_code = {"none": 1, "deflate": 8}[compression]

    strips = []
    for r0 in range(0, h, rows_per_strip):
        raw = arr[r0 : r0 + rows_per_strip].tobytes()
        strips.append(zlib.compress(raw) if comp_code == 8 else raw)

    # layout: header(8) | strip data | out-of-line tag arrays | IFD
    pos = 8
    strip_offs = []
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)

    def short_arr(vals):
        return 3, len(vals), struct.pack(f"<{len(vals)}H", *vals)

    def long_arr(vals):
        return 4, len(vals), struct.pack(f"<{len(vals)}I", *vals)

    def dbl_arr(vals):
        return 12, len(vals), struct.pack(f"<{len(vals)}d", *vals)

    sx, sy = pixel_scale
    tx, ty = tiepoint
    entries = [
        (256, *long_arr([w])),
        (257, *long_arr([h])),
        (258, *short_arr([bits] * bands)),
        (259, *short_arr([comp_code])),
        (262, *short_arr([1])),
        (273, *long_arr(strip_offs)),
        (277, *short_arr([bands])),
        (278, *long_arr([rows_per_strip])),
        (279, *long_arr([len(s) for s in strips])),
        (284, *short_arr([1])),
        (339, *short_arr([sfmt] * bands)),
        (33550, *dbl_arr([sx, sy, 0.0])),
        (33922, *dbl_arr([0.0, 0.0, 0.0, tx, ty, 0.0])),
    ]
    # out-of-line payloads
    blobs = []
    for tag, typ, count, payload in entries:
        if len(payload) > 4:
            blobs.append((tag, pos))
            pos += len(payload)
    blob_off = dict(blobs)
    ifd_off = pos

    with open(path, "wb") as fh:
        fh.write(b"II" + struct.pack("<HI", 42, ifd_off))
        for s in strips:
            fh.write(s)
        for tag, typ, count, payload in entries:
            if len(payload) > 4:
                fh.write(payload)
        fh.write(struct.pack("<H", len(entries)))
        for tag, typ, count, payload in entries:
            if len(payload) <= 4:
                val = payload + b"\x00" * (4 - len(payload))
            else:
                val = struct.pack("<I", blob_off[tag])
            fh.write(struct.pack("<HHI", tag, typ, count) + val)
        fh.write(struct.pack("<I", 0))  # next-IFD pointer: none
