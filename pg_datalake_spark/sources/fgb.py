"""FlatGeoBuf (.fgb) reader + fixture writer — pure Python.

The reference imports FlatGeoBuf through GDAL (`.fgb | FlatGeoBuf |
inferred: Yes` in docs/file-formats-reference.md:96-138); offline the
public format spec (flatgeobuf.org, spec version 3) is implemented
directly on struct primitives, the same approach as the shapefile /
GeoPackage codecs in geo_files.py.

Layout (spec v3):

- 8 magic bytes ``fgb\\x03fgb\\x01`` (byte 3 = major version, byte 7 =
  patch; readers validate the major only);
- uint32-LE size-prefixed **Header** flatbuffer (name, envelope,
  geometry_type, columns, features_count, index_node_size, crs …);
- optional **packed Hilbert R-tree** index: ``num_nodes(features_count,
  index_node_size) * 40`` bytes, root level first, leaves last; every
  node is 4 float64 bbox values + a uint64 — for LEAF nodes that uint64
  is the feature's byte offset from the start of the features section;
- uint32-LE size-prefixed **Feature** flatbuffers: geometry (xy vector
  of doubles + type) and properties (a packed ``(uint16 column-index,
  value)`` byte buffer, value encoding fixed per Column type).

Flatbuffers themselves are decoded with a ~40-line generic reader
(root uoffset → table → signed soffset → vtable → field offsets) and
encoded with a small back-to-front builder — no flatbuffers package in
the runtime, and the subset used here (tables of scalars / vectors /
strings) is stable by spec.

Scale shape: the driver touches ONLY the header plus ``O(partitions)``
index-leaf seeks; feature parsing runs executor-side. With an index
present the feature stream is RANGE-PARTITIONED by leaf byte offsets,
so one multi-GB .fgb parallelizes across tasks (the same trick as
read_gpkg's ROWID ranges); without an index it degrades to one file
per task like the shapefile reader.
"""

from __future__ import annotations

import glob as _glob
import os
import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_fgb", "write_fgb_points", "fgb_header"]

_MAGIC = b"fgb\x03fgb\x01"

# ColumnType enum (spec v3)
_CT_BOOL, _CT_INT, _CT_LONG, _CT_DOUBLE, _CT_STRING = 2, 5, 7, 10, 11
_CT_BYTE, _CT_SHORT, _CT_FLOAT, _CT_JSON, _CT_DATETIME, _CT_BINARY = 0, 3, 9, 12, 13, 14
# GeometryType enum
_GT_POINT, _GT_LINESTRING, _GT_POLYGON = 1, 2, 3

_CT_SPARK = {
    _CT_BOOL: "boolean", _CT_INT: "int", _CT_LONG: "bigint",
    _CT_DOUBLE: "double", _CT_STRING: "string", _CT_BYTE: "tinyint",
    _CT_SHORT: "smallint", _CT_FLOAT: "float", _CT_JSON: "string",
    _CT_DATETIME: "string", _CT_BINARY: "binary",
}
_CT_NAME = {
    "bool": _CT_BOOL, "int": _CT_INT, "long": _CT_LONG,
    "double": _CT_DOUBLE, "string": _CT_STRING,
}


# ---------------------------------------------------------------------------
# Minimal generic flatbuffer READER (absolute little-endian indexing)
# ---------------------------------------------------------------------------


def _u16(b: bytes, p: int) -> int:
    return struct.unpack_from("<H", b, p)[0]


def _u32(b: bytes, p: int) -> int:
    return struct.unpack_from("<I", b, p)[0]


def _root(b: bytes) -> int:
    """Table position of the root table."""
    return _u32(b, 0)


def _field(b: bytes, table: int, fid: int) -> int:
    """Absolute position of field ``fid``'s data in ``table``, or 0 if
    the field is absent (vtable lookup; soffset is SIGNED)."""
    vtable = table - struct.unpack_from("<i", b, table)[0]
    vt_size = _u16(b, vtable)
    slot = 4 + 2 * fid
    if slot >= vt_size:
        return 0
    off = _u16(b, vtable + slot)
    return table + off if off else 0


def _indirect(b: bytes, p: int) -> int:
    """Follow a uoffset stored at p."""
    return p + _u32(b, p)


def _string(b: bytes, p: int) -> str:
    v = _indirect(b, p)
    n = _u32(b, v)
    return b[v + 4 : v + 4 + n].decode("utf-8")


def _vector(b: bytes, p: int) -> tuple[int, int]:
    """(element-0 position, element count) of a vector field at p."""
    v = _indirect(b, p)
    return v + 4, _u32(b, v)


# ---------------------------------------------------------------------------
# Minimal flatbuffer BUILDER (back-to-front, end-offset bookkeeping)
# ---------------------------------------------------------------------------


class _Builder:
    """Builds a flatbuffer by prepending; every object is identified by
    its END-offset (bytes from the buffer end), which is stable under
    prepends. Finish() pads the front so 8-byte-aligned objects land on
    8-aligned absolute addresses (all 8-byte data is prepended at
    end-offsets ≡ 0 mod 8 and the final length is a multiple of 8)."""

    def __init__(self) -> None:
        self.buf = bytearray()

    def _pad_to(self, align: int, extra: int = 0) -> None:
        while (len(self.buf) + extra) % align:
            self.buf[0:0] = b"\x00"

    def bytes_vector(self, data: bytes) -> int:
        self._pad_to(4, extra=len(data) + 4)
        self.buf[0:0] = struct.pack("<I", len(data)) + data
        return len(self.buf)

    def string(self, s: str) -> int:
        raw = s.encode("utf-8") + b"\x00"
        self._pad_to(4, extra=len(raw) + 4)
        self.buf[0:0] = struct.pack("<I", len(raw) - 1) + raw
        return len(self.buf)

    def f64_vector(self, vals: list[float]) -> int:
        body = struct.pack(f"<{len(vals)}d", *vals)
        # element 0 must end up 8-aligned: end-offset of element 0 is
        # (len + 4 + 8n) - 4 = len + 8n → need len ≡ 0 (mod 8), and the
        # 4-byte length word then sits directly before it.
        self._pad_to(8)
        self.buf[0:0] = struct.pack("<I", len(vals)) + body
        self._pad_to(4)  # keep the length word itself 4-aligned
        return len(self.buf)

    def uoffset_vector(self, offs: list[int]) -> int:
        self._pad_to(4, extra=4 * len(offs) + 4)
        chunk = bytearray(struct.pack("<I", len(offs)))
        base = len(self.buf) + 4 * len(offs)  # end-offset of elem slot 0
        for i, o in enumerate(offs):
            slot_end = base - 4 * i
            chunk += struct.pack("<I", slot_end - o)
        self.buf[0:0] = chunk
        return len(self.buf)

    def table(self, fields: list[tuple[int, str, object]]) -> int:
        """fields: (field_id, kind, value) with kind in
        {'u8','u16','u32','u64','bool','uoffset'}; uoffset values are
        end-offsets returned by earlier create calls. Fields are laid
        out 8-byte kinds first so one front pad aligns everything."""
        sizes = {"u8": 1, "bool": 1, "u16": 2, "u32": 4, "uoffset": 4, "u64": 8}
        order = sorted(fields, key=lambda f: -sizes[f[1]])
        pos = 4  # after the 4-byte soffset
        layout: list[tuple[int, str, object, int]] = []
        for fid, kind, val in order:
            sz = sizes[kind]
            pos = (pos + sz - 1) // sz * sz
            layout.append((fid, kind, val, pos))
            pos += sz
        tbl_size = (pos + 3) // 4 * 4
        max_fid = max(f[0] for f in fields) if fields else -1
        vt_size = 4 + 2 * (max_fid + 1)
        # chunk = vtable + table, table start at chunk offset vt_pad+vt_size
        vt = bytearray(struct.pack("<HH", vt_size, tbl_size))
        slots = [0] * (max_fid + 1)
        for fid, _k, _v, p in layout:
            slots[fid] = p
        for s in slots:
            vt += struct.pack("<H", s)
        if len(vt) % 4:
            vt += b"\x00" * (4 - len(vt) % 4)
        chunk = bytearray(vt)
        t0 = len(chunk)  # table start within chunk
        chunk += struct.pack("<i", t0)  # soffset: table - vtable = t0
        chunk += b"\x00" * (tbl_size - 4)
        # front-pad so the table start's end-offset is ≡ 0 mod 8
        # (covers inline u64 fields placed at 8-aligned table offsets)
        total_after = len(self.buf) + len(chunk)
        table_end_off = total_after - t0
        pad = (8 - table_end_off % 8) % 8
        chunk = bytearray(b"\x00" * pad) + chunk
        t0 += pad
        total_after = len(self.buf) + len(chunk)
        table_end_off = total_after - t0
        for fid, kind, val, p in layout:
            at = t0 + p
            if kind == "uoffset":
                field_end_off = total_after - at
                struct.pack_into("<I", chunk, at, field_end_off - int(val))
            elif kind == "u8":
                struct.pack_into("<B", chunk, at, int(val))
            elif kind == "bool":
                struct.pack_into("<B", chunk, at, 1 if val else 0)
            elif kind == "u16":
                struct.pack_into("<H", chunk, at, int(val))
            elif kind == "u32":
                struct.pack_into("<I", chunk, at, int(val))
            elif kind == "u64":
                struct.pack_into("<Q", chunk, at, int(val))
        self.buf[0:0] = chunk
        return table_end_off

    def finish(self, root: int) -> bytes:
        pad = (8 - (len(self.buf) + 4) % 8) % 8
        self.buf[0:0] = struct.pack("<I", 4 + pad + (len(self.buf) - root)) + (
            b"\x00" * pad
        )
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# Packed R-tree geometry (size + leaf layout)
# ---------------------------------------------------------------------------


def _rtree_num_nodes(num_items: int, node_size: int) -> int:
    node_size = min(max(node_size, 2), 65535)
    n, total = num_items, num_items
    while n != 1:
        n = (n + node_size - 1) // node_size
        total += n
    return total


# ---------------------------------------------------------------------------
# Header / feature codecs
# ---------------------------------------------------------------------------


def fgb_header(path: str) -> dict:
    """Parse the .fgb header driver-side: name, geometry_type, columns
    [(name, ColumnType)], features_count, index size in bytes, and the
    absolute byte offset where the features section starts."""
    with open(path, "rb") as fh:
        magic = fh.read(8)
        if magic[:4] != _MAGIC[:4] or magic[4:7] != _MAGIC[4:7]:
            raise ValueError(
                f"{path}: not FlatGeoBuf v3 (magic {magic!r}; only spec "
                "major version 3 is supported)"
            )
        (hlen,) = struct.unpack("<I", fh.read(4))
        hbuf = fh.read(hlen)
        header_end = 12 + hlen
    t = _root(hbuf)
    name_p = _field(hbuf, t, 0)
    gtype_p = _field(hbuf, t, 2)
    cols_p = _field(hbuf, t, 7)
    fcount_p = _field(hbuf, t, 8)
    nsize_p = _field(hbuf, t, 9)
    columns: list[tuple[str, int]] = []
    if cols_p:
        e0, n = _vector(hbuf, cols_p)
        for i in range(n):
            ct = _indirect(hbuf, e0 + 4 * i)
            cname_p = _field(hbuf, ct, 0)
            ctype_p = _field(hbuf, ct, 1)
            columns.append(
                (
                    _string(hbuf, cname_p) if cname_p else f"col{i}",
                    hbuf[ctype_p] if ctype_p else _CT_STRING,
                )
            )
    features_count = struct.unpack_from("<Q", hbuf, fcount_p)[0] if fcount_p else 0
    node_size = _u16(hbuf, nsize_p) if nsize_p else 16
    index_bytes = (
        _rtree_num_nodes(features_count, node_size) * 40
        if node_size > 0 and features_count > 0
        else 0
    )
    return {
        "name": _string(hbuf, name_p) if name_p else None,
        "geometry_type": hbuf[gtype_p] if gtype_p else 0,
        "columns": columns,
        "features_count": features_count,
        "index_node_size": node_size,
        "index_bytes": index_bytes,
        "features_start": header_end + index_bytes,
        "index_start": header_end,
    }


def _parse_properties(buf: bytes, columns: list[tuple[str, int]]) -> dict:
    out: dict = {}
    p, n = 0, len(buf)
    while p + 2 <= n:
        ci = struct.unpack_from("<H", buf, p)[0]
        p += 2
        cname, ctype = columns[ci]
        if ctype == _CT_BOOL:
            out[cname] = bool(buf[p]); p += 1
        elif ctype == _CT_BYTE:
            out[cname] = struct.unpack_from("<b", buf, p)[0]; p += 1
        elif ctype == _CT_SHORT:
            out[cname] = struct.unpack_from("<h", buf, p)[0]; p += 2
        elif ctype == _CT_INT:
            out[cname] = struct.unpack_from("<i", buf, p)[0]; p += 4
        elif ctype == _CT_LONG:
            out[cname] = struct.unpack_from("<q", buf, p)[0]; p += 8
        elif ctype == _CT_FLOAT:
            out[cname] = struct.unpack_from("<f", buf, p)[0]; p += 4
        elif ctype == _CT_DOUBLE:
            out[cname] = struct.unpack_from("<d", buf, p)[0]; p += 8
        elif ctype in (_CT_STRING, _CT_JSON, _CT_DATETIME, _CT_BINARY):
            ln = struct.unpack_from("<I", buf, p)[0]
            raw = bytes(buf[p + 4 : p + 4 + ln])
            out[cname] = raw if ctype == _CT_BINARY else raw.decode("utf-8")
            p += 4 + ln
        else:
            raise NotImplementedError(
                f"FlatGeoBuf column type {ctype} ({cname}) not supported"
            )
    return out


def _parse_feature(fbuf: bytes, columns: list[tuple[str, int]]) -> tuple:
    """→ (x, y, points, props dict). Geometry: xy vector decoded for
    Point/LineString/Polygon (outer ring; multi-parts via parts[0])."""
    t = _root(fbuf)
    geom_p = _field(fbuf, t, 0)
    props_p = _field(fbuf, t, 1)
    pts: list[tuple[float, float]] = []
    if geom_p:
        g = _indirect(fbuf, geom_p)
        xy_p = _field(fbuf, g, 1)
        if not xy_p:
            parts_p = _field(fbuf, g, 7)
            if parts_p:
                e0, n = _vector(fbuf, parts_p)
                if n:
                    g = _indirect(fbuf, e0)
                    xy_p = _field(fbuf, g, 1)
        if xy_p:
            e0, n = _vector(fbuf, xy_p)
            flat = struct.unpack_from(f"<{n}d", fbuf, e0)
            pts = list(zip(flat[0::2], flat[1::2]))
    props = {}
    if props_p:
        e0, n = _vector(fbuf, props_p)
        props = _parse_properties(fbuf[e0 : e0 + n], columns)
    x, y = (pts[0][0], pts[0][1]) if pts else (None, None)
    return x, y, pts, props


def _scan_features(
    path: str, start: int, end: int | None, columns: list[tuple[str, int]]
) -> Iterator[tuple]:
    """Parse size-prefixed features in [start, end) (end=None → EOF)."""
    with open(path, "rb") as fh:
        fh.seek(start)
        pos = start
        while end is None or pos < end:
            pre = fh.read(4)
            if len(pre) < 4:
                break
            (flen,) = struct.unpack("<I", pre)
            fbuf = fh.read(flen)
            if len(fbuf) < flen:
                raise ValueError(f"{path}: truncated feature at byte {pos}")
            yield _parse_feature(fbuf, columns)
            pos += 4 + flen


def read_fgb(
    spark: SparkSession, path_or_glob: str, num_partitions: int = 8
) -> DataFrame:
    """Read one or many .fgb files: ``x``/``y`` doubles (first vertex),
    ``points array<struct<x,y>>``, then the typed attribute columns
    from the header's Column table. Schema comes from the FIRST file's
    header; record parsing runs executor-side. When a file carries the
    packed R-tree index, its feature stream is split into
    ``num_partitions`` byte ranges via O(num_partitions) leaf-node
    seeks — the driver never reads feature bytes."""
    from pyspark.sql import functions as F  # noqa: F401

    paths = sorted(_glob.glob(path_or_glob)) or [path_or_glob]
    hdr = fgb_header(paths[0])
    columns = hdr["columns"]
    attr_schema = ", ".join(
        f"{name} {_CT_SPARK[ct]}" for name, ct in columns
    )
    schema = "x double, y double, points array<struct<x:double,y:double>>"
    if attr_schema:
        schema += ", " + attr_schema

    # Driver-side split planning: O(files × partitions) seeks, no
    # feature bytes touched.
    tasks: list[tuple[str, int, int]] = []  # (path, start, end; -1 = EOF)
    for p in paths:
        h = fgb_header(p)
        fsize = os.path.getsize(p)
        if h["index_bytes"] and h["features_count"] > 1 and num_partitions > 1:
            n = h["features_count"]
            nn = _rtree_num_nodes(n, h["index_node_size"])
            leaf0 = h["index_start"] + (nn - n) * 40
            k = min(num_partitions, n)
            bounds = [0]
            with open(p, "rb") as fh:
                for i in range(1, k):
                    li = n * i // k
                    fh.seek(leaf0 + li * 40 + 32)
                    (off,) = struct.unpack("<Q", fh.read(8))
                    if off != bounds[-1]:
                        bounds.append(off)
            starts = [h["features_start"] + b for b in bounds]
            ends = starts[1:] + [fsize]
            tasks += [(p, s, e) for s, e in zip(starts, ends)]
        else:
            tasks.append((p, h["features_start"], fsize))

    cols_bc = columns

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for path, start, end in zip(pdf["path"], pdf["start"], pdf["end"]):
                rows = list(
                    _scan_features(path, int(start), int(end), cols_bc)
                )
                out = {
                    "x": [r[0] for r in rows],
                    "y": [r[1] for r in rows],
                    "points": [
                        [{"x": px, "y": py} for px, py in r[2]] for r in rows
                    ],
                }
                for name, _ct in cols_bc:
                    out[name] = [r[3].get(name) for r in rows]
                yield pd.DataFrame(out)

    files = spark.createDataFrame(
        [(p, s, e) for p, s, e in tasks], "path string, start long, end long"
    )
    return files.repartition(len(tasks)).mapInPandas(parse, schema)


# ---------------------------------------------------------------------------
# Fixture writer (point features, optional real packed index)
# ---------------------------------------------------------------------------


def write_fgb_points(
    path: str,
    rows: list[tuple],
    columns: list[tuple[str, str]],
    name: str = "layer",
    index_node_size: int = 16,
) -> None:
    """Write point features: ``rows`` are (x, y, attr...) tuples,
    ``columns`` [(name, 'bool'|'int'|'long'|'double'|'string')]. When
    ``index_node_size`` > 0 a packed R-tree block is emitted with REAL
    leaf bboxes/feature offsets (insertion order, not Hilbert-sorted —
    fixture-grade: full scans and leaf-offset range partitioning are
    exact; spatial index QUERIES would need the Hilbert sort)."""
    feats: list[bytes] = []
    for r in rows:
        x, y = float(r[0]), float(r[1])
        b = _Builder()
        xy = b.f64_vector([x, y])
        geom = b.table([(1, "uoffset", xy), (6, "u8", _GT_POINT)])
        props = bytearray()
        for ci, ((cname, ctype), val) in enumerate(zip(columns, r[2:])):
            if val is None:
                continue
            props += struct.pack("<H", ci)
            ct = _CT_NAME[ctype]
            if ct == _CT_BOOL:
                props += struct.pack("<B", 1 if val else 0)
            elif ct == _CT_INT:
                props += struct.pack("<i", int(val))
            elif ct == _CT_LONG:
                props += struct.pack("<q", int(val))
            elif ct == _CT_DOUBLE:
                props += struct.pack("<d", float(val))
            else:
                raw = str(val).encode("utf-8")
                props += struct.pack("<I", len(raw)) + raw
        fields = [(0, "uoffset", geom)]
        if props:
            fields.append((1, "uoffset", b.bytes_vector(bytes(props))))
        feat = b.table(fields)
        feats.append(b.finish(feat))

    hb = _Builder()
    col_offs = []
    for cname, ctype in columns:
        s = hb.string(cname)
        col_offs.append(
            hb.table([(0, "uoffset", s), (1, "u8", _CT_NAME[ctype])])
        )
    cols_vec = hb.uoffset_vector(col_offs)
    name_off = hb.string(name)
    n = len(rows)
    node_size = index_node_size if n > 0 else 0
    header = hb.table(
        [
            (0, "uoffset", name_off),
            (2, "u8", _GT_POINT),
            (7, "uoffset", cols_vec),
            (8, "u64", n),
            (9, "u16", node_size),
        ]
    )
    hbuf = hb.finish(header)

    index = b""
    if node_size > 0 and n > 0:
        # leaf level: real bbox + byte offset of each feature
        offs, pos = [], 0
        for f in feats:
            offs.append(pos)
            pos += 4 + len(f)
        leaves = [
            struct.pack("<4dQ", float(r[0]), float(r[1]), float(r[0]),
                        float(r[1]), o)
            for r, o in zip(rows, offs)
        ]
        levels = [leaves]
        while len(levels[0]) != 1:
            prev = levels[0]
            nxt = []
            for i in range(0, len(prev), node_size):
                grp = prev[i : i + node_size]
                bbs = [struct.unpack("<4dQ", g) for g in grp]
                nxt.append(
                    struct.pack(
                        "<4dQ",
                        min(b0[0] for b0 in bbs), min(b0[1] for b0 in bbs),
                        max(b0[2] for b0 in bbs), max(b0[3] for b0 in bbs),
                        i * 40,
                    )
                )
            levels.insert(0, nxt)
        index = b"".join(nd for lvl in levels for nd in lvl)

    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(struct.pack("<I", len(hbuf)))
        fh.write(hbuf)
        fh.write(index)
        for f in feats:
            fh.write(struct.pack("<I", len(f)))
            fh.write(f)
