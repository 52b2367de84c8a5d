"""Minimal pure-Python Avro object-container codec.

The runtime has no avro/fastavro module and Spark ships without the
external spark-avro data source, but Iceberg metadata (manifest lists
and manifests) is Avro — so interop with external Iceberg tables
needs exactly this much Avro: schema-driven decode of container files
(null + deflate codecs) and encode with the null codec. Metadata
files are KB-scale and driver-side only, so pure Python is the right
tool — the data files themselves stay parquet and are read by Spark.

Implements the Avro 1.x container spec: magic ``Obj\\x01``, file
metadata map (``avro.schema``, ``avro.codec``), 16-byte sync marker,
then blocks of (record count, byte length, payload, sync).
Supported types: null, boolean, int, long, float, double, bytes,
string, record, enum, array, map, union, fixed. Logical types pass
through as their underlying type.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive decode
# ---------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    out = buf.read(n)
    if len(out) != n:
        raise EOFError("truncated bytes")
    return out


def _register(schema: dict, named: dict, ns: str | None) -> str | None:
    """Register a named type (record/enum/fixed) under BOTH its short
    name and its namespace-qualified fullname, so external writers that
    reference types by fullname (e.g. ``org.apache.iceberg.r102``)
    resolve. Returns the namespace nested types inherit (Avro spec: the
    most tightly enclosing schema's namespace)."""
    name = schema.get("name")
    if not name:
        return ns
    if "." in name:  # name IS a fullname; namespace attribute is ignored
        space, _, short = name.rpartition(".")
        named[name] = schema
        named[short] = schema
        return space
    space = schema.get("namespace", ns)
    named[name] = schema
    if space:
        named[f"{space}.{name}"] = schema
    return space


def _decode(schema, buf: io.BytesIO, named: dict, ns: str | None = None):
    """Decode one datum per ``schema`` (parsed JSON)."""
    if isinstance(schema, str):
        if schema in named:
            schema = named[schema]
        elif ns and f"{ns}.{schema}" in named:
            schema = named[f"{ns}.{schema}"]
        else:
            t = schema
            if t == "null":
                return None
            if t == "boolean":
                return buf.read(1) != b"\x00"
            if t in ("int", "long"):
                return _read_long(buf)
            if t == "float":
                return struct.unpack("<f", buf.read(4))[0]
            if t == "double":
                return struct.unpack("<d", buf.read(8))[0]
            if t == "bytes":
                return _read_bytes(buf)
            if t == "string":
                return _read_bytes(buf).decode("utf-8")
            raise ValueError(f"unknown type: {t}")
    if isinstance(schema, list):  # union: branch index then datum
        idx = _read_long(buf)
        return _decode(schema[idx], buf, named, ns)
    t = schema["type"]
    if t == "record":
        child_ns = _register(schema, named, ns)
        return {
            f["name"]: _decode(f["type"], buf, named, child_ns)
            for f in schema["fields"]
        }
    if t == "enum":
        _register(schema, named, ns)
        return schema["symbols"][_read_long(buf)]
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode(schema["items"], buf, named, ns))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, named, ns)
        return out
    if t == "fixed":
        _register(schema, named, ns)
        return buf.read(schema["size"])
    return _decode(t, buf, named, ns)  # e.g. {"type": "string", "logicalType": ...}


# ---------------------------------------------------------------------------
# primitive encode
# ---------------------------------------------------------------------------


def _write_zlong(out: bytearray, v: int) -> None:
    """Zigzag-encode a signed long then varint it."""
    u = (v << 1) ^ (v >> 63)
    u &= (1 << 64) - 1
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _write_bytes(out: bytearray, b: bytes) -> None:
    _write_zlong(out, len(b))
    out.extend(b)


def _branch_matches(branch, datum, named: dict) -> bool:
    """True when ``datum``'s Python type can encode as ``branch`` —
    used to pick the correct union branch (index order breaks unions
    of two non-null types)."""
    if isinstance(branch, str):
        if branch in named:
            return _branch_matches(named[branch], datum, named)
        t = branch
    else:
        t = branch["type"]
        if not isinstance(t, str):
            return _branch_matches(t, datum, named)
        if t == "record":
            return isinstance(datum, dict)
        if t == "enum":
            return isinstance(datum, str) and datum in branch.get("symbols", [])
        if t == "array":
            return isinstance(datum, list)
        if t == "map":
            return isinstance(datum, dict)
        if t == "fixed":
            return isinstance(datum, (bytes, bytearray))
        # {"type": "long", "logicalType": ...} wrapper
        return _branch_matches(t, datum, named)
    if t == "null":
        return datum is None
    if t == "boolean":
        return isinstance(datum, bool)
    if t in ("int", "long"):
        return isinstance(datum, int) and not isinstance(datum, bool)
    if t in ("float", "double"):
        return isinstance(datum, (int, float)) and not isinstance(datum, bool)
    if t == "bytes":
        return isinstance(datum, (bytes, bytearray))
    if t == "string":
        return isinstance(datum, str)
    return False


def _encode(schema, datum, out: bytearray, named: dict, ns: str | None = None) -> None:
    if isinstance(schema, str):
        if schema in named:
            _encode(named[schema], datum, out, named, ns)
            return
        if ns and f"{ns}.{schema}" in named:
            _encode(named[f"{ns}.{schema}"], datum, out, named, ns)
            return
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if datum else 0)
            return
        if t in ("int", "long"):
            _write_zlong(out, int(datum))
            return
        if t == "float":
            out.extend(struct.pack("<f", float(datum)))
            return
        if t == "double":
            out.extend(struct.pack("<d", float(datum)))
            return
        if t == "bytes":
            _write_bytes(out, bytes(datum))
            return
        if t == "string":
            _write_bytes(out, str(datum).encode("utf-8"))
            return
        raise ValueError(f"unknown type: {t}")
    if isinstance(schema, list):  # union: pick the branch matching the datum
        for i, branch in enumerate(schema):
            if _branch_matches(branch, datum, named):
                _write_zlong(out, i)
                _encode(branch, datum, out, named, ns)
                return
        raise ValueError(f"no union branch for {datum!r} in {schema}")
    t = schema["type"]
    if t == "record":
        child_ns = _register(schema, named, ns)
        for f in schema["fields"]:
            if f["name"] not in datum and "default" not in f:
                raise ValueError(f"missing field {f['name']}")
            _encode(f["type"], datum.get(f["name"], f.get("default")), out, named, child_ns)
        return
    if t == "enum":
        _register(schema, named, ns)
        _write_zlong(out, schema["symbols"].index(datum))
        return
    if t == "array":
        if datum:
            _write_zlong(out, len(datum))
            for item in datum:
                _encode(schema["items"], item, out, named, ns)
        _write_zlong(out, 0)
        return
    if t == "map":
        if datum:
            _write_zlong(out, len(datum))
            for k, v in datum.items():
                _write_bytes(out, str(k).encode("utf-8"))
                _encode(schema["values"], v, out, named, ns)
        _write_zlong(out, 0)
        return
    if t == "fixed":
        _register(schema, named, ns)
        out.extend(bytes(datum))
        return
    _encode(t, datum, out, named, ns)


# ---------------------------------------------------------------------------
# container files
# ---------------------------------------------------------------------------


def read_avro(path: str) -> tuple[dict | list | str, list]:
    """Read an Avro container file → (parsed schema JSON, records)."""
    with open(path, "rb") as fh:
        raw = fh.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an Avro container file: {path}")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec: {codec}")
    records: list = []
    named: dict = {}
    while buf.tell() < len(raw):
        count = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        block = io.BytesIO(payload)
        for _ in range(count):
            records.append(_decode(schema, block, named))
        if buf.read(16) != sync:
            raise ValueError("Avro sync marker mismatch")
    return schema, records


def write_avro(path: str, schema: dict, records: list, codec: str = "null") -> int:
    """Write an Avro container file (``null`` or ``deflate`` codec).
    Returns bytes written."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec: {codec}")
    sync = os.urandom(16)
    out = bytearray()
    out.extend(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    _write_zlong(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_zlong(out, 0)
    out.extend(sync)
    if records:
        body = bytearray()
        named: dict = {}
        for r in records:
            _encode(schema, r, body, named)
        payload = bytes(body)
        if codec == "deflate":  # raw deflate, no zlib header (Avro spec)
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        _write_zlong(out, len(records))
        _write_zlong(out, len(payload))
        out.extend(payload)
        out.extend(sync)
    data = bytes(out)
    with open(path, "wb") as fh:
        fh.write(data)
    return len(data)
