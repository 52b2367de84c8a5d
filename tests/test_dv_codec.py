"""Delta deletion-vector codec (tables/dv_codec.py) — public-spec
serialization: Z85 (ZeroMQ RFC test vector), portable
RoaringBitmapArray (magic 1681511377, per-bucket standard 32-bit
roaring with array/bitset/run containers), and the versioned +
CRC-checked sidecar file layout (delta-io/delta PROTOCOL.md,
"Deletion Vector Format")."""

from __future__ import annotations

import os
import struct
import uuid

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pg_datalake_spark.tables import dv_codec as dv


def test_z85_spec_vector_and_roundtrip():
    # the ZeroMQ Z85 reference test vector (public spec 32/Z85)
    assert dv.z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert dv.z85_decode("HelloWorld", 8) == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )
    for n in range(0, 33):
        b = os.urandom(n)
        assert dv.z85_decode(dv.z85_encode(b), n) == b


def test_serialized_blob_has_spec_magic_and_layout():
    blob = dv.serialize_dv([1, 2, 70000])
    magic, n_bitmaps = struct.unpack_from("<iq", blob, 0)
    assert magic == 1681511377 and n_bitmaps == 1  # all positions < 2^32
    (key,) = struct.unpack_from("<I", blob, 12)
    assert key == 0
    (cookie,) = struct.unpack_from("<i", blob, 16)
    assert cookie == 12346  # no-run-container cookie


@pytest.mark.parametrize(
    "positions",
    [
        [],
        [0],
        [0, 1, 2, 65535, 65536],
        list(range(5000)),          # > 4096 in one 16-bit bucket -> bitset container
        [2**32 - 1, 2**32, 2**33, 2**40 + 17],  # multiple high-32 buckets
    ],
)
def test_bitmap_roundtrip(positions):
    got = dv.deserialize_dv(dv.serialize_dv(positions))
    exp = np.unique(np.asarray(positions, dtype=np.int64)) if positions else []
    assert np.array_equal(got, np.asarray(exp, dtype=np.int64))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), max_size=400),
)
def test_bitmap_roundtrip_property(values):
    got = dv.deserialize_dv(dv.serialize_dv(values))
    assert np.array_equal(got, np.unique(np.asarray(values, dtype=np.int64)))


def test_parse_run_container_cookie():
    """Hand-build a cookie-12347 bitmap with one RUN container (the
    layout other writers emit; our serializer never does) and check the
    parser expands it: run [start=10, len-1=4] == {10..14}."""
    n = 1
    buf = struct.pack("<i", 12347 | ((n - 1) << 16))
    buf += bytes([0b1])  # run-flag bitset: container 0 is a run
    buf += struct.pack("<HH", 3, 5 - 1)  # key=3, cardinality 5
    # n < 4 -> no offset section for the run cookie
    buf += struct.pack("<H", 1)  # one run
    buf += struct.pack("<HH", 10, 4)  # start 10, length-1 = 4
    vals, pos = dv._parse_roaring32(buf, 0)
    assert pos == len(buf)
    assert list(vals) == [(3 << 16) | v for v in range(10, 15)]


def test_sidecar_file_offsets_and_checksum(tmp_path):
    blobs = [dv.serialize_dv(range(i * 100, i * 100 + 50)) for i in range(1, 4)]
    p = str(tmp_path / "dv.bin")
    offs = dv.write_dv_file(p, blobs)
    assert offs[0] == 1  # version byte precedes the first length word
    for off, blob in zip(offs, blobs):
        assert dv.read_dv_blob(p, off, len(blob)) == blob
    # flip a payload byte -> CRC must catch it
    data = bytearray(open(p, "rb").read())
    data[offs[0] + 4] ^= 0xFF
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="checksum"):
        dv.read_dv_blob(p, offs[0], len(blobs[0]))


def test_uuid_descriptor_path_with_and_without_prefix():
    u = uuid.uuid4()
    assert dv.dv_relative_path(dv.make_uuid_descriptor_path(u)) == (
        f"deletion_vector_{u}.bin"
    )
    enc = dv.make_uuid_descriptor_path(u, prefix="ab/cd/")
    assert dv.dv_relative_path(enc) == f"ab/cd/deletion_vector_{u}.bin"


def test_inline_descriptor_decode():
    blob = dv.serialize_dv([7, 9, 11])
    desc = {
        "storageType": "i",
        "pathOrInlineDv": dv.z85_encode(blob),
        "sizeInBytes": len(blob),
        "cardinality": 3,
    }
    assert list(dv.decode_descriptor_positions(desc, "/nonexistent")) == [7, 9, 11]
