"""Pure-Python Shapefile / GeoPackage codecs (sources/geo_files.py).

The reference imports these through GDAL (gdal.c,
docs/file-formats-reference.md:96-138); offline the public binary
specs are implemented directly. src05's oracle row checks the
end-to-end aggregate; these tests pin the format-level details —
polygon records, dbf typing, NULL shapes, rowid-range partitioning,
and the fail-loud on unsupported shape types.
"""

from __future__ import annotations

import os
import sqlite3
import struct

import pytest

from pg_datalake_spark.sources import geo_files as G


def test_point_shapefile_roundtrip_with_dbf_types(spark, tmp_path):
    rows = [
        (1.5, -2.25, 7, "alpha", 3.14),
        (-0.5, 0.0, -12, "beta", -1.5),
        (100.25, 9.75, 0, "a" * 12, 0.0),  # string exactly at field width
    ]
    fields = [("key", "N", 10, 0), ("name", "C", 12, 0), ("score", "N", 12, 4)]
    base = str(tmp_path / "pts")
    G.write_point_shapefile(base, rows, fields)
    got = sorted(
        (r.x, r.y, r.key, r.name, r.score)
        for r in G.read_shapefile(spark, base + ".shp").collect()
    )
    assert got == sorted(rows)
    # dbf typing: N dec=0 -> long, N dec>0 -> double, C -> string
    dt = dict(G.read_shapefile(spark, base + ".shp").dtypes)
    assert dt == {
        "x": "double", "y": "double",
        "key": "bigint", "name": "string", "score": "double",
    }


def test_polygon_shapefile_parse(tmp_path, spark):
    """Hand-write a spec-shaped polygon .shp (type 5, one ring) and a
    matching .dbf; the reader must surface parts + points."""
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0), (0.0, 0.0)]
    base = str(tmp_path / "poly")
    content = struct.pack("<i", 5)
    content += struct.pack("<4d", 0.0, 0.0, 4.0, 3.0)
    content += struct.pack("<ii", 1, len(ring))
    content += struct.pack("<i", 0)  # one part at offset 0
    for x, y in ring:
        content += struct.pack("<dd", x, y)
    words = len(content) // 2
    with open(base + ".shp", "wb") as fh:
        fh.write(
            struct.pack(">i", 9994) + b"\x00" * 20
            + struct.pack(">i", (100 + 8 + len(content)) // 2)
            + struct.pack("<ii", 1000, 5)
            + struct.pack("<4d", 0.0, 0.0, 4.0, 3.0)
            + struct.pack("<4d", 0, 0, 0, 0)
        )
        fh.write(struct.pack(">ii", 1, words))
        fh.write(content)
    G._write_dbf(base + ".dbf", [(42,)], [("zone", "N", 6, 0)])
    [r] = G.read_shapefile(spark, base + ".shp").collect()
    assert r.zone == 42 and r.parts == [0]
    assert [(p.x, p.y) for p in r.points] == ring


def test_shapefile_bad_magic_and_unsupported_type_fail_loud(tmp_path, spark):
    bad = str(tmp_path / "bad.shp")
    with open(bad, "wb") as fh:
        fh.write(b"\x00" * 100)
    with pytest.raises(ValueError, match="file code"):
        G.read_shapefile(spark, bad)
    # multipoint (type 8) is unsupported -> NotImplementedError at parse
    base = str(tmp_path / "mp")
    with open(base + ".shp", "wb") as fh:
        fh.write(
            struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", 58)
            + struct.pack("<ii", 1000, 8) + struct.pack("<8d", *([0.0] * 8))
        )
        content = struct.pack("<i", 8) + struct.pack("<4d", 0, 0, 0, 0) + struct.pack("<i", 0)
        fh.write(struct.pack(">ii", 1, len(content) // 2))
        fh.write(content)
    G._write_dbf(base + ".dbf", [], [("k", "N", 4, 0)])
    with pytest.raises(Exception, match="shape type 8"):
        G.read_shapefile(spark, base + ".shp").collect()


def test_gpkg_roundtrip_rowid_partitioning_and_nulls(spark, tmp_path):
    path = str(tmp_path / "t.gpkg")
    rows = [(float(i), float(i % 7), i, f"n{i}") for i in range(101)]
    G.write_gpkg_points(path, "pts", rows, [("key", "INTEGER"), ("name", "TEXT")])
    # NULL geometry row survives as NULL x/y
    con = sqlite3.connect(path)
    con.execute("INSERT INTO pts (geom, key, name) VALUES (NULL, 999, 'void')")
    con.commit()
    con.close()
    df = G.read_gpkg(spark, path, num_partitions=5)
    assert df.rdd.getNumPartitions() == 5  # rowid ranges, not one task
    got = {r.key: (r.x, r.y, r.name) for r in df.collect()}
    assert len(got) == 102
    assert got[999] == (None, None, "void")
    assert got[50] == (50.0, 1.0, "n50")
    # table auto-discovery picked the single feature table
    assert sorted(r.key for r in G.read_gpkg(spark, path, table="pts").collect()) \
        == sorted(got)


def test_gpkg_blob_parser_variants():
    # envelope-carrying header (flags bit 1..3 = 1 -> 32-byte envelope)
    wkb = b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", 2.5, -3.5)
    env = struct.pack("<4d", 0, 0, 0, 0)
    blob = b"GP\x00" + bytes([0x03]) + struct.pack("<i", 4326) + env + wkb
    assert G._parse_gpkg_blob(blob) == [(2.5, -3.5)]
    # big-endian WKB
    wkb_be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 1.0, 2.0)
    blob_be = b"GP\x00\x01" + struct.pack("<i", 4326) + wkb_be
    assert G._parse_gpkg_blob(blob_be) == [(1.0, 2.0)]
    # linestring (type 2): full vertex list
    ls = (
        b"\x01" + struct.pack("<I", 2) + struct.pack("<I", 3)
        + struct.pack("<6d", 0, 0, 1, 1, 2, 0.5)
    )
    assert G._parse_gpkg_blob(b"GP\x00\x01" + struct.pack("<i", 4326) + ls) == [
        (0.0, 0.0), (1.0, 1.0), (2.0, 0.5)
    ]
    # polygon (type 3): outer ring only
    poly = (
        b"\x01" + struct.pack("<I", 3) + struct.pack("<I", 1)
        + struct.pack("<I", 4) + struct.pack("<8d", 0, 0, 4, 0, 4, 3, 0, 0)
    )
    assert G._parse_gpkg_blob(b"GP\x00\x01" + struct.pack("<i", 4326) + poly) == [
        (0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 0.0)
    ]
    with pytest.raises(ValueError, match="magic"):
        G._parse_gpkg_blob(b"XX\x00\x01aaaa")
    with pytest.raises(NotImplementedError, match="WKB type"):
        # Z-variant point (1001) is out of 2D scope
        G._parse_gpkg_blob(
            b"GP\x00\x01" + struct.pack("<i", 4326)
            + b"\x01" + struct.pack("<I", 1001) + struct.pack("<ddd", 0, 0, 0)
        )


def test_xlsx_roundtrip_types_and_shared_strings(spark, tmp_path):
    from pg_datalake_spark.sources.office_files import read_xlsx, write_xlsx

    path = str(tmp_path / "t.xlsx")
    rows = [
        (1.5, "alpha & <beta>", True),
        (-2.0, "alpha & <beta>", False),  # shared string reused
        (0.25, "z", True),
    ]
    write_xlsx(path, ["val", "tag name", "flag"], rows)
    df = read_xlsx(spark, path)
    # header sanitized to identifiers; types inferred per column
    assert dict(df.dtypes) == {
        "val": "double", "tag_name": "string", "flag": "boolean"
    }
    got = sorted((r.val, r.tag_name, r.flag) for r in df.collect())
    assert got == sorted(rows)
    # shared-strings table must dedup: 3 header strings + 2 unique
    # data strings (the repeated 'alpha & <beta>' collapses)
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    assert root.attrib["uniqueCount"] == "5"


def test_xlsx_inline_string_and_gap_cells(spark, tmp_path):
    """Hand-written sheet with an inlineStr cell and a skipped column:
    the reader must honor cell references, not cell order."""
    import zipfile

    from pg_datalake_spark.sources.office_files import read_xlsx

    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>b</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>c</t></is></c></row>'
        '<row r="2"><c r="A2"><v>1</v></c><c r="C2"><v>3</v></c></row>'
        "</sheetData></worksheet>"
    )
    path = str(tmp_path / "gap.xlsx")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    [r] = read_xlsx(spark, path).collect()
    assert (r.a, r.b, r.c) == (1.0, None, 3.0)


def test_kml_points_linestring_and_extended_data(spark, tmp_path):
    from pg_datalake_spark.sources.geo_files import read_kml, write_kml_points

    path = str(tmp_path / "pts.kml")
    write_kml_points(
        path,
        [("p<1>", 1.5, -2.5, 42), ("p2", 0.0, 9.0, 7)],
        ["key"],
    )
    got = {r.name: r for r in read_kml(spark, path).collect()}
    assert got["p<1>"].x == 1.5 and got["p<1>"].y == -2.5
    assert got["p<1>"].key == "42" and got["p2"].key == "7"
    # hand-written LineString placemark: full coordinate list surfaces
    ls = str(tmp_path / "line.kml")
    with open(ls, "w") as fh:
        fh.write(
            '<?xml version="1.0"?><kml xmlns="http://www.opengis.net/kml/2.2">'
            "<Document><Placemark><name>road</name><LineString><coordinates>"
            "0.0,0.0 1.0,1.0 2.0,0.5"
            "</coordinates></LineString></Placemark></Document></kml>"
        )
    [r] = read_kml(spark, ls).collect()
    assert r.name == "road" and (r.x, r.y) == (0.0, 0.0)
    assert [(p.x, p.y) for p in r.points] == [(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)]


def test_gpkg_hostile_table_name_is_quoted_not_executed(spark, tmp_path):
    """r10 (review fix): table/column names discovered INSIDE a .gpkg
    are untrusted — a crafted name must be treated as an identifier
    (sqlite quoting), never spliced into SQL as syntax."""
    path = str(tmp_path / "evil.gpkg")
    evil = 'pts" UNION SELECT name,1,2 FROM sqlite_master; --'
    G.write_gpkg_points(
        path, evil, [(1.5, -2.5, 7, "ok")], [("key", "INTEGER"), ("name", "TEXT")]
    )
    got = G.read_gpkg(spark, path).collect()
    assert len(got) == 1
    assert (got[0].x, got[0].y, got[0].key, got[0].name) == (1.5, -2.5, 7, "ok")


def test_geojson_mixed_geometries_and_typed_properties(spark, tmp_path):
    """r10: the Spark-native GeoJSON reader — typed property inference
    (long/double/string from JSON types), mixed Point/LineString/
    Polygon in ONE collection via the coordinates-as-string re-read,
    null geometry surviving as null x/y/points."""
    import json

    p = str(tmp_path / "mixed.geojson")
    doc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "geometry": {"type": "Point", "coordinates": [1.5, -2.5]},
             "properties": {"k": 1, "name": "a", "bal": 3.25}},
            {"type": "Feature",
             "geometry": {"type": "LineString",
                          "coordinates": [[0, 0], [1, 1], [2, 0.5]]},
             "properties": {"k": 2, "name": "b", "bal": None}},
            {"type": "Feature",
             "geometry": {"type": "Polygon",
                          "coordinates": [[[0, 0], [4, 0], [4, 3], [0, 0]]]},
             "properties": {"k": 3, "name": None, "bal": 1.0}},
            {"type": "Feature", "geometry": None,
             "properties": {"k": 4, "name": "d", "bal": 0.5}},
            {"type": "Feature",
             "geometry": {"type": "MultiPoint",
                          "coordinates": [[7, 8], [9, 10]]},
             "properties": {"k": 5, "name": "e", "bal": 2.0}},
        ],
    }
    json.dump(doc, open(p, "w"))
    df = G.read_geojson(spark, p)
    assert dict(df.dtypes)["k"] == "bigint"
    assert dict(df.dtypes)["bal"] == "double"
    rows = {r.k: r for r in df.collect()}
    assert (rows[1].x, rows[1].y, rows[1].name) == (1.5, -2.5, "a")
    assert [tuple(pt) for pt in rows[2].points] == [(0, 0), (1, 1), (2, 0.5)]
    assert len(rows[3].points) == 4  # polygon outer ring
    assert rows[4].x is None and rows[4].points is None
    assert [tuple(pt) for pt in rows[5].points] == [(7, 8), (9, 10)]
    # not-a-FeatureCollection fails loud
    p2 = str(tmp_path / "bad.geojson")
    json.dump({"type": "Point", "coordinates": [1, 2]}, open(p2, "w"))
    with pytest.raises(ValueError, match="FeatureCollection"):
        G.read_geojson(spark, p2)


def test_gml_namespaces_and_geometry_forms(spark, tmp_path):
    """r10: the GML reader across spec generations — 3.2 gml:pos point
    (fixture writer), 3.x gml:posList linestring, and GML-2
    gml:coordinates comma tuples; simple-text properties surface as
    string columns, geometry containers don't."""
    p32 = str(tmp_path / "a.gml")
    G.write_gml_points(p32, [(1.5, -2.5, 7, "BUILDING")], ["key", "seg"])
    got = G.read_gml(spark, p32).collect()
    assert len(got) == 1
    assert (got[0].x, got[0].y, got[0].key, got[0].seg) == (1.5, -2.5, "7", "BUILDING")

    p2 = str(tmp_path / "b.gml")
    with open(p2, "w") as fh:
        fh.write(
            '<?xml version="1.0"?>'
            '<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml"'
            ' xmlns:app="http://x/app">'
            "<gml:featureMember><app:road>"
            "<app:name>r1</app:name>"
            "<app:geom><gml:LineString>"
            "<gml:posList>0 0 1 1 2 0.5</gml:posList>"
            "</gml:LineString></app:geom>"
            "</app:road></gml:featureMember>"
            "<gml:featureMember><app:road>"
            "<app:name>r2</app:name>"
            "<app:geom><gml:Point>"
            "<gml:coordinates>3.5,4.5</gml:coordinates>"
            "</gml:Point></app:geom>"
            "</app:road></gml:featureMember>"
            "</gml:FeatureCollection>"
        )
    rows = {r.name: r for r in G.read_gml(spark, p2).collect()}
    assert [tuple(pt) for pt in rows["r1"].points] == [(0, 0), (1, 1), (2, 0.5)]
    assert (rows["r2"].x, rows["r2"].y) == (3.5, 4.5)


def test_gdal_dispatch_options_and_fail_loud(spark, tmp_path):
    """read_gdal (r10): compression inference, zip_path selection with
    shapefile sidecar staging, kmz auto-detect, GeoJSONSeq dispatch,
    and the fail-loud paths (ambiguous zip, scoped-out format, unknown
    extension, missing member)."""
    import gzip
    import zipfile

    from pg_datalake_spark.sources.gdal_dispatch import (
        infer_gdal_compression,
        read_gdal,
    )

    assert infer_gdal_compression("a.geojson.gz") == "gzip"
    assert infer_gdal_compression("a.kmz") == "zip"
    assert infer_gdal_compression("a.shp") == "none"

    # GeoJSONSeq through the dispatcher: line-delimited, splittable.
    seq = str(tmp_path / "f.geojsonl")
    G.write_geojson_seq(seq, [(1.0, 2.0, 7, "x"), (3.0, 4.0, 8, "y")],
                        ["key", "seg"])
    got = sorted((r.x, r.y, r.key, r.seg)
                 for r in read_gdal(spark, seq).collect())
    assert got == [(1.0, 2.0, 7, "x"), (3.0, 4.0, 8, "y")]

    # .gz: inferred gzip, inner extension re-dispatched.
    gz = str(tmp_path / "f.geojsonl.gz")
    with open(seq, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    assert read_gdal(spark, gz).count() == 2

    # zip with two candidate formats: ambiguous without zip_path.
    G.write_point_shapefile(str(tmp_path / "p"),
                            [(0.5, 1.5, 1, "a")],
                            [("key", "N", 10, 0), ("seg", "C", 4, 0)])
    amb = str(tmp_path / "amb.zip")
    with zipfile.ZipFile(amb, "w") as z:
        z.write(str(tmp_path / "p.shp"), "p.shp")
        z.write(str(tmp_path / "p.dbf"), "p.dbf")
        z.write(seq, "f.geojsonl")
    with pytest.raises(ValueError, match="zip_path"):
        read_gdal(spark, amb)
    # zip_path picks the shapefile; the .dbf sidecar stages with it.
    rows = read_gdal(spark, amb, zip_path="p.shp").collect()
    assert [(r.x, r.y, r.key, r.seg) for r in rows] == [(0.5, 1.5, 1, "a")]
    with pytest.raises(FileNotFoundError, match="zip_path"):
        read_gdal(spark, amb, zip_path="nope.shp")

    # scoped-out and unknown extensions fail loud, named
    # (.dxf reads since r12; binary .dwg stays out).
    (tmp_path / "x.dwg").write_bytes(b"\x00")
    with pytest.raises(NotImplementedError, match="scoped out"):
        read_gdal(spark, str(tmp_path / "x.dwg"))
    (tmp_path / "x.bin").write_bytes(b"\x00")
    with pytest.raises(ValueError, match="cannot infer"):
        read_gdal(spark, str(tmp_path / "x.bin"))


def test_fgb_roundtrip_typed_columns_and_range_partitioning(spark, tmp_path):
    """FlatGeoBuf codec (r10): typed columns (long/string/double/bool),
    null attributes, packed-R-tree leaf-offset RANGE partitioning (the
    one-big-file scale path), the no-index fallback, multi-file glob,
    and the version fail-loud."""
    from pg_datalake_spark.sources import fgb

    rows = [
        (float(i), float(-i), i, f"name_{i}", i * 0.25, i % 2 == 0)
        for i in range(37)
    ]
    cols = [("key", "long"), ("name", "string"),
            ("score", "double"), ("flag", "bool")]
    p = str(tmp_path / "a.fgb")
    fgb.write_fgb_points(p, rows, cols, index_node_size=4)

    df = fgb.read_fgb(spark, p, num_partitions=5)
    assert dict(df.dtypes) == {
        "x": "double", "y": "double",
        "points": "array<struct<x:double,y:double>>",
        "key": "bigint", "name": "string", "score": "double",
        "flag": "boolean",
    }
    got = sorted((r.x, r.key, r.name, r.score, r.flag) for r in df.collect())
    assert got == [(float(i), i, f"name_{i}", i * 0.25, i % 2 == 0)
                   for i in range(37)]
    # the index split actually produced multiple tasks
    assert df.rdd.getNumPartitions() == 5

    # no-index file: single range per file, same rows
    p2 = str(tmp_path / "b.fgb")
    fgb.write_fgb_points(p2, rows[:5], cols, index_node_size=0)
    assert fgb.read_fgb(spark, p2).count() == 5

    # glob over both + dispatcher integration
    from pg_datalake_spark.sources.gdal_dispatch import read_gdal
    assert read_gdal(spark, str(tmp_path / "*.fgb")).count() == 42

    # fail loud on a wrong major version
    bad = bytearray(open(p, "rb").read())
    bad[3] = 9
    (tmp_path / "bad.fgb").write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="spec"):
        fgb.fgb_header(str(tmp_path / "bad.fgb"))


def test_fgb_codec_property_roundtrip():
    """Hypothesis: arbitrary typed rows survive the FlatGeoBuf
    write→header→scan roundtrip bit-exactly (no Spark session — the
    codec itself is the subject; alignment bugs in the flatbuffer
    builder show up as garbled decodes on odd string lengths / row
    counts / node sizes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pg_datalake_spark.sources import fgb

    finite = st.floats(allow_nan=False, allow_infinity=False, width=64)
    attr = st.tuples(
        st.one_of(st.none(), st.integers(-(2**62), 2**62)),
        st.one_of(st.none(), st.text(max_size=40)),
        st.one_of(st.none(), finite),
        st.one_of(st.none(), st.booleans()),
    )
    row = st.tuples(finite, finite).flatmap(
        lambda xy: attr.map(lambda a: (xy[0], xy[1], *a))
    )

    import tempfile

    d = tempfile.mkdtemp(prefix="fgb_prop_")

    @settings(max_examples=25, deadline=None)
    @given(
        rows=st.lists(row, min_size=1, max_size=40),
        node_size=st.sampled_from([0, 2, 3, 16]),
    )
    def check(rows, node_size):
        cols = [("key", "long"), ("name", "string"),
                ("score", "double"), ("flag", "bool")]
        p = os.path.join(d, "t.fgb")
        fgb.write_fgb_points(p, rows, cols, index_node_size=node_size)
        h = fgb.fgb_header(p)
        assert h["features_count"] == len(rows)
        got = list(fgb._scan_features(p, h["features_start"], None,
                                      h["columns"]))
        assert len(got) == len(rows)
        for (x, y, k, nm, sc, fl), (gx, gy, _pts, props) in zip(rows, got):
            assert gx == x and gy == y
            assert props.get("key") == k
            assert props.get("name") == nm
            assert props.get("score") == sc
            assert props.get("flag") == fl

    check()


def test_xlsx_multi_sheet_layer_option(spark, tmp_path):
    """Multi-sheet workbooks (r10): write_xlsx(extra_sheets=...), the
    reader's sheet= (the GDAL layer option) addressing each by NAME
    through workbook.xml → rels indirection; default = first sheet;
    unknown names fail loud listing the workbook's sheets."""
    from pg_datalake_spark.sources.gdal_dispatch import read_gdal
    from pg_datalake_spark.sources.office_files import read_xlsx, write_xlsx

    path = str(tmp_path / "wb.xlsx")
    write_xlsx(
        path,
        ["a", "b"],
        [(1.0, "x"), (2.0, "y")],
        extra_sheets=[
            ("Sheet 2", ["k", "v"], [(10.0, True), (20.0, False)]),
            ("summary", ["n"], [(99.0,)]),
        ],
    )
    assert [r.a for r in read_xlsx(spark, path).collect()] == [1.0, 2.0]
    s2 = read_xlsx(spark, path, sheet="Sheet 2")
    assert dict(s2.dtypes) == {"k": "double", "v": "boolean"}
    assert sorted((r.k, r.v) for r in s2.collect()) == [(10.0, True),
                                                        (20.0, False)]
    # through the dispatcher's layer option
    assert [r.n for r in read_gdal(spark, path, layer="summary").collect()] \
        == [99.0]
    with pytest.raises(ValueError, match="Sheet 2"):
        read_xlsx(spark, path, sheet="nope")


def _write_mif_pair(base, mif_body, mid_body=None, delim=","):
    mif = base + ".mif"
    cols = (
        'VERSION 300\nCHARSET "Neutral"\n'
        f'DELIMITER "{delim}"\n'
        "COLUMNS 3\n  name Char(20)\n  pop Integer\n  score Float\n"
        "DATA\n"
    )
    with open(mif, "w") as fh:
        fh.write(cols + mif_body)
    if mid_body is not None:
        with open(base + ".mid", "w") as fh:
            fh.write(mid_body)
    return mif


def test_mapinfo_mif_mid_geometries_and_typed_attrs(spark, tmp_path):
    """MIF/MID pair (r12 — previously scoped-out): POINT / LINE /
    PLINE (count inline and next-line, MULTIPLE sections) / REGION
    (outer ring kept) / NONE, styling clauses skipped, MID attributes
    typed per the COLUMNS declaration, quoted delimiters respected."""
    from pg_datalake_spark.sources.geo_files import read_mapinfo

    mif = _write_mif_pair(
        str(tmp_path / "t"),
        "POINT 1.5 2.5\n"
        "    SYMBOL (34,0,12)\n"
        "LINE 0 0 3 4\n"
        "PLINE 3\n0 0\n1 1\n2 0\n"
        "PLINE MULTIPLE 2\n2\n0 0\n1 0\n2\n5 5\n6 6\n"
        "REGION 2\n4\n0 0\n4 0\n4 4\n0 4\n"
        "4\n1 1\n2 1\n2 2\n1 2\n"
        "  PEN (1,2,0)\n  BRUSH (2,16777215,16777215)\n"
        "NONE\n",
        'alpha,10,1.25\n"beta, inc",20,2.5\ngamma,30,\ndelta,40,4.0\n'
        "epsilon,50,5.0\nzeta,,6.0\n",
    )
    df = read_mapinfo(spark, mif)
    rows = df.collect()
    assert len(rows) == 6
    assert [f.name for f in df.schema.fields] == [
        "x", "y", "points", "name", "pop", "score",
    ]
    assert df.schema["pop"].dataType.simpleString() == "int"
    assert df.schema["score"].dataType.simpleString() == "double"
    by = {r["name"]: r for r in rows}
    assert (by["alpha"].x, by["alpha"].y) == (1.5, 2.5)
    assert by["beta, inc"].points == [  # quoted delimiter respected
        {"x": 0.0, "y": 0.0}, {"x": 3.0, "y": 4.0},
    ] or [(p.x, p.y) for p in by["beta, inc"].points] == [(0.0, 0.0), (3.0, 4.0)]
    assert len(by["gamma"].points) == 3 and by["gamma"].score is None
    assert len(by["delta"].points) == 4  # MULTIPLE sections concatenate
    assert len(by["epsilon"].points) == 4  # REGION: outer ring only
    assert by["zeta"].points is None and by["zeta"].pop is None


def test_mapinfo_fail_louds_and_dispatch(spark, tmp_path):
    import zipfile

    import pytest

    from pg_datalake_spark.sources.gdal_dispatch import read_gdal
    from pg_datalake_spark.sources.geo_files import read_mapinfo

    # unsupported geometry record names fail loud
    mif = _write_mif_pair(
        str(tmp_path / "arc"), "ARC 0 0 1 1 0 90\n", "a,1,1.0\n"
    )
    # executor-side raise surfaces wrapped in Spark's PythonException
    with pytest.raises(Exception, match="ARC"):
        read_mapinfo(spark, mif).collect()
    # declared COLUMNS with no .mid sidecar fails loud
    mif2 = _write_mif_pair(str(tmp_path / "nomid"), "POINT 0 0\n")
    with pytest.raises(Exception, match="mid sidecar"):
        read_mapinfo(spark, mif2).collect()
    # dispatcher routes .mif, and stages the .mid out of a zip
    base = str(tmp_path / "z")
    _write_mif_pair(base, "POINT 7 8\n", "eta,70,7.0\n")
    zp = str(tmp_path / "pair.zip")
    with zipfile.ZipFile(zp, "w") as z:
        z.write(base + ".mif", "z.mif")
        z.write(base + ".mid", "z.mid")
    rows = read_gdal(spark, zp).collect()
    assert len(rows) == 1 and rows[0]["name"] == "eta" and rows[0].x == 7.0
    # binary .tab is still scoped out BY NAME
    open(str(tmp_path / "t.tab"), "wb").write(b"\x00")
    with pytest.raises(NotImplementedError, match="scoped out"):
        read_gdal(spark, str(tmp_path / "t.tab"))
    # a glob mixing files with identical column NAMES but different
    # declared TYPES fails loud (r13 — previously silently coerced
    # every file with the first file's types)
    gd = tmp_path / "glob"
    gd.mkdir()
    _write_mif_pair(str(gd / "a"), "POINT 0 0\n", "a,1,1.0\n")
    mixed = str(gd / "b") + ".mif"
    with open(mixed, "w") as fh:
        fh.write(
            'VERSION 300\nDELIMITER ","\n'
            "COLUMNS 3\n  name Char(20)\n  pop Char(5)\n  score Float\n"
            "DATA\nPOINT 1 1\n"
        )
    with open(str(gd / "b") + ".mid", "w") as fh:
        fh.write("b,xx,2.0\n")
    with pytest.raises(Exception, match="names AND declared types"):
        read_mapinfo(spark, str(gd / "*.mif")).collect()


def test_dxf_entities_and_dispatch(spark, tmp_path):
    """DXF (r12 — the ASCII half of the CAD pair, previously
    scoped-out): POINT / LINE / LWPOLYLINE (closed) / legacy
    POLYLINE+VERTEX+SEQEND / CIRCLE (16-chord sampling), layers kept;
    unsupported entities fail loud by name; .dxf routes through the
    GDAL dispatcher."""
    import pytest

    from pg_datalake_spark.sources.gdal_dispatch import read_gdal
    from pg_datalake_spark.sources.geo_files import read_dxf

    def pairs(*items):
        return "\n".join(str(x) for pair in items for x in pair) + "\n"

    body = pairs(
        (0, "SECTION"), (2, "HEADER"), (0, "ENDSEC"),
        (0, "SECTION"), (2, "ENTITIES"),
        (0, "POINT"), (8, "sites"), (10, "1.5"), (20, "2.5"),
        (0, "LINE"), (8, "roads"), (10, "0"), (20, "0"),
        (11, "3"), (21, "4"),
        (0, "LWPOLYLINE"), (8, "parcels"), (90, "3"), (70, "1"),
        (10, "0"), (20, "0"), (10, "2"), (20, "0"), (10, "2"), (20, "2"),
        (0, "POLYLINE"), (8, "legacy"), (66, "1"),
        (0, "VERTEX"), (8, "legacy"), (10, "5"), (20, "5"),
        (0, "VERTEX"), (8, "legacy"), (10, "6"), (20, "7"),
        (0, "SEQEND"),
        (0, "CIRCLE"), (8, "wells"), (10, "10"), (20, "10"), (40, "2"),
        (0, "ENDSEC"),
        (0, "EOF"),
    )
    p = str(tmp_path / "t.dxf")
    open(p, "w").write(body)
    df = read_dxf(spark, p)
    rows = {r.entity: r for r in df.collect()}
    assert set(rows) == {"POINT", "LINE", "LWPOLYLINE", "POLYLINE",
                         "CIRCLE"}
    assert (rows["POINT"].x, rows["POINT"].y) == (1.5, 2.5)
    assert rows["POINT"].layer == "sites"
    assert [(pt.x, pt.y) for pt in rows["LINE"].points] == [(0, 0), (3, 4)]
    # closed flag appends the first vertex
    assert len(rows["LWPOLYLINE"].points) == 4
    assert rows["LWPOLYLINE"].points[-1] == rows["LWPOLYLINE"].points[0]
    assert [(pt.x, pt.y) for pt in rows["POLYLINE"].points] == [
        (5, 5), (6, 7)]
    assert len(rows["CIRCLE"].points) == 16
    assert rows["CIRCLE"].points[0].x == 12.0  # cx + r
    # dispatcher routes .dxf
    assert read_gdal(spark, p).count() == 5
    # unsupported entity fails loud by name
    bad = pairs(
        (0, "SECTION"), (2, "ENTITIES"),
        (0, "TEXT"), (10, "0"), (20, "0"),
        (0, "ENDSEC"), (0, "EOF"),
    )
    pb = str(tmp_path / "bad.dxf")
    open(pb, "w").write(bad)
    with pytest.raises(Exception, match="TEXT"):
        read_dxf(spark, pb).collect()


def test_xodr_roads_line_arc_and_dispatch(spark, tmp_path):
    """OpenDRIVE .xodr (r12 — previously scoped-out): plan-view
    reference lines composed from <line> and <arc> primitives with
    closed-form endpoints; spiral fails loud by name; dispatcher
    routes the extension."""
    import math

    import pytest

    from pg_datalake_spark.sources.gdal_dispatch import read_gdal
    from pg_datalake_spark.sources.geo_files import read_xodr

    xodr = """<?xml version="1.0"?>
<OpenDRIVE>
  <road id="r1" name="main" length="20.0">
    <planView>
      <geometry s="0" x="0" y="0" hdg="0" length="10">
        <line/>
      </geometry>
      <geometry s="10" x="10" y="0" hdg="0" length="{qlen}">
        <arc curvature="0.1"/>
      </geometry>
    </planView>
  </road>
  <road id="r2" name="spur" length="5.0">
    <planView>
      <geometry s="0" x="50" y="50" hdg="1.5707963267948966" length="5">
        <line/>
      </geometry>
    </planView>
  </road>
</OpenDRIVE>""".format(qlen=math.pi / 2 / 0.1)  # quarter circle r=10
    p = str(tmp_path / "net.xodr")
    open(p, "w").write(xodr)
    rows = {r.road_id: r for r in read_xodr(spark, p).collect()}
    assert set(rows) == {"r1", "r2"}
    r1 = rows["r1"]
    assert (r1.x, r1.y) == (0.0, 0.0) and r1.length == 20.0
    pts = [(pt.x, pt.y) for pt in r1.points]
    assert pts[0] == (0.0, 0.0) and pts[1] == (10.0, 0.0)
    # quarter arc of radius 10 starting at (10,0) heading +x, CCW:
    # endpoint (10 + 10, 0 + 10) = (20, 10)
    ex, ey = pts[-1]
    assert abs(ex - 20.0) < 1e-9 and abs(ey - 10.0) < 1e-9
    assert len(pts) > 4  # arc is sampled, not just endpoints
    r2 = rows["r2"]
    assert [(pt.x, pt.y) for pt in r2.points][-1] == (50.0, 55.0)
    assert read_gdal(spark, p).count() == 2
    # spiral fails loud by name
    bad = xodr.replace("<arc curvature=\"0.1\"/>", "<spiral/>")
    pb = str(tmp_path / "bad.xodr")
    open(pb, "w").write(bad)
    with pytest.raises(Exception, match="spiral"):
        read_xodr(spark, pb).collect()


def test_mif_geometry_grammar_property():
    """Hypothesis (r13, judge task #8): random feature sequences —
    POINT / LINE / PLINE [MULTIPLE] / REGION / NONE with styling
    clauses interleaved anywhere — render to MIF text and parse back
    to exactly the modeled geometry list (no Spark; the grammar itself
    is the subject). Coordinates are /64 dyadics so the decimal text
    roundtrip is bit-exact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pg_datalake_spark.sources.geo_files import _parse_mif_geometries

    coord = st.integers(-(2**20), 2**20).map(lambda n: n / 64)
    pt = st.tuples(coord, coord)
    pts = lambda lo, hi: st.lists(pt, min_size=lo, max_size=hi)  # noqa: E731
    feature = st.one_of(
        st.just(("NONE", None)),
        pt.map(lambda p: ("POINT", [p])),
        st.tuples(pt, pt).map(lambda ab: ("LINE", list(ab))),
        pts(2, 5).map(lambda ps: ("PLINE", ps)),
        st.lists(pts(2, 4), min_size=1, max_size=3).map(
            lambda secs: ("PLINE_MULTIPLE", secs)
        ),
        st.lists(pts(3, 5), min_size=1, max_size=3).map(
            lambda rings: ("REGION", rings)
        ),
    )
    styling = st.sampled_from(
        ["    SYMBOL (34,0,12)", "  PEN (1,2,0)",
         "  BRUSH (2,16777215,16777215)", "SMOOTH", "CENTER 1 2"]
    )

    def render(kind, payload, rng_style):
        if kind == "NONE":
            return ["NONE"]
        if kind == "POINT":
            (x, y), = payload
            return [f"POINT {x} {y}"]
        if kind == "LINE":
            (x1, y1), (x2, y2) = payload
            return [f"LINE {x1} {y1} {x2} {y2}"]
        if kind == "PLINE":
            return [f"PLINE {len(payload)}"] + [
                f"{x} {y}" for x, y in payload]
        if kind == "PLINE_MULTIPLE":
            out = [f"PLINE MULTIPLE {len(payload)}"]
            for sec in payload:
                out.append(str(len(sec)))
                out += [f"{x} {y}" for x, y in sec]
            return out
        out = [f"REGION {len(payload)}"]
        for ring in payload:
            out.append(str(len(ring)))
            out += [f"{x} {y}" for x, y in ring]
        return out

    @given(
        st.lists(st.tuples(feature, st.lists(styling, max_size=2)),
                 min_size=0, max_size=8)
    )
    @settings(max_examples=40, deadline=None)
    def check(features):
        lines = []
        expected = []
        for (kind, payload), styles in features:
            lines += render(kind, payload, styles)
            lines += styles  # styling clauses may follow any feature
            if kind == "NONE":
                expected.append(None)
            elif kind == "PLINE_MULTIPLE":
                expected.append([p for sec in payload for p in sec])
            elif kind == "REGION":
                expected.append(list(payload[0]))  # outer ring kept
            else:
                expected.append(list(payload))
        got = list(_parse_mif_geometries(lines, 0))
        assert got == expected

    check()


def test_dxf_grammar_property():
    """Hypothesis: random entity sequences (POINT / LINE / LWPOLYLINE
    open+closed / legacy POLYLINE / CIRCLE) rendered as group-code
    pairs parse back to exactly the modeled (type, layer, points)
    list, with unrelated group codes interleaved as noise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pg_datalake_spark.sources.geo_files import _parse_dxf_entities

    coord = st.integers(-(2**20), 2**20).map(lambda n: n / 64)
    layer = st.sampled_from(["0", "roads", "sites", "L-1"])
    ent = st.one_of(
        st.tuples(st.just("POINT"), layer, st.tuples(coord, coord)),
        st.tuples(st.just("LINE"), layer,
                  st.tuples(coord, coord, coord, coord)),
        st.tuples(st.just("LWPOLYLINE"), layer,
                  st.tuples(st.lists(st.tuples(coord, coord), min_size=2,
                                     max_size=5),
                            st.booleans())),
        st.tuples(st.just("POLYLINE"), layer,
                  st.lists(st.tuples(coord, coord), min_size=1,
                           max_size=4)),
        st.tuples(st.just("CIRCLE"), layer,
                  st.tuples(coord, coord,
                            st.integers(1, 2**10).map(lambda n: n / 64))),
    )

    def render(kind, lay, payload):
        pr = [(0, kind), (8, lay), (62, "7")]  # 62 = color, noise
        if kind == "POINT":
            x, y = payload
            pr += [(10, x), (20, y)]
        elif kind == "LINE":
            x1, y1, x2, y2 = payload
            pr += [(10, x1), (20, y1), (11, x2), (21, y2)]
        elif kind == "LWPOLYLINE":
            ps, closed = payload
            pr += [(90, len(ps)), (70, 1 if closed else 0)]
            for x, y in ps:
                pr += [(10, x), (20, y)]
        elif kind == "POLYLINE":
            pr += [(66, 1)]
            for x, y in payload:
                pr += [(0, "VERTEX"), (8, lay), (10, x), (20, y)]
            pr += [(0, "SEQEND")]
        else:
            cx, cy, r = payload
            pr += [(10, cx), (20, cy), (40, r)]
        return pr

    @given(st.lists(ent, min_size=0, max_size=6))
    @settings(max_examples=40, deadline=None)
    def check(entities):
        import math
        import tempfile

        pairs = [(0, "SECTION"), (2, "HEADER"), (0, "ENDSEC"),
                 (0, "SECTION"), (2, "ENTITIES")]
        expected = []
        for kind, lay, payload in entities:
            pairs += render(kind, lay, payload)
            if kind == "POINT":
                expected.append((kind, lay, [payload]))
            elif kind == "LINE":
                x1, y1, x2, y2 = payload
                expected.append((kind, lay, [(x1, y1), (x2, y2)]))
            elif kind == "LWPOLYLINE":
                ps, closed = payload
                expected.append(
                    (kind, lay, ps + ([ps[0]] if closed else [])))
            elif kind == "POLYLINE":
                expected.append((kind, lay, list(payload)))
            else:
                cx, cy, r = payload
                expected.append((kind, lay, [
                    (cx + r * math.cos(2 * math.pi * k / 16),
                     cy + r * math.sin(2 * math.pi * k / 16))
                    for k in range(16)
                ]))
        pairs += [(0, "ENDSEC"), (0, "EOF")]
        body = "\n".join(str(x) for pr in pairs for x in pr) + "\n"
        with tempfile.NamedTemporaryFile("w", suffix=".dxf",
                                         delete=False) as fh:
            fh.write(body)
            path = fh.name
        try:
            got = list(_parse_dxf_entities(path))
        finally:
            os.unlink(path)
        assert got == expected

    check()


def test_xodr_geometry_closed_form_property():
    """Hypothesis: for random <line>/<arc> plan-view primitives the
    sampled reference line obeys the closed forms — a line's endpoint
    is start + length*(cos hdg, sin hdg); every sampled arc point lies
    exactly on the circle of radius 1/|curvature| centered at
    start + (-sin hdg, cos hdg)/curvature, and the arc's total turn
    equals curvature*length."""
    import math
    import xml.etree.ElementTree as ET

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pg_datalake_spark.sources.geo_files import _xodr_geometry_points

    finite = st.integers(-(2**16), 2**16).map(lambda n: n / 32)
    hdg = st.integers(0, 6283).map(lambda n: n / 1000)
    length = st.integers(1, 2**12).map(lambda n: n / 16)
    curv = st.one_of(
        st.just(0.0),
        st.integers(-400, 400).filter(bool).map(lambda n: n / 4000),
    )

    @given(finite, finite, hdg, length, curv, st.booleans())
    @settings(max_examples=60, deadline=None)
    def check(x0, y0, h, ln, c, is_line):
        kind = "line" if is_line or c == 0.0 else "arc"
        g = ET.Element("geometry",
                       {"x": str(x0), "y": str(y0), "hdg": str(h),
                        "length": str(ln), "s": "0"})
        child = ET.SubElement(g, kind)
        if kind == "arc":
            child.set("curvature", str(c))
        pts = _xodr_geometry_points(g)
        assert pts[0] == (x0, y0)
        if kind == "line":
            ex, ey = x0 + ln * math.cos(h), y0 + ln * math.sin(h)
            assert pts == [(x0, y0), (ex, ey)]
            return
        cx = x0 - math.sin(h) / c
        cy = y0 + math.cos(h) / c
        r = abs(1.0 / c)
        for px, py in pts:
            assert math.hypot(px - cx, py - cy) == pytest.approx(r, rel=1e-9)
        # endpoint heading turn = curvature * length
        ex, ey = pts[-1]
        th_end = math.atan2(ey - cy, ex - cx)
        th_start = math.atan2(y0 - cy, x0 - cx)
        turn = (th_end - th_start)
        want = (c * ln) % (2 * math.pi)
        assert (turn % (2 * math.pi)) == pytest.approx(
            want, abs=1e-6
        ) or abs(want - turn % (2 * math.pi)) == pytest.approx(
            2 * math.pi, abs=1e-6
        )

    check()
