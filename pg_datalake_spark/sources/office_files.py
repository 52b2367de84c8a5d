"""Minimal XLSX (SpreadsheetML) reader/writer, pure stdlib.

The reference imports XLSX through GDAL's XLSX driver
(docs/file-formats-reference.md:96-138). Offline, the format is just
a zip of XML parts (ECMA-376 / ISO 29500 SpreadsheetML), so the
subset a data engine needs — one worksheet of typed cells, shared
strings, a header row — parses with ``zipfile`` + ``xml.etree``:

- ``xl/worksheets/sheet1.xml``: ``<row><c r="A1" t="s|b|str|
  inlineStr"><v>…</v></c></row>`` cells; numeric cells carry no
  ``t``; ``t="s"`` indexes ``xl/sharedStrings.xml``.
- Column typing: a column whose every non-null data cell is numeric
  becomes ``double``; booleans become ``boolean``; anything else is
  ``string``. The first row supplies column names.

Scale shape matches the other codecs: the driver parses ONE file for
the schema; record parsing runs executor-side via ``mapInPandas``,
one file per task. The writer is fixture-grade (enough spec
conformance that Excel/GDAL open the files).
"""

from __future__ import annotations

import glob as _glob
import re
import xml.etree.ElementTree as ET
import zipfile

from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(ref: str) -> int:
    """'A1' → 0, 'AB7' → 27."""
    idx = 0
    for ch in ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def write_xlsx(path: str, header: list[str], rows: list[tuple]) -> None:
    """Write a one-sheet .xlsx: strings go to sharedStrings, numbers
    inline, booleans as t=\"b\". Fixture-grade writer."""
    strings: list[str] = []
    sindex: dict[str, int] = {}

    def s_id(v: str) -> int:
        if v not in sindex:
            sindex[v] = len(strings)
            strings.append(v)
        return sindex[v]

    def cell(ci: int, ri: int, v) -> str:
        ref = f"{_col_letter(ci)}{ri}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return f'<c r="{ref}" t="s"><v>{s_id(str(v))}</v></c>'

    body = []
    for ri, row in enumerate([tuple(header)] + [tuple(r) for r in rows], start=1):
        cells = "".join(cell(ci, ri, v) for ci, v in enumerate(row))
        body.append(f'<row r="{ri}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
        f' count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{_xml_escape(s)}</t></si>" for s in strings)
        + "</sst>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
        ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    ctypes = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
        'package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ctypes)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _parse_xlsx(path: str) -> tuple[list[str], list[list]]:
    """→ (header, rows of python values: float | bool | str | None)."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    grid: list[list] = []
    for row in sheet.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row.iter(f"{_NS}c"):
            ci = _col_index(c.attrib.get("r", "A"))
            t = c.attrib.get("t", "n")
            if t == "inlineStr":
                cells[ci] = "".join(
                    x.text or "" for x in c.iter(f"{_NS}t")
                )
                continue
            v = c.find(f"{_NS}v")
            if v is None or v.text is None:
                continue
            if t == "s":
                cells[ci] = shared[int(v.text)]
            elif t == "b":
                cells[ci] = v.text == "1"
            elif t == "str":
                cells[ci] = v.text
            else:
                cells[ci] = float(v.text)
        width = max(cells, default=-1) + 1
        grid.append([cells.get(i) for i in range(width)])
    if not grid:
        return [], []
    header = [str(h) for h in grid[0]]
    width = len(header)
    rows = [r[:width] + [None] * (width - len(r)) for r in grid[1:]]
    return header, rows


_IDENT = re.compile(r"[^A-Za-z0-9_]")


def read_xlsx(spark: SparkSession, path_or_glob: str) -> DataFrame:
    """Read one or many single-sheet .xlsx files (first row = header).
    Column types are inferred from the FIRST file (numeric → double,
    boolean → boolean, else string); parsing runs executor-side, one
    file per task."""
    paths = sorted(_glob.glob(path_or_glob)) or [path_or_glob]
    header, sample = _parse_xlsx(paths[0])
    if not header:
        raise ValueError(f"no header row in {paths[0]}")

    def col_type(i: int) -> str:
        vals = [r[i] for r in sample if r[i] is not None]
        if vals and all(isinstance(v, float) for v in vals):
            return "double"
        if vals and all(isinstance(v, bool) for v in vals):
            return "boolean"
        return "string"

    names = [_IDENT.sub("_", h) for h in header]
    types = [col_type(i) for i in range(len(header))]
    schema = ", ".join(f"{n} {t}" for n, t in zip(names, types))

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for p in pdf["path"]:
                _h, rows = _parse_xlsx(p)
                out = {}
                for i, (n, t) in enumerate(zip(names, types)):
                    col = [r[i] if i < len(r) else None for r in rows]
                    if t == "string":
                        col = [None if v is None else str(v) for v in col]
                    out[n] = col
                yield pd.DataFrame(out)

    files = spark.createDataFrame([(p,) for p in paths], "path string")
    return files.repartition(len(paths)).mapInPandas(parse, schema)
