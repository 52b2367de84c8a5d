"""``format 'gdal'`` dispatcher: extension-inferred format plus the
reference's three GDAL options — ``compression`` ('gzip' / 'zip' /
'none', inferred from the extension otherwise), ``layer`` (a named
layer within the file) and ``zip_path`` (relative path inside a .zip).
Reference surface: docs/file-formats-reference.md:96-138 and
pg_lake_engine/src/pgduck/gdal.c (format inference table).

Staging model: decompression / zip extraction happens IMMEDIATELY into
a local temp dir — the same model as the reference, whose GDAL tables
download files eagerly at CREATE TABLE time ("files are downloaded
immediately when creating a table"). The staged bytes are O(one
archive); the dispatched READ itself stays executor-parallel (every
underlying reader parses records executor-side). At cluster scale the
archive formats themselves are the bottleneck — a .zip/.gz member is
not splittable — so the scale path is the un-archived formats
(GeoJSONSeq, parquet exports); the dispatcher exists for import parity,
not as a 100 TB hot path.
"""

from __future__ import annotations

import glob as _glob
import gzip as _gzip
import os
import shutil
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_gdal", "infer_gdal_compression"]

# Extensions the dispatcher recognizes (the reference's inference
# table, minus the scoped-out CAD/Geodatabase/WAsP/OpenDRIVE long
# tail — those raise with the format named). MapInfo's TEXT half
# (.mif/.mid) reads since r12; the binary .tab stays scoped out.
_READABLE = {
    ".shp", ".gpkg", ".kml", ".kmz", ".geojson", ".geojsonl",
    ".geojsons", ".gml", ".xlsx", ".xls", ".fgb", ".tif", ".tiff",
    ".mif", ".dxf", ".xodr",
}
_SCOPED_OUT = {
    ".dwg", ".gdb", ".map", ".mit", ".tab",
}
# Sidecar extensions staged alongside a .shp member.
_SHP_SIDECARS = (".dbf", ".shx", ".prj", ".cpg")


def infer_gdal_compression(path: str) -> str:
    """The reference's compression inference: .gz → gzip, .zip → zip
    (a .kmz IS a zip by definition), else none."""
    if path.endswith(".gz"):
        return "gzip"
    if path.endswith(".zip") or path.endswith(".kmz"):
        return "zip"
    return "none"


def _ext(path: str) -> str:
    return os.path.splitext(path)[1].lower()


def _stage_gzip(path: str, stage: str) -> str:
    inner = os.path.join(stage, os.path.basename(path)[: -len(".gz")])
    with _gzip.open(path, "rb") as src, open(inner, "wb") as dst:
        shutil.copyfileobj(src, dst)
    return inner


def _stage_zip(path: str, stage: str, zip_path: str | None) -> str:
    """Extract the target member (and shapefile sidecars) from a .zip /
    .kmz archive; return the staged primary file. Member paths are
    flattened into the stage dir (zip-slip-safe: only basenames are
    used for output names)."""
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        if zip_path is not None:
            if zip_path not in names:
                raise FileNotFoundError(
                    f"zip_path {zip_path!r} not in {path} (members: {names[:20]})"
                )
            primaries = [zip_path]
        else:
            # Auto-detect: prefer .kml inside a .kmz, else the unique
            # readable extension present.
            kmls = [n for n in names if _ext(n) == ".kml"]
            if path.endswith(".kmz") and kmls:
                primaries = kmls
            else:
                cands = [n for n in names if _ext(n) in _READABLE]
                exts = {_ext(n) for n in cands}
                if len(exts) != 1:
                    raise ValueError(
                        f"cannot infer the format inside {path} "
                        f"(candidate extensions {sorted(exts)}); pass "
                        "zip_path='<member>' to pick one"
                    )
                primaries = cands
        wanted = set(primaries)
        if any(_ext(p) == ".shp" for p in primaries):
            stems = {os.path.splitext(p)[0] for p in primaries}
            wanted |= {
                n for n in names
                if os.path.splitext(n)[0] in stems and _ext(n) in _SHP_SIDECARS
            }
        if any(_ext(p) == ".mif" for p in primaries):
            stems = {os.path.splitext(p)[0] for p in primaries}
            wanted |= {
                n for n in names
                if os.path.splitext(n)[0] in stems and _ext(n) == ".mid"
            }
        by_base: dict[str, list[str]] = {}
        for m in wanted:
            by_base.setdefault(os.path.basename(m), []).append(m)
        clashes = {b: sorted(ms) for b, ms in by_base.items() if len(ms) > 1}
        if clashes:
            raise ValueError(
                f"members of {path} collide on basename when staged "
                f"(flattened extraction): {clashes}; pass "
                "zip_path='<member>' to pick one"
            )
        staged_primary = None
        for member in sorted(wanted):
            out = os.path.join(stage, os.path.basename(member))
            with z.open(member) as src, open(out, "wb") as dst:
                shutil.copyfileobj(src, dst)
            if member in primaries and staged_primary is None:
                staged_primary = out
    assert staged_primary is not None
    if len(primaries) > 1:
        # Multiple same-extension members (e.g. several .kml docs):
        # hand the glob to the multi-file reader.
        return os.path.join(stage, "*" + _ext(staged_primary))
    return staged_primary


def read_gdal(
    spark: SparkSession,
    path: str,
    *,
    compression: str | None = None,
    layer: str | None = None,
    zip_path: str | None = None,
) -> DataFrame:
    """Read a file as the reference's ``format 'gdal'`` would: infer
    the format from the (post-decompression) extension and dispatch to
    the matching pure-Python/Spark-native reader. Options mirror the
    reference table exactly: ``compression`` (inferred when omitted),
    ``layer`` (GeoPackage feature table name; other formats are
    single-layer here), ``zip_path`` (member inside a .zip)."""
    comp = compression or infer_gdal_compression(path)
    if comp not in ("gzip", "zip", "none"):
        raise ValueError(f"compression must be gzip/zip/none, got {comp!r}")
    target = path
    if comp != "none":
        matches = sorted(_glob.glob(path)) or [path]
        if len(matches) != 1:
            raise ValueError(
                f"compressed GDAL reads take a single archive, got {matches}"
            )
        stage = tempfile.mkdtemp(prefix="gdal_stage_")
        target = (
            _stage_gzip(matches[0], stage)
            if comp == "gzip"
            else _stage_zip(matches[0], stage, zip_path)
        )
    ext = _ext(target.replace("*", "x"))  # glob-safe extension probe
    if ext in _SCOPED_OUT:
        raise NotImplementedError(
            f"GDAL format {ext} is scoped out (reference long tail: "
            "DWG/FileGDB/MapInfo-.tab/WAsP); on a cluster use "
            "GDAL-backed Sedona readers"
        )
    from pg_datalake_spark.sources import geo_files, office_files

    if ext == ".shp":
        return geo_files.read_shapefile(spark, target)
    if ext == ".gpkg":
        return geo_files.read_gpkg(spark, target, table=layer)
    if ext == ".kml":
        return geo_files.read_kml(spark, target)
    if ext == ".geojson":
        return geo_files.read_geojson(spark, target)
    if ext in (".geojsonl", ".geojsons"):
        return geo_files.read_geojson_seq(spark, target)
    if ext == ".gml":
        return geo_files.read_gml(spark, target)
    if ext == ".mif":
        return geo_files.read_mapinfo(spark, target)
    if ext == ".dxf":
        return geo_files.read_dxf(spark, target)
    if ext == ".xodr":
        return geo_files.read_xodr(spark, target)
    if ext == ".fgb":
        from pg_datalake_spark.sources import fgb

        return fgb.read_fgb(spark, target)
    if ext in (".tif", ".tiff"):
        # raster GeoTIFF/COG (r11): long-form (x, y, band, value,
        # geo_x, geo_y) rows; layer = overview level ("0", "1", ...)
        from pg_datalake_spark.sources import geotiff

        return geotiff.read_geotiff(spark, target, level=int(layer or 0))
    if ext in (".xlsx", ".xls"):
        if ext == ".xls":
            raise NotImplementedError(
                "legacy BIFF .xls is not implemented; save as .xlsx"
            )
        # layer = worksheet name, e.g. 'Sheet 1' (the reference's example)
        return office_files.read_xlsx(spark, target, sheet=layer)
    raise ValueError(
        f"cannot infer a GDAL format from {path!r} (resolved {ext!r}); "
        f"readable: {sorted(_READABLE)}"
    )
