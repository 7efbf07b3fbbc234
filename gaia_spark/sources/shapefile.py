"""ESRI Shapefile read/write — VectorFileIO role for ``.shp``
(``[R] gaia/geo/geo_inputs.py :: VectorFileIO`` reads .shp via fiona; no
GDAL offline, so the container format is parsed directly from the public
spec: ESRI Shapefile Technical Description, July 1998).

Supported shapes: Null (0), Point (1), PolyLine (3), Polygon (5) — the
shapes the engine's feature model covers. Attributes come from the ``.dbf``
sidecar (dBase III layout).

Scale model: a shapefile is NOT splittable (record boundaries live in the
.shx sidecar / sequential scan), so the unit of parallelism is the FILE —
``read_shapefile`` scans a directory of shapefiles with ``binaryFile`` and
parses each .shp/.dbf pair inside one Arrow task. A thousand county
shapefiles parse on a thousand cores; one giant .shp should be converted
to parquet once (write path below) and never re-read.
"""

from __future__ import annotations

import struct

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SHAPE_NULL, SHAPE_POINT, SHAPE_POLYLINE, SHAPE_POLYGON = 0, 1, 3, 5
_KIND = {SHAPE_POINT: "point", SHAPE_POLYLINE: "line", SHAPE_POLYGON: "poly"}

FEATURE_SCHEMA = (
    "src string, rec int, geom_kind string, lat double, lon double, "
    "vertices array<struct<lat:double,lon:double>>, "
    "rings array<array<struct<lat:double,lon:double>>>, "
    "properties map<string,string>"
)


# ---------------------------------------------------------------------------
# binary parsers (pure functions of bytes — unit-testable without Spark)
# ---------------------------------------------------------------------------

def parse_shp(data: bytes) -> list[dict]:
    """Parse .shp bytes → one dict per record:
    {rec, geom_kind, lat, lon, vertices, rings}."""
    if len(data) < 100 or struct.unpack(">i", data[0:4])[0] != 9994:
        raise ValueError("not a shapefile: bad file code")
    file_len = struct.unpack(">i", data[24:28])[0] * 2  # 16-bit words → bytes
    out: list[dict] = []
    pos = 100
    while pos + 8 <= min(file_len, len(data)):
        rec_no, content_len = struct.unpack(">ii", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + content_len * 2]
        pos += 8 + content_len * 2
        if len(body) < 4:
            break
        (stype,) = struct.unpack("<i", body[0:4])
        rec = {
            "rec": rec_no, "geom_kind": _KIND.get(stype, "null"),
            "lat": None, "lon": None, "vertices": None, "rings": None,
        }
        if stype == SHAPE_POINT:
            x, y = struct.unpack("<dd", body[4:20])
            rec["lon"], rec["lat"] = x, y
        elif stype in (SHAPE_POLYLINE, SHAPE_POLYGON):
            n_parts, n_points = struct.unpack("<ii", body[36:44])
            parts = struct.unpack(f"<{n_parts}i", body[44 : 44 + 4 * n_parts])
            pts_off = 44 + 4 * n_parts
            xy = struct.unpack(f"<{2 * n_points}d", body[pts_off : pts_off + 16 * n_points])
            bounds = list(parts) + [n_points]
            rings = [
                [
                    {"lat": xy[2 * i + 1], "lon": xy[2 * i]}
                    for i in range(bounds[p], bounds[p + 1])
                ]
                for p in range(n_parts)
            ]
            rec["rings"] = rings
            rec["vertices"] = [v for ring in rings for v in ring]
        out.append(rec)
    return out


def parse_dbf(data: bytes) -> list[dict]:
    """Parse .dbf (dBase III) bytes → one {field: str} dict per record.
    All values surface as trimmed strings (the engine casts as needed)."""
    if len(data) < 32:
        return []
    n_rec, hdr_size, rec_size = struct.unpack("<iHH", data[4:12])
    fields: list[tuple[str, int]] = []
    pos = 32
    while pos < hdr_size - 1 and data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\x00")[0].decode("ascii", "replace")
        length = data[pos + 16]
        fields.append((name, length))
        pos += 32
    out = []
    base = hdr_size
    for r in range(n_rec):
        rec = data[base + r * rec_size : base + (r + 1) * rec_size]
        if len(rec) < rec_size or rec[0:1] == b"*":  # deleted row
            continue
        row, off = {}, 1
        for name, length in fields:
            row[name] = rec[off : off + length].decode("ascii", "replace").strip()
            off += length
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# writers (point layers + generic ring layers) — also the test fixture path
# ---------------------------------------------------------------------------

def _shp_header(file_len_bytes: int, stype: int, bbox: tuple[float, float, float, float]) -> bytes:
    h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", file_len_bytes // 2)
    h += struct.pack("<ii", 1000, stype)
    h += struct.pack("<dddd", bbox[0], bbox[1], bbox[2], bbox[3])  # xmin ymin xmax ymax
    h += struct.pack("<dddd", 0.0, 0.0, 0.0, 0.0)  # z/m ranges
    return h


def write_point_shp(lons: list[float], lats: list[float]) -> bytes:
    recs = b""
    for i, (x, y) in enumerate(zip(lons, lats), start=1):
        content = struct.pack("<idd", SHAPE_POINT, x, y)
        recs += struct.pack(">ii", i, len(content) // 2) + content
    bbox = (min(lons), min(lats), max(lons), max(lats)) if lons else (0, 0, 0, 0)
    return _shp_header(100 + len(recs), SHAPE_POINT, bbox) + recs


def write_poly_shp(rings_per_feature: list[list[list[tuple[float, float]]]]) -> bytes:
    """rings_per_feature[i] = list of rings, ring = [(lon, lat), ...]."""
    recs = b""
    gx: list[float] = []
    gy: list[float] = []
    for i, rings in enumerate(rings_per_feature, start=1):
        pts = [p for ring in rings for p in ring]
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        gx += xs
        gy += ys
        parts, off = [], 0
        for ring in rings:
            parts.append(off)
            off += len(ring)
        content = struct.pack("<i", SHAPE_POLYGON)
        content += struct.pack("<dddd", min(xs), min(ys), max(xs), max(ys))
        content += struct.pack("<ii", len(rings), len(pts))
        content += struct.pack(f"<{len(parts)}i", *parts)
        for x, y in pts:
            content += struct.pack("<dd", x, y)
        recs += struct.pack(">ii", i, len(content) // 2) + content
    bbox = (min(gx), min(gy), max(gx), max(gy)) if gx else (0, 0, 0, 0)
    return _shp_header(100 + len(recs), SHAPE_POLYGON, bbox) + recs


def write_dbf(rows: list[dict], field_len: int = 32) -> bytes:
    """Minimal dBase III writer: every field type C (string), fixed width."""
    names = list(rows[0].keys()) if rows else ["id"]
    rec_size = 1 + field_len * len(names)
    hdr_size = 32 + 32 * len(names) + 1
    h = struct.pack("<BBBBiHH", 0x03, 95, 7, 26, len(rows), hdr_size, rec_size)
    h += b"\x00" * 20
    for n in names:
        fd = n.encode("ascii")[:11].ljust(11, b"\x00") + b"C" + b"\x00" * 4
        fd += bytes([field_len]) + b"\x00" * 15
        h += fd
    h += b"\x0d"
    body = b""
    for row in rows:
        body += b" "
        for n in names:
            body += str(row[n]).encode("ascii", "replace")[:field_len].ljust(field_len, b" ")
    return h + body + b"\x1a"


# ---------------------------------------------------------------------------
# Spark reader: directory of .shp/.dbf pairs → feature DataFrame
# ---------------------------------------------------------------------------

def read_shapefile(spark: SparkSession, path: str) -> DataFrame:
    """VectorFileIO.read for shapefiles: ``path`` is a file or directory;
    every ``*.shp`` (+ optional same-stem ``*.dbf``) parses in ONE task via
    mapInPandas over a binaryFile scan — file-level parallelism, no driver
    IO. Output: FEATURE_SCHEMA rows (points → lat/lon; polygons/lines →
    vertices + rings; .dbf attributes as a string map joined by record
    order)."""
    import pandas as pd

    shp = spark.read.format("binaryFile").option("pathGlobFilter", "*.shp").load(path)
    dbf = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.dbf").load(path)
        .select(
            F.regexp_replace("path", r"\.dbf$", "").alias("_stem"),
            F.col("content").alias("_dbf"),
        )
    )
    both = shp.select(
        F.col("path").alias("src"),
        F.regexp_replace("path", r"\.shp$", "").alias("_stem"),
        F.col("content").alias("_shp"),
    ).join(dbf, "_stem", "left")

    def parse(batches):
        for b in batches:
            rows = []
            # positional access: itertuples mangles _-prefixed column names
            for src, shp_bytes, dbf_bytes in zip(b["src"], b["_shp"], b["_dbf"]):
                geoms = parse_shp(bytes(shp_bytes))
                props = parse_dbf(bytes(dbf_bytes)) if dbf_bytes is not None else []
                for g in geoms:
                    p = props[g["rec"] - 1] if g["rec"] - 1 < len(props) else {}
                    rows.append(
                        {
                            "src": src, "rec": g["rec"],
                            "geom_kind": g["geom_kind"],
                            "lat": g["lat"], "lon": g["lon"],
                            "vertices": g["vertices"], "rings": g["rings"],
                            "properties": p,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return both.mapInPandas(parse, FEATURE_SCHEMA)


def write_shapefile_points(df: DataFrame, path_stem: str, props: list[str]) -> None:
    """VectorFileIO.write for a POINT layer: collect (export-sized layers
    only, like the GeoJSON FeatureCollection writer) and emit .shp + .dbf."""
    rows = df.select("lat", "lon", *props).collect()
    with open(path_stem + ".shp", "wb") as f:
        f.write(write_point_shp([r.lon for r in rows], [r.lat for r in rows]))
    with open(path_stem + ".dbf", "wb") as f:
        f.write(write_dbf([{p: getattr(r, p) for p in props} for r in rows]))
