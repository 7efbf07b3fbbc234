"""WKT (Well-Known Text) geometry read/write.

The reference engine exchanges geometry as WKT/WKB through its GeoDataFrame
layer (`[R] SURVEY.md §1` data model: shapely geometries serialize as WKT);
this module is the PySpark-native equivalent over the repo's
``array<struct<lat,lon>>`` vertex representation — POINT / LINESTRING /
POLYGON writers and a coordinate parser, all pure SQL-string builders
(JVM regexp + format_string on the Spark side, the printf/regexp mirror on
DuckDB) so WKT IO is oracle-checkable byte for byte.

Numeric contract: writers emit %.6f (the geoparse precedent — Java
format_string and C printf agree on the rendered digits for these values);
parsing casts the 6-decimal strings back to double, identical in both
engines, so a write→parse round trip is lossless at e6 quantization.
Axis order is OGC WKT (x=lon first).
"""

from __future__ import annotations

from gaia_spark.functions import portable as P

# one coordinate pair "x y" — backslash-free, RE2-safe, shared verbatim
_COORD_RE = "(-?[0-9]+[.][0-9]+) (-?[0-9]+[.][0-9]+)"


def _fmt(dialect: str) -> str:
    return "format_string" if dialect == P.SPARK else "printf"


def wkt_point_sql(lat: str, lon: str, dialect: str) -> str:
    return f"{_fmt(dialect)}('POINT (%.6f %.6f)', {lon}, {lat})"


def _coords_body_sql(vertices: str, dialect: str) -> str:
    """'x y, x y, ...' over a vertex struct array."""
    if dialect == P.SPARK:
        return (
            f"array_join(transform({vertices}, "
            f"v -> format_string('%.6f %.6f', v.lon, v.lat)), ', ')"
        )
    return (
        f"array_to_string(list_transform({vertices}, "
        f"v -> printf('%.6f %.6f', v.lon, v.lat)), ', ')"
    )


def wkt_linestring_sql(vertices: str, dialect: str) -> str:
    return f"concat('LINESTRING (', {_coords_body_sql(vertices, dialect)}, ')')"


def wkt_polygon_sql(vertices: str, dialect: str) -> str:
    """Single-ring polygon (the repo's feature layers carry one closed
    ring per row; multi-ring features write one WKT per ring)."""
    return f"concat('POLYGON ((', {_coords_body_sql(vertices, dialect)}, '))')"


def wkt_type_sql(wkt: str) -> str:
    """Leading geometry tag (POINT/LINESTRING/POLYGON/...), '' → NULL.
    Shared verbatim in both dialects."""
    return f"nullif(regexp_extract({wkt}, '^([A-Z]+)', 1), '')"


def parse_wkt_vertices_sql(wkt: str, dialect: str) -> str:
    """Coordinate list of ANY single-ring WKT back as the engine's
    array<struct<lat,lon>> — two regexp_extract_all passes (group 1 = x,
    group 2 = y) zipped positionally; tolerant of the type tag and
    paren nesting by construction (it only reads number pairs)."""
    xs = f"regexp_extract_all({wkt}, '{_COORD_RE}', 1)"
    ys = f"regexp_extract_all({wkt}, '{_COORD_RE}', 2)"
    if dialect == P.SPARK:
        # sequence(1, 0) DESCENDS in Spark ([1, 0]); the no-coordinate case
        # needs an explicit typed empty array
        body = (
            f"transform(sequence(1, size({xs})), i -> "
            f"struct(cast(element_at({ys}, i) as double) AS lat, "
            f"cast(element_at({xs}, i) as double) AS lon))"
        )
        empty = "cast(array() as array<struct<lat:double,lon:double>>)"
        return f"CASE WHEN size({xs}) = 0 THEN {empty} ELSE {body} END"
    return (
        f"list_transform(generate_series(1, len({xs})), i -> "
        f"struct_pack(lat := cast({ys}[i] as double), "
        f"lon := cast({xs}[i] as double)))"
    )
