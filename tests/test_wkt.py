"""WKT writers/parser — closed forms, negative coordinates, round trips."""

import pyspark.sql.functions as F

from gaia_spark.functions import portable as P
from gaia_spark.functions import wkt as WK


def test_wkt_point_and_linestring_closed_form(spark):
    df = spark.createDataFrame([(10.5, -20.25)], "lat double, lon double")
    row = df.select(
        F.expr(WK.wkt_point_sql("lat", "lon", P.SPARK)).alias("pt"),
    ).collect()[0]
    assert row.pt == "POINT (-20.250000 10.500000)"


def test_wkt_polygon_write_parse_roundtrip(spark):
    """write → parse recovers every vertex to 1e-6 (negative lats/lons
    included), and the parsed structs carry (lat, lon) field order."""
    verts = [(-1.5, 2.25), (-1.5, 3.0), (0.75, 3.0), (-1.5, 2.25)]
    df = spark.createDataFrame(
        [(verts,)], "vertices array<struct<lat:double,lon:double>>"
    )
    w = df.select(F.expr(WK.wkt_polygon_sql("vertices", P.SPARK)).alias("wkt"))
    row = w.select(
        "wkt",
        F.expr(WK.wkt_type_sql("wkt")).alias("t"),
        F.expr(WK.parse_wkt_vertices_sql("wkt", P.SPARK)).alias("pv"),
    ).collect()[0]
    assert row.t == "POLYGON"
    assert row.wkt.startswith("POLYGON ((2.250000 -1.500000, ")
    got = [(v.lat, v.lon) for v in row.pv]
    assert len(got) == len(verts)
    for (la, lo), (gla, glo) in zip(verts, got):
        assert abs(la - gla) < 1e-6 and abs(lo - glo) < 1e-6


def test_wkt_parse_matches_duckdb(spark):
    """Both dialects parse the same text to the same vertices."""
    import duckdb

    wkt = "LINESTRING (1.000000 2.000000, -3.500000 4.250000)"
    srow = (
        spark.createDataFrame([(wkt,)], "wkt string")
        .select(F.expr(WK.parse_wkt_vertices_sql("wkt", P.SPARK)).alias("pv"))
        .collect()[0]
    )
    lit = "'" + wkt + "'"
    drow = duckdb.sql(
        f"SELECT {WK.parse_wkt_vertices_sql(lit, P.DUCK)} AS pv"
    ).fetchone()[0]
    assert [(v.lat, v.lon) for v in srow.pv] == [
        (d["lat"], d["lon"]) for d in drow
    ]


def test_wkt_parse_ignores_tag_and_nesting(spark):
    """Parser reads number pairs only: POINT and nested POLYGON text both
    yield their pairs; a no-coordinate string yields an empty array."""
    df = spark.createDataFrame(
        [("POINT (5.000000 6.000000)",), ("GARBAGE",)], "wkt string"
    )
    rows = df.select(
        F.size(F.expr(WK.parse_wkt_vertices_sql("wkt", P.SPARK))).alias("n")
    ).collect()
    assert [r.n for r in rows] == [1, 0]
