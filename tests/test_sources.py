"""Source modules: PostGIS SQL generation (pure, offline-testable),
binary-file raster ingest, GeoJSON import roundtrip."""

import numpy as np
import pytest

from gaia_spark.sources.postgis import build_query, filter_sql, partition_predicates


# --- PostgisIO SQL generation (no database needed) ---------------------------

def test_filter_sql_ops():
    f = filter_sql(
        [
            ["pop", ">", 1000],
            ["name", "contains", "spring"],
            ["state", "in", ["NY", "CA"]],
            ["active", "=", True],
            ["note", "=", "it's"],
        ]
    )
    assert f == (
        '"pop" > 1000 AND "name" ILIKE \'%spring%\' AND "state" IN (\'NY\', \'CA\')'
        " AND \"active\" = TRUE AND \"note\" = 'it''s'"
    )


def test_build_query_prunes_and_pushes():
    q = build_query("cities", columns=["name", "pop"], filters=[["pop", ">=", 5]])
    assert q == 'SELECT "name", "pop" FROM "cities" WHERE "pop" >= 5'
    assert build_query("cities") == 'SELECT * FROM "cities"'


def test_bad_identifier_and_op_rejected():
    with pytest.raises(ValueError):
        build_query("cities; drop table x")
    with pytest.raises(ValueError):
        filter_sql([["a", "like", "x"]])


def test_partition_predicates():
    preds = partition_predicates("id", [0, 100, 200])
    assert preds == ['"id" >= 0 AND "id" < 100', '"id" >= 100 AND "id" < 200']


# --- binary-file raster ingest ------------------------------------------------

def test_raster_files_roundtrip(spark, tmp_path):
    """tiles → GRD1 files → binaryFile source + decode → identical tiles."""
    from gaia_spark.sources.raster_files import read_raster_files, write_raster_dir
    from gaia_spark.synth import synth_raster

    src = synth_raster(spark, zooms=(2,), bands=(0,))
    out = str(tmp_path / "tiles")
    n = write_raster_dir(src, out)
    assert n == 16  # 4x4 tiles at z2
    back = read_raster_files(spark, out)
    a = {(r.zoom, r.x, r.y, r.band): tuple(r.px[:8]) for r in src.collect()}
    b = {(r.zoom, r.x, r.y, r.band): tuple(r.px[:8]) for r in back.collect()}
    assert a == b


def test_raster_tiff_raises_decode_unavailable(spark, tmp_path):
    from gaia_spark.operators.multimodal import DecodeUnavailable
    from gaia_spark.sources.raster_files import decode_tile

    with pytest.raises(DecodeUnavailable):
        decode_tile(b"II*\x00" + b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_tile(b"XXXX" + b"\x00" * 64)


# --- GeoJSON import -------------------------------------------------------------

def test_geojson_roundtrip_points_and_rings(spark, tmp_path):
    import pyspark.sql.functions as F

    from gaia_spark.sources.geojson import (
        points_to_geojson,
        read_geojsonseq,
        rings_to_geojson,
        write_geojsonseq,
    )

    pts = spark.createDataFrame(
        [("a", 10.5, -20.25), ("b", -33.125, 150.75)], "url string, lat double, lon double"
    )
    p_path = str(tmp_path / "pts")
    write_geojsonseq(points_to_geojson(pts, ["url"]), p_path)
    got = read_geojsonseq(spark, p_path).collect()
    assert {(r.geom_kind, r.lat, r.lon, r.properties["url"]) for r in got} == {
        ("point", 10.5, -20.25, "a"),
        ("point", -33.125, 150.75, "b"),
    }

    ring = [{"lat": 0.0, "lon": 1.0}, {"lat": 0.0, "lon": 2.0},
            {"lat": 3.0, "lon": 2.0}, {"lat": 0.0, "lon": 1.0}]
    rings = spark.createDataFrame(
        [("z1", ring)], "name string, vertices array<struct<lat:double,lon:double>>"
    )
    r_path = str(tmp_path / "rings")
    write_geojsonseq(rings_to_geojson(rings, ["name"]), r_path)
    back = read_geojsonseq(spark, r_path).collect()
    assert len(back) == 1 and back[0].geom_kind == "polygon"
    assert [(v.lat, v.lon) for v in back[0].vertices] == [(0.0, 1.0), (0.0, 2.0), (3.0, 2.0), (0.0, 1.0)]
    assert back[0].properties["name"] == "z1"


def test_geojson_import_feeds_feature_join(spark, tmp_path):
    """Imported polygon features run straight through feature_spatial_join."""
    import pandas as pd
    import pyspark.sql.functions as F

    from gaia_spark.operators.feature_join import feature_spatial_join
    from gaia_spark.operators.spatial_join import ZoneIndex
    from gaia_spark.sources.geojson import read_geojsonseq, rings_to_geojson, write_geojsonseq

    def rect_ring(la0, lo0, la1, lo1):
        return [
            {"lat": la0, "lon": lo0}, {"lat": la0, "lon": lo1},
            {"lat": la1, "lon": lo1}, {"lat": la1, "lon": lo0},
            {"lat": la0, "lon": lo0},
        ]

    feats = spark.createDataFrame(
        [("in", rect_ring(1.0, 1.0, 5.0, 5.0)), ("out", rect_ring(50.0, 50.0, 55.0, 55.0))],
        "name string, vertices array<struct<lat:double,lon:double>>",
    )
    path = str(tmp_path / "f")
    write_geojsonseq(rings_to_geojson(feats, ["name"]), path)
    imported = read_geojsonseq(spark, path).select(
        F.col("properties.name").alias("name"), "vertices"
    )
    idx = ZoneIndex.build(pd.DataFrame([{
        "zone_id": 0, "name": "z", "kind": "rect", "category": "c",
        "min_lat": 0.0, "min_lon": 0.0, "max_lat": 10.0, "max_lon": 10.0,
        "vertices": rect_ring(0.0, 0.0, 10.0, 10.0),
    }]))
    got = {r.name for r in feature_spatial_join(imported, idx, "within", feature_key="name").collect()}
    assert got == {"in"}


def test_shapefile_roundtrip_points_and_polys(spark, tmp_path):
    """Spec-conformant .shp/.dbf writer → distributed binaryFile reader:
    points keep exact doubles + attributes; multi-part polygons come back
    as rings (outer + hole) with vertices flattened."""
    from gaia_spark.sources.shapefile import (
        read_shapefile, write_dbf, write_poly_shp, write_point_shp)

    d = tmp_path / "layers"
    d.mkdir()
    (d / "pts.shp").write_bytes(write_point_shp([10.5, -120.25], [45.0, -33.5]))
    (d / "pts.dbf").write_bytes(write_dbf([{"nm": "a"}, {"nm": "b"}]))
    outer = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
    hole = [(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0)]
    (d / "zones.shp").write_bytes(write_poly_shp([[outer, hole]]))

    rows = read_shapefile(spark, str(d)).collect()
    pts = sorted(
        [r for r in rows if r.geom_kind == "point"], key=lambda r: r.rec
    )
    assert [(r.lon, r.lat, r.properties["nm"]) for r in pts] == [
        (10.5, 45.0, "a"), (-120.25, -33.5, "b")
    ]
    poly = [r for r in rows if r.geom_kind == "poly"][0]
    assert len(poly.rings) == 2 and len(poly.vertices) == 10
    assert poly.rings[1][0].lat == 2.0 and poly.properties == {}


def test_shapefile_features_feed_spatial_join(spark, tmp_path):
    """.shp polygons drive the generic feature join end to end (the real
    gaia user path: read .shp, intersect with zones)."""
    import pandas as pd

    from gaia_spark.operators.feature_join import feature_spatial_join
    from gaia_spark.operators.spatial_join import ZoneIndex
    from gaia_spark.sources.shapefile import read_shapefile, write_poly_shp

    d = tmp_path / "parcels"
    d.mkdir()
    sq = lambda x, y: [(x, y), (x + 4.0, y), (x + 4.0, y + 4.0), (x, y + 4.0), (x, y)]  # noqa: E731
    (d / "p.shp").write_bytes(write_poly_shp([[sq(1.0, 1.0)], [sq(50.0, 50.0)]]))
    feats = read_shapefile(spark, str(d)).withColumnRenamed("rec", "fid")

    ring = [
        {"lat": 0.0, "lon": 0.0}, {"lat": 0.0, "lon": 10.0},
        {"lat": 10.0, "lon": 10.0}, {"lat": 10.0, "lon": 0.0},
        {"lat": 0.0, "lon": 0.0},
    ]
    idx = ZoneIndex.build(pd.DataFrame([{
        "zone_id": 7, "name": "z", "kind": "rect", "category": "c",
        "min_lat": 0.0, "min_lon": 0.0, "max_lat": 10.0, "max_lon": 10.0,
        "vertices": ring,
    }]))
    out = feature_spatial_join(feats, idx, "intersects", feature_key="fid")
    assert {(r.fid, r.zone_id) for r in out.collect()} == {(1, 7)}
