"""GeoJSON export (VectorFileIO.write role)."""

import json

from gaia_spark.functions.geoparse import geoparse
from gaia_spark.sources.geojson import (
    collect_feature_collection,
    points_to_geojson,
    rings_to_geojson,
    write_geojsonseq,
)
from gaia_spark.synth import synth_pages, synth_zones_pdf, zones_df


def test_point_features_roundtrip(spark, tmp_path):
    pts = geoparse(synth_pages(spark, 100, partitions=2))
    feats = points_to_geojson(pts, props=["url", "lang"])
    rows = feats.collect()
    assert rows
    f = json.loads(rows[0].feature)
    assert f["type"] == "Feature" and f["geometry"]["type"] == "Point"
    assert f["geometry"]["coordinates"][1] == rows[0].lat  # lon,lat order
    assert set(f["properties"]) == {"url", "lang"}
    out = str(tmp_path / "pts.geojsonl")
    write_geojsonseq(feats, out)
    lines = spark.read.text(out).count()
    assert lines == len(rows)


def test_polygon_feature_collection(spark):
    z = zones_df(spark, synth_zones_pdf(4))
    feats = rings_to_geojson(z, props=["zone_id", "name", "category"])
    fc = json.loads(collect_feature_collection(feats))
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 4
    poly = fc["features"][0]["geometry"]
    assert poly["type"] == "Polygon"
    ring = poly["coordinates"][0]
    assert ring[0] == ring[-1]  # closed
