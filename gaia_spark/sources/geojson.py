"""GeoJSON export — VectorFileIO.write role
(``[R] gaia/geo/geo_inputs.py :: VectorFileIO.write`` / ``to_file``).

Features are serialized JVM-side with to_json; point layers become Point
features, ring layers Polygon features. Output is newline-delimited
features (one per row) — the distributed-friendly GeoJSONSeq flavor — or a
single FeatureCollection when collected driver-side.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def points_to_geojson(df: DataFrame, props: list[str], lat: str = "lat", lon: str = "lon") -> DataFrame:
    """One GeoJSON Feature string per row (column ``feature``)."""
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("Point").alias("type"),
                F.array(F.col(lon), F.col(lat)).alias("coordinates"),
            ).alias("geometry"),
            F.struct(*[F.col(p).alias(p) for p in props]).alias("properties"),
        )
    )
    return df.where(F.col(lat).isNotNull()).withColumn("feature", feature)


def rings_to_geojson(df: DataFrame, props: list[str], vertices: str = "vertices") -> DataFrame:
    """Polygon features from ring arrays (lon,lat coordinate order)."""
    coords = F.expr(f"array(transform({vertices}, v -> array(v.lon, v.lat)))")
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(F.lit("Polygon").alias("type"), coords.alias("coordinates")).alias("geometry"),
            F.struct(*[F.col(p).alias(p) for p in props]).alias("properties"),
        )
    )
    return df.withColumn("feature", feature)


def write_geojsonseq(df_with_feature: DataFrame, path: str) -> None:
    """Newline-delimited GeoJSON (RFC 8142-ish), distributed write."""
    df_with_feature.select("feature").write.mode("overwrite").text(path)


def collect_feature_collection(df_with_feature: DataFrame) -> str:
    feats = [json.loads(r.feature) for r in df_with_feature.select("feature").collect()]
    return json.dumps({"type": "FeatureCollection", "features": feats})


def read_geojsonseq(spark, path: str) -> DataFrame:
    """VectorFileIO.READ role: newline-delimited GeoJSON → feature DataFrame
    (geom_kind, lat, lon, vertices, properties map). Distributed text scan +
    JVM json functions — geometry type decides which columns are populated
    (Point → lat/lon; Polygon/LineString → vertices ring array)."""
    raw = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    gtype = F.get_json_object("value", "$.geometry.type")
    # Point: coordinates = [lon, lat]
    p_lon = F.get_json_object("value", "$.geometry.coordinates[0]").cast("double")
    p_lat = F.get_json_object("value", "$.geometry.coordinates[1]").cast("double")
    # Polygon: [[[lon,lat],...]] (outer ring); LineString: [[lon,lat],...]
    poly_coords = F.from_json(
        F.get_json_object("value", "$.geometry.coordinates"),
        "array<array<array<double>>>",
    )
    line_coords = F.from_json(
        F.get_json_object("value", "$.geometry.coordinates"),
        "array<array<double>>",
    )
    to_ring = "transform({src}, c -> struct(element_at(c, 2) AS lat, element_at(c, 1) AS lon))"
    vertices = (
        F.when(gtype == "Polygon", F.expr(to_ring.format(src="element_at(_pc, 1)")))
        .when(gtype == "LineString", F.expr(to_ring.format(src="_lc")))
    )
    return (
        raw.withColumn("_pc", poly_coords)
        .withColumn("_lc", line_coords)
        .select(
            F.lower(gtype).alias("geom_kind"),
            F.when(gtype == "Point", p_lat).alias("lat"),
            F.when(gtype == "Point", p_lon).alias("lon"),
            vertices.alias("vertices"),
            F.from_json(
                F.get_json_object("value", "$.properties"), "map<string,string>"
            ).alias("properties"),
        )
    )
