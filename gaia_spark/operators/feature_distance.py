"""DistanceProcess for NON-POINT features: nearest zone per polygon/line
feature + the distance in meters.

Reference semantics: ``[R] gaia/geo/processes_vector.py :: DistanceProcess``
accepts arbitrary geometry pairs (shapely ``a.distance(b)`` after metric
reprojection); round-2 of this engine supported point left-sides only
(:mod:`gaia_spark.operators.knn`). This closes that gap.

Distance definition (planar-parameterized geodesic):

- if the feature INTERSECTS the zone (same predicate algebra as
  :mod:`feature_join`), distance = 0;
- else min over all (vertex of A, edge of B) and (vertex of B, edge of A)
  pairs of point-to-segment distance, where the closest point on the
  segment is found by planar degree-space projection (clamped parameter)
  and the reported distance is the haversine between the vertex and that
  closest point. For non-intersecting planar segments the minimum distance
  is always attained at an endpoint of one of them, so the vertex↔edge
  sweep in both directions is exhaustive — exact for axis-aligned
  geometry, a documented small-edge approximation for long slanted edges
  (the parameterization is planar in degrees).

Physical plan (the 100-TB shape, mirroring knn_join_broadcast's sql impl):
the zone layer rides along as ONE broadcast array column; per feature a
single JVM expression tree (transform / array_min over the zones array)
computes every zone distance and picks (min dist, min zone_id) — no
explode, no shuffle, no Python. Features stream through map-side only.
For zone sets too large to broadcast, fall back to the cell-ring pattern
in knn.knn_join_cells (future work; the web-pipeline shape is small-m).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gaia_spark.operators.feature_join import (
    _close_ring_sql,
    _covered_at,
    _edges_sql,
    _on_boundary_at,
    _proper_cross_sql,
)
from gaia_spark.operators.spatial_join import ZoneIndex


def _pt_seg_dist_m_sql(edges: str, lat: str, lon: str) -> str:
    """min over ``edges`` of haversine(point, closest point on segment);
    closest point via clamped planar degree-space projection. Lambda var
    ``se`` (distinct from feature_join's ``e``/``ea``/``eb`` so builders
    can nest)."""
    from gaia_spark.functions import portable

    dx, dy = "(se.x2 - se.x1)", "(se.y2 - se.y1)"
    len2 = f"({dx} * {dx} + {dy} * {dy})"
    dot = f"(({lon} - se.x1) * {dx} + ({lat} - se.y1) * {dy})"
    t = (
        f"(CASE WHEN {len2} = 0 THEN cast(0 as double) "
        f"ELSE least(cast(1 as double), greatest(cast(0 as double), {dot} / {len2})) END)"
    )
    clat, clon = f"(se.y1 + {t} * {dy})", f"(se.x1 + {t} * {dx})"
    d = portable.haversine_m_sql(lat, lon, clat, clon)
    return f"array_min(transform({edges}, se -> {d}))"


def _zones_meta_pdf(index: ZoneIndex) -> pd.DataFrame:
    """One row per zone with a NORMALIZED edge array (rect zones get their
    4 bbox edges synthesized driver-side — the zone side is small)."""
    z = index.cover_pdf.drop_duplicates("zone_id")[
        ["zone_id", "kind", "min_lat", "min_lon", "max_lat", "max_lon", "edges"]
    ].copy()

    def norm(r):
        if r["kind"] == "poly" and r["edges"]:
            return r["edges"]
        a, b, c, d = r["min_lat"], r["min_lon"], r["max_lat"], r["max_lon"]
        return [
            {"y1": a, "x1": b, "y2": a, "x2": d},
            {"y1": a, "x1": d, "y2": c, "x2": d},
            {"y1": c, "x1": d, "y2": c, "x2": b},
            {"y1": c, "x1": b, "y2": a, "x2": b},
        ]

    z["edges"] = z.apply(norm, axis=1)
    return z[["zone_id", "edges"]]


def _zone_dist_sql(kind: str) -> str:
    """Per-zone distance expression (lambda var ``z`` over the zones array;
    requires ``vertices`` and ``_fedges`` columns in scope): 0 when the
    feature intersects the zone, else the vertex↔edge candidate min."""
    any_fv_covered = f"exists(vertices, v -> {_covered_at('z.edges', 'v.lat', 'v.lon')})"
    if kind == "line":
        zv_touch = _on_boundary_at("_fedges", "zv.y1", "zv.x1")
    else:
        zv_touch = _covered_at("_fedges", "zv.y1", "zv.x1")
    any_zv_covered = f"exists(z.edges, zv -> {zv_touch})"
    cross = _proper_cross_sql("_fedges", "z.edges")
    intersects = f"(({any_fv_covered}) OR ({any_zv_covered}) OR ({cross}))"
    d_fv = f"array_min(transform(vertices, v -> {_pt_seg_dist_m_sql('z.edges', 'v.lat', 'v.lon')}))"
    d_zv = f"array_min(transform(z.edges, zv -> {_pt_seg_dist_m_sql('_fedges', 'zv.y1', 'zv.x1')}))"
    return f"(CASE WHEN {intersects} THEN cast(0 as double) ELSE least({d_fv}, {d_zv}) END)"


def _with_zones_array(features: DataFrame, index: ZoneIndex, vertices_col: str, kind: str) -> DataFrame:
    if kind not in ("poly", "line"):
        raise ValueError(f"unknown kind {kind!r}")
    spark = features.sparkSession
    zpdf = _zones_meta_pdf(index)
    zones = spark.createDataFrame(
        zpdf.to_dict("records"),
        "zone_id long, edges array<struct<y1:double,x1:double,y2:double,x2:double>>",
    ).agg(F.collect_list(F.struct("zone_id", "edges")).alias("_zs"))
    feats = (
        features.withColumnRenamed(vertices_col, "vertices")
        if vertices_col != "vertices"
        else features
    )
    feats = feats.where(F.col("vertices").isNotNull() & (F.size("vertices") >= 2))
    fedges = _edges_sql(_close_ring_sql("vertices")) if kind == "poly" else _edges_sql("vertices")
    return feats.withColumn("_fedges", F.expr(fedges)).join(F.broadcast(zones))


def feature_distance_nearest(
    features: DataFrame,
    index: ZoneIndex,
    feature_key: str = "feature_id",
    vertices_col: str = "vertices",
    kind: str = "poly",
) -> DataFrame:
    """Nearest zone per feature: returns feature columns + (zone_id, dist_m).

    Ties broken by (dist_m, zone_id) ascending — deterministic and
    oracle-mirrorable (``ORDER BY dist, zone_id``)."""
    feats = _with_zones_array(features, index, vertices_col, kind)
    best = (
        f"array_min(transform(_zs, z -> struct({_zone_dist_sql(kind)} AS d, z.zone_id AS zid)))"
    )
    return (
        feats.withColumn("_best", F.expr(best))
        .withColumn("zone_id", F.col("_best.zid"))
        .withColumn("dist_m", F.col("_best.d"))
        .drop("_fedges", "_zs", "_best")
    )


def feature_near_join(
    features: DataFrame,
    index: ZoneIndex,
    radius_m: float,
    feature_key: str = "feature_id",
    vertices_col: str = "vertices",
    kind: str = "poly",
) -> DataFrame:
    """NearProcess for NON-POINT features: all (feature, zone) pairs with
    geometry distance ≤ radius_m (0 = intersecting pairs included) — the
    buffer-as-predicate generalization of knn.near_join to polygon/line
    left sides. Same broadcast zones-array plan as
    :func:`feature_distance_nearest`: per feature ONE JVM expression scores
    every zone, then only the within-radius matches are exploded — no
    shuffle, no Python."""
    feats = _with_zones_array(features, index, vertices_col, kind)
    scored = (
        f"filter(transform(_zs, z -> struct({_zone_dist_sql(kind)} AS d, z.zone_id AS zid)), "
        f"s -> s.d <= cast({float(radius_m)!r} as double))"
    )
    return (
        feats.withColumn("_m", F.explode(F.expr(scored)))
        .withColumn("zone_id", F.col("_m.zid"))
        .withColumn("dist_m", F.col("_m.d"))
        .drop("_fedges", "_zs", "_m")
    )


__all__ = ["feature_distance_nearest", "feature_near_join"]
