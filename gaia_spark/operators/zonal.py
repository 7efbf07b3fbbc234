"""Zonal statistics — per-zone aggregate stats over points or raster pixels.

Reference semantics: ``[R] gaia/geo/processes_vector.py :: ZonalStatsProcess``
→ ``[R] gaia/geo/gdal_functions.py :: gdal_zonalstats``: for each polygon
zone, {count, min, max, mean, median, stddev, sum} of the covered raster
values. Here zone assignment is the §2.C spatial join and the stats are one
hash aggregation (partial/map-side combine + final, for free from Catalyst).
Median is EXACT (``percentile``) to match golden outputs; at 10^12 scale the
documented switch is ``percentile_approx(v, 0.5, accuracy)``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

ZONAL_STATS = ("count", "min", "max", "mean", "median", "stddev", "sum")


def zonal_stats(
    assigned: DataFrame,
    value_col: str,
    zone_col: str = "zone_id",
    stats: tuple[str, ...] = ZONAL_STATS,
    exact_median: bool = True,
) -> DataFrame:
    v = F.col(value_col)
    exprs = {
        "count": F.count(v).cast("long").alias("count"),
        "min": F.min(v).alias("min"),
        "max": F.max(v).alias("max"),
        "mean": F.avg(v).alias("mean"),
        "median": (
            F.expr(f"percentile({value_col}, 0.5)") if exact_median
            else F.percentile_approx(v, 0.5, 10_000)
        ).alias("median"),
        "stddev": F.stddev_samp(v).alias("stddev"),
        "sum": F.sum(v).alias("sum"),
    }
    return assigned.groupBy(zone_col).agg(*[exprs[s] for s in stats])


def pixel_zonal_stats(
    raster: DataFrame,
    index,
    band: int = 0,
) -> DataFrame:
    """ZonalStats over a tile-pyramid raster: explode pixels to centers,
    assign zones via the spatial join, aggregate. The explode is lazy and
    pipelined — no materialized pixel table."""
    from gaia_spark.operators.raster import pixels_of
    from gaia_spark.operators.spatial_join import spatial_join

    px = pixels_of(raster.where(F.col("band") == band))
    assigned = spatial_join(
        px.withColumnRenamed("v", "value"), index, predicate="intersects", point_key="pixel_id"
    )
    return zonal_stats(assigned, "value")


# --- areal interpolation (zonal reaggregation by overlap area) ---------------


def overlap_weight_sql(
    fmin_lat: str, fmin_lon: str, fmax_lat: str, fmax_lon: str,
    zmin_lat: str, zmin_lon: str, zmax_lat: str, zmax_lon: str,
) -> str:
    """Spherical overlap-area fraction of a feature bbox inside a zone
    rect: area(bbox ∩ zone) / area(bbox), via the (sin φ₁ − sin φ₂)·Δλ
    band form — one shared SQL string, exact on the sphere for
    axis-aligned rectangles, identical IEEE arithmetic in both engines.
    Touch-only pairs (zero-width overlap) weigh exactly 0."""
    from gaia_spark.functions.portable import rect_area_m2_sql

    o = rect_area_m2_sql(
        f"greatest({fmin_lat}, {zmin_lat})",
        f"greatest({fmin_lon}, {zmin_lon})",
        f"least({fmax_lat}, {zmax_lat})",
        f"least({fmax_lon}, {zmax_lon})",
    )
    f = rect_area_m2_sql(fmin_lat, fmin_lon, fmax_lat, fmax_lon)
    return f"(({o}) / ({f}))"


def areal_reaggregate(
    features: DataFrame,
    index,
    zone_rects: DataFrame,
    value_col: str,
    feature_key: str = "feature_id",
    vertices_col: str = "vertices",
) -> DataFrame:
    """Areal interpolation (the census reaggregation op): redistribute each
    feature's ``value_col`` onto the target zones proportionally to
    overlap area, and sum per zone. Exact for axis-aligned rectangular
    features (census blocks / grid cells / bboxes); for general rings the
    feature is represented by its bounding box — the documented
    approximation (the reference's raster analog burns a mask instead).

    Scale shape: candidates come from the cell-bucketed
    ``feature_spatial_join`` (never all-pairs); ``zone_rects``
    (zone_id, min/max lat/lon) is broadcast to attach extents; the weight
    is one closed-form JVM expression; the result is a single combinable
    groupBy(zone). Float summation order differs across engines, so the
    allocation leaves as floor-scaled fixed point downstream."""
    from gaia_spark.operators.feature_join import feature_spatial_join

    pairs = feature_spatial_join(
        features, index, "intersects", feature_key=feature_key, vertices_col=vertices_col
    )
    lats = f"transform({vertices_col}, q -> q.lat)"
    lons = f"transform({vertices_col}, q -> q.lon)"
    j = (
        pairs.join(F.broadcast(zone_rects), "zone_id")
        .withColumn("_fmin_lat", F.expr(f"array_min({lats})"))
        .withColumn("_fmax_lat", F.expr(f"array_max({lats})"))
        .withColumn("_fmin_lon", F.expr(f"array_min({lons})"))
        .withColumn("_fmax_lon", F.expr(f"array_max({lons})"))
    )
    w = overlap_weight_sql(
        "_fmin_lat", "_fmin_lon", "_fmax_lat", "_fmax_lon",
        "min_lat", "min_lon", "max_lat", "max_lon",
    )
    return j.groupBy("zone_id").agg(
        F.count("*").cast("long").alias("n_src"),
        F.sum(F.col(value_col) * F.expr(w)).alias("alloc"),
    )


def zonal_majority(
    assigned: DataFrame,
    zone_col: str = "zone_id",
    cat_col: str = "category",
) -> DataFrame:
    """Zonal MAJORITY/MINORITY/VARIETY — the categorical members of the
    ArcGIS/gdal zonal-statistics family beside :func:`zonal_stats`'s
    numerics: per zone, the most and least frequent category value and the
    number of distinct categories. Two combinable hash aggregations
    ((zone, cat) counts → per-zone argmax); ties break deterministically
    toward the SMALLER category value (min_by/max_by on a (count, cat)
    struct — exact integer comparisons). Returns
    (zone, majority, majority_n, minority, minority_n, variety)."""
    cc = assigned.groupBy(zone_col, cat_col).agg(
        F.count("*").cast("long").alias("_n")
    )
    # lexicographic struct trick: argmax by (count asc/desc, cat) with the
    # category NEGATED in the max branch is wrong for strings — instead use
    # min(struct(-count, cat)) for majority and min(struct(count, cat)) for
    # minority: both resolve count ties toward the smaller category.
    return (
        cc.groupBy(zone_col)
        .agg(
            F.min(F.struct((-F.col("_n")).alias("_k"), F.col(cat_col).alias("_c"))).alias("_maj"),
            F.min(F.struct(F.col("_n").alias("_k"), F.col(cat_col).alias("_c"))).alias("_min"),
            F.count("*").cast("long").alias("variety"),
        )
        .select(
            zone_col,
            F.col("_maj._c").alias("majority"),
            (-F.col("_maj._k")).cast("long").alias("majority_n"),
            F.col("_min._c").alias("minority"),
            F.col("_min._k").cast("long").alias("minority_n"),
            "variety",
        )
    )
