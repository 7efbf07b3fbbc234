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
