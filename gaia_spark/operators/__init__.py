from gaia_spark.operators.spatial_join import ZoneIndex, equals_join, spatial_join, with_cell
from gaia_spark.operators.feature_join import feature_spatial_join
from gaia_spark.operators.knn import (
    distance_to_nearest,
    knn_join_broadcast,
    knn_join_cells,
    near_join,
)
from gaia_spark.operators.zonal import zonal_stats, pixel_zonal_stats
from gaia_spark.operators.setops import union_features, intersect_features, except_features
from gaia_spark.operators.raster import (
    clip_raster,
    pixels_of,
    point_tile_pyramid,
    raster_math,
    with_tile,
)

__all__ = [
    "ZoneIndex", "equals_join", "spatial_join", "with_cell", "feature_spatial_join",
    "distance_to_nearest", "knn_join_broadcast", "knn_join_cells", "near_join",
    "zonal_stats", "pixel_zonal_stats",
    "union_features", "intersect_features", "except_features",
    "clip_raster", "pixels_of", "point_tile_pyramid", "raster_math", "with_tile",
]
