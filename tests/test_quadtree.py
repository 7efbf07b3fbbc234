"""adaptive_tile_cover — partition property and closed-form subdivision."""

import pyspark.sql.functions as F

from gaia_spark.operators.raster import adaptive_tile_cover, point_tile_pyramid


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, lat double, lon double")


def test_cover_partitions_points(spark):
    """Every point is counted exactly once: Σn over the cover == total;
    no emitted tile is an ancestor of another."""
    rows = [(i, (i % 50) * 0.8 - 20.0, (i * 7 % 100) * 1.3 - 60.0) for i in range(400)]
    pts = _pts(spark, rows)
    cover = adaptive_tile_cover(pts, max_zoom=6, min_zoom=2, threshold=25).collect()
    assert sum(r.n for r in cover) == 400
    keys = {(r.zoom, r.tx, r.ty) for r in cover}
    for z, x, y in keys:
        zz, xx, yy = z, x, y
        while zz > 2:
            zz, xx, yy = zz - 1, xx // 2, yy // 2
            assert (zz, xx, yy) not in keys  # no ancestor also emitted


def test_threshold_respected_below_max_zoom(spark):
    rows = [(i, 10.0 + (i % 20) * 0.001, 10.0 + (i // 20) * 0.001) for i in range(200)]
    pts = _pts(spark, rows)
    cover = adaptive_tile_cover(pts, max_zoom=10, min_zoom=2, threshold=30).collect()
    assert all(r.n <= 30 or r.zoom == 10 for r in cover)
    assert sum(r.n for r in cover) == 200


def test_dense_clump_forces_max_zoom(spark):
    """All points coincident: no subdivision helps — one max-zoom tile
    holds everything."""
    pts = _pts(spark, [(i, 5.0005, 5.0005) for i in range(100)])
    cover = adaptive_tile_cover(pts, max_zoom=5, min_zoom=2, threshold=10).collect()
    assert len(cover) == 1 and cover[0].zoom == 5 and cover[0].n == 100
