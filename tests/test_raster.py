"""Raster operators: tile math, pyramid rollup, raster math, clip, zonal."""

import numpy as np
import pyspark.sql.functions as F

from gaia_spark.functions.geoparse import geoparse
from gaia_spark.operators.raster import (
    clip_raster,
    pixels_of,
    point_tile_pyramid,
    raster_math,
)
from gaia_spark.operators.spatial_join import ZoneIndex
from gaia_spark.operators.zonal import pixel_zonal_stats
from gaia_spark.synth import surface_value, synth_pages, synth_raster, synth_zones_pdf


def test_tile_pyramid_conservation(spark):
    pts = geoparse(synth_pages(spark, 500, partitions=2))
    pyr = point_tile_pyramid(pts, max_zoom=6, min_zoom=3).collect()
    by_zoom = {}
    for r in pyr:
        by_zoom[r.zoom] = by_zoom.get(r.zoom, 0) + r.n
    n_pts = pts.where("lat is not null").count()
    # every zoom level conserves the total point count
    assert set(by_zoom) == {3, 4, 5, 6}
    assert all(v == n_pts for v in by_zoom.values())


def test_raster_math_band_algebra(spark):
    r = synth_raster(spark, zooms=(2,), bands=(0, 1)).cache()
    out = raster_math(r, "A + 2*B", bands=(0, 1))
    row = out.where("x = 1 AND y = 1").first()
    src = {
        b: np.array(r.where(f"x = 1 AND y = 1 AND band = {b}").first().px)
        for b in (0, 1)
    }
    np.testing.assert_allclose(
        np.array(row.px), src[0] + 2 * src[1], rtol=1e-6
    )
    assert out.count() == (1 << 2) ** 2  # one row per tile


def test_pixels_roundtrip_surface(spark):
    r = synth_raster(spark, zooms=(2,), bands=(0,))
    px = pixels_of(r)
    sample = px.limit(500).collect()
    for row in sample:
        assert abs(row.v - surface_value(np.array([row.lat]), np.array([row.lon]), 0)[0]) < 1e-3


def test_clip_raster_masks_outside(spark):
    zones = synth_zones_pdf(16)
    idx = ZoneIndex.build(zones)
    r = synth_raster(spark, zooms=(4,), bands=(0,))
    clipped = clip_raster(r, idx)
    rows = clipped.collect()
    assert len(rows) > 0
    # partial tiles contain NaN-masked pixels; fully-inside tiles none
    def masked(px):
        return any(v is None or (isinstance(v, float) and np.isnan(v)) for v in px)

    assert any(masked(row.px) for row in rows)


def test_pixel_zonal_stats_against_closed_form(spark):
    zones = synth_zones_pdf(4)
    idx = ZoneIndex.build(zones)
    r = synth_raster(spark, zooms=(4,), bands=(0,))
    stats = {s.zone_id: s for s in pixel_zonal_stats(r, idx, band=0).collect()}
    assert stats
    # brute force: pixel centers of every tile, assigned by bbox/PIP
    px = pixels_of(r).toPandas()
    from gaia_spark.functions.kernel import PreparedPolygon

    for z in zones.itertuples(index=False):
        if int(z.zone_id) not in stats:
            continue
        prep = PreparedPolygon(
            np.array([v["lat"] for v in z.vertices]), np.array([v["lon"] for v in z.vertices])
        )
        m = prep.covers(px["lat"].to_numpy(), px["lon"].to_numpy())
        want = px["v"].to_numpy()[m]
        got = stats[int(z.zone_id)]
        assert got["count"] == len(want)
        np.testing.assert_allclose(got.mean, want.mean(), rtol=1e-9)
        np.testing.assert_allclose(got.sum, want.sum(), rtol=1e-9)
        np.testing.assert_allclose(got.median, np.median(want), rtol=1e-9)


def test_bilinear_upsample_reproduces_linear_ramp(spark):
    import numpy as np

    from gaia_spark.operators.raster import bilinear_upsample
    from gaia_spark.synth import TILE_PX

    # v(r, c) = r: bilinear interpolation reproduces linear functions
    # exactly -> target value (R - 0.5)/2 in source units = R*5000 - 2500 e4
    grid = np.tile(np.arange(TILE_PX, dtype=np.float32)[:, None], (1, TILE_PX))
    df = spark.createDataFrame(
        [(0, 0, 0, 0, grid.ravel().tolist())],
        "zoom int, x int, y int, band int, px array<float>",
    )
    out = bilinear_upsample(df, zoom=0).collect()
    n_tgt = 2 * TILE_PX
    assert len(out) == (n_tgt - 2) * n_tgt  # two polar target rows drop
    assert all(r.v_e4 == r.r * 5000 - 2500 for r in out)


def test_bilinear_upsample_constant_field_identity(spark):
    import numpy as np

    from gaia_spark.operators.raster import bilinear_upsample
    from gaia_spark.synth import TILE_PX

    grid = np.full((TILE_PX, TILE_PX), 7.25, dtype=np.float32)
    df = spark.createDataFrame(
        [(0, 0, 0, 0, grid.ravel().tolist())],
        "zoom int, x int, y int, band int, px array<float>",
    )
    vals = {r.v_e4 for r in bilinear_upsample(df, zoom=0).collect()}
    assert vals == {72500}


def _tile0(spark, grid):
    from gaia_spark.synth import TILE_PX

    assert grid.shape == (TILE_PX, TILE_PX)
    return spark.createDataFrame(
        [(0, 0, 0, 0, grid.astype(np.float32).ravel().tolist())],
        "zoom int, x int, y int, band int, px array<float>",
    )


def test_reclassify_boundary_exactness(spark):
    """A pixel exactly ON a break belongs to the upper class (>=), and the
    class index counts breaks below-or-equal."""
    from gaia_spark.operators.raster import reclassify
    from gaia_spark.synth import TILE_PX

    grid = np.zeros((TILE_PX, TILE_PX))
    grid[0, 0] = -60.0
    grid[0, 1] = -50.0  # exactly on the first break
    grid[0, 2] = 10.0
    grid[0, 3] = 99.0
    out = {(r.r, r.c): r.cls for r in reclassify(_tile0(spark, grid), 0, [-50.0, 0.0, 50.0]).collect()}
    assert out[(0, 0)] == 0 and out[(0, 1)] == 1
    assert out[(0, 2)] == 2 and out[(0, 3)] == 3
    assert out[(1, 0)] == 2  # 0.0 >= 0.0 break


def test_polygonize_regions_and_wrap(spark):
    """Two same-class blobs joined only diagonally stay SEPARATE regions
    (4-connectivity), and a run crossing the antimeridian columns is ONE
    region."""
    from gaia_spark.operators.raster import polygonize
    from gaia_spark.synth import TILE_PX

    grid = np.zeros((TILE_PX, TILE_PX))
    # class-1 pixels: diagonal pair (5,5) and (6,6); wrap run (10, 62..1)
    grid[5, 5] = 10.0
    grid[6, 6] = 10.0
    for c in (62, 63, 0, 1):
        grid[10, c] = 10.0
    out = polygonize(_tile0(spark, grid), 0, [5.0]).collect()
    ones = [r for r in out if r.cls == 1]
    sizes = sorted(r.n_pixels for r in ones)
    assert sizes == [1, 1, 4]
    wrap = next(r for r in ones if r.n_pixels == 4)
    assert wrap.min_r == 10 and wrap.max_r == 10
    assert wrap.min_c == 0 and wrap.max_c == 63  # wraps, plain min/max
    # the zero background is a single giant region
    zero = [r for r in out if r.cls == 0]
    assert len(zero) == 1 and zero[0].n_pixels == TILE_PX * TILE_PX - 6
