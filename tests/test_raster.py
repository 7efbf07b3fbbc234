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
