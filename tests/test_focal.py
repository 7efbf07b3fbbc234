"""focal_stats — independent numpy reference over the global pixel grid."""

import numpy as np

from gaia_spark.operators.raster import focal_stats
from gaia_spark.synth import TILE_PX, surface_value, synth_raster
from gaia_spark.functions.kernel import tile_bounds


def _reference_grid(zoom: int, band: int) -> np.ndarray:
    """Global pixel grid v[r, c] built tile-by-tile like synth_raster."""
    n_t = 1 << zoom
    g = np.empty((n_t * TILE_PX, n_t * TILE_PX), dtype=np.float64)
    for ty in range(n_t):
        for tx in range(n_t):
            lat0, lat1, lon0, lon1 = tile_bounds(zoom, tx, ty)
            lats = np.linspace(lat1, lat0, TILE_PX, endpoint=False) - (lat1 - lat0) / (2 * TILE_PX)
            lons = np.linspace(lon0, lon1, TILE_PX, endpoint=False) + (lon1 - lon0) / (2 * TILE_PX)
            glon, glat = np.meshgrid(lons, lats)
            g[ty * TILE_PX:(ty + 1) * TILE_PX, tx * TILE_PX:(tx + 1) * TILE_PX] = (
                surface_value(glat, glon, band).astype(np.float32).astype(np.float64)
            )
    return g


def test_focal_vs_numpy_reference(spark):
    """Every (r, c) matches an independent padded-roll numpy focal pass —
    including cross-TILE rows/cols, the wrapped antimeridian columns, and
    the clamped polar rows."""
    zoom, band = 1, 0
    raster = synth_raster(spark, zooms=(zoom,), bands=(band,))
    out = {(r.r, r.c): r for r in focal_stats(raster, zoom, band).collect()}

    g = _reference_grid(zoom, band)
    n = g.shape[0]
    ve = np.floor(g * 1e4 + 0.5).astype(np.int64)
    assert len(out) == n * n
    rng = np.random.default_rng(7)
    checks = [(0, 0), (0, n - 1), (n - 1, 0), (TILE_PX - 1, TILE_PX)] + [
        (int(a), int(b)) for a, b in rng.integers(0, n, size=(50, 2))
    ]
    for r, c in checks:
        nbr = [
            ve[r + dr, (c + dc) % n]
            for dr in (-1, 0, 1)
            for dc in (-1, 0, 1)
            if 0 <= r + dr < n
        ]
        row = out[(r, c)]
        assert row.n_nb == len(nbr)
        assert row.min_e4 == min(nbr) and row.max_e4 == max(nbr)
        s = int(sum(nbr))
        assert row.mean_e2 == (s + len(nbr) * 2_000_000) // (len(nbr) * 100) - 20_000


def test_focal_constant_surface_mean_identity(spark):
    """On interior pixels of a 3×3-complete neighborhood the mean of the
    focal max/min bracket the pixel's own value."""
    zoom = 1
    raster = synth_raster(spark, zooms=(zoom,), bands=(0,))
    rows = focal_stats(raster, zoom, 0).where("r > 0 AND r < 127").collect()
    assert all(r.n_nb == 9 for r in rows)
    assert all(r.min_e4 <= r.mean_e2 * 100 + 100 and r.mean_e2 * 100 <= r.max_e4 + 100 for r in rows)


def test_slope_aspect_vs_numpy_reference(spark):
    """Horn gradients match an independent numpy convolution on interior
    pixels (incl. cross-tile and wrapped-antimeridian neighborhoods);
    border rows are absent."""
    import math

    from gaia_spark.operators.raster import slope_aspect

    zoom, band = 1, 0
    raster = synth_raster(spark, zooms=(zoom,), bands=(band,))
    out = {(r.r, r.c): r for r in slope_aspect(raster, zoom, band).collect()}

    g = _reference_grid(zoom, band)
    n = g.shape[0]
    ve = np.floor(g * 1e4 + 0.5).astype(np.int64)
    assert len(out) == (n - 2) * n  # top/bottom rows excluded, lon wraps
    assert all(0 < r < n - 1 for r, _ in out)

    rng = np.random.default_rng(11)
    checks = [(1, 0), (1, n - 1), (n - 2, TILE_PX), (TILE_PX - 1, TILE_PX)] + [
        (int(a) % (n - 2) + 1, int(b)) for a, b in rng.integers(0, n, size=(40, 2))
    ]
    for r, c in checks:
        gx = gy = 0
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                v = int(ve[r + dr, (c + dc) % n])
                gx += v * dc * (2 - abs(dr))  # source offset = (dr, dc)
                gy += v * dr * (2 - abs(dc))
        row = out[(r, c)]
        assert (row.gx_e4, row.gy_e4) == (gx, gy)
        grad = math.sqrt(gx * gx + gy * gy) / 80000.0
        assert row.slope_deg_e4 == int(
            math.floor(math.degrees(math.atan(grad)) * 1e4 + 0.5)
        )
        assert row.aspect_deg_e4 == int(
            math.floor(math.degrees(math.atan2(gy, gx)) * 1e4 + 0.5)
        )
        c45 = math.sqrt(2) / 2
        slope = math.atan(grad)
        hs = 255.0 * max(
            0.0,
            c45 * math.cos(slope)
            + c45 * math.sin(slope) * math.cos(7 * math.pi / 4 - math.atan2(gy, gx)),
        )
        assert row.hillshade_e2 == int(math.floor(hs * 1e2 + 0.5))


def test_terrain_indices_vs_numpy_reference(spark):
    """TPI/TRI/roughness match an independent per-pixel numpy computation,
    including wrapped-antimeridian columns and clamped polar rows."""
    import math

    from gaia_spark.operators.raster import terrain_indices

    zoom, band = 1, 0
    raster = synth_raster(spark, zooms=(zoom,), bands=(band,))
    out = {(r.r, r.c): r for r in terrain_indices(raster, zoom, band).collect()}

    g = _reference_grid(zoom, band)
    n = g.shape[0]
    ve = np.floor(g * 1e4 + 0.5).astype(np.int64)
    assert len(out) == n * n
    rng = np.random.default_rng(13)
    checks = [(0, 0), (0, n - 1), (n - 1, 0), (TILE_PX - 1, TILE_PX)] + [
        (int(a), int(b)) for a, b in rng.integers(0, n, size=(50, 2))
    ]
    OFF = 2_000_000
    for r, c in checks:
        v = int(ve[r, c])
        nbr = [
            int(ve[r + dr, (c + dc) % n])
            for dr in (-1, 0, 1)
            for dc in (-1, 0, 1)
            if (dr, dc) != (0, 0) and 0 <= r + dr < n
        ]
        row = out[(r, c)]
        assert row.n_nb == len(nbr)
        m = len(nbr)
        assert row.tpi_e4 == (m * v - sum(nbr) + m * OFF) // m - OFF
        ssd = sum((v - x) ** 2 for x in nbr)
        assert row.tri_e4 == math.floor(math.sqrt(ssd) / 1e4 * 1e4 + 0.5)
        assert row.rough_e4 == max(nbr + [v]) - min(nbr + [v])


def test_zt_curvature_numpy_reference(spark):
    import numpy as np

    from gaia_spark.operators.raster import zt_curvature
    from gaia_spark.synth import synth_raster, TILE_PX

    raster = synth_raster(spark, zooms=(2,), bands=(0,))
    out = {(r.r, r.c): r for r in zt_curvature(raster, zoom=2, band=0).collect()}

    # rebuild the global grid from the same decode the engine uses
    from gaia_spark.operators.raster import pixels_of
    import pyspark.sql.functions as F

    pp = TILE_PX * TILE_PX
    px = pixels_of(raster.where((F.col("zoom") == 2) & (F.col("band") == 0)))
    rows = px.select("pixel_id", "v").collect()
    n_px = TILE_PX * (1 << 2)
    z = np.zeros((n_px, n_px), dtype=np.int64)
    for row in rows:
        t = row.pixel_id // pp
        r = (t % 65536) * TILE_PX + (row.pixel_id % pp) // TILE_PX
        c = (t // 65536 % 65536) * TILE_PX + row.pixel_id % TILE_PX
        z[r, c] = int(np.floor(row.v * 10000 + 0.5))

    # interior sample cells: ZT kernel sums + curvature formulas
    checked = 0
    for (r, c) in [(5, 5), (100, 37), (200, 200), (1, 1), (254, 254)]:
        z5 = z[r, c]
        z2, z8 = z[r - 1, c], z[(r + 1) % n_px, c]
        z4, z6 = z[r, (c - 1) % n_px], z[r, (c + 1) % n_px]
        z1, z3 = z[r - 1, (c - 1) % n_px], z[r - 1, (c + 1) % n_px]
        z7, z9 = z[r + 1, (c - 1) % n_px], z[r + 1, (c + 1) % n_px]
        d4 = 2 * (z4 + z6) - 4 * z5
        e4x = 2 * (z2 + z8) - 4 * z5
        f4 = -z1 + z3 + z7 - z9
        g2, h2 = z6 - z4, z2 - z8
        o = out[(r, c)]
        assert (o.d4, o.e4x, o.f4, o.g2, o.h2) == (d4, e4x, f4, g2, h2)
        if g2 or h2:
            den = float(g2 * g2 + h2 * h2)
            prof = -float(d4 * g2 * g2 + e4x * h2 * h2 + f4 * g2 * h2) / (2 * den * 1e4)
            assert o.prof_e6 == int(np.floor(prof * 1e6 + 0.5))
        checked += 1
    assert checked == 5
    # border rows never emit
    assert all(0 < r < n_px - 1 for (r, _) in out)
