"""IDW / KDE grid interpolation: scatter-cover exactness vs a brute-force
numpy oracle, plus estimator sanity on known configurations."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from gaia_spark.functions import kernel as K
from gaia_spark.operators.interpolate import idw_grid, kde_grid, scatter_to_grid

RES = 4
N = 1 << RES


def _grid_centers():
    y, x = np.mgrid[0:N, 0:N]
    clat = 90.0 - (y + 0.5) * 180.0 / N
    clon = (x + 0.5) * 360.0 / N - 180.0
    return (y * N + x).ravel(), clat.ravel(), clon.ravel()


def _brute_cells(lat, lon, radius_m):
    cells, clat, clon = _grid_centers()
    d = K.haversine_m(np.full_like(clat, lat), np.full_like(clon, lon), clat, clon)
    return set(cells[d <= radius_m].tolist())


def test_scatter_matches_brute_force(spark):
    rng = np.random.default_rng(5)
    pts = pd.DataFrame(
        {
            "pid": np.arange(24),
            "lat": np.concatenate([rng.uniform(-85, 85, 20), [89.0, -89.5, 0.0, 45.0]]),
            "lon": np.concatenate([rng.uniform(-180, 180, 20), [179.9, -179.9, 0.0, 180.0]]),
        }
    )
    radius = 1_500_000.0  # ~13° — several cells at res 4, wraps near poles
    df = spark.createDataFrame(pts)
    out = scatter_to_grid(df, RES, radius).select("pid", "cell", "dist_m").toPandas()
    # no duplicate (point, cell) pairs — the wrap cap guarantee
    assert not out.duplicated(["pid", "cell"]).any()
    got = out.groupby("pid")["cell"].apply(set).to_dict()
    for r in pts.itertuples(index=False):
        expect = _brute_cells(r.lat, r.lon, radius)
        assert got.get(r.pid, set()) == expect, f"pid {r.pid}"


def test_idw_exact_at_cell_center(spark):
    # one point exactly on a cell center: that cell's estimate equals the
    # point value regardless of weighting
    cells, clat, clon = _grid_centers()
    i = 77
    df = spark.createDataFrame(
        pd.DataFrame({"lat": [clat[i]], "lon": [clon[i]], "v": [42.5]})
    )
    out = idw_grid(df, "v", RES, radius_m=800_000.0).toPandas()
    row = out[out.cell == cells[i]]
    assert len(row) == 1 and abs(float(row.idw.iloc[0]) - 42.5) < 1e-9
    assert (out.n_src == 1).all()


def test_idw_weighted_two_points(spark):
    # two points straddling a cell center: estimate lies strictly between
    # values, closer to the nearer point's value
    df = spark.createDataFrame(
        pd.DataFrame({"lat": [0.0, 0.0], "lon": [5.0, 30.0], "v": [10.0, 20.0]})
    )
    out = idw_grid(df, "v", RES, radius_m=3_000_000.0).toPandas()
    cell_near_first = out[(out.n_src == 2)]
    assert len(cell_near_first) > 0
    assert ((cell_near_first.idw > 10.0) & (cell_near_first.idw < 20.0)).all()


def test_kde_peak_at_source(spark):
    df = spark.createDataFrame(pd.DataFrame({"lat": [10.0], "lon": [10.0]}))
    out = kde_grid(df, RES, bandwidth_m=500_000.0).toPandas()
    # density decreases with distance from the source cell
    cells, clat, clon = _grid_centers()
    m = {int(c): float(d) for c, d in zip(out.cell, out.density)}
    lut = {int(c): (la, lo) for c, la, lo in zip(cells, clat, clon)}
    ds = sorted(
        (float(K.haversine_m(10.0, 10.0, *lut[c])), v) for c, v in m.items()
    )
    vals = [v for _, v in ds]
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))


def test_scatter_reserved_column_guard(spark):
    import pytest

    df = spark.createDataFrame(
        pd.DataFrame({"lat": [0.0], "lon": [0.0], "cell": [1]})
    )
    with pytest.raises(ValueError, match="reserved"):
        scatter_to_grid(df, RES, 1000.0)


def test_scatter_per_row_extent_multi_radius(spark):
    """The per-row longitudinal extent (exact spherical bound replacing the
    blanket deg/cos rectangle) must keep cover-exactness at every radius
    scale: small discs (sub-cell), medium, and near-hemisphere, across
    latitudes including rows where the x-span collapses to ~1 cell."""
    pts = pd.DataFrame(
        {
            "pid": np.arange(8),
            "lat": [0.0, 37.5, -52.1, 71.0, -85.0, 12.0, 88.5, -33.0],
            "lon": [0.0, -122.3, 110.0, -179.95, 30.0, 179.99, -60.0, 0.01],
        }
    )
    df = spark.createDataFrame(pts)
    for radius in (200_000.0, 900_000.0, 4_000_000.0):
        out = (
            scatter_to_grid(df, RES, radius)
            .select("pid", "cell").toPandas()
        )
        assert not out.duplicated(["pid", "cell"]).any()
        got = out.groupby("pid")["cell"].apply(set).to_dict()
        for r in pts.itertuples(index=False):
            expect = _brute_cells(r.lat, r.lon, radius)
            assert got.get(r.pid, set()) == expect, f"pid {r.pid} radius {radius}"
