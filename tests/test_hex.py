"""Hexagonal binning: Spark with_hex vs an independent cube-rounding
reference, plus the nearest-center (Voronoi) property."""

import numpy as np
import pandas as pd

from gaia_spark.functions import portable as P
from gaia_spark.operators.spatial_join import with_hex

S = 2.5


def _py_hex(lat, lon):
    q = (P.SQRT3 / 3 * lon - lat / 3) / S
    r = (2 / 3 * lat) / S
    cx, cz = q, r
    cy = -q - r
    rx, ry, rz = np.floor(cx + 0.5), np.floor(cy + 0.5), np.floor(cz + 0.5)
    dx, dy, dz = abs(rx - cx), abs(ry - cy), abs(rz - cz)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dy > dz:
        ry = -rx - rz
    else:
        rz = -rx - ry
    return int(rx), int(rz)


def _center(ax, az):
    return (S * 1.5 * az, S * P.SQRT3 * (ax + az / 2))  # (lat, lon)


def test_with_hex_matches_reference(spark):
    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(200),
            "lat": rng.uniform(-85, 85, 200),
            "lon": rng.uniform(-180, 180, 200),
        }
    )
    out = with_hex(spark.createDataFrame(pdf), S, keep_axial=True).toPandas()
    for r in out.to_dict("records"):  # itertuples mangles _-prefixed names
        ax, az = _py_hex(r["lat"], r["lon"])
        assert (int(r["_ax"]), int(r["_az"])) == (ax, az)
        assert int(r["hex_id"]) == (ax + (1 << 20)) * (1 << 21) + (az + (1 << 20))


def test_hex_assignment_is_voronoi(spark):
    rng = np.random.default_rng(10)
    pdf = pd.DataFrame({"lat": rng.uniform(-80, 80, 150), "lon": rng.uniform(-170, 170, 150)})
    out = with_hex(spark.createDataFrame(pdf), S, keep_axial=True).toPandas()
    for r in out.to_dict("records"):
        clat, clon = _center(int(r["_ax"]), int(r["_az"]))
        d0 = (clat - r["lat"]) ** 2 + (clon - r["lon"]) ** 2
        for dax, daz in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
            nlat, nlon = _center(int(r["_ax"]) + dax, int(r["_az"]) + daz)
            assert (nlat - r["lat"]) ** 2 + (nlon - r["lon"]) ** 2 >= d0 - 1e-9


def test_hex_bins_partition_points(spark):
    # every point gets exactly one hex id; intermediates are dropped
    pdf = pd.DataFrame({"lat": [0.0, 10.0], "lon": [0.0, 20.0]})
    out = with_hex(spark.createDataFrame(pdf), S)
    assert set(out.columns) == {"lat", "lon", "hex_id"}
    assert out.where("hex_id IS NULL").count() == 0


def test_with_hex_output_collision_guard(spark):
    import pytest

    pdf = pd.DataFrame({"lat": [0.0], "lon": [0.0], "hex_id": [1]})
    with pytest.raises(ValueError, match="already exists"):
        with_hex(spark.createDataFrame(pdf), S)
