"""snap_to_lines — clamp identities, endpoint snapping, wrap coverage."""

import pyspark.sql.functions as F

from gaia_spark.functions.kernel import haversine_m
from gaia_spark.operators.snap import snap_to_lines


def _lines(spark, rows):
    # rows: (line_id, [(lat, lon), ...])
    import pandas as pd

    data = [
        {"line_id": i, "vertices": [{"lat": la, "lon": lo} for la, lo in chain]}
        for i, chain in rows
    ]
    return spark.createDataFrame(
        pd.DataFrame(data), "line_id long, vertices array<struct<lat: double, lon: double>>"
    )


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, lat double, lon double")


def test_axis_aligned_clamp_identity(spark):
    """For a horizontal segment the generic projection reduces to a lon
    clamp: interior point projects straight down, beyond-end points snap
    to the endpoints (t = 0 / 1)."""
    lines = _lines(spark, [(7, [(10.0, 20.0), (10.0, 30.0)])])
    pts = _pts(spark, [(1, 12.0, 25.0), (2, 10.5, 19.0), (3, 9.0, 31.5)])
    out = {r.pid: r for r in snap_to_lines(pts, lines, 1_000_000.0).collect()}
    assert out[1].t_e6 == 500_000 and out[1].snap_lat_e6 == 10_000_000
    assert out[1].snap_lon_e6 == 25_000_000
    assert out[2].t_e6 == 0 and out[2].snap_lon_e6 == 20_000_000
    assert out[3].t_e6 == 1_000_000 and out[3].snap_lon_e6 == 30_000_000
    assert out[1].dist_m_e3 == int(haversine_m(12.0, 25.0, 10.0, 25.0) * 1000 + 0.5)


def test_nearest_of_two_lines_and_cutoff(spark):
    lines = _lines(
        spark,
        [(1, [(0.0, 0.0), (0.0, 1.0)]), (2, [(5.0, 0.0), (5.0, 1.0)])],
    )
    pts = _pts(spark, [(1, 1.0, 0.5), (2, 4.5, 0.5), (3, 60.0, 0.5)])
    out = {r.pid: r for r in snap_to_lines(pts, lines, 300_000.0).collect()}
    assert out[1].line_id == 1
    assert out[2].line_id == 2
    assert 3 not in out  # beyond max_dist: absent, not null


def test_antimeridian_wrap_candidate(spark):
    """A point just west of the antimeridian must still find a segment
    just east of it (the scatter pmod-wraps the lon ring)."""
    lines = _lines(spark, [(9, [(0.0, 179.5), (1.0, 179.5)])])
    pts = _pts(spark, [(1, 0.5, -179.8)])
    out = snap_to_lines(pts, lines, 200_000.0, res=6).collect()
    assert len(out) == 1 and out[0].line_id == 9
    # true distance ~ 0.7 deg of lon at the equator ~ 78 km
    assert out[0].dist_m_e3 == int(haversine_m(0.5, -179.8, 0.5, 179.5) * 1000 + 0.5)


def test_multi_segment_chain_picks_right_segment(spark):
    chain = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0)]
    lines = _lines(spark, [(4, chain)])
    pts = _pts(spark, [(1, 0.5, 1.2)])  # nearest to the vertical 2nd segment
    out = snap_to_lines(pts, lines, 500_000.0).collect()
    assert len(out) == 1 and out[0].seg_idx == 1
    assert out[0].snap_lat_e6 == 500_000 and out[0].snap_lon_e6 == 1_000_000
