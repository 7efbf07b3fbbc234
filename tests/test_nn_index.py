"""nearest_neighbor_index — closed-form regular/clustered patterns."""

from gaia_spark.operators.stats import nearest_neighbor_index


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, lat double, lon double")


def test_closed_form_mean_nn(spark):
    """4 equator points at lon 0, 0.01, 0.02, 0.05: nearest distances are
    d01, d01, d12(=d01 on the equator grid), d25 — mean is exact from the
    quantized integers. With area = n/(4·0.25) the expected mean is 0.5·1
    so r_e6 = mean in metres scaled."""
    pts = _pts(spark, [(1, 0.0, 0.0), (2, 0.0, 0.01), (3, 0.0, 0.02), (4, 0.0, 0.05)])
    row = nearest_neighbor_index(pts, "cast(16 as double)", key_col="pid").collect()[0]
    assert row.n == 4
    # equator: 0.01 deg ≈ 1111.95 m — three points have that NN dist,
    # the fourth is 0.03 deg away
    assert row.mean_nn_e3 == (3 * row.sum_nn_e3 // (3 * 4)) or row.sum_nn_e3 // 4 == row.mean_nn_e3
    d01 = 1111949  # floor(e3) of 0.01-deg equator haversine
    assert abs(row.sum_nn_e3 - (3 * d01 + 3 * d01)) < 5000  # 3×d01 + 1×(3·d01)


def test_clustered_vs_dispersed_ordering(spark):
    """A tight clump scores a smaller R than a regular grid over the same
    region (clustered < dispersed) — the statistic's defining property."""
    clump = _pts(spark, [(i, 0.001 * (i % 3), 0.001 * (i // 3)) for i in range(9)])
    grid = _pts(spark, [(i, 1.0 * (i % 3), 1.0 * (i // 3)) for i in range(9)])
    area = "cast(100000000000 as double)"  # same nominal region for both
    r_clump = nearest_neighbor_index(clump, area, key_col="pid").collect()[0].r_e6
    r_grid = nearest_neighbor_index(grid, area, key_col="pid").collect()[0].r_e6
    assert r_clump < r_grid
