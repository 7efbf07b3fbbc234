"""empirical_variogram — closed-form bins and order-independent sums."""

from gaia_spark.operators.stats import empirical_variogram


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, v double, lat double, lon double")


def test_closed_form_two_bins(spark):
    """Three equator points: A(v=1)@0.0°, B(v=3)@0.01° (~1.11 km),
    C(v=7)@0.5° (~55.6 km). Bin width 10 km, 8 bins:
    bin 0 holds the ordered pair A↔B (diff² = 4);
    bin 5 holds A↔C (55.6 km, diff² = 36); B↔C (54.5 km) also bin 5 (16)."""
    pts = _pts(spark, [(1, 1.0, 0.0, 0.0), (2, 3.0, 0.0, 0.01), (3, 7.0, 0.0, 0.5)])
    rows = {
        r.bin: r
        for r in empirical_variogram(
            pts, "v", 10_000.0, 8, key_col="pid"
        ).collect()
    }
    assert set(rows) == {0, 5}
    b0 = rows[0]
    # ordered pairs double-count: 2 pairs, sum 2·4·1e4, gamma = 4/2 = 2.00
    assert b0.n_pairs == 2 and b0.sum_sq_e4 == 2 * 40_000 and b0.gamma_e2 == 200
    b5 = rows[5]
    assert b5.n_pairs == 4 and b5.sum_sq_e4 == 2 * (360_000 + 160_000)
    # gamma = (36+16)/ (2·2) = 13.00
    assert b5.gamma_e2 == 1300
    assert b5.r_lo_m == 50_000


def test_partitioning_invariance(spark):
    """Quantize-before-sum makes the statistic identical under any
    physical partitioning."""
    pts = _pts(
        spark,
        [(i, float((i * 37) % 11), (i % 7) * 0.01, (i % 5) * 0.01) for i in range(40)],
    )
    a = empirical_variogram(pts, "v", 5_000.0, 4, key_col="pid")
    b = empirical_variogram(pts.repartition(13), "v", 5_000.0, 4, key_col="pid")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
