"""ripleys_k — closed-form pair counts and clustering signal."""

from gaia_spark.operators.stats import ripleys_k


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, lat double, lon double")


def test_two_clusters_closed_form(spark):
    """Two 2-point clusters ~1 km wide, 10 km apart (at the equator
    1e-2 deg ≈ 1.1 km): r=2km sees only intra-cluster ordered pairs (4),
    r=50km sees all 12; with region area set to n(n-1)=12 the K column is
    exactly the ordered pair count."""
    pts = _pts(
        spark,
        [
            (1, 0.0, 0.0), (2, 0.0, 0.01),
            (3, 0.1, 0.0), (4, 0.1, 0.01),
        ],
    )
    out = {
        r.r_m: r
        for r in ripleys_k(
            pts, [2_000.0, 50_000.0], key_col="pid",
            region_area_sql="cast(12 as double)",
        ).collect()
    }
    assert out[2_000.0].n_pairs == 4 and out[2_000.0].k_m2_e0 == 4
    assert out[50_000.0].n_pairs == 12 and out[50_000.0].k_m2_e0 == 12


def test_radii_monotonicity_and_self_exclusion(spark):
    pts = _pts(spark, [(i, 0.0, 0.001 * i) for i in range(6)])
    rows = ripleys_k(pts, [100.0, 300.0, 1_000.0], key_col="pid").collect()
    counts = [r.n_pairs for r in sorted(rows, key=lambda r: r.r_m)]
    assert counts == sorted(counts)  # K is cumulative in r
    assert counts[-1] == 6 * 5      # all ordered pairs, no self-pairs
