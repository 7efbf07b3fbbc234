"""Geary's C + join-count statistics: closed-form fixtures on a tiny rook
grid and exact partitioning invariance (both statistics are pure integer
arithmetic until one final IEEE division)."""

import pyspark.sql.functions as F

from gaia_spark.operators.stats import cell_rook_weights, gearys_c, join_counts


def _checkerboard(spark, res=2):
    """4x4 grid (res=2), x wraps / y clamps; values 0/10 checkerboard."""
    n = 1 << res
    rows = [(y * n + x, 10 if (x + y) % 2 == 0 else 0) for y in range(n) for x in range(n)]
    return spark.createDataFrame(rows, "cell long, v_int long")


def test_geary_checkerboard_closed_form(spark):
    cells = _checkerboard(spark)
    w = cell_rook_weights(cells, 2)
    out = gearys_c(cells, w).collect()[0]
    # every rook link joins 0<->10: num = S0*100; sum(x-mean)^2 = 16*25
    # C = 15*S0*100 / (2*S0*400) = 1.875
    assert out.n_cells == 16
    assert out.n_links == 32 + 24  # x-wrap horizontals + clamped verticals
    assert out.geary_e6 == 1875000


def test_geary_partitioning_invariance(spark):
    cells = _checkerboard(spark, res=3)
    w = cell_rook_weights(cells, 3)
    a = gearys_c(cells, w).collect()[0]
    b = gearys_c(cells.repartition(7), w.repartition(3)).collect()[0]
    assert a == b


def test_join_counts_checkerboard_all_bw(spark):
    cells = _checkerboard(spark)
    w = cell_rook_weights(cells, 2)
    out = join_counts(cells, w, threshold=5).collect()[0]
    assert (out.n_cells, out.n_black) == (16, 8)
    assert (out.bb, out.ww) == (0, 0)
    assert out.bw == 56 // 2


def test_join_counts_all_black(spark):
    cells = _checkerboard(spark).withColumn("v_int", F.lit(9))
    w = cell_rook_weights(cells, 2)
    out = join_counts(cells, w, threshold=1).collect()[0]
    assert (out.bb, out.ww, out.bw) == (56 // 2, 0, 0)
    assert out.n_black == 16


def test_std_ellipse_degenerate_line(spark):
    from gaia_spark.operators.stats import std_ellipse

    # collinear on y = x: sigma2 = 0, theta = pi/4, sigma1 = sqrt(16/3)
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, 2.0, 2.0), (1, 4.0, 4.0)], "g int, lat double, lon double"
    )
    out = std_ellipse(pts, "g").collect()[0]
    assert out.n == 3
    assert (out.mx_e4, out.my_e4) == (20000, 20000)
    assert out.sigma2_e4 == 0
    assert out.theta_e4 == 7854  # pi/4
    assert out.sigma1_e4 == 23094  # sqrt(16/3)


def test_std_ellipse_axis_aligned(spark):
    from gaia_spark.operators.stats import std_ellipse

    # wide in lon (x), narrow in lat (y): theta = 0, sigma1 > sigma2
    pts = spark.createDataFrame(
        [(7, 0.0, -3.0), (7, 0.0, 3.0), (7, 1.0, 0.0), (7, -1.0, 0.0)],
        "g int, lat double, lon double",
    )
    out = std_ellipse(pts, "g").collect()[0]
    assert out.theta_e4 == 0
    # lam1 = mean(x^2) = 18/4, lam2 = 2/4
    assert out.sigma1_e4 == 21213  # sqrt(4.5)
    assert out.sigma2_e4 == 7071  # sqrt(0.5)


def test_std_ellipse_partitioning_invariance(spark):
    from gaia_spark.operators.stats import std_ellipse
    from gaia_spark.queries import customer_points

    pts = customer_points(spark, "/root/testdata/sf0.001")
    a = sorted(std_ellipse(pts, "c_nationkey").collect())
    b = sorted(std_ellipse(pts.repartition(13), "c_nationkey").collect())
    assert a == b


def test_mann_kendall_closed_forms(spark):
    import math

    from gaia_spark.operators.stats import mann_kendall

    rows = []
    rows += [("inc", b, b + 1) for b in range(10)]          # strictly rising
    rows += [("dec", b, 20 - b) for b in range(10)]         # strictly falling
    rows += [("flat", b, 7) for b in range(10)]             # constant: all ties
    rows += [("spike", 5, 3)]                               # densified zeros
    df = spark.createDataFrame(rows, "cell string, b int, x long")
    out = {r.cell: r for r in mann_kendall(df, 10).collect()}

    z45 = int(math.floor(44 * math.sqrt(18) / math.sqrt(2250) * 1e4 + 0.5))
    assert (out["inc"].s_stat, out["inc"].var18) == (45, 2250)
    assert out["inc"].z_e4 == z45 and out["inc"].trend == "increasing"
    assert (out["dec"].s_stat, out["dec"].z_e4) == (-45, int(
        math.floor(-44 * math.sqrt(18) / math.sqrt(2250) * 1e4 + 0.5)
    ))
    assert out["dec"].trend == "decreasing"
    # constant: S = 0 and the tie correction zeroes the variance
    assert (out["flat"].s_stat, out["flat"].var18, out["flat"].z_e4) == (0, 0, 0)
    assert out["flat"].trend == "no trend"
    # single spike at b=5 over densified zeros: 5 rises, 4 falls;
    # tie group of nine zeros: var18 = 2250 - 9*8*(2*9+5) = 594
    assert (out["spike"].s_stat, out["spike"].var18) == (1, 594)
    assert out["spike"].z_e4 == 0 and out["spike"].trend == "no trend"


def test_mann_kendall_partitioning_invariance(spark):
    from gaia_spark.operators.stats import mann_kendall

    rows = [(c, b, (c * 7 + b * b) % 5) for c in range(20) for b in range(10) if b % 3]
    df = spark.createDataFrame(rows, "cell int, b int, x long")
    a = sorted(map(tuple, mann_kendall(df, 10).collect()))
    b = sorted(map(tuple, mann_kendall(df.repartition(9), 10).collect()))
    assert a == b


def test_median_center_symmetric_fixpoint(spark):
    from gaia_spark.operators.stats import median_center

    # symmetric square: the centroid is the exact Weiszfeld fixpoint
    pts = spark.createDataFrame(
        [(1, 1.0, 0.0), (1, -1.0, 0.0), (1, 0.0, 1.0), (1, 0.0, -1.0)],
        "g int, lat double, lon double",
    )
    out = median_center(pts, "g", iters=3).collect()[0]
    assert (out.mx_e6, out.my_e6, out.n) == (0, 0, 4)


def test_median_center_robust_to_outlier(spark):
    from gaia_spark.operators.stats import median_center

    rows = [(1, 0.0, 0.0), (1, 0.001, 0.0), (1, -0.001, 0.0), (1, 50.0, 50.0)]
    pts = spark.createDataFrame(rows, "g int, lat double, lon double")
    out = median_center(pts, "g", iters=3).collect()[0]
    # mean sits at ~(12.5, 12.5); the median walks toward the cluster
    assert abs(out.mx_e6) < 3_000_000 and abs(out.my_e6) < 3_000_000


def test_median_center_identical_points_keep_center(spark):
    from gaia_spark.operators.stats import median_center

    pts = spark.createDataFrame(
        [(9, 4.25, -7.5)] * 5, "g int, lat double, lon double"
    )
    out = median_center(pts, "g", iters=3).collect()[0]
    assert (out.mx_e6, out.my_e6) == (-7_500_000, 4_250_000)


def test_median_center_partitioning_invariance(spark):
    from gaia_spark.operators.stats import median_center
    from gaia_spark.queries import customer_points

    pts = customer_points(spark, "/root/testdata/sf0.001")
    a = sorted(map(tuple, median_center(pts, "c_nationkey").collect()))
    b = sorted(map(tuple, median_center(pts.repartition(11), "c_nationkey").collect()))
    assert a == b


def test_quadrat_closed_forms(spark):
    from gaia_spark.operators.stats import quadrat_test

    # 4 points in 4 distinct res-1 quadrats (m=4): ΣO²=4, chi² = (16-16)/4 = 0
    pts = spark.createDataFrame(
        [(-45.0, -90.0), (-45.0, 90.0), (45.0, -90.0), (45.0, 90.0)],
        "lat double, lon double",
    )
    out = quadrat_test(pts, res=1).collect()[0]
    assert (out.m_quadrats, out.n_points, out.sum_sq) == (4, 4, 4)
    assert (out.chi2_e6, out.vmr_e6) == (0, 0)

    # all 4 points in ONE quadrat: chi2 = (4*16 - 16)/4 = 12, vmr = 4
    clustered = spark.createDataFrame(
        [(10.0, 10.0), (11.0, 11.0), (12.0, 12.0), (13.0, 13.0)],
        "lat double, lon double",
    )
    out = quadrat_test(clustered, res=1).collect()[0]
    assert (out.chi2_e6, out.vmr_e6) == (12_000_000, 4_000_000)


def test_emerging_hotspots_closed_form(spark):
    import math

    from gaia_spark.operators.stats import emerging_hotspots

    # path graph 0 - 1 - 2; hotspot emerges at cell 0 from bucket 5 on.
    # Per active bucket b >= 5: values (b, 0, 0), mean b/3, S = b*sqrt(2)/3:
    #   cell 0 (wi=2): gz = (b/3) / (S*1)  = 1/sqrt(2)   (scale-free)
    #   cell 1 (wi=3): gz = (b - b) / den  = 0
    #   cell 2 (wi=2): gz = -(2b/3) / S    = -sqrt(2)
    # so each gz series is five 0s then five equal values: S = +-25,
    # var18 = 2250 - 2*5*4*15 = 1650, z = 24*sqrt(18)/sqrt(1650) = 2.5…
    vals = spark.createDataFrame(
        [(0, b, b) for b in range(5, 10)], "cell long, b int, x long"
    )
    w = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "cell long, neighbor long"
    )
    grid = spark.createDataFrame([(0,), (1,), (2,)], "cell long")
    out = {
        r.cell: r
        for r in emerging_hotspots(
            vals.unionByName(grid.selectExpr("cell", "0 as b", "0 as x")),
            w,
            n_buckets=10,
        ).collect()
    }
    z = int(math.floor(24 * math.sqrt(18) / math.sqrt(1650) * 1e4 + 0.5))
    assert (out[0].s_stat, out[0].var18, out[0].z_e4) == (25, 1650, z)
    assert (out[0].trend, out[0].category) == ("increasing", "intensifying hot")
    assert out[0].sum_gz_e6 == 5 * 707107
    assert (out[1].s_stat, out[1].var18, out[1].z_e4) == (0, 0, 0)
    assert (out[1].trend, out[1].category) == ("no trend", "no pattern")
    assert (out[2].s_stat, out[2].var18, out[2].z_e4) == (-25, 1650, -z)
    assert (out[2].trend, out[2].category) == ("decreasing", "intensifying cold")
    assert out[2].sum_gz_e6 == 5 * -1414214


def test_emerging_hotspots_partitioning_invariance(spark):
    from gaia_spark.operators.stats import cell_rook_weights, emerging_hotspots

    rows = [
        ((c % 16) + 16 * (c % 13), b, (c * 7 + b * b) % 5)
        for c in range(40)
        for b in range(10)
        if (c + b) % 3
    ]
    df = spark.createDataFrame(rows, "cell long, b int, x long").distinct()
    w = cell_rook_weights(df, res=4)
    a = sorted(map(tuple, emerging_hotspots(df, w, 10).collect()))
    b = sorted(map(tuple, emerging_hotspots(df.repartition(9), w, 10).collect()))
    assert a == b


def test_theil_sen_linear_and_outlier(spark):
    from gaia_spark.operators.stats import theil_sen

    # key 1: exact line x = 3b + 2 -> slope 3; key 2: same line with one
    # wild outlier bucket -> Theil-Sen still 3 (robustness), key 3: flat
    rows = [(1, b, 3 * b + 2) for b in range(10)]
    rows += [(2, b, 3 * b + 2 if b != 4 else 1000) for b in range(10)]
    rows += [(3, b, 7) for b in range(10)]
    df = spark.createDataFrame(rows, "cell long, b long, x long")
    out = {r.cell: r for r in theil_sen(df, n_buckets=10).collect()}
    assert out[1].slope_e6 == 3_000_000
    assert out[2].slope_e6 == 3_000_000
    assert out[3].slope_e6 == 0
    assert out[1].n_pairs == 45


def test_theil_sen_negative_slope_floor(spark):
    from gaia_spark.operators.stats import theil_sen

    # descending line x = -2b: slope exactly -2 (negative floor-division
    # path must not truncate toward zero)
    rows = [(9, b, -2 * b) for b in range(10)]
    df = spark.createDataFrame(rows, "cell long, b long, x long")
    r = theil_sen(df, n_buckets=10).collect()[0]
    assert r.slope_e6 == -2_000_000
