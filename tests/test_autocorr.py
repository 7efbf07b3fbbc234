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
