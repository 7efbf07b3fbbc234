"""Vincenty direct (WGS84) closed-form evidence.

The equator is a geodesic of the ellipsoid with circumference 2πa, so
az=90 from lat=0 must land at lon + degrees(s/a) EXACTLY (the series
collapses: u²=0, A=1, B=0, L = σ(1−f) = s/a). The meridian case is
checked against an independent numpy quadrature of the meridian arc
integral. The spherical destination must agree to ~0.5% — and the
ellipsoidal answer must be CLOSER to the meridian integral than the
spherical one is (the accuracy win the operator exists for).
"""

import math

import numpy as np
import pytest

from gaia_spark.functions.portable import WGS84_A, WGS84_F, vincenty_direct_steps


def _vd(spark, lat, lon, az, dist):
    df = spark.sql(
        f"SELECT cast({lat} as double) AS lat, cast({lon} as double) AS lon, "
        f"cast({az} as double) AS brg, cast({dist} as double) AS dist"
    )
    for name, expr in vincenty_direct_steps("lat", "lon", "brg", "dist"):
        df = df.selectExpr("*", f"{expr} AS {name}")
    r = df.select("_vd_lat2", "_vd_lon2").collect()[0]
    return r["_vd_lat2"], r["_vd_lon2"]


def _meridian_arc(phi_deg):
    """Meridian distance from the equator to latitude phi by quadrature."""
    e2 = WGS84_F * (2 - WGS84_F)
    phis = np.linspace(0.0, math.radians(phi_deg), 200001)
    integrand = (1 - e2) / np.power(1 - e2 * np.sin(phis) ** 2, 1.5)
    return WGS84_A * np.trapz(integrand, phis)


def test_equator_exact(spark):
    s = 1_000_000.0
    lat2, lon2 = _vd(spark, 0.0, 10.0, 90.0, s)
    assert abs(lat2) < 1e-9
    assert abs(lon2 - (10.0 + math.degrees(s / WGS84_A))) < 1e-9


def test_meridian_vs_quadrature(spark):
    lat2, lon2 = _vd(spark, 0.0, 25.0, 0.0, 2_000_000.0)
    assert abs(lon2 - 25.0) < 1e-9
    # invert: the arc to lat2 must equal the requested distance (sub-mm)
    assert abs(_meridian_arc(lat2) - 2_000_000.0) < 1e-3


def test_beats_spherical_on_meridian(spark):
    import pyspark.sql.functions as F

    from gaia_spark.functions import portable as P

    s = 2_000_000.0
    lat_e, _ = _vd(spark, 0.0, 25.0, 0.0, s)
    lat_s_sql, _ = P.destination_sqls("cast(0.0 as double)", "cast(25.0 as double)",
                                      "cast(0.0 as double)", f"cast({s} as double)")
    lat_s = spark.range(1).select(F.expr(lat_s_sql).alias("x")).collect()[0]["x"]
    err_e = abs(_meridian_arc(lat_e) - s)
    err_s = abs(_meridian_arc(lat_s) - s)
    assert err_e < 1e-3                      # ellipsoidal: sub-mm
    assert err_s > 1000.0                    # spherical: ~km-scale off on WGS84
    assert err_e < err_s / 1e6


@pytest.mark.parametrize("lat,az,dist", [(47.3, 61.0, 1_500_000.0), (-33.9, 200.0, 800_000.0)])
def test_roundtrip_against_spherical_tolerance(spark, lat, az, dist):
    """General-position sanity: ellipsoidal and spherical destinations agree
    to the documented ~0.5% of distance."""
    import pyspark.sql.functions as F

    from gaia_spark.functions import portable as P

    lat_e, lon_e = _vd(spark, lat, 5.0, az, dist)
    la_sql, lo_sql = P.destination_sqls(f"cast({lat} as double)", "cast(5.0 as double)",
                                        f"cast({az} as double)", f"cast({dist} as double)")
    r = spark.range(1).select(F.expr(la_sql).alias("la"), F.expr(lo_sql).alias("lo")).collect()[0]
    sep_m = dist * 0.005
    deg = sep_m / 111_000.0
    assert abs(lat_e - r["la"]) < deg and abs(lon_e - r["lo"]) < deg / math.cos(math.radians(lat))


def test_inverse_equator_exact(spark):
    import pyspark.sql.functions as F

    from gaia_spark.functions.portable import vincenty_inverse_steps

    df = spark.sql(
        "SELECT cast(0.0 as double) AS a1, cast(10.0 as double) AS o1, "
        "cast(0.0 as double) AS a2, cast(19.0 as double) AS o2"
    )
    for name, expr in vincenty_inverse_steps("a1", "o1", "a2", "o2"):
        df = df.selectExpr("*", f"{expr} AS {name}")
    d = df.select("_vi_dist_m").collect()[0][0]
    assert abs(d - WGS84_A * math.radians(9.0)) < 1e-6


def test_inverse_roundtrips_direct(spark):
    """direct(p, az, s) then inverse(p, dest) must return s (sub-mm)."""
    from gaia_spark.functions.portable import vincenty_inverse_steps

    for lat, az, s in [(47.3, 61.0, 1_500_000.0), (-33.9, 200.0, 800_000.0),
                       (5.0, 123.0, 2_500_000.0)]:
        lat2, lon2 = _vd(spark, lat, 5.0, az, s)
        df = spark.sql(
            f"SELECT cast({lat} as double) AS a1, cast(5.0 as double) AS o1, "
            f"cast({lat2} as double) AS a2, cast({lon2} as double) AS o2"
        )
        for name, expr in vincenty_inverse_steps("a1", "o1", "a2", "o2"):
            df = df.selectExpr("*", f"{expr} AS {name}")
        d = df.select("_vi_dist_m").collect()[0][0]
        assert abs(d - s) < 1e-3, (lat, az, s, d)


def test_inverse_coincident_zero(spark):
    from gaia_spark.functions.portable import vincenty_inverse_steps

    df = spark.sql(
        "SELECT cast(12.5 as double) AS a1, cast(-7.0 as double) AS o1, "
        "cast(12.5 as double) AS a2, cast(-7.0 as double) AS o2"
    )
    for name, expr in vincenty_inverse_steps("a1", "o1", "a2", "o2"):
        df = df.selectExpr("*", f"{expr} AS {name}")
    assert df.select("_vi_dist_m").collect()[0][0] == 0.0


def test_chain_length_ellipsoid_multi_vertex(spark):
    """3-vertex chain = sum of the two per-edge Vincenty distances, and the
    mm-quantized bigint sum is what the engine aggregates (order-free)."""
    import pyspark.sql.functions as F

    from gaia_spark.functions import portable as P

    def inv(a1, o1, a2, o2):
        df = spark.sql(
            f"SELECT cast({a1} as double) AS a1, cast({o1} as double) AS o1, "
            f"cast({a2} as double) AS a2, cast({o2} as double) AS o2"
        )
        for name, expr in P.vincenty_inverse_steps("a1", "o1", "a2", "o2"):
            df = df.selectExpr("*", f"{expr} AS {name}")
        return df.select("_vi_dist_m").collect()[0][0]

    ring = (
        "array(struct(cast(10.0 as double) AS lat, cast(5.0 as double) AS lon), "
        "struct(cast(12.0 as double) AS lat, cast(7.5 as double) AS lon), "
        "struct(cast(12.0 as double) AS lat, cast(11.0 as double) AS lon))"
    )
    pairs = (
        f"zip_with(slice({ring}, 1, size({ring}) - 1), slice({ring}, 2, size({ring}) - 1), "
        "(a, b) -> struct(a.lat AS lat1, a.lon AS lon1, b.lat AS lat2, b.lon AS lon2))"
    )
    edges = spark.range(1).select(F.posexplode(F.expr(pairs)).alias("_i", "e")).select(
        "e.lat1", "e.lon1", "e.lat2", "e.lon2"
    )
    for name, expr in P.vincenty_inverse_steps("lat1", "lon1", "lat2", "lon2"):
        edges = edges.selectExpr("*", f"{expr} AS {name}")
    total_mm = edges.select(
        F.sum(F.expr(P.floor_scaled_sql("_vi_dist_m", 3))).alias("t")
    ).collect()[0]["t"]
    want = inv(10.0, 5.0, 12.0, 7.5) + inv(12.0, 7.5, 12.0, 11.0)
    assert abs(total_mm / 1000.0 - want) < 0.002  # two floor(+0.5) quantizations
