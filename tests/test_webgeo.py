"""Closed-form checks for the web×geo tranche: cross-track distance
(equator fixtures), Chaikin smoothing (exact integer refinement of a
right angle), URL templates (hand fixture)."""

import pyspark.sql.functions as F

from gaia_spark.functions import portable as P
from gaia_spark.functions import web as W


def _one(spark, select_sql: str):
    return spark.sql(f"SELECT {select_sql}").collect()[0][0]


def test_cross_track_equator_closed_form(spark):
    # route along the equator A=(0,0) -> B=(0,10): a point at lat d deg,
    # lon 5 has |cross-track| = R*radians(d) — north of an eastward route
    # is port/left, hence NEGATIVE under the standard navigation sign —
    # and along-track = R*radians(5) exactly on the sphere
    xt, at = P.cross_track_sqls(
        "cast(2 as double)", "cast(5 as double)",
        "cast(0 as double)", "cast(0 as double)",
        "cast(0 as double)", "cast(10 as double)",
    )
    import math

    R = P.EARTH_RADIUS_M
    assert abs(_one(spark, xt) + R * math.radians(2)) < 1e-3
    assert abs(_one(spark, at) - R * math.radians(5)) < 1e-3
    # south of the route -> starboard -> positive cross-track, same along-track
    xt2, at2 = P.cross_track_sqls(
        "cast(-2 as double)", "cast(5 as double)",
        "cast(0 as double)", "cast(0 as double)",
        "cast(0 as double)", "cast(10 as double)",
    )
    assert abs(_one(spark, xt2) - R * math.radians(2)) < 1e-3
    assert abs(_one(spark, at2) - R * math.radians(5)) < 1e-3
    # behind the start -> negative along-track
    _, at3 = P.cross_track_sqls(
        "cast(0 as double)", "cast(-3 as double)",
        "cast(0 as double)", "cast(0 as double)",
        "cast(0 as double)", "cast(10 as double)",
    )
    assert abs(_one(spark, at3) + R * math.radians(3)) < 1e-3


def test_chaikin_right_angle_exact_values(spark):
    # open polyline (0,0) (4,0) (4,4): one round must give the classic
    # quarter-point refinement exactly, carried at x4 scale
    from gaia_spark.operators.trajectory import chaikin_round

    df = spark.createDataFrame(
        [(1, 0, 0, 0), (1, 1, 4, 0), (1, 2, 4, 4)],
        "user_id int, ord int, x long, y long",
    )
    rows = {
        r["ord"]: (r["x"], r["y"])
        for r in chaikin_round(df, key="user_id").collect()
    }
    assert rows == {
        0: (0, 0),     # endpoint kept, x4
        1: (4, 0),     # 3*(0,0) + (4,0)
        2: (12, 0),    # (0,0) + 3*(4,0)
        3: (16, 4),    # 3*(4,0) + (4,4)
        4: (16, 12),   # (4,0) + 3*(4,4)
        5: (16, 16),   # endpoint kept, x4
    }


def test_chaikin_two_rounds_scale_and_count(spark):
    from gaia_spark.operators.trajectory import chaikin_smooth

    df = spark.createDataFrame(
        [(1, i, i * 10, (i * i) % 7) for i in range(5)],
        "user_id int, ord int, x long, y long",
    )
    out = chaikin_smooth(df, rounds=2, key="user_id").collect()
    # n -> 2n per round: 5 -> 10 -> 20 vertices, contiguous ords
    assert sorted(r["ord"] for r in out) == list(range(20))
    # endpoints preserved at 16x scale
    by = {r["ord"]: r for r in out}
    assert (by[0]["x"], by[0]["y"]) == (0, 0)
    assert (by[19]["x"], by[19]["y"]) == (40 * 16, 2 * 16)


def test_url_template_sql(spark):
    tpl = W.url_template_sql("url", P.SPARK)
    df = spark.createDataFrame(
        [
            ("https://a.example/p/123/view?q=9#f",),
            ("https://a.example/p/9/view",),
            ("https://a.example",),
        ],
        "url string",
    ).select(F.expr(tpl).alias("t"))
    got = [r["t"] for r in df.collect()]
    assert got == ["/p/{n}/view", "/p/{n}/view", "/"]
