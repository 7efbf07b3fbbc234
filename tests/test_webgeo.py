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


# --- toponym disambiguation family -------------------------------------------


def _mentions(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, word string")


def test_disambig_single_mention_takes_population_prior(spark):
    # a document with ONE mention has its anchor AT the stage-1 pick, so
    # stage 2 must return exactly the max-population sense (distance 0)
    from gaia_spark.operators.geotext import disambiguate_toponyms, gazetteer

    m = _mentions(spark, [(1, "alpha"), (2, "bravo")])
    res = {r["word"]: r for r in disambiguate_toponyms(m).collect()}
    gaz = gazetteer(m.select("word").distinct()).collect()
    best = {}
    for g in gaz:
        k = g["word"]
        if k not in best or (g["pop"], g["cand"]) > (best[k]["pop"], best[k]["cand"]):
            best[k] = g
    assert len(res) == 2
    for w in ("alpha", "bravo"):
        assert res[w]["cand_id"] == best[w]["cand"]
        assert res[w]["d_anchor_mm"] == 0


def test_disambig_resolves_to_a_registered_sense(spark):
    from gaia_spark.operators.geotext import disambiguate_toponyms, gazetteer

    m = _mentions(
        spark,
        [(d, w) for d in range(1, 4) for w in ("alpha", "bravo", "charlie", "delta")],
    )
    res = disambiguate_toponyms(m).collect()
    senses = {
        (g["word"], g["cand"])
        for g in gazetteer(m.select("word").distinct()).collect()
    }
    assert len(res) == 12
    for r in res:
        assert (r["word"], r["cand_id"]) in senses


def test_geo_focus_single_place_is_local_radius_zero(spark):
    from gaia_spark.operators.geotext import disambiguate_toponyms, geo_focus

    m = _mentions(spark, [(7, "alpha")])
    out = geo_focus(disambiguate_toponyms(m)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_places"], r["radius_deg_e6"], r["focus"]) == (1, 0, "local")


def test_place_comentions_counts(spark):
    # brute-force replica: edges are SENSE-level (the same word can resolve
    # to different senses in different docs), so derive the expected edge
    # set from the resolved rows themselves and check counts + exact lift
    import math
    from collections import Counter

    from gaia_spark.operators.geotext import disambiguate_toponyms, place_comentions

    m = _mentions(
        spark,
        [(d, w) for d in range(1, 6) for w in ("alpha", "bravo", "charlie")]
        + [(6, "alpha"), (7, "alpha"), (7, "bravo")],
    )
    resolved = disambiguate_toponyms(m)
    rows = resolved.collect()
    n_docs = len({r["doc_id"] for r in rows})
    per = Counter((r["word"], r["cand_id"]) for r in rows)
    edges = Counter()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rs in by_doc.values():
        for a in rs:
            for b in rs:
                if a["word"] < b["word"]:
                    edges[(a["word"], a["cand_id"], b["word"], b["cand_id"])] += 1
    expected = {
        k: v for k, v in edges.items() if v >= 2
    }
    out = place_comentions(resolved, min_pairs=2).collect()
    got = {(e["word_a"], e["cand_a"], e["word_b"], e["cand_b"]): e for e in out}
    assert set(got) == set(expected)
    for k, e in got.items():
        n_ab = expected[k]
        n_a, n_b = per[(k[0], k[1])], per[(k[2], k[3])]
        lift = n_ab * n_docs / (n_a * n_b)
        assert e["n_ab"] == n_ab
        assert e["lift_e6"] == math.floor(lift * 1e6 + 0.5)
        assert e["dist_m"] >= 0
