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


# --- readability / zipf / containment -----------------------------------------


def test_readability_hand_fixture(spark):
    # "the cat runs" -> 3 words, syllables: the(1) cat(1) runs(1) = 3,
    # 1 pseudo-sentence; wps=3, spw=1
    import math

    from gaia_spark.queries_webgeo import _readability_exprs

    e = _readability_exprs("spark")
    df = spark.createDataFrame([(1, "the cat runs"), (2, "zzz qqq")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in df.selectExpr(
        "doc_id",
        f"{e['n_words']} as n_words",
        f"{e['n_syllables']} as n_syllables",
        f"{e['n_sentences']} as n_sentences",
        f"{e['fk_ease_e3']} as fk_ease_e3",
    ).collect()}
    assert (rows[1]["n_words"], rows[1]["n_syllables"], rows[1]["n_sentences"]) == (3, 3, 1)
    fk = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert rows[1]["fk_ease_e3"] == math.floor(fk * 1e3 + 0.5)
    # vowelless words still carry one syllable each
    assert (rows[2]["n_words"], rows[2]["n_syllables"]) == (2, 2)


def test_zipf_exact_power_law(spark):
    # freq(rank r) = 1000 // r**2 sampled at ranks 1..5 -> slope approx -2
    import math

    from gaia_spark.queries_webgeo import q_zipf  # noqa: F401  (module import)
    from gaia_spark.functions import portable as P

    # replicate the moment algebra in python on the quantized logs
    freqs = sorted([1000 // (r * r) for r in range(1, 6)], reverse=True)
    xs = [math.floor(math.log(r) * 1e6 + 0.5) for r in range(1, 6)]
    ys = [math.floor(math.log(f) * 1e6 + 0.5) for f in freqs]
    m = 5
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert abs(slope + 2.0) < 0.1  # sanity of the fixture itself
    # engine replay over a corpus that produces exactly these frequencies
    words = []
    for r, f in enumerate(freqs, start=1):
        words += [f"w{r}"] * f
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    import gaia_spark.queries_webgeo as WG

    toks = df.select(F.explode(F.expr(P.split_ws("text", P.SPARK))).alias("word"))
    freq = toks.groupBy("word").agg(F.count("*").alias("n"))
    from pyspark.sql import Window as SWindow

    rk = freq.withColumn(
        "rank", F.row_number().over(SWindow.orderBy(F.desc("n"), F.asc("word")))
    )
    got = {r["rank"]: r["n"] for r in rk.collect()}
    assert got == {r: f for r, f in enumerate(freqs, start=1)}


def test_containment_excerpt_direction(spark):
    # doc 2 is a strict excerpt of doc 1: containment(2 in 1 direction)
    # must be 1.0 for the excerpt side and < 1.0 for the source side
    from gaia_spark.operators.dedup import containment_pairs

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    excerpt = "charlie delta echo foxtrot golf"
    df = spark.createDataFrame(
        [(1, base), (2, excerpt), (3, "unrelated words only here nothing shared")],
        "doc_id long, text string",
    )
    out = {(r["doc_a"], r["doc_b"]): r for r in
           containment_pairs(df, k=3, min_df=2, max_df=8).collect()}
    assert set(out) == {(1, 2)}
    e = out[(1, 2)]
    # doc1 has 8 shingles, doc2 has 3, all 3 shared
    assert (e["n_a"], e["n_b"], e["inter"]) == (8, 3, 3)
    assert e["cont_ba_e6"] == 1_000_000      # excerpt fully contained
    assert e["cont_ab_e6"] == 375_000        # 3/8


# --- map matching --------------------------------------------------------------


def test_map_match_brute_force_parity(spark):
    # exhaustive path enumeration over the candidate lattice must agree
    # with the Viterbi decode (cost AND path, incl. the tie-break order)
    from itertools import product

    from gaia_spark.operators.trajectory import map_match
    from gaia_spark.queries_webgeo import _mm_roads

    pts = spark.createDataFrame(
        [(1, s, 0.5 + 2.1 * s, 0.4 + 1.3 * s) for s in range(5)]
        + [(2, 0, -33.0, 77.0)],
        "user_id long, seq long, lat double, lon double",
    )
    roads = _mm_roads(spark)
    out = map_match(pts, roads, n_cand=3, switch_penalty_e3=50_000_000)
    got = {}
    for r in out.collect():
        got.setdefault(r["user_id"], {})[r["seq"]] = (
            r["road_id"], r["emis_e3"], r["total_cost_e3"]
        )

    # rebuild the lattice + transitions exactly as the operator does, then
    # brute-force all 3^n paths
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    from gaia_spark.functions import portable as P
    from gaia_spark.operators.snap import snap_point_sql, snap_t_sql

    t = snap_t_sql("lat", "lon", "y1", "x1", "y2", "x2")
    sy, sx = snap_point_sql("_t", "y1", "x1", "y2", "x2")
    cand = (
        pts.crossJoin(F.broadcast(roads))
        .withColumn("_t", F.expr(t))
        .select(
            "user_id", "seq", "road_id",
            F.expr(P.floor_scaled_sql(
                P.haversine_m_sql("lat", "lon", sy, sx), 3)).alias("emis_e3"),
            F.expr(P.floor_scaled_sql(sy, 6)).alias("plat_e6"),
            F.expr(P.floor_scaled_sql(sx, 6)).alias("plon_e6"),
        )
    )
    wk = Window.partitionBy("user_id", "seq").orderBy("emis_e3", "road_id")
    lat_rows = cand.withColumn("k", F.row_number().over(wk)) \
                   .filter(F.col("k") <= 3).collect()
    import math

    def hav(a, b, c, d):
        R = P.EARTH_RADIUS_M
        return 2 * R * math.asin(math.sqrt(
            math.sin((math.radians(c) - math.radians(a)) / 2) ** 2
            + math.cos(math.radians(a)) * math.cos(math.radians(c))
            * math.sin((math.radians(d) - math.radians(b)) / 2) ** 2))

    for uid in (1, 2):
        rows = [r for r in lat_rows if r["user_id"] == uid]
        seqs = sorted({r["seq"] for r in rows})
        by = {s: sorted([r for r in rows if r["seq"] == s],
                        key=lambda r: r["k"]) for s in seqs}
        best = None
        for combo in product(*[by[s] for s in seqs]):
            cost = sum(r["emis_e3"] for r in combo)
            for a, b in zip(combo, combo[1:]):
                if a["road_id"] != b["road_id"]:
                    g = hav(a["plat_e6"] / 1e6, a["plon_e6"] / 1e6,
                            b["plat_e6"] / 1e6, b["plon_e6"] / 1e6)
                    cost += 50_000_000 + math.floor(g * 1000 + 0.5)
            key = (cost, "|".join(f"{r['road_id']:03d}" for r in combo))
            if best is None or key < best:
                best = key
        roads_best = [int(x) for x in best[1].split("|")]
        assert [got[uid][s][0] for s in seqs] == roads_best
        assert got[uid][seqs[0]][2] == best[0]


def test_map_match_straight_line_keeps_one_road(spark):
    # points marching along a single meridian road must never switch
    from gaia_spark.operators.trajectory import map_match
    from gaia_spark.queries_webgeo import _mm_roads

    pts = spark.createDataFrame(
        [(9, s, -10.0 + 3.0 * s, 5.2) for s in range(6)],
        "user_id long, seq long, lat double, lon double",
    )
    out = map_match(pts, _mm_roads(spark), n_cand=3).collect()
    assert len(out) == 6
    assert len({r["road_id"] for r in out}) == 1


# --- clickstream trio ----------------------------------------------------------


def _events(spark, rows):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    data = [
        (eid, base + datetime.timedelta(minutes=m), u, t)
        for eid, m, u, t in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )


def test_funnel_strict_order(spark):
    # user 1 completes the funnel; user 2 clicks BEFORE viewing (click
    # must not count); user 3 views only
    import gaia_spark.queries_webgeo as WG

    e = _events(spark, [
        (1, 0, 1, "view"), (2, 5, 1, "click"), (3, 9, 1, "purchase"),
        (4, 0, 2, "click"), (5, 5, 2, "view"),
        (6, 0, 3, "view"),
    ])
    e.createOrReplaceTempView("_f_events")

    # run the same stage logic via the registry function with a patched load
    import gaia_spark.queries as Q
    orig = Q.load
    try:
        Q.load = lambda s, d, n: e if n == "events" else orig(s, d, n)
        WG.load = Q.load
        out = {r["step"]: r for r in WG.q_funnel(spark, "unused").collect()}
    finally:
        Q.load = orig
        WG.load = orig
    assert (out[1]["n_users"], out[2]["n_users"], out[3]["n_users"]) == (3, 1, 1)
    assert out[2]["conv_e6"] == 333_333  # 1/3
    assert out[3]["conv_e6"] == 1_000_000


def test_markov_counts(spark):
    import gaia_spark.queries_webgeo as WG
    import gaia_spark.queries as Q

    e = _events(spark, [
        (1, 0, 1, "view"), (2, 1, 1, "click"), (3, 2, 1, "click"),
        (4, 0, 2, "view"), (5, 1, 2, "click"),
    ])
    orig = Q.load
    try:
        Q.load = lambda s, d, n: e
        WG.load = Q.load
        out = {(r["prev_type"], r["next_type"]): r
               for r in WG.q_markov(spark, "x").collect()}
    finally:
        Q.load = orig
        WG.load = orig
    assert out[("view", "click")]["n"] == 2
    assert out[("view", "click")]["p_e6"] == 1_000_000
    assert out[("click", "click")]["n"] == 1


def test_cohort_retention(spark):
    import datetime

    import gaia_spark.queries_webgeo as WG
    import gaia_spark.queries as Q

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # users 1,2 first active day 0; user 1 returns day 1; user 2 not
    for eid, d, u in [(1, 0, 1), (2, 0, 2), (3, 1, 1)]:
        rows.append((eid, base + datetime.timedelta(days=d), u, "view"))
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    orig = Q.load
    try:
        Q.load = lambda s, dd, n: e
        WG.load = Q.load
        out = {(r["cohort_day"], r["offset_d"]): r
               for r in WG.q_cohort(spark, "x").collect()}
    finally:
        Q.load = orig
        WG.load = orig
    d0 = (base - datetime.datetime(1970, 1, 1)).days
    assert out[(d0, 0)]["n_active"] == 2
    assert out[(d0, 0)]["retention_e6"] == 1_000_000
    assert out[(d0, 1)]["n_active"] == 1
    assert out[(d0, 1)]["retention_e6"] == 500_000


# --- gps outliers / session paths / heaps -------------------------------------


def test_gps_outlier_spike_flagged(spark):
    # interior teleport-and-back spike flagged; steady walk points are not
    import gaia_spark.queries as Q
    import gaia_spark.queries_webgeo as WG
    import datetime

    base = datetime.datetime(2024, 1, 1)
    # user walks ~100 m/min; event 2 teleports ~1000 km away and back
    rows = []
    for i, (la, lo) in enumerate([(10.0, 10.0), (10.001, 10.0),
                                  (19.0, 10.0), (10.003, 10.0),
                                  (10.004, 10.0)]):
        rows.append((i, base + datetime.timedelta(minutes=10 * i), 1, la, lo))
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "lat_fix double, lon_fix double",
    )
    # run the operator logic directly (fixture already has coordinates)
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    from gaia_spark.functions import portable as P

    fs = P.floor_scaled_sql
    pts = e.select(
        "user_id", "event_id",
        F.expr("cast(cast(ts as timestamp) as double)").alias("ep"),
        F.col("lat_fix").alias("lat"), F.col("lon_fix").alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    d = (pts.withColumn("prev_lat", F.lag("lat").over(w))
         .withColumn("prev_lon", F.lag("lon").over(w))
         .withColumn("prev_ep", F.lag("ep").over(w))
         .withColumn("next_lat", F.lead("lat").over(w))
         .withColumn("next_lon", F.lead("lon").over(w))
         .withColumn("next_ep", F.lead("ep").over(w)))
    d_in = P.haversine_m_sql("prev_lat", "prev_lon", "lat", "lon")
    d_out = P.haversine_m_sql("lat", "lon", "next_lat", "next_lon")
    s = d.select(
        "event_id",
        F.expr("CASE WHEN prev_lat IS NOT NULL AND ep - prev_ep > 0 THEN "
               + fs(f"(({d_in}) / (ep - prev_ep))", 3) + " END").alias("i"),
        F.expr("CASE WHEN next_lat IS NOT NULL AND next_ep - ep > 0 THEN "
               + fs(f"(({d_out}) / (next_ep - ep))", 3) + " END").alias("o"),
    ).withColumn("f", F.expr("i IS NOT NULL AND o IS NOT NULL "
                             "AND i > 50000 AND o > 50000"))
    got = {r["event_id"]: r["f"] for r in s.collect()}
    assert got == {0: False, 1: False, 2: True, 3: False, 4: False}


def test_session_path_order_deterministic(spark):
    # path must follow (ts, event_id) order even when rows arrive shuffled
    import datetime

    import gaia_spark.queries as Q
    import gaia_spark.queries_webgeo as WG

    base = datetime.datetime(2024, 1, 1)
    rows = [(3, base + datetime.timedelta(minutes=2), 1, "purchase"),
            (1, base, 1, "view"),
            (2, base + datetime.timedelta(minutes=1), 1, "click")]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    orig = WG.load
    try:
        WG.load = lambda s, d, n: e
        out = WG.q_session_paths(spark, "x").collect()
    finally:
        WG.load = orig
    assert len(out) == 1
    assert out[0]["path"] == "view>click>purchase"
    assert out[0]["n_sessions"] == 1


def test_heaps_vocab_monotone(spark):
    import gaia_spark.queries_webgeo as WG

    out = sorted(
        WG.q_heaps(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["cp_doc"],
    )
    assert len(out) >= 2
    toks = [r["tokens_cum"] for r in out]
    voc = [r["vocab_cum"] for r in out]
    assert toks == sorted(toks) and voc == sorted(voc)
    assert len({r["beta_e6"] for r in out}) == 1 and out[0]["beta_e6"] > 0


def test_network_topology_grid_closed_form(spark):
    # 17 h-roads x 36 v-roads: 612 interior crossings (degree 4), 106
    # endpoints (degree 1); edges = 17*37 + 36*18 = 1277
    from gaia_spark.operators.overlay import network_topology
    from gaia_spark.queries_webgeo import _mm_road_chains

    edges, nodes = network_topology(
        _mm_road_chains(spark), _mm_road_chains(spark), res=5
    )
    deg = {r["degree"]: r["n"] for r in
           nodes.groupBy("degree").agg(F.count("*").alias("n")).collect()}
    assert deg == {4: 612, 1: 106}
    assert edges.count() == 17 * 37 + 36 * 18


# --- crawl schedule / quantiles / centroids -----------------------------------


def test_crawl_schedule_slots(spark):
    import gaia_spark.queries_webgeo as WG

    out = WG.q_crawl_schedule(spark, "/root/testdata/sf0.001").collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    for rows in by_host.values():
        rows.sort(key=lambda r: r["rn"])
        # slots fill 4-at-a-time in url order
        for r in rows:
            assert r["slot"] == (r["rn"] - 1) // 4
        assert [r["url"] for r in rows] == sorted(r["url"] for r in rows)


def test_quantiles_exact_small(spark):
    # 1..10: lower-empirical-quantile picks (n-1)p floor + 1
    import gaia_spark.queries as Q
    import gaia_spark.queries_webgeo as WG
    import datetime

    base = datetime.datetime(2024, 1, 1)
    e = spark.createDataFrame(
        [(i, base, 1, "click", float(i), "{}") for i in range(1, 11)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    orig = WG.load
    try:
        WG.load = lambda s, d, n: e
        out = WG.q_quantiles(spark, "x").collect()
    finally:
        WG.load = orig
    assert len(out) == 1
    r = out[0]
    # n=10: p50 -> rank 5 (value 5), p90 -> rank 9, p99 -> rank 9
    assert (r["n"], r["p50_e2"], r["p90_e2"], r["p99_e2"]) == (10, 500, 900, 900)


def test_embed_centroid_cosine_bounds(spark):
    import gaia_spark.queries_webgeo as WG

    out = WG.q_embed_centroids(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 45  # C(10,2) label pairs
    for r in out:
        assert -1_000_001 <= r["cos_e6"] <= 1_000_001
        assert r["n_a"] > 0 and r["n_b"] > 0


def test_projection_family_equal_area(spark):
    # all three projections are EQUAL-AREA: the projected shoelace area of
    # a densely-sampled spherical rect must match R^2 * dlon * dsinlat
    import math

    from gaia_spark.functions import crs as C

    la0, la1, lo0, lo1 = 35.0, 42.0, 5.0, 15.0
    ring = []
    n = 120
    for i in range(n):
        ring.append((la0, lo0 + (lo1 - lo0) * i / n))
    for i in range(n):
        ring.append((la0 + (la1 - la0) * i / n, lo1))
    for i in range(n):
        ring.append((la1, lo1 - (lo1 - lo0) * i / n))
    for i in range(n):
        ring.append((la1 - (la1 - la0) * i / n, lo0))
    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(ring)],
        "i int, lat double, lon double",
    )
    truth = (
        C.PROJ_R ** 2
        * math.radians(lo1 - lo0)
        * (math.sin(math.radians(la1)) - math.sin(math.radians(la0)))
    )
    for name, (xs, ys) in {
        "laea": C.laea_xy_sql("lat", "lon", 40.0, 10.0),
        "sinu": C.sinusoidal_xy_sql("lat", "lon", 0.0),
        "albers": C.albers_xy_sql("lat", "lon", 23.0, -96.0, 29.5, 45.5),
    }.items():
        pts = [
            (r["i"], r["x"], r["y"])
            for r in df.selectExpr("i", f"{xs} as x", f"{ys} as y").collect()
        ]
        pts.sort()
        area = 0.0
        for (_, x1, y1), (_, x2, y2) in zip(pts, pts[1:] + pts[:1]):
            area += x1 * y2 - x2 * y1
        area = abs(area) / 2
        assert abs(area - truth) / truth < 1e-3, (name, area, truth)


# --- purity / reciprocity / ab test -------------------------------------------


def test_cluster_purity_identities(spark):
    import gaia_spark.queries_webgeo as WG

    out = WG.q_cluster_purity(spark, "/root/testdata/sf0.001").collect()
    assert out
    s_major = sum(r["n_major"] for r in out)
    s_all = sum(r["n_cluster"] for r in out)
    import math

    overall = math.floor(s_major / s_all * 1e6 + 0.5)
    for r in out:
        assert r["n_major"] <= r["n_cluster"]
        assert r["overall_purity_e6"] == overall
        exp = math.floor(r["n_major"] / r["n_cluster"] * 1e6 + 0.5)
        assert r["purity_e6"] == exp


def test_reciprocity_closed_form(spark):
    # hand graph: a<->b mutual, a->c one-way => 3 edges, 2 mutual
    import pyspark.sql.functions as F
    from gaia_spark.functions import portable as P

    g = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c")], "src_host string, dst_host string"
    )
    rev = g.select(F.col("src_host").alias("_rs"), F.col("dst_host").alias("_rd"))
    m = g.join(rev, (F.col("src_host") == F.col("_rd"))
               & (F.col("dst_host") == F.col("_rs"))).count()
    assert (g.count(), m) == (3, 2)


def test_ab_test_z_sign_and_counts(spark):
    import datetime

    import gaia_spark.queries_webgeo as WG

    base = datetime.datetime(2024, 1, 1)
    # arm0 (even users): 2 users, 2 convert; arm1: 2 users, 0 convert
    # qualifying purchases need event_id % 7 == 0
    rows = [(7, base, 2, "purchase", 0.0, "{}"),
            (14, base, 4, "purchase", 0.0, "{}"),
            (3, base, 1, "view", 0.0, "{}"),
            (4, base, 3, "view", 0.0, "{}")]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    orig = WG.load
    try:
        WG.load = lambda s, d, n: e
        r = WG.q_ab_test(spark, "x").collect()[0]
    finally:
        WG.load = orig
    assert (r["n_a"], r["c_a"], r["n_b"], r["c_b"]) == (2, 2, 2, 0)
    assert r["conv_a_e6"] == 1_000_000 and r["conv_b_e6"] == 0
    # p_a > p_b -> z strictly positive; pooled p=0.5 -> z = 1/sqrt(0.25*1) = 2
    assert r["z_e6"] == 2_000_000


def test_strahler_hand_tree(spark):
    # Y-junction: two order-1 children meeting -> 2; a side order-1 into
    # the order-2 stem stays 2 (engine operator on a hand-built dir grid)
    import pyspark.sql.functions as F
    from gaia_spark.operators.hydrology import strahler_order

    # grid rows flow south (dir=4) along two columns that merge via
    # diagonal (dir=2 = SE / dir=8 = SW); build explicit (r, c, dir)
    # 5x5 interior cells; dir=0 means pit
    #   (1,1) dir=2 -> (2,2);  (1,3) dir=8 -> (2,2);  (2,2) dir=4 -> (3,2)
    #   (2,1) dir=2 -> (3,2)?? no: keep side creek (3,1) dir=1 -> (3,2)
    #   (3,2) dir=4 -> (4,2) pit
    rows = [(1, 1, 2), (1, 3, 8), (2, 2, 4), (3, 1, 1), (3, 2, 4), (4, 2, 0)]
    dirs = spark.createDataFrame(rows, "r long, c long, dir int")
    out = {(r["r"], r["c"]): r["strahler"]
           for r in strahler_order(dirs, zoom=0, max_rounds=10).collect()}
    assert out[(1, 1)] == 1 and out[(1, 3)] == 1 and out[(3, 1)] == 1
    assert out[(2, 2)] == 2      # two order-1 children tie -> 2
    assert out[(3, 2)] == 2      # max(2, 1), no tie at 2 -> stays 2
    assert out[(4, 2)] == 2      # single child of order 2


def test_strahler_unconverged_raises(spark):
    import pytest

    from gaia_spark.operators.hydrology import strahler_order

    # 2-cycle: (1,1) -> (1,2) via dir=1 (E), (1,2) -> (1,1) via dir=16 (W)
    dirs = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 16)], "r long, c long, dir int"
    )
    with pytest.raises(RuntimeError, match="unfinalized"):
        strahler_order(dirs, zoom=0, max_rounds=4).collect()


def test_anomaly_exact_inequality(spark):
    # profile {10,10,10,40}: mean 17.5, sigma^2=168.75 -> 3sig ~ 38.97;
    # 40 deviates 22.5 < 3sig -> NOT anomalous; with {10,10,10,100}: 100
    # deviates 61.875 vs 3sig(1517.2)~116 -> not; use a tighter profile
    # {10,10,10,11}: 11 deviates 0.75 -> no; {10,10,10,30}: mean 15,
    # var 75, 3sig=25.98, dev 15 -> no. Construct a REAL hit:
    # {10,10,10,10,10,10,10,50}: mean 15, var 175, 3sig 39.7, dev 35 -> no!
    # 3-sigma with the outlier INCLUDED in the profile is conservative;
    # use {10x9, 200}: mean 29, var 3249, 3sig 171, dev 171 -> boundary.
    # {10x9, 210}: dev 180 > 3sig(180*sqrt(0.9)=...) -- compute exactly:
    import math

    def flag(profile, x):
        cnt = len(profile)
        s = sum(profile)
        s2 = sum(v * v for v in profile)
        return cnt >= 3 and cnt * (x * cnt - s) ** 2 > 9 * cnt * (cnt * s2 - s * s)

    # NB: an (almost-)constant profile flags ANY deviation (sigma ~ 0),
    # and identical-values + 1 outlier sits exactly ON the boundary at
    # cnt = 10 - so use a profile with real spread
    base = [8, 12] * 8
    assert flag(base + [400], 400)
    assert not flag(base + [12], 12)
    assert not flag(base + [10], 10)
    # cross-check against float 3-sigma
    prof = base + [400]
    mean = sum(prof) / len(prof)
    var = sum((v - mean) ** 2 for v in prof) / len(prof)
    assert abs(400 - mean) > 3 * math.sqrt(var)
    assert abs(12 - (sum(base + [12]) / 17)) < 3 * math.sqrt(
        sum((v - sum(base + [12]) / 17) ** 2 for v in base + [12]) / 17)


def test_linear_ref_bins_cover_route(spark):
    import gaia_spark.queries_webgeo as WG

    out = WG.q_linear_ref(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        assert r["bin"] >= 0 and r["n_points"] > 0
        # mean cross-track within the corridor half-width
        assert abs(r["mean_xt_mm"]) <= 500_000_000


def test_twi_formula_properties(spark):
    # TWI increases with accumulation, decreases with gradient
    import math

    from gaia_spark.queries_webgeo import _TWI

    rows = [(0, 40000, 30000), (100, 40000, 30000), (100, 400000, 300000)]
    df = spark.createDataFrame(rows, "acc long, gx_e4 long, gy_e4 long")
    vals = [r[0] for r in df.selectExpr(f"{_TWI} as t").collect()]
    assert vals[1] > vals[0]          # more accumulation -> wetter
    assert vals[2] < vals[1]          # steeper -> drier
    grad = math.hypot(4.0, 3.0) / 8.0
    assert abs(vals[1] - math.log(101 / grad)) < 1e-9


def test_gravity_fit_recovers_decay_slope(spark):
    # synthetic flows n = round(1e8 * d^-2) must fit beta ~ -2 through the
    # same e3-quantized moment algebra
    import math

    dists_km = [100, 200, 400, 800, 1600]
    xs = [math.floor(math.log(d) * 1e3 + 0.5) for d in dists_km]
    ys = [math.floor(math.log(round(1e8 * d ** -2.0)) * 1e3 + 0.5)
          for d in dists_km]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert abs(beta + 2.0) < 1e-3


def test_jsd_identical_and_disjoint(spark):
    # identical distributions -> 0; disjoint vocabularies -> 2*ln(2) (the
    # JSD maximum, doubled because the query reports 2*JSD)
    import math

    import gaia_spark.queries_webgeo as WG

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "s1", 16),
         (2, "alpha beta gamma", "en", "s2", 16),
         (3, "delta epsilon zeta", "en", "s3", 18)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = WG.load
    try:
        WG.load = lambda s, d, n: docs
        out = {(r["source_a"], r["source_b"]): r
               for r in WG.q_jsd_sources(spark, "x").collect()}
    finally:
        WG.load = orig
    assert out[("s1", "s2")]["jsd2_e12"] == 0
    expected = math.floor(2 * math.log(2) * 1e12 + 0.5)
    # disjoint: every term contributes p*ln(2); summed per side = ln 2 each
    got = out[("s1", "s3")]["jsd2_e12"]
    assert abs(got - expected) <= 6  # one quantized term per word, ±1 each


def test_minhash_accuracy_exact_on_identical(spark):
    # identical docs: est = 1, exact = 1, err = 0; near-identical docs get
    # bounded error
    from gaia_spark.operators.dedup import minhash_accuracy

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, base + " kilo")],
        "doc_id long, text string",
    )
    out = {(r["a"], r["b"]): r for r in minhash_accuracy(docs).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    assert (r["est_e6"], r["exact_e6"], r["abs_err_e6"]) == (1_000_000, 1_000_000, 0)
    for e in out.values():
        assert 0 <= e["est_e6"] <= 1_000_000
        assert 0 <= e["exact_e6"] <= 1_000_000
        assert e["abs_err_e6"] <= 1_000_000


def test_geo_diversity_entropy_bounds(spark):
    import math

    import gaia_spark.queries_webgeo as WG

    out = WG.q_geo_diversity(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        assert r["n_langs"] >= 1
        assert 0 <= r["entropy_e9"] <= math.ceil(math.log(r["n_langs"]) * 1e9) + r["n_langs"]
        if r["n_langs"] == 1:
            assert r["entropy_e9"] == 0


def test_weighted_median_hand_case(spark):
    # weights {1:1, 2:1, 3:10}: total 12, half 6 -> median 3 (the heavy
    # item); equal weights fall back to the lower median
    import gaia_spark.queries_webgeo as WG

    li = spark.createDataFrame(
        [(1, 1, 1.0, 1.0), (1, 2, 1.0, 2.0), (1, 3, 10.0, 3.0),
         (2, 1, 1.0, 10.0), (2, 2, 1.0, 20.0)],
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double",
    ).withColumn("l_returnflag", F.lit("A"))
    orig = WG.load
    try:
        WG.load = lambda s, d, n: li
        out = WG.q_weighted_median(spark, "x").collect()
    finally:
        WG.load = orig
    # one flag: prices [1,2,3,10,20] weights [1,1,10,1,1]; tw=14, half 7
    # cum: 1,2,12 -> first 2*cw>=14 at price 3
    assert len(out) == 1
    assert (out[0]["wmedian_e2"], out[0]["total_w"]) == (300, 14)
