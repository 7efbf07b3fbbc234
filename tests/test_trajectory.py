"""od_flows / trip_stats — closed-form fixtures + plan shape."""

import pyspark.sql.functions as F

from gaia_spark.functions.kernel import haversine_m
from gaia_spark.operators.trajectory import od_flows, trip_stats


def _events(spark, rows):
    # rows: (user_id, ts_str, event_id, lat, lon)
    return spark.createDataFrame(
        [(u, t, e, la, lo) for u, t, e, la, lo in rows],
        "user_id long, ts string, event_id long, lat double, lon double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_trip_stats_closed_form(spark):
    rows = [
        (1, "2025-01-01 00:00:00", 1, 0.0, 0.0),
        (1, "2025-01-01 01:00:00", 2, 0.0, 1.0),
        (1, "2025-01-01 02:00:00", 3, 1.0, 1.0),
        (2, "2025-01-01 00:00:00", 4, 50.0, 50.0),  # single event: 0 legs
    ]
    out = {r.user_id: r for r in trip_stats(_events(spark, rows)).collect()}
    leg1 = haversine_m(0.0, 0.0, 0.0, 1.0)
    leg2 = haversine_m(0.0, 1.0, 1.0, 1.0)
    assert out[1].n_legs == 2
    assert out[1].total_m_e3 == int((leg1 + leg2) * 1000 + 0.5)
    assert out[1].max_leg_m_e3 == int(max(leg1, leg2) * 1000 + 0.5)
    assert (out[2].n_legs, out[2].total_m_e3, out[2].max_leg_m_e3) == (0, 0, 0)


def test_od_flows_self_loop_and_ordering(spark):
    # user 3 bounces A -> B -> A; user 4 stays in A (self-loop flow);
    # a ts tie is broken by event_id (10 before 11), deterministically
    rows = [
        (3, "2025-01-01 00:00:00", 10, 0.0, 0.0),
        (3, "2025-01-01 00:00:00", 11, 0.0, 91.0),  # tie with event 10
        (3, "2025-01-01 01:00:00", 12, 0.0, 0.0),
        (4, "2025-01-01 00:00:00", 13, 0.0, 0.0),
        (4, "2025-01-01 01:00:00", 14, -0.1, 0.1),  # same res-4 cell (lat 0
        # is the cell-row boundary: both 0 and -0.1 floor to row 8)
    ]
    flows = {
        (r.cell_from, r.cell_to): r.n_trips
        for r in od_flows(_events(spark, rows), res=4).collect()
    }
    a = [k for k in flows if k[0] == k[1]]
    assert len(a) == 1 and flows[a[0]] == 1  # user 4's stay
    ab = [k for k in flows if k[0] != k[1]]
    assert len(ab) == 2  # A->B and B->A from user 3
    assert sum(flows.values()) == 3


def test_trip_stats_single_exchange(spark):
    """The lag window and the per-user agg must share one shuffle."""
    df = _events(spark, [(1, "2025-01-01 00:00:00", 1, 0.0, 0.0)])
    plan = trip_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_stay_points_closed_form(spark):
    from gaia_spark.operators.trajectory import stay_points

    # user 5: 3-event dwell at ~(10, 10) spanning 20 min, then a far jump
    # and a second 2-event dwell (dropped: < 3 points); user 6: all legs
    # long (no stays)
    rows = [
        (5, "2025-01-01 00:00:00", 1, 10.000, 10.000),
        (5, "2025-01-01 00:10:00", 2, 10.010, 10.010),
        (5, "2025-01-01 00:20:00", 3, 10.020, 9.990),
        (5, "2025-01-01 01:00:00", 4, 50.000, 50.000),
        (5, "2025-01-01 02:00:00", 5, 50.001, 50.001),
        (6, "2025-01-01 00:00:00", 6, 0.0, 0.0),
        (6, "2025-01-01 01:00:00", 7, 0.0, 90.0),
    ]
    out = stay_points(
        _events(spark, rows), dist_m=10000.0, min_points=3, min_dur_s=600
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.user_id == 5 and r.n_points == 3 and r.dur_s == 1200
    # exact bigint centroid: mean of offset-e4 floors, offset removed
    lat_e4 = (100000 + 100100 + 100200 + 3 * 900000) // 3 - 900000
    lon_e4 = (100000 + 100100 + 99900 + 3 * 1800000) // 3 - 1800000
    assert (r.clat_e4, r.clon_e4) == (lat_e4, lon_e4)


def test_stay_points_min_duration_gate(spark):
    from gaia_spark.operators.trajectory import stay_points

    # 3 points but only 2 minutes -> dropped by min_dur_s
    rows = [
        (7, "2025-01-01 00:00:00", 1, 0.0, 0.0),
        (7, "2025-01-01 00:01:00", 2, 0.001, 0.001),
        (7, "2025-01-01 00:02:00", 3, 0.002, 0.002),
    ]
    out = stay_points(
        _events(spark, rows), dist_m=10000.0, min_points=3, min_dur_s=600
    ).collect()
    assert out == []


def test_hausdorff_closed_form(spark):
    from gaia_spark.functions import portable as P
    from gaia_spark.operators.trajectory import hausdorff_distance

    # A = two equator points, B = one point 1 deg east of A's east end:
    # h(A,B) = dist(a1, b1) = 2 deg of longitude; h(B,A) = 1 deg
    pts = spark.createDataFrame(
        [("A", 1, 0.0, 0.0), ("A", 2, 0.0, 1.0), ("B", 3, 0.0, 2.0)],
        "traj_id string, pt_id long, lat double, lon double",
    )
    pairs = spark.createDataFrame([("p1", "A", "B")], "pair_id string, a string, b string")
    r = hausdorff_distance(pts, pairs).collect()[0]
    one_deg = spark.sql(
        f"SELECT {P.floor_scaled_sql(P.haversine_m_sql('0.0','0.0','0.0','1.0'), 3)} AS d"
    ).collect()[0].d
    two_deg = spark.sql(
        f"SELECT {P.floor_scaled_sql(P.haversine_m_sql('0.0','0.0','0.0','2.0'), 3)} AS d"
    ).collect()[0].d
    assert r.h_ba_m_e3 == one_deg
    assert r.h_ab_m_e3 == two_deg
    assert r.hausdorff_m_e3 == two_deg


def test_knox_brute_parity(spark):
    from gaia_spark.operators.stats import knox_test
    from math import asin, cos, radians, sin, sqrt

    # deterministic scatter: 40 points, 2 loose clusters x 2 time bands
    rows = []
    for i in range(40):
        lat = 10.0 + (i % 2) * 3.0 + ((i * 7) % 5) * 0.01
        lon = 20.0 + (i % 2) * 3.0 + ((i * 11) % 7) * 0.01
        t_us = (i % 4) * 3_600_000_000 + i * 1_000_000
        rows.append((i, t_us, lat, lon))
    df = spark.createDataFrame(rows, "pid long, t_us long, lat double, lon double")
    out = knox_test(df, delta_d_m=50_000.0, delta_t_s=3600).collect()[0]

    def hav(p, q):
        la1, lo1, la2, lo2 = map(radians, (p[2], p[3], q[2], q[3]))
        a = sin((la2 - la1) / 2) ** 2 + cos(la1) * cos(la2) * sin((lo2 - lo1) / 2) ** 2
        return 2 * 6371008.8 * asin(sqrt(a))

    ns = nt = x = 0
    for i in range(40):
        for j in range(i + 1, 40):
            s = hav(rows[i], rows[j]) <= 50_000.0
            t = abs(rows[i][1] - rows[j][1]) <= 3600 * 1_000_000
            ns += s
            nt += t
            x += s and t
    assert (out.n, out.ns, out.nt, out.x_obs) == (40, ns, nt, x)
    e1 = (2 * ns * 1_000_000) // (40 * 39)
    expected = (e1 * 2 * nt) // 2
    assert out.expected_e6 == expected
    if expected > 0:
        assert out.ratio_e6 == (2 * x * 500_000_000_000) // expected


def test_frechet_brute_parity_and_vs_hausdorff(spark):
    from gaia_spark.functions import portable as P
    from gaia_spark.operators.trajectory import frechet_distance

    # out-and-back A vs straight B: Hausdorff ~0 but Fréchet must pay the
    # return leg; plus a second pair with reversed order sensitivity
    pts = [
        ("A", 0, 0.0, 0.0), ("A", 1, 0.0, 1.0), ("A", 2, 0.0, 2.0),
        ("A", 3, 0.0, 1.0), ("A", 4, 0.0, 0.0),
        ("B", 0, 0.0, 0.0), ("B", 1, 0.0, 2.0),
        ("C", 0, 10.0, 10.0), ("C", 1, 10.0, 11.0), ("C", 2, 10.0, 12.0),
        ("D", 0, 10.0, 12.0), ("D", 1, 10.0, 11.0), ("D", 2, 10.0, 10.0),
    ]
    df = spark.createDataFrame(pts, "traj_id string, seq long, lat double, lon double")
    pairs = spark.createDataFrame(
        [("p1", "A", "B"), ("p2", "C", "D")], "pair_id string, a string, b string"
    )
    out = {r.pair_id: r for r in frechet_distance(df, pairs).collect()}

    # python reference on the same e3 integer distances
    import math

    def hav_e3(p, q):
        la1, lo1, la2, lo2 = map(math.radians, (p[0], p[1], q[0], q[1]))
        a = (math.sin((la2 - la1) / 2) ** 2
             + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2)
        return math.floor(2 * 6371008.8 * math.asin(math.sqrt(a)) * 1000 + 0.5)

    def ref(A, B):
        D = [[hav_e3(a, b) for b in B] for a in A]
        n, m = len(A), len(B)
        c = [[0] * m for _ in range(n)]
        c[0][0] = D[0][0]
        for i in range(1, n):
            c[i][0] = max(c[i - 1][0], D[i][0])
        for j in range(1, m):
            c[0][j] = max(c[0][j - 1], D[0][j])
        for i in range(1, n):
            for j in range(1, m):
                c[i][j] = max(min(c[i - 1][j], c[i][j - 1], c[i - 1][j - 1]), D[i][j])
        return c[n - 1][m - 1]

    A = [(0.0, 0.0), (0.0, 1.0), (0.0, 2.0), (0.0, 1.0), (0.0, 0.0)]
    B = [(0.0, 0.0), (0.0, 2.0)]
    C = [(10.0, 10.0), (10.0, 11.0), (10.0, 12.0)]
    Dd = [(10.0, 12.0), (10.0, 11.0), (10.0, 10.0)]
    assert out["p1"].frechet_m_e3 == ref(A, B)
    assert out["p2"].frechet_m_e3 == ref(C, Dd)
    assert (out["p1"].n_a, out["p1"].n_b) == (5, 2)
    # the leash must pay the return leg: >= 1 degree of longitude
    one_deg = spark.sql(
        f"SELECT {P.floor_scaled_sql(P.haversine_m_sql('0.0','0.0','0.0','1.0'), 3)} AS d"
    ).collect()[0].d
    assert out["p1"].frechet_m_e3 >= one_deg
    # reversed C/D: order-aware metric spans the full 2-degree sweep
    assert out["p2"].frechet_m_e3 > 0


def test_ipf_balance_python_replica_and_margins(spark):
    import math

    from gaia_spark.operators.trajectory import ipf_balance

    od = spark.createDataFrame(
        [(0, 0, 10), (0, 1, 30), (1, 0, 20), (1, 1, 40)],
        "cell_from long, cell_to long, n_trips long",
    )
    rt = spark.createDataFrame([(0, 50.0), (1, 50.0)], "cell_from long, r double")
    ct = spark.createDataFrame([(0, 40.0), (1, 60.0)], "cell_to long, c double")
    out = {(r.cell_from, r.cell_to): r.flow_e6 for r in
           ipf_balance(od, rt, ct, rounds=3).collect()}

    # bit-exact python replica of the integer half-rounds
    m = {(0, 0): 10 * 10**12, (0, 1): 30 * 10**12,
         (1, 0): 20 * 10**12, (1, 1): 40 * 10**12}
    rtm, ctm = {0: 50.0, 1: 50.0}, {0: 40.0, 1: 60.0}
    for _ in range(3):
        rs = {i: m[(i, 0)] + m[(i, 1)] for i in (0, 1)}
        m = {k: math.floor(float(v) * rtm[k[0]] * 1e12 / float(rs[k[0]]) + 0.5)
             for k, v in m.items()}
        cs = {j: m[(0, j)] + m[(1, j)] for j in (0, 1)}
        m = {k: math.floor(float(v) * ctm[k[1]] * 1e12 / float(cs[k[1]]) + 0.5)
             for k, v in m.items()}
    assert out == {k: v // 10**6 for k, v in m.items()}
    # and the balanced matrix actually honors the column margins
    for j in (0, 1):
        got = (out[(0, j)] + out[(1, j)]) / 1e6
        assert abs(got - ctm[j]) < 0.01


def test_directional_mean_closed_form(spark):
    from gaia_spark.operators.trajectory import directional_mean

    # user 1: two due-east legs on the equator -> bearing 90, R = 1
    # user 2: east then west -> opposite bearings cancel, R ~ 0
    rows = [
        (1, "2025-01-01 00:00:00", 1, 0.0, 0.0),
        (1, "2025-01-01 00:10:00", 2, 0.0, 1.0),
        (1, "2025-01-01 00:20:00", 3, 0.0, 2.0),
        (2, "2025-01-01 00:00:00", 4, 0.0, 0.0),
        (2, "2025-01-01 00:10:00", 5, 0.0, 1.0),
        (2, "2025-01-01 00:20:00", 6, 0.0, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, lat double, lon double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.user_id: r for r in directional_mean(df).collect()}
    assert out[1].n_legs == 2
    assert out[1].mean_bearing_e4 == 900000          # due east
    assert out[1].r_e6 == 1_000_000
    assert out[2].r_e6 < 5                            # cancellation
