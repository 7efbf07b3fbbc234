"""line_intersections — brute-force parity and ownership dedup."""

import numpy as np
import pyspark.sql.functions as F

from gaia_spark.operators.overlay import line_intersections


def _lines(spark, rows, key="lid"):
    return spark.createDataFrame(
        rows, f"{key} long, vertices array<struct<lat double, lon double>>"
    )


def _brute(a_rows, b_rows):
    """Independent numpy segment-intersection sweep over 2-vertex chains."""
    hits = set()
    for la, va in a_rows:
        for lb, vb in b_rows:
            for i in range(len(va) - 1):
                for j in range(len(vb) - 1):
                    (y1, x1), (y2, x2) = va[i], va[i + 1]
                    (y3, x3), (y4, x4) = vb[j], vb[j + 1]
                    d = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
                    if d == 0:
                        continue
                    t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / d
                    u = ((x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)) / d
                    if 0 <= t <= 1 and 0 <= u <= 1:
                        hits.add((la, i, lb, j))
    return hits


def test_brute_force_parity(spark):
    rng = np.random.default_rng(11)
    a_rows, b_rows = [], []
    for k in range(30):
        y, x = rng.uniform(10, 30), rng.uniform(10, 30)
        a_rows.append((k, [(y, x), (y + rng.uniform(1, 8), x + rng.uniform(1, 8))]))
        y, x = rng.uniform(10, 30), rng.uniform(10, 30)
        b_rows.append((k, [(y, x), (y + rng.uniform(1, 8), x - rng.uniform(1, 8))]))
    out = line_intersections(
        _lines(spark, a_rows, "la"), _lines(spark, b_rows, "lb"),
        res=6, key_a="la", key_b="lb",
    ).collect()
    got = {(r.la, r.seg_a, r.lb, r.seg_b) for r in out}
    assert got == _brute(a_rows, b_rows)
    assert len(out) == len(got)  # ownership dedup: exactly one row per pair


def test_multicell_segment_single_report(spark):
    """A long crossing pair shares MANY cover cells at high res — the
    ownership rule must still emit exactly one row, with the right point."""
    a = _lines(spark, [(1, [(0.0, -40.0), (0.0, 40.0)])], "la")
    b = _lines(spark, [(2, [(-40.0, 3.0), (40.0, 3.0)])], "lb")
    out = line_intersections(a, b, res=7, key_a="la", key_b="lb").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.lat_e6, r.lon_e6) == (0, 3_000_000)
    assert r.t_e6 == 537_500  # (3 - (-40)) / 80
    assert r.u_e6 == 500_000


def test_parallel_and_touching(spark):
    """Parallel segments report nothing; an endpoint touch (t=1, u=0.5)
    does report — closed [0,1] bounds."""
    a = _lines(spark, [(1, [(0.0, 0.0), (0.0, 10.0)])], "la")
    par = _lines(spark, [(2, [(1.0, 0.0), (1.0, 10.0)])], "lb")
    assert line_intersections(a, par, key_a="la", key_b="lb").count() == 0
    touch = _lines(spark, [(3, [(-5.0, 10.0), (5.0, 10.0)])], "lb")
    out = line_intersections(a, touch, key_a="la", key_b="lb").collect()
    assert len(out) == 1 and out[0].t_e6 == 1_000_000 and out[0].u_e6 == 500_000
