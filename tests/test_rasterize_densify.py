"""rasterize_zones (even-odd burn) vs a numpy reference; densify_great_circle
geometric invariants."""

import math

import pyspark.sql.functions as F

from gaia_spark.operators.raster import rasterize_zones
from gaia_spark.operators.scalar_geo import densify_great_circle


def _ref_inside(py, px, ring):
    """Even-odd crossing reference (same rule, independent code path)."""
    inside = False
    for (ay, ax), (by, bx) in zip(ring, ring[1:]):
        if (ay > py) != (by > py) and px < ax + (py - ay) * (bx - ax) / (by - ay):
            inside = not inside
    return inside


def _burn(spark, rings, res):
    import pandas as pd

    rows = [
        {"zone_id": i, "vertices": [{"lat": la, "lon": lo} for la, lo in ring]}
        for i, ring in enumerate(rings)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        "zone_id long, vertices array<struct<lat: double, lon: double>>",
    )
    return {(r.zone_id, r.cell) for r in rasterize_zones(df, res=res).collect()}


def _expected(rings, res):
    n = 1 << res
    out = set()
    for i, ring in enumerate(rings):
        lats = [p[0] for p in ring]
        lons = [p[1] for p in ring]
        for y in range(n):
            py = 90.0 - (y + 0.5) * 180.0 / n
            if py < min(lats) - 180.0 / n or py > max(lats) + 180.0 / n:
                continue
            for x in range(n):
                px = (x + 0.5) * 360.0 / n - 180.0
                if _ref_inside(py, px, ring):
                    out.add((i, y * n + x))
    return out


def test_rasterize_triangle_and_concave_match_reference(spark):
    tri = [(0.0, 0.0), (40.0, 0.0), (0.0, 60.0), (0.0, 0.0)]
    # concave "arrow": even-odd must carve the notch out
    concave = [(-60.0, -120.0), (-10.0, -120.0), (-35.0, -80.0),
               (-10.0, -40.0), (-60.0, -40.0), (-60.0, -120.0)]
    rings = [tri, concave]
    got = _burn(spark, rings, res=5)
    assert got == _expected(rings, res=5)
    # sanity: the notch removed cells — concave burn < its convex bbox fill
    n_concave = sum(1 for z, _ in got if z == 1)
    assert 0 < n_concave


def test_rasterize_cell_ids_in_grid(spark):
    got = _burn(spark, [[(10.0, 10.0), (30.0, 10.0), (10.0, 30.0), (10.0, 10.0)]], res=6)
    n = 1 << 6
    assert all(0 <= c < n * n * n for _, c in got) and got


def _hav_deg(a, b):
    (la1, lo1), (la2, lo2) = a, b
    p1, p2 = math.radians(la1), math.radians(la2)
    dl = math.radians(lo2 - lo1)
    h = math.sin((p2 - p1) / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * math.asin(math.sqrt(h))


def test_densify_invariants(spark):
    segs = spark.createDataFrame(
        [(1, 10.0, -20.0, 55.0, 40.0), (2, -30.0, 100.0, 20.0, 170.0)],
        "seg_id long, lat0 double, lon0 double, lat1 double, lon1 double",
    )
    n = 16
    rows = sorted(
        densify_great_circle(segs, n_points=n).collect(),
        key=lambda r: (r.seg_id, r.i),
    )
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.seg_id, []).append((r.way_lat, r.way_lon))
    for (sid, la0, lo0, la1, lo1) in segs.collect():
        pts = by_seg[sid]
        assert len(pts) == n + 1
        # endpoints recovered (closed-form, tiny trig roundoff only)
        assert abs(pts[0][0] - la0) < 1e-9 and abs(pts[0][1] - lo0) < 1e-9
        assert abs(pts[-1][0] - la1) < 1e-9 and abs(pts[-1][1] - lo1) < 1e-9
        # equal angular spacing: every hop == total/n within 1e-9 rad
        total = _hav_deg((la0, lo0), (la1, lo1))
        hops = [_hav_deg(pts[i], pts[i + 1]) for i in range(n)]
        assert all(abs(h - total / n) < 1e-9 for h in hops)
