"""Unit tests for the pure-numpy geometry kernel (no Spark needed)."""

import numpy as np
import pytest

from gaia_spark.functions import kernel as K


def test_haversine_known_values():
    # London -> Paris ≈ 343.5 km
    d = K.haversine_m(51.5074, -0.1278, 48.8566, 2.3522)
    assert 340_000 < float(d) < 347_000
    assert float(K.haversine_m(10.0, 20.0, 10.0, 20.0)) == 0.0


def test_haversine_vectorized_broadcast():
    d = K.haversine_m(np.zeros(3), np.array([0.0, 1.0, 2.0]), 0.0, 0.0)
    assert d.shape == (3,)
    assert d[0] == 0.0 and d[1] < d[2]
    # 1 degree of longitude at the equator ≈ 111.19 km
    assert abs(d[1] - 111_195) < 100


def test_pip_square():
    prep = K.PreparedPolygon(np.array([0.0, 0.0, 10.0, 10.0, 0.0]),
                             np.array([0.0, 10.0, 10.0, 0.0, 0.0]))
    lats = np.array([5.0, 5.0, 0.0, 10.0, -1.0, 5.0])
    lons = np.array([5.0, 15.0, 5.0, 10.0, 5.0, 0.0])
    inside = prep.contains(lats, lons)
    assert inside[0] and not inside[1] and not inside[4]
    onb = prep.on_boundary(lats, lons)
    assert onb[2] and onb[3] and onb[5] and not onb[0] and not onb[1]
    cov = prep.covers(lats, lons)
    assert cov[0] and cov[2] and cov[3] and cov[5] and not cov[1] and not cov[4]


def test_pip_concave():
    # L-shape: point in the notch must be outside
    lats = np.array([0.0, 0.0, 4.0, 4.0, 2.0, 2.0, 0.0])
    lons = np.array([0.0, 4.0, 4.0, 2.0, 2.0, 0.0, 0.0])
    prep = K.PreparedPolygon(lats, lons)
    assert prep.contains(np.array([3.0]), np.array([3.0]))[0]      # upper arm
    assert not prep.contains(np.array([3.0]), np.array([1.0]))[0]  # notch
    assert prep.contains(np.array([1.0]), np.array([1.0]))[0]      # lower body


def test_cell_roundtrip_and_parent():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)
    for res in (3, 7, 12):
        c = K.cell_encode(lat, lon, res)
        x, y = K.cell_decode(c, res)
        assert (K.cell_id(x, y, res) == c).all()
        lo_la, hi_la, lo_lo, hi_lo = zip(*[K.cell_bounds(int(cc), res) for cc in c[:50]])
        assert (lat[:50] >= np.array(lo_la) - 1e-9).all()
        assert (lat[:50] <= np.array(hi_la) + 1e-9).all()
        assert (lon[:50] >= np.array(lo_lo) - 1e-9).all()
        # parent at res-2 contains the same point
        p = K.cell_parent(c, res, res - 2)
        assert (p == K.cell_encode(lat, lon, res - 2)).all()


def test_kring_counts_and_symmetry():
    res = 6
    c = int(K.cell_encode(np.array([10.0]), np.array([20.0]), res)[0])
    assert len(K.kring(c, res, 0)) == 1
    assert len(K.kring(c, res, 1)) == 9
    assert len(K.kring(c, res, 2)) == 25
    # symmetry: b in kring(a) <=> a in kring(b) away from poles
    ring = K.kring(c, res, 1)
    for b in ring:
        assert c in set(K.kring(int(b), res, 1).tolist())


def test_kring_wraps_longitude_clamps_latitude():
    res = 4
    n = 1 << res
    # cell at x=0 (lon -180 edge): ring must include x = n-1 cells
    c = int(K.cell_id(np.array([0]), np.array([5]), res)[0])
    xs = set((K.kring(c, res, 1) % n).tolist())
    assert {n - 1, 0, 1} <= xs
    # cell at y=0 (north pole edge): no negative y
    c2 = int(K.cell_id(np.array([3]), np.array([0]), res)[0])
    assert (K.kring(c2, res, 1) // n >= 0).all()
    assert len(K.kring(c2, res, 1)) == 6  # 2 rows × 3 cols


def test_tile_xy_known():
    # lat=0, lon=0 at zoom 1 -> tile (1, 1); zoom 0 -> (0, 0)
    x, y = K.tile_xy(np.array([0.0]), np.array([0.0]), 1)
    assert (int(x[0]), int(y[0])) == (1, 1)
    x, y = K.tile_xy(np.array([0.0]), np.array([0.0]), 0)
    assert (int(x[0]), int(y[0])) == (0, 0)
    # tile bounds roundtrip
    for z in (2, 5):
        xx, yy = K.tile_xy(np.array([40.0]), np.array([-70.0]), z)
        la0, la1, lo0, lo1 = K.tile_bounds(z, int(xx[0]), int(yy[0]))
        assert la0 <= 40.0 <= la1 and lo0 <= -70.0 <= lo1


def test_area_rect_matches_closed_form():
    la0, la1, lo0, lo1 = 10.0, 12.0, 20.0, 23.0
    ring_lat = np.array([la0, la0, la1, la1, la0])
    ring_lon = np.array([lo0, lo1, lo1, lo0, lo0])
    a = K.polygon_area_m2(ring_lat, ring_lon)
    r = K.EARTH_RADIUS_M
    expected = r * r * np.radians(lo1 - lo0) * abs(np.sin(np.radians(la1)) - np.sin(np.radians(la0)))
    assert a == pytest.approx(expected, rel=1e-12)


def test_length_of_meridian_segment():
    # 1 degree along a meridian ≈ 111.19 km
    length = K.polyline_length_m(np.array([0.0, 1.0]), np.array([10.0, 10.0]))
    assert abs(length - 111_195) < 100


def test_polygon_cover_full_and_partial():
    prep = K.PreparedPolygon(np.array([0.0, 0.0, 20.0, 20.0, 0.0]),
                             np.array([0.0, 20.0, 20.0, 0.0, 0.0]))
    res = 5  # cells are 5.625 x 11.25 deg
    full, partial = K.polygon_cover(prep, res)
    assert len(full) + len(partial) > 0
    # every point sampled inside the polygon must fall in a covered cell
    rng = np.random.default_rng(7)
    lats = rng.uniform(0.01, 19.99, 200)
    lons = rng.uniform(0.01, 19.99, 200)
    cells = set(K.cell_encode(lats, lons, res).tolist())
    assert cells <= set(full.tolist()) | set(partial.tolist())
    # full cells must be genuinely inside: their centers pass PIP
    if len(full):
        cl, co = K.cell_center(full, res)
        assert prep.contains(cl, co).all()


def test_ring_lower_bound_conservative():
    res, lat = 6, 30.0
    cell_h = 180.0 / (1 << res)
    for radius in (2, 3, 5):
        b = K.ring_lower_bound_m(lat, res, radius)
        # true min distance to ring cells ≥ bound: check vertical case
        true_vert = (radius - 1) * cell_h * 110_574.0
        assert b <= true_vert + 1e-6
        assert b >= 0.0


def test_destination_point_roundtrip():
    lat2, lon2 = K.destination_point(10.0, 20.0, 0.0, 111_195.0)
    assert abs(float(lat2) - 11.0) < 0.01 and abs(float(lon2) - 20.0) < 1e-9


def test_prepared_polygon_with_hole():
    """Even-odd over all rings: points in the hole are outside; hole
    boundary counts as polygon boundary."""
    outer = (np.array([0.0, 0.0, 10.0, 10.0, 0.0]), np.array([0.0, 10.0, 10.0, 0.0, 0.0]))
    hole = (np.array([3.0, 3.0, 7.0, 7.0, 3.0]), np.array([3.0, 7.0, 7.0, 3.0, 3.0]))
    prep = K.PreparedPolygon.from_rings([outer, hole])
    lats = np.array([1.0, 5.0, 3.0, 11.0, 8.0])
    lons = np.array([1.0, 5.0, 5.0, 5.0, 5.0])
    # (1,1) in shell; (5,5) in hole -> out; (3,5) on hole boundary;
    # (11,5) outside; (8,5) in shell above hole
    assert prep.contains(lats, lons).tolist() == [True, False, False, False, True]
    assert prep.on_boundary(lats, lons).tolist() == [False, False, True, False, False]


def test_prepared_multipolygon():
    a = (np.array([0.0, 0.0, 2.0, 2.0, 0.0]), np.array([0.0, 2.0, 2.0, 0.0, 0.0]))
    b = (np.array([5.0, 5.0, 7.0, 7.0, 5.0]), np.array([5.0, 7.0, 7.0, 5.0, 5.0]))
    prep = K.PreparedPolygon.from_rings([a, b])
    lats = np.array([1.0, 6.0, 3.5])
    lons = np.array([1.0, 6.0, 3.5])
    assert prep.contains(lats, lons).tolist() == [True, True, False]


def test_polygon_cover_hole_and_outside_cells_dropped():
    """Cells strictly inside a hole (and bbox corners outside a non-convex
    shape) must not appear in the cover at all; full cells never touch any
    ring edge."""
    outer = (np.array([0.0, 0.0, 40.0, 40.0, 0.0]), np.array([0.0, 40.0, 40.0, 0.0, 0.0]))
    hole = (np.array([10.0, 10.0, 30.0, 30.0, 10.0]), np.array([10.0, 30.0, 30.0, 10.0, 10.0]))
    prep = K.PreparedPolygon.from_rings([outer, hole])
    res = 7  # 1.40625 deg cells -> hole spans many cells
    full, partial = K.polygon_cover(prep, res)
    allc = set(full.tolist()) | set(partial.tolist())
    assert len(set(full) & set(partial)) == 0
    # a cell deep inside the hole is in NEITHER set
    hole_center = int(K.cell_encode(np.array([20.0]), np.array([20.0]), res)[0])
    assert hole_center not in allc
    # a cell in the shell between hole and outer ring is FULL
    shell = int(K.cell_encode(np.array([35.0]), np.array([20.0]), res)[0])
    assert shell in set(full.tolist())
    # full cells: center must be contained, and every corner too
    for c in full.tolist()[:50]:
        la0, la1, lo0, lo1 = K.cell_bounds(c, res)
        cl = np.array([la0, la0, la1, la1, (la0 + la1) / 2])
        co = np.array([lo0, lo1, lo0, lo1, (lo0 + lo1) / 2])
        assert prep.covers(cl, co).all()


def test_polygon_cover_nonconvex_exact():
    """The edge-overlap rule removes the old convexity assumption: for an
    L-shaped ring, no 'full' cell may contain uncovered points."""
    # L-shape: big square minus its upper-right quadrant
    lats = np.array([0.0, 0.0, 40.0, 40.0, 20.0, 20.0, 0.0])
    lons = np.array([0.0, 40.0, 40.0, 20.0, 20.0, 0.0, 0.0])
    prep = K.PreparedPolygon(lats, lons)
    full, partial = K.polygon_cover(prep, 7)
    # notch interior (lat 30, lon 10) is outside the L; cell not in cover
    notch = int(K.cell_encode(np.array([30.0]), np.array([10.0]), 7)[0])
    assert notch not in set(full.tolist()) | set(partial.tolist())
    for c in full.tolist():
        la0, la1, lo0, lo1 = K.cell_bounds(c, 7)
        cl = np.array([la0, la0, la1, la1])
        co = np.array([lo0, lo1, lo0, lo1])
        assert prep.contains(cl, co).all()


# --- geohash (portable SQL, validated via DuckDB — no Spark needed) ----------

def _geohash_ref(lat: float, lon: float, precision: int) -> str:
    """Independent interval-halving geohash (the textbook algorithm), used
    to validate the arithmetic bit-packing SQL in portable.geohash_sql."""
    from gaia_spark.functions import portable as P

    latr, lonr = [-90.0, 90.0], [-180.0, 180.0]
    out, ch, bits, even = "", 0, 0, True
    while len(out) < precision:
        r = lonr if even else latr
        mid = (r[0] + r[1]) / 2
        v = lon if even else lat
        ch <<= 1
        if v >= mid:
            ch |= 1
            r[0] = mid
        else:
            r[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out += P.GEOHASH32[ch]
            ch, bits = 0, 0
    return out


def _geohash_duck(lat: float, lon: float, precision: int) -> str:
    import duckdb

    from gaia_spark.functions import portable as P

    latq = P.geohash_latq_sql(f"cast({lat!r} as double)", precision)
    lonq = P.geohash_lonq_sql(f"cast({lon!r} as double)", precision)
    sql = (
        f"WITH q AS (SELECT {latq} AS latq, {lonq} AS lonq) "
        f"SELECT {P.geohash_sql('latq', 'lonq', precision)} FROM q"
    )
    return duckdb.sql(sql).fetchone()[0]


def test_geohash_published_vectors():
    assert _geohash_duck(57.64911, 10.40744, 11) == "u4pruydqqvj"  # wiki vector
    assert _geohash_duck(42.6, -5.6, 5) == "ezs42"  # wiki vector
    assert _geohash_duck(0.0, 0.0, 1) == "s"


def test_geohash_matches_interval_halving_reference():
    rng = np.random.default_rng(7)
    lats = rng.uniform(-90, 90, 40)
    lons = rng.uniform(-180, 180, 40)
    # boundary / clamp cases (90, 180 quantize to the top bucket)
    cases = list(zip(lats, lons)) + [(90.0, 180.0), (-90.0, -180.0), (0.0, 0.0)]
    for precision in (1, 5, 11, 12):
        for lat, lon in cases:
            assert _geohash_duck(lat, lon, precision) == _geohash_ref(lat, lon, precision)


def test_geohash_prefix_nesting():
    # coarser geohash == prefix of the finer one (the rollup identity
    # q_geohash_counts relies on)
    rng = np.random.default_rng(11)
    for lat, lon in zip(rng.uniform(-85, 85, 10), rng.uniform(-180, 180, 10)):
        g8 = _geohash_duck(lat, lon, 8)
        for p in (1, 3, 5, 7):
            assert _geohash_duck(lat, lon, p) == g8[:p]
