"""clip_segments_to_tiles — Liang-Barsky closed-form cases at zoom 1
(2x2 world): exact rational x-coordinates make quantized values provable."""

import pytest

from gaia_spark.operators.tiling import clip_segments_to_tiles


def _clip(spark, rows, zoom=1, extent=4096):
    df = spark.createDataFrame(
        rows, "seg_id long, lat0 double, lon0 double, lat1 double, lon1 double"
    )
    return sorted(
        clip_segments_to_tiles(df, zoom=zoom, extent=extent).collect(),
        key=lambda r: (r.seg_id, r.tx, r.ty),
    )


def test_horizontal_split_across_column_boundary(spark):
    # lon -90 -> +90 at lat 40: x goes 0.5 -> 1.5, crossing x=1 exactly.
    out = _clip(spark, [(1, 40.0, -90.0, 40.0, 90.0)])
    assert [(r.tx, r.ty) for r in out] == [(0, 0), (1, 0)]
    a, b = out
    assert (a.u0, a.u1) == (2048, 4096)  # enters mid-tile, exits at right edge
    assert (b.u0, b.u1) == (0, 2048)     # continues from the left edge
    assert a.v0 == a.v1 == b.v0 == b.v1  # horizontal: one quantized row
    assert a.v1 == b.v0                  # continuity across the cut


def test_vertical_degenerate_axis_split(spark):
    # dx = 0 exercises the degenerate-axis branch; lat -40 -> 40 crosses y=1.
    out = _clip(spark, [(1, -40.0, -90.0, 40.0, -90.0)])
    assert sorted((r.tx, r.ty) for r in out) == [(0, 0), (0, 1)]
    for r in out:
        assert r.u0 == r.u1 == 2048  # x pinned mid-tile the whole way
    top = next(r for r in out if r.ty == 0)
    bot = next(r for r in out if r.ty == 1)
    # the shared cut is the tile edge: bottom of row 0 == top of row 1
    assert {top.v0, top.v1} & {4096} and {bot.v0, bot.v1} & {0}


def test_fully_inside_single_tile(spark):
    out = _clip(spark, [(1, 20.0, -135.0, 30.0, -100.0)])
    assert len(out) == 1 and (out[0].tx, out[0].ty) == (0, 0)
    r = out[0]
    assert (r.u0, r.u1) == (1024, 1820)  # x: 0.25 and 80/360*2=0.4444 of tile


def test_reserved_column_guard(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0, 1.0, 1.0, 9)],
        "seg_id long, lat0 double, lon0 double, lat1 double, lon1 double, tx long")
    with pytest.raises(ValueError, match="reserved"):
        clip_segments_to_tiles(df, zoom=1)


def test_payload_rides_along_and_diagonal_cover(spark):
    # diagonal crossing both boundaries: 3 pieces (bbox fans 4, one dropped)
    out = _clip(spark, [(7, -40.0, -90.0, 40.0, 90.0)])
    assert {(r.tx, r.ty) for r in out} <= {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert len(out) >= 2  # at least the two diagonal-corner tiles
    assert all(r.seg_id == 7 for r in out)
    assert all(0 <= r.u0 <= 4096 and 0 <= r.v1 <= 4096 for r in out)


# --- clip_polygons_to_tiles (Sutherland-Hodgman) -----------------------------

import math

import pandas as pd

from gaia_spark.operators.tiling import clip_polygons_to_tiles


def _poly_df(spark, rings):
    rows = [
        {"zone_id": i, "vertices": [{"lat": la, "lon": lo} for la, lo in ring]}
        for i, ring in enumerate(rings)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows), "zone_id long, vertices array<struct<lat: double, lon: double>>"
    )


def _shoelace(us, vs):
    n = len(us)
    s = 0.0
    for i in range(n):
        j = (i + 1) % n
        s += us[i] * vs[j] - us[j] * vs[i]
    return abs(s) / 2.0


def _merc_xy(lat, lon, zoom):
    n = 1 << zoom
    x = (lon + 180.0) / 360.0 * n
    y = (1.0 - math.log(math.tan(math.radians(lat)) + 1.0 / math.cos(math.radians(lat))) / math.pi) / 2.0 * n
    return x, y


def test_polygon_clip_partitions_area(spark):
    """Pieces of a polygon cut by the tile grid must tile it: total
    shoelace area of the quantized pieces == original area (within
    quantization tolerance)."""
    zoom, extent = 1, 4096
    ring = [(-40.0, -120.0), (50.0, -100.0), (45.0, 60.0), (-30.0, 30.0), (-40.0, -120.0)]
    out = clip_polygons_to_tiles(_poly_df(spark, [ring]), zoom=zoom, extent=extent).collect()
    assert len(out) >= 2  # spans several of the 4 world tiles at z1
    # original area in EXTENT units
    pts = [_merc_xy(la, lo, zoom) for la, lo in ring[:-1]]
    orig = _shoelace([p[0] * extent for p in pts], [p[1] * extent for p in pts])
    total = sum(_shoelace(r.us, r.vs) for r in out)
    assert abs(total - orig) / orig < 1e-3
    for r in out:
        assert all(0 <= u <= extent for u in r.us)
        assert all(0 <= v <= extent for v in r.vs)


def test_polygon_fully_inside_one_tile_unchanged(spark):
    zoom, extent = 1, 4096
    ring = [(10.0, -170.0), (60.0, -150.0), (20.0, -100.0), (10.0, -170.0)]
    out = clip_polygons_to_tiles(_poly_df(spark, [ring]), zoom=zoom, extent=extent).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.tx, r.ty) == (0, 0) and r.n_vertices == 3
    exp = [_merc_xy(la, lo, zoom) for la, lo in ring[:-1]]
    for (x, y), u, v in zip(exp, r.us, r.vs):
        assert u == math.floor(x * extent + 0.5)
        assert v == math.floor(y * extent + 0.5)


def test_polygon_outside_tile_dropped(spark):
    # bbox overlaps tile (1,0) but the triangle itself stays in (0,*):
    # candidate pairs with empty intersection must vanish
    zoom = 2
    ring = [(10.0, -170.0), (40.0, -160.0), (12.0, -150.0), (10.0, -170.0)]
    out = clip_polygons_to_tiles(_poly_df(spark, [ring]), zoom=zoom).collect()
    for r in out:
        assert r.n_vertices >= 3
