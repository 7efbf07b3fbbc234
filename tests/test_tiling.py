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
