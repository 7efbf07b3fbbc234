"""viewshed — brute-force Python replica + closed-form wall fixture."""

import pyspark.sql.functions as F

from gaia_spark.operators.visibility import viewshed


def _px(spark, rows):
    return spark.createDataFrame(rows, "r long, c long, v_e4 long")


def _ref_viewshed(cells, r0, c0, radius, h_e4):
    """Row-at-a-time replica of the R3 nearest-cell algorithm with the
    same exact-integer rounding and sign-cased angle comparison."""
    elev = {(r, c): v for r, c, v in cells}
    e0 = elev[(r0, c0)] + h_e4
    out = {}
    for (r, c), v in elev.items():
        dr, dc = r - r0, c - c0
        d2 = dr * dr + dc * dc
        if d2 == 0 or d2 > radius * radius:
            continue
        m = max(abs(dr), abs(dc))
        if m <= 1:
            out[(r, c)] = True
            continue
        et = v - e0
        visible = True
        for k in range(1, m):
            sr = r0 + (2 * k * dr + m + 2 * m * radius) // (2 * m) - radius
            sc = c0 + (2 * k * dc + m + 2 * m * radius) // (2 * m) - radius
            es = elev[(sr, sc)] - e0
            if es >= 0 and et < 0:
                blocked = True
            elif es < 0 and et >= 0:
                blocked = False
            elif es >= 0:
                blocked = es * es * d2 >= et * et * ((sr - r0) ** 2 + (sc - c0) ** 2)
            else:
                blocked = es * es * d2 <= et * et * ((sr - r0) ** 2 + (sc - c0) ** 2)
            if blocked:
                visible = False
                break
        out[(r, c)] = visible
    return out


def test_viewshed_wall_blocks_far_side(spark):
    # flat plain with a tall wall at c=3 (rows 1..5): cells at c>=4 directly
    # east of the observer are hidden, the wall crest itself is visible
    rows = []
    for r in range(7):
        for c in range(7):
            v = 500000 if (c == 3 and 1 <= r <= 5) else 0
            rows.append((r, c, v))
    out = {(x.r, x.c): x.visible for x in
           viewshed(_px(spark, rows), 3, 1, 4, 10000).collect()}
    assert out[(3, 3)] is True       # wall crest seen
    assert out[(3, 4)] is False      # straight behind the wall
    assert out[(3, 5)] is False
    assert out[(3, 2)] is True       # foreground plain
    assert out[(2, 1)] is True       # adjacent always visible
    ref = _ref_viewshed(rows, 3, 1, 4, 10000)
    assert out == ref


def test_viewshed_matches_bruteforce_on_rough_terrain(spark):
    # deterministic rough surface: every visibility case (above/below
    # observer, grazing angles) exercised, compared cell-for-cell
    rows = [
        (r, c, ((r * 37 + c * 101) % 13) * 40000 - 240000)
        for r in range(11)
        for c in range(11)
    ]
    out = {(x.r, x.c): x.visible for x in
           viewshed(_px(spark, rows), 5, 5, 5, 20000).collect()}
    ref = _ref_viewshed(rows, 5, 5, 5, 20000)
    assert out == ref
    assert len(out) > 60 and any(out.values()) and not all(out.values())
