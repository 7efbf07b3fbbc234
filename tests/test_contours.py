"""Marching-squares contours: independent numpy reference + the
continuity property (every crossing on an interior shared edge is reported
by exactly the two windows that own it)."""

import math
from collections import Counter

import numpy as np

from gaia_spark.operators.raster import _MS_SEG1, _MS_SEG2, contour_segments
from gaia_spark.synth import synth_raster
from tests.test_focal import _reference_grid

LVL = 25.0
LVL_E4 = int(math.floor(LVL * 1e4 + 0.5))


def _numpy_segments(ve: np.ndarray):
    """Same convention as the operator, implemented independently."""
    n = ve.shape[0]
    out = []
    for wr in range(n - 1):
        for wc in range(n):
            v00, v01 = ve[wr, wc], ve[wr, (wc + 1) % n]
            v10, v11 = ve[wr + 1, wc], ve[wr + 1, (wc + 1) % n]
            code = (
                (8 if v00 >= LVL_E4 else 0)
                + (4 if v01 >= LVL_E4 else 0)
                + (2 if v11 >= LVL_E4 else 0)
                + (1 if v10 >= LVL_E4 else 0)
            )
            t = {
                "T": ((LVL_E4 - v00) / (v01 - v00) if v01 != v00 else None, 0.0),
                "B": ((LVL_E4 - v10) / (v11 - v10) if v11 != v10 else None, 1.0),
                "L": (0.0, (LVL_E4 - v00) / (v10 - v00) if v10 != v00 else None),
                "R": (1.0, (LVL_E4 - v01) / (v11 - v01) if v11 != v01 else None),
            }

            def pt(edge):
                x, y = t[edge]
                if edge in ("T", "B"):
                    return (wc + x, wr + y)
                return (wc + x, wr + y)

            for seg_no, table in ((1, _MS_SEG1), (2, _MS_SEG2)):
                if code in table:
                    ea, eb = table[code]
                    (x1, y1), (x2, y2) = pt(ea), pt(eb)
                    out.append(
                        (
                            wr,
                            wc,
                            seg_no,
                            int(math.floor(x1 * 1e6 + 0.5)),
                            int(math.floor(y1 * 1e6 + 0.5)),
                            int(math.floor(x2 * 1e6 + 0.5)),
                            int(math.floor(y2 * 1e6 + 0.5)),
                        )
                    )
    return out


def test_contours_vs_numpy_reference(spark):
    zoom = 1
    raster = synth_raster(spark, zooms=(zoom,), bands=(0,))
    got = sorted(map(tuple, contour_segments(raster, zoom, LVL).collect()))

    g = _reference_grid(zoom, 0)
    ve = np.floor(g * 1e4 + 0.5).astype(np.int64)
    want = sorted(_numpy_segments(ve))
    assert len(got) > 100
    assert got == want


def test_contours_continuity(spark):
    """Each crossing point on an interior edge shared by two windows is
    emitted exactly twice — the property that makes segments chain into
    closed isolines (or terminate on the clamped top/bottom rows)."""
    zoom = 1
    raster = synth_raster(spark, zooms=(zoom,), bands=(0,))
    rows = contour_segments(raster, zoom, LVL).collect()
    n = 128  # 2 tiles * 64 px
    pts = Counter()
    for r in rows:
        for x, y in ((r.x1_e6, r.y1_e6), (r.x2_e6, r.y2_e6)):
            # longitude wraps: x = n and x = 0 name the same vertical edge
            pts[(x % (n * 10**6), y)] += 1
    for (x, y), cnt in pts.items():
        on_border = y == 0 or y == (n - 1) * 10**6
        assert cnt == 2 or on_border, ((x, y), cnt)
