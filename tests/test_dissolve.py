"""dissolve_rings / dissolve_parts — closed-form mesh fixtures."""

import pyspark.sql.functions as F

from gaia_spark.functions.kernel import haversine_m
from gaia_spark.operators.dissolve import dissolve_parts, dissolve_rings


def _cells(spark, cells):
    # cells: (group, fid, gx, gy) unit-degree grid cells at (gx..gx+1, gy..gy+1)
    rows = [
        {
            "grp": g,
            "fid": f,
            "vertices": [
                {"lat": float(gy), "lon": float(gx)},
                {"lat": float(gy), "lon": float(gx + 1)},
                {"lat": float(gy + 1), "lon": float(gx + 1)},
                {"lat": float(gy + 1), "lon": float(gx)},
                {"lat": float(gy), "lon": float(gx)},
            ],
        }
        for g, f, gx, gy in cells
    ]
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows),
        "grp long, fid long, vertices array<struct<lat: double, lon: double>>",
    )


def _seg(lat1, lon1, lat2, lon2):
    return int(haversine_m(lat1, lon1, lat2, lon2) * 1000 + 0.5)


def test_l_shape_boundary(spark):
    """Three unit cells in an L: interior edges cancel, outline = 8 unit
    sides (exact integer-mm sum of the surviving edges)."""
    cells = [(0, 1, 0, 0), (0, 2, 1, 0), (0, 3, 0, 1)]
    out = dissolve_rings(_cells(spark, cells), group_col="grp", id_col="fid").collect()
    assert len(out) == 1 and out[0].n_features == 3
    # outline edges of the L (unit steps): enumerate explicitly
    expected = (
        _seg(0, 0, 0, 1) + _seg(0, 1, 0, 2)          # bottom
        + _seg(0, 2, 1, 2)                           # right of cell (1,0)
        + _seg(1, 1, 1, 2)                           # top of cell (1,0)
        + _seg(1, 1, 2, 1)                           # right of cell (0,1)
        + _seg(2, 0, 2, 1)                           # top of cell (0,1)
        + _seg(0, 0, 1, 0) + _seg(1, 0, 2, 0)        # left side
    )
    assert out[0].boundary_m_e3 == expected


def test_parts_and_cross_group_edges(spark):
    """Two touching cells of DIFFERENT groups don't merge (the shared edge
    stays boundary in each); a group with two detached cells has 2 parts."""
    cells = [
        (0, 1, 0, 0), (1, 2, 1, 0),        # neighbors, different groups
        (2, 3, 5, 5), (2, 4, 7, 5),        # same group, detached
        (2, 5, 8, 5),                      # attached to fid 4
    ]
    df = _cells(spark, cells)
    parts = {r.grp: r.n_parts for r in dissolve_parts(df, group_col="grp", id_col="fid").collect()}
    assert parts == {0: 1, 1: 1, 2: 2}
    rings = {r.grp: r for r in dissolve_rings(df, group_col="grp", id_col="fid").collect()}
    # each single-cell group keeps its full 4-side perimeter
    full = (
        _seg(0, 0, 0, 1) + _seg(1, 0, 1, 1) + _seg(0, 0, 1, 0) + _seg(0, 1, 1, 1)
    )
    assert rings[0].boundary_m_e3 == full
    assert rings[1].boundary_m_e3 == full


def test_area_additivity(spark):
    """Dissolved area equals the integer sum of member-ring areas
    regardless of grouping (partition invariance of the fixed-point sum)."""
    cells = [(0, i, i, 0) for i in range(6)]
    one = dissolve_rings(_cells(spark, cells), group_col="grp", id_col="fid").collect()[0]
    split = [(i % 2, i, i, 0) for i in range(6)]
    two = dissolve_rings(_cells(spark, split), group_col="grp", id_col="fid").collect()
    assert one.area_m2_e3 == sum(r.area_m2_e3 for r in two)
