"""areal_reaggregate — proportional mass redistribution invariants."""

import pandas as pd
import pyspark.sql.functions as F

from gaia_spark.operators.spatial_join import ZoneIndex
from gaia_spark.operators.zonal import areal_reaggregate


def _zones_pdf(rects):
    rows = []
    for zid, la0, lo0, la1, lo1 in rects:
        ring = [
            {"lat": la0, "lon": lo0}, {"lat": la0, "lon": lo1},
            {"lat": la1, "lon": lo1}, {"lat": la1, "lon": lo0},
            {"lat": la0, "lon": lo0},
        ]
        rows.append({"zone_id": zid, "name": f"z{zid}", "kind": "rect",
                     "category": "t", "min_lat": la0, "min_lon": lo0,
                     "max_lat": la1, "max_lon": lo1, "vertices": ring})
    return pd.DataFrame(rows)


def _feats(spark, rects_with_val):
    rows = []
    for fid, la0, lo0, la1, lo1, v in rects_with_val:
        ring = [
            {"lat": la0, "lon": lo0}, {"lat": la0, "lon": lo1},
            {"lat": la1, "lon": lo1}, {"lat": la1, "lon": lo0},
            {"lat": la0, "lon": lo0},
        ]
        rows.append({"feature_id": fid, "vertices": ring, "val": float(v)})
    return spark.createDataFrame(
        pd.DataFrame(rows),
        "feature_id long, vertices array<struct<lat: double, lon: double>>, val double",
    )


def test_areal_mass_conserved_and_split(spark):
    # two zones tiling [-10,10]x[0,40]; parcel A fully in zone 0, parcel B
    # straddling the shared lon=20 edge with 1/4 : 3/4 lon split
    zones = _zones_pdf([(0, -10.0, 0.0, 10.0, 20.0), (1, -10.0, 20.0, 10.0, 40.0)])
    idx = ZoneIndex.build(zones)
    zr = spark.createDataFrame(
        zones[["zone_id", "min_lat", "min_lon", "max_lat", "max_lon"]]
    )
    feats = _feats(spark, [
        (1, -5.0, 2.0, 5.0, 10.0, 100.0),     # inside zone 0
        (2, -4.0, 18.0, 4.0, 26.0, 80.0),     # lon 18..26: 2 deg in z0, 6 in z1
    ])
    out = {r.zone_id: r for r in areal_reaggregate(feats, idx, zr, "val").collect()}
    # same latitude band both sides of the split -> pure lon proportion
    assert abs(out[0].alloc - (100.0 + 80.0 * 2 / 8)) < 1e-9
    assert abs(out[1].alloc - 80.0 * 6 / 8) < 1e-9
    assert out[0].n_src == 2 and out[1].n_src == 1
    # total mass conserved (zones cover every feature completely)
    assert abs(out[0].alloc + out[1].alloc - 180.0) < 1e-9


def test_areal_touch_only_weighs_zero(spark):
    zones = _zones_pdf([(0, 0.0, 0.0, 10.0, 10.0)])
    idx = ZoneIndex.build(zones)
    zr = spark.createDataFrame(zones[["zone_id", "min_lat", "min_lon", "max_lat", "max_lon"]])
    feats = _feats(spark, [(1, 0.0, 10.0, 5.0, 20.0, 50.0)])  # shares only the lon=10 edge
    out = areal_reaggregate(feats, idx, zr, "val").collect()
    assert len(out) == 1 and out[0].alloc == 0.0 and out[0].n_src == 1


def test_zonal_majority_tie_breaks_to_smaller_category(spark):
    from gaia_spark.operators.zonal import zonal_majority

    rows = [
        (1, "b"), (1, "b"), (1, "a"), (1, "a"), (1, "c"),   # tie a/b -> a
        (2, "z"),                                            # singleton zone
    ]
    df = spark.createDataFrame(rows, "zone_id long, category string")
    out = {r.zone_id: r for r in zonal_majority(df).collect()}
    assert (out[1].majority, out[1].majority_n) == ("a", 2)
    assert (out[1].minority, out[1].minority_n) == ("c", 1)
    assert out[1].variety == 3
    assert (out[2].majority, out[2].minority, out[2].variety) == ("z", "z", 1)
