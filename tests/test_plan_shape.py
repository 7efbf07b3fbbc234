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
