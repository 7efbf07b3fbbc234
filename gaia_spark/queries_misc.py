"""Registry tranche 4: non-SQL-expressible operators, exposed as rows-only
driver checks (no oracle entry → the driver records count/schema stability).
Each is deterministic, so row counts are stable across runs."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gaia_spark.functions import portable as P
from gaia_spark.queries import customer_points, load, register


@register("q_dbscan_clusters", oracle=None)
def q_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClusterProcess: grid-DBSCAN over customer points (rows-only check —
    iterative label propagation isn't single-statement SQL)."""
    from gaia_spark.operators.stats import grid_dbscan

    pts = customer_points(spark, sf_dir)
    labels = grid_dbscan(pts, res=4, min_pts=3, point_key="c_custkey")
    return labels.groupBy("cluster_id").agg(F.count("*").alias("n_cells")).orderBy("cluster_id")


@register("q_buffer_rings", oracle=None)
def q_buffer_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BufferProcess: 32-gon spherical buffers around supplier-derived
    points; verify ring arity + haversine radius JVM-side."""
    from gaia_spark.operators.scalar_geo import add_buffer

    s = (
        load(spark, sf_dir, "supplier")
        .withColumn("lat", F.expr(P.key_lat_sql("s_suppkey")))
        .withColumn("lon", F.expr(P.key_lon_sql("s_suppkey")))
    )
    b = add_buffer(s, 100_000.0)
    first_dist = P.haversine_m_sql("lat", "lon", "element_at(buffer, 1).lat", "element_at(buffer, 1).lon")
    return b.select(
        "s_suppkey",
        F.size("buffer").alias("n_vertices"),
        F.expr(P.floor_scaled_sql(first_dist, 0)).alias("radius_m_e0"),
    )


@register("q_ann_lsh", oracle=None)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via hyperplane-LSH bucketing (recall vs exact is
    workload-dependent → rows-only; exact top-k is oracle-checked in
    q_embed_knn)."""
    from gaia_spark.operators.simsearch import ann_topk_lsh

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_topk_lsh(emb, queries, k=3, n_planes=4)


@register("q_raster_zonal", oracle=None)
def q_raster_zonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster→vector zonal stats over the analytic-surface tile pyramid
    (ZonalStatsProcess on raster input; closed-form-checked in pytest)."""
    from gaia_spark.operators.spatial_join import ZoneIndex
    from gaia_spark.operators.zonal import pixel_zonal_stats
    from gaia_spark.queries import oracle_zones_pdf
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(3,), bands=(0,))
    idx = ZoneIndex.build(oracle_zones_pdf())
    stats = pixel_zonal_stats(raster, idx, band=0)
    return stats.select(
        "zone_id",
        F.col("count").cast("long").alias("n_px"),
        F.expr(P.floor_scaled_sql("mean", 2)).alias("mean_e2"),
    )


@register("q_media_features", oracle=None)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payloads → stubbed decode features via
    mapInPandas (codec-free deterministic fake)."""
    from gaia_spark.operators.multimodal import extract_media_features

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    feats = extract_media_features(docs, "payload")
    return feats.select(
        "doc_id", "width", "height", "channels", F.size("feat").alias("n_feat")
    )
