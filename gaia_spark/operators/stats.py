"""Spatial statistics: weights, Moran's I autocorrelation, grid clustering.

Reference semantics: ``[R] gaia/geo/processes_vector.py ::
{Weight,Autocorrelation,Cluster}Process`` (pysal-backed in the reference; no
pysal offline, so the math is spelled out as DataFrame aggregations).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gaia_spark.functions import portable


def cell_rook_weights(cells: DataFrame, res: int, cell_col: str = "cell") -> DataFrame:
    """WeightProcess (rook contiguity on the grid): adjacency rows
    (cell, neighbor, w=1.0). Longitude wraps, latitude clamps; only
    neighbors that actually hold data survive the join."""
    n = 1 << res
    c = cells.select(cell_col).distinct()
    x = F.expr(f"({cell_col} % {n})")
    y = F.expr(portable.idiv_sql(cell_col, n))
    nbrs = c.select(
        F.col(cell_col),
        F.explode(
            F.array(
                (y * n + (x + 1) % n).alias("e"),
                (y * n + (x - 1 + n) % n).alias("w"),
                F.when(y + 1 < n, (y + 1) * n + x).alias("s"),
                F.when(y - 1 >= 0, (y - 1) * n + x).alias("n"),
            )
        ).alias("neighbor"),
    ).where(F.col("neighbor").isNotNull())
    present = c.select(F.col(cell_col).alias("neighbor"))
    return nbrs.join(present, "neighbor", "left_semi").withColumn("w", F.lit(1.0))


def morans_i(
    values: DataFrame,
    weights: DataFrame,
    cell_col: str = "cell",
    value_col: str = "v",
) -> DataFrame:
    """Global Moran's I: (n / ΣΣw) · Σ w_ij·z_i·z_j / Σ z_i², z = v - mean.

    Two broadcast-friendly aggregations + one self-join on the adjacency
    list — no O(n²) anywhere (AutocorrelationProcess role; permutation
    p-values are omitted: no unseeded randomness allowed in this engine).
    """
    stats = values.agg(
        F.avg(value_col).alias("_mean"), F.count("*").cast("double").alias("_n")
    )
    z = values.crossJoin(F.broadcast(stats)).select(
        F.col(cell_col), (F.col(value_col) - F.col("_mean")).alias("z"), "_n"
    )
    zj = z.select(F.col(cell_col).alias("neighbor"), F.col("z").alias("z_j"))
    num = (
        weights.join(z.withColumnRenamed("z", "z_i"), cell_col)
        .join(zj, "neighbor")
        .agg(
            F.sum(F.col("w") * F.col("z_i") * F.col("z_j")).alias("_num"),
            F.sum("w").alias("_sw"),
            F.first("_n").alias("_n"),
        )
    )
    den = z.agg(F.sum(F.col("z") * F.col("z")).alias("_den"))
    return num.crossJoin(den).select(
        ((F.col("_n") / F.col("_sw")) * (F.col("_num") / F.col("_den"))).alias("moran_i")
    )


def grid_dbscan(
    points: DataFrame,
    res: int,
    min_pts: int,
    point_key: str = "url",
    max_iter: int = 30,
) -> DataFrame:
    """ClusterProcess as grid-DBSCAN: dense cells (count ≥ min_pts) are core;
    clusters are connected components of dense cells under rook adjacency,
    found by iterative min-label propagation (no GraphFrames offline).
    Returns (cell, cluster_id); join points back on cell for membership.

    Label propagation converges in O(diameter) rounds; localCheckpoint cuts
    the lineage every round so plans stay flat.
    """
    from gaia_spark.operators.spatial_join import with_cell

    dense = (
        with_cell(points.where(F.col("lat").isNotNull()), res, out="cell")
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_pts)
        .select("cell")
    )
    adj = cell_rook_weights(dense, res).select("cell", "neighbor")
    labels = dense.select("cell", F.col("cell").alias("label")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        prop = (
            adj.join(labels, "cell")
            .groupBy("neighbor")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("neighbor", "cell")
        )
        new = (
            labels.join(prop, "cell", "left")
            .select(
                "cell",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        converged = (
            new.alias("a")
            .join(labels.alias("b"), "cell")
            .where(F.col("a.label") != F.col("b.label"))
            .isEmpty()
        )
        labels = new
        if converged:
            break
    return labels.withColumnRenamed("label", "cluster_id")
