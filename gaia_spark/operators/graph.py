"""Link-graph analytics: PageRank over the host graph of a web corpus.

Role: the web-scale companion of the engine's iterative tier (`[R]
SURVEY.md §2.I ClusterProcess` pointer-doubling components are the other
member): host authority scores drive crawl prioritization and quality
priors for training-data selection.

Scale shape (100 TB): classic power iteration as pure DataFrame ops —
each round is ONE join (ranks onto edges by src) + ONE groupBy(dst) agg
(map-side combinable) + a broadcast of two scalars (node count, dangling
mass); lineage is cut per round via iter_checkpoint (reliable= for real
clusters). No Python, no adjacency collection; a hot dst (everyone links
to one host) is an agg skew handled by partial aggregation, not a join
skew.

Engine-determinism: ranks are re-quantized to fixed-point 10^-12 BETWEEN
iterations (the MinHash determinism lesson applied to iterative float
algorithms). Per-round float summation error (≤ ~1e-16 for corpus-scale
in-degrees) is absorbed by the quantization step, so Spark and any
replaying engine (the DuckDB oracle chains the same k CTE rounds) produce
bit-identical ranks at every iteration — the approximation is the
documented semantic, not a fudge."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gaia_spark.functions import portable as P


def rank_update_sql(contrib: str, dangling: str, n: str, damping: float) -> str:
    """One PageRank update, shared verbatim with the oracle:
    (1-d)/n + d · (contrib + dangling/n), then fixed-point e12."""
    d = f"cast({damping} as double)"
    raw = (
        f"((cast(1 as double) - {d}) / {n} + {d} * (({contrib}) + ({dangling}) / {n}))"
    )
    return f"(cast({P.floor_scaled_sql(raw, 12)} as double) / cast(1000000000000 as double))"


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list (deduplicated edges expected).
    Nodes = union of srcs and dsts; dangling nodes (no out-edges) donate
    their mass uniformly. Returns (node, rank) after ``iters`` rounds from
    the uniform start, rank re-quantized to e12 each round."""
    from gaia_spark.session import iter_checkpoint

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("out_deg"))
    base = nodes.join(deg, nodes["node"] == deg["src"], "left").select(
        "node", F.coalesce("out_deg", F.lit(None)).alias("out_deg")
    )
    n = base.count()  # one scalar; the only driver-side value
    n_sql = f"cast({n} as double)"

    ranks = iter_checkpoint(
        base.withColumn("rank", F.lit(1.0) / F.lit(float(n))), reliable_checkpoint
    )
    for _ in range(iters):
        dangling = (
            ranks.where(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        contrib = (
            e.join(ranks.where(F.col("out_deg").isNotNull()), e["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("_contrib"))
        )
        ranks = (
            ranks.select("node", "out_deg")
            .join(contrib, F.col("node") == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "out_deg",
                F.expr(
                    rank_update_sql("coalesce(_contrib, cast(0 as double))", "_dm", n_sql, damping)
                ).alias("rank"),
            )
        )
        ranks = iter_checkpoint(ranks, reliable_checkpoint)
    return ranks.select("node", "rank")


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    iters: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    source_col: str = "node",
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Multi-source shortest paths by ``iters`` Bellman–Ford relaxation
    rounds (distance to the NEAREST source; paths longer than ``iters``
    hops stay undiscovered — the caller picks iters ≥ graph diameter for
    the exact fixpoint).

    Scale shape (100 TB): each round is ONE equi-join (frontier onto edges
    by src) + ONE combinable groupBy(node) min — the PageRank plan with a
    (min, +) semiring instead of (sum, ·); unreached nodes are simply
    ABSENT (no infinity sentinels shuffling around), and lineage is cut
    per round via iter_checkpoint.

    Engine-determinism needs NO quantization trick here: ``min`` is
    order-independent, and the kept value is the double computed along one
    specific relaxation chain — identical in any engine that replays the
    same round structure (the oracle chains the same k CTE rounds).
    Negative weights are rejected (they'd make the truncated iteration
    semantically murky)."""
    from gaia_spark.session import iter_checkpoint

    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("double").alias("w"),
    ).withColumn(
        # JVM-side precondition (codegen'd, no Python): fails the job on
        # the first negative weight instead of silently mis-relaxing
        "w", F.when(F.col("w") >= 0, F.col("w")).otherwise(F.expr("raise_error('shortest_paths: negative edge weight')"))
    )
    dist = sources.select(
        F.col(source_col).alias("node"), F.lit(0.0).alias("dist")
    ).distinct()
    dist = iter_checkpoint(dist, reliable_checkpoint)
    for _ in range(iters):
        relaxed = (
            e.join(dist, e["src"] == dist["node"])
            .select("dst", (F.col("dist") + F.col("w")).alias("dist"))
            .withColumnRenamed("dst", "node")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        dist = iter_checkpoint(dist, reliable_checkpoint)
    return dist
