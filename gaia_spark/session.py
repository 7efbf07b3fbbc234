"""SparkSession builder with the engine's standard configuration.

The confs encode the scale posture from SURVEY.md §4.2: AQE on (runtime
re-planning + skew-join splitting), Arrow on (vectorized pandas UDF
boundary), bounded Arrow batches (UDF memory stays flat regardless of
partition size), and an explicit shuffle-partition default sized for the
local harness (overridable for cluster runs via ``confs``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.shuffle.partitions": "32",
    # Broadcast anything under 64 MB: zone covers / site lists are small
    # dimensions next to a pages fact table (SURVEY.md §2.C).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
}


def get_session(
    master: str | None = None,
    app_name: str = "gaia_spark",
    confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    merged = dict(DEFAULT_CONFS)
    if confs:
        merged.update(confs)
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def iter_checkpoint(df, reliable: bool = False):
    """Lineage cut for iterative operators (ring expansion, min-label
    propagation): ``localCheckpoint`` by default — right locally and
    cheapest on a cluster, but its blocks live on executors and are LOST on
    executor death, which fails the job mid-iteration. On a real cluster
    with preemptible executors pass ``reliable=True`` to write a
    fault-tolerant checkpoint instead (requires
    ``spark.sparkContext.setCheckpointDir(<hdfs/s3 path>)`` once per app).
    """
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
