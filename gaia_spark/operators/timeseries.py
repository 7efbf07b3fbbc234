"""Time-series regularization: resample an irregular event stream onto a
fixed bucket grid with forward-fill — the gap-filling step every
sensor/metrics pipeline runs before windowed analytics (`[R] SURVEY.md
§2.G` frame analytics family; the batch twin of the streaming windowed
aggregates).

Scale shape (100 TB): per-key work only — the bucket grid is generated
IN-PLAN (``sequence`` between the key's first and last bucket, exploded),
the last-observation pick is an order-independent ``max(struct(...))``
aggregate (map-side combinable; the unique event id makes the lexicographic
max deterministic without ever comparing float payloads), and the
forward fill is ONE window partitioned by key — no global window, no
driver state, no Python. Wall-clock scales with max gap length per key,
not corpus size.

Engine-determinism: the filled value is a single PICKED double (no
summation), quantized e2 at pick time; bucket indices are exact integer
floor-divisions of epoch micros (UTC session TZ — the unix_micros NTZ
cast shifts by the session offset, which is zero here and uniform in
general)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from gaia_spark.functions import portable as P


def resample_ffill(
    events: DataFrame,
    bucket_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    value_scale: int = 2,
) -> DataFrame:
    """Resample each key's event series onto ``bucket_s``-second buckets
    from its first to its last observed bucket. Returns (key, bucket,
    n_events, v_e{scale}) where v is the value of the LATEST event at or
    before the bucket's end (ties broken by event id), carried forward
    across empty buckets (n_events = 0)."""
    for c in ("bucket", "n_events", "_pick"):
        if c in events.columns:
            raise ValueError(f"reserved column {c!r} present in events")
    us = int(bucket_s) * 1_000_000
    ev = events.select(
        F.col(key_col).alias("_k"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {us}").alias("bucket"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.expr(P.floor_scaled_sql(f"cast({value_col} as double)", value_scale)).alias("_v"),
    )
    per_bucket = ev.groupBy("_k", "bucket").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max(F.struct("_ts", "_id", "_v")).alias("_pick"),
    )
    grid = (
        ev.groupBy("_k")
        .agg(F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
        .withColumn("bucket", F.explode(F.expr("sequence(_b0, _b1)")))
        .select("_k", "bucket")
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vname = f"v_e{value_scale}"
    return (
        grid.join(per_bucket, ["_k", "bucket"], "left")
        .select(
            "_k",
            "bucket",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.col("_pick._v").alias("_vq"),
        )
        .withColumn(vname, F.last("_vq", ignorenulls=True).over(w))
        .select(F.col("_k").alias(key_col), "bucket", "n_events", vname)
    )
