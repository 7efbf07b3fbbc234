"""Trajectory analytics over event streams: origin–destination flow
matrices and per-user movement statistics.

Role: the movement-analysis layer of the reference's analytics surface
(`[R] SURVEY.md §2.G window analytics` + `§2.E cell encode`) — given a
georeferenced event stream, aggregate WHERE users move (flows between
grid cells) and HOW FAR (leg distances along each user's timeline).

Scale shape (100 TB): everything hangs off ONE window shuffle partitioned
by user — lag() gives the previous position, then either a cell-pair
groupBy (flows; second, much smaller shuffle on the flow matrix whose
cardinality is bounded by cells², not events) or a per-user agg that
reuses the SAME (user) partitioning, so AQE coalesces without a second
exchange. No Python, no self-join of the events table (the naive
"join events to next event" doubles the scan and shuffles twice). A
power-user with millions of events bounds a single partition — at cluster
scale, salt the user key into (user, day) windows if one user's history
exceeds an executor; flows are then exact, trip stats per-day partials.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from gaia_spark.functions import portable as P


def with_prev_point(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Attach the previous event's (lat, lon) along each user's timeline.
    Order is (ts, tiebreak) — deterministic under timestamp ties, which an
    oracle comparison requires. First event per user gets NULL prevs."""
    for out in ("prev_lat", "prev_lon"):
        if out in df.columns:
            raise ValueError(f"column '{out}' already present; rename it first")
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    return df.withColumn("prev_lat", F.lag(lat).over(w)).withColumn(
        "prev_lon", F.lag(lon).over(w)
    )


def od_flows(
    df: DataFrame,
    res: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Origin–destination flow matrix: count of consecutive-event
    transitions between grid cells at ``res`` (self-loops included — they
    are the stay signal). Returns (cell_from, cell_to, n_trips)."""
    d = with_prev_point(df, user_col, ts_col, tiebreak_col, lat, lon)
    d = d.where(F.col("prev_lat").isNotNull())
    return (
        d.select(
            F.expr(P.cell_id_sql("prev_lat", "prev_lon", res)).alias("cell_from"),
            F.expr(P.cell_id_sql(lat, lon, res)).alias("cell_to"),
        )
        .groupBy("cell_from", "cell_to")
        .agg(F.count("*").alias("n_trips"))
    )


def trip_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Per-user movement summary over consecutive-event legs: leg count,
    total and maximum great-circle leg length (fixed-point mm via e3 —
    floor-scaled so both engines integerize identical doubles). Users with
    a single event surface with n_legs = 0 and zero distances."""
    d = with_prev_point(df, user_col, ts_col, tiebreak_col, lat, lon)
    leg = P.haversine_m_sql("prev_lat", "prev_lon", lat, lon)
    legs = d.withColumn(
        "leg_m", F.when(F.col("prev_lat").isNotNull(), F.expr(leg)).otherwise(None)
    )
    return legs.groupBy(user_col).agg(
        F.count("leg_m").cast("long").alias("n_legs"),
        F.expr(P.floor_scaled_sql("coalesce(sum(leg_m), cast(0 as double))", 3)).alias(
            "total_m_e3"
        ),
        F.expr(P.floor_scaled_sql("coalesce(max(leg_m), cast(0 as double))", 3)).alias(
            "max_leg_m_e3"
        ),
    )
