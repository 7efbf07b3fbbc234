"""As-of (backward nearest-in-time) join — SURVEY.md §2.C interval/as-of.

For each left row, attach the latest right row with the same key and
``ts_right <= ts_left``. Spark has no ASOF join operator; the scalable
realization is the union + last-non-null-window trick:

    tag both sides, UNION ALL, window per key ordered by (ts, tag),
    carry the right side's payload forward with last(ignorenulls=True),
    keep only left rows.

One shuffle on the key, no range explosion, no driver loops — the same
plan shape Flink/Kafka-streams use for temporal joins. Right rows with
duplicate (key, ts) are deduped to the max sequence id first so the pick
is deterministic (DuckDB's ASOF JOIN oracle mirrors this).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def interval_join(
    intervals: DataFrame,
    events: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket_s: int = 600,
) -> DataFrame:
    """Interval (range) join: every ``events`` row paired with every
    ``intervals`` row of the same ``key`` whose half-open window
    ``[start, end)`` contains ``ts``. Spark's optimizer turns a raw
    inequality join into BroadcastNestedLoopJoin (quadratic, undistributed);
    instead each interval is exploded onto the coarse time BUCKETS it
    overlaps (``sequence`` over floor-divided epoch micros — in-plan, no
    driver loop), events map to exactly one bucket, and the only shuffle is
    an equi-join on ``(key, bucket)`` followed by the exact window filter.
    An event has one bucket, so a (interval, event) pair can meet on at most
    one bucket — no post-join dedup. Choose ``bucket_s`` near the typical
    interval length: buckets-per-interval = len/bucket_s + 1. Hot
    ``(key, bucket)`` pairs (heavy users) are AQE-skew-split; the join keys
    carry both columns so salting composes if needed.

    Returns intervals' columns (left) + events' columns, cross-prefixed
    ``l_``/``r_`` only where names collide."""
    w_us = int(bucket_s) * 1_000_000
    dup = set(intervals.columns) & set(events.columns)
    ev = events
    for c in dup:
        if c not in (key,):
            intervals = intervals.withColumnRenamed(c, f"l_{c}")
            ev = ev.withColumnRenamed(c, f"r_{c}")
    start_c = f"l_{start}" if start in dup and start != key else start
    end_c = f"l_{end}" if end in dup and end != key else end
    ts_c = f"r_{ts}" if ts in dup and ts != key else ts
    # unix_micros rejects TIMESTAMP_NTZ (parquet default); the cast shifts
    # all three columns by the same session-TZ offset, so bucket alignment
    # and the exact window filter are unaffected.
    us = "unix_micros(cast({c} as timestamp))"
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.expr(
                f"sequence(cast(floor({us.format(c=start_c)} / {w_us}) as bigint), "
                f"cast(floor(({us.format(c=end_c)} - 1) / {w_us}) as bigint))"
            )
        ),
    )
    evb = ev.withColumn(
        "_bkt", F.expr(f"cast(floor({us.format(c=ts_c)} / {w_us}) as bigint)")
    )
    out = iv.join(evb, on=[key, "_bkt"]).where(
        (F.col(ts_c) >= F.col(start_c)) & (F.col(ts_c) < F.col(end_c))
    )
    return out.drop("_bkt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: list[str],
    seq: str | None = None,
) -> DataFrame:
    """Returns left columns + right ``payload`` columns (null when no right
    row precedes). ``seq``: tiebreak column for duplicate right (key, ts)."""
    if seq is not None:
        w_dedup = Window.partitionBy(key, ts).orderBy(F.desc(seq))
        right = (
            right.withColumn("_rn", F.row_number().over(w_dedup))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    # the whole payload is carried as ONE struct under a single
    # last(ignorenulls=True): every asof_* column then comes from the SAME
    # matched right row — carrying columns independently would backfill a
    # NULL payload value from an older right row, silently mixing rows.
    r_struct = F.struct(*[F.col(p).alias(p) for p in payload])
    l_tag = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_tag"),
        F.lit(None).cast(
            right.select(r_struct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
        F.struct(*left.columns).alias("_l"),
    )
    r_tag = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_tag"),
        r_struct.alias("_r"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
    )
    u = l_tag.unionByName(r_tag)
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col("_tag").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = u.select(
        "_l",
        "_tag",
        F.last("_r", ignorenulls=True).over(w).alias("_c"),
    ).where(F.col("_tag") == 1)
    out = carried.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_c.{p}").alias(f"asof_{p}") for p in payload],
    )
    return out
