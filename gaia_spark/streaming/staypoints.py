"""Streaming stay-point detection: the movement tier's stateful operator
(SURVEY.md §2.K custom stateful operators), the streaming twin of
``operators.trajectory.stay_points``.

Per-user state carries the OPEN dwell episode (previous point, running
exact-integer centroid sums, first/last ts, stay counter); each
micro-batch folds the user's new points in (ts, event_id) order and emits
every episode CLOSED by a >threshold leg — identical runs, numbering and
centroids to the batch operator when points arrive in order (late data is
the ingest tier's watermark concern, documented there).

Determinism: the same e4 floor quantization and the numpy haversine twin
(`kernel.haversine_m` — same op order as the SQL string) as the batch
path, so closed stays are BIT-equal to batch output — asserted by the
parity test, the streaming-tier discipline."""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("last_lat", DoubleType()),
        StructField("last_lon", DoubleType()),
        StructField("stay_no", LongType()),
        StructField("n_points", LongType()),
        StructField("sum_lat_e4", LongType()),
        StructField("sum_lon_e4", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stay_no", LongType()),
        StructField("n_points", LongType()),
        StructField("dur_s", LongType()),
        StructField("clat_e4", LongType()),
        StructField("clon_e4", LongType()),
    ]
)


def _hav_m(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    from gaia_spark.functions.kernel import haversine_m

    return float(haversine_m(lat1, lon1, lat2, lon2))


def _e4(v: float) -> int:
    return math.floor(v * 10000 + 0.5)


def make_tracker(dist_m: float, min_points: int, min_dur_s: int):
    def track(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - NoTimeout in tests
            state.remove()
            return
        if state.exists:
            (last_lat, last_lon, stay_no, n, s_lat, s_lon, first_ts, last_ts) = (
                state.get
            )
        else:
            last_lat = None
            # batch numbering starts at 1 (the first point raises new_stay)
            stay_no, n, s_lat, s_lon, first_ts, last_ts = 1, 0, 0, 0, None, None
        closed = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for row in pdf.itertuples():
                lat, lon, ts = float(row.lat), float(row.lon), row.ts
                same = (
                    last_lat is not None
                    and _hav_m(last_lat, last_lon, lat, lon) < dist_m
                )
                if same:
                    n += 1
                    s_lat += _e4(lat + 90.0)
                    s_lon += _e4(lon + 180.0)
                    last_ts = ts
                else:
                    if last_lat is not None:
                        dur = math.floor((last_ts - first_ts).total_seconds())
                        if n >= min_points and dur >= min_dur_s:
                            closed.append(
                                (
                                    key[0], stay_no, n, dur,
                                    s_lat // n - 900000, s_lon // n - 1800000,
                                )
                            )
                        stay_no += 1
                    n = 1
                    s_lat = _e4(lat + 90.0)
                    s_lon = _e4(lon + 180.0)
                    first_ts = last_ts = ts
                last_lat, last_lon = lat, lon
        state.update(
            (last_lat, last_lon, stay_no, n, s_lat, s_lon, first_ts, last_ts)
        )
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "stay_no", "n_points", "dur_s",
                    "clat_e4", "clon_e4",
                ],
            )

    return track


def stream_stay_points(
    events: DataFrame,
    dist_m: float = 10000.0,
    min_points: int = 3,
    min_dur_s: int = 600,
) -> DataFrame:
    """Stateful streaming stay-point detector over an events stream with
    (user_id, ts, event_id, lat, lon). Emits episodes as they CLOSE."""
    return (
        events.select("user_id", "ts", "event_id", "lat", "lon")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_tracker(dist_m, min_points, min_dur_s),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
