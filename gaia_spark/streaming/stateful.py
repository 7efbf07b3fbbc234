"""Custom stateful streaming operator: per-cell crawl-rate tracker via
applyInPandasWithState (SURVEY.md §2.K — the 'custom stateful operators'
row). Keeps a running (n_pages, first_ts, last_ts) per grid cell across
micro-batches and emits the updated snapshot each batch; state for idle
cells times out after the configured horizon.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_pages", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("cell", LongType()),
        StructField("n_pages", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _track(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # idle-cell expiry: drop the state and emit nothing — re-updating
        # here would re-arm the timeout and re-emit a stale snapshot forever
        state.remove()
        return
    n, first_ts, last_ts = (state.get if state.exists else (0, None, None))
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        lo, hi = pdf["warc_ts"].min(), pdf["warc_ts"].max()
        first_ts = lo if first_ts is None else min(first_ts, lo)
        last_ts = hi if last_ts is None else max(last_ts, hi)
    state.update((n, first_ts, last_ts))
    state.setTimeoutDuration(24 * 3600 * 1000)  # idle cells expire after 1d
    yield pd.DataFrame(
        {"cell": [key[0]], "n_pages": [n], "first_ts": [first_ts], "last_ts": [last_ts]}
    )


def stream_cell_tracker(pages: DataFrame, res: int = 6) -> DataFrame:
    """Stateful per-cell page tracker over a streaming pages DataFrame."""
    import pyspark.sql.functions as F

    from gaia_spark.functions import portable
    from gaia_spark.functions.geoparse import geoparse

    pts = geoparse(pages).where(F.col("lat").isNotNull())
    pts = pts.withColumn("cell", F.expr(portable.cell_id_sql("lat", "lon", res)))
    return (
        pts.select("cell", "warc_ts")
        .groupBy("cell")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
