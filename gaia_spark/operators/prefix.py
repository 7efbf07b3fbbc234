"""Distributed ordered prefix sum + training-data sequence packing.

The naive Spark prefix sum — ``sum().over(Window.orderBy(k))`` with no
partition key — collapses the whole table into ONE task (Spark warns:
"No Partition Defined for Window operation"); at 10^12 rows that is the
job. The scalable shape here is the classic two-phase scan:

1. rows are bucketed by their (integer) order key: ``bucket = key // B``;
2. per-(part, bucket) totals — a tiny aggregate, one row per bucket —
   are prefix-summed with a window over BUCKETS (thousands of rows, not
   trillions) to give each bucket its starting offset;
3. the offsets broadcast-join back and a window PARTITIONED by bucket
   (parallel, bounded state) finishes the within-bucket scan.

Total cost: one narrow aggregate, one broadcast join, one bucket-local
window — every stage parallel, no global sort, no single-task window.

``pack_token_spans`` uses it for LLM pretraining sequence packing: concat
each stratum's documents in deterministic order and cut every
``context_len`` tokens; each document learns which context windows (bins)
it lands in. This is the "concat-then-chunk" packing used by GPT-style
pipelines — expressible entirely in DataFrame ops, no Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def ordered_prefix_sum(
    df: DataFrame,
    val_col: str,
    order_col: str,
    part_col: str | None = None,
    bucket_size: int = 100_000,
    out: str = "cum",
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``val_col`` in ``order_col`` order (per
    ``part_col`` stratum if given): ``out`` = sum of values of all rows
    strictly before this one. ``order_col`` must be a unique non-negative
    integer key (ids, offsets) — buckets come from its value range, so the
    scan needs no global sort."""
    bkt = F.expr(f"cast(floor({order_col} / {bucket_size}) as bigint)")
    b = df.withColumn("_bkt", bkt)
    keys = [part_col, "_bkt"] if part_col else ["_bkt"]

    totals = b.groupBy(*keys).agg(F.sum(val_col).alias("_tot"))
    w_b = (
        Window.partitionBy(part_col).orderBy("_bkt")
        if part_col
        else Window.partitionBy().orderBy("_bkt")
    )
    # offsets table is one row per bucket — the only non-partitioned window
    # runs over THIS table, which is smaller than the data by ~bucket_size×
    offs = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_b), F.lit(0)) - F.col("_tot")
    ).drop("_tot")

    w_in = Window.partitionBy(*keys).orderBy(order_col)
    return (
        b.join(F.broadcast(offs), keys)
        .withColumn(out, F.col("_off") + F.sum(val_col).over(w_in) - F.col(val_col))
        .drop("_bkt", "_off")
    )


def pack_token_spans(
    docs: DataFrame,
    tokens_col: str,
    context_len: int,
    id_col: str = "doc_id",
    part_col: str | None = "source",
    bucket_size: int = 100_000,
) -> DataFrame:
    """Sequence-packing manifest: documents of each ``part_col`` stratum are
    concatenated in ``id_col`` order and cut into ``context_len``-token
    context windows (bins). Adds:

    - ``tok_start``  — the document's first token's global offset,
    - ``bin_first`` / ``bin_last`` — the context windows it spans
      (bin_last ≥ bin_first when a document straddles a cut).

    Zero-token documents keep ``bin_last = floor((tok_start - 1) / L)`` —
    equal to ``bin_first`` mid-window, ``bin_first - 1`` (an explicitly
    empty span) when they fall exactly on a cut.
    """
    if context_len <= 0:
        raise ValueError(f"context_len must be positive (got {context_len})")
    cum = ordered_prefix_sum(
        docs, tokens_col, id_col, part_col, bucket_size, out="tok_start"
    )
    L = int(context_len)
    return (
        cum.withColumn(
            "bin_first", F.expr(f"cast(floor(tok_start / {L}) as bigint)")
        ).withColumn(
            "bin_last",
            F.expr(f"cast(floor((tok_start + {tokens_col} - 1) / {L}) as bigint)"),
        )
    )
