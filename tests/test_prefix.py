"""Two-phase distributed prefix sum vs the naive global window, and
sequence-packing span semantics."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Window

from gaia_spark.operators.prefix import ordered_prefix_sum, pack_token_spans


def _rand_docs(n=500, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": rng.permutation(n * 3)[:n],  # sparse, shuffled ids
            "source": rng.choice(["a", "b", "c"], n),
            "v": rng.integers(0, 200, n),
        }
    )


def test_prefix_sum_matches_naive_window(spark):
    pdf = _rand_docs()
    df = spark.createDataFrame(pdf).repartition(7)
    # tiny buckets force many cross-bucket offsets
    got = (
        ordered_prefix_sum(df, "v", "doc_id", part_col="source", bucket_size=10)
        .select("doc_id", "source", "cum")
        .toPandas()
        .sort_values("doc_id")
    )
    naive = (
        df.withColumn(
            "cum",
            F.coalesce(
                F.sum("v").over(
                    Window.partitionBy("source")
                    .orderBy("doc_id")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("doc_id", "source", "cum")
        .toPandas()
        .sort_values("doc_id")
    )
    assert got.reset_index(drop=True).equals(naive.reset_index(drop=True))


def test_prefix_sum_no_partition_col(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": [5, 1, 3, 2], "v": [10, 1, 100, 7]}))
    got = {
        r.k: r.cum
        for r in ordered_prefix_sum(df, "v", "k", bucket_size=2).collect()
    }
    assert got == {1: 0, 2: 1, 3: 8, 5: 108}


def test_pack_spans_straddle_and_empty(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "source": ["s"] * 4,
                "n_tokens": [300, 300, 0, 1000],
            }
        )
    )
    out = {
        r.doc_id: (r.tok_start, r.bin_first, r.bin_last)
        for r in pack_token_spans(df, "n_tokens", 512, part_col="source").collect()
    }
    assert out[1] == (0, 0, 0)        # fits window 0
    assert out[2] == (300, 0, 1)      # straddles the 512 cut
    assert out[3] == (600, 1, 1)      # zero tokens: empty span inside bin 1
    assert out[4] == (600, 1, 3)      # long doc spans windows 1..3


def test_pack_spans_rejects_bad_context(spark):
    import pytest

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "source": ["s"], "n": [5]}))
    with pytest.raises(ValueError, match="context_len"):
        pack_token_spans(df, "n", 0)
