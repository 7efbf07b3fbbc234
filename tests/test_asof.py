"""asof_join row-integrity: the whole payload must come from ONE right row."""

import pyspark.sql.functions as F

from gaia_spark.operators.asof import asof_join


def test_asof_payload_not_mixed_across_rows(spark):
    """Matched right row has a NULL payload value: the output must keep that
    NULL instead of backfilling it from an OLDER right row (column-wise
    carry would mix two right rows into one output row)."""
    left = spark.createDataFrame(
        [("k", 100)], "key string, ts long"
    )
    right = spark.createDataFrame(
        [("k", 10, 1.0, "old"), ("k", 50, None, "new")],
        "key string, ts long, value double, label string",
    )
    out = asof_join(left, right, key="key", ts="ts", payload=["value", "label"]).collect()
    assert len(out) == 1
    r = out[0]
    # the as-of match is ts=50 ("new") whose value is NULL — it must stay NULL
    assert r.asof_label == "new"
    assert r.asof_value is None


def test_asof_basic_backward_semantics(spark):
    left = spark.createDataFrame(
        [("a", 5), ("a", 25), ("b", 1)], "key string, ts long"
    )
    right = spark.createDataFrame(
        [("a", 3, 30.0), ("a", 20, 40.0), ("b", 2, 50.0)],
        "key string, ts long, value double",
    )
    got = {
        (r.key, r.ts): r.asof_value
        for r in asof_join(left, right, key="key", ts="ts", payload=["value"]).collect()
    }
    assert got == {("a", 5): 30.0, ("a", 25): 40.0, ("b", 1): None}


def test_asof_seq_tiebreak(spark):
    left = spark.createDataFrame([("k", 10)], "key string, ts long")
    right = spark.createDataFrame(
        [("k", 10, 1, 100.0), ("k", 10, 2, 200.0)],
        "key string, ts long, seq int, value double",
    )
    out = asof_join(left, right, key="key", ts="ts", payload=["value"], seq="seq").collect()
    assert out[0].asof_value == 200.0  # max seq wins on duplicate (key, ts)
