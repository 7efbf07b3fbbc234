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


# --- interval_join (bucketed range join) -------------------------------------

from datetime import datetime

from gaia_spark.operators.asof import interval_join


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


def _iv_df(spark, rows):
    return spark.createDataFrame(
        rows, "iv_id long, key string, t0 timestamp, t1 timestamp"
    )


def _ev_df(spark, rows):
    return spark.createDataFrame(rows, "ev_id long, key string, ts timestamp")


def test_interval_join_half_open_bounds(spark):
    """[t0, t1): an event at exactly t0 matches, at exactly t1 does not."""
    iv = _iv_df(spark, [(1, "k", _ts(10), _ts(20))])
    ev = _ev_df(spark, [(100, "k", _ts(10)), (101, "k", _ts(20)), (102, "k", _ts(19))])
    got = {r.ev_id for r in interval_join(iv, ev, "key", "ts", "t0", "t1", bucket_s=5).collect()}
    assert got == {100, 102}


def test_interval_join_multi_bucket_no_dups(spark):
    """An interval spanning many buckets meets each event exactly once."""
    iv = _iv_df(spark, [(1, "k", _ts(0), _ts(59))])
    ev = _ev_df(spark, [(i, "k", _ts(i)) for i in range(0, 59, 7)])
    out = interval_join(iv, ev, "key", "ts", "t0", "t1", bucket_s=5).collect()
    ids = sorted(r.ev_id for r in out)
    assert ids == list(range(0, 59, 7))  # each once — no bucket-overlap dups


def test_interval_join_key_isolation_and_overlap(spark):
    """Same window on another key never matches; overlapping intervals each
    pair with the shared event."""
    iv = _iv_df(spark, [(1, "a", _ts(0), _ts(30)), (2, "a", _ts(10), _ts(40)), (3, "b", _ts(0), _ts(30))])
    ev = _ev_df(spark, [(7, "a", _ts(15))])
    got = sorted((r.iv_id, r.ev_id) for r in interval_join(iv, ev, "key", "ts", "t0", "t1", bucket_s=10).collect())
    assert got == [(1, 7), (2, 7)]


def test_interval_join_brute_force_parity(spark):
    """Pseudo-random layout vs the quadratic definition, two bucket widths
    (bucket size must not change the answer)."""
    ivs, evs = [], []
    for i in range(40):
        a = (i * 37) % 300
        ivs.append((i, f"k{i % 3}", _ts(a % 60).replace(minute=a // 60), _ts((a + (i % 50)) % 60).replace(minute=((a + (i % 50)) % 300) // 60)))
    for j in range(120):
        b = (j * 91) % 300
        evs.append((j, f"k{j % 3}", _ts(b % 60).replace(minute=b // 60)))
    ivs = [(i, k, t0, t1) for (i, k, t0, t1) in ivs if t0 < t1]
    expected = sorted(
        (i, j)
        for (i, ki, t0, t1) in ivs
        for (j, kj, ts) in evs
        if ki == kj and t0 <= ts < t1
    )
    iv, ev = _iv_df(spark, ivs), _ev_df(spark, evs)
    for w in (7, 60):
        got = sorted((r.iv_id, r.ev_id) for r in interval_join(iv, ev, "key", "ts", "t0", "t1", bucket_s=w).collect())
        assert got == expected
