"""resample_ffill — closed-form grid, gap fill, and pick determinism."""

from datetime import datetime

from gaia_spark.operators.timeseries import resample_ffill


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_gap_fill_and_last_pick(spark):
    """User 1: events in hour 0 (values 1.5 then 2.25 — later wins) and
    hour 3 (9.0); hours 1-2 are gaps carrying 2.25 forward."""
    t = lambda h, m: datetime(2024, 1, 1, h, m)  # noqa: E731
    ev = _ev(
        spark,
        [
            (1, 1, t(0, 5), 1.5),
            (2, 1, t(0, 40), 2.25),
            (3, 1, t(3, 0), 9.0),
        ],
    )
    rows = {r.bucket: r for r in resample_ffill(ev, 3600).collect()}
    b0 = min(rows)
    assert len(rows) == 4
    assert [rows[b0 + i].n_events for i in range(4)] == [2, 0, 0, 1]
    assert [rows[b0 + i].v_e2 for i in range(4)] == [225, 225, 225, 900]


def test_same_ts_tie_breaks_by_event_id(spark):
    """Two events at the identical timestamp: the larger event id wins —
    the documented deterministic tie rule."""
    ts = datetime(2024, 1, 1, 0, 0)
    ev = _ev(spark, [(5, 1, ts, 100.0), (9, 1, ts, 7.0), (2, 1, ts, 50.0)])
    rows = resample_ffill(ev, 3600).collect()
    assert len(rows) == 1 and rows[0].v_e2 == 700 and rows[0].n_events == 3


def test_keys_isolated(spark):
    """Each key gets its own grid span; no cross-key fill."""
    ev = _ev(
        spark,
        [
            (1, 1, datetime(2024, 1, 1, 0, 0), 1.0),
            (2, 2, datetime(2024, 1, 1, 5, 0), 2.0),
            (3, 2, datetime(2024, 1, 1, 6, 0), 3.0),
        ],
    )
    out = resample_ffill(ev, 3600)
    assert out.where("user_id = 1").count() == 1
    u2 = sorted(
        (r.bucket, r.v_e2) for r in out.where("user_id = 2").collect()
    )
    assert [v for _, v in u2] == [200, 300]
