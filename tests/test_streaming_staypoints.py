"""Streaming stay-point detector: closed episodes are BIT-equal to the
batch operator on in-order data (sentinel legs force final closure)."""

import datetime

import pyspark.sql.functions as F

from gaia_spark.operators.trajectory import stay_points
from gaia_spark.streaming.staypoints import stream_stay_points


def _events(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in (1, 2):
        home = (10.0 + u, 20.0 + u)
        t = 0
        # stay A: 4 close points over 30 min
        for i in range(4):
            rows.append((eid, base + datetime.timedelta(minutes=t), u,
                         home[0] + i * 1e-4, home[1]))
            eid += 1; t += 10
        # travel: one far point
        rows.append((eid, base + datetime.timedelta(minutes=t), u,
                     home[0] + 5.0, home[1])); eid += 1; t += 10
        # stay B: 3 close points over 20 min
        for i in range(3):
            rows.append((eid, base + datetime.timedelta(minutes=t), u,
                         home[0] + 5.0 + i * 1e-4, home[1] + 0.3))
            eid += 1; t += 10
        # sentinel: forces closure of stay B
        rows.append((eid, base + datetime.timedelta(minutes=t), u,
                     home[0] - 40.0, home[1] - 40.0)); eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "lat double, lon double")


def test_streaming_matches_batch_on_closed_stays(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "in")
    ev.write.parquet(src)

    want = {
        (r["user_id"], int(r["stay_no"])): (
            r["n_points"], r["dur_s"], r["clat_e4"], r["clon_e4"])
        for r in stay_points(ev, dist_m=10000.0, min_points=3,
                             min_dur_s=600).collect()
    }
    assert len(want) == 4  # two qualifying stays per user

    rows = []

    def sink(batch_df, batch_id):
        rows.extend(batch_df.collect())

    stream = (
        spark.readStream.schema(ev.schema).parquet(src)
    )
    q = (
        stream_stay_points(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["stay_no"]): (
            r["n_points"], r["dur_s"], r["clat_e4"], r["clon_e4"])
        for r in rows
    }
    assert got == want
