"""Structured Streaming: ingest, watermark windows, stateful dedup, sink."""

import pyspark.sql.functions as F

from gaia_spark.sources.icelite import IceTable
from gaia_spark.streaming import (
    read_pages_stream,
    stream_cell_counts,
    stream_dedup_urls,
    stream_to_icelite,
)
from gaia_spark.synth import synth_pages


def test_stream_windowed_cell_counts(spark, tmp_path):
    src = str(tmp_path / "incoming")
    synth_pages(spark, 400, partitions=2).write.mode("append").parquet(src)
    stream = stream_cell_counts(read_pages_stream(spark, src), res=4, window="60 minutes")
    q = (
        stream.writeStream.format("memory")
        .queryName("cellcounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from cellcounts")
    assert out.count() > 0
    total = out.agg(F.sum("n_pages")).collect()[0][0]
    # every geoparsed page lands in exactly one (window, cell) bucket
    from gaia_spark.functions.geoparse import geoparse

    expected = geoparse(spark.read.parquet(src)).where("lat is not null").count()
    assert total == expected


def test_stream_dedup_and_icelite_sink(spark, tmp_path):
    src = str(tmp_path / "incoming2")
    # same pages written twice -> duplicate urls across files
    synth_pages(spark, 200, partitions=1).write.mode("append").parquet(src)
    synth_pages(spark, 200, partitions=1).write.mode("append").parquet(src)
    deduped = stream_dedup_urls(read_pages_stream(spark, src))
    table_path = str(tmp_path / "pages_table")
    q = stream_to_icelite(deduped, table_path, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    out = IceTable(table_path).read(spark)
    assert out.count() == 200  # duplicates dropped
    assert out.select("url").distinct().count() == 200


def test_stream_session_windows(spark, tmp_path):
    """Pages from one host within the gap merge into ONE session; a page
    beyond the gap opens a new session."""
    import pandas as pd

    src = str(tmp_path / "incoming3")
    base = pd.Timestamp("2025-06-01T00:00:00")
    rows = [
        ("https://a.example/1", base),
        ("https://a.example/2", base + pd.Timedelta(minutes=10)),   # same session
        ("https://a.example/3", base + pd.Timedelta(hours=3)),      # new session
        ("https://b.example/1", base + pd.Timedelta(minutes=5)),
    ]
    pdf = pd.DataFrame(
        {
            "url": [u for u, _ in rows],
            "warc_ts": [t for _, t in rows],
            "html": [b"<html>x</html>"] * len(rows),
            "text": ["t"] * len(rows),
            "lang": ["en"] * len(rows),
        }
    )
    spark.createDataFrame(pdf).write.mode("append").parquet(src)
    from gaia_spark.streaming.ingest import stream_session_windows

    stream = stream_session_windows(read_pages_stream(spark, src), gap="30 minutes")
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.host, r.n_pages)
        for r in spark.sql("select * from sessions").collect()
    }
    assert got == {("a.example", 2), ("a.example", 1), ("b.example", 1)}


def test_stream_stream_join_within_bound(spark, tmp_path):
    """Stream-stream inner join with two watermarked file streams: pages
    matched to events on url within [page_ts, page_ts + 1 hour]; result
    equals the equivalent batch join (bounded-state attribution shape)."""
    from gaia_spark.streaming import stream_stream_join

    psrc = str(tmp_path / "pages_src")
    esrc = str(tmp_path / "events_src")
    pages = synth_pages(spark, 120, partitions=1)
    pages.write.mode("append").parquet(psrc)
    # events derived from pages: one inside the bound (+10 min), one outside
    # (+3 h), plus one for an unseen url
    ev = pages.select(
        "url", F.expr("warc_ts + interval 10 minutes").alias("event_ts"),
        F.lit("click").alias("kind"),
    ).unionByName(
        pages.select(
            "url", F.expr("warc_ts + interval 3 hours").alias("event_ts"),
            F.lit("late").alias("kind"),
        )
    ).unionByName(
        spark.createDataFrame(
            [("https://nowhere.example/x", None, "orphan")],
            "url string, event_ts timestamp, kind string",
        ).withColumn("event_ts", F.expr("timestamp'2025-06-01 00:00:00'"))
    )
    ev.write.mode("append").parquet(esrc)

    from gaia_spark.synth import PAGES_SCHEMA

    p_stream = spark.readStream.schema(PAGES_SCHEMA).parquet(psrc)
    e_stream = spark.readStream.schema("url string, event_ts timestamp, kind string").parquet(esrc)
    joined = stream_stream_join(p_stream, e_stream, within="1 hour")
    q = (
        joined.writeStream.format("memory").queryName("ssjoin")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {(r.url, r.kind) for r in spark.sql("select * from ssjoin").collect()}
    want = {(r.url, "click") for r in pages.select("url").collect()}
    assert got == want  # only the within-bound events join; no late/orphan


def test_stream_spatial_join_matches_batch(spark, tmp_path):
    """Stream-static spatial join: micro-batch output rows are EXACTLY the
    batch join's rows on the same input (stateless parity)."""
    from gaia_spark.functions.geoparse import geoparse
    from gaia_spark.operators.spatial_join import ZoneIndex, spatial_join
    from gaia_spark.streaming import stream_spatial_join
    from gaia_spark.synth import synth_zones_pdf

    src = str(tmp_path / "incoming_sj")
    synth_pages(spark, 400, partitions=2).write.mode("append").parquet(src)
    idx = ZoneIndex.build(synth_zones_pdf(16))

    q = (
        stream_spatial_join(read_pages_stream(spark, src), idx)
        .writeStream.format("memory")
        .queryName("streamsj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.url, r.zone_id)
        for r in spark.sql("select url, zone_id from streamsj").collect()
    }

    batch_pts = geoparse(spark.read.parquet(src)).where("lat is not null")
    expect = {
        (r.url, r.zone_id)
        for r in spatial_join(batch_pts, idx, "within").select("url", "zone_id").collect()
    }
    assert got == expect
    assert len(got) > 0


def test_stream_kde_matches_batch(spark, tmp_path):
    """Windowed streaming KDE: per-(window, cell) density from the stream
    equals the batch kde_grid over the same rows bucketed by the same
    event-time window."""
    import pyspark.sql.functions as F

    from gaia_spark.functions.geoparse import geoparse
    from gaia_spark.streaming import stream_kde_grid

    src = str(tmp_path / "incoming_kde")
    synth_pages(spark, 400, partitions=2).write.mode("append").parquet(src)

    q = (
        stream_kde_grid(read_pages_stream(spark, src), res=5, bandwidth_m=300_000.0,
                        window="10 minutes", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("streamkde")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r.win), int(r.cell)): (int(r.n_src), round(float(r.density), 9))
        for r in spark.sql("select win, cell, n_src, density from streamkde").collect()
    }

    from gaia_spark.operators.interpolate import kde_weight_sql, scatter_to_grid

    pts = geoparse(spark.read.parquet(src)).where("lat is not null")
    sc = scatter_to_grid(pts, 5, 900_000.0)  # bandwidth * default 3.0 cutoff
    batch = (
        sc.groupBy(F.window("warc_ts", "10 minutes").alias("win"), "cell")
        .agg(
            F.count("*").alias("n_src"),
            F.sum(F.expr(kde_weight_sql("dist_m", 300_000.0))).alias("density"),
        )
    )
    rows = batch.collect()
    expect = {
        (str(r.win), int(r.cell)): (int(r.n_src), round(float(r.density), 9))
        for r in rows
    }
    # append mode emits a window only once the watermark passes its end, so
    # the final (still-open) window is withheld — everything emitted must
    # match the batch values exactly, and the only missing keys may belong
    # to trailing windows the watermark hasn't closed
    assert len(got) > 0 and set(got) <= set(expect)
    for k, v in got.items():
        assert expect[k] == v
    max_emitted_end = max(r.win.end for r in rows if (str(r.win), int(r.cell)) in got)
    for r in rows:
        if (str(r.win), int(r.cell)) not in got:
            assert r.win.end > max_emitted_end


def test_stream_logreg_score_matches_batch(spark, tmp_path):
    """Stream scoring under a frozen trained model: micro-batch rows are
    EXACTLY the batch logreg_score rows on the same input (the per-row
    map-literal logit is stateless), including z_i bit-equality."""
    from gaia_spark.operators.classifier import (
        logreg_score,
        logreg_train,
        stream_logreg_score,
    )

    src = str(tmp_path / "incoming_docs")
    rows = [
        (i, "good clean prose here" if i % 2 else "zz yy xx ww", "en" if i % 2 else "de")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    docs.write.mode("append").parquet(src)

    w_df = logreg_train(docs, "CASE WHEN lang = 'en' THEN 1 ELSE 0 END", n_buckets=16, n_rounds=2)
    weights = {r._b: r.w_e6 for r in w_df.collect()}

    stream = spark.readStream.schema("doc_id long, text string, lang string").parquet(src)
    q = (
        stream_logreg_score(stream, weights, n_buckets=16)
        .writeStream.format("memory")
        .queryName("streamlr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.z_i, r.score_e6, r.pred)
        for r in spark.sql("select * from streamlr").collect()
    }
    expect = {
        (r.doc_id, r.z_i, r.score_e6, r.pred)
        for r in logreg_score(spark.read.parquet(src), w_df, n_buckets=16).collect()
    }
    assert got == expect and len(got) == 40
