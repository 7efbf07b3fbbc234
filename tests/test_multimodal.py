"""Multimodal binary-column plumbing (decode stubbed — no codecs offline)."""

import pytest
import pyspark.sql.functions as F

from gaia_spark.operators.multimodal import (
    DecodeUnavailable,
    extract_media_features,
    fake_decode,
    sniff_mime,
)
from gaia_spark.synth import synth_pages


def test_sniff_mime_and_bytes(spark):
    pages = synth_pages(spark, 50, partitions=2)
    out = sniff_mime(pages).select("url", "mime", "html_bytes").collect()
    assert len(out) == 50
    assert all(r.mime == "text/html" for r in out)  # synth html starts <html>
    assert all(r.html_bytes > 20 for r in out)


def test_extract_media_features_plumbing(spark):
    pages = synth_pages(spark, 40, partitions=3).select("url", "html")
    out = extract_media_features(pages, "html").collect()
    assert len(out) == 40
    r = out[0]
    assert (r.width, r.height, r.channels) == (4, 4, 1)
    assert len(r.feat) == 16 and all(0.0 <= v <= 1.0 for v in r.feat)
    # deterministic: same bytes -> same features, independent of partitioning
    out2 = {
        r.url: tuple(r.feat)
        for r in extract_media_features(
            synth_pages(spark, 40, partitions=1).select("url", "html"), "html"
        ).collect()
    }
    assert all(tuple(r.feat) == out2[r.url] for r in out)


def test_real_decode_raises_cleanly(spark):
    pages = synth_pages(spark, 5, partitions=1).select("url", "html")
    with pytest.raises(Exception) as ei:
        extract_media_features(pages, "html", use_fake=False).collect()
    assert "DecodeUnavailable" in str(ei.value) or "codecs unavailable" in str(ei.value)


def test_fake_decode_deterministic():
    a = fake_decode(b"hello world, this is a test payload for decoding ok!")
    b = fake_decode(b"hello world, this is a test payload for decoding ok!")
    assert a == b


def test_sniff_mime_binary_magics(spark):
    """PNG/JPEG magics are non-ASCII — the sniffer must match them on hex,
    not on a string-cast prefix (regression: UnicodeDecodeError skip made
    PNG/JPEG undetectable)."""
    fixtures = [
        ("png", b"\x89PNG\r\n\x1a\n" + b"\x00" * 20, "image/png"),
        ("jpeg", b"\xff\xd8\xff\xe0\x00\x10JFIF" + b"\x00" * 8, "image/jpeg"),
        ("gif", b"GIF89a" + b"\x00" * 10, "image/gif"),
        ("wav", b"RIFF\x24\x00\x00\x00WAVEfmt ", "audio/wav"),
        ("webp", b"RIFF\x24\x00\x00\x00WEBPVP8 ", "image/webp"),
        ("avi", b"RIFF\x24\x00\x00\x00AVI LIST", "video/avi"),
        ("mp3", b"ID3\x03\x00" + b"\x00" * 10, "audio/mpeg"),
        ("html", b"<html><body>hi</body></html>", "text/html"),
        ("doctype", b"<!DOCTYPE html><html>", "text/html"),
        ("pdf", b"%PDF-1.7\n", "application/pdf"),
        ("ogg", b"OggS\x00\x02" + b"\x00" * 10, "audio/ogg"),
        ("unknown", b"\x00\x01\x02\x03 random bytes", "application/octet-stream"),
        ("riff_other", b"RIFF\x24\x00\x00\x00XXXX", "application/octet-stream"),
    ]
    df = spark.createDataFrame(
        [(name, payload) for name, payload, _ in fixtures], "url string, html binary"
    )
    got = {r.url: r.mime for r in sniff_mime(df).collect()}
    for name, _, want in fixtures:
        assert got[name] == want, f"{name}: got {got[name]}, want {want}"
