"""Multimodal column handling: images/audio/video as opaque binary columns
with typed metadata; decode/feature steps as Arrow-batched mapInPandas.

Beyond the reference's operator set (training-data-pipeline tier). The
image/audio codec libraries are NOT available in this environment, so the
decode kernels are STUBBED behind ``DecodeUnavailable`` with a deterministic
fake path for tests — the Spark-side plumbing (schemas, batching, UDF
signatures, partition behavior) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# magic-byte table, most specific first; matched on hex so non-ASCII magics
# (PNG \x89, JPEG \xff\xd8\xff — the two most common web image types) detect.
MAGIC: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"<html", "text/html"),
    (b"<htm", "text/html"),
    (b"<!DOC", "text/html"),
    (b"ID3", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
    (b"%PDF", "application/pdf"),
]


class DecodeUnavailable(NotImplementedError):
    """Raised by real decode paths: codec libraries absent in this env."""


def sniff_mime(df: DataFrame, bin_col: str = "html", out: str = "mime") -> DataFrame:
    """Magic-byte MIME sniffing — pure JVM: compare hex(substring(binary))
    against the magic's hex, so non-UTF8 magic bytes survive (casting binary
    to string mangles \\x89/\\xff prefixes and can never match PNG/JPEG).

    RIFF containers are disambiguated by the format tag at offset 9..12
    (WEBP / WAVE / AVI ), as real sniffers do."""
    col = F.col(bin_col)

    def has_prefix(magic: bytes, offset: int = 1):
        return F.expr(
            f"hex(substring({bin_col}, {offset}, {len(magic)})) = '{magic.hex().upper()}'"
        )

    expr = F.lit("application/octet-stream")
    # build innermost-first so earlier (more specific) magics win
    for magic, mime in reversed(MAGIC):
        expr = F.when(has_prefix(magic), F.lit(mime)).otherwise(expr)
    expr = F.when(
        has_prefix(b"RIFF"),
        F.when(has_prefix(b"WEBP", 9), F.lit("image/webp"))
        .when(has_prefix(b"WAVE", 9), F.lit("audio/wav"))
        .when(has_prefix(b"AVI ", 9), F.lit("video/avi"))
        .otherwise(F.lit("application/octet-stream")),
    ).otherwise(expr)
    return df.withColumn(out, expr).withColumn(
        f"{bin_col}_bytes", F.length(col).cast("long")
    )


def decode_image_batch(data: pd.Series) -> pd.DataFrame:
    """REAL decode stub: would return (width, height, channels, pixels).

    No PIL/opencv in this container — raise loudly rather than fake silently.
    """
    raise DecodeUnavailable("image codecs unavailable; use fake_decode for tests")


def fake_decode(data: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake 'decode': 4×4 grayscale derived from byte content.
    Stands in for the codec so the distributed plumbing is testable."""
    arr = np.frombuffer(data[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float64)
    px = arr.reshape(4, 16).mean(axis=1).repeat(4) / 255.0
    return 4, 4, 1, px.tolist()


def extract_media_features(
    df: DataFrame, bin_col: str = "html", use_fake: bool = True
) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    Output schema: key columns + (width, height, channels, feat:array<float>).
    Partition-parallel, Arrow-batched; swap ``fake_decode`` for a real codec
    UDF on a cluster with PIL/ffmpeg available (same signature).
    """
    keys = [c for c in df.columns if c != bin_col]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name in keys)
    schema += ", width int, height int, channels int, feat array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not use_fake:
                decode_image_batch(b[bin_col])  # raises DecodeUnavailable
            feats = [fake_decode(bytes(v)) for v in b[bin_col]]
            out = b[keys].copy()
            out["width"] = [f[0] for f in feats]
            out["height"] = [f[1] for f in feats]
            out["channels"] = [f[2] for f in feats]
            out["feat"] = [f[3] for f in feats]
            yield out

    return df.mapInPandas(run, schema)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: emits (url, frame_idx) rows for a stubbed
    decoder — demonstrates the explode-shaped output contract."""
    return df.select(
        "url", F.explode(F.sequence(F.lit(0), F.lit(every_n - 1))).alias("frame_idx")
    )
