"""RasterFileIO over real FILES: Spark's ``binaryFile`` datasource + a
decode step in mapInPandas — completing the ``[R] gaia/geo/geo_inputs.py ::
RasterFileIO`` story for file-backed rasters.

GeoTIFF decoding needs GDAL/rasterio, which do not exist in this container,
so the TIFF branch raises :class:`DecodeUnavailable` honestly (swap in a
rasterio-backed decoder with the same signature on a real cluster). To make
the distributed plumbing testable offline, a trivial self-describing tile
container ``GRD1`` is defined here (16-byte header: magic, zoom, x, y, band
as little-endian int32s after the 4-byte magic; float32 pixel payload) with
a writer used by the tests.

Scale shape: one task per file (binaryFile splits by file), decode is
Arrow-batched, output conforms to RASTER_SCHEMA — downstream raster ops
(clip, math, pixel zonal) consume it unchanged.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gaia_spark.operators.multimodal import DecodeUnavailable
from gaia_spark.synth import RASTER_SCHEMA, TILE_PX

GRD1_MAGIC = b"GRD1"
TIFF_MAGICS = (b"II*\x00", b"MM\x00*")


def write_grd1(path: str, zoom: int, x: int, y: int, band: int, px: np.ndarray) -> None:
    """Writer for the offline test container (one tile per file)."""
    px = np.asarray(px, dtype="<f4")
    if px.size != TILE_PX * TILE_PX:
        raise ValueError(f"expected {TILE_PX * TILE_PX} pixels, got {px.size}")
    with open(path, "wb") as f:
        f.write(GRD1_MAGIC)
        f.write(struct.pack("<iiii", zoom, x, y, band))
        f.write(px.tobytes())


def decode_tile(content: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """Decode one raster file payload → (zoom, x, y, band, px[float32])."""
    if content[:4] in TIFF_MAGICS:
        raise DecodeUnavailable(
            "GeoTIFF decode needs GDAL/rasterio (absent in this container); "
            "plug a rasterio decoder with this signature on a real cluster"
        )
    if content[:4] != GRD1_MAGIC:
        raise ValueError(f"unknown raster container magic {content[:4]!r}")
    zoom, x, y, band = struct.unpack("<iiii", content[4:20])
    px = np.frombuffer(content[20:], dtype="<f4")
    return zoom, x, y, band, px


def read_raster_files(spark: SparkSession, path: str, glob: str = "*.grd") -> DataFrame:
    """Binary-file datasource → decode → tile DataFrame (RASTER_SCHEMA)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for content in b["content"]:
                zoom, x, y, band, px = decode_tile(bytes(content))
                out.append((zoom, x, y, band, px.astype(np.float32).tolist()))
            if out:
                yield pd.DataFrame(out, columns=["zoom", "x", "y", "band", "px"])

    return files.mapInPandas(decode, RASTER_SCHEMA)


def write_raster_dir(raster: DataFrame, out_dir: str) -> int:
    """Materialize a tile DataFrame as one GRD1 file per tile (driver-side
    iteration over collected tiles — test-scale export helper)."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for r in raster.collect():
        write_grd1(
            os.path.join(out_dir, f"t_{r.zoom}_{r.x}_{r.y}_{r.band}.grd"),
            r.zoom, r.x, r.y, r.band, np.array(r.px),
        )
        n += 1
    return n
