"""Vector-tile segment clipping — the raster↔vector tiling bridge for LINE
features (SURVEY.md §2.J raster↔vector; complements the point tile pyramid
of `operators/raster.py`).

A polyline segment is projected to continuous Web-Mercator tile coordinates
at a zoom level, scattered onto the tiles its bounding box covers, clipped
to each tile's unit square with the parametric Liang–Barsky test (closed
form: the entry parameter is the max of per-axis entering t's, the exit the
min of the leaving t's), and quantized to tile-local integer coordinates at
an MVT-style extent — i.e. the geometry cut a vector-tile server ships.

Scale shape: the tile cover is built IN-PLAN (two nested
``explode(sequence(...))`` over the bbox tile range — no driver loop, no
join); the clip itself is one pure-JVM closed-form expression per
(segment, tile) pair, so the whole operator is a Generate + Filter +
Project pipeline with no shuffle at all — output lands already partitioned
however the input was. Cost is bbox-cover sized: a segment spanning k×m
tiles fans out k·m candidate pairs of which only the crossed ~max(k, m)
survive the t0<t1 filter; for web-map serving zooms (segments at most a few
tiles long) that slack is ≤2×. The same closed form evaluates in DuckDB —
both engines run ONE shared SQL string, so clipped quantized coordinates
are hash-checkable bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gaia_spark.functions import portable as P

MAX_MERC_LAT = "85.05112877980659"


def merc_xc_sql(lon: str, zoom: int) -> str:
    """CONTINUOUS Web-Mercator column coordinate (tile units; floor of this
    is portable.tile_x_sql)."""
    n = 1 << zoom
    return f"((({lon}) + 180.0) / 360.0 * {n})"


def merc_yc_sql(lat: str, zoom: int) -> str:
    """Continuous Web-Mercator row coordinate (ln(tan+sec) form, clamped to
    the Mercator square exactly like portable.tile_y_sql)."""
    n = 1 << zoom
    lat_c = P.clamp_sql(lat, f"-{MAX_MERC_LAT}", MAX_MERC_LAT)
    merc = f"ln(tan(radians({lat_c})) + 1.0 / cos(radians({lat_c})))"
    return f"((1.0 - {merc} / pi()) / 2.0 * {n})"


def _axis_t_sql(lo: str, p0: str, d: str) -> tuple[str, str]:
    """Liang–Barsky per-axis [t_enter, t_leave] against slab [lo, lo+1].
    Degenerate axis (d = 0): (0, 1) when the coordinate lies inside the
    slab — neutral under greatest/least — else (2, -1), which empties the
    interval."""
    inside = f"(({p0}) >= ({lo}) AND ({p0}) < ({lo}) + 1.0)"
    t_a = f"((({lo}) - ({p0})) / ({d}))"
    t_b = f"((({lo}) + 1.0 - ({p0})) / ({d}))"
    t_lo = (
        f"CASE WHEN ({d}) = 0.0 THEN CASE WHEN {inside} THEN 0.0 ELSE 2.0 END "
        f"ELSE least({t_a}, {t_b}) END"
    )
    t_hi = (
        f"CASE WHEN ({d}) = 0.0 THEN CASE WHEN {inside} THEN 1.0 ELSE -1.0 END "
        f"ELSE greatest({t_a}, {t_b}) END"
    )
    return t_lo, t_hi


def clip_t_cols_sql() -> dict[str, str]:
    """t0/t1 of the clipped parameter interval, over prepared columns
    _x0 _y0 _dx _dy (tile units) and _tx _ty (the candidate tile)."""
    x_lo, x_hi = _axis_t_sql("_tx", "_x0", "_dx")
    y_lo, y_hi = _axis_t_sql("_ty", "_y0", "_dy")
    return {
        "_t0": f"greatest(0.0, {x_lo}, {y_lo})",
        "_t1": f"least(1.0, {x_hi}, {y_hi})",
    }


def quantize_sql(p0: str, d: str, t: str, tile: str, extent: int) -> str:
    """Tile-local integer coordinate of the clipped point at parameter t
    (MVT-style: 0..extent across the tile, floor half-up)."""
    return (
        f"cast(floor(((({p0}) + ({t}) * ({d})) - ({tile})) * {extent} + 0.5) as bigint)"
    )


def clip_segments_to_tiles(
    segs: DataFrame,
    zoom: int,
    extent: int = 4096,
    lat0: str = "lat0",
    lon0: str = "lon0",
    lat1: str = "lat1",
    lon1: str = "lon1",
) -> DataFrame:
    """Input: one row per segment with endpoint lat/lon columns (any id /
    payload columns ride along). Output: one row per (segment, crossed
    tile) with ``tx, ty`` (tile address at ``zoom``) and ``u0 v0 u1 v1``
    (clipped endpoints in tile-local extent units)."""
    n = 1 << zoom
    reserved = {"tx", "ty", "u0", "v0", "u1", "v1"}
    clash = reserved & set(segs.columns)
    if clash:
        raise ValueError(f"reserved output columns already present: {sorted(clash)}")
    d = (
        segs.withColumn("_x0", F.expr(merc_xc_sql(lon0, zoom)))
        .withColumn("_y0", F.expr(merc_yc_sql(lat0, zoom)))
        .withColumn("_dx", F.expr(merc_xc_sql(lon1, zoom)) - F.col("_x0"))
        .withColumn("_dy", F.expr(merc_yc_sql(lat1, zoom)) - F.col("_y0"))
    )
    bx0 = P.clamp_sql("cast(floor(least(_x0, _x0 + _dx)) as bigint)", "0", str(n - 1))
    bx1 = P.clamp_sql("cast(floor(greatest(_x0, _x0 + _dx)) as bigint)", "0", str(n - 1))
    by0 = P.clamp_sql("cast(floor(least(_y0, _y0 + _dy)) as bigint)", "0", str(n - 1))
    by1 = P.clamp_sql("cast(floor(greatest(_y0, _y0 + _dy)) as bigint)", "0", str(n - 1))
    d = d.withColumn("_tx", F.explode(F.expr(f"sequence({bx0}, {bx1})"))).withColumn(
        "_ty", F.explode(F.expr(f"sequence({by0}, {by1})"))
    )
    ts = clip_t_cols_sql()
    d = d.withColumn("_t0", F.expr(ts["_t0"])).withColumn("_t1", F.expr(ts["_t1"]))
    d = d.where(F.col("_t0") < F.col("_t1"))
    out = d.select(
        *[c for c in segs.columns],
        F.col("_tx").alias("tx"),
        F.col("_ty").alias("ty"),
        F.expr(quantize_sql("_x0", "_dx", "_t0", "_tx", extent)).alias("u0"),
        F.expr(quantize_sql("_y0", "_dy", "_t0", "_ty", extent)).alias("v0"),
        F.expr(quantize_sql("_x0", "_dx", "_t1", "_tx", extent)).alias("u1"),
        F.expr(quantize_sql("_y0", "_dy", "_t1", "_ty", extent)).alias("v1"),
    )
    return out


# --- polygon tile clipping (Sutherland–Hodgman) ------------------------------


def _sh_clip_axis(xs, ys, axis: int, lo: float, keep_ge: bool):
    """One Sutherland–Hodgman stage: clip ring (xs, ys) against an axis
    slab boundary. Vertex-count bounded by V+1 per stage; numpy ops inside,
    a short Python loop over edges (rings are small — this runs inside an
    Arrow batch, never per-DataFrame-row Python)."""
    import numpy as np

    if len(xs) == 0:
        return xs, ys
    vals = xs if axis == 0 else ys
    inside = (vals >= lo) if keep_ge else (vals <= lo)
    out_x, out_y = [], []
    n = len(xs)
    for i in range(n):
        j = (i + 1) % n
        if inside[i]:
            out_x.append(xs[i]); out_y.append(ys[i])
        if inside[i] != inside[j]:
            t = (lo - vals[i]) / (vals[j] - vals[i])
            out_x.append(xs[i] + t * (xs[j] - xs[i]))
            out_y.append(ys[i] + t * (ys[j] - ys[i]))
    return np.asarray(out_x), np.asarray(out_y)


def clip_polygons_to_tiles(
    polys: DataFrame,
    zoom: int,
    extent: int = 4096,
    id_col: str = "zone_id",
    vertices_col: str = "vertices",
) -> DataFrame:
    """Polygon counterpart of :func:`clip_segments_to_tiles`: each closed
    ring is cut to every tile its bbox covers (Sutherland–Hodgman against
    the four tile edges) and quantized to tile-local extent units — the
    polygon payload of an MVT tile.

    Scale shape: ring projection to continuous Mercator tile coords and
    the bbox tile scatter are in-plan JVM (transform + explode sequence);
    only the clip itself — genuinely iterative per ring — runs in numpy
    inside ONE mapInPandas stage, Arrow-batched, partition-parallel, no
    shuffle anywhere. Returns (id_col, tx, ty, us, vs, n_vertices) with
    us/vs the quantized clipped ring (unclosed); empty intersections are
    dropped. Rings that merely touch a tile edge quantize to degenerate
    (zero-area) rings and are kept — callers filter on n_vertices if
    unwanted."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    n = 1 << zoom
    xs_col = f"transform({vertices_col}, q -> {merc_xc_sql('q.lon', zoom)})"
    ys_col = f"transform({vertices_col}, q -> {merc_yc_sql('q.lat', zoom)})"
    d = polys.select(
        F.col(id_col),
        F.expr(xs_col).alias("_xs"),
        F.expr(ys_col).alias("_ys"),
    )
    bx0 = P.clamp_sql("cast(floor(array_min(_xs)) as bigint)", "0", str(n - 1))
    bx1 = P.clamp_sql("cast(floor(array_max(_xs)) as bigint)", "0", str(n - 1))
    by0 = P.clamp_sql("cast(floor(array_min(_ys)) as bigint)", "0", str(n - 1))
    by1 = P.clamp_sql("cast(floor(array_max(_ys)) as bigint)", "0", str(n - 1))
    d = d.withColumn("_tx", F.explode(F.expr(f"sequence({bx0}, {bx1})"))).withColumn(
        "_ty", F.explode(F.expr(f"sequence({by0}, {by1})"))
    )

    schema = (
        f"{id_col} long, tx long, ty long, "
        "us array<bigint>, vs array<bigint>, n_vertices int"
    )

    def clip_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # itertuples renames underscore-prefixed columns — iterate the
            # known column order (id, _xs, _ys, _tx, _ty) as plain tuples.
            cols = [pdf[c] for c in (id_col, "_xs", "_ys", "_tx", "_ty")]
            for zid, rxs, rys, rtx, rty in zip(*cols):
                xs = np.asarray(rxs, dtype=np.float64)[:-1]  # drop closing vtx
                ys = np.asarray(rys, dtype=np.float64)[:-1]
                tx, ty = float(rtx), float(rty)
                xs, ys = _sh_clip_axis(xs, ys, 0, tx, True)
                xs, ys = _sh_clip_axis(xs, ys, 0, tx + 1.0, False)
                xs, ys = _sh_clip_axis(xs, ys, 1, ty, True)
                xs, ys = _sh_clip_axis(xs, ys, 1, ty + 1.0, False)
                if len(xs) < 3:
                    continue
                us = np.floor((xs - tx) * extent + 0.5).astype(np.int64)
                vs = np.floor((ys - ty) * extent + 0.5).astype(np.int64)
                rows.append(
                    (zid, int(rtx), int(rty), us.tolist(), vs.tolist(), len(us))
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "tx", "ty", "us", "vs", "n_vertices"]
            )

    return d.mapInPandas(clip_batches, schema=schema)
