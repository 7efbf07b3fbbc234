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
