"""Raster viewshed (line-of-sight visibility) over a pixel grid.

Role: the gdal_viewshed / GRASS r.viewshed analog of the reference's raster
analysis tier (`[R] SURVEY.md §2.J raster analysis` family): given a DEM
pixel grid, an observer cell and a max radius, classify every cell inside
the radius as visible or hidden from the observer.

Algorithm: R3 line-of-sight with nearest-cell sampling — for each target
cell, walk the dominant axis from the observer, sample the DEM at the
nearest cell of each intermediate step, and the target is visible iff no
intermediate subtends an elevation angle ≥ the target's own.

Scale shape (100 TB DEM): the explode is bounded by ``radius`` (the
gdal_viewshed -md contract — an unbounded viewshed is O(n·diameter) and is
refused by the radius requirement), so sample volume is
O(cells_in_radius × radius). Elevation lookup is ONE equi-join on the
(row, col) cell key — co-partitioned shuffle join at scale, broadcastable
when the DEM window is small — followed by ONE combinable groupBy(target)
aggregate. No Python, no driver materialization.

Engine-determinism: elevations enter as e4 fixed-point bigints and every
visibility comparison is exact integer arithmetic — the nearest-cell
rounding is an offset floor-division (non-negative numerator, where Spark
``div`` = DuckDB ``//``), and angle comparisons cross-multiply SQUARED
fixed-point elevation deltas against squared grid distances with explicit
sign cases, so no trig and no float ordering can flip a cell between
engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gaia_spark.functions import portable as P
from gaia_spark.synth import TILE_PX


def decoded_grid(raster: DataFrame, zoom: int, band: int = 0) -> DataFrame:
    """Global (r, c, v_e4) pixel grid of one zoom/band — the same
    pixel_id → global row/col decode as operators.raster.focal_stats."""
    from gaia_spark.operators.raster import pixels_of

    pp = TILE_PX * TILE_PX
    px = pixels_of(raster.where((F.col("zoom") == zoom) & (F.col("band") == band)))
    t = P.idiv_sql("pixel_id", pp)
    return px.select(
        F.expr(
            f"(({t}) % 65536) * {TILE_PX} + {P.idiv_sql(f'pixel_id % {pp}', TILE_PX)}"
        ).alias("r"),
        F.expr(
            f"(({P.idiv_sql(t, 65536)}) % 65536) * {TILE_PX} + pixel_id % {TILE_PX}"
        ).alias("c"),
        F.expr(P.floor_scaled_sql("v", 4)).alias("v_e4"),
    )


def round_frac_sql(k: str, d: str, m: str, bound: int, dialect: str) -> str:
    """round(k·d/m) for |d| ≤ bound, 1 ≤ k < m, as EXACT integer arithmetic:
    floor((2kd + m)/(2m)) with a +bound offset keeping the numerator
    non-negative (Spark ``div`` truncates, DuckDB ``//`` floors — equal only
    there)."""
    num = f"(2 * ({k}) * ({d}) + ({m}) + 2 * ({m}) * {bound})"
    return f"({P.bigint_div(num, f'(2 * ({m}))', dialect)} - {bound})"


def blocked_sql(es: str, et: str, ds2: str, dt2: str) -> str:
    """TRUE iff the sampled intermediate (elev delta ``es`` at squared
    distance ``ds2``) subtends an elevation angle ≥ the target's
    (``et``/``dt2``): es/√ds2 ≥ et/√dt2, cross-multiplied in exact integer
    arithmetic with explicit sign cases (both sides bigint e4 deltas)."""
    return (
        f"CASE WHEN ({es}) >= 0 AND ({et}) < 0 THEN true "
        f"WHEN ({es}) < 0 AND ({et}) >= 0 THEN false "
        f"WHEN ({es}) >= 0 THEN ({es}) * ({es}) * ({dt2}) >= ({et}) * ({et}) * ({ds2}) "
        f"ELSE ({es}) * ({es}) * ({dt2}) <= ({et}) * ({et}) * ({ds2}) END"
    )


def viewshed(
    px: DataFrame,
    r0: int,
    c0: int,
    radius: int,
    obs_height_e4: int = 0,
    r_col: str = "r",
    c_col: str = "c",
    v_col: str = "v_e4",
) -> DataFrame:
    """Visibility of every cell with 0 < dist² ≤ radius² from the observer
    cell (r0, c0) raised by ``obs_height_e4``. ``px`` must contain the
    observer cell and every cell of the axis-aligned bounding box of the
    radius disk (line samples stay inside that box).

    Returns (r, c, visible). Adjacent cells (chebyshev distance ≤ 1) have
    no intermediates and are always visible."""
    if radius < 1:
        raise ValueError("radius must be >= 1")
    rr, cc, vv = F.col(r_col), F.col(c_col), F.col(v_col)
    obs = px.where((rr == r0) & (cc == c0)).select(
        (vv + F.lit(obs_height_e4)).cast("long").alias("e0")
    )
    t = (
        px.crossJoin(F.broadcast(obs))
        .withColumn("dr", (rr - r0).cast("long"))
        .withColumn("dc", (cc - c0).cast("long"))
        .where(
            (F.col("dr") * F.col("dr") + F.col("dc") * F.col("dc") <= radius * radius)
            & ~((F.col("dr") == 0) & (F.col("dc") == 0))
        )
        .withColumn("m", F.greatest(F.abs("dr"), F.abs("dc")))
        .withColumn("et", (vv - F.col("e0")).cast("long"))
    )
    near = t.where(F.col("m") <= 1).select(
        rr.cast("long").alias("r"), cc.cast("long").alias("c"),
        F.lit(True).alias("visible"),
    )
    far = t.where(F.col("m") >= 2)
    s = far.withColumn("k", F.explode(F.expr("sequence(1, m - 1)"))).select(
        rr.cast("long").alias("r"),
        cc.cast("long").alias("c"),
        "dr", "dc", "m", "k", "e0", "et",
        F.expr(f"{r0} + {round_frac_sql('k', 'dr', 'm', radius, P.SPARK)}")
        .cast("long").alias("sr"),
        F.expr(f"{c0} + {round_frac_sql('k', 'dc', 'm', radius, P.SPARK)}")
        .cast("long").alias("sc"),
    )
    elev = px.select(
        rr.cast("long").alias("sr"), cc.cast("long").alias("sc"),
        vv.cast("long").alias("ev"),
    )
    j = s.join(elev, ["sr", "sc"]).select(
        "r", "c", "et",
        (F.col("ev") - F.col("e0")).alias("es"),
        ((F.col("sr") - r0) * (F.col("sr") - r0)
         + (F.col("sc") - c0) * (F.col("sc") - c0)).alias("ds2"),
        (F.col("dr") * F.col("dr") + F.col("dc") * F.col("dc")).alias("dt2"),
    )
    vis = (
        j.withColumn("blk", F.expr(blocked_sql("es", "et", "ds2", "dt2")))
        .groupBy("r", "c")
        .agg((F.max(F.col("blk").cast("int")) == 0).alias("visible"))
    )
    return near.unionByName(vis)
