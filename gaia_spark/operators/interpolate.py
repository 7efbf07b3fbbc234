"""Surface interpolation / density rasterization from point layers.

The gaia-family InterpolationProcess analog ([R] SURVEY §0 — zonal/raster
bridge tier): estimate a raster surface on the engine's packed grid from a
scattered point layer. Two estimators share one distributed primitive:

- ``idw_grid``      — inverse-distance-weighted value estimate per cell,
- ``kde_grid``      — Gaussian kernel density (heatmap) per cell.

Scale design (the 100 TB shape): a naive formulation joins every grid cell
against every point within radius — a giant spatial join. Instead each POINT
is *scattered* in-plan (``sequence``/``explode``, latitude-aware ring
extents copied from knn.near_join's cover math) onto the output cells its
radius disc can reach, then ONE ``groupBy(cell)`` aggregates the weighted
contributions. No join at all: a single shuffle whose width is the output
raster, with map-side partial aggregation doing most of the work. The
explosion factor is (2·ceil(radius/cell)+1)² — callers pick ``res`` so a
cell is comparable to the radius (the usual heatmap regime).

Everything is JVM expression arithmetic (no Python, no UDF); the DuckDB
oracle replays the same haversine/weight formulas through a grid cross
join, so both estimators are value-hash checked.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gaia_spark.functions import portable


def scatter_to_grid(
    points: DataFrame,
    res: int,
    radius_m: float,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Explode each point onto every grid cell at ``res`` whose CENTER lies
    within ``radius_m`` (haversine). Adds ``cell`` and ``dist_m``; keeps all
    point columns. Fully in-plan and distributed — ring extents are computed
    per row (longitude ring widens toward the poles, wraps the antimeridian,
    and is capped to one full row of the grid so no cell duplicates).

    Cover-sizing validity: the 110,000 m/deg floor gives a ~1.1% degree
    over-estimate, which also absorbs the spherical curvature term
    (asin/sin inflation, ≈ (r/2R)²/6 relative) for radii up to ~3,000 km;
    beyond that the longitude ring could under-span at high latitude."""
    n = 1 << res
    cell_h_deg, cell_w_deg = 180.0 / n, 360.0 / n
    # conservative degree over-estimate of the radius (110,000 m/deg floor;
    # true meridian value is 111,195) — cover may overscan, never underspan
    deg = max(radius_m / 110_000.0, 1e-5)
    # ring bound is exact, not padded: a point in row cy sits at
    # lat = (cy+f)·h, f ∈ [0,1); a reachable center at (yy+0.5)·h satisfies
    # |yy − cy| ≤ deg/h + |f − 0.5| ≤ deg/h + 0.5 — the 0.5 term replaces
    # the blanket +1 of near_join's cover (~40% fewer scatter rows at the
    # bench shape), and the brute-force cover-parity test pins it
    ring_y = int(np.ceil(deg / cell_h_deg + 0.5))

    for reserved in ("cell", "dist_m"):
        if reserved in points.columns:
            raise ValueError(
                f"input already has a {reserved!r} column - rename it before "
                "scattering (cell/dist_m are the reserved output columns)"
            )
    pts = points.where(F.col(lat).isNotNull() & F.col(lon).isNotNull())
    pts = pts.withColumn("_cy", F.expr(portable.cell_y_sql(lat, res)))
    pts = pts.withColumn("_cx", F.expr(portable.cell_x_sql(lon, res)))
    # Per-ROW longitudinal extent (exact spherical bound, not the blanket
    # deg/cos rectangle): for a point p and a center c on row _yy, the
    # haversine identity gives
    #   sin²(Δλ/2)·cosφp·cosφc = sin²(d/2R) − sin²(Δφ/2),
    # so with d ≤ r, |Δφ| ≥ δ(dy) = max(0, |dy|−0.5)·cell_h (the minimum
    # latitude separation of a point in row _cy from the center of row
    # _cy+dy) and cosφp·cosφc ≥ cos²(max(|φp|, |φc|)) (φc is the row's
    # center latitude — exact, not a worst-case cap):
    #   Δλ ≤ 2·asin( sqrt(sin²(r/2R) − sin²(δ/2)) / cos(max|φ|) ).
    # Rows near the top/bottom of the disc get a near-zero x-span instead
    # of the full deg/cos width — ~π/4 of the rectangle's scatter rows
    # survive, every dropped cell provably outside the radius (the
    # brute-force cover-parity test pins the superset property). The +0.5
    # cell term covers the point's position within its own cell, as in
    # ring_y; sqrt/asin round within an ulp, absorbed by the ceil(+0.5).
    s2r = float(np.sin(float(radius_m) / (2.0 * portable.EARTH_RADIUS_M)) ** 2)
    clat = portable.cell_center_lat_sql("_yy", res)
    delta2 = f"pow(sin(radians(greatest(cast(0 as double), abs(_dy) - 0.5) * {cell_h_deg}) / 2), 2)"
    cosmax = f"greatest(cos(radians(greatest(abs({lat}), abs(_clat)))), cast(1e-4 as double))"
    w_deg = (
        f"degrees(2 * asin(least(cast(1 as double), "
        f"sqrt(greatest(cast(0 as double), {s2r!r} - {delta2})) / {cosmax})))"
    )
    out = (
        pts.withColumn("_dy", F.explode(F.sequence(F.lit(-ring_y), F.lit(ring_y))))
        .withColumn("_yy", F.col("_cy") + F.col("_dy"))
        .where((F.col("_yy") >= 0) & (F.col("_yy") < n))
        .withColumn("_clat", F.expr(clat))
        .withColumn(
            "_rx",
            F.expr(f"least(cast(ceil({w_deg} / {cell_w_deg} + 0.5) as int), {n // 2})"),
        )
        # capped span 2·rx+1 ≥ n+1 would wrap onto duplicate columns: emit
        # the full row instead (distinct x by construction either way).
        # The raw offset sequence explodes and the modular wrap applies as
        # a codegen'd projection — a transform() lambda here would be
        # interpreted once per scattered row (~10M at the bench shape).
        .withColumn(
            "_dx",
            F.explode(
                F.expr(
                    f"CASE WHEN 2 * _rx + 1 >= {n} THEN sequence(0, {n - 1}) "
                    f"ELSE sequence(-_rx, _rx) END"
                )
            ),
        )
        .withColumn(
            "_xx",
            F.expr(
                f"CASE WHEN 2 * _rx + 1 >= {n} THEN _dx "
                f"ELSE cast(pmod(_cx + _dx, {n}) as int) END"
            ),
        )
        .withColumn("cell", F.col("_yy") * n + F.col("_xx"))
        .withColumn("_clon", F.expr(portable.cell_center_lon_sql("_xx", res)))
        .withColumn(
            "dist_m", F.expr(portable.haversine_m_sql(lat, lon, "_clat", "_clon"))
        )
        .where(F.col("dist_m") <= F.lit(float(radius_m)))
        .drop("_cy", "_cx", "_rx", "_dy", "_yy", "_dx", "_xx", "_clat", "_clon")
    )
    return out


def idw_weight_sql(dist: str, power: float, min_dist_m: float) -> str:
    """1 / max(d, min_dist)^p — the IDW weight, portable (same string runs
    in Spark SQL and DuckDB). ``min_dist_m`` floors the singularity when a
    point sits on a cell center."""
    return f"(1.0 / pow(greatest({dist}, {float(min_dist_m)}), {float(power)}))"


def kde_weight_sql(dist: str, bandwidth_m: float) -> str:
    """Unnormalized Gaussian kernel exp(-d²/(2h²)), portable."""
    h2 = 2.0 * float(bandwidth_m) * float(bandwidth_m)
    return f"exp(-(({dist}) * ({dist})) / {h2})"


def idw_grid(
    points: DataFrame,
    value_col: str,
    res: int,
    radius_m: float,
    power: float = 2.0,
    min_dist_m: float = 1.0,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """IDW surface: per grid cell at ``res``, the inverse-distance-weighted
    mean of ``value_col`` over all points within ``radius_m`` of the cell
    center. Cells no point reaches are absent (inner semantics). Returns
    ``(cell, n_src, idw)``."""
    sc = scatter_to_grid(points, res, radius_m, lat=lat, lon=lon)
    w = idw_weight_sql("dist_m", power, min_dist_m)
    return sc.groupBy("cell").agg(
        F.count("*").alias("n_src"),
        (
            F.sum(F.expr(w) * F.col(value_col)) / F.sum(F.expr(w))
        ).alias("idw"),
    )


def kde_grid(
    points: DataFrame,
    res: int,
    bandwidth_m: float,
    cutoff: float = 3.0,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Gaussian KDE heatmap: per grid cell, the kernel-weighted point count
    (truncated at ``cutoff``·h, the standard 3σ cut). Returns
    ``(cell, n_src, density)``."""
    sc = scatter_to_grid(points, res, float(bandwidth_m) * cutoff, lat=lat, lon=lon)
    return sc.groupBy("cell").agg(
        F.count("*").alias("n_src"),
        F.sum(F.expr(kde_weight_sql("dist_m", bandwidth_m))).alias("density"),
    )


def huff_shares(
    demand: DataFrame,
    sites: DataFrame,
    beta: float = 2.0,
    demand_key: str = "pid",
    site_key: str = "site_id",
    attract_col: str = "attract",
) -> DataFrame:
    """Huff gravity model of market capture: demand point i patronizes
    site j with probability A_j·d_ij^−β / Σ_k A_k·d_ik^−β — the classic
    retail/catchment-share model (`[R] SURVEY.md §2.C DistanceProcess`
    family composed with attractiveness weights).

    ``demand`` = (pid, lat, lon[, weight ignored]); ``sites`` =
    (site_id, lat, lon, attract). Plan: ONE broadcast join (the site
    layer is dimension-sized — the same broadcast-side assumption as
    every zone join here) + a per-point combinable sum for the
    denominator + one join back; per-site capture totals quantize each
    share to e6 BEFORE the final sum, so the rollup is exact bigint
    aggregation (order-free).

    Returns per-site capture: (site_id, n_points, captured_e6) where
    captured_e6/1e6 = expected number of demand points captured."""
    d = demand.select(
        F.col(demand_key).alias("_p"),
        F.col("lat").alias("_plat"),
        F.col("lon").alias("_plon"),
    )
    s = sites.select(
        F.col(site_key).alias("_s"),
        F.col("lat").alias("_slat"),
        F.col("lon").alias("_slon"),
        F.col(attract_col).cast("double").alias("_a"),
    )
    dist = portable.haversine_m_sql("_plat", "_plon", "_slat", "_slon")
    util = f"(_a * power(greatest({dist}, cast(1 as double)), {-float(beta)}))"
    # utilities quantize to e12 bigints BEFORE the denominator sum — float
    # summation is order-dependent, exact integer aggregation is not (the
    # BM25 pre-sum lesson); sub-1e-12 utilities floor to 0 (documented)
    pairs = d.join(F.broadcast(s)).select(
        "_p", "_s", F.expr(portable.floor_scaled_sql(util, 12)).alias("_u")
    )
    den = pairs.groupBy("_p").agg(F.sum("_u").cast("long").alias("_den"))
    share_e6 = portable.floor_scaled_sql(
        "cast(_u as double) / cast(_den as double)", 6
    )
    return (
        pairs.join(den, "_p")
        .where(F.col("_den") > 0)
        .select("_s", F.expr(share_e6).alias("_sh"))
        .groupBy(F.col("_s").alias(site_key))
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.sum("_sh").cast("long").alias("captured_e6"),
        )
    )
