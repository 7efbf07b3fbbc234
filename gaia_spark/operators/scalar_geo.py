"""Per-feature scalar geometry: buffer / centroid / area / length.

Reference semantics: ``[R] gaia/geo/processes_vector.py ::
{Buffer,Centroid,Area,Length}Process`` — each adds a derived geometry or
measure column. Vectorized numpy in Arrow-batched pandas UDFs over the
``array<struct<lat,lon>>`` ring encoding; no shapely objects ever cross the
Arrow boundary (SURVEY.md §1.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

from gaia_spark.functions.kernel import (
    destination_point,
    polygon_area_m2,
    polyline_length_m,
)

RING = ArrayType(
    StructType([StructField("lat", DoubleType()), StructField("lon", DoubleType())])
)


@F.pandas_udf(DoubleType())
def ring_area_m2(vertices: pd.Series) -> pd.Series:
    """Spherical polygon area (m²) per ring — AreaProcess."""
    def one(v):
        if v is None or len(v) < 3:
            return 0.0
        return polygon_area_m2(
            np.array([p["lat"] for p in v]), np.array([p["lon"] for p in v])
        )
    return vertices.map(one)


@F.pandas_udf(DoubleType())
def ring_length_m(vertices: pd.Series) -> pd.Series:
    """Perimeter / polyline length (m) — LengthProcess."""
    def one(v):
        if v is None or len(v) < 2:
            return 0.0
        return polyline_length_m(
            np.array([p["lat"] for p in v]), np.array([p["lon"] for p in v])
        )
    return vertices.map(one)


centroid_schema = StructType(
    [StructField("lat", DoubleType()), StructField("lon", DoubleType())]
)


@F.pandas_udf(centroid_schema)
def ring_centroid(vertices: pd.Series) -> pd.DataFrame:
    """Vertex-mean centroid per feature (closing vertex dropped) —
    CentroidProcess per-feature variant."""
    lats, lons = [], []
    for v in vertices:
        if v is None or len(v) == 0:
            lats.append(None); lons.append(None); continue
        vl = [p["lat"] for p in v]
        vo = [p["lon"] for p in v]
        if len(vl) > 1 and vl[0] == vl[-1] and vo[0] == vo[-1]:
            vl, vo = vl[:-1], vo[:-1]
        lats.append(float(np.mean(vl)))
        lons.append(float(np.mean(vo)))
    return pd.DataFrame({"lat": lats, "lon": lons})


def combined_centroid(points: DataFrame) -> DataFrame:
    """CentroidProcess(combined=True): centroid of the whole point set —
    one tiny agg, aliased for oracle parity."""
    return points.where(F.col("lat").isNotNull()).agg(
        F.avg("lat").alias("centroid_lat"), F.avg("lon").alias("centroid_lon")
    )


@F.pandas_udf(RING)
def buffer_ngon_udf(lat: pd.Series, lon: pd.Series, radius_m: pd.Series) -> pd.Series:
    """BufferProcess for points: a 32-gon spherical circle polygon.

    For *predicates* prefer the haversine form (operators.knn.near_join) —
    materialize polygons only for export/visualisation.
    """
    n = 32
    bearings = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    out = []
    la = lat.to_numpy(dtype=np.float64)
    lo = lon.to_numpy(dtype=np.float64)
    r = radius_m.to_numpy(dtype=np.float64)
    for i in range(len(la)):
        if np.isnan(la[i]):
            out.append(None)
            continue
        blat, blon = destination_point(la[i], lo[i], bearings, r[i])
        ring = [{"lat": float(a), "lon": float(b)} for a, b in zip(blat, blon)]
        ring.append(ring[0])
        out.append(ring)
    return pd.Series(out)


def chain_length_m_sql(vertices: str = "vertices") -> str:
    """LengthProcess as ONE JVM expression: summed haversine over the vertex
    chain (zip_with pairs + aggregate). Same formula as kernel
    .polyline_length_m; no Python stage."""
    from gaia_spark.functions import portable as P

    pairs = (
        f"zip_with(slice({vertices}, 1, size({vertices}) - 1), "
        f"slice({vertices}, 2, size({vertices}) - 1), "
        "(a, b) -> struct(a.lat AS lat1, a.lon AS lon1, b.lat AS lat2, b.lon AS lon2))"
    )
    h = P.haversine_m_sql("p.lat1", "p.lon1", "p.lat2", "p.lon2")
    return f"aggregate({pairs}, cast(0 as double), (acc, p) -> acc + {h})"


def ring_area_sphere_m2_sql(vertices: str = "vertices") -> str:
    """SPHERICAL polygon area (m²) as ONE JVM aggregate — the
    Chamberlain–Duquette / spherical-shoelace form
    |R²/2 · Σ (λ₂−λ₁)(sin φ₁ + sin φ₂)| over the CLOSED ring. Upgrades
    AreaProcess from the planar/rect forms: exact on the sphere for
    rhumb-edged rings, and reduces algebraically to rect_area_m2_sql on
    lat/lon-aligned rectangles (the oracle cross-check in
    q_parcel_area_sphere). Not valid for rings crossing the antimeridian
    (same caveat as every degree-space vertex op here)."""
    from gaia_spark.functions import portable as P

    pairs = (
        f"zip_with(slice({vertices}, 1, size({vertices}) - 1), "
        f"slice({vertices}, 2, size({vertices}) - 1), "
        "(a, b) -> struct(a.lat AS lat1, a.lon AS lon1, b.lat AS lat2, b.lon AS lon2))"
    )
    term = (
        "(radians(p.lon2) - radians(p.lon1)) * "
        "(sin(radians(p.lat1)) + sin(radians(p.lat2)))"
    )
    acc = f"aggregate({pairs}, cast(0 as double), (acc, p) -> acc + {term})"
    return f"abs(({acc}) * {P.EARTH_RADIUS_M * P.EARTH_RADIUS_M / 2.0})"


def ring_centroid_area_sql(vertices: str = "vertices") -> str:
    """AREA-WEIGHTED polygon centroid (planar shoelace) as a JVM expression
    returning struct(lat, lon) — the semantics of shapely's ``centroid``
    that the reference's CentroidProcess exposes (``[R] gaia/geo/
    processes_vector.py :: CentroidProcess``), unlike the vertex-mean
    variant (kept as ``ring_centroid`` for point clouds)."""
    pairs = (
        f"zip_with(slice({vertices}, 1, size({vertices}) - 1), "
        f"slice({vertices}, 2, size({vertices}) - 1), "
        "(a, b) -> struct(a.lat AS y1, a.lon AS x1, b.lat AS y2, b.lon AS x2))"
    )
    cross = "(p.x1 * p.y2 - p.x2 * p.y1)"
    a2 = f"aggregate({pairs}, cast(0 as double), (acc, p) -> acc + {cross})"
    cx = (
        f"aggregate({pairs}, cast(0 as double), (acc, p) -> acc + (p.x1 + p.x2) * {cross})"
    )
    cy = (
        f"aggregate({pairs}, cast(0 as double), (acc, p) -> acc + (p.y1 + p.y2) * {cross})"
    )
    return f"struct(({cy}) / (3 * ({a2})) AS lat, ({cx}) / (3 * ({a2})) AS lon)"


def buffer_ngon_sql(lat: str = "lat", lon: str = "lon", radius_m: float = 0.0, n: int = 32) -> str:
    """BufferProcess ring as ONE JVM expression: transform(sequence(0, n-1))
    of portable destination points, closing vertex appended. No Python stage
    — and the same portable formulas let the DuckDB oracle mirror any vertex
    in closed form."""
    from gaia_spark.functions import portable as P

    bearing = P.ngon_bearing_sql("i", n)
    lat2, lon2 = P.dest_point_sql(lat, lon, repr(float(radius_m)), bearing)
    ring = (
        f"transform(sequence(0, {n - 1}), i -> "
        f"struct({lat2} AS lat, {lon2} AS lon))"
    )
    return f"concat({ring}, slice({ring}, 1, 1))"


def add_buffer(
    points: DataFrame, radius_m: float, out: str = "buffer", impl: str = "sql"
) -> DataFrame:
    """impl='sql' (default): codegen-able JVM expression; impl='arrow':
    numpy kernel UDF (kept for parity testing / export paths)."""
    if impl == "sql":
        return points.withColumn(
            out,
            F.when(
                F.col("lat").isNotNull(), F.expr(buffer_ngon_sql("lat", "lon", radius_m))
            ),
        )
    return points.withColumn(out, buffer_ngon_udf("lat", "lon", F.lit(float(radius_m))))


# --- great-circle densification (waypoint interpolation) ---------------------


def slerp_cols_sql(
    lat1: str, lon1: str, lat2: str, lon2: str, f: str
) -> dict[str, str]:
    """Spherical linear interpolation at fraction ``f`` along the great
    circle from point 1 to point 2 — the classic aviation-formulary slerp
    (weights sin((1-f)d)/sin d and sin(fd)/sin d on the unit-sphere
    vectors, recombined via atan2). One shared SQL string per output
    column, valid in Spark AND DuckDB, so densified waypoints are
    hash-checkable. Degenerate d = 0 (coincident endpoints) divides by
    zero — callers guarantee distinct endpoints."""
    p1, l1 = f"radians({lat1})", f"radians({lon1})"
    p2, l2 = f"radians({lat2})", f"radians({lon2})"
    hav = (
        f"sin(({p2} - {p1}) / 2) * sin(({p2} - {p1}) / 2) + "
        f"cos({p1}) * cos({p2}) * sin(({l2} - {l1}) / 2) * sin(({l2} - {l1}) / 2)"
    )
    d = f"(2 * asin(sqrt({hav})))"
    a = f"(sin((1.0 - ({f})) * {d}) / sin({d}))"
    b = f"(sin(({f}) * {d}) / sin({d}))"
    x = f"({a} * cos({p1}) * cos({l1}) + {b} * cos({p2}) * cos({l2}))"
    y = f"({a} * cos({p1}) * sin({l1}) + {b} * cos({p2}) * sin({l2}))"
    z = f"({a} * sin({p1}) + {b} * sin({p2}))"
    return {
        "lat": f"degrees(atan2({z}, sqrt({x} * {x} + {y} * {y})))",
        "lon": f"degrees(atan2({y}, {x}))",
    }


def densify_great_circle(
    segs: DataFrame,
    n_points: int,
    lat0: str = "lat0",
    lon0: str = "lon0",
    lat1: str = "lat1",
    lon1: str = "lon1",
) -> DataFrame:
    """One row per (input row, waypoint i in 0..n_points): the input
    segment resampled to n_points+1 points along the geodesic (endpoints
    included bit-exact via f=0 / f=1). In-plan explode + closed-form trig —
    a Generate + Project pipeline, no shuffle, no Python."""
    d = segs.withColumn("i", F.explode(F.expr(f"sequence(0, {int(n_points)})")))
    f = f"(cast(i as double) / {int(n_points)})"
    cols = slerp_cols_sql(lat0, lon0, lat1, lon1, f)
    return d.select(
        *segs.columns,
        F.col("i").cast("int").alias("i"),
        F.expr(cols["lat"]).alias("way_lat"),
        F.expr(cols["lon"]).alias("way_lon"),
    )
