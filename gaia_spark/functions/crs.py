"""CRS handling: WGS84 lon/lat ↔ Web-Mercator meters (EPSG:4326 ↔ 3857).

Reference role: ``[R] gaia/geo/geo_inputs.py :: reproject()`` — the
reference reprojects inputs to a common CRS before binary ops and to a
metric CRS before buffer/area/length. This engine's two CRSs are closed-form
convertible, so "reprojection" is a pure column expression (codegen'd,
oracle-mirrorable) rather than a GDAL call.
"""

from __future__ import annotations

import numpy as np

WEBMERCATOR_R = 6378137.0  # EPSG:3857 sphere radius
MAX_MERCATOR_LAT = 85.05112877980659


def merc_x_sql(lon: str) -> str:
    return f"({WEBMERCATOR_R} * radians({lon}))"


def merc_y_sql(lat: str) -> str:
    lat_c = f"least(85.05112877980659, greatest(-85.05112877980659, {lat}))"
    return f"({WEBMERCATOR_R} * ln(tan(radians({lat_c}) / 2 + pi() / 4)))"


def inv_merc_lon_sql(x: str) -> str:
    return f"(degrees(({x}) / {WEBMERCATOR_R}))"


def inv_merc_lat_sql(y: str) -> str:
    return f"(degrees(2 * atan(exp(({y}) / {WEBMERCATOR_R})) - pi() / 2))"


def merc_xy(lat, lon) -> tuple[np.ndarray, np.ndarray]:
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_MERCATOR_LAT, MAX_MERCATOR_LAT)
    lon = np.asarray(lon, dtype=np.float64)
    x = WEBMERCATOR_R * np.radians(lon)
    y = WEBMERCATOR_R * np.log(np.tan(np.radians(lat) / 2 + np.pi / 4))
    return x, y


def inv_merc(x, y) -> tuple[np.ndarray, np.ndarray]:
    lon = np.degrees(np.asarray(x, dtype=np.float64) / WEBMERCATOR_R)
    lat = np.degrees(2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / WEBMERCATOR_R)) - np.pi / 2)
    return lat, lon


# ---------------------------------------------------------------------------
# Transverse Mercator (UTM zones) — spherical closed form
# ---------------------------------------------------------------------------

UTM_K0 = 0.9996
UTM_FALSE_E = 500_000.0
UTM_FALSE_N_S = 10_000_000.0  # southern-hemisphere false northing


def utm_zone_lon0(zone: int) -> float:
    """Central meridian of UTM zone 1..60."""
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone must be 1..60, got {zone}")
    return -183.0 + 6.0 * zone


def utm_x_sql(lat: str, lon: str, zone: int) -> str:
    """Spherical transverse-Mercator easting (meters, false easting applied).
    B = cos(lat)·sin(lon−lon0); x = k0·R/2 · ln((1+B)/(1−B))."""
    lon0 = utm_zone_lon0(zone)
    b = f"(cos(radians({lat})) * sin(radians(({lon}) - {lon0!r})))"
    return f"({UTM_K0} * {WEBMERCATOR_R} / 2 * ln((1 + {b}) / (1 - {b})) + {UTM_FALSE_E})"


def utm_y_sql(lat: str, lon: str, zone: int, south: bool = False) -> str:
    """Spherical transverse-Mercator northing:
    y = k0·R·(atan(tan(lat)/cos(lon−lon0)) − lat... ) — standard spherical
    form y = k0·R·atan2(tan(lat), cos(Δlon))."""
    lon0 = utm_zone_lon0(zone)
    core = f"atan(tan(radians({lat})) / cos(radians(({lon}) - {lon0!r})))"
    fn = UTM_FALSE_N_S if south else 0.0
    return f"({UTM_K0} * {WEBMERCATOR_R} * {core} + {fn!r})"


SUPPORTED_CRS = ("EPSG:4326", "EPSG:3857", "EPSG:326xx (spherical)", "EPSG:327xx (spherical)")


def reproject(df, src: str, dst: str, lat: str = "lat", lon: str = "lon", x: str = "x", y: str = "y"):
    """CRS reprojection API (``[R] gaia/geo/geo_inputs.py :: reproject()``
    role). Pure column expressions — codegen'd, oracle-mirrorable, no GDAL.

    Supported pairs:

    - ``EPSG:4326`` ↔ ``EPSG:3857`` (exact closed form)
    - ``EPSG:4326`` → ``EPSG:326NN`` / ``EPSG:327NN`` (UTM zone NN,
      SPHERICAL transverse Mercator — documented approximation: vs true
      ellipsoidal UTM the northing differs by up to ~0.5% (meridian arc on
      the R=6378137 sphere vs WGS84); use it for binning/relative
      measures, not survey-grade coordinates)

    Anything else raises with the supported-CRS story — this engine does
    not silently mis-project. 4326 inputs read ``lat``/``lon`` columns;
    projected inputs read ``x``/``y``; outputs are written likewise.
    """
    import pyspark.sql.functions as F

    def norm(c: str) -> str:
        return c.upper().replace(" ", "")

    s, d = norm(src), norm(dst)
    if s == d:
        return df
    if s == "EPSG:4326" and d == "EPSG:3857":
        return df.withColumn(x, F.expr(merc_x_sql(lon))).withColumn(y, F.expr(merc_y_sql(lat)))
    if s == "EPSG:3857" and d == "EPSG:4326":
        return df.withColumn(lat, F.expr(inv_merc_lat_sql(y))).withColumn(
            lon, F.expr(inv_merc_lon_sql(x))
        )
    if s == "EPSG:4326" and (d.startswith("EPSG:326") or d.startswith("EPSG:327")):
        zone = int(d[8:])
        south = d.startswith("EPSG:327")
        return df.withColumn(x, F.expr(utm_x_sql(lat, lon, zone))).withColumn(
            y, F.expr(utm_y_sql(lat, lon, zone, south))
        )
    raise NotImplementedError(
        f"reproject {src} -> {dst}: supported CRS pairs are "
        f"{SUPPORTED_CRS} (no proj database offline; see functions/crs.py)"
    )


# --- equal-area / azimuthal projection family (spherical closed forms) -------
#
# The reference reaches these through GDAL/pyproj; here each is one shared
# trig expression (codegen'd, oracle-mirrorable). All spherical on the
# authalic-style single radius below — the documented engine convention
# (UTM's ~0.5% note in SUPPORTED_CRS applies equally).

PROJ_R = 6371008.8  # mean earth radius, matches portable.EARTH_RADIUS_M


def laea_xy_sql(lat: str, lon: str, lat0: float, lon0: float) -> tuple[str, str]:
    """Lambert azimuthal equal-area centered at (lat0, lon0) — Snyder
    (24-2..24-4): k' = sqrt(2 / (1 + sin φ0 sin φ + cos φ0 cos φ cos Δλ)),
    x = R k' cos φ sin Δλ, y = R k' (cos φ0 sin φ − sin φ0 cos φ cos Δλ).
    The antipode (denominator → 0) is clamped away with the shared
    greatest() idiom."""
    dl = f"(radians({lon}) - radians({float(lon0)}))"
    s0, c0 = f"sin(radians({float(lat0)}))", f"cos(radians({float(lat0)}))"
    sp, cp = f"sin(radians({lat}))", f"cos(radians({lat}))"
    den = f"greatest(cast(1 as double) / cast(1000000000 as double), (1 + {s0} * {sp} + {c0} * {cp} * cos({dl})))"
    k = f"sqrt(2 / {den})"
    x = f"({PROJ_R} * {k} * {cp} * sin({dl}))"
    y = f"({PROJ_R} * {k} * ({c0} * {sp} - {s0} * {cp} * cos({dl})))"
    return x, y


def sinusoidal_xy_sql(lat: str, lon: str, lon0: float = 0.0) -> tuple[str, str]:
    """Sinusoidal (equal-area, pseudocylindrical): x = R Δλ cos φ, y = R φ."""
    dl = f"(radians({lon}) - radians({float(lon0)}))"
    return (
        f"({PROJ_R} * {dl} * cos(radians({lat})))",
        f"({PROJ_R} * radians({lat}))",
    )


def albers_xy_sql(
    lat: str, lon: str, lat0: float, lon0: float, lat1: float, lat2: float
) -> tuple[str, str]:
    """Albers equal-area conic with standard parallels lat1/lat2 — Snyder
    (14-1..14-4) spherical form:
        n = (sin φ1 + sin φ2) / 2
        C = cos²φ1 + 2 n sin φ1
        ρ  = R sqrt(C − 2 n sin φ) / n,  θ = n Δλ
        x = ρ sin θ, y = ρ0 − ρ cos θ
    Constants are folded in Python to plain double literals so the SQL
    stays small and identical in both engines."""
    import math

    n = (math.sin(math.radians(lat1)) + math.sin(math.radians(lat2))) / 2
    c = math.cos(math.radians(lat1)) ** 2 + 2 * n * math.sin(math.radians(lat1))
    rho0 = PROJ_R * math.sqrt(c - 2 * n * math.sin(math.radians(lat0))) / n
    rho = f"({PROJ_R} * sqrt({c!r} - {2 * n!r} * sin(radians({lat}))) / {n!r})"
    th = f"({n!r} * (radians({lon}) - radians({float(lon0)})))"
    return (
        f"({rho} * sin({th}))",
        f"({rho0!r} - {rho} * cos({th}))",
    )
