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
