"""Pure-numpy geometry kernel — the engine's vectorized refinement layer.

No geo libraries exist in this environment (no shapely/GDAL/h3/s2), so this
module supplies the numeric kernels that the reference delegates to
shapely/GDAL C code ("prepared geometry" role of
``[R] gaia/geo/processes_vector.py`` compute() bodies and
``[R] gaia/geo/gdal_functions.py``):

- vectorized haversine distance,
- ray-casting point-in-polygon over precompiled edge tables,
- spherical polygon area / polyline length,
- quadtree grid-cell encode/decode/parent/kRing (H3/S2 role),
- Web-Mercator XYZ tile math,
- polygon cell covers (full/partial classification),
- spherical destination points (buffer n-gons).

All functions accept and return numpy arrays and are called ONLY from
Arrow-batched pandas UDFs or driver-side zone preparation — never per row.

Conventions: latitudes in degrees [-90, 90], longitudes in degrees
[-180, 180); grid cell (res r): x = floor((lon+180)/360 * 2^r),
y = floor((90-lat)/180 * 2^r) (y=0 at the north edge), packed id
= y * 2^r + x. The same formulas exist as portable SQL in
:mod:`gaia_spark.functions.portable` — keep them in lockstep.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371008.8
MAX_MERCATOR_LAT = 85.05112877980659
# conservative metres-per-degree-latitude lower bound (used for ring-expansion
# distance lower bounds; true value varies 110_574..111_694)
M_PER_DEG_LAT_MIN = 110_000.0
M_PER_DEG_LON_EQ = 111_320.0


# ---------------------------------------------------------------------------
# distance
# ---------------------------------------------------------------------------

def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in metres (vectorized, broadcasts)."""
    lat1, lon1, lat2, lon2 = (np.asarray(a, dtype=np.float64) for a in (lat1, lon1, lat2, lon2))
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi = p2 - p1
    dlmb = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dphi / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def destination_point(lat, lon, bearing_rad, dist_m):
    """Spherical destination point(s) from (lat, lon) — buffer n-gon vertices."""
    lat, lon = np.asarray(lat, dtype=np.float64), np.asarray(lon, dtype=np.float64)
    d = np.asarray(dist_m, dtype=np.float64) / EARTH_RADIUS_M
    phi1, lmb1 = np.radians(lat), np.radians(lon)
    phi2 = np.arcsin(np.sin(phi1) * np.cos(d) + np.cos(phi1) * np.sin(d) * np.cos(bearing_rad))
    lmb2 = lmb1 + np.arctan2(
        np.sin(bearing_rad) * np.sin(d) * np.cos(phi1),
        np.cos(d) - np.sin(phi1) * np.sin(phi2),
    )
    lon2 = (np.degrees(lmb2) + 540.0) % 360.0 - 180.0
    return np.degrees(phi2), lon2


# ---------------------------------------------------------------------------
# point-in-polygon over precompiled edge tables ("prepared geometry")
# ---------------------------------------------------------------------------

def _close_ring(lats: np.ndarray, lons: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    if lats[0] != lats[-1] or lons[0] != lons[-1]:
        lats = np.append(lats, lats[0])
        lons = np.append(lons, lons[0])
    return lats, lons


class PreparedPolygon:
    """Precompiled edge tables for a polygon — one outer ring, or several
    rings (interior rings = holes; disjoint outer rings = multipolygon).

    Plays the role of shapely's prepared geometry in the reference's
    ``WithinProcess``/``IntersectsProcess`` (``[R] gaia/geo/
    processes_vector.py``): vertices are split into parallel edge arrays once
    so each refinement batch is pure vectorized numpy. Containment is the
    EVEN-ODD rule over the union of all ring edges, which handles holes and
    multipolygons with the identical crossing-parity formula — a point inside
    a hole crosses both the outer and the hole boundary (even → outside).
    """

    __slots__ = ("x1", "y1", "x2", "y2", "min_lat", "max_lat", "min_lon", "max_lon", "rings")

    def __init__(self, lats: np.ndarray, lons: np.ndarray):
        self._init_from_rings([(lats, lons)])

    @classmethod
    def from_rings(cls, rings: list[tuple[np.ndarray, np.ndarray]]) -> "PreparedPolygon":
        """Build from [(ring_lats, ring_lons), ...] — ring 0 outer, further
        rings holes (or extra outer rings for a multipolygon)."""
        obj = cls.__new__(cls)
        obj._init_from_rings(rings)
        return obj

    def _init_from_rings(self, rings: list[tuple[np.ndarray, np.ndarray]]) -> None:
        closed = [_close_ring(la, lo) for la, lo in rings]
        self.rings = [(la.copy(), lo.copy()) for la, lo in closed]
        # edges: (y1,x1) -> (y2,x2); x=lon, y=lat — concatenated across rings
        # (ring-closing vertices never create a cross-ring edge: each ring
        # contributes its own N-1 edges)
        self.y1 = np.concatenate([la[:-1] for la, _ in closed])
        self.x1 = np.concatenate([lo[:-1] for _, lo in closed])
        self.y2 = np.concatenate([la[1:] for la, _ in closed])
        self.x2 = np.concatenate([lo[1:] for _, lo in closed])
        self.min_lat = float(min(la.min() for la, _ in closed))
        self.max_lat = float(max(la.max() for la, _ in closed))
        self.min_lon = float(min(lo.min() for _, lo in closed))
        self.max_lon = float(max(lo.max() for _, lo in closed))

    def contains(self, lats, lons) -> np.ndarray:
        """Even-odd (ray-casting) interior test; boundary is half-open.

        Combine with :meth:`on_boundary` for closed/open semantics:
        within = contains & ~on_boundary; intersects = contains | on_boundary.
        """
        px = np.asarray(lons, dtype=np.float64)[:, None]
        py = np.asarray(lats, dtype=np.float64)[:, None]
        y1, y2, x1, x2 = self.y1[None, :], self.y2[None, :], self.x1[None, :], self.x2[None, :]
        cond = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            xs = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        crossings = cond & (px < xs)
        return (np.count_nonzero(crossings, axis=1) % 2).astype(bool)

    def on_boundary(self, lats, lons, eps: float = 1e-9) -> np.ndarray:
        """True where the point lies on a ring edge (within eps degrees)."""
        px = np.asarray(lons, dtype=np.float64)[:, None]
        py = np.asarray(lats, dtype=np.float64)[:, None]
        y1, y2, x1, x2 = self.y1[None, :], self.y2[None, :], self.x1[None, :], self.x2[None, :]
        dx, dy = x2 - x1, y2 - y1
        seg_len2 = dx * dx + dy * dy
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(seg_len2 > 0, ((px - x1) * dx + (py - y1) * dy) / seg_len2, 0.0)
        t = np.clip(t, 0.0, 1.0)
        d2 = (px - (x1 + t * dx)) ** 2 + (py - (y1 + t * dy)) ** 2
        return (d2 <= eps * eps).any(axis=1)

    def covers(self, lats, lons) -> np.ndarray:
        """Closed containment: interior or boundary (≈ shapely ``covers``)."""
        return self.contains(lats, lons) | self.on_boundary(lats, lons)


def polygon_area_m2(lats: np.ndarray, lons: np.ndarray) -> float:
    """Spherical ring area (m²) — trapezoid form of the spherical shoelace.

    Exact-equal to R²·Δλ·|sin(φ2)−sin(φ1)| for axis-aligned rectangles, which
    keeps the DuckDB oracle (portable SQL) in agreement for rect zones.
    Reference role: ``[R] gaia/geo/processes_vector.py :: AreaProcess``.
    """
    lats = np.radians(np.asarray(lats, dtype=np.float64))
    lons = np.radians(np.asarray(lons, dtype=np.float64))
    if lats[0] != lats[-1] or lons[0] != lons[-1]:
        lats = np.append(lats, lats[0])
        lons = np.append(lons, lons[0])
    s = np.sum((lons[1:] - lons[:-1]) * (np.sin(lats[:-1]) + np.sin(lats[1:])))
    return float(abs(s) * EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0)


def polyline_length_m(lats: np.ndarray, lons: np.ndarray) -> float:
    """Summed haversine length of a vertex chain (m).

    Reference role: ``[R] gaia/geo/processes_vector.py :: LengthProcess``.
    """
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    if len(lats) < 2:
        return 0.0
    return float(np.sum(haversine_m(lats[:-1], lons[:-1], lats[1:], lons[1:])))


# ---------------------------------------------------------------------------
# quadtree grid cells (H3/S2 role)
# ---------------------------------------------------------------------------

def cell_xy(lat, lon, res: int) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) grid coordinates at resolution ``res`` (2^res × 2^res grid)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    n = 1 << res
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((90.0 - lat) / 180.0 * n).astype(np.int64)
    return np.clip(x, 0, n - 1), np.clip(y, 0, n - 1)


def cell_id(x, y, res: int) -> np.ndarray:
    """Pack (x, y) into the row-major cell id y·2^res + x."""
    return np.asarray(y, dtype=np.int64) * (1 << res) + np.asarray(x, dtype=np.int64)


def cell_encode(lat, lon, res: int) -> np.ndarray:
    x, y = cell_xy(lat, lon, res)
    return cell_id(x, y, res)


def cell_decode(cell, res: int) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    n = 1 << res
    return cell % n, cell // n


def cell_parent(cell, res: int, parent_res: int) -> np.ndarray:
    """Cell id of the ancestor at a coarser resolution (bit-shift, no re-join)."""
    x, y = cell_decode(cell, res)
    shift = res - parent_res
    return cell_id(x >> shift, y >> shift, parent_res)


def cell_bounds(cell: int, res: int) -> tuple[float, float, float, float]:
    """(min_lat, max_lat, min_lon, max_lon) of one cell."""
    n = 1 << res
    x, y = int(cell) % n, int(cell) // n
    lon0 = x / n * 360.0 - 180.0
    lat0 = 90.0 - (y + 1) / n * 180.0
    return lat0, lat0 + 180.0 / n, lon0, lon0 + 360.0 / n


def cell_center(cell, res: int) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    n = 1 << res
    x, y = cell % n, cell // n
    lat = 90.0 - (y + 0.5) / n * 180.0
    lon = (x + 0.5) / n * 360.0 - 180.0
    return lat, lon


def kring(cell: int, res: int, radius: int) -> np.ndarray:
    """All cell ids within Chebyshev distance ``radius`` (H3 kRing role).

    Longitude wraps (x mod 2^res); latitude clamps at the poles (no wrap).
    """
    n = 1 << res
    x0, y0 = int(cell) % n, int(cell) // n
    ys = np.arange(max(0, y0 - radius), min(n - 1, y0 + radius) + 1, dtype=np.int64)
    xs = (np.arange(x0 - radius, x0 + radius + 1, dtype=np.int64)) % n
    gx, gy = np.meshgrid(np.unique(xs), ys)
    return (gy.ravel() * n + gx.ravel()).astype(np.int64)


def ring_only(cell: int, res: int, radius: int) -> np.ndarray:
    """Cells at exactly Chebyshev distance ``radius`` (the hollow ring)."""
    if radius == 0:
        return np.array([int(cell)], dtype=np.int64)
    inner = set(kring(cell, res, radius - 1).tolist())
    return np.array(sorted(set(kring(cell, res, radius).tolist()) - inner), dtype=np.int64)


def ring_lower_bound_m(lat: float, res: int, radius: int) -> float:
    """Conservative lower bound on distance from a point in the center cell
    to any point in a cell at Chebyshev ring distance ``radius``.

    Used to terminate kNN ring expansion (SURVEY.md §2.C DistanceProcess):
    once the current k-th best distance is below this bound, no farther ring
    can improve the result. Returns 0 when no useful bound exists (poles).
    """
    if radius <= 1:
        return 0.0
    cell_h_deg = 180.0 / (1 << res)
    # vertical separation bound always holds for |Δy| = radius; horizontal
    # shrinks with cos(lat) — take the min over the two axis-aligned cases.
    vert = (radius - 1) * cell_h_deg * M_PER_DEG_LAT_MIN
    max_abs_lat = min(90.0, abs(lat) + (radius + 1) * cell_h_deg)
    # horizontal bound must also be an UNDER-estimate: haversine on
    # R=6371008.8 gives 111,195 m/deg at the equator, so the 111,320
    # equatorial-WGS84 constant could overshoot the true distance by 0.11%
    # and settle a ring too early — use the same conservative floor as vert
    horiz = (radius - 1) * (360.0 / (1 << res)) * M_PER_DEG_LAT_MIN * max(
        0.0, np.cos(np.radians(max_abs_lat))
    )
    return min(vert, horiz)


# ---------------------------------------------------------------------------
# Web-Mercator XYZ tiles
# ---------------------------------------------------------------------------

def tile_xy(lat, lon, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Slippy-map tile (x, y) at ``zoom`` (SURVEY.md §2.E tile assign)."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_MERCATOR_LAT, MAX_MERCATOR_LAT)
    lon = np.asarray(lon, dtype=np.float64)
    n = 1 << zoom
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    rad = np.radians(lat)
    # ln(tan φ + sec φ) == asinh(tan φ); written in the portable form shared
    # with the DuckDB oracle (no asinh there).
    y = np.floor((1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0 * n).astype(np.int64)
    return np.clip(x, 0, n - 1), np.clip(y, 0, n - 1)


def tile_bounds(z: int, x: int, y: int) -> tuple[float, float, float, float]:
    """(min_lat, max_lat, min_lon, max_lon) of an XYZ tile."""
    n = 1 << z
    lon0 = x / n * 360.0 - 180.0
    lon1 = (x + 1) / n * 360.0 - 180.0

    def _lat(yy):
        return float(np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * yy / n)))))

    return _lat(y + 1), _lat(y), lon0, lon1


# ---------------------------------------------------------------------------
# polygon cell covers
# ---------------------------------------------------------------------------

def bbox_cover(min_lat, min_lon, max_lat, max_lon, res: int) -> np.ndarray:
    """All cells intersecting a bbox (conservative, exact for the grid)."""
    n = 1 << res
    x0 = int(np.clip(np.floor((min_lon + 180.0) / 360.0 * n), 0, n - 1))
    x1 = int(np.clip(np.floor((max_lon + 180.0) / 360.0 * n), 0, n - 1))
    y0 = int(np.clip(np.floor((90.0 - max_lat) / 180.0 * n), 0, n - 1))
    y1 = int(np.clip(np.floor((90.0 - min_lat) / 180.0 * n), 0, n - 1))
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return (gy.ravel() * n + gx.ravel()).astype(np.int64)


def polygon_cover(prep: PreparedPolygon, res: int) -> tuple[np.ndarray, np.ndarray]:
    """(full_cells, partial_cells) cover of a (multi-ring) polygon at ``res``.

    Classification rule, exact for ARBITRARY simple rings (convex or not,
    holes, multipolygons): if no boundary edge's bbox overlaps a cell, the
    boundary cannot pass through it, so the cell is entirely inside or
    entirely outside — the covered probe points decide which. Cells the
    boundary may pass through are *partial* (refinement decides membership);
    entirely-outside cells (bbox corners, hole interiors) are DROPPED from
    the cover. Edge-bbox overlap over-approximates edge-cell intersection,
    which only ever demotes full→partial (safe, never wrong).
    """
    cells = bbox_cover(prep.min_lat, prep.min_lon, prep.max_lat, prep.max_lon, res)
    n = 1 << res
    x, y = cells % n, cells // n
    lon0 = x / n * 360.0 - 180.0
    lon1 = (x + 1) / n * 360.0 - 180.0
    lat1 = 90.0 - y / n * 180.0        # top (max lat)
    lat0 = 90.0 - (y + 1) / n * 180.0  # bottom

    corner_lats = np.stack([lat0, lat0, lat1, lat1, (lat0 + lat1) / 2], axis=1)
    corner_lons = np.stack([lon0, lon1, lon0, lon1, (lon0 + lon1) / 2], axis=1)
    flat_cov = prep.covers(corner_lats.ravel(), corner_lons.ravel()).reshape(-1, 5)
    n_cov = flat_cov.sum(axis=1)

    # does any edge's bbox overlap the cell? (cells × edges, closed compare)
    e_minx = np.minimum(prep.x1, prep.x2)[None, :]
    e_maxx = np.maximum(prep.x1, prep.x2)[None, :]
    e_miny = np.minimum(prep.y1, prep.y2)[None, :]
    e_maxy = np.maximum(prep.y1, prep.y2)[None, :]
    overlap = (
        (e_minx <= lon1[:, None]) & (e_maxx >= lon0[:, None])
        & (e_miny <= lat1[:, None]) & (e_maxy >= lat0[:, None])
    ).any(axis=1)

    full = (n_cov == 5) & ~overlap
    outside = (n_cov == 0) & ~overlap
    return cells[full], cells[~full & ~outside]
