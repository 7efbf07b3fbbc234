"""Portable SQL expression builders shared by the Spark plan and the DuckDB
correctness oracle.

Every geometric/derivation formula that participates in an oracle-checked
query is defined HERE once, as a SQL string over the intersection of Spark
SQL and DuckDB 1.0 (ln, sin/cos/asin/tan, radians, pi, floor, least/greatest,
%, ||). The Spark side consumes it via ``F.expr``; the oracle embeds the same
string. Divergent builtins go through the small macro table below.

Kept in lockstep with the numpy kernels in
:mod:`gaia_spark.functions.kernel` (same formulas, same constants).
"""

from __future__ import annotations

import math

EARTH_RADIUS_M = 6371008.8

SPARK = "spark"
DUCK = "duck"

# --- dialect macros ---------------------------------------------------------

def md5_int60(s: str, dialect: str) -> str:
    """First 60 bits of md5(s) as a non-negative BIGINT — the cross-engine
    deterministic hash used for MinHash/SimHash/LSH (md5 output is identical
    in Spark and DuckDB; only hex→int differs)."""
    if dialect == SPARK:
        return f"cast(conv(substring(md5({s}), 1, 15), 16, 10) as bigint)"
    return f"cast('0x' || substr(md5({s}), 1, 15) as bigint)"


def split_ws(s: str, dialect: str) -> str:
    """Whitespace tokenization (identical token streams in both engines)."""
    if dialect == SPARK:
        return f"split(trim({s}), '\\\\s+')"
    return f"string_split_regex(trim({s}), '\\s+')"


def elem(arr: str, idx1: str, dialect: str) -> str:
    """1-based array element access."""
    if dialect == SPARK:
        return f"element_at({arr}, {idx1})"
    return f"list_element({arr}, {idx1})"


def arr_size(arr: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"size({arr})"
    return f"len({arr})"


def bigint_div(a: str, b: str, dialect: str) -> str:
    """EXACT integer division of non-negative BIGINTs — unlike
    :func:`idiv_sql` this never routes through a double, so it stays exact
    past 2^52 (needed when dividing order-independent fixed-point SUMS).
    Spark ``div`` truncates, DuckDB ``//`` floors — identical for the
    non-negative operands this macro is documented for."""
    if dialect == SPARK:
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


# --- shared formulas (verbatim in both dialects) -----------------------------

def haversine_m_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle distance in metres. Same ops/order as kernel.haversine_m."""
    return (
        f"(2.0 * {EARTH_RADIUS_M} * asin(sqrt("
        f"pow(sin((radians({lat2}) - radians({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin((radians({lon2}) - radians({lon1})) / 2), 2))))"
    )


def idiv_sql(a: str, b: int) -> str:
    """Non-negative integer division, portable (no >> operator in Spark SQL,
    no shiftright() in DuckDB). Exact for values < 2^52."""
    return f"cast(floor(({a}) / {float(b)}) as bigint)"


def clamp_sql(v: str, lo: str, hi: str) -> str:
    return f"least({hi}, greatest({lo}, {v}))"


def cell_x_sql(lon: str, res: int) -> str:
    n = 1 << res
    raw = f"cast(floor((({lon}) + 180.0) / 360.0 * {n}) as bigint)"
    return clamp_sql(raw, "0", str(n - 1))


def cell_y_sql(lat: str, res: int) -> str:
    n = 1 << res
    raw = f"cast(floor((90.0 - ({lat})) / 180.0 * {n}) as bigint)"
    return clamp_sql(raw, "0", str(n - 1))


def cell_id_sql(lat: str, lon: str, res: int) -> str:
    """Row-major packed grid cell id: y·2^res + x (kernel.cell_encode)."""
    n = 1 << res
    return f"({cell_y_sql(lat, res)} * {n} + {cell_x_sql(lon, res)})"


def cell_parent_sql(cell: str, res: int, parent_res: int) -> str:
    """Ancestor cell id at a coarser resolution, from a packed id."""
    n, shift = 1 << res, res - parent_res
    pn = 1 << parent_res
    x, y = f"(({cell}) % {n})", idiv_sql(cell, n)
    return f"({idiv_sql(y, 1 << shift)} * {pn} + {idiv_sql(x, 1 << shift)})"


def tile_x_sql(lon: str, zoom: int) -> str:
    return cell_x_sql(lon, zoom)  # same formula


def tile_y_sql(lat: str, zoom: int) -> str:
    """Web-Mercator tile row; ln(tan+sec) form — DuckDB 1.0 has no asinh."""
    n = 1 << zoom
    lat_c = clamp_sql(lat, "-85.05112877980659", "85.05112877980659")
    merc = f"ln(tan(radians({lat_c})) + 1.0 / cos(radians({lat_c})))"
    raw = f"cast(floor((1.0 - {merc} / pi()) / 2.0 * {n}) as bigint)"
    return clamp_sql(raw, "0", str(n - 1))


def rect_area_m2_sql(min_lat: str, min_lon: str, max_lat: str, max_lon: str) -> str:
    """Spherical area of a lat/lon-aligned rectangle (m²); equals
    kernel.polygon_area_m2 of its 5-point ring for rect zones."""
    r2 = EARTH_RADIUS_M * EARTH_RADIUS_M
    return (
        f"({r2} * (radians({max_lon}) - radians({min_lon})) * "
        f"abs(sin(radians({max_lat})) - sin(radians({min_lat}))))"
    )


def sin_authalic_sql(lat_deg: str) -> str:
    """sin of the AUTHALIC latitude of geodetic ``lat_deg`` (degrees) on
    WGS84, via the EXACT q-function (Snyder, Map Projections §3,
    eq. 3-11/3-12 — public domain): sin ξ = q(φ)/q(90°) with
    q(φ) = (1−e²)·[sinφ/(1−e²sin²φ) − (1/2e)·ln((1−e·sinφ)/(1+e·sinφ))].
    No series truncation; `ln` is natural log on BOTH engines (Spark `ln`
    = DuckDB `ln`; never `log`, which is base-10 in DuckDB). The authalic
    sphere has exactly the ellipsoid's surface area, so areas measured on
    it with authalic latitudes are exact ellipsoidal areas."""
    c = lambda v: f"cast({v!r} as double)"
    e2 = WGS84_F * (2.0 - WGS84_F)
    e = math.sqrt(e2)
    qp = (1.0 - e2) * (
        1.0 / (1.0 - e2) - (1.0 / (2.0 * e)) * math.log((1.0 - e) / (1.0 + e))
    )
    s = f"sin(radians({lat_deg}))"
    q = (
        f"({c(1.0 - e2)} * (({s}) / (1 - {c(e2)} * ({s}) * ({s})) "
        f"- {c(1.0 / (2.0 * e))} * ln((1 - {c(e)} * ({s})) / (1 + {c(e)} * ({s})))))"
    )
    return f"({q} / {c(qp)})"


def authalic_radius_sq() -> float:
    """R_A² of WGS84 (m²): a²·q(90°)/2 — the sphere with the ellipsoid's
    exact surface area."""
    e2 = WGS84_F * (2.0 - WGS84_F)
    e = math.sqrt(e2)
    qp = (1.0 - e2) * (
        1.0 / (1.0 - e2) - (1.0 / (2.0 * e)) * math.log((1.0 - e) / (1.0 + e))
    )
    return WGS84_A * WGS84_A * qp / 2.0


def rect_area_ellipsoid_m2_sql(
    min_lat: str, min_lon: str, max_lat: str, max_lon: str
) -> str:
    """EXACT WGS84-ellipsoid area of a lat/lon-aligned rectangle (m²):
    R_A² · Δλ · |sin ξ(max_lat) − sin ξ(min_lat)| — the authalic map is
    area-preserving, and for geodetic rects this closed form IS the
    ellipsoidal surface integral ∫∫ a²(1−e²)cosφ/(1−e²sin²φ)² dφ dλ."""
    ra2 = authalic_radius_sq()
    return (
        f"({ra2!r} * (radians({max_lon}) - radians({min_lon})) * "
        f"abs({sin_authalic_sql(max_lat)} - {sin_authalic_sql(min_lat)}))"
    )


def floor_scaled_sql(x: str, k: int) -> str:
    """Fixed-point integerization: cast(floor(x·10^k + 0.5) as bigint).

    Used for every float output of an oracle-checked query: Spark's
    ``round`` goes through BigDecimal.valueOf (shortest-decimal) while
    DuckDB rounds the binary double, so ``round()`` can disagree — this
    floor form evaluates identically on identical binary doubles. The +0.5
    matters: currency-like inputs make x·10^k an exact integer, where
    cross-engine 1e-12 summation-order noise would flip a bare floor;
    +0.5 re-centers those values mid-interval.
    """
    return f"cast(floor(({x}) * {10 ** k} + 0.5) as bigint)"


def pos_mod_sql(x: str, m: float) -> str:
    """Floor-based positive modulo (numpy ``%`` twin; SQL ``%`` sign-follows
    the dividend in both engines, which differs for negative input)."""
    return f"(({x}) - {float(m)} * floor(({x}) / {float(m)}))"


def dest_point_sql(lat: str, lon: str, dist_m: str, bearing_rad: str) -> tuple[str, str]:
    """Spherical destination point (lat2, lon2) — the SQL twin of
    kernel.destination_point, op-for-op (same formula order, so numpy and
    both SQL engines agree to fp rounding)."""
    d = f"(({dist_m}) / {EARTH_RADIUS_M})"
    phi1 = f"radians({lat})"
    phi2 = (
        f"asin(sin({phi1}) * cos({d}) + cos({phi1}) * sin({d}) * cos({bearing_rad}))"
    )
    lam2 = (
        f"(radians({lon}) + atan2(sin({bearing_rad}) * sin({d}) * cos({phi1}), "
        f"cos({d}) - sin({phi1}) * sin({phi2})))"
    )
    lat2 = f"degrees({phi2})"
    lon2 = f"({pos_mod_sql(f'degrees({lam2}) + 540.0', 360.0)} - 180.0)"
    return lat2, lon2


def ngon_bearing_sql(i: str, n: int) -> str:
    """Bearing of vertex ``i`` of an n-gon circle: i · (2π/n), the exact op
    order of np.linspace(0, 2π, n, endpoint=False)."""
    return f"(cast({i} as double) * ((2 * pi()) / {n}))"


def cell_center_lat_sql(y: str, res: int) -> str:
    """Latitude of the center of grid row ``y`` at ``res`` (inverse of
    cell_y_sql's floor bucketing)."""
    n = 1 << res
    return f"(90.0 - (({y}) + 0.5) * {180.0 / n})"


def cell_center_lon_sql(x: str, res: int) -> str:
    n = 1 << res
    return f"((({x}) + 0.5) * {360.0 / n} - 180.0)"


def bearing_deg_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Initial great-circle bearing (forward azimuth) from point 1 to point 2,
    degrees in [0, 360). The ST_Azimuth analog ([R] SURVEY §0 DistanceProcess
    family). Portable: atan2/sin/cos/radians only."""
    dlam = f"(radians({lon2}) - radians({lon1}))"
    y = f"(sin({dlam}) * cos(radians({lat2})))"
    x = (
        f"(cos(radians({lat1})) * sin(radians({lat2})) - "
        f"sin(radians({lat1})) * cos(radians({lat2})) * cos({dlam}))"
    )
    return pos_mod_sql(f"degrees(atan2({y}, {x}))", 360.0)


# --- geohash (base-32 bit-interleaved encoding) ------------------------------

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_bits(precision: int) -> tuple[int, int]:
    """(lon_bits, lat_bits) of a geohash at ``precision`` chars — lon takes
    the even stream positions starting at the MSB, so it gets the extra bit
    when 5·precision is odd."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    return lon_bits, total - lon_bits


def geohash_lonq_sql(lon: str, precision: int) -> str:
    """Quantized longitude: floor((lon+180)/360 · 2^lon_bits), clamped."""
    nbits, _ = geohash_bits(precision)
    n = 1 << nbits
    raw = f"cast(floor((({lon}) + 180.0) / 360.0 * {n}) as bigint)"
    return clamp_sql(raw, "0", str(n - 1))


def geohash_latq_sql(lat: str, precision: int) -> str:
    _, nbits = geohash_bits(precision)
    n = 1 << nbits
    raw = f"cast(floor((({lat}) + 90.0) / 180.0 * {n}) as bigint)"
    return clamp_sql(raw, "0", str(n - 1))


def _geohash_stream_bit(latq: str, lonq: str, precision: int, pos: int) -> str:
    """Bit at interleaved-stream position ``pos`` (0 = MSB): even positions
    take lon bits, odd take lat bits, each MSB-first."""
    lon_bits, lat_bits = geohash_bits(precision)
    if pos % 2 == 0:
        src, nbits, j = lonq, lon_bits, pos // 2
    else:
        src, nbits, j = latq, lat_bits, pos // 2
    return f"({idiv_sql(src, 1 << (nbits - 1 - j))} % 2)"


def geohash_sql(latq: str, lonq: str, precision: int) -> str:
    """Geohash string from quantized lat/lon: each base-32 character packs 5
    interleaved-stream bits (lon at even stream positions from the MSB).
    Characters are built straight from the quantized integers — never through
    the full 5·precision-bit interleaved value, which exceeds the 2^52 exact
    range of idiv_sql's float division at precision ≥ 11. Pure +,*,%,floor
    arithmetic with literal power-of-two constants, so the identical string
    runs in Spark SQL and DuckDB. Exact for precision ≤ 12."""
    chars = []
    for i in range(precision):
        terms = [
            f"{_geohash_stream_bit(latq, lonq, precision, 5 * i + b)} * {1 << (4 - b)}"
            for b in range(5)
        ]
        digit = "(" + " + ".join(terms) + ")"
        chars.append(f"substring('{GEOHASH32}', cast({digit} as int) + 1, 1)")
    return "(" + " || ".join(chars) + ")"


# --- quadkey / Morton Z-order (tile linearization) ---------------------------
#
# Role: `[R] raster↔vector tiling` — the Bing-style quadkey names a tile by
# the base-4 digits of its bit-interleaved (x, y), and the same digits read
# as an integer are the Morton (Z-order) code. Morton is the 100-TB layout
# primitive: sorting/range-partitioning a table by morton before writing
# parquet makes spatially-adjacent tiles land in the same files, so min/max
# row-group stats prune bbox queries. Pure unrolled +,*,%,floor arithmetic
# (the geohash pattern) — one string for both engines; exact for zoom ≤ 26
# (morton < 4^26 = 2^52, within idiv_sql's float-exact range).


def _tile_bit_sql(v: str, zoom: int, i: int) -> str:
    """Bit (zoom - i) of a tile coordinate, i = 1..zoom (MSB first)."""
    shift = zoom - i
    if shift == 0:
        return f"(({v}) % 2)"
    return f"({idiv_sql(v, 1 << shift)} % 2)"


def quadkey_sql(tx: str, ty: str, zoom: int) -> str:
    """Quadkey string of tile (tx, ty) at ``zoom``: digit_i = 2·bit_i(y) +
    bit_i(x), MSB first. The level-(z-1) quadkey is the leading prefix —
    parent/child containment is string prefix testing."""
    chars = [
        "substring('0123', cast(2 * "
        + _tile_bit_sql(ty, zoom, i)
        + " + "
        + _tile_bit_sql(tx, zoom, i)
        + " as int) + 1, 1)"
        for i in range(1, zoom + 1)
    ]
    return "(" + " || ".join(chars) + ")"


def morton_sql(tx: str, ty: str, zoom: int) -> str:
    """Morton (Z-order) code — the quadkey digits read base-4: Σ digit_i ·
    4^(zoom-i). Interleaves bits so 2-D-adjacent tiles are near in 1-D."""
    if zoom > 26:
        raise ValueError("morton_sql exact only for zoom <= 26 (2^52 bound)")
    terms = [
        "(2 * "
        + _tile_bit_sql(ty, zoom, i)
        + " + "
        + _tile_bit_sql(tx, zoom, i)
        + f") * {4 ** (zoom - i)}"
        for i in range(1, zoom + 1)
    ]
    return "cast((" + " + ".join(terms) + ") as bigint)"


# --- deterministic key-derived test geometry (FIXTURES.md §6) -----------------

def key_lat_sql(key: str) -> str:
    """lat in [-85, 85) derived from an integer key — identical in both
    engines, which makes spatial joins fully value-hash oracle-checkable.
    NB: division is by cast(... as double) — a bare 100.0 literal is
    DECIMAL in Spark SQL (decimal arithmetic) but DOUBLE in DuckDB."""
    return f"((({key}) * 7919 % 17000) / cast(100 as double) - 85.0)"


def key_lon_sql(key: str) -> str:
    return f"((({key}) * 104729 % 36000) / cast(100 as double) - 180.0)"


def key_lat_py(key):
    import numpy as np

    k = np.asarray(key, dtype=np.int64)
    return (k * 7919 % 17000) / 100.0 - 85.0


def key_lon_py(key):
    import numpy as np

    k = np.asarray(key, dtype=np.int64)
    return (k * 104729 % 36000) / 100.0 - 180.0


# --- hexagonal binning (pointy-top axial hex grid in degree space) ----------
#
# The hexagonal analog of the packed rect cell: points are assigned to the
# nearest center of a pointy-top hex lattice laid over (lon, lat) degree
# space (same planar simplification as the rect grid — document distortion,
# don't hide it). Assignment = fractional axial coords + cube rounding,
# all portable arithmetic: the one rounding primitive is floor(x + 0.5),
# which evaluates identically on identical binary doubles in both engines
# (Spark/DuckDB round() would not).

SQRT3 = 1.7320508075688772
_HEX_OFF = 1 << 20  # axial coords are offset non-negative before packing


def hex_q_sql(lat: str, lon: str, size_deg: float) -> str:
    """Fractional axial q of a pointy-top hex lattice (circumradius
    ``size_deg`` degrees): q = (√3/3·x − 1/3·y) / s with x=lon, y=lat."""
    s = float(size_deg)
    return f"(({SQRT3} / 3.0 * ({lon}) - 1.0 / 3.0 * ({lat})) / {s!r})"


def hex_r_sql(lat: str, lon: str, size_deg: float) -> str:
    s = float(size_deg)
    return f"((2.0 / 3.0 * ({lat})) / {s!r})"


def hex_round_cols_sql(q: str, r: str) -> dict[str, str]:
    """Cube-rounding intermediates over fractional axial columns ``q, r``:
    returns SQL for _rx/_ry/_rz (half-up rounded cube coords) and
    _dx/_dy/_dz (rounding errors). Meant to be staged as columns (Spark
    withColumn / oracle CTE) so the final fix-up CASEs stay small."""
    return {
        "_rx": f"floor(({q}) + 0.5)",
        "_ry": f"floor((-({q}) - ({r})) + 0.5)",
        "_rz": f"floor(({r}) + 0.5)",
        "_dx": f"abs(floor(({q}) + 0.5) - ({q}))",
        "_dy": f"abs(floor((-({q}) - ({r})) + 0.5) - (-({q}) - ({r})))",
        "_dz": f"abs(floor(({r}) + 0.5) - ({r}))",
    }


def hex_axial_x_sql() -> str:
    """Final axial x after the cube fix-up (largest rounding error is
    recomputed from the other two so x+y+z == 0). Reads the staged
    _rx/_ry/_rz/_dx/_dy/_dz columns."""
    return (
        "(CASE WHEN _dx > _dy AND _dx > _dz THEN -_ry - _rz ELSE _rx END)"
    )


def hex_axial_z_sql() -> str:
    return (
        "(CASE WHEN _dx > _dy AND _dx > _dz THEN _rz "
        "WHEN _dy > _dz THEN _rz ELSE -_rx - _ry END)"
    )


def hex_id_sql(ax: str, az: str) -> str:
    """Pack offset axial (x, z) into one BIGINT: (x+2^20)·2^21 + (z+2^20)."""
    return (
        f"(cast(({ax}) + {_HEX_OFF} as bigint) * {1 << 21} "
        f"+ cast(({az}) + {_HEX_OFF} as bigint))"
    )


def hex_center_lat_sql(az: str, size_deg: float) -> str:
    """Latitude of a hex center from its axial z (r): y = s·(3/2)·r."""
    return f"({float(size_deg)!r} * 1.5 * ({az}))"


def hex_center_lon_sql(ax: str, az: str, size_deg: float) -> str:
    """Longitude of a hex center: x = s·√3·(q + r/2)."""
    return f"({float(size_deg)!r} * {SQRT3} * (({ax}) + ({az}) / 2.0))"


def hilbert_step_exprs(x: str, y: str, d: str, s: int, n: int) -> tuple[str, str, str]:
    """One xy2d Hilbert-curve level (bit ``s`` of an order-log2(n) curve):
    returns (d', x', y') expression strings over the current (x, y, d)
    columns. The classic bit-ops formulation is rewritten XOR-free —
    (3·rx)^ry = CASE rx — and reflections use n-1-v (the full-grid variant),
    which keeps x, y in [0, n-1] so idiv_sql/% stay in their documented
    non-negative domain. Same string runs in Spark SQL and DuckDB
    (+, *, %, floor, CASE only)."""
    rx = f"({idiv_sql(x, s)} % 2)"
    ry = f"({idiv_sql(y, s)} % 2)"
    d2 = (
        f"({d} + {s * s} * (CASE WHEN {rx} = 1 THEN 3 - {ry} ELSE {ry} END))"
    )
    x2 = (
        f"(CASE WHEN {ry} = 1 THEN {x} "
        f"WHEN {rx} = 1 THEN {n - 1} - ({y}) ELSE {y} END)"
    )
    y2 = (
        f"(CASE WHEN {ry} = 1 THEN {y} "
        f"WHEN {rx} = 1 THEN {n - 1} - ({x}) ELSE {x} END)"
    )
    return d2, x2, y2


def hilbert_grid_x_sql(lon: str, order: int) -> str:
    """Column of the order-p Hilbert grid (2^p × 2^p over the lon/lat
    rectangle) — same quantization family as cell_x_sql, kept separate so
    the Hilbert index is self-contained."""
    n = 1 << order
    raw = f"cast(floor((({lon}) + 180.0) / 360.0 * {n}) as bigint)"
    return clamp_sql(raw, "0", str(n - 1))


def hilbert_grid_y_sql(lat: str, order: int) -> str:
    n = 1 << order
    raw = f"cast(floor((({lat}) + 90.0) / 180.0 * {n}) as bigint)"
    return clamp_sql(raw, "0", str(n - 1))


def destination_sqls(lat: str, lon: str, bearing_deg: str, dist_m: str) -> tuple[str, str]:
    """Geodesic destination point (the ST_Project analog, inverse of
    bearing_deg_sql): (lat2, lon2) expression strings for travelling
    ``dist_m`` metres from (lat, lon) on initial bearing ``bearing_deg``
    over the sphere:

        φ2 = asin(sin φ1·cos δ + cos φ1·sin δ·cos θ)
        λ2 = λ1 + atan2(sin θ·sin δ·cos φ1, cos δ − sin φ1·sin φ2)

    Portable libm surface (sin/cos/asin/atan2/radians/degrees — the same
    set haversine_m_sql already hash-proves matches across engines);
    longitude normalized to [-180, 180)."""
    d = f"(({dist_m}) / {EARTH_RADIUS_M})"
    th = f"radians({bearing_deg})"
    p1 = f"radians({lat})"
    # clamp: float noise can push |sin φ2| to 1 + ε, and asin(>1) is NaN
    sinp2 = (
        f"least(cast(1 as double), greatest(cast(-1 as double), "
        f"sin({p1}) * cos({d}) + cos({p1}) * sin({d}) * cos({th})))"
    )
    lat2 = f"degrees(asin({sinp2}))"
    lam2 = (
        f"(radians({lon}) + atan2(sin({th}) * sin({d}) * cos({p1}), "
        f"cos({d}) - sin({p1}) * {sinp2}))"
    )
    lon2 = f"({pos_mod_sql(f'(degrees({lam2}) + 180.0)', 360.0)} - 180.0)"
    return lat2, lon2


def hilbert_unstep_exprs(t: str, x: str, y: str, s: int) -> tuple[str, str, str]:
    """One d2xy Hilbert-decode level at scale ``s`` (ascending 1, 2, …,
    n/2): returns (t', x', y') expression strings — the exact inverse of
    :func:`hilbert_step_exprs` (verified d == xy2d(d2xy(d)) for every cell
    up to n=64 before SQL-ification). XOR-free: ry = (t%2 + rx) % 2; all
    intermediate x, y stay in [0, s) before the +s·r shifts, so idiv/% stay
    non-negative. Same string runs in Spark SQL and DuckDB."""
    rx = f"({idiv_sql(t, 2)} % 2)"
    ry = f"(((({t}) % 2) + {rx}) % 2)"
    rot_x = (
        f"(CASE WHEN {ry} = 1 THEN {x} "
        f"WHEN {rx} = 1 THEN {s - 1} - ({y}) ELSE {y} END)"
    )
    rot_y = (
        f"(CASE WHEN {ry} = 1 THEN {y} "
        f"WHEN {rx} = 1 THEN {s - 1} - ({x}) ELSE {x} END)"
    )
    x2 = f"({rot_x} + {s} * {rx})"
    y2 = f"({rot_y} + {s} * {ry})"
    t2 = idiv_sql(t, 4)
    return t2, x2, y2


def gc_waypoint_sqls(
    lat1: str, lon1: str, lat2: str, lon2: str, f_num: int, f_den: int
) -> tuple[str, str]:
    """Great-circle waypoint at fraction f = f_num/f_den between two points
    (spherical slerp — the route-densify primitive beside bearing and
    destination): interpolate on the chord in 3-D Cartesian with
    sin-weights A = sin((1−f)ω)/sin ω, B = sin(fω)/sin ω, then atan2 back.
    The central angle ω derives from the same haversine the engine already
    hash-proves; coincident endpoints (sin ω = 0) fall back to the start
    point. f is spelled as an exact integer ratio (a bare 0.25 literal is
    DECIMAL in Spark SQL but DOUBLE in DuckDB)."""
    f = f"(cast({f_num} as double) / cast({f_den} as double))"
    hav = (
        f"(pow(sin((radians({lat2}) - radians({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin((radians({lon2}) - radians({lon1})) / 2), 2))"
    )
    om = f"(2 * asin(least(cast(1 as double), sqrt({hav}))))"
    a = f"(sin((cast(1 as double) - {f}) * {om}) / sin({om}))"
    b = f"(sin({f} * {om}) / sin({om}))"
    x = (
        f"({a} * cos(radians({lat1})) * cos(radians({lon1})) + "
        f"{b} * cos(radians({lat2})) * cos(radians({lon2})))"
    )
    y = (
        f"({a} * cos(radians({lat1})) * sin(radians({lon1})) + "
        f"{b} * cos(radians({lat2})) * sin(radians({lon2})))"
    )
    z = f"({a} * sin(radians({lat1})) + {b} * sin(radians({lat2})))"
    guard = f"(sin({om}) = cast(0 as double))"
    lat = (
        f"(CASE WHEN {guard} THEN {lat1} "
        f"ELSE degrees(atan2({z}, sqrt({x} * {x} + {y} * {y}))) END)"
    )
    lon = (
        f"(CASE WHEN {guard} THEN {lon1} "
        f"ELSE degrees(atan2({y}, {x})) END)"
    )
    return lat, lon


# --- ellipsoidal geodesy: Vincenty direct (WGS84) -----------------------------

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)


def _vincenty_sigma_update(acc: str) -> str:
    """One round of the Vincenty-direct σ iteration as a single SQL
    expression in terms of the current σ (``acc``) and the prepared
    columns _vd_sig0/_vd_sig1/_vd_bb. Identical text on both engines
    (the fold wrapper is the only dialect split)."""
    ss = f"sin({acc})"
    cs = f"cos({acc})"
    c2sm = f"cos(2 * _vd_sig1 + {acc})"
    return (
        f"_vd_sig0 + _vd_bb * {ss} * ({c2sm} + _vd_bb / 4 * "
        f"({cs} * (-1 + 2 * {c2sm} * {c2sm}) "
        f"- _vd_bb / 6 * {c2sm} * (-3 + 4 * {ss} * {ss}) "
        f"* (-3 + 4 * {c2sm} * {c2sm})))"
    )


def vincenty_direct_steps(
    lat: str, lon: str, az_deg: str, dist_m: str, iters: int = 4,
    dialect: str = "spark",
) -> list[tuple[str, str]]:
    """Vincenty direct problem on WGS84 as an ORDERED list of named SQL
    steps ending in ``_vd_lat2`` / ``_vd_lon2`` (degrees). The σ
    iteration is a RUNTIME FOLD (``iters`` fixed rounds, 4 ≈ machine
    precision for any distance): like the inverse, chained-alias
    unrolling feeds Catalyst's project-collapse a multiplicative
    reference fan-out and planning time explodes with the round count,
    so the rounds run per row inside one constant-size
    ``aggregate(sequence(...))`` / ``list_reduce`` expression instead —
    Spark and DuckDB evaluate the identical update text, so the result
    stays hash-checkable like the spherical family. Closes the last
    geodesy accuracy gap vs gaia-through-pyproj (the spherical
    destination is off up to ~0.5% in latitude; Vincenty is
    sub-millimeter). Every constant is a cast double literal (the
    decimal-literal portability gotcha)."""
    c = lambda v: f"cast({v!r} as double)"
    a, f, b = WGS84_A, WGS84_F, WGS84_B
    s: list[tuple[str, str]] = []
    s.append(("_vd_u1", f"atan({c(1.0 - f)} * tan(radians({lat})))"))
    s.append(("_vd_su1", "sin(_vd_u1)"))
    s.append(("_vd_cu1", "cos(_vd_u1)"))
    s.append(("_vd_a1", f"radians({az_deg})"))
    s.append(("_vd_sa1", "sin(_vd_a1)"))
    s.append(("_vd_ca1", "cos(_vd_a1)"))
    s.append(("_vd_sig1", "atan2(_vd_su1, _vd_cu1 * _vd_ca1)"))
    s.append(("_vd_sina", "_vd_cu1 * _vd_sa1"))
    s.append(("_vd_c2a", "1 - _vd_sina * _vd_sina"))
    s.append(("_vd_u2", f"_vd_c2a * {c((a * a - b * b) / (b * b))}"))
    s.append(("_vd_ba", "1 + _vd_u2 / 16384 * (4096 + _vd_u2 * (-768 + _vd_u2 * (320 - 175 * _vd_u2)))"))
    s.append(("_vd_bb", "_vd_u2 / 1024 * (256 + _vd_u2 * (-128 + _vd_u2 * (74 - 47 * _vd_u2)))"))
    s.append(("_vd_sig0", f"({dist_m}) / ({c(b)} * _vd_ba)"))
    body = _vincenty_sigma_update("acc")
    if dialect == "spark":
        fold = f"aggregate(sequence(1, {iters}), _vd_sig0, (acc, x) -> {body})"
    elif dialect == "duckdb":
        dummies = ", ".join(["cast(0 as double)"] * iters)
        fold = f"list_reduce([_vd_sig0, {dummies}], (acc, x) -> {body})"
    else:  # pragma: no cover
        raise ValueError(f"unknown dialect {dialect!r}")
    s.append(("_vd_sig", fold))
    prev = "_vd_sig"
    s.append(("_vd_ss", f"sin({prev})"))
    s.append(("_vd_cs", f"cos({prev})"))
    s.append(("_vd_tsm", f"2 * _vd_sig1 + {prev}"))
    s.append(("_vd_c2sm", "cos(_vd_tsm)"))
    s.append(("_vd_tmp", "_vd_su1 * _vd_ss - _vd_cu1 * _vd_cs * _vd_ca1"))
    s.append(
        (
            "_vd_lat2",
            f"degrees(atan2(_vd_su1 * _vd_cs + _vd_cu1 * _vd_ss * _vd_ca1, "
            f"{c(1.0 - f)} * sqrt(_vd_sina * _vd_sina + _vd_tmp * _vd_tmp)))",
        )
    )
    s.append(("_vd_lam", "atan2(_vd_ss * _vd_sa1, _vd_cu1 * _vd_cs - _vd_su1 * _vd_ss * _vd_ca1)"))
    s.append(("_vd_cc", f"{c(f / 16.0)} * _vd_c2a * (4 + {c(f)} * (4 - 3 * _vd_c2a))"))
    s.append(
        (
            "_vd_el",
            f"_vd_lam - (1 - _vd_cc) * {c(f)} * _vd_sina * "
            f"({prev} + _vd_cc * _vd_ss * (_vd_c2sm + _vd_cc * _vd_cs * (-1 + 2 * _vd_c2sm * _vd_c2sm)))",
        )
    )
    s.append(("_vd_lon2", f"({lon}) + degrees(_vd_el)"))
    return s


def vincenty_subquery_sql(
    inner: str, lat: str, lon: str, az_deg: str, dist_m: str, iters: int = 4
) -> str:
    """Wrap ``inner`` (a SELECT producing the four input columns) in the
    nested-subquery replay of :func:`vincenty_direct_steps` — the DuckDB
    side of the shared expression DAG (list_reduce fold)."""
    sql = f"({inner})"
    for name, expr in vincenty_direct_steps(
        lat, lon, az_deg, dist_m, iters, dialect="duckdb"
    ):
        sql = f"(SELECT *, {expr} AS {name} FROM {sql})"
    return sql


def _vincenty_lambda_update(acc: str) -> str:
    """One round of the Vincenty-inverse λ iteration as a single SQL
    expression in terms of the current λ (``acc``) and the prepared
    columns _vi_su1/_vi_cu1/_vi_su2/_vi_cu2/_vi_ll. Textually inlined
    (no named intermediates — lambda bodies can't bind them); identical
    text on both engines so the fold is hash-stable. Guards: coincident
    points (sinσ = 0 → sinα := 0) and equatorial pairs (cos²α = 0 →
    cos2σm := 0), the standard Vincenty substitutes."""
    c = lambda v: f"cast({v!r} as double)"
    f = WGS84_F
    sl = f"sin({acc})"
    cl = f"cos({acc})"
    t1 = f"(_vi_cu2 * {sl})"
    t2 = f"(_vi_cu1 * _vi_su2 - _vi_su1 * _vi_cu2 * {cl})"
    ss = f"sqrt({t1} * {t1} + {t2} * {t2})"
    cs = f"(_vi_su1 * _vi_su2 + _vi_cu1 * _vi_cu2 * {cl})"
    sig = f"atan2({ss}, {cs})"
    sa = (
        f"(CASE WHEN {ss} = 0 THEN cast(0 as double) "
        f"ELSE _vi_cu1 * _vi_cu2 * {sl} / {ss} END)"
    )
    c2a = f"(1 - {sa} * {sa})"
    c2sm = (
        f"(CASE WHEN {c2a} = 0 THEN cast(0 as double) "
        f"ELSE {cs} - 2 * _vi_su1 * _vi_su2 / {c2a} END)"
    )
    cc = f"({c(f / 16.0)} * {c2a} * (4 + {c(f)} * (4 - 3 * {c2a})))"
    return (
        f"_vi_ll + (1 - {cc}) * {c(f)} * {sa} * ({sig} + {cc} * {ss} * "
        f"({c2sm} + {cc} * {cs} * (-1 + 2 * {c2sm} * {c2sm})))"
    )


def vincenty_inverse_steps(
    lat1: str, lon1: str, lat2: str, lon2: str, iters: int = 6,
    dialect: str = "spark",
) -> list[tuple[str, str]]:
    """Vincenty inverse problem on WGS84 (geodesic distance between two
    points) as ordered named SQL steps ending in ``_vi_dist_m`` — the
    sibling of :func:`vincenty_direct_steps`. The λ iteration is a
    RUNTIME FOLD, not an unrolled chain: Catalyst's project-collapse
    inlines chained aliases, and the inverse round has ~10× reference
    fan-out, so unrolling explodes super-exponentially (measured: 3
    unrolled rounds = 405 s of PLANNING on a 1-row input; 6 rounds never
    finishes). `aggregate(sequence(1, iters), λ0, (acc, x) -> update)`
    keeps the plan constant-size and iterates per row at runtime —
    Spark-side `aggregate`, DuckDB-side `list_reduce` over
    [λ0, 0×iters] (same left fold, same update text, hash-stable; this
    is the ONE step whose wrapper syntax is dialect-split). Final-round
    quantities (σ, sin σ, cos 2σm, the Helmert series) are then one
    ordinary named-step round computed from the converged λ. 6 rounds ≈
    machine precision away from the antipodal region; nearly-antipodal
    pairs are the documented classical non-convergence case — callers'
    fixtures avoid them."""
    c = lambda v: f"cast({v!r} as double)"
    a, f, b = WGS84_A, WGS84_F, WGS84_B
    s: list[tuple[str, str]] = []
    s.append(("_vi_u1", f"atan({c(1.0 - f)} * tan(radians({lat1})))"))
    s.append(("_vi_u2", f"atan({c(1.0 - f)} * tan(radians({lat2})))"))
    s.append(("_vi_su1", "sin(_vi_u1)"))
    s.append(("_vi_cu1", "cos(_vi_u1)"))
    s.append(("_vi_su2", "sin(_vi_u2)"))
    s.append(("_vi_cu2", "cos(_vi_u2)"))
    s.append(("_vi_ll", f"radians(({lon2}) - ({lon1}))"))
    body = _vincenty_lambda_update("acc")
    if dialect == "spark":
        fold = f"aggregate(sequence(1, {iters}), _vi_ll, (acc, x) -> {body})"
    elif dialect == "duckdb":
        dummies = ", ".join(["cast(0 as double)"] * iters)
        fold = f"list_reduce([_vi_ll, {dummies}], (acc, x) -> {body})"
    else:  # pragma: no cover
        raise ValueError(f"unknown dialect {dialect!r}")
    s.append(("_vi_lam", fold))
    # one final round from the converged λ (plain named steps — single
    # round, so project-collapse growth is bounded)
    s.append(("_vi_sl", "sin(_vi_lam)"))
    s.append(("_vi_cl", "cos(_vi_lam)"))
    s.append(
        (
            "_vi_ss",
            "sqrt((_vi_cu2 * _vi_sl) * (_vi_cu2 * _vi_sl) + "
            "(_vi_cu1 * _vi_su2 - _vi_su1 * _vi_cu2 * _vi_cl) * "
            "(_vi_cu1 * _vi_su2 - _vi_su1 * _vi_cu2 * _vi_cl))",
        )
    )
    s.append(("_vi_cs", "_vi_su1 * _vi_su2 + _vi_cu1 * _vi_cu2 * _vi_cl"))
    s.append(("_vi_sig", "atan2(_vi_ss, _vi_cs)"))
    # coincident points: sinσ = 0 — define sinα = 0 so dist lands at 0
    s.append(
        (
            "_vi_sa",
            "(CASE WHEN _vi_ss = 0 THEN cast(0 as double) "
            "ELSE _vi_cu1 * _vi_cu2 * _vi_sl / _vi_ss END)",
        )
    )
    s.append(("_vi_c2a", "1 - _vi_sa * _vi_sa"))
    s.append(
        (
            "_vi_c2sm",
            "(CASE WHEN _vi_c2a = 0 THEN cast(0 as double) "
            "ELSE _vi_cs - 2 * _vi_su1 * _vi_su2 / _vi_c2a END)",
        )
    )
    s.append(("_vi_us", f"_vi_c2a * {c((a * a - b * b) / (b * b))}"))
    s.append(("_vi_ba", "1 + _vi_us / 16384 * (4096 + _vi_us * (-768 + _vi_us * (320 - 175 * _vi_us)))"))
    s.append(("_vi_bb", "_vi_us / 1024 * (256 + _vi_us * (-128 + _vi_us * (74 - 47 * _vi_us)))"))
    s.append(
        (
            "_vi_dsig",
            "_vi_bb * _vi_ss * (_vi_c2sm + _vi_bb / 4 * "
            "(_vi_cs * (-1 + 2 * _vi_c2sm * _vi_c2sm) "
            "- _vi_bb / 6 * _vi_c2sm * (-3 + 4 * _vi_ss * _vi_ss) "
            "* (-3 + 4 * _vi_c2sm * _vi_c2sm)))",
        )
    )
    s.append(("_vi_dist_m", f"{c(b)} * _vi_ba * (_vi_sig - _vi_dsig)"))
    return s


def vincenty_inverse_subquery_sql(
    inner: str, lat1: str, lon1: str, lat2: str, lon2: str, iters: int = 6
) -> str:
    """Nested-subquery oracle twin of :func:`vincenty_inverse_steps`
    (duckdb dialect — `list_reduce` fold)."""
    sql = f"({inner})"
    for name, expr in vincenty_inverse_steps(
        lat1, lon1, lat2, lon2, iters, dialect="duckdb"
    ):
        sql = f"(SELECT *, {expr} AS {name} FROM {sql})"
    return sql


# --- cross-track / along-track distance (route deviation) --------------------

def cross_track_sqls(
    lat: str, lon: str, lat1: str, lon1: str, lat2: str, lon2: str
) -> tuple[str, str]:
    """Spherical cross-track and along-track distance (metres) of point P
    relative to the great circle through route A(lat1,lon1) → B(lat2,lon2).

    The ST_LineLocatePoint / route-deviation analog of the reference's
    DistanceProcess family (``[R] SURVEY.md §2.C DistanceProcess``) for a
    great-circle route. Standard navigation formulas:

        dxt = asin(sin(d13/R) * sin(theta13 - theta12)) * R
        dat = acos(cos(d13/R) / cos(dxt/R)) * R, signed by cos(theta13-theta12)

    dxt is signed (negative = left/port of the route looking A→B, positive
    = right/starboard — the standard navigation convention); dat is the
    distance from A to the foot of the perpendicular, negative when the
    foot lies behind A. acos/asin inputs are clamped with the shared
    least/greatest idiom so fp noise at the poles can't NaN either engine.
    One string for both dialects — every literal is integer-safe or cast.
    """
    d13 = haversine_m_sql(lat1, lon1, lat, lon)
    delta13 = f"(({d13}) / {EARTH_RADIUS_M})"
    t13 = f"radians({bearing_deg_sql(lat1, lon1, lat, lon)})"
    t12 = f"radians({bearing_deg_sql(lat1, lon1, lat2, lon2)})"
    sxt = f"(sin({delta13}) * sin(({t13}) - ({t12})))"
    sxt_c = f"least(cast(1 as double), greatest(cast(-1 as double), {sxt}))"
    dxt = f"(asin({sxt_c}) * {EARTH_RADIUS_M})"
    cat_ = f"(cos({delta13}) / cos(asin({sxt_c})))"
    cat_c = f"least(cast(1 as double), greatest(cast(-1 as double), {cat_}))"
    sgn = (
        f"(CASE WHEN cos(({t13}) - ({t12})) < cast(0 as double) "
        "THEN cast(-1 as double) ELSE cast(1 as double) END)"
    )
    dat = f"(acos({cat_c}) * {EARTH_RADIUS_M} * {sgn})"
    return dxt, dat
