"""Registry tranche 4: the operators that resisted plain-SQL oracles in
round 1 — now almost all hash-checked anyway (recursive-CTE connected
components for DBSCAN, closed-form buffers/pixels, byte-level fake-decode
replay). Only the APPROXIMATE searches (LSH / IVF ANN) stay rows-only:
their candidate sets are definitionally not mirrorable, and their recall
is pytest-checked against the exact oracle-verified top-k instead."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gaia_spark.functions import portable as P
from gaia_spark.queries import customer_points, load, register


def _dbscan_oracle() -> str:
    """Grid-DBSCAN mirrored as a RECURSIVE CTE: reachability closure over
    rook-adjacent dense cells, cluster id = min cell of the component —
    exactly the fixpoint grid_dbscan's min-label propagation converges to."""
    from gaia_spark.queries import PTS_CTE

    n = 1 << 5
    return f"""
    WITH RECURSIVE {PTS_CTE},
    dense AS (SELECT {P.cell_id_sql("lat", "lon", 5)} AS cell
              FROM pts GROUP BY 1 HAVING count(*) >= 3),
    d2 AS (SELECT cell, cell % {n} AS x, {P.idiv_sql('cell', n)} AS y FROM dense),
    adj AS (
      SELECT a.cell AS cell, b.cell AS nb FROM d2 a JOIN d2 b
      ON (b.y = a.y AND b.x = (a.x + 1) % {n})
      OR (b.y = a.y AND b.x = (a.x + {n - 1}) % {n})
      OR (b.x = a.x AND b.y = a.y + 1)
      OR (b.x = a.x AND b.y = a.y - 1)),
    reach(a, b) AS (
      SELECT cell, cell FROM dense
      UNION
      SELECT r.a, j.nb FROM reach r JOIN adj j ON r.b = j.cell
    ),
    lab AS (SELECT a AS cell, min(b) AS cluster_id FROM reach GROUP BY a)
    SELECT cluster_id, count(*) AS n_cells FROM lab GROUP BY 1
    """


@register("q_dbscan_clusters", _dbscan_oracle())
def q_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClusterProcess: grid-DBSCAN over customer points. The iterative
    min-label propagation's fixpoint equals connected components, which
    DuckDB expresses as a recursive reachability CTE — full hash check."""
    from gaia_spark.operators.stats import grid_dbscan

    pts = customer_points(spark, sf_dir)
    labels = grid_dbscan(pts, res=5, min_pts=3, point_key="c_custkey")
    return labels.groupBy("cluster_id").agg(F.count("*").alias("n_cells"))


def _buffer_oracle() -> str:
    lat, lon = P.key_lat_sql("s_suppkey"), P.key_lon_sql("s_suppkey")
    v1_lat, v1_lon = P.dest_point_sql(lat, lon, "100000.0", P.ngon_bearing_sql("0", 32))
    v6_lat, v6_lon = P.dest_point_sql(lat, lon, "100000.0", P.ngon_bearing_sql("5", 32))
    radius = P.haversine_m_sql(lat, lon, v1_lat, v1_lon)
    return f"""
    SELECT s_suppkey,
           33 AS n_vertices,
           {P.floor_scaled_sql(v1_lat, 6)} AS v1_lat_e6,
           {P.floor_scaled_sql(v1_lon, 6)} AS v1_lon_e6,
           {P.floor_scaled_sql(v6_lat, 6)} AS v6_lat_e6,
           {P.floor_scaled_sql(v6_lon, 6)} AS v6_lon_e6,
           {P.floor_scaled_sql(radius, 0)} AS radius_m_e0
    FROM supplier
    """


@register("q_buffer_rings", _buffer_oracle())
def q_buffer_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BufferProcess: 32-gon spherical buffers around supplier-derived
    points, built as ONE JVM expression; the oracle mirrors vertices 1 and 6
    and the ring radius with the same portable destination-point formulas."""
    from gaia_spark.operators.scalar_geo import add_buffer

    s = (
        load(spark, sf_dir, "supplier")
        .withColumn("lat", F.expr(P.key_lat_sql("s_suppkey")))
        .withColumn("lon", F.expr(P.key_lon_sql("s_suppkey")))
    )
    b = add_buffer(s, 100_000.0)
    radius = P.haversine_m_sql(
        "lat", "lon", "element_at(buffer, 1).lat", "element_at(buffer, 1).lon"
    )
    return b.select(
        "s_suppkey",
        F.size("buffer").alias("n_vertices"),
        F.expr(P.floor_scaled_sql("element_at(buffer, 1).lat", 6)).alias("v1_lat_e6"),
        F.expr(P.floor_scaled_sql("element_at(buffer, 1).lon", 6)).alias("v1_lon_e6"),
        F.expr(P.floor_scaled_sql("element_at(buffer, 6).lat", 6)).alias("v6_lat_e6"),
        F.expr(P.floor_scaled_sql("element_at(buffer, 6).lon", 6)).alias("v6_lon_e6"),
        F.expr(P.floor_scaled_sql(radius, 0)).alias("radius_m_e0"),
    )


@register("q_ann_lsh", oracle=None)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via hyperplane-LSH bucketing (recall vs exact is
    workload-dependent → rows-only; exact top-k is oracle-checked in
    q_embed_knn)."""
    from gaia_spark.operators.simsearch import ann_topk_lsh

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_topk_lsh(emb, queries, k=3, n_planes=4)


def _raster_zonal_oracle() -> str:
    """Closed-form mirror of synth_raster(z=3) → pixels_of → zonal stats:
    512×512 pixel centers (Mercator tile bounds, linspace op order), the
    analytic surface quantized through float32 exactly like the tile
    payloads, then the same closed-bbox zone join + aggregates."""
    from gaia_spark.queries import ZONES_CTE

    n_t, px = 8, 64  # 2^3 tiles per axis, 64 px per tile
    sinh = "((exp({x}) - exp(-({x}))) / 2.0)"
    merc_lat = "degrees(atan(" + sinh.format(x=f"pi() * (1.0 - (2 * {{y}}) / {n_t}.0)") + "))"
    lat1 = merc_lat.format(y="ty")        # tile top (y index)
    lat0 = merc_lat.format(y="(ty + 1)")  # tile bottom
    lon0 = f"((tx / {n_t}.0) * 360.0 - 180.0)"
    lon1 = f"(((tx + 1) / {n_t}.0) * 360.0 - 180.0)"
    # linspace(start, stop, 64, endpoint=False) ± half-step, numpy op order
    c_lat = f"(({lat1} + i * (({lat0} - {lat1}) / {px})) - ({lat1} - {lat0}) / {2 * px})"
    c_lon = f"(({lon0} + j * (({lon1} - {lon0}) / {px})) + ({lon1} - {lon0}) / {2 * px})"
    v = (
        "cast(cast(100.0 * (sin(3.0 * radians(plat)) * cos(2.0 * radians(plon)) + 0.0)"
        " as float) as double)"
    )
    return f"""
    WITH {ZONES_CTE},
    g AS (SELECT r, c FROM generate_series(0, {n_t * px - 1}) t1(r),
                           generate_series(0, {n_t * px - 1}) t2(c)),
    px AS (SELECT {P.idiv_sql('r', px)} AS ty, r % {px} AS i,
                  {P.idiv_sql('c', px)} AS tx, c % {px} AS j FROM g),
    pc AS (SELECT {c_lat} AS plat, {c_lon} AS plon FROM px),
    pv AS (SELECT plat, plon, {v} AS v FROM pc)
    SELECT zone_id, count(*) AS n_px,
           {P.floor_scaled_sql('avg(v)', 2)} AS mean_e2,
           {P.floor_scaled_sql('min(v)', 2)} AS min_e2,
           {P.floor_scaled_sql('max(v)', 2)} AS max_e2
    FROM pv JOIN zones
      ON plat BETWEEN min_lat AND max_lat AND plon BETWEEN min_lon AND max_lon
    GROUP BY zone_id
    """


@register("q_raster_zonal", _raster_zonal_oracle())
def q_raster_zonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster→vector zonal stats over the analytic-surface tile pyramid
    (ZonalStatsProcess on raster input): tiles → pixels_of explode → cell
    spatial join → aggregate; the oracle rebuilds every pixel in SQL."""
    from gaia_spark.operators.spatial_join import ZoneIndex
    from gaia_spark.operators.zonal import pixel_zonal_stats
    from gaia_spark.queries import oracle_zones_pdf
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(3,), bands=(0,))
    idx = ZoneIndex.build(oracle_zones_pdf())
    stats = pixel_zonal_stats(raster, idx, band=0)
    return stats.select(
        "zone_id",
        F.col("count").cast("long").alias("n_px"),
        F.expr(P.floor_scaled_sql("mean", 2)).alias("mean_e2"),
        F.expr(P.floor_scaled_sql("min", 2)).alias("min_e2"),
        F.expr(P.floor_scaled_sql("max", 2)).alias("max_e2"),
    )


def _tile_px_center_sql(n_t: int, px: int) -> tuple[str, str]:
    """Pixel-center (plat, plon) expressions for tile (tx, ty) pixel (i, j)
    at a zoom with ``n_t`` tiles per axis — the per-tile twin of the global
    pixel grid in :func:`_raster_zonal_oracle` (same Mercator bounds, same
    numpy linspace op order, proven bit-identical there)."""
    sinh = "((exp({x}) - exp(-({x}))) / 2.0)"
    merc_lat = "degrees(atan(" + sinh.format(x=f"pi() * (1.0 - (2 * {{y}}) / {n_t}.0)") + "))"
    lat1 = merc_lat.format(y="ty")        # tile top
    lat0 = merc_lat.format(y="(ty + 1)")  # tile bottom
    lon0 = f"((tx / {n_t}.0) * 360.0 - 180.0)"
    lon1 = f"(((tx + 1) / {n_t}.0) * 360.0 - 180.0)"
    c_lat = f"(({lat1} + i * (({lat0} - {lat1}) / {px})) - ({lat1} - {lat0}) / {2 * px})"
    c_lon = f"(({lon0} + j * (({lon1} - {lon0}) / {px})) + ({lon1} - {lon0}) / {2 * px})"
    return c_lat, c_lon


def _band_f32_sql(band: int) -> str:
    """synth.surface_value(plat, plon, band) quantized through float32,
    back as double (IEEE double→float32 is identical in numpy and DuckDB)."""
    return (
        f"cast(cast(100.0 * (sin(3.0 * radians(plat)) * cos(2.0 * radians(plon))"
        f" + {band}.0) as float) as double)"
    )


def _raster_math_oracle() -> str:
    """raster_math(calc='A + 2*B') replayed per pixel: band values float32-
    quantized like the tile payloads, the calc evaluated in float64 (numpy
    env dtype), the result quantized back to float32 (RASTER_SCHEMA)."""
    n_t, px = 8, 64
    c_lat, c_lon = _tile_px_center_sql(n_t, px)
    r = f"cast(cast(({_band_f32_sql(0)}) + 2.0 * ({_band_f32_sql(1)}) as float) as double)"
    return f"""
    WITH t AS (SELECT tx, ty FROM generate_series(0, {n_t - 1}) a(tx),
                                  generate_series(0, {n_t - 1}) b(ty)),
    g AS (SELECT tx, ty, i, j FROM t, generate_series(0, {px - 1}) gi(i),
                                      generate_series(0, {px - 1}) gj(j)),
    pc AS (SELECT tx, ty, i * {px} + j AS p, {c_lat} AS plat, {c_lon} AS plon FROM g),
    pv AS (SELECT tx, ty, p, {r} AS r FROM pc)
    SELECT 3 AS zoom, tx AS x, ty AS y, 0 AS band,
           {P.floor_scaled_sql("max(CASE WHEN p = 0 THEN r END)", 4)} AS px1_e4,
           {P.floor_scaled_sql("max(CASE WHEN p = 2079 THEN r END)", 4)} AS px2080_e4,
           {P.floor_scaled_sql("min(r)", 2)} AS min_e2,
           {P.floor_scaled_sql("max(r)", 2)} AS max_e2
    FROM pv GROUP BY tx, ty
    """


@register("q_raster_math", _raster_math_oracle())
def q_raster_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterMathProcess (gdal_calc analogue): band pivot + Arrow-batched
    numpy eval of 'A + 2*B' per tile — probe pixels + tile min/max
    hash-checked against the closed-form per-pixel replay."""
    from gaia_spark.operators.raster import raster_math
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(3,), bands=(0, 1))
    out = raster_math(raster, "A + 2*B", bands=(0, 1))
    return out.select(
        "zoom", "x", "y", "band",
        F.expr(P.floor_scaled_sql("cast(element_at(px, 1) as double)", 4)).alias("px1_e4"),
        F.expr(P.floor_scaled_sql("cast(element_at(px, 2080) as double)", 4)).alias("px2080_e4"),
        F.expr(P.floor_scaled_sql("cast(array_min(px) as double)", 2)).alias("min_e2"),
        F.expr(P.floor_scaled_sql("cast(array_max(px) as double)", 2)).alias("max_e2"),
    )


def _raster_clip_oracle() -> str:
    """SubsetProcess (gdal_clip) replayed in SQL: the tile cover of each
    rect zone is its bbox tile range (same tile_xy formulas); kept pixels
    are centers inside the CLOSED rect (the convex-rect case makes Spark's
    full-tile shortcut count-neutral: a full tile's pixels are all inside).
    Per (zoom=3, x, y): number of (zone, tile) clip rows, total unmasked
    pixels, min/max unmasked value."""
    from gaia_spark.queries import ZONES_CTE

    n_t, px = 8, 64
    c_lat, c_lon = _tile_px_center_sql(n_t, px)
    return f"""
    WITH {ZONES_CTE},
    zt AS (SELECT zone_id, min_lat, min_lon, max_lat, max_lon, tx, ty
           FROM zones, generate_series(0, {n_t - 1}) a(tx),
                       generate_series(0, {n_t - 1}) b(ty)
           WHERE tx BETWEEN {P.tile_x_sql('min_lon', 3)} AND {P.tile_x_sql('max_lon', 3)}
             AND ty BETWEEN {P.tile_y_sql('max_lat', 3)} AND {P.tile_y_sql('min_lat', 3)}),
    g AS (SELECT zone_id, min_lat, min_lon, max_lat, max_lon, tx, ty, i, j
          FROM zt, generate_series(0, {px - 1}) gi(i),
                   generate_series(0, {px - 1}) gj(j)),
    pc AS (SELECT zone_id, tx, ty, min_lat, min_lon, max_lat, max_lon,
                  {c_lat} AS plat, {c_lon} AS plon FROM g),
    pv AS (SELECT zone_id, tx, ty,
           CASE WHEN plat BETWEEN min_lat AND max_lat
                 AND plon BETWEEN min_lon AND max_lon THEN 1 ELSE 0 END AS kept,
           {_band_f32_sql(0)} AS v FROM pc),
    pair AS (SELECT zone_id, tx, ty,
             cast(sum(kept) as bigint) AS n_valid,
             min(CASE WHEN kept = 1 THEN v END) AS vmin,
             max(CASE WHEN kept = 1 THEN v END) AS vmax
             FROM pv GROUP BY 1, 2, 3)
    SELECT tx AS x, ty AS y,
           cast(count(*) as bigint) AS n_rows,
           cast(sum(n_valid) as bigint) AS n_valid,
           {P.floor_scaled_sql('min(vmin)', 2)} AS vmin_e2,
           {P.floor_scaled_sql('max(vmax)', 2)} AS vmax_e2
    FROM pair GROUP BY tx, ty
    """


@register("q_raster_clip", _raster_clip_oracle())
def q_raster_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SubsetProcess: clip the z=3 band-0 pyramid to the 14-zone layer —
    edge tiles get out-of-zone pixels NaN-masked by the PIP kernel; the
    oracle rebuilds every (zone, tile, pixel) in SQL and aggregates the
    unmasked counts/extrema per tile."""
    from gaia_spark.operators.raster import clip_raster
    from gaia_spark.operators.spatial_join import ZoneIndex
    from gaia_spark.queries import oracle_zones_pdf
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(3,), bands=(0,))
    idx = ZoneIndex.build(oracle_zones_pdf())
    out = clip_raster(raster, idx)
    # masked pixels surface as NULL array elements (pandas→Arrow turns the
    # kernel's NaN floats in object lists into nulls), so filter on NULL,
    # not isnan; array_min/max skip nulls natively
    per = out.select(
        "x", "y",
        F.expr("size(filter(px, v -> v IS NOT NULL))").cast("long").alias("_nv"),
        F.expr("cast(array_min(px) as double)").alias("_vmin"),
        F.expr("cast(array_max(px) as double)").alias("_vmax"),
    )
    return per.groupBy("x", "y").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("_nv").cast("long").alias("n_valid"),
        F.expr(P.floor_scaled_sql("min(_vmin)", 2)).alias("vmin_e2"),
        F.expr(P.floor_scaled_sql("max(_vmax)", 2)).alias("vmax_e2"),
    )


@register(
    "q_shapefile_read",
    f"""
    SELECT s_suppkey,
           {P.floor_scaled_sql(P.key_lat_sql('s_suppkey'), 6)} AS lat_e6,
           {P.floor_scaled_sql(P.key_lon_sql('s_suppkey'), 6)} AS lon_e6
    FROM supplier
    """,
)
def q_shapefile_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VectorFileIO .shp round-trip: supplier-derived points written as a
    real ESRI Shapefile (.shp + .dbf sidecar, spec-conformant binary),
    read back DISTRIBUTED via the binaryFile scan + Arrow parse — the
    oracle replays the key-derived coordinates, so the whole binary
    write→read path is hash-checked (IEEE doubles survive exactly)."""
    import hashlib
    import os

    from gaia_spark.sources.shapefile import read_shapefile, write_shapefile_points

    pts = (
        load(spark, sf_dir, "supplier")
        .withColumn("lat", F.expr(P.key_lat_sql("s_suppkey")))
        .withColumn("lon", F.expr(P.key_lon_sql("s_suppkey")))
        .select("s_suppkey", "lat", "lon")
    )
    d = f"/tmp/gaia_shp_cache/{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    if not os.path.exists(d + "/suppliers.shp"):
        os.makedirs(d, exist_ok=True)
        write_shapefile_points(pts, d + "/suppliers", props=["s_suppkey"])
    feats = read_shapefile(spark, d)
    return feats.select(
        F.expr("cast(properties['s_suppkey'] as bigint)").alias("s_suppkey"),
        F.expr(P.floor_scaled_sql("lat", 6)).alias("lat_e6"),
        F.expr(P.floor_scaled_sql("lon", 6)).alias("lon_e6"),
    )


def _media_oracle() -> str:
    """fake_decode mirrored byte-for-byte: payload bytes via hex(encode(
    text)) sliced 2 chars at a time, first 64 bytes zero-padded, 16-byte
    group means / 255, float32-quantized like the Arrow schema."""
    byte_at = "cast('0x' || substr(hx, 2 * i - 1, 2) as bigint)"
    def group_mean(g: int) -> str:
        s = (
            f"list_sum(list_transform(range({16 * g + 1}, {16 * g + 17}), "
            f"i -> {byte_at}))"
        )
        return f"cast(cast((({s}) / 16.0) / 255.0 as float) as double)"
    return f"""
    WITH h AS (SELECT doc_id,
               rpad(substr(hex(encode(text)), 1, 128), 128, '0') AS hx
               FROM documents)
    SELECT doc_id, 4 AS width, 4 AS height, 1 AS channels, 16 AS n_feat,
           {P.floor_scaled_sql(group_mean(0), 6)} AS f0_e6,
           {P.floor_scaled_sql(group_mean(3), 6)} AS f15_e6
    FROM h
    """


@register("q_media_features", _media_oracle())
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payloads → deterministic fake decode via
    mapInPandas — and the fake is simple enough that the DuckDB oracle
    replays it from the payload bytes, so the whole Arrow decode path
    (batching, schema, float32 quantization) is hash-checked."""
    from gaia_spark.operators.multimodal import extract_media_features

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    feats = extract_media_features(docs, "payload")
    return feats.select(
        "doc_id", "width", "height", "channels", F.size("feat").alias("n_feat"),
        F.expr(P.floor_scaled_sql("cast(element_at(feat, 1) as double)", 6)).alias("f0_e6"),
        F.expr(P.floor_scaled_sql("cast(element_at(feat, 16) as double)", 6)).alias("f15_e6"),
    )


# ---------------------------------------------------------------------------
# polygon-contiguity WeightProcess + Moran's I over a zone layer
# ---------------------------------------------------------------------------

def _grid_zone_rows() -> list[tuple]:
    """4×4 rect zones TILING lat [-60, 20] × lon [-120, 40] with shared
    edges — the polygon-contiguity fixture (the standard 14-zone layer has
    gaps, so its contiguity graph would be empty)."""
    rows = []
    for r in range(4):
        for c in range(4):
            rows.append((r * 4 + c, -60.0 + r * 20.0, -120.0 + c * 40.0,
                         -60.0 + (r + 1) * 20.0, -120.0 + (c + 1) * 40.0))
    return rows


def _grid_zone_index():
    import pandas as pd

    from gaia_spark.operators.spatial_join import ZoneIndex

    rows = []
    for j, la0, lo0, la1, lo1 in _grid_zone_rows():
        ring = [
            {"lat": la0, "lon": lo0}, {"lat": la0, "lon": lo1},
            {"lat": la1, "lon": lo1}, {"lat": la1, "lon": lo0},
            {"lat": la0, "lon": lo0},
        ]
        rows.append({"zone_id": j, "name": f"g{j}", "kind": "rect", "category": "g",
                     "min_lat": la0, "min_lon": lo0, "max_lat": la1, "max_lon": lo1,
                     "vertices": ring})
    return ZoneIndex.build(pd.DataFrame(rows))


def _morans_zones_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    gz = "gz AS (SELECT * FROM (VALUES " + ", ".join(
        f"({j}, {a}, {b}, {c}, {d})" for j, a, b, c, d in _grid_zone_rows()
    ) + ") AS t(zone_id, zmin_lat, zmin_lon, zmax_lat, zmax_lon))"
    return f"""
    WITH {PTS_CTE}, {gz},
    vals AS (SELECT zone_id, cast(count(*) as double) AS v
             FROM pts JOIN gz ON lat BETWEEN zmin_lat AND zmax_lat
                             AND lon BETWEEN zmin_lon AND zmax_lon
             GROUP BY 1),
    m AS (SELECT avg(v) AS mu, cast(count(*) as double) AS n FROM vals),
    adj AS (SELECT a.zone_id AS ci, b.zone_id AS cj FROM gz a JOIN gz b
            ON ({P.idiv_sql('a.zone_id', 4)} = {P.idiv_sql('b.zone_id', 4)}
                AND abs(a.zone_id % 4 - b.zone_id % 4) = 1)
            OR (a.zone_id % 4 = b.zone_id % 4
                AND abs({P.idiv_sql('a.zone_id', 4)} - {P.idiv_sql('b.zone_id', 4)}) = 1)),
    z AS (SELECT zone_id, v - (SELECT mu FROM m) AS z FROM vals),
    pairs AS (SELECT za.z AS zi, zb.z AS zj FROM adj
              JOIN z za ON adj.ci = za.zone_id JOIN z zb ON adj.cj = zb.zone_id)
    SELECT cast((SELECT n FROM m) as bigint) AS n_zones,
           (SELECT count(*) FROM adj) AS n_links,
           {P.floor_scaled_sql('((SELECT n FROM m) / (SELECT cast(count(*) as double) FROM pairs)) * (SELECT sum(zi * zj) FROM pairs) / (SELECT sum(z * z) FROM z)', 4)} AS moran_e4
    """


@register("q_morans_zones", _morans_zones_oracle())
def q_morans_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WeightProcess over a POLYGON layer (rook contiguity via the generic
    touches_rook self-join — no grid shortcut on the engine side) feeding
    AutocorrelationProcess: Moran's I of per-zone point counts. Oracle =
    closed-form grid adjacency + the same two-aggregation Moran algebra."""
    from gaia_spark.operators.spatial_join import spatial_join
    from gaia_spark.operators.stats import morans_i, polygon_contiguity_weights

    idx = _grid_zone_index()
    pts = customer_points(spark, sf_dir)
    vals = (
        spatial_join(pts, idx, predicate="intersects", point_key="c_custkey")
        .groupBy("zone_id")
        .agg(F.count("*").cast("double").alias("v"))
        .withColumnRenamed("zone_id", "cell")
    )
    w = polygon_contiguity_weights(spark, idx, contiguity="rook")
    mi = morans_i(vals, w, cell_col="cell", value_col="v")
    counts = vals.agg(F.count("*").cast("long").alias("n_zones")).crossJoin(
        w.agg(F.count("*").alias("n_links"))
    )
    return counts.crossJoin(mi).select(
        "n_zones", "n_links", F.expr(P.floor_scaled_sql("moran_i", 4)).alias("moran_e4")
    )


def _morans_local_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    return f"""
    WITH {PTS_CTE},
    cells AS (SELECT {P.cell_id_sql('lat', 'lon', 5)} AS cell,
              cast(count(*) as double) AS v FROM pts GROUP BY 1),
    m AS (SELECT avg(v) AS mu, cast(count(*) as double) AS n FROM cells),
    z AS (SELECT cell, cell % 32 AS x, {P.idiv_sql('cell', 32)} AS y,
          v - (SELECT mu FROM m) AS z FROM cells),
    m2 AS (SELECT sum(z * z) / count(*) AS m2 FROM z),
    lag AS (SELECT a.cell AS cell, sum(b.z) AS lag FROM z a JOIN z b
            ON (b.y = a.y AND b.x = (a.x + 1) % 32)
            OR (b.y = a.y AND b.x = (a.x + 31) % 32)
            OR (b.x = a.x AND b.y = a.y + 1)
            OR (b.x = a.x AND b.y = a.y - 1)
            GROUP BY 1)
    SELECT z.cell,
           {P.floor_scaled_sql('lag.lag', 4)} AS lag_e4,
           {P.floor_scaled_sql('(z.z / (SELECT m2 FROM m2)) * lag.lag', 4)} AS local_i_e4
    FROM z JOIN lag ON z.cell = lag.cell
    """


@register("q_morans_local", _morans_local_oracle())
def q_morans_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL Moran's I (LISA) of per-cell point counts under rook
    contiguity — the per-cell decomposition whose weighted sum is the
    global q_morans_i statistic."""
    from gaia_spark.operators.spatial_join import with_cell
    from gaia_spark.operators.stats import cell_rook_weights, local_morans_i

    pts = with_cell(customer_points(spark, sf_dir), 5, out="cell")
    cells = pts.groupBy("cell").agg(F.count("*").cast("double").alias("v"))
    w = cell_rook_weights(cells, 5)
    out = local_morans_i(cells, w)
    return out.select(
        "cell",
        F.expr(P.floor_scaled_sql("lag", 4)).alias("lag_e4"),
        F.expr(P.floor_scaled_sql("local_i", 4)).alias("local_i_e4"),
    )


def _gstar_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    return f"""
    WITH {PTS_CTE},
    cells AS (SELECT {P.cell_id_sql('lat', 'lon', 5)} AS cell,
              cast(count(*) as double) AS x FROM pts GROUP BY 1),
    g AS (SELECT cast(count(*) as double) AS n, avg(x) AS mu,
          sum(x * x) AS sx2 FROM cells),
    d AS (SELECT cell, cell % 32 AS cx, {P.idiv_sql('cell', 32)} AS cy, x FROM cells),
    nbr AS (SELECT a.cell AS cell, sum(b.x) AS nlag, count(*) AS nw
            FROM d a JOIN d b
            ON (b.cy = a.cy AND b.cx = (a.cx + 1) % 32)
            OR (b.cy = a.cy AND b.cx = (a.cx + 31) % 32)
            OR (b.cx = a.cx AND b.cy = a.cy + 1)
            OR (b.cx = a.cx AND b.cy = a.cy - 1)
            GROUP BY 1),
    t AS (SELECT d.cell,
          d.x + coalesce(nbr.nlag, 0) AS lag,
          1.0 + coalesce(nbr.nw, 0) AS wi
          FROM d LEFT JOIN nbr ON d.cell = nbr.cell),
    s AS (SELECT sqrt((SELECT sx2 FROM g) / (SELECT n FROM g)
                 - (SELECT mu FROM g) * (SELECT mu FROM g)) AS s)
    SELECT cell,
           {P.floor_scaled_sql('lag', 4)} AS lag_e4,
           {P.floor_scaled_sql('''
           (lag - (SELECT mu FROM g) * wi) / ((SELECT s FROM s)
            * sqrt(((SELECT n FROM g) * wi - wi * wi) / ((SELECT n FROM g) - 1)))''', 4)} AS gstar_e4
    FROM t
    """


@register("q_getis_ord", _gstar_oracle())
def q_getis_ord(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord G* hot-spot z-scores of per-cell point counts under rook
    contiguity (self-inclusive weights) — hot/cold-spot detection, the
    LISA-family companion statistic."""
    from gaia_spark.operators.spatial_join import with_cell
    from gaia_spark.operators.stats import cell_rook_weights, getis_ord_gstar

    pts = with_cell(customer_points(spark, sf_dir), 5, out="cell")
    cells = pts.groupBy("cell").agg(F.count("*").cast("double").alias("v"))
    w = cell_rook_weights(cells, 5)
    out = getis_ord_gstar(cells, w)
    return out.select(
        "cell",
        F.expr(P.floor_scaled_sql("lag", 4)).alias("lag_e4"),
        F.expr(P.floor_scaled_sql("gstar", 4)).alias("gstar_e4"),
    )


def _geohash_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    gh5 = P.geohash_sql("latq", "lonq", 5)
    return f"""
    WITH {PTS_CTE},
    q AS (SELECT c_acctbal, {P.geohash_latq_sql('lat', 5)} AS latq,
                 {P.geohash_lonq_sql('lon', 5)} AS lonq FROM pts),
    g AS (SELECT c_acctbal, {gh5} AS gh5 FROM q)
    SELECT gh5, substring(gh5, 1, 3) AS gh3,
           count(*) AS n_pts,
           {P.floor_scaled_sql('avg(c_acctbal)', 2)} AS avg_bal_e2
    FROM g GROUP BY 1, 2
    """


@register("q_geohash_counts", _geohash_oracle())
def q_geohash_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash cell-index family: encode customer points at precision 5
    (JVM bit-packing arithmetic, with_geohash) and roll up per geohash plus
    its precision-3 PREFIX — prefix nesting is the geohash analog of
    cell_parent bit-math, checked here against the oracle re-encoding.
    Validated against published vectors + an independent interval-halving
    reference in tests/test_kernel.py."""
    from gaia_spark.operators.spatial_join import with_geohash

    pts = with_geohash(customer_points(spark, sf_dir), 5, out="gh5")
    return (
        pts.withColumn("gh3", F.expr("substring(gh5, 1, 3)"))
        .groupBy("gh5", "gh3")
        .agg(
            F.count("*").alias("n_pts"),
            F.expr(P.floor_scaled_sql("avg(c_acctbal)", 2)).alias("avg_bal_e2"),
        )
    )


def _idw_oracle() -> str:
    from gaia_spark.operators.interpolate import idw_weight_sql
    from gaia_spark.queries import PTS_CTE

    clat = P.cell_center_lat_sql("gy", 6)
    clon = P.cell_center_lon_sql("gx", 6)
    w = idw_weight_sql("d", 2.0, 1.0)
    return f"""
    WITH {PTS_CTE},
    grid AS (SELECT gx, gy FROM generate_series(0, 63) AS t1(gx),
             generate_series(0, 63) AS t2(gy)),
    cand AS (SELECT gy * 64 + gx AS cell, c_acctbal,
             {P.haversine_m_sql('lat', 'lon', clat, clon)} AS d
             FROM pts, grid)
    SELECT cell, count(*) AS n_src,
           {P.floor_scaled_sql(f'(sum({w} * c_acctbal) / sum({w}))', 4)} AS idw_e4
    FROM cand WHERE d <= cast(400000 as double) GROUP BY 1
    """


@register("q_idw_grid", _idw_oracle())
def q_idw_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InterpolationProcess analog: IDW surface of customer account balance
    on the res-6 grid (400 km disc, p=2). Spark runs the JOIN-FREE scatter
    plan (each point explodes onto reachable cells, one groupBy(cell) with
    map-side combine); the oracle replays a full grid x points cross join —
    two different physical strategies, one disc semantics."""
    from gaia_spark.operators.interpolate import idw_grid

    out = idw_grid(customer_points(spark, sf_dir), "c_acctbal", res=6, radius_m=400_000.0)
    return out.select(
        "cell", "n_src", F.expr(P.floor_scaled_sql("idw", 4)).alias("idw_e4")
    )


def _kde_oracle() -> str:
    from gaia_spark.operators.interpolate import kde_weight_sql
    from gaia_spark.queries import PTS_CTE

    clat = P.cell_center_lat_sql("gy", 6)
    clon = P.cell_center_lon_sql("gx", 6)
    return f"""
    WITH {PTS_CTE},
    grid AS (SELECT gx, gy FROM generate_series(0, 63) AS t1(gx),
             generate_series(0, 63) AS t2(gy)),
    cand AS (SELECT gy * 64 + gx AS cell,
             {P.haversine_m_sql('lat', 'lon', clat, clon)} AS d
             FROM pts, grid)
    SELECT cell, count(*) AS n_src,
           {P.floor_scaled_sql(f"sum({kde_weight_sql('d', 150_000.0)})", 6)} AS density_e6
    FROM cand WHERE d <= cast(450000 as double) GROUP BY 1
    """


@register("q_kde_grid", _kde_oracle())
def q_kde_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian KDE heatmap (h = 150 km, 3-sigma cut) of customer points on
    the res-6 grid - density rasterization via the same scatter plan as
    q_idw_grid."""
    from gaia_spark.operators.interpolate import kde_grid

    out = kde_grid(customer_points(spark, sf_dir), res=6, bandwidth_m=150_000.0)
    return out.select(
        "cell", "n_src", F.expr(P.floor_scaled_sql("density", 6)).alias("density_e6")
    )


def _hex_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    q = P.hex_q_sql("lat", "lon", 2.5)
    r = P.hex_r_sql("lat", "lon", 2.5)
    rounds = ", ".join(
        f"{v} AS {k}" for k, v in P.hex_round_cols_sql("_hq", "_hr").items()
    )
    return f"""
    WITH {PTS_CTE},
    f AS (SELECT c_acctbal, {q} AS _hq, {r} AS _hr FROM pts),
    g AS (SELECT c_acctbal, {rounds} FROM f),
    h AS (SELECT c_acctbal, {P.hex_axial_x_sql()} AS _ax, {P.hex_axial_z_sql()} AS _az FROM g)
    SELECT {P.hex_id_sql('_ax', '_az')} AS hex_id,
           {P.floor_scaled_sql(P.hex_center_lat_sql('_az', 2.5), 6)} AS clat_e6,
           {P.floor_scaled_sql(P.hex_center_lon_sql('_ax', '_az', 2.5), 6)} AS clon_e6,
           count(*) AS n_pts,
           {P.floor_scaled_sql('avg(c_acctbal)', 2)} AS avg_bal_e2
    FROM h GROUP BY 1, 2, 3
    """


@register("q_hex_counts", _hex_oracle())
def q_hex_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hexagonal binning (with_hex, the hex-index analog of the packed
    cell): customer points bucketed into 2.5-degree pointy-top hexes via
    cube rounding, rolled up with their lattice center coordinates - all
    portable arithmetic, assignment == Voronoi of the hex-center lattice."""
    from gaia_spark.operators.spatial_join import with_hex

    pts = with_hex(customer_points(spark, sf_dir), 2.5, keep_axial=True)
    return pts.groupBy(
        "hex_id",
        F.expr(P.floor_scaled_sql(P.hex_center_lat_sql("_az", 2.5), 6)).alias("clat_e6"),
        F.expr(P.floor_scaled_sql(P.hex_center_lon_sql("_ax", "_az", 2.5), 6)).alias("clon_e6"),
    ).agg(
        F.count("*").alias("n_pts"),
        F.expr(P.floor_scaled_sql("avg(c_acctbal)", 2)).alias("avg_bal_e2"),
    )


# --- convex hull (ConvexHullProcess; analytic circle fixture) ----------------

# Shared construction of the hull test layer from customer keys: 10 groups;
# members sit equally spaced on a circle of radius r_g (boundary points,
# key%3!=0) or at radius r_g/3 (interior, key%3=0). By construction every
# boundary point is a hull vertex (distinct angles on a circle, never 3
# collinear) and every interior point is strictly inside (polygon inradius
# >= r*cos(max_gap/2) >= r/2 > r/3), so the oracle knows the hull
# ANALYTICALLY - n_hull, area, perimeter in closed form - while Spark runs
# the real monotone-chain operator. One SQL string builds the layer in both
# engines, so vertex doubles are bit-identical and the per-vertex
# floor-scaled lat checksum must agree exactly.
_HULL_PTS_SQL = """
    SELECT g, is_boundary, clat + rad * sin(theta) AS lat,
           clon + rad * cos(theta) AS lon
    FROM (
      SELECT g, is_boundary, clat, clon,
             CASE WHEN is_boundary = 1 THEN r ELSE r / 3.0 END AS rad,
             2.0 * pi() * (cast(row_number() OVER (PARTITION BY g ORDER BY c_custkey) as double) - 1.0)
               / cast(cnt as double) AS theta
      FROM (
        SELECT c_custkey, c_custkey % 10 AS g,
               CASE WHEN c_custkey % 3 = 0 THEN 0 ELSE 1 END AS is_boundary,
               -60.0 + 12.0 * (c_custkey % 10) AS clat,
               -120.0 + 25.0 * ((c_custkey % 10) % 5) AS clon,
               2.0 + 0.3 * (c_custkey % 10) AS r,
               count(*) OVER (PARTITION BY c_custkey % 10) AS cnt
        FROM customer
      ) t0
    ) t1
"""


def _hull_oracle() -> str:
    lat_floor = P.floor_scaled_sql("lat", 4)
    return f"""
    WITH pts AS ({_HULL_PTS_SQL}),
    b AS (SELECT g, 2.0 + 0.3 * g AS r, lat,
          atan2(lat - (-60.0 + 12.0 * g), lon - (-120.0 + 25.0 * (g % 5))) AS th
          FROM pts WHERE is_boundary = 1),
    d AS (SELECT g, r, lat,
          coalesce(lead(th) OVER (PARTITION BY g ORDER BY th),
                   min(th) OVER (PARTITION BY g) + 2.0 * pi()) - th AS dth
          FROM b)
    SELECT g, cast(count(*) as int) AS n_hull,
           cast(sum({lat_floor}) as bigint) AS lat_sum_e4,
           {P.floor_scaled_sql('sum(r * r / 2.0 * sin(dth))', 3)} AS area_e3,
           {P.floor_scaled_sql('sum(2.0 * r * sin(dth / 2.0))', 3)} AS perim_e3
    FROM d GROUP BY g
    """


@register("q_zone_hulls", _hull_oracle())
def q_zone_hulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConvexHullProcess: per-group hull through the TWO-STAGE distributed
    path (per-partition partial monotone chains via mapInPandas, then the
    per-group merge — the 100-TB-safe plan: the group-key shuffle moves
    partial hull vertices, never raw points), audited four ways against
    the analytic oracle: vertex count, exact per-vertex floor-scaled lat
    checksum (bit-identical construction doubles), and shoelace area /
    planar perimeter vs the inscribed-polygon closed forms. Vertex-level
    parity with the single-stage applyInPandas hull is pytest-asserted."""
    from gaia_spark.operators.hull import convex_hull_per_group_distributed

    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    pts = spark.sql(_HULL_PTS_SQL)
    hulls = convex_hull_per_group_distributed(pts, "g")

    closed = "concat(vertices, slice(vertices, 1, 1))"
    pairs = (
        f"zip_with(slice({closed}, 1, size({closed}) - 1), "
        f"slice({closed}, 2, size({closed}) - 1), "
        "(a, b) -> struct(a.lat AS y1, a.lon AS x1, b.lat AS y2, b.lon AS x2))"
    )
    area = f"aggregate({pairs}, cast(0 as double), (acc, p) -> acc + (p.x1 * p.y2 - p.x2 * p.y1)) / 2.0"
    perim = (
        f"aggregate({pairs}, cast(0 as double), (acc, p) -> "
        "acc + sqrt((p.x2 - p.x1) * (p.x2 - p.x1) + (p.y2 - p.y1) * (p.y2 - p.y1)))"
    )
    lat_sum = (
        "aggregate(vertices, cast(0 as bigint), (acc, v) -> "
        f"acc + {P.floor_scaled_sql('v.lat', 4)})"
    )
    return hulls.select(
        "g",
        "n_hull",
        F.expr(lat_sum).alias("lat_sum_e4"),
        F.expr(P.floor_scaled_sql(area, 3)).alias("area_e3"),
        F.expr(P.floor_scaled_sql(perim, 3)).alias("perim_e3"),
    )


@register("q_simplify", oracle=None)
def q_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimplifyProcess (Douglas-Peucker, rows-only: recursive split is not
    SQL-expressible; exactness evidence is the property pytest - endpoint
    retention, deviation bound, idempotence, tolerance monotonicity).
    Buffers customer points to 24-gon rings, simplifies at a tolerance that
    must collapse them to coarser rings, and reports vertex counts."""
    from gaia_spark.operators.hull import simplify_lines
    from gaia_spark.operators.scalar_geo import buffer_ngon_sql

    pts = customer_points(spark, sf_dir).limit(500)
    rings = pts.select(
        "c_custkey",
        F.expr(buffer_ngon_sql("lat", "lon", radius_m=50_000.0, n=24)).alias("vertices"),
    )
    out = simplify_lines(rings, tol_deg=0.05)
    return out.select(
        "c_custkey",
        F.expr("size(vertices)").cast("int").alias("n_simplified"),
    )


def _hex_smooth_oracle() -> str:
    from gaia_spark.operators.spatial_join import hex_kring_offsets
    from gaia_spark.queries import PTS_CTE

    q = P.hex_q_sql("lat", "lon", 2.5)
    r = P.hex_r_sql("lat", "lon", 2.5)
    rounds = ", ".join(
        f"{v} AS {k}" for k, v in P.hex_round_cols_sql("_hq", "_hr").items()
    )
    offs = ", ".join(f"({dx}, {dz})" for dx, dz in hex_kring_offsets(1))
    off, m = 1 << 20, 1 << 21
    return f"""
    WITH {PTS_CTE},
    f AS (SELECT {q} AS _hq, {r} AS _hr FROM pts),
    g AS (SELECT {rounds} FROM f),
    h AS (SELECT cast({P.hex_axial_x_sql()} as bigint) AS ax, cast({P.hex_axial_z_sql()} as bigint) AS az FROM g),
    c AS (SELECT ax, az, count(*) AS n_pts FROM h GROUP BY 1, 2),
    o (dx, dz) AS (SELECT * FROM (VALUES {offs}) AS t(dx, dz))
    SELECT (c.ax + o.dx + {off}) * {m} + (c.az + o.dz + {off}) AS hex_id,
           cast(count(*) as bigint) AS n_nbr,
           cast(sum(c.n_pts) as bigint) AS smoothed
    FROM c CROSS JOIN o GROUP BY 1
    """


@register("q_hex_smooth", _hex_smooth_oracle())
def q_hex_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex kRing smoothing: per-hex counts scattered onto the 7-cell k=1
    disc and re-aggregated (pure integer arithmetic end to end, no join;
    the hex twin of the cell kRing). Oracle replays the disc with a VALUES
    offsets cross join."""
    from gaia_spark.operators.spatial_join import hex_smooth, with_hex

    pts = with_hex(customer_points(spark, sf_dir), 2.5)
    counts = pts.groupBy("hex_id").agg(F.count("*").alias("n_pts"))
    out = hex_smooth(counts, k=1)
    return out.select(
        "hex_id", "n_nbr", F.col("smoothed").cast("long").alias("smoothed")
    )


_SEG_DLAT = "(((s_suppkey * 13) % 17 - 8) / cast(2 as double))"
_SEG_DLON = "(((s_suppkey * 29) % 23 - 11) / cast(2 as double))"
_SEGS_CTE = (
    "segs AS (SELECT s_suppkey, "
    "((s_suppkey * 7919 % 15000) / cast(100 as double) - 75.0 + 0.0003) AS lat0, "
    "((s_suppkey * 104729 % 34000) / cast(100 as double) - 170.0 + 0.0007) AS lon0, "
    f"((s_suppkey * 7919 % 15000) / cast(100 as double) - 75.0 + 0.0003) + {_SEG_DLAT} AS lat1, "
    f"((s_suppkey * 104729 % 34000) / cast(100 as double) - 170.0 + 0.0007) + {_SEG_DLON} AS lon1 "
    "FROM supplier)"
)
_TC_ZOOM, _TC_EXTENT = 6, 4096


def _tile_clip_oracle() -> str:
    from gaia_spark.operators import tiling as TL

    n = 1 << _TC_ZOOM
    x0 = TL.merc_xc_sql("lon0", _TC_ZOOM)
    y0 = TL.merc_yc_sql("lat0", _TC_ZOOM)
    dx = f"({TL.merc_xc_sql('lon1', _TC_ZOOM)}) - ({x0})"
    dy = f"({TL.merc_yc_sql('lat1', _TC_ZOOM)}) - ({y0})"
    bx0 = P.clamp_sql("cast(floor(least(_x0, _x0 + _dx)) as bigint)", "0", str(n - 1))
    bx1 = P.clamp_sql("cast(floor(greatest(_x0, _x0 + _dx)) as bigint)", "0", str(n - 1))
    by0 = P.clamp_sql("cast(floor(least(_y0, _y0 + _dy)) as bigint)", "0", str(n - 1))
    by1 = P.clamp_sql("cast(floor(greatest(_y0, _y0 + _dy)) as bigint)", "0", str(n - 1))
    ts = TL.clip_t_cols_sql()
    return f"""
    WITH {_SEGS_CTE},
    pre AS (SELECT s_suppkey, {x0} AS _x0, {y0} AS _y0, {dx} AS _dx, {dy} AS _dy FROM segs),
    cx AS (SELECT pre.*, unnest(generate_series({bx0}, {bx1})) AS _tx FROM pre),
    cy AS (SELECT cx.*, unnest(generate_series({by0}, {by1})) AS _ty FROM cx),
    t AS (SELECT cy.*, {ts['_t0']} AS _t0, {ts['_t1']} AS _t1 FROM cy)
    SELECT s_suppkey, _tx AS tx, _ty AS ty,
           {TL.quantize_sql('_x0', '_dx', '_t0', '_tx', _TC_EXTENT)} AS u0,
           {TL.quantize_sql('_y0', '_dy', '_t0', '_ty', _TC_EXTENT)} AS v0,
           {TL.quantize_sql('_x0', '_dx', '_t1', '_tx', _TC_EXTENT)} AS u1,
           {TL.quantize_sql('_y0', '_dy', '_t1', '_ty', _TC_EXTENT)} AS v1
    FROM t WHERE _t0 < _t1
    """


@register("q_tile_clip", _tile_clip_oracle())
def q_tile_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-tile line clipping: diagonal supplier segments cut to the
    zoom-6 tiles they cross (Liang–Barsky in continuous Mercator tile
    space) and quantized to MVT extent-4096 local coordinates. The whole
    operator is Generate+Filter+Project — NO shuffle; the oracle evaluates
    the identical closed-form SQL string, so every clipped coordinate is
    hash-checked bit-for-bit."""
    from gaia_spark.operators.tiling import clip_segments_to_tiles

    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr("((s_suppkey * 7919 % 15000) / cast(100 as double) - 75.0 + 0.0003)").alias("lat0"),
        F.expr("((s_suppkey * 104729 % 34000) / cast(100 as double) - 170.0 + 0.0007)").alias("lon0"),
    )
    s = s.select(
        "s_suppkey",
        "lat0",
        "lon0",
        F.expr(f"lat0 + {_SEG_DLAT}").alias("lat1"),
        F.expr(f"lon0 + {_SEG_DLON}").alias("lon1"),
    )
    out = clip_segments_to_tiles(s, zoom=_TC_ZOOM, extent=_TC_EXTENT)
    return out.select("s_suppkey", "tx", "ty", "u0", "v0", "u1", "v1")


_TRI_A = "cast((n_nationkey * 13 % 140) - 70 as double)"
_TRI_B = "cast((n_nationkey * 37 % 300) - 150 as double)"
_TRI_S = "cast(4 + n_nationkey % 5 as double)"
_TRI_T = "cast(6 + n_nationkey % 7 as double)"
_RZ_RES = 7


def _rasterize_oracle() -> str:
    from gaia_spark.operators.raster import crossing_test_sql

    n = 1 << _RZ_RES
    py = P.cell_center_lat_sql("y", _RZ_RES)
    px = P.cell_center_lon_sql("x", _RZ_RES)
    # closed ring (a,b) -> (a+s,b) -> (a,b+t) -> (a,b); same three edges the
    # engine's HOF filter walks
    edges = [
        ("a", "b", "(a + s)", "b"),
        ("(a + s)", "b", "a", "(b + t)"),
        ("a", "(b + t)", "a", "b"),
    ]
    crossings = " + ".join(
        f"CASE WHEN {crossing_test_sql(py, px, ay, ax, by, bx)} THEN 1 ELSE 0 END"
        for ay, ax, by, bx in edges
    )
    return f"""
    WITH tri AS (SELECT n_nationkey AS zone_id, {_TRI_A} AS a, {_TRI_B} AS b,
                        {_TRI_S} AS s, {_TRI_T} AS t FROM nation),
    xs AS (SELECT tri.*, unnest(generate_series({P.cell_x_sql('b', _RZ_RES)},
                                                {P.cell_x_sql('(b + t)', _RZ_RES)})) AS x FROM tri),
    ys AS (SELECT xs.*, unnest(generate_series({P.cell_y_sql('(a + s)', _RZ_RES)},
                                               {P.cell_y_sql('a', _RZ_RES)})) AS y FROM xs)
    SELECT zone_id, y * {n} + x AS cell
    FROM ys WHERE ({crossings}) % 2 = 1
    """


@register("q_rasterize_zones", _rasterize_oracle())
def q_rasterize_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector->raster burn-in: triangular nation zones rasterized onto the
    res-7 packed grid by the even-odd rule on cell centers — the missing
    direction of the raster<->vector bridge (pixels_of / tile pyramids go
    raster->vector). The engine walks the closed vertex ring with one JVM
    higher-order filter per bbox cell (Generate+Filter, no shuffle); the
    oracle replays the identical crossing-test SQL string on the three
    explicit edges."""
    from gaia_spark.operators.raster import rasterize_zones

    tri = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("zone_id"),
        F.expr(_TRI_A).alias("a"),
        F.expr(_TRI_B).alias("b"),
        F.expr(_TRI_S).alias("s"),
        F.expr(_TRI_T).alias("t"),
    )
    ring = (
        "array(struct(a AS lat, b AS lon), struct(a + s AS lat, b AS lon), "
        "struct(a AS lat, b + t AS lon), struct(a AS lat, b AS lon))"
    )
    zones = tri.select("zone_id", F.expr(ring).alias("vertices"))
    return rasterize_zones(zones, res=_RZ_RES)


_DENSIFY_N = 8


def _densify_oracle() -> str:
    from gaia_spark.operators.scalar_geo import slerp_cols_sql

    f = f"(cast(i as double) / {_DENSIFY_N})"
    cols = slerp_cols_sql("lat0", "lon0", "lat1", "lon1", f)
    return f"""
    WITH {_SEGS_CTE},
    w AS (SELECT segs.*, unnest(generate_series(0, {_DENSIFY_N})) AS i FROM segs)
    SELECT s_suppkey, cast(i as int) AS i,
           {P.floor_scaled_sql(cols['lat'], 6)} AS way_lat_e6,
           {P.floor_scaled_sql(cols['lon'], 6)} AS way_lon_e6
    FROM w
    """


@register("q_densify", _densify_oracle())
def q_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic densification: each supplier segment resampled to 9
    great-circle waypoints (aviation-formulary slerp as one shared
    closed-form SQL string, exploded in-plan — no shuffle, no Python);
    waypoint coordinates hash-checked at e6."""
    from gaia_spark.operators.scalar_geo import densify_great_circle

    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr("((s_suppkey * 7919 % 15000) / cast(100 as double) - 75.0 + 0.0003)").alias("lat0"),
        F.expr("((s_suppkey * 104729 % 34000) / cast(100 as double) - 170.0 + 0.0007)").alias("lon0"),
    )
    s = s.select(
        "s_suppkey", "lat0", "lon0",
        F.expr(f"lat0 + {_SEG_DLAT}").alias("lat1"),
        F.expr(f"lon0 + {_SEG_DLON}").alias("lon1"),
    )
    out = densify_great_circle(s, n_points=_DENSIFY_N)
    return out.select(
        "s_suppkey",
        "i",
        F.expr(P.floor_scaled_sql("way_lat", 6)).alias("way_lat_e6"),
        F.expr(P.floor_scaled_sql("way_lon", 6)).alias("way_lon_e6"),
    )


@register("q_tile_clip_poly", None)
def q_tile_clip_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-tile POLYGON clipping (Sutherland–Hodgman per bbox-covered
    tile, numpy in one Arrow batch stage — genuinely iterative, hence
    rows-only; the area-partition invariant is pytest-proven in
    test_tiling). Zones = the nation triangles of q_rasterize_zones."""
    from gaia_spark.operators.tiling import clip_polygons_to_tiles

    tri = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("zone_id"),
        F.expr(_TRI_A).alias("a"),
        F.expr(_TRI_B).alias("b"),
        F.expr(_TRI_S).alias("s"),
        F.expr(_TRI_T).alias("t"),
    )
    ring = (
        "array(struct(a AS lat, b AS lon), struct(a + s AS lat, b AS lon), "
        "struct(a AS lat, b + t AS lon), struct(a AS lat, b AS lon))"
    )
    zones = tri.select("zone_id", F.expr(ring).alias("vertices"))
    out = clip_polygons_to_tiles(zones, zoom=6)
    return out.select("zone_id", "tx", "ty", "n_vertices")


# --- quadkey / Morton Z-order (tile linearization family) --------------------

def _quadkey_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    tx6, ty6 = P.tile_x_sql("lon", 6), P.tile_y_sql("lat", 6)
    tx4, ty4 = P.tile_x_sql("lon", 4), P.tile_y_sql("lat", 4)
    # qk4 encoded INDEPENDENTLY at zoom 4 — Spark derives it as a string
    # prefix of the zoom-6 quadkey, so agreement proves prefix nesting
    return f"""
    WITH {PTS_CTE},
    t AS (SELECT {tx6} AS tx, {ty6} AS ty,
                 {P.quadkey_sql(tx4, ty4, 4)} AS qk4
          FROM pts)
    SELECT {P.quadkey_sql('tx', 'ty', 6)} AS quadkey,
           {P.morton_sql('tx', 'ty', 6)} AS morton,
           min(qk4) AS qk4, count(*) AS n
    FROM t GROUP BY tx, ty
    """


@register("q_quadkey_counts", _quadkey_oracle())
def q_quadkey_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadkey + Morton Z-order tile rollup. The oracle re-encodes the
    zoom-4 quadkey directly from lat/lon while Spark takes the string
    prefix of the zoom-6 key — two derivations, one answer = the nesting
    property is driver-checked, not just pytest-claimed. Morton is the
    100-TB parquet layout key (range-partition by it before writing)."""
    from gaia_spark.operators.raster import with_quadkey, with_tile

    pts = with_tile(customer_points(spark, sf_dir), 6)
    qk = with_quadkey(pts, 6)
    out = qk.groupBy("quadkey", "morton").agg(F.count("*").alias("n"))
    return out.select(
        "quadkey", "morton",
        F.substring("quadkey", 1, 4).alias("qk4"), "n",
    )


# --- Ripley's K (point-pattern statistic) ------------------------------------

_RIPLEY_RADII = [200_000.0, 500_000.0, 1_000_000.0]
_RIPLEY_AREA = P.rect_area_m2_sql(
    "cast(-85 as double)", "cast(-170 as double)",
    "cast(85 as double)", "cast(170 as double)",
)


def _ripley_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    h = P.haversine_m_sql("a.lat", "a.lon", "b.lat", "b.lon")
    rmax = max(_RIPLEY_RADII)
    rows = " UNION ALL ".join(
        f"SELECT cast({r} as double) AS r_m, "
        f"(SELECT count(*) FROM pairs WHERE d <= {r}) AS n_pairs"
        for r in _RIPLEY_RADII
    )
    k = (
        f"(({_RIPLEY_AREA}) * cast(n_pairs as double) / "
        "(cast(n as double) * cast(n - 1 as double)))"
    )
    return f"""
    WITH {PTS_CTE},
    pairs AS (SELECT {h} AS d FROM pts a JOIN pts b ON a.c_custkey != b.c_custkey
              WHERE {h} <= {rmax}),
    hist AS ({rows}),
    nn AS (SELECT count(*) AS n FROM pts)
    SELECT r_m, cast(n_pairs as bigint) AS n_pairs,
           {P.floor_scaled_sql(k, 0)} AS k_m2_e0,
           {P.floor_scaled_sql(f'sqrt({k} / pi())', 3)} AS l_m_e3
    FROM hist CROSS JOIN nn
    """


@register("q_ripleys_k", _ripley_oracle())
def q_ripleys_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K / L over the customer point layer at 200/500/1000 km:
    the engine counts ordered pairs through the distributed cell-cover
    near join (never all-pairs); the oracle runs the brute cross join —
    derivation disagreement on the candidate generator, one answer."""
    from gaia_spark.operators.stats import ripleys_k

    pts = customer_points(spark, sf_dir)
    return ripleys_k(
        pts, _RIPLEY_RADII, key_col="c_custkey", region_area_sql=_RIPLEY_AREA
    )


# --- empirical semivariogram (geostatistics) ---------------------------------

_VGRAM_W = 250_000.0
_VGRAM_BINS = 4


def _variogram_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    h = P.haversine_m_sql("a.lat", "a.lon", "b.lat", "b.lon")
    sq = (
        "(cast(a.c_acctbal as double) - cast(b.c_acctbal as double)) * "
        "(cast(a.c_acctbal as double) - cast(b.c_acctbal as double))"
    )
    div = 2 * (10 ** (4 - 2))
    return f"""
    WITH {PTS_CTE},
    pairs AS (SELECT cast(floor({h} / {_VGRAM_W}) as bigint) AS bin,
                     {P.floor_scaled_sql(sq, 4)} AS sq_e
              FROM pts a JOIN pts b ON a.c_custkey != b.c_custkey
              WHERE {h} < {_VGRAM_W * _VGRAM_BINS})
    SELECT bin, {P.floor_scaled_sql(f'bin * {_VGRAM_W}', 0)} AS r_lo_m,
           cast(count(*) as bigint) AS n_pairs,
           cast(sum(sq_e) as bigint) AS sum_sq_e4,
           {P.bigint_div(f'cast(sum(sq_e) as bigint)', f'{div} * count(*)', P.DUCK)} AS gamma_e2
    FROM pairs WHERE bin < {_VGRAM_BINS} GROUP BY bin
    """


@register("q_variogram", _variogram_oracle())
def q_variogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical semivariogram of customer account balance over 4 × 250 km
    lag bins — the kriging precursor. Engine pairs come from the
    distributed cell-cover near join; the oracle runs the brute cross
    join. Per-pair squared differences quantize to e4 BEFORE the sum and
    gamma derives by exact bigint division, so the whole statistic is
    bit-identical cross-engine."""
    from gaia_spark.operators.stats import empirical_variogram

    pts = customer_points(spark, sf_dir)
    return empirical_variogram(
        pts, "c_acctbal", _VGRAM_W, _VGRAM_BINS, key_col="c_custkey"
    )


# --- focal raster statistics (moving-window map algebra) ---------------------

def _focal_oracle() -> str:
    n_t, px = 8, 64
    n_px = n_t * px
    c_lat, c_lon = _tile_px_center_sql(n_t, px)
    v = _band_f32_sql(0)
    mean = P.bigint_div(
        "cast(sum(v_e4) as bigint) + count(*) * 2000000", "count(*) * 100", P.DUCK
    )
    return f"""
    WITH g AS (SELECT r, c FROM generate_series(0, {n_px - 1}) t1(r),
                            generate_series(0, {n_px - 1}) t2(c)),
    px AS (SELECT r, c, {P.idiv_sql('r', px)} AS ty, r % {px} AS i,
                  {P.idiv_sql('c', px)} AS tx, c % {px} AS j FROM g),
    pc AS (SELECT r, c, {c_lat} AS plat, {c_lon} AS plon FROM px),
    pv AS (SELECT r, c, {P.floor_scaled_sql(v, 4)} AS v_e4 FROM pc),
    offs(dr, dc) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
    scat AS (SELECT r + dr AS tr, (c + dc + {n_px}) % {n_px} AS tc, v_e4
             FROM pv CROSS JOIN offs
             WHERE r + dr >= 0 AND r + dr < {n_px})
    SELECT cast(tr as bigint) AS r, cast(tc as bigint) AS c,
           cast(count(*) as bigint) AS n_nb,
           cast(({mean}) - 20000 as bigint) AS mean_e2,
           cast(min(v_e4) as bigint) AS min_e4,
           cast(max(v_e4) as bigint) AS max_e4
    FROM scat GROUP BY tr, tc
    """


@register("q_focal_stats", _focal_oracle())
def q_focal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Focal 3×3 mean/min/max over the zoom-3 global pixel grid (512×512)
    of the analytic surface — moving-window map algebra with cross-TILE
    neighborhoods (scatter + one combinable agg, antimeridian pmod wrap,
    polar row clamp). Values quantize to e4 before aggregation and the
    mean uses exact offset bigint division, so every statistic is
    bit-identical cross-engine; the oracle rebuilds all 262k pixels and
    replays the scatter as a 9-row VALUES cross join."""
    from gaia_spark.operators.raster import focal_stats
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(3,), bands=(0,))
    return focal_stats(raster, zoom=3, band=0)


# --- adaptive quadtree cover -------------------------------------------------

_QT_MIN, _QT_MAX, _QT_T = 3, 6, 40


def _quadtree_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    levels = ", ".join(
        f"t{z} AS (SELECT {z} AS zoom, {P.tile_x_sql('lon', z)} AS tx, "
        f"{P.tile_y_sql('lat', z)} AS ty, cast(count(*) as bigint) AS n "
        "FROM pts GROUP BY 2, 3)"
        for z in range(_QT_MIN, _QT_MAX + 1)
    )
    pyr = " UNION ALL ".join(f"SELECT * FROM t{z}" for z in range(_QT_MIN, _QT_MAX + 1))
    return f"""
    WITH {PTS_CTE},
    {levels},
    pyr AS ({pyr}),
    deep AS (SELECT c.zoom, c.tx, c.ty, c.n
             FROM pyr c JOIN pyr p
               ON p.zoom = c.zoom - 1
              AND p.tx = {P.idiv_sql('c.tx', 2)} AND p.ty = {P.idiv_sql('c.ty', 2)}
             WHERE c.zoom > {_QT_MIN} AND p.n > {_QT_T}
               AND (c.n <= {_QT_T} OR c.zoom = {_QT_MAX}))
    SELECT zoom, tx, ty, n FROM t{_QT_MIN} WHERE n <= {_QT_T}
    UNION ALL
    SELECT zoom, tx, ty, n FROM deep
    """


@register("q_quadtree_cover", _quadtree_oracle())
def q_quadtree_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quadtree cover of the customer points (z3→z6, ≤40 points
    per emitted tile unless at max depth): the engine rolls the pyramid
    up with shift keys and applies the monotonicity-collapsed emission
    rule in ONE self-join; the oracle recomputes every level directly
    from the points — two derivations of the pyramid, one cover."""
    from gaia_spark.operators.raster import adaptive_tile_cover

    pts = customer_points(spark, sf_dir)
    return adaptive_tile_cover(pts, max_zoom=_QT_MAX, min_zoom=_QT_MIN, threshold=_QT_T)


# --- Clark-Evans nearest-neighbor index --------------------------------------

def _nn_index_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    h = P.haversine_m_sql("a.lat", "a.lon", "b.lat", "b.lon")
    mean = "(cast(sum_nn_e3 as double) / (cast(n as double) * 1000.0))"
    expected = f"(0.5 / sqrt(cast(n as double) / ({_RIPLEY_AREA})))"
    return f"""
    WITH {PTS_CTE},
    d AS (SELECT a.c_custkey AS pid, min({P.floor_scaled_sql(h, 3)}) AS nn_e3
          FROM pts a JOIN pts b ON a.c_custkey != b.c_custkey GROUP BY 1),
    s AS (SELECT cast(count(*) as bigint) AS n,
                 cast(sum(nn_e3) as bigint) AS sum_nn_e3 FROM d)
    SELECT n, sum_nn_e3,
           {P.bigint_div('sum_nn_e3', 'n', P.DUCK)} AS mean_nn_e3,
           {P.floor_scaled_sql(f'{mean} / {expected}', 6)} AS r_e6
    FROM s
    """


@register("q_nn_index", _nn_index_oracle())
def q_nn_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clark-Evans nearest-neighbor dispersion index over the customer
    points (rect study region): nearest non-self neighbors from the
    distributed cell-ring kNN (k=2 absorbs the self pair), per-point
    distances quantized e3 pre-sum, one closed-form scalar row; the
    oracle brute-forces every nearest neighbor from the cross join."""
    from gaia_spark.operators.stats import nearest_neighbor_index

    pts = customer_points(spark, sf_dir)
    return nearest_neighbor_index(pts, _RIPLEY_AREA, key_col="c_custkey")


# --- Geary's C + join-count statistics ---------------------------------------

_ROOK_PAIRS_CTE = """
    cells AS (SELECT {cell} AS cell, cast(count(*) as bigint) AS x
              FROM pts GROUP BY 1),
    d2 AS (SELECT cell, cell % 32 AS cx, {cy} AS cy, x FROM cells),
    pairs AS (
      SELECT a.x AS xi, b.x AS xj FROM d2 a JOIN d2 b
      ON (b.cy = a.cy AND b.cx = (a.cx + 1) % 32)
      OR (b.cy = a.cy AND b.cx = (a.cx + 31) % 32)
      OR (b.cx = a.cx AND b.cy = a.cy + 1)
      OR (b.cx = a.cx AND b.cy = a.cy - 1))
"""


def _rook_pairs_cte() -> str:
    return _ROOK_PAIRS_CTE.format(
        cell=P.cell_id_sql("lat", "lon", 5), cy=P.idiv_sql("cell", 32)
    )


def _geary_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    ratio = (
        "cast(n_cells * (n_cells - 1) * _num as double)"
        " / cast(2 * n_links * (n_cells * _sxx - _sx * _sx) as double)"
    )
    return f"""
    WITH {PTS_CTE}, {_rook_pairs_cte()},
    num AS (SELECT cast(sum((xi - xj) * (xi - xj)) as bigint) AS _num,
                   cast(count(*) as bigint) AS n_links FROM pairs),
    mom AS (SELECT cast(count(*) as bigint) AS n_cells,
                   cast(sum(x) as bigint) AS _sx,
                   cast(sum(x * x) as bigint) AS _sxx FROM cells)
    SELECT n_cells, n_links, {P.floor_scaled_sql(ratio, 6)} AS geary_e6
    FROM num, mom
    """


@register("q_gearys_c", _geary_oracle())
def q_gearys_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Geary's C of per-cell point counts under rook weights — the
    pairwise-difference autocorrelation statistic. Numerator and the
    moment-identity denominator are exact bigints (no float mean in any
    distributed sum), so the hash check is airtight at any partitioning."""
    from gaia_spark.operators.spatial_join import with_cell
    from gaia_spark.operators.stats import cell_rook_weights, gearys_c

    pts = with_cell(customer_points(spark, sf_dir), 5, out="cell")
    cells = pts.groupBy("cell").agg(F.count("*").cast("long").alias("v_int"))
    w = cell_rook_weights(cells, 5)
    return gearys_c(cells, w)


def _join_counts_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    return f"""
    WITH {PTS_CTE}, {_rook_pairs_cte()},
    cls AS (SELECT CASE WHEN xi >= 2 THEN 1 ELSE 0 END AS bi,
                   CASE WHEN xj >= 2 THEN 1 ELSE 0 END AS bj FROM pairs),
    cnt AS (SELECT cast(sum(bi * bj) as bigint) AS _bb2,
                   cast(sum((1 - bi) * (1 - bj)) as bigint) AS _ww2,
                   cast(sum(bi * (1 - bj) + (1 - bi) * bj) as bigint) AS _bw2
            FROM cls),
    tot AS (SELECT cast(count(*) as bigint) AS n_cells,
                   cast(sum(CASE WHEN x >= 2 THEN 1 ELSE 0 END) as bigint) AS n_black
            FROM cells)
    SELECT n_cells, n_black, _bb2 // 2 AS bb, _ww2 // 2 AS ww, _bw2 // 2 AS bw
    FROM cnt, tot
    """


@register("q_join_counts", _join_counts_oracle())
def q_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-count statistics (BB/WW/BW rook links) for the binary variable
    'cell holds ≥2 customers' — pure integer arithmetic end to end."""
    from gaia_spark.operators.spatial_join import with_cell
    from gaia_spark.operators.stats import cell_rook_weights, join_counts

    pts = with_cell(customer_points(spark, sf_dir), 5, out="cell")
    cells = pts.groupBy("cell").agg(F.count("*").cast("long").alias("v_int"))
    w = cell_rook_weights(cells, 5)
    return join_counts(cells, w, threshold=2)


# --- standard deviational ellipse (directional distribution) ------------------

def _sde_oracle() -> str:
    lat, lon = P.key_lat_sql("c_custkey"), P.key_lon_sql("c_custkey")
    vxx = "cast(n * sxx - sx * sx as double)"
    vyy = "cast(n * syy - sy * sy as double)"
    vxy = "cast(n * sxy - sx * sy as double)"
    tr = f"(({vxx}) + ({vyy}))"
    dif = f"(({vxx}) - ({vyy}))"
    disc = f"sqrt(({dif}) * ({dif}) + cast(4 as double) * ({vxy}) * ({vxy}))"
    scale = "(cast(n as double) * cast(n as double) * 1e6)"
    lam1 = f"((({tr}) + ({disc})) / (cast(2 as double) * {scale}))"
    lam2 = f"((({tr}) - ({disc})) / (cast(2 as double) * {scale}))"
    theta = f"(cast(0.5 as double) * atan2(cast(2 as double) * ({vxy}), {dif}))"
    return f"""
    WITH q AS (SELECT c_nationkey,
                      {P.floor_scaled_sql(lon, 3)} AS xq,
                      {P.floor_scaled_sql(lat, 3)} AS yq FROM customer),
    m AS (SELECT c_nationkey,
                 cast(count(*) as bigint) AS n,
                 cast(sum(xq) as bigint) AS sx,
                 cast(sum(yq) as bigint) AS sy,
                 cast(sum(xq * xq) as bigint) AS sxx,
                 cast(sum(yq * yq) as bigint) AS syy,
                 cast(sum(xq * yq) as bigint) AS sxy
          FROM q GROUP BY 1)
    SELECT c_nationkey, n,
           {P.floor_scaled_sql('cast(sx as double) * 10.0 / cast(n as double)', 0)} AS mx_e4,
           {P.floor_scaled_sql('cast(sy as double) * 10.0 / cast(n as double)', 0)} AS my_e4,
           {P.floor_scaled_sql(f'sqrt({lam1})', 4)} AS sigma1_e4,
           {P.floor_scaled_sql(f'sqrt(greatest({lam2}, cast(0 as double)))', 4)} AS sigma2_e4,
           {P.floor_scaled_sql(theta, 4)} AS theta_e4
    FROM m
    """


@register("q_std_ellipse", _sde_oracle())
def q_std_ellipse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard deviational ellipse per nation (directional distribution):
    mean center, major/minor std axes and orientation from exact-bigint
    e3 moments — the centrographic CentroidProcess companion. One
    combinable aggregation; the oracle replays the identical moment
    identities and eigen closed form."""
    from gaia_spark.operators.stats import std_ellipse

    pts = customer_points(spark, sf_dir)
    return std_ellipse(pts, "c_nationkey")


# --- Horn slope / aspect ------------------------------------------------------

def _slope_oracle() -> str:
    n_t, px = 8, 64
    n_px = n_t * px
    c_lat, c_lon = _tile_px_center_sql(n_t, px)
    v = _band_f32_sql(0)
    grad = "sqrt(cast(gx_e4 * gx_e4 + gy_e4 * gy_e4 as double)) / cast(80000 as double)"
    deg = "cast(180 as double) / pi()"
    aspect_rad = "atan2(cast(gy_e4 as double), cast(gx_e4 as double))"
    aspect = f"({aspect_rad}) * ({deg})"
    c45 = "(sqrt(cast(2 as double)) / cast(2 as double))"
    az = "(cast(7 as double) * pi() / cast(4 as double))"
    hs = (
        f"cast(255 as double) * greatest(cast(0 as double), "
        f"{c45} * cos(atan({grad})) + "
        f"{c45} * sin(atan({grad})) * cos(({az}) - ({aspect_rad})))"
    )
    return f"""
    WITH g AS (SELECT r, c FROM generate_series(0, {n_px - 1}) t1(r),
                            generate_series(0, {n_px - 1}) t2(c)),
    px AS (SELECT r, c, {P.idiv_sql('r', px)} AS ty, r % {px} AS i,
                  {P.idiv_sql('c', px)} AS tx, c % {px} AS j FROM g),
    pc AS (SELECT r, c, {c_lat} AS plat, {c_lon} AS plon FROM px),
    pv AS (SELECT r, c, {P.floor_scaled_sql(v, 4)} AS v_e4 FROM pc),
    offs(dr, dc) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
    scat AS (SELECT r + dr AS tr, (c + dc + {n_px}) % {n_px} AS tc,
                    v_e4 * (-dc) * (2 - abs(dr)) AS wx,
                    v_e4 * (-dr) * (2 - abs(dc)) AS wy
             FROM pv CROSS JOIN offs
             WHERE r + dr >= 0 AND r + dr < {n_px}),
    agg AS (SELECT tr, tc, count(*) AS n_nb,
                   cast(sum(wx) as bigint) AS gx_e4,
                   cast(sum(wy) as bigint) AS gy_e4
            FROM scat GROUP BY tr, tc)
    SELECT cast(tr as bigint) AS r, cast(tc as bigint) AS c, gx_e4, gy_e4,
           {P.floor_scaled_sql(f'atan({grad}) * ({deg})', 4)} AS slope_deg_e4,
           {P.floor_scaled_sql(aspect, 4)} AS aspect_deg_e4,
           {P.floor_scaled_sql(hs, 2)} AS hillshade_e2
    FROM agg WHERE n_nb = 9
    """


@register("q_slope_aspect", _slope_oracle())
def q_slope_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horn slope + aspect over the zoom-3 global pixel grid of the
    analytic surface: the two gradients are exact bigint scatter sums
    (e4 values × integer Horn weights), slope/aspect derive by one shared
    closed-form expression; interior pixels only (Horn is undefined on
    the border). The oracle rebuilds every pixel and replays the weighted
    scatter as a VALUES cross join."""
    from gaia_spark.operators.raster import slope_aspect
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(3,), bands=(0,))
    return slope_aspect(raster, zoom=3, band=0)


# --- Mann-Kendall emerging-hotspot trend -------------------------------------

_MK_N = 10  # ten 3-day buckets over the 30-day events span


def _mk_oracle() -> str:
    lat, lon = P.key_lat_sql("user_id"), P.key_lon_sql("user_id")
    base = _MK_N * (_MK_N - 1) * (2 * _MK_N + 5)
    z = (
        "CASE WHEN s_stat = 0 OR var18 = 0 THEN cast(0 as double) "
        "ELSE cast(s_stat - (CASE WHEN s_stat > 0 THEN 1 ELSE -1 END) as double) "
        "* sqrt(cast(18 as double)) / sqrt(cast(var18 as double)) END"
    )
    day = "date_diff('day', DATE '2024-01-01', cast(ts as date))"
    return f"""
    WITH up AS (SELECT {P.cell_id_sql(lat, lon, 4)} AS cell,
                       {P.idiv_sql(day, 3)} AS b FROM events),
    x AS (SELECT cell, b, cast(count(*) as bigint) AS x FROM up GROUP BY 1, 2),
    grid AS (SELECT cell, gs.b FROM (SELECT DISTINCT cell FROM x)
             CROSS JOIN generate_series(0, {_MK_N - 1}) gs(b)),
    dense AS (SELECT g.cell, g.b, coalesce(x.x, 0) AS x
              FROM grid g LEFT JOIN x ON g.cell = x.cell AND g.b = x.b),
    s AS (SELECT a.cell, cast(sum(sign(j.x - a.x)) as bigint) AS s_stat
          FROM dense a JOIN dense j ON a.cell = j.cell AND a.b < j.b GROUP BY 1),
    ties AS (SELECT cell, cast(sum(t * (t - 1) * (2 * t + 5)) as bigint) AS _tie
             FROM (SELECT cell, x, count(*) AS t FROM dense GROUP BY 1, 2)
             GROUP BY 1),
    o AS (SELECT s.cell, s_stat, {base} - _tie AS var18
          FROM s JOIN ties USING (cell)),
    o2 AS (SELECT cell, s_stat, var18, {P.floor_scaled_sql(z, 4)} AS z_e4 FROM o)
    SELECT cell, s_stat, var18, z_e4,
           CASE WHEN z_e4 >= 19600 THEN 'increasing'
                WHEN z_e4 <= -19600 THEN 'decreasing'
                ELSE 'no trend' END AS trend
    FROM o2
    """


@register("q_mann_kendall", _mk_oracle())
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emerging-hotspot trend: Mann-Kendall S + tie-corrected variance per
    res-4 cell over ten 3-day event buckets — S and var18 exact integers,
    z by one shared closed form; the oracle replays grid densification,
    the pairwise sweep and the tie groups."""
    from gaia_spark.operators.stats import mann_kendall

    e = load(spark, sf_dir, "events")
    day = "datediff(cast(ts as date), date'2024-01-01')"
    up = e.select(
        F.expr(
            P.cell_id_sql(P.key_lat_sql("user_id"), P.key_lon_sql("user_id"), 4)
        ).alias("cell"),
        F.expr(P.idiv_sql(day, 3)).alias("b"),
    )
    x = up.groupBy("cell", "b").agg(F.count("*").cast("long").alias("x"))
    return mann_kendall(x, n_buckets=_MK_N)


# --- marching-squares contours ------------------------------------------------

_CONTOUR_LVL = 25.0


def _contour_oracle() -> str:
    import math

    from gaia_spark.operators.raster import _MS_SEG1, _MS_SEG2, ms_endpoint_sql

    n_t, px = 8, 64
    n_px = n_t * px
    lvl = int(math.floor(_CONTOUR_LVL * 1e4 + 0.5))
    c_lat, c_lon = _tile_px_center_sql(n_t, px)
    v = _band_f32_sql(0)
    code = (
        f"(CASE WHEN v00 >= {lvl} THEN 8 ELSE 0 END + "
        f"CASE WHEN v01 >= {lvl} THEN 4 ELSE 0 END + "
        f"CASE WHEN v11 >= {lvl} THEN 2 ELSE 0 END + "
        f"CASE WHEN v10 >= {lvl} THEN 1 ELSE 0 END)"
    )
    ts = ", ".join(
        f"CASE WHEN {b} != {a} THEN "
        f"cast({lvl} - {a} as double) / cast({b} - {a} as double) END AS {n}"
        for n, (a, b) in {
            "t_top": ("v00", "v01"),
            "t_bot": ("v10", "v11"),
            "t_left": ("v00", "v10"),
            "t_right": ("v01", "v11"),
        }.items()
    )

    def cols(table):
        return ", ".join(
            P.floor_scaled_sql(
                f"cast(w{'cr'[axis]} as double) + ({ms_endpoint_sql(table, which, axis)})",
                6,
            )
            + f" AS {'xy'[axis]}{which + 1}_e6"
            for which in (0, 1)
            for axis in (0, 1)
        )

    return f"""
    WITH g AS (SELECT r, c FROM generate_series(0, {n_px - 1}) t1(r),
                            generate_series(0, {n_px - 1}) t2(c)),
    px AS (SELECT r, c, {P.idiv_sql('r', px)} AS ty, r % {px} AS i,
                  {P.idiv_sql('c', px)} AS tx, c % {px} AS j FROM g),
    pc AS (SELECT r, c, {c_lat} AS plat, {c_lon} AS plon FROM px),
    pv AS (SELECT r, c, {P.floor_scaled_sql(v, 4)} AS v_e4 FROM pc),
    offs(i, j) AS (VALUES (0,0),(0,1),(1,0),(1,1)),
    scat AS (SELECT r - i AS wr, (c - j + {n_px}) % {n_px} AS wc, i, j, v_e4
             FROM pv CROSS JOIN offs
             WHERE r - i >= 0 AND r - i < {n_px - 1}),
    win AS (SELECT wr, wc,
                   max(CASE WHEN i = 0 AND j = 0 THEN v_e4 END) AS v00,
                   max(CASE WHEN i = 0 AND j = 1 THEN v_e4 END) AS v01,
                   max(CASE WHEN i = 1 AND j = 0 THEN v_e4 END) AS v10,
                   max(CASE WHEN i = 1 AND j = 1 THEN v_e4 END) AS v11
            FROM scat GROUP BY wr, wc HAVING count(*) = 4),
    w2 AS (SELECT wr, wc, v00, v01, v10, v11, {code} AS code, {ts} FROM win)
    SELECT cast(wr as bigint) AS wr, cast(wc as bigint) AS wc,
           cast(1 as int) AS seg, {cols(_MS_SEG1)}
    FROM w2 WHERE code NOT IN (0, 15)
    UNION ALL
    SELECT cast(wr as bigint) AS wr, cast(wc as bigint) AS wc,
           cast(2 as int) AS seg, {cols(_MS_SEG2)}
    FROM w2 WHERE code IN (5, 10)
    """


@register("q_contours", _contour_oracle())
def q_contours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iso-contour segments (marching squares, level 25) over the zoom-3
    global pixel grid — corner classification on exact e4 integers, edge
    interpolation and the fixed saddle pairing by one shared 16-case SQL
    table; every segment endpoint hash-checked at e6."""
    from gaia_spark.operators.raster import contour_segments
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(3,), bands=(0,))
    return contour_segments(raster, zoom=3, level=_CONTOUR_LVL, band=0)


# --- Weiszfeld geometric median center ----------------------------------------

_WF_ITERS = 3


def _median_center_oracle() -> str:
    lat, lon = P.key_lat_sql("c_custkey"), P.key_lon_sql("c_custkey")
    d = (
        "sqrt(pow(cast(q.xq - c.mxq as double) / cast(1000000 as double), 2)"
        " + pow(cast(q.yq - c.myq as double) / cast(1000000 as double), 2))"
    )
    px = "cast(q.xq as double) / cast(1000000 as double)"
    py = "cast(q.yq as double) / cast(1000000 as double)"
    rounds = []
    for k in range(1, _WF_ITERS + 1):
        prev = f"c{k - 1}"
        rounds.append(f"""
    t{k} AS (SELECT q.grp,
             CASE WHEN ({d}) > 0 THEN {P.floor_scaled_sql(f'cast(1 as double) / ({d})', 4)} END AS w_q,
             CASE WHEN ({d}) > 0 THEN {P.floor_scaled_sql(f'({px}) / ({d})', 4)} END AS wx_q,
             CASE WHEN ({d}) > 0 THEN {P.floor_scaled_sql(f'({py}) / ({d})', 4)} END AS wy_q
             FROM q JOIN {prev} c USING (grp)),
    u{k} AS (SELECT grp, cast(sum(w_q) as bigint) AS _sw,
             cast(sum(wx_q) as bigint) AS _swx,
             cast(sum(wy_q) as bigint) AS _swy FROM t{k} GROUP BY 1),
    c{k} AS (SELECT c.grp, c.n,
             coalesce({P.floor_scaled_sql('cast(u._swx as double) / cast(u._sw as double) * cast(1000000 as double)', 0)}, c.mxq) AS mxq,
             coalesce({P.floor_scaled_sql('cast(u._swy as double) / cast(u._sw as double) * cast(1000000 as double)', 0)}, c.myq) AS myq
             FROM {prev} c LEFT JOIN u{k} u USING (grp))""")
    # NOTE: the CTEs above reference q/c via aliases; DuckDB scoping is fine.
    chain = ",".join(rounds)
    return f"""
    WITH q AS (SELECT c_nationkey AS grp,
                      {P.floor_scaled_sql(lon, 6)} AS xq,
                      {P.floor_scaled_sql(lat, 6)} AS yq FROM customer),
    c0 AS (SELECT grp, cast(count(*) as bigint) AS n,
           {P.floor_scaled_sql('cast(sum(xq) as double) / cast(count(*) as double)', 0)} AS mxq,
           {P.floor_scaled_sql('cast(sum(yq) as double) / cast(count(*) as double)', 0)} AS myq
           FROM q GROUP BY 1),
    {chain}
    SELECT grp AS c_nationkey, n, mxq AS mx_e6, myq AS my_e6 FROM c{_WF_ITERS}
    """


@register("q_median_center", _median_center_oracle())
def q_median_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric median center per nation (3 Weiszfeld rounds): per-point
    weights quantize to e4 bigints before every distributed sum and the
    center re-quantizes to e6 between rounds, so the whole iteration is
    bit-identical cross-engine — the oracle chains the same 3 CTE rounds."""
    from gaia_spark.operators.stats import median_center

    pts = customer_points(spark, sf_dir)
    return median_center(pts, "c_nationkey", iters=_WF_ITERS)


# --- quadrat CSR test ----------------------------------------------------------

def _quadrat_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    m = 32 * 32
    chi2 = f"cast({m} * sum_sq - n_points * n_points as double) / cast(n_points as double)"
    return f"""
    WITH {PTS_CTE},
    cells AS (SELECT {P.cell_id_sql('lat', 'lon', 5)} AS cell,
                     cast(count(*) as bigint) AS o FROM pts GROUP BY 1),
    agg AS (SELECT cast(sum(o) as bigint) AS n_points,
                   cast(sum(o * o) as bigint) AS sum_sq FROM cells)
    SELECT cast({m} as bigint) AS m_quadrats, n_points, sum_sq,
           {P.floor_scaled_sql(chi2, 6)} AS chi2_e6,
           {P.floor_scaled_sql(f'({chi2}) / cast({m - 1} as double)', 6)} AS vmr_e6
    FROM agg
    """


@register("q_quadrat_test", _quadrat_oracle())
def q_quadrat_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadrat-count CSR test over the full res-5 grid (empty quadrats
    included via the closed-form identity chi2 = (m·ΣO² − n²)/n — one
    IEEE division of exact bigints)."""
    from gaia_spark.operators.stats import quadrat_test

    return quadrat_test(customer_points(spark, sf_dir), res=5)


# --- emerging hot spots (space-time cube) --------------------------------------

_EHS_N = 10  # ten 3-day buckets over the 30-day events span


def _ehs_oracle() -> str:
    from gaia_spark.operators.stats import ehs_category_sql, ehs_gz_sql

    lat, lon = P.key_lat_sql("user_id"), P.key_lon_sql("user_id")
    n = 16  # res-4 grid side
    day = "date_diff('day', DATE '2024-01-01', cast(ts as date))"
    base = _EHS_N * (_EHS_N - 1) * (2 * _EHS_N + 5)
    mkz = (
        "CASE WHEN s_stat = 0 OR var18 = 0 THEN cast(0 as double) "
        "ELSE cast(s_stat - (CASE WHEN s_stat > 0 THEN 1 ELSE -1 END) as double) "
        "* sqrt(cast(18 as double)) / sqrt(cast(var18 as double)) END"
    )
    x_, y_ = f"(cell % {n})", P.idiv_sql("cell", n)
    return f"""
    WITH up AS (SELECT {P.cell_id_sql(lat, lon, 4)} AS cell,
                       {P.idiv_sql(day, 3)} AS b FROM events),
    x AS (SELECT cell, b, cast(count(*) as bigint) AS x FROM up GROUP BY 1, 2),
    cells AS (SELECT DISTINCT cell FROM x),
    grid AS (SELECT cell, gs.b FROM cells
             CROSS JOIN generate_series(0, {_EHS_N - 1}) gs(b)),
    dense AS (SELECT g.cell, g.b, coalesce(x.x, 0) AS _x
              FROM grid g LEFT JOIN x ON g.cell = x.cell AND g.b = x.b),
    nbr4 AS (
      SELECT cell, {y_} * {n} + (({x_}) + 1) % {n} AS neighbor FROM cells
      UNION ALL SELECT cell, {y_} * {n} + (({x_}) + {n - 1}) % {n} FROM cells
      UNION ALL SELECT cell, cell + {n} FROM cells WHERE {y_} + 1 < {n}
      UNION ALL SELECT cell, cell - {n} FROM cells WHERE {y_} - 1 >= 0),
    w AS (SELECT nbr4.cell, nbr4.neighbor FROM nbr4
          JOIN cells c ON nbr4.neighbor = c.cell),
    scal AS (SELECT b, cast(count(*) as bigint) AS _n,
                    cast(sum(_x) as bigint) AS _sx,
                    cast(sum(_x * _x) as bigint) AS _sx2
             FROM dense GROUP BY b),
    nbr AS (SELECT w.cell, d.b, cast(sum(d._x) as bigint) AS _nlag,
                   cast(count(*) as bigint) AS _nw
            FROM w JOIN dense d ON w.neighbor = d.cell GROUP BY 1, 2),
    zin AS (SELECT d.cell, d.b,
                   cast(d._x as double) + cast(coalesce(nbr._nlag, 0) as double) AS lagv,
                   cast(1 as double) + cast(coalesce(nbr._nw, 0) as double) AS wi,
                   s._n AS _n, s._sx AS _sx, s._sx2 AS _sx2
            FROM dense d LEFT JOIN nbr ON d.cell = nbr.cell AND d.b = nbr.b
            JOIN scal s ON d.b = s.b),
    z AS (SELECT cell, b, {P.floor_scaled_sql(ehs_gz_sql(), 6)} AS gz FROM zin),
    s AS (SELECT a.cell, cast(sum(sign(j.gz - a.gz)) as bigint) AS s_stat
          FROM z a JOIN z j ON a.cell = j.cell AND a.b < j.b GROUP BY 1),
    ties AS (SELECT cell, cast(sum(t * (t - 1) * (2 * t + 5)) as bigint) AS _tie
             FROM (SELECT cell, gz, count(*) AS t FROM z GROUP BY 1, 2) GROUP BY 1),
    mk AS (SELECT s.cell, s_stat, {base} - _tie AS var18
           FROM s JOIN ties USING (cell)),
    mk2 AS (SELECT cell, s_stat, var18, {P.floor_scaled_sql(mkz, 4)} AS z_e4 FROM mk),
    mk3 AS (SELECT cell, s_stat, var18, z_e4,
                   CASE WHEN z_e4 >= 19600 THEN 'increasing'
                        WHEN z_e4 <= -19600 THEN 'decreasing'
                        ELSE 'no trend' END AS trend FROM mk2),
    mg AS (SELECT cell, cast(sum(gz) as bigint) AS sum_gz_e6 FROM z GROUP BY 1)
    SELECT mk3.cell, s_stat, var18, z_e4, trend, sum_gz_e6,
           {ehs_category_sql()} AS category
    FROM mk3 JOIN mg ON mk3.cell = mg.cell
    """


@register("q_emerging_hotspots", _ehs_oracle())
def q_emerging_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emerging-hot-spot analysis (the ESRI space-time-cube composite):
    per-bucket Getis-Ord G*i over rook-adjacent res-4 cells x ten 3-day
    event buckets, Mann-Kendall trend on each cell's quantized z-series,
    category from (trend x exact z-sum sign). The oracle replays the full
    chain: densify, rook adjacency, per-bucket scalars, the shared G*
    expression, the MK sweep and the category CASE."""
    from gaia_spark.operators.stats import cell_rook_weights, emerging_hotspots

    e = load(spark, sf_dir, "events")
    day = "datediff(cast(ts as date), date'2024-01-01')"
    up = e.select(
        F.expr(
            P.cell_id_sql(P.key_lat_sql("user_id"), P.key_lon_sql("user_id"), 4)
        ).alias("cell"),
        F.expr(P.idiv_sql(day, 3)).alias("b"),
    )
    x = up.groupBy("cell", "b").agg(F.count("*").cast("long").alias("x"))
    w = cell_rook_weights(x, res=4)
    return emerging_hotspots(x, w, n_buckets=_EHS_N)


# --- D8 hydrology: flow direction / accumulation / watersheds ------------------

def _d8_pivot_cte(n_t: int) -> str:
    """Shared oracle CTE chain: rebuild the zoom's global pixel grid, scatter
    each pixel onto its 9 windows, pivot to v_c/v_<compass>, rank with the
    shared exact-integer D8 keys and decode the ESRI dir."""
    from gaia_spark.operators.hydrology import D8, d8_dir_sql, d8_key_sql

    px = 64
    n_px = n_t * px
    c_lat, c_lon = _tile_px_center_sql(n_t, px)
    v = _band_f32_sql(0)
    vcols = ", ".join(
        f"max(CASE WHEN orr = {dr} AND occ = {dc} THEN v_e4 END) AS v_{nm}"
        for nm, dr, dc, _, _ in D8
    )
    kcols = ", ".join(f"{d8_key_sql(nm)} AS k_{nm}" for nm, *_ in D8)
    return f"""
    g AS (SELECT r, c FROM generate_series(0, {n_px - 1}) t1(r),
                           generate_series(0, {n_px - 1}) t2(c)),
    pxg AS (SELECT r, c, {P.idiv_sql('r', px)} AS ty, r % {px} AS i,
                   {P.idiv_sql('c', px)} AS tx, c % {px} AS j FROM g),
    pc AS (SELECT r, c, {c_lat} AS plat, {c_lon} AS plon FROM pxg),
    pv AS (SELECT r, c, {P.floor_scaled_sql(v, 4)} AS v_e4 FROM pc),
    offs(dr, dc) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
    scat AS (SELECT r + dr AS tr, (c + dc + {n_px}) % {n_px} AS tc,
                    -dr AS orr, -dc AS occ, v_e4
             FROM pv CROSS JOIN offs
             WHERE r + dr >= 0 AND r + dr < {n_px}),
    win AS (SELECT tr, tc, count(*) AS _n,
                   max(CASE WHEN orr = 0 AND occ = 0 THEN v_e4 END) AS v_c,
                   {vcols}
            FROM scat GROUP BY tr, tc),
    kk AS (SELECT cast(tr as bigint) AS r, cast(tc as bigint) AS c, {kcols}
           FROM win WHERE _n = 9),
    dd AS (SELECT r, c, cast({d8_dir_sql(P.DUCK)} as int) AS dir FROM kk)
    """


@register(
    "q_flow_dir",
    f"WITH {_d8_pivot_cte(4)} SELECT r, c, dir FROM dd",
)
def q_flow_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 steepest-descent flow direction over the zoom-2 global pixel grid
    of the analytic surface: the argmax is pure bigint arithmetic
    (2*d_orth^2 vs d_diag^2 slope comparison, fixed ESRI tie order), so
    Spark's scatter-pivot plan and the oracle's VALUES replay agree
    bit-for-bit."""
    from gaia_spark.operators.hydrology import flow_direction
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(2,), bands=(0,))
    return flow_direction(raster, zoom=2)


def _flow_accum_oracle() -> str:
    from gaia_spark.operators.hydrology import d8_step_sql

    n_px = 4 * 64
    return f"""
    WITH RECURSIVE {_d8_pivot_cte(4)},
    nodes AS (SELECT r * {n_px} + c AS v, r, c, dir FROM dd),
    tgt AS (SELECT v, (r + {d8_step_sql(0)}) * {n_px}
                      + ((c + {d8_step_sql(1)} + {n_px}) % {n_px}) AS nxt
            FROM nodes WHERE dir > 0),
    edges AS (SELECT t.v, t.nxt FROM tgt t JOIN nodes n ON t.nxt = n.v),
    reach(u, x) AS (
      SELECT v, nxt FROM edges
      UNION
      SELECT r.u, e.nxt FROM reach r JOIN edges e ON r.x = e.v
    ),
    acc AS (SELECT x AS v, cast(count(*) as bigint) AS acc FROM reach GROUP BY 1),
    term AS (SELECT r.u, r.x FROM reach r LEFT JOIN edges e ON r.x = e.v
             WHERE e.v IS NULL)
    SELECT n.r, n.c, coalesce(a.acc, 0) AS acc, coalesce(t.x, n.v) AS basin
    FROM nodes n LEFT JOIN acc a ON n.v = a.v LEFT JOIN term t ON n.v = t.u
    """


@register("q_flow_accum", _flow_accum_oracle())
def q_flow_accum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flow accumulation + watershed basin over the zoom-2 D8 graph:
    upstream contributing-cell count and terminal sink per pixel. The
    engine builds the transitive closure by linear-output path doubling
    (S_k successor table + prefix-set join, log2(max path) rounds); the
    oracle replays it as ONE recursive CTE over the same shared-SQL edge
    set."""
    from gaia_spark.operators.hydrology import flow_accumulation, flow_direction
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(2,), bands=(0,))
    return flow_accumulation(flow_direction(raster, zoom=2), zoom=2)


# --- deterministic k-means document clustering ----------------------------------

from gaia_spark.operators.clustering import kmeans_oracle_ctes as _kmeans_ctes  # noqa: E402


def _kmeans_oracle() -> str:
    return "WITH " + _kmeans_ctes() + " SELECT vec_id, cid, d AS dist_e12 FROM asg"


def _ann_ivf_oracle(k: int = 3, n_lists: int = 8, nprobe: int = 3) -> str:
    ddot = (
        "list_sum(list_transform(range(1, 65), "
        "i -> cast(e.embedding[i] as double) * cast(q.qe[i] as double)))"
    )
    dna = (
        "list_sum(list_transform(range(1, 65), "
        "i -> cast(e.embedding[i] as double) * cast(e.embedding[i] as double)))"
    )
    dnb = (
        "list_sum(list_transform(range(1, 65), "
        "i -> cast(q.qe[i] as double) * cast(q.qe[i] as double)))"
    )
    return f"""
    WITH {_kmeans_ctes(k=n_lists)},
    qd AS (SELECT p.vec_id AS qid, c.cid,
           cast(sum((p.xv - c.cv) * (p.xv - c.cv)) as bigint) AS d
           FROM pts p JOIN c3 c ON p.i = c.i WHERE p.vec_id < 5 GROUP BY 1, 2),
    probes AS (SELECT qid, cid FROM
      (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d, cid) AS rn FROM qd)
      WHERE rn <= {nprobe}),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.qid AS query_id, e.vec_id,
             {ddot} / sqrt({dna}) / sqrt({dnb}) AS cos
      FROM embeddings e JOIN asg a ON e.vec_id = a.vec_id
      JOIN probes pr ON a.cid = pr.cid JOIN q ON q.qid = pr.qid
      WHERE e.vec_id != q.qid),
    r AS (SELECT query_id, vec_id, cos,
          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
          FROM scored)
    SELECT query_id, vec_id, cast(rank as int) AS rank,
           {P.floor_scaled_sql('cos', 6)} AS cos_e6
    FROM r WHERE rank <= {k}
    """


@register("q_ann_ivf", _ann_ivf_oracle())
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN, HASH-checked (upgraded from rows-only per VERDICT r4 #6):
    the coarse quantizer is the engine's own deterministic k-means
    (md5-ordered seeds, exact-integer argmin, e6 re-quantized rounds —
    the machinery PQ already proved), probe selection is an exact bigint
    top-nprobe, and the cosine refine reuses the q_embed_knn shared
    expressions — so the DuckDB oracle replays the ENTIRE index build and
    search. Recall vs exact brute force stays pytest-checked
    (test_simsearch)."""
    from gaia_spark.operators.simsearch import ann_topk_ivf_det

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_topk_ivf_det(emb, queries, k=3, n_lists=8, nprobe=3)


@register("q_kmeans_docs", _kmeans_oracle())
def q_kmeans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means over the embeddings table (k=8, three
    rounds from md5-ordered seeds): exact-integer argmin assignment +
    offset-floor-div recentering make every iteration value-hash
    checkable; the oracle chains the identical rounds as CTEs."""
    from gaia_spark.operators.clustering import kmeans_assign

    return kmeans_assign(load(spark, sf_dir, "embeddings"), k=8, n_rounds=3)


# --- Bloom-filter shard membership ----------------------------------------------

def _bloom_oracle() -> str:
    from gaia_spark.operators.sketch import BLOOM_K, BLOOM_WORDS, bloom_pos_sql

    pos = bloom_pos_sql("it", "_j", P.DUCK, BLOOM_WORDS)
    word = P.idiv_sql(pos, 32)
    mask = f"(cast(1 as bigint) << cast(({pos}) % 32 as int))"
    return f"""
    WITH items AS (SELECT md5(text) AS it FROM documents WHERE doc_id % 3 = 0),
    bb AS (SELECT {word} AS word, cast(bit_or({mask}) as bigint) AS bits
           FROM items, generate_series(0, {BLOOM_K - 1}) g(_j) GROUP BY 1),
    probe AS (SELECT doc_id, md5(text) AS it FROM documents),
    pr AS (SELECT doc_id, it, {word} AS word, {mask} AS m
           FROM probe, generate_series(0, {BLOOM_K - 1}) g(_j)),
    h AS (SELECT pr.doc_id, pr.it,
                 CASE WHEN b.bits IS NOT NULL AND (b.bits & pr.m) = pr.m
                      THEN 1 ELSE 0 END AS hit
          FROM pr LEFT JOIN bb b USING (word))
    SELECT doc_id, it, cast(sum(hit) as bigint) AS n_hits,
           cast(CASE WHEN sum(hit) = {BLOOM_K} THEN 1 ELSE 0 END as int) AS member
    FROM h GROUP BY 1, 2
    """


@register("q_bloom_crawled", _bloom_oracle())
def q_bloom_crawled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter shard-membership scan (the 'already crawled?' /
    decontamination probe): build a 131,072-bit md5-hash Bloom sketch over
    the fingerprints of the doc_id%3==0 shard, probe EVERY document
    against the broadcast sketch. One-sided and deterministic — both
    engines see the identical bit pattern, so even false positives
    hash-match."""
    from gaia_spark.operators.sketch import bloom_build, bloom_contains

    docs = load(spark, sf_dir, "documents")
    items = docs.where("doc_id % 3 = 0").select(F.expr("md5(text)").alias("it"))
    probes = docs.select("doc_id", F.expr("md5(text)").alias("it"))
    return bloom_contains(bloom_build(items, "it"), probes, "it")


# --- SemDeDup: cluster-then-dedup ------------------------------------------------

_SDD_THRESHOLD = 0.25


def _semdedup_oracle() -> str:
    dot = (
        "list_sum(list_transform(range(1, 65), "
        "i -> cast(pa.embedding[i] as double) * cast(pb.embedding[i] as double)))"
    )
    na = (
        "list_sum(list_transform(range(1, 65), "
        "i -> cast(pa.embedding[i] as double) * cast(pa.embedding[i] as double)))"
    )
    nb = (
        "list_sum(list_transform(range(1, 65), "
        "i -> cast(pb.embedding[i] as double) * cast(pb.embedding[i] as double)))"
    )
    cos = f"({dot} / sqrt({na}) / sqrt({nb}))"
    return f"""
    WITH RECURSIVE {_kmeans_ctes()},
    ae AS (SELECT a.vec_id, a.cid, e.embedding
           FROM asg a JOIN embeddings e USING (vec_id)),
    pe AS (SELECT pa.vec_id AS a, pb.vec_id AS b
           FROM ae pa JOIN ae pb ON pa.cid = pb.cid AND pa.vec_id < pb.vec_id
           WHERE {cos} >= {_SDD_THRESHOLD}),
    sym AS (SELECT a, b FROM pe UNION ALL SELECT b AS a, a AS b FROM pe),
    reach(u, x) AS (
      SELECT vec_id, vec_id FROM asg
      UNION
      SELECT r.u, s.b FROM reach r JOIN sym s ON r.x = s.a
    ),
    lab AS (SELECT u AS vec_id, min(x) AS grp FROM reach GROUP BY u)
    SELECT g.vec_id, g.cid, l.grp,
           cast(CASE WHEN l.grp = g.vec_id THEN 1 ELSE 0 END as int) AS keep
    FROM asg g JOIN lab l USING (vec_id)
    """


@register("q_semdedup", _semdedup_oracle())
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end to end: deterministic k-means clusters as the
    candidate generator, within-cluster cosine >= 0.25 pairs, connected
    components by pointer-doubling min-label, min-id survivor per semantic
    group. The oracle chains the k-means rounds, the pair sweep and a
    recursive reachability closure."""
    from gaia_spark.operators.clustering import semdedup

    return semdedup(
        load(spark, sf_dir, "embeddings"), k=8, n_rounds=3, threshold=_SDD_THRESHOLD
    )


# --- zonal majority (categorical zonal stats) ------------------------------------

def _zonal_majority_oracle() -> str:
    from gaia_spark.queries import ZONES_CTE

    pts = (
        "mpts AS (SELECT c_custkey, c_mktsegment AS cat, "
        f"{P.key_lat_sql('c_custkey')} AS lat, {P.key_lon_sql('c_custkey')} AS lon "
        "FROM customer)"
    )
    return f"""
    WITH {pts}, {ZONES_CTE},
    cc AS (SELECT zone_id, cat, cast(count(*) as bigint) AS n
           FROM mpts JOIN zones
             ON lat BETWEEN min_lat AND max_lat AND lon BETWEEN min_lon AND max_lon
           GROUP BY 1, 2),
    maj AS (SELECT zone_id, cat, n FROM
            (SELECT *, row_number() OVER (PARTITION BY zone_id ORDER BY n DESC, cat ASC) AS rn
             FROM cc) WHERE rn = 1),
    mino AS (SELECT zone_id, cat, n FROM
             (SELECT *, row_number() OVER (PARTITION BY zone_id ORDER BY n ASC, cat ASC) AS rn
              FROM cc) WHERE rn = 1),
    var AS (SELECT zone_id, cast(count(*) as bigint) AS variety FROM cc GROUP BY 1)
    SELECT m.zone_id, m.cat AS majority, m.n AS majority_n,
           i.cat AS minority, i.n AS minority_n, v.variety
    FROM maj m JOIN mino i USING (zone_id) JOIN var v USING (zone_id)
    """


@register("q_zonal_majority", _zonal_majority_oracle())
def q_zonal_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical zonal statistics (ArcGIS MAJORITY/MINORITY/VARIETY):
    market-segment majority per zone over the spatial-join assignment,
    ties broken toward the smaller category via exact struct-min."""
    from gaia_spark.operators.spatial_join import spatial_join
    from gaia_spark.operators.zonal import zonal_majority
    from gaia_spark.queries import _zone_index

    pts = customer_points(spark, sf_dir)
    joined = spatial_join(pts, _zone_index(), predicate="intersects", point_key="c_custkey")
    return zonal_majority(joined, zone_col="zone_id", cat_col="c_mktsegment")


# --- bilinear 2x raster resample --------------------------------------------------

def _bilinear_oracle() -> str:
    n_t, px = 4, 64
    n_src = n_t * px
    n_tgt = 2 * n_src
    off = 10**7
    c_lat, c_lon = _tile_px_center_sql(n_t, px)
    v = _band_f32_sql(0)
    return f"""
    WITH g AS (SELECT r, c FROM generate_series(0, {n_src - 1}) t1(r),
                            generate_series(0, {n_src - 1}) t2(c)),
    pxg AS (SELECT r, c, {P.idiv_sql('r', px)} AS ty, r % {px} AS i,
                   {P.idiv_sql('c', px)} AS tx, c % {px} AS j FROM g),
    pc AS (SELECT r, c, {c_lat} AS plat, {c_lon} AS plon FROM pxg),
    pv AS (SELECT r, c, {P.floor_scaled_sql(v, 4)} AS v_e4 FROM pc),
    offs(d, w) AS (VALUES (-1, 1), (0, 3), (1, 3), (2, 1)),
    scat AS (SELECT 2 * r + o1.d AS tr, (2 * c + o2.d + {n_tgt}) % {n_tgt} AS tc,
                    v_e4 * o1.w * o2.w AS wv, o1.w * o2.w AS w
             FROM pv CROSS JOIN offs o1 CROSS JOIN offs o2
             WHERE 2 * r + o1.d >= 0 AND 2 * r + o1.d < {n_tgt}),
    agg AS (SELECT tr, tc, cast(sum(wv) as bigint) AS s,
                   cast(sum(w) as bigint) AS wsum
            FROM scat GROUP BY 1, 2)
    SELECT cast(tr as bigint) AS r, cast(tc as bigint) AS c,
           cast(((s + cast({16 * off} as bigint)) // 16) - {off} as bigint) AS v_e4
    FROM agg WHERE wsum = 16
    """


@register("q_raster_resample", _bilinear_oracle())
def q_raster_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilinear 2x upsample of the zoom-2 global grid: center-aligned
    4-tap separable {1,3}x{1,3}/16 kernel as exact bigint scatter sums,
    mean by offset floor-division; interior targets only."""
    from gaia_spark.operators.raster import bilinear_upsample
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(2,), bands=(0,))
    return bilinear_upsample(raster, zoom=2)


# --- Hilbert-curve index (the range-partition / sort key family) ------------------

_HILBERT_ORDER = 8


def _hilbert_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    order, n = _HILBERT_ORDER, 1 << _HILBERT_ORDER
    parts = [
        PTS_CTE,
        f"g AS (SELECT {P.hilbert_grid_x_sql('lon', order)} AS gx, "
        f"{P.hilbert_grid_y_sql('lat', order)} AS gy FROM pts)",
        "l0 AS (SELECT gx, gy, gx AS x, gy AS y, 0 AS d FROM g)",
    ]
    s, i = n // 2, 0
    while s > 0:
        d2, x2, y2 = P.hilbert_step_exprs("x", "y", "d", s, n)
        parts.append(
            f"l{i + 1} AS (SELECT gx, gy, {x2} AS x, {y2} AS y, {d2} AS d FROM l{i})"
        )
        s //= 2
        i += 1
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT gx AS hx, gy AS hy, cast(d as bigint) AS hilbert_d,
           cast(count(*) as bigint) AS n_pts
    FROM l{i} GROUP BY 1, 2, 3
    """
    )


@register("q_hilbert_counts", _hilbert_oracle())
def q_hilbert_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve index at order 8 (256×256): the full (x, y) → d map
    over the customer point layer, hash-checked cell by cell. The curve is
    the layout key for 100 TB writes — consecutive hilbert_d values are
    always grid neighbors, so clustering files by d minimizes the footprint
    of any later bbox scan. Spark runs 8 chained codegen projections; the
    oracle replays the identical per-level expressions as a CTE chain."""
    from gaia_spark.operators.spatial_join import with_hilbert
    from gaia_spark.queries import customer_points

    pts = with_hilbert(
        customer_points(spark, sf_dir), order=_HILBERT_ORDER, keep_xy=True
    )
    return pts.groupBy(
        F.col("hx"), F.col("hy"), F.col("hilbert_d")
    ).agg(F.count("*").cast("long").alias("n_pts"))


# --- terrain indices: TPI / TRI / roughness ---------------------------------------


def _terrain_oracle() -> str:
    n_t, px = 8, 64
    n_px = n_t * px
    c_lat, c_lon = _tile_px_center_sql(n_t, px)
    v = _band_f32_sql(0)
    off = 2_000_000
    tpi = P.bigint_div(f"n_nb * v_e4 - _s + n_nb * {off}", "n_nb", P.DUCK)
    ssd = "(n_nb * v_e4 * v_e4 - 2 * v_e4 * _s + _ss)"
    tri = P.floor_scaled_sql(
        f"sqrt(cast({ssd} as double)) / cast(10000 as double)", 4
    )
    return f"""
    WITH g AS (SELECT r, c FROM generate_series(0, {n_px - 1}) t1(r),
                            generate_series(0, {n_px - 1}) t2(c)),
    pxg AS (SELECT r, c, {P.idiv_sql('r', px)} AS ty, r % {px} AS i,
                   {P.idiv_sql('c', px)} AS tx, c % {px} AS j FROM g),
    pc AS (SELECT r, c, {c_lat} AS plat, {c_lon} AS plon FROM pxg),
    pv AS (SELECT r, c, {P.floor_scaled_sql(v, 4)} AS v_e4 FROM pc),
    offs(dr, dc) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)),
    scat AS (SELECT r + dr AS tr, (c + dc + {n_px}) % {n_px} AS tc, v_e4
             FROM pv CROSS JOIN offs
             WHERE r + dr >= 0 AND r + dr < {n_px}),
    nb AS (SELECT tr AS r, tc AS c, cast(count(*) as bigint) AS n_nb,
                  cast(sum(v_e4) as bigint) AS _s,
                  cast(sum(v_e4 * v_e4) as bigint) AS _ss,
                  cast(min(v_e4) as bigint) AS _mn,
                  cast(max(v_e4) as bigint) AS _mx
           FROM scat GROUP BY 1, 2)
    SELECT cast(p.r as bigint) AS r, cast(p.c as bigint) AS c, n_nb,
           cast(({tpi}) - {off} as bigint) AS tpi_e4,
           cast({tri} as bigint) AS tri_e4,
           cast(greatest(_mx, v_e4) - least(_mn, v_e4) as bigint) AS rough_e4
    FROM pv p JOIN nb USING (r, c)
    """


@register("q_terrain_indices", _terrain_oracle())
def q_terrain_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdaldem-style TPI / TRI (Riley) / roughness over the zoom-3 global
    grid: focal moments by 8-offset scatter + ONE agg, center joined back
    once; Σ(v−v_nb)² expanded to exact-bigint moments so no neighbor pair
    materializes; TRI via one IEEE sqrt, TPI via exact offset division."""
    from gaia_spark.operators.raster import terrain_indices
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(3,), bands=(0,))
    return terrain_indices(raster, zoom=3, band=0)


# --- cost distance (accumulated least-cost surface) --------------------------------

_CD_ITERS = 6
_CD_MOD = 1021


def _cd_ctes() -> str:
    """CTE chain ending in d{_CD_ITERS} = (node, dist) — shared by the
    q_cost_distance and q_isochrones oracles."""
    n_t, px = 2, 64
    n_px = n_t * px
    c_lat, c_lon = _tile_px_center_sql(n_t, px)
    v = _band_f32_sql(0)
    cost = P.floor_scaled_sql(f"(({v}) + cast(150 as double))", 4)
    w = (
        "(cast(_cs + c_e4 as double) / cast(20000 as double)) * "
        "(CASE WHEN _m = 2 THEN cast(1 as double) ELSE sqrt(cast(2 as double)) END)"
    )
    rounds = []
    for k in range(1, _CD_ITERS + 1):
        prev = f"d{k - 1}"
        rounds.append(
            f"d{k} AS (SELECT node, min(dist) AS dist FROM ("
            f"SELECT node, dist FROM {prev} "
            f"UNION ALL "
            f"SELECT e.dst AS node, d.dist + e.w AS dist "
            f"FROM ed e JOIN {prev} d ON e.src = d.node) GROUP BY node)"
        )
    chain = ",\n    ".join(rounds)
    return f"""g AS (SELECT r, c FROM generate_series(0, {n_px - 1}) t1(r),
                            generate_series(0, {n_px - 1}) t2(c)),
    pxg AS (SELECT r, c, {P.idiv_sql('r', px)} AS ty, r % {px} AS i,
                   {P.idiv_sql('c', px)} AS tx, c % {px} AS j FROM g),
    pc AS (SELECT r, c, {c_lat} AS plat, {c_lon} AS plon FROM pxg),
    nd AS (SELECT r, c, {cost} AS c_e4, r * {n_px} + c AS node FROM pc),
    offs(dr, dc, m) AS (VALUES (-1,-1,1),(-1,0,2),(-1,1,1),(0,-1,2),
                               (0,1,2),(1,-1,1),(1,0,2),(1,1,1)),
    scat AS (SELECT node AS src, r + dr AS tr, (c + dc + {n_px}) % {n_px} AS tc,
                    c_e4 AS _cs, m AS _m
             FROM nd CROSS JOIN offs
             WHERE r + dr >= 0 AND r + dr < {n_px}),
    ed AS (SELECT s.src, t.node AS dst, {w} AS w
           FROM scat s JOIN nd t ON s.tr = t.r AND s.tc = t.c),
    d0 AS (SELECT node, cast(0 as double) AS dist FROM nd WHERE node % {_CD_MOD} = 0),
    {chain}"""


def _cost_distance_oracle() -> str:
    n_px = 128
    return f"""
    WITH {_cd_ctes()}
    SELECT {P.bigint_div('node', str(n_px), P.DUCK)} AS r,
           cast(node % {n_px} as bigint) AS c,
           {P.floor_scaled_sql('dist', 6)} AS dist_e6
    FROM d{_CD_ITERS}
    """


@register("q_cost_distance", _cost_distance_oracle())
def q_cost_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulated cost distance over the zoom-1 cost surface (band value
    + 150) from the node ≡ 0 (mod 1021) source cells — 8-neighbor edges
    built by the focal scatter + one equi-join (mean-cost × step-length
    weights, √2 diagonals), then 6 multi-source Bellman–Ford rounds;
    unreached cells absent by design."""
    from gaia_spark.operators.hydrology import cost_distance
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(1,), bands=(0,))
    return cost_distance(raster, zoom=1, band=0, iters=_CD_ITERS, source_mod=_CD_MOD)


# --- raster reclassify + polygonize ------------------------------------------------

_RC_BREAKS = (-50.0, 0.0, 50.0)


def _reclass_cls_sql() -> str:
    import math

    bq = [math.floor(b * 10_000 + 0.5) for b in sorted(_RC_BREAKS)]
    return "(" + " + ".join(f"CASE WHEN v_e4 >= {b} THEN 1 ELSE 0 END" for b in bq) + ")"


def _reclass_oracle() -> str:
    n_t, px = 4, 64
    n_px = n_t * px
    c_lat, c_lon = _tile_px_center_sql(n_t, px)
    v = _band_f32_sql(0)
    return f"""
    WITH g AS (SELECT r, c FROM generate_series(0, {n_px - 1}) t1(r),
                            generate_series(0, {n_px - 1}) t2(c)),
    pxg AS (SELECT r, c, {P.idiv_sql('r', px)} AS ty, r % {px} AS i,
                   {P.idiv_sql('c', px)} AS tx, c % {px} AS j FROM g),
    pc AS (SELECT r, c, {c_lat} AS plat, {c_lon} AS plon FROM pxg),
    pv AS (SELECT r, c, {P.floor_scaled_sql(v, 4)} AS v_e4 FROM pc),
    cl AS (SELECT r, c, v_e4, {_reclass_cls_sql()} AS cls FROM pv)
    SELECT cast(cls as bigint) AS cls, cast(count(*) as bigint) AS n_pixels,
           cast(min(v_e4) as bigint) AS min_e4, cast(max(v_e4) as bigint) AS max_e4
    FROM cl GROUP BY 1
    """


@register("q_raster_reclass", _reclass_oracle())
def q_raster_reclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster reclassification histogram over the zoom-2 global grid:
    per class, pixel count and the exact e4 value range — class cuts on
    exact quantized integers so boundaries never flip cross-engine."""
    from gaia_spark.operators.raster import reclassify
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(2,), bands=(0,))
    return (
        reclassify(raster, zoom=2, breaks=list(_RC_BREAKS))
        .groupBy("cls")
        .agg(
            F.count("*").cast("long").alias("n_pixels"),
            F.min("v_e4").cast("long").alias("min_e4"),
            F.max("v_e4").cast("long").alias("max_e4"),
        )
    )


def _polygonize_oracle() -> str:
    n_t, px = 1, 64
    n_px = n_t * px
    c_lat, c_lon = _tile_px_center_sql(n_t, px)
    v = _band_f32_sql(0)
    return f"""
    WITH RECURSIVE g AS (SELECT r, c FROM generate_series(0, {n_px - 1}) t1(r),
                            generate_series(0, {n_px - 1}) t2(c)),
    pxg AS (SELECT r, c, {P.idiv_sql('r', px)} AS ty, r % {px} AS i,
                   {P.idiv_sql('c', px)} AS tx, c % {px} AS j FROM g),
    pc AS (SELECT r, c, {c_lat} AS plat, {c_lon} AS plon FROM pxg),
    pv AS (SELECT r, c, {P.floor_scaled_sql(v, 4)} AS v_e4 FROM pc),
    cl AS (SELECT r, c, r * {n_px} + c AS node, {_reclass_cls_sql()} AS cls FROM pv),
    adj AS (
      SELECT a.node AS cell, b.node AS nb FROM cl a JOIN cl b
        ON a.cls = b.cls
       AND ((b.r = a.r AND b.c = (a.c + 1) % {n_px})
         OR (b.r = a.r AND b.c = (a.c + {n_px - 1}) % {n_px})
         OR (b.c = a.c AND b.r = a.r + 1)
         OR (b.c = a.c AND b.r = a.r - 1))),
    reach(a, b) AS (
      SELECT node, node FROM cl
      UNION
      SELECT r.a, j.nb FROM reach r JOIN adj j ON r.b = j.cell
    ),
    lab AS (SELECT a AS node, min(b) AS region_id FROM reach GROUP BY a)
    SELECT l.region_id, cast(min(cls) as bigint) AS cls,
           cast(count(*) as bigint) AS n_pixels,
           cast(min(r) as bigint) AS min_r, cast(max(r) as bigint) AS max_r,
           cast(min(c) as bigint) AS min_c, cast(max(c) as bigint) AS max_c
    FROM cl JOIN lab l USING (node) GROUP BY 1
    """


@register("q_polygonize", _polygonize_oracle())
def q_polygonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_polygonize analog: 4-connected equal-class pixel runs of the
    zoom-0 reclassified surface become regions (pointer-doubling min-label
    components over the scatter-built adjacency, longitude wrap included);
    the oracle replays adjacency + a recursive reachability closure."""
    from gaia_spark.operators.raster import polygonize
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(0,), bands=(0,))
    return polygonize(raster, zoom=0, breaks=list(_RC_BREAKS))


_ISO_BREAKS = (200.0, 400.0, 600.0)


def _isochrones_oracle() -> str:
    import math

    bq = [math.floor(b * 1_000_000 + 0.5) for b in sorted(_ISO_BREAKS)]
    cls = "(" + " + ".join(f"CASE WHEN dist_e6 >= {b} THEN 1 ELSE 0 END" for b in bq) + ")"
    return f"""
    WITH {_cd_ctes()},
    de AS (SELECT {P.floor_scaled_sql('dist', 6)} AS dist_e6 FROM d{_CD_ITERS}),
    bd AS (SELECT {cls} AS band, dist_e6 FROM de)
    SELECT cast(band as bigint) AS band, cast(count(*) as bigint) AS n_cells,
           cast(min(dist_e6) as bigint) AS min_e6,
           cast(max(dist_e6) as bigint) AS max_e6
    FROM bd GROUP BY 1
    """


@register("q_isochrones", _isochrones_oracle())
def q_isochrones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isochrone (service-area) bands over the cost-distance surface:
    reached cells banded at 200/400/600 cost-units on exact e6 integers,
    one combinable count per band — cost_distance ∘ classify, both stages
    independently oracle-proven."""
    from gaia_spark.operators.hydrology import isochrones
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(1,), bands=(0,))
    return isochrones(
        raster, zoom=1, breaks_m=list(_ISO_BREAKS), iters=_CD_ITERS, source_mod=_CD_MOD
    )


# --- product quantization: PQ codes + ADC top-k -------------------------------------

_PQ_M, _PQ_K, _PQ_SD, _PQ_ROUNDS = 8, 8, 8, 2
_PQ_QID, _PQ_TOPK = 3, 10


def _kmeans_sub_ctes(prefix: str, k: int, sd: int, rounds: int, lo: int) -> str:
    """The _kmeans_ctes chain generalized to an embedding SLICE
    [lo+1 .. lo+sd] with all CTE names prefixed — one block per PQ
    subspace; ends in {prefix}asg = (vec_id, cid, d)."""
    from gaia_spark.operators.clustering import KM_OFF

    h = P.md5_int60("cast(vec_id as string)", P.DUCK)
    pre = prefix
    parts = [
        f"""{pre}pts AS (SELECT vec_id, i,
           cast(floor(cast(embedding[{lo} + i] as double) * 1000000 + 0.5) as bigint) AS xv
           FROM embeddings, generate_series(1, {sd}) g(i)),
    {pre}seeds AS (SELECT vec_id, cast(row_number() OVER (ORDER BY _h, vec_id) - 1 as int) AS cid
              FROM (SELECT vec_id, {h} AS _h FROM embeddings)
              ORDER BY _h, vec_id LIMIT {k}),
    {pre}c0 AS (SELECT s.cid, p.i, p.xv AS cv FROM {pre}seeds s JOIN {pre}pts p USING (vec_id))"""
    ]
    prev = f"{pre}c0"
    for r in range(1, rounds + 1):
        parts.append(
            f"""{pre}a{r} AS (SELECT p.vec_id, c.cid,
             cast(sum((p.xv - c.cv) * (p.xv - c.cv)) as bigint) AS d
             FROM {pre}pts p JOIN {prev} c ON p.i = c.i GROUP BY 1, 2),
    {pre}s{r} AS (SELECT vec_id, cid FROM
             (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
              FROM {pre}a{r}) WHERE rn = 1),
    {pre}c{r} AS (SELECT s.cid, p.i,
             cast(((sum(p.xv) + count(*) * {KM_OFF}) // count(*)) - {KM_OFF} as bigint) AS cv
             FROM {pre}s{r} s JOIN {pre}pts p USING (vec_id) GROUP BY 1, 2)"""
        )
        prev = f"{pre}c{r}"
    fr = rounds + 1
    parts.append(
        f"""{pre}a{fr} AS (SELECT p.vec_id, c.cid,
              cast(sum((p.xv - c.cv) * (p.xv - c.cv)) as bigint) AS d
              FROM {pre}pts p JOIN {prev} c ON p.i = c.i GROUP BY 1, 2),
    {pre}asg AS (SELECT vec_id, cid, d FROM
    (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM {pre}a{fr})
    WHERE rn = 1)"""
    )
    return ",\n    ".join(parts)


def _pq_blocks() -> str:
    return ",\n    ".join(
        _kmeans_sub_ctes(f"m{j}_", _PQ_K, _PQ_SD, _PQ_ROUNDS, j * _PQ_SD)
        for j in range(_PQ_M)
    )


def _pq_codes_oracle() -> str:
    union = "\n    UNION ALL ".join(
        f"SELECT vec_id, cast({j} as int) AS m, cid AS code, d AS dist_e12 FROM m{j}_asg"
        for j in range(_PQ_M)
    )
    return f"WITH {_pq_blocks()}\n    {union}"


@register("q_pq_codes", _pq_codes_oracle())
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding of the embeddings table: 8 subspaces
    × 8-centroid deterministic codebooks (2 Lloyd's rounds each, md5
    seeds) — every (vector, subspace) code AND its exact e6² residual
    hash-checked against 8 prefixed k-means CTE chains."""
    from gaia_spark.operators.simsearch import pq_codes

    codes, _ = pq_codes(
        load(spark, sf_dir, "embeddings"),
        dim=64, m=_PQ_M, k=_PQ_K, n_rounds=_PQ_ROUNDS,
    )
    return codes


def _pq_adc_oracle() -> str:
    from gaia_spark.operators.clustering import KM_OFF  # noqa: F401  (doc parity)

    dts = []
    for j in range(_PQ_M):
        lo = j * _PQ_SD
        dts.append(
            f"""q{j} AS (SELECT i,
            cast(floor(cast(embedding[{lo} + i] as double) * 1000000 + 0.5) as bigint) AS qv
            FROM embeddings, generate_series(1, {_PQ_SD}) g(i) WHERE vec_id = {_PQ_QID}),
    dt{j} AS (SELECT c.cid AS code, cast(sum((q.qv - c.cv) * (q.qv - c.cv)) as bigint) AS dj
              FROM m{j}_c{_PQ_ROUNDS} c JOIN q{j} q ON c.i = q.i GROUP BY 1)"""
        )
    code_union = "\n      UNION ALL ".join(
        f"SELECT vec_id, cast({j} as int) AS m, cid AS code FROM m{j}_asg"
        for j in range(_PQ_M)
    )
    dt_union = "\n      UNION ALL ".join(
        f"SELECT cast({j} as int) AS m, code, dj FROM dt{j}" for j in range(_PQ_M)
    )
    dts_sql = ",\n    ".join(dts)
    return f"""
    WITH {_pq_blocks()},
    {dts_sql},
    ac AS ({code_union}),
    ad AS ({dt_union}),
    sc AS (SELECT vec_id, cast(sum(dj) as bigint) AS adc_e12
           FROM ac JOIN ad USING (m, code) GROUP BY 1)
    SELECT vec_id, adc_e12, rank FROM
    (SELECT vec_id, adc_e12,
            cast(row_number() OVER (ORDER BY adc_e12, vec_id) as int) AS rank
     FROM sc)
    WHERE rank <= {_PQ_TOPK}
    """


@register("q_pq_adc", _pq_adc_oracle())
def q_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-10 PQ search for query vec_id=3: exact query subvectors vs
    the 64-entry broadcast distance table over the codes, one combinable
    per-vector sum, ties by id — rank list hash-identical cross-engine."""
    from gaia_spark.operators.simsearch import pq_adc_topk

    return pq_adc_topk(
        load(spark, sf_dir, "embeddings"),
        query_id=_PQ_QID, topk=_PQ_TOPK,
        dim=64, m=_PQ_M, k=_PQ_K, n_rounds=_PQ_ROUNDS,
    )


# --- Hilbert bbox range decomposition ----------------------------------------------

_HR_BBOX = (10.0, 35.0, -40.0, -5.0)  # lat_min, lat_max, lon_min, lon_max


def _hilbert_ranges_oracle() -> str:
    import math

    order, n = _HILBERT_ORDER, 1 << _HILBERT_ORDER
    la0, la1, lo0, lo1 = _HR_BBOX
    x0 = max(0, min(n - 1, math.floor((lo0 + 180.0) / 360.0 * n)))
    x1 = max(0, min(n - 1, math.floor((lo1 + 180.0) / 360.0 * n)))
    y0 = max(0, min(n - 1, math.floor((la0 + 90.0) / 180.0 * n)))
    y1 = max(0, min(n - 1, math.floor((la1 + 90.0) / 180.0 * n)))
    parts = [
        f"l0 AS (SELECT x AS _x, y AS _y, 0 AS d "
        f"FROM generate_series({x0}, {x1}) t1(x), generate_series({y0}, {y1}) t2(y))"
    ]
    s, i = n // 2, 0
    while s > 0:
        d2, x2, y2 = P.hilbert_step_exprs("_x", "_y", "d", s, n)
        parts.append(
            f"l{i + 1} AS (SELECT {x2} AS _x, {y2} AS _y, {d2} AS d FROM l{i})"
        )
        s //= 2
        i += 1
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    runs AS (SELECT d, d - row_number() OVER (ORDER BY d) AS _grp FROM l{i})
    SELECT cast(min(d) as bigint) AS d_lo, cast(max(d) as bigint) AS d_hi,
           cast(count(*) as bigint) AS n_cells
    FROM runs GROUP BY _grp
    """
    )


@register("q_hilbert_ranges", _hilbert_ranges_oracle())
def q_hilbert_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFC range decomposition of a 25°×35° bbox at order 8: the maximal
    consecutive hilbert_d runs a clustered-table reader would scan —
    in-plan cell explode, the xy2d chain, one bbox-bounded window merge;
    the short run list vs the bbox area is the layout win, hash-checked
    range by range."""
    from gaia_spark.operators.spatial_join import hilbert_bbox_ranges

    la0, la1, lo0, lo1 = _HR_BBOX
    return hilbert_bbox_ranges(spark, la0, la1, lo0, lo1, order=_HILBERT_ORDER)


# --- geodesic destination (ST_Project) ---------------------------------------------

_DEST_BRG = "cast((c_custkey * 37) % 360 as double)"
_DEST_M = "cast(250000 + (c_custkey % 7) * 50000 as double)"


def _destination_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    lat2, lon2 = P.destination_sqls("lat", "lon", _DEST_BRG, _DEST_M)
    back = P.haversine_m_sql("lat", "lon", "dlat", "dlon")
    return f"""
    WITH {PTS_CTE},
    d AS (SELECT c_custkey, lat, lon, {lat2} AS dlat, {lon2} AS dlon FROM pts)
    SELECT c_custkey,
           {P.floor_scaled_sql('dlat', 6)} AS dest_lat_e6,
           {P.floor_scaled_sql('dlon', 6)} AS dest_lon_e6,
           {P.floor_scaled_sql(back, 2)} AS dist_back_e2
    FROM d
    """


@register("q_destination", _destination_oracle())
def q_destination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic destination points (ST_Project): every customer point
    projected 250–550 km along a key-derived bearing; the oracle
    hash-checks the e6 destination AND the haversine distance BACK from
    the origin (must equal the requested distance — the sphere-consistency
    invariant, e2-checked), sharing one expression string per value."""
    from gaia_spark.queries import customer_points

    pts = customer_points(spark, sf_dir)
    lat2, lon2 = P.destination_sqls("lat", "lon", _DEST_BRG, _DEST_M)
    back = P.haversine_m_sql("lat", "lon", "dlat", "dlon")
    return (
        pts.select("c_custkey", "lat", "lon",
                   F.expr(lat2).alias("dlat"), F.expr(lon2).alias("dlon"))
        .select(
            "c_custkey",
            F.expr(P.floor_scaled_sql("dlat", 6)).alias("dest_lat_e6"),
            F.expr(P.floor_scaled_sql("dlon", 6)).alias("dest_lon_e6"),
            F.expr(P.floor_scaled_sql(back, 2)).alias("dist_back_e2"),
        )
    )


# --- Hilbert decode (d2xy) round trip ----------------------------------------------

_HD_ORDER = 6


def _hilbert_decode_oracle() -> str:
    n = 1 << _HD_ORDER
    parts = [f"l0 AS (SELECT d AS od, d AS t, 0 AS x, 0 AS y "
             f"FROM generate_series(0, {n * n - 1}) g(d))"]
    s, i = 1, 0
    while s < n:
        t2, x2, y2 = P.hilbert_unstep_exprs("t", "x", "y", s)
        parts.append(f"l{i + 1} AS (SELECT od, {t2} AS t, {x2} AS x, {y2} AS y FROM l{i})")
        s *= 2
        i += 1
    # re-encode the decoded (x, y) through the FORWARD chain: the returned
    # d_rt column proves the round trip inside the hash-checked rows
    parts.append(f"e0 AS (SELECT od, x AS gx, y AS gy, x AS ex, y AS ey, 0 AS ed FROM l{i})")
    s, j = n // 2, 0
    while s > 0:
        d2, x2, y2 = P.hilbert_step_exprs("ex", "ey", "ed", s, n)
        parts.append(
            f"e{j + 1} AS (SELECT od, gx, gy, {x2} AS ex, {y2} AS ey, {d2} AS ed FROM e{j})"
        )
        s //= 2
        j += 1
    return (
        "WITH " + ",\n    ".join(parts)
        + f"""
    SELECT cast(od as bigint) AS d, cast(gx as bigint) AS hx,
           cast(gy as bigint) AS hy, cast(ed as bigint) AS d_rt
    FROM e{j}
    """
    )


@register("q_hilbert_decode", _hilbert_decode_oracle())
def q_hilbert_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d2xy decode of every order-6 curve position, re-encoded through the
    forward chain in the same rows — the full decode map AND the
    d_rt == d round-trip invariant hash-checked cell by cell."""
    from gaia_spark.operators.spatial_join import hilbert_decode, with_hilbert

    from gaia_spark.session import iter_checkpoint

    n = 1 << _HD_ORDER
    ds = spark.range(n * n).select(F.col("id").alias("d"))
    # cut the plan between decode and re-encode: stacking both projection
    # chains in ONE plan makes Catalyst's project-collapse inline each
    # level's multi-referenced state ~5× per level — 12 stacked levels
    # explode the expression tree and OOM the optimizer (observed). Each
    # chain alone is fine; the checkpoint keeps them separate plans.
    dec = iter_checkpoint(hilbert_decode(ds, order=_HD_ORDER, d_col="d"))
    # re-encode from the decoded grid coords via the lat/lon-free chain:
    # feed cell centers back through with_hilbert's quantizer
    relat = f"(-90.0 + (hy + cast(5 as double) / 10) * (180.0 / {n}))"
    relon = f"(-180.0 + (hx + cast(5 as double) / 10) * (360.0 / {n}))"
    pts = dec.select(
        "d", "hx", "hy",
        F.expr(relat).alias("lat"), F.expr(relon).alias("lon"),
    )
    rt = with_hilbert(pts, order=_HD_ORDER, out="d_rt").drop("lat", "lon")
    return rt.select("d", "hx", "hy", "d_rt")


# --- great-circle route densify ------------------------------------------------------

_GC_FRACS = ((1, 4), (2, 4), (3, 4))


def _gc_route_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    dlat, dlon = P.destination_sqls("lat", "lon", _DEST_BRG, _DEST_M)
    sels = []
    for num, den in _GC_FRACS:
        wla, wlo = P.gc_waypoint_sqls("lat", "lon", "dlat", "dlon", num, den)
        sels.append(
            f"SELECT c_custkey, cast({num} as int) AS seg, "
            f"{P.floor_scaled_sql(wla, 6)} AS wp_lat_e6, "
            f"{P.floor_scaled_sql(wlo, 6)} AS wp_lon_e6 FROM d"
        )
    body = "\n    UNION ALL ".join(sels)
    return f"""
    WITH {PTS_CTE},
    d AS (SELECT c_custkey, lat, lon, {dlat} AS dlat, {dlon} AS dlon FROM pts)
    {body}
    """


@register("q_gc_route", _gc_route_oracle())
def q_gc_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle route densify: the quarter/half/three-quarter waypoints
    of every customer→destination geodesic (spherical slerp on the same
    proven libm surface), each waypoint hash-checked at e6."""
    from gaia_spark.queries import customer_points

    dlat, dlon = P.destination_sqls("lat", "lon", _DEST_BRG, _DEST_M)
    d = customer_points(spark, sf_dir).select(
        "c_custkey", "lat", "lon", F.expr(dlat).alias("dlat"), F.expr(dlon).alias("dlon")
    )
    out = None
    for num, den in _GC_FRACS:
        wla, wlo = P.gc_waypoint_sqls("lat", "lon", "dlat", "dlon", num, den)
        part = d.select(
            "c_custkey",
            F.lit(num).cast("int").alias("seg"),
            F.expr(P.floor_scaled_sql(wla, 6)).alias("wp_lat_e6"),
            F.expr(P.floor_scaled_sql(wlo, 6)).alias("wp_lon_e6"),
        )
        out = part if out is None else out.unionByName(part)
    return out


# --- Douglas-Peucker, hash-checked on the closed-form spike family -----------

# key-derived single-spike polyline: baseline lat 0 at lon 0..N, one spike
# of height h at lon m. Parameter ranges keep every baseline point's
# deviation to any chord DP can draw strictly under the tolerance
# (worst case m=15: 0.525*14/sqrt(225+0.525^2) = 0.4897 < 0.5), so the
# simplified set is closed-form: endpoints + the spike iff h > tol.
# test_hull_simplify certifies closed-form == brute-force DP for the
# whole key family before the oracle ever relies on it.
_SPIKE_TOL = 0.5
_SPIKE_M = "(3 + (c_custkey * 7) % 13)"          # 3 .. 15
_SPIKE_N = f"({_SPIKE_M} + 4 + (c_custkey * 11) % 13)"  # m+4 .. m+16
_SPIKE_H = "(CASE WHEN c_custkey % 2 = 0 THEN 0.525 ELSE 0.475 END)"


def _simplify_closed_oracle() -> str:
    m, n, h = _SPIKE_M, _SPIKE_N, _SPIKE_H
    kept = f"CASE WHEN {h} > {_SPIKE_TOL} THEN 3 ELSE 2 END"
    lat_sum = f"CASE WHEN {h} > {_SPIKE_TOL} THEN {P.floor_scaled_sql(h, 6)} ELSE 0 END"
    lon_sum = (
        f"CASE WHEN {h} > {_SPIKE_TOL} "
        f"THEN cast({m} as bigint) * 1000000 + cast({n} as bigint) * 1000000 "
        f"ELSE cast({n} as bigint) * 1000000 END"
    )
    return f"""
    SELECT c_custkey,
           cast({kept} as int) AS n_simplified,
           cast({lat_sum} as bigint) AS lat_e6_sum,
           cast({lon_sum} as bigint) AS lon_e6_sum
    FROM customer
    """


@register("q_simplify_closed", _simplify_closed_oracle())
def q_simplify_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimplifyProcess, HASH-checked (VERDICT r4 #7): Douglas-Peucker runs
    as the real mapInPandas numpy kernel over the key-derived spike
    polylines; the fixture's safe-regime parameters make the kept-vertex
    set closed-form (endpoints + spikes above tolerance), so the oracle
    states the answer without replaying the recursion. The general-input
    evidence stays in q_simplify (rows-only) and the DP property pytests."""
    from gaia_spark.operators.hull import simplify_lines

    cust = load(spark, sf_dir, "customer").select("c_custkey")
    verts = cust.withColumn(
        "vertices",
        F.expr(
            f"transform(sequence(0, {_SPIKE_N}), i -> struct("
            f"CASE WHEN i = {_SPIKE_M} THEN cast({_SPIKE_H} as double) "
            f"ELSE cast(0 as double) END AS lat, cast(i as double) AS lon))"
        ),
    )
    out = simplify_lines(verts, tol_deg=_SPIKE_TOL)
    lat_sum = (
        "aggregate(vertices, cast(0 as bigint), "
        f"(acc, p) -> acc + {P.floor_scaled_sql('p.lat', 6)})"
    )
    lon_sum = (
        "aggregate(vertices, cast(0 as bigint), "
        f"(acc, p) -> acc + {P.floor_scaled_sql('p.lon', 6)})"
    )
    return out.select(
        "c_custkey",
        F.size("vertices").cast("int").alias("n_simplified"),
        F.expr(lat_sum).alias("lat_e6_sum"),
        F.expr(lon_sum).alias("lon_e6_sum"),
    )


# --- ellipsoidal geodesic distance (Vincenty inverse, WGS84) -------------------

_VI_LAT2 = "((c_custkey * 131) % 120 / cast(2 as double) - 30.0)"
_VI_LON2 = "((c_custkey * 61) % 300 / cast(2 as double) - 75.0)"


def _vincenty_inverse_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    inner = (
        f"WITH {PTS_CTE} SELECT c_custkey, lat, lon, {_VI_LAT2} AS lat2, "
        f"{_VI_LON2} AS lon2 FROM pts"
    )
    nested = P.vincenty_inverse_subquery_sql(inner, "lat", "lon", "lat2", "lon2")
    return f"""
    SELECT c_custkey,
           {P.floor_scaled_sql('_vi_dist_m', 3)} AS dist_mm
    FROM {nested} t
    """


@register("q_vincenty_inverse", _vincenty_inverse_oracle())
def q_vincenty_inverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ellipsoidal geodesic DISTANCE (Vincenty inverse on WGS84) between
    each customer point and its key-derived partner point — the inverse
    sibling of q_destination_ellipsoid, completing the forward/inverse
    pair VERDICT r4 #8 asked for. Six unrolled lambda rounds of named
    shared-SQL steps, hash-checked at millimeter quantization; the
    direct∘inverse roundtrip and equator/meridian closed forms are
    pytest-pinned."""
    from gaia_spark.queries import customer_points

    pts = customer_points(spark, sf_dir).select(
        "c_custkey", "lat", "lon",
        F.expr(_VI_LAT2).alias("lat2"), F.expr(_VI_LON2).alias("lon2"),
    )
    for name, expr in P.vincenty_inverse_steps("lat", "lon", "lat2", "lon2"):
        pts = pts.selectExpr("*", f"{expr} AS {name}")
    return pts.select(
        "c_custkey",
        F.expr(P.floor_scaled_sql("_vi_dist_m", 3)).alias("dist_mm"),
    )


# --- ellipsoidal geodesic destination (Vincenty direct, WGS84) -----------------


def _destination_ellipsoid_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    inner = (
        f"WITH {PTS_CTE} SELECT c_custkey, lat, lon, {_DEST_BRG} AS brg, "
        f"{_DEST_M} AS dist FROM pts"
    )
    nested = P.vincenty_subquery_sql(inner, "lat", "lon", "brg", "dist")
    return f"""
    SELECT c_custkey,
           {P.floor_scaled_sql('_vd_lat2', 6)} AS dest_lat_e6,
           {P.floor_scaled_sql('_vd_lon2', 6)} AS dest_lon_e6
    FROM {nested} t
    """


@register("q_destination_ellipsoid", _destination_ellipsoid_oracle())
def q_destination_ellipsoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ellipsoidal ST_Project: every customer point projected along the
    same key-derived bearing/distance as the SPHERICAL q_destination, but
    on WGS84 via the Vincenty direct problem (σ iteration = one runtime
    fold, hash-stable across engines). The sub-mm-accuracy sibling the
    round-4 verdict asked for — diff against q_destination quantifies the
    spherical family's ~0.5%-of-distance latitude error."""
    from gaia_spark.queries import customer_points

    pts = customer_points(spark, sf_dir).select(
        "c_custkey", "lat", "lon",
        F.expr(_DEST_BRG).alias("brg"), F.expr(_DEST_M).alias("dist"),
    )
    for name, expr in P.vincenty_direct_steps("lat", "lon", "brg", "dist"):
        pts = pts.selectExpr("*", f"{expr} AS {name}")
    return pts.select(
        "c_custkey",
        F.expr(P.floor_scaled_sql("_vd_lat2", 6)).alias("dest_lat_e6"),
        F.expr(P.floor_scaled_sql("_vd_lon2", 6)).alias("dest_lon_e6"),
    )


# --- viewshed (line-of-sight visibility) --------------------------------------

_VS_R0, _VS_C0, _VS_RAD, _VS_H = 250, 260, 40, 50000  # observer, radius, +5u


def _viewshed_oracle() -> str:
    from gaia_spark.operators.visibility import blocked_sql, round_frac_sql

    n_t, px = 8, 64
    r0, c0, rad, h = _VS_R0, _VS_C0, _VS_RAD, _VS_H
    c_lat, c_lon = _tile_px_center_sql(n_t, px)
    v = _band_f32_sql(0)
    sr = f"{r0} + {round_frac_sql('k', 'dr', 'm', rad, P.DUCK)}"
    sc = f"{c0} + {round_frac_sql('k', 'dc', 'm', rad, P.DUCK)}"
    # grid restricted to the radius bounding box: line samples never leave
    # the box spanned by observer and target, so visibility is unchanged
    return f"""
    WITH g AS (SELECT r, c FROM generate_series({r0 - rad}, {r0 + rad}) t1(r),
                              generate_series({c0 - rad}, {c0 + rad}) t2(c)),
    pxg AS (SELECT r, c, {P.idiv_sql('r', px)} AS ty, r % {px} AS i,
                   {P.idiv_sql('c', px)} AS tx, c % {px} AS j FROM g),
    pc AS (SELECT r, c, {c_lat} AS plat, {c_lon} AS plon FROM pxg),
    pv AS (SELECT cast(r as bigint) AS r, cast(c as bigint) AS c,
                  {P.floor_scaled_sql(v, 4)} AS v_e4 FROM pc),
    obs AS (SELECT v_e4 + {h} AS e0 FROM pv WHERE r = {r0} AND c = {c0}),
    t AS (SELECT r, c, v_e4, r - {r0} AS dr, c - {c0} AS dc,
                 greatest(abs(r - {r0}), abs(c - {c0})) AS m
          FROM pv
          WHERE (r - {r0}) * (r - {r0}) + (c - {c0}) * (c - {c0}) <= {rad * rad}
            AND NOT (r = {r0} AND c = {c0})),
    s AS (SELECT r, c, dr, dc, m, v_e4, unnest(generate_series(1, m - 1)) AS k
          FROM t WHERE m >= 2),
    sp AS (SELECT r, c, dr, dc, m, v_e4, k, {sr} AS sr, {sc} AS sc FROM s),
    j AS (SELECT sp.r, sp.c, sp.v_e4 - obs.e0 AS et, pv.v_e4 - obs.e0 AS es,
                 (sp.sr - {r0}) * (sp.sr - {r0})
                   + (sp.sc - {c0}) * (sp.sc - {c0}) AS ds2,
                 sp.dr * sp.dr + sp.dc * sp.dc AS dt2
          FROM sp JOIN pv ON pv.r = sp.sr AND pv.c = sp.sc CROSS JOIN obs),
    b AS (SELECT r, c,
                 max(CASE WHEN {blocked_sql('es', 'et', 'ds2', 'dt2')}
                     THEN 1 ELSE 0 END) AS blk
          FROM j GROUP BY r, c)
    SELECT r, c, (blk = 0) AS visible FROM b
    UNION ALL
    SELECT r, c, true AS visible FROM t WHERE m <= 1
    """


@register("q_viewshed", _viewshed_oracle())
def q_viewshed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viewshed from an observer 5 units above the zoom-3 analytic surface,
    radius 40 cells: R3 line-of-sight with nearest-cell sampling, every
    visibility comparison exact integer arithmetic (squared e4 elevation
    deltas cross-multiplied against squared grid distances). The explode
    is radius-bounded, elevation lookup is one cell-key equi-join, the
    verdict one combinable agg."""
    from gaia_spark.operators.visibility import decoded_grid, viewshed
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(3,), bands=(0,))
    px = decoded_grid(raster, zoom=3, band=0)
    return viewshed(
        px, r0=_VS_R0, c0=_VS_C0, radius=_VS_RAD, obs_height_e4=_VS_H
    )


# --- bivariate Moran's I (spatial cross-correlation) --------------------------


def _moran_bv_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    cell = P.cell_id_sql("lat", "lon", 5)
    cy = P.idiv_sql("cell", 32)
    num = (
        "(n_cells * n_cells * _sxy - n_cells * _sx * _swy"
        " - n_cells * _sy * _swx + n_links * _sx * _sy)"
    )
    dx = "(n_cells * _sxx - _sx * _sx)"
    dy = "(n_cells * _syy - _sy * _sy)"
    ratio = (
        f"cast({num} as double) / "
        f"(cast(n_links as double) * sqrt(cast({dx} as double) * cast({dy} as double)))"
    )
    return f"""
    WITH {PTS_CTE},
    cells AS (SELECT {cell} AS cell, cast(count(*) as bigint) AS x,
                     cast(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) as bigint) AS y
              FROM pts GROUP BY 1),
    d2 AS (SELECT cell, cell % 32 AS cx, {cy} AS cy, x, y FROM cells),
    link AS (SELECT cast(sum(a.x * b.y) as bigint) AS _sxy,
                    cast(sum(a.x) as bigint) AS _swx,
                    cast(sum(b.y) as bigint) AS _swy,
                    cast(count(*) as bigint) AS n_links
             FROM d2 a JOIN d2 b
             ON (b.cy = a.cy AND b.cx = (a.cx + 1) % 32)
             OR (b.cy = a.cy AND b.cx = (a.cx + 31) % 32)
             OR (b.cx = a.cx AND b.cy = a.cy + 1)
             OR (b.cx = a.cx AND b.cy = a.cy - 1)),
    mom AS (SELECT cast(count(*) as bigint) AS n_cells,
                   cast(sum(x) as bigint) AS _sx, cast(sum(y) as bigint) AS _sy,
                   cast(sum(x * x) as bigint) AS _sxx,
                   cast(sum(y * y) as bigint) AS _syy FROM cells)
    SELECT n_cells, n_links,
           CASE WHEN n_links > 0 AND {dx} > 0 AND {dy} > 0 THEN
           {P.floor_scaled_sql(ratio, 6)} ELSE NULL END AS moran_bv_e6
    FROM link, mom
    """


@register("q_moran_bv", _moran_bv_oracle())
def q_moran_bv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global bivariate Moran's I between per-cell customer density and
    per-cell high-balance density under rook weights — spatial
    cross-correlation. Centered numerator and both variance terms expand
    to exact-bigint moment identities; the statistic is ONE IEEE division
    over exact integers, hash-airtight at any partitioning."""
    from gaia_spark.operators.spatial_join import with_cell
    from gaia_spark.operators.stats import cell_rook_weights, morans_i_bivariate

    pts = with_cell(customer_points(spark, sf_dir), 5, out="cell")
    cells = pts.groupBy("cell").agg(
        F.count("*").cast("long").alias("x_int"),
        F.sum(F.when(F.col("c_acctbal") > 5000, 1).otherwise(0))
        .cast("long")
        .alias("y_int"),
    )
    w = cell_rook_weights(cells, 5)
    return morans_i_bivariate(cells, w)


# --- Theil-Sen robust trend slope ----------------------------------------------


def _theil_sen_oracle() -> str:
    import math

    from gaia_spark.operators.stats import theil_sen_slope_sql

    lat, lon = P.key_lat_sql("user_id"), P.key_lon_sql("user_id")
    day = "date_diff('day', DATE '2024-01-01', cast(ts as date))"
    n = _MK_N
    lcm = math.lcm(*range(1, n))
    m = n * (n - 1) // 2
    lo, hi = (m + 1) // 2, m // 2 + 1
    med2 = "sum(_s) * 2" if lo == hi else "sum(_s)"
    return f"""
    WITH up AS (SELECT {P.cell_id_sql(lat, lon, 4)} AS cell,
                       {P.idiv_sql(day, 3)} AS b FROM events),
    x AS (SELECT cell, b, cast(count(*) as bigint) AS x FROM up GROUP BY 1, 2),
    grid AS (SELECT cell, gs.b FROM (SELECT DISTINCT cell FROM x)
             CROSS JOIN generate_series(0, {n - 1}) gs(b)),
    dense AS (SELECT g.cell, g.b, coalesce(x.x, 0) AS x
              FROM grid g LEFT JOIN x ON g.cell = x.cell AND g.b = x.b),
    slopes AS (SELECT a.cell, (j.x - a.x) * ({lcm} // (j.b - a.b)) AS _s
               FROM dense a JOIN dense j ON a.cell = j.cell AND a.b < j.b),
    ranked AS (SELECT cell, _s,
                      row_number() OVER (PARTITION BY cell ORDER BY _s) AS _rk
               FROM slopes),
    med AS (SELECT cell, cast({med2} as bigint) AS med2_scaled
            FROM ranked WHERE _rk IN ({lo}, {hi}) GROUP BY cell)
    SELECT cell, cast({m} as bigint) AS n_pairs, med2_scaled,
           {theil_sen_slope_sql('med2_scaled', lcm, P.DUCK)} AS slope_e6
    FROM med
    """


@register("q_theil_sen", _theil_sen_oracle())
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope per res-4 cell over the same ten 3-day
    event buckets as q_mann_kendall — median of pairwise slopes, every
    slope an EXACT bigint via the lcm(1..9) scaling, median by exact
    integer selection, final slope by offset floor-division. The 'how
    steep' companion of MK's 'is there a trend'."""
    from gaia_spark.operators.stats import theil_sen

    e = load(spark, sf_dir, "events")
    day = "datediff(cast(ts as date), date'2024-01-01')"
    up = e.select(
        F.expr(
            P.cell_id_sql(P.key_lat_sql("user_id"), P.key_lon_sql("user_id"), 4)
        ).alias("cell"),
        F.expr(P.idiv_sql(day, 3)).alias("b"),
    )
    x = up.groupBy("cell", "b").agg(F.count("*").cast("long").alias("x"))
    return theil_sen(x, n_buckets=_MK_N)


# --- Zevenbergen-Thorne curvature ----------------------------------------------


def _curvature_oracle() -> str:
    from gaia_spark.operators.raster import zt_curvature_sqls, zt_weight_sql

    n_t, px = 8, 64
    n_px = n_t * px
    c_lat, c_lon = _tile_px_center_sql(n_t, px)
    v = _band_f32_sql(0)
    prof, plan, gen = zt_curvature_sqls()
    w = {k: zt_weight_sql("v_e4", "(-dr)", "(-dc)", k) for k in "defgh"}
    return f"""
    WITH g AS (SELECT r, c FROM generate_series(0, {n_px - 1}) t1(r),
                            generate_series(0, {n_px - 1}) t2(c)),
    px AS (SELECT r, c, {P.idiv_sql('r', px)} AS ty, r % {px} AS i,
                  {P.idiv_sql('c', px)} AS tx, c % {px} AS j FROM g),
    pc AS (SELECT r, c, {c_lat} AS plat, {c_lon} AS plon FROM px),
    pv AS (SELECT r, c, {P.floor_scaled_sql(v, 4)} AS v_e4 FROM pc),
    offs(dr, dc) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
    scat AS (SELECT r + dr AS tr, (c + dc + {n_px}) % {n_px} AS tc,
                    {w['d']} AS wd, {w['e']} AS we, {w['f']} AS wf,
                    {w['g']} AS wg, {w['h']} AS wh
             FROM pv CROSS JOIN offs
             WHERE r + dr >= 0 AND r + dr < {n_px}),
    agg AS (SELECT tr AS r, tc AS c, count(*) AS n_nb,
                   cast(sum(wd) as bigint) AS d4, cast(sum(we) as bigint) AS e4x,
                   cast(sum(wf) as bigint) AS f4, cast(sum(wg) as bigint) AS g2,
                   cast(sum(wh) as bigint) AS h2
            FROM scat GROUP BY tr, tc)
    SELECT cast(r as bigint) AS r, cast(c as bigint) AS c, d4, e4x, f4, g2, h2,
           {P.floor_scaled_sql(prof, 6)} AS prof_e6,
           {P.floor_scaled_sql(plan, 6)} AS plan_e6,
           {P.floor_scaled_sql(gen, 6)} AS gen_e6
    FROM agg WHERE n_nb = 9
    """


@register("q_curvature", _curvature_oracle())
def q_curvature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zevenbergen-Thorne profile/plan/general curvature over the zoom-3
    analytic surface — the second-derivative terrain tier beside
    slope/aspect/TPI. One scatter + one combinable agg; five kernel sums
    exact bigints; each curvature ONE shared IEEE expression."""
    from gaia_spark.operators.raster import zt_curvature
    from gaia_spark.synth import synth_raster

    raster = synth_raster(spark, zooms=(3,), bands=(0,))
    out = zt_curvature(raster, zoom=3, band=0)
    return out.select(
        F.col("r").cast("long").alias("r"), F.col("c").cast("long").alias("c"),
        "d4", "e4x", "f4", "g2", "h2", "prof_e6", "plan_e6", "gen_e6",
    )


# --- Huff gravity market shares ---------------------------------------------------


def _huff_oracle() -> str:
    from gaia_spark.queries import PTS_CTE

    dist = P.haversine_m_sql("d.lat", "d.lon", "s.slat", "s.slon")
    util = f"(s._a * power(greatest({dist}, cast(1 as double)), -2.0))"
    share = P.floor_scaled_sql("cast(_u as double) / cast(_den as double)", 6)
    return f"""
    WITH {PTS_CTE},
    d AS (SELECT c_custkey AS _p, lat, lon FROM pts),
    s AS (SELECT s_suppkey AS _s, {P.key_lat_sql('s_suppkey')} AS slat,
                 {P.key_lon_sql('s_suppkey')} AS slon,
                 cast(1 + s_suppkey % 9 as double) AS _a
          FROM supplier WHERE s_suppkey % 4 = 1),
    pairs AS (SELECT d._p, s._s, {P.floor_scaled_sql(util, 12)} AS _u
              FROM d CROSS JOIN s),
    den AS (SELECT _p, cast(sum(_u) as bigint) AS _den FROM pairs GROUP BY 1)
    SELECT _s AS site_id, cast(count(*) as bigint) AS n_points,
           cast(sum({share}) as bigint) AS captured_e6
    FROM pairs JOIN den ON den._p = pairs._p
    WHERE _den > 0 GROUP BY _s
    """


@register("q_huff", _huff_oracle())
def q_huff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huff gravity market capture: every customer point splits its
    patronage over the attractiveness-weighted inverse-square utilities
    of the supplier site layer; per-site expected capture. Utilities
    quantize to e12 bigints BEFORE the denominator sum and shares to e6
    before the capture rollup — exact integer aggregation end to end,
    one broadcast join, no float-order sensitivity."""
    from gaia_spark.operators.interpolate import huff_shares

    pts = customer_points(spark, sf_dir).select(
        F.col("c_custkey").alias("pid"), "lat", "lon"
    )
    sup = load(spark, sf_dir, "supplier").where("s_suppkey % 4 = 1")
    sites = sup.select(
        F.col("s_suppkey").alias("site_id"),
        F.expr(P.key_lat_sql("s_suppkey")).alias("lat"),
        F.expr(P.key_lon_sql("s_suppkey")).alias("lon"),
        (1 + F.col("s_suppkey") % 9).cast("double").alias("attract"),
    )
    return huff_shares(pts, sites, beta=2.0)
