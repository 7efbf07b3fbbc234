"""Registry tranche 6: round-5 session-4 additions — web×geo cross-tier
operators (route deviation, polyline smoothing, URL pattern mining,
toponym disambiguation) over the driver tables.

Every query is oracle-paired and hash-checked; floats flow through the
portable fixed-point idioms (`P.floor_scaled_sql`) so both engines agree
bit-for-bit."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from gaia_spark.functions import portable as P
from gaia_spark.functions import web as W
from gaia_spark.queries import load, register

# --- cross-track / along-track route deviation --------------------------------

# fixed great-circle route between two key-derived endpoints (integer-key
# formulas — both engines rebuild the exact same doubles)
_RT = {
    "lat1": P.key_lat_sql("41"),
    "lon1": P.key_lon_sql("41"),
    "lat2": P.key_lat_sql("97"),
    "lon2": P.key_lon_sql("97"),
}
_XT, _AT = P.cross_track_sqls("lat", "lon", **_RT)


@register(
    "q_cross_track",
    f"""
    WITH pts AS (SELECT c_custkey, {P.key_lat_sql('c_custkey')} AS lat,
                        {P.key_lon_sql('c_custkey')} AS lon FROM customer)
    SELECT c_custkey,
           {P.floor_scaled_sql(_XT, 3)} AS dxt_mm,
           {P.floor_scaled_sql(_AT, 3)} AS dat_mm
    FROM pts
    """,
)
def q_cross_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed cross-track + along-track distance of every customer point to
    a fixed great-circle route (ST_LineLocatePoint / route-corridor
    analytics, `[R] SURVEY.md §2.C DistanceProcess` family). Map-only: one
    shared trig expression per output, no shuffle at all, mm-quantized for
    the cross-engine hash."""
    pts = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(P.key_lat_sql("c_custkey")).alias("lat"),
        F.expr(P.key_lon_sql("c_custkey")).alias("lon"),
    )
    return pts.select(
        "c_custkey",
        F.expr(P.floor_scaled_sql(_XT, 3)).alias("dxt_mm"),
        F.expr(P.floor_scaled_sql(_AT, 3)).alias("dat_mm"),
    )


# --- Chaikin polyline smoothing ------------------------------------------------

# jagged per-user walk: key-derived home plus event-cycled jitter, every
# 5th event sampled as a vertex (ord = event_id, unique and time-ordered)
_CH_LAT = (
    f"({P.key_lat_sql('user_id')} "
    "+ (event_id % 19) * (cast(3 as double) / cast(1000 as double)))"
)
_CH_LON = (
    f"({P.key_lon_sql('user_id')} "
    "+ (event_id % 23) * (cast(3 as double) / cast(1000 as double)))"
)


def _chaikin_round_oracle(src: str) -> str:
    """One corner-cutting round in plain SQL over (user_id, ord, x, y):
    emits start + per-leg q/r + end, ords contiguous from the row number —
    the exact integer twin of trajectory.chaikin_round."""
    b = (
        "(SELECT user_id, ord, x, y, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ord) - 1 AS rn, "
        "lead(x) OVER (PARTITION BY user_id ORDER BY ord) AS nx, "
        "lead(y) OVER (PARTITION BY user_id ORDER BY ord) AS ny "
        f"FROM {src})"
    )
    return (
        "(SELECT user_id, 0 AS ord, 4 * x AS x, 4 * y AS y "
        f"FROM {b} AS b0 WHERE rn = 0 "
        "UNION ALL SELECT user_id, 2 * rn + 1, 3 * x + nx, 3 * y + ny "
        f"FROM {b} AS b1 WHERE nx IS NOT NULL "
        "UNION ALL SELECT user_id, 2 * rn + 2, x + 3 * nx, y + 3 * ny "
        f"FROM {b} AS b2 WHERE nx IS NOT NULL "
        "UNION ALL SELECT user_id, 2 * rn + 1, 4 * x, 4 * y "
        f"FROM {b} AS b3 WHERE nx IS NULL)"
    )


def _chaikin_oracle() -> str:
    pts = (
        "(SELECT user_id, event_id AS ord, "
        f"{P.floor_scaled_sql(f'({_CH_LAT}) + 90.0', 6)} AS x, "
        f"{P.floor_scaled_sql(f'({_CH_LON}) + 180.0', 6)} AS y "
        "FROM events WHERE event_id % 5 = 0)"
    )
    r2 = _chaikin_round_oracle(_chaikin_round_oracle(pts))
    return (
        "SELECT user_id, cast(ord as bigint) AS ord, "
        "cast(x as bigint) AS x_e6x16, cast(y as bigint) AS y_e6x16 "
        f"FROM {r2} AS r2"
    )


@register("q_chaikin", _chaikin_oracle())
def q_chaikin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Chaikin corner-cutting rounds over each user's sampled movement
    polyline — trajectory smoothing before map display/matching. All
    arithmetic is exact bigints (the /4 per round is carried in the scale:
    output = e6 coordinates x16), so the refined curve hash-checks
    bit-for-bit. ONE window shuffle per round, ords derived from row
    numbers — no sorts, no Python."""
    from gaia_spark.operators.trajectory import chaikin_smooth

    pts = (
        load(spark, sf_dir, "events")
        .filter(F.expr("event_id % 5 = 0"))
        .select(
            "user_id",
            F.col("event_id").alias("ord"),
            F.expr(P.floor_scaled_sql(f"({_CH_LAT}) + 90.0", 6)).alias("x"),
            F.expr(P.floor_scaled_sql(f"({_CH_LON}) + 180.0", 6)).alias("y"),
        )
    )
    out = chaikin_smooth(pts, rounds=2, key="user_id", ord_col="ord", x="x", y="y")
    return out.select(
        "user_id",
        F.col("ord").cast("long").alias("ord"),
        F.col("x").cast("long").alias("x_e6x16"),
        F.col("y").cast("long").alias("y_e6x16"),
    )


# --- URL template mining -------------------------------------------------------

# denser URL fixture: 25 hosts, three path families (item pages with a
# per-doc id, category/page pairs with small cycling ids, one static page)
_TPL_URL = (
    "concat('https://s', cast(doc_id % 25 as string), '.example', "
    "CASE WHEN doc_id % 3 = 0 THEN concat('/p/', cast(doc_id as string), '/view') "
    "WHEN doc_id % 3 = 1 THEN concat('/cat/', cast(doc_id % 7 as string), "
    "'/page/', cast(doc_id % 13 as string)) "
    "ELSE '/about/team' END)"
)


def _tpl_oracle() -> str:
    tpl = W.url_template_sql("url", P.DUCK)
    return f"""
    WITH u AS (SELECT {_TPL_URL} AS url FROM documents),
    t AS (SELECT {W.host_sql('url')} AS host, {tpl} AS template,
                 {W.path_of_sql('url')} AS path FROM u),
    g AS (SELECT host, template, cast(count(*) as bigint) AS n_urls,
                 cast(count(distinct path) as bigint) AS n_paths
          FROM t GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY host
                 ORDER BY n_urls DESC, template) AS rk FROM g)
    SELECT host, template, n_urls, n_paths, cast(rk as int) AS rk
    FROM r WHERE rk <= 3
    """


@register("q_url_templates", _tpl_oracle())
def q_url_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL template mining: collapse digit runs in the path to '{{n}}',
    count URLs and distinct concrete paths per (host, template), keep each
    host's top-3 templates (deterministic count-then-name order) — the
    crawl-side structure-discovery pass that finds pagination/product
    patterns. One groupBy shuffle + one host-partitioned window over the
    already-small template table."""
    u = load(spark, sf_dir, "documents").select(F.expr(_TPL_URL).alias("url"))
    t = u.select(
        F.expr(W.host_sql("url")).alias("host"),
        F.expr(W.url_template_sql("url", P.SPARK)).alias("template"),
        F.expr(W.path_of_sql("url")).alias("path"),
    )
    g = t.groupBy("host", "template").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("path").alias("n_paths"),
    )
    w = Window.partitionBy("host").orderBy(F.desc("n_urls"), F.asc("template"))
    return (
        g.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("host", "template", "n_urls", "n_paths", F.col("rk").cast("int"))
    )
