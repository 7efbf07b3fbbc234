"""Trajectory analytics over event streams: origin–destination flow
matrices and per-user movement statistics.

Role: the movement-analysis layer of the reference's analytics surface
(`[R] SURVEY.md §2.G window analytics` + `§2.E cell encode`) — given a
georeferenced event stream, aggregate WHERE users move (flows between
grid cells) and HOW FAR (leg distances along each user's timeline).

Scale shape (100 TB): everything hangs off ONE window shuffle partitioned
by user — lag() gives the previous position, then either a cell-pair
groupBy (flows; second, much smaller shuffle on the flow matrix whose
cardinality is bounded by cells², not events) or a per-user agg that
reuses the SAME (user) partitioning, so AQE coalesces without a second
exchange. No Python, no self-join of the events table (the naive
"join events to next event" doubles the scan and shuffles twice). A
power-user with millions of events bounds a single partition — at cluster
scale, salt the user key into (user, day) windows if one user's history
exceeds an executor; flows are then exact, trip stats per-day partials.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from gaia_spark.functions import portable as P


def with_prev_point(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Attach the previous event's (lat, lon) along each user's timeline.
    Order is (ts, tiebreak) — deterministic under timestamp ties, which an
    oracle comparison requires. First event per user gets NULL prevs."""
    for out in ("prev_lat", "prev_lon"):
        if out in df.columns:
            raise ValueError(f"column '{out}' already present; rename it first")
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    return df.withColumn("prev_lat", F.lag(lat).over(w)).withColumn(
        "prev_lon", F.lag(lon).over(w)
    )


def od_flows(
    df: DataFrame,
    res: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Origin–destination flow matrix: count of consecutive-event
    transitions between grid cells at ``res`` (self-loops included — they
    are the stay signal). Returns (cell_from, cell_to, n_trips)."""
    d = with_prev_point(df, user_col, ts_col, tiebreak_col, lat, lon)
    d = d.where(F.col("prev_lat").isNotNull())
    return (
        d.select(
            F.expr(P.cell_id_sql("prev_lat", "prev_lon", res)).alias("cell_from"),
            F.expr(P.cell_id_sql(lat, lon, res)).alias("cell_to"),
        )
        .groupBy("cell_from", "cell_to")
        .agg(F.count("*").alias("n_trips"))
    )


def trip_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Per-user movement summary over consecutive-event legs: leg count,
    total and maximum great-circle leg length (fixed-point mm via e3 —
    floor-scaled so both engines integerize identical doubles). Users with
    a single event surface with n_legs = 0 and zero distances."""
    d = with_prev_point(df, user_col, ts_col, tiebreak_col, lat, lon)
    leg = P.haversine_m_sql("prev_lat", "prev_lon", lat, lon)
    legs = d.withColumn(
        "leg_m", F.when(F.col("prev_lat").isNotNull(), F.expr(leg)).otherwise(None)
    )
    return legs.groupBy(user_col).agg(
        F.count("leg_m").cast("long").alias("n_legs"),
        F.expr(P.floor_scaled_sql("coalesce(sum(leg_m), cast(0 as double))", 3)).alias(
            "total_m_e3"
        ),
        F.expr(P.floor_scaled_sql("coalesce(max(leg_m), cast(0 as double))", 3)).alias(
            "max_leg_m_e3"
        ),
    )


def stay_points(
    df: DataFrame,
    dist_m: float,
    min_points: int = 2,
    min_dur_s: int = 0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Stay-point detection (Li et al. 2008 simplified to the SQL-exact
    gaps-and-islands form): a stay is a maximal run of consecutive events
    where every leg is shorter than ``dist_m``; stays shorter than
    ``min_points`` events or ``min_dur_s`` seconds are dropped.

    Role: the reference's movement-segmentation analysis (`[R] SURVEY.md
    §2.G window analytics`) — turns a raw event timeline into dwell
    episodes (place visits) with duration and centroid, the input to
    place-mining / home-detection pipelines.

    Scale shape (100 TB): ONE user-partitioned window shuffle computes
    the previous point, the new-stay flag, and the running stay number;
    the per-(user, stay) aggregation reuses the same partitioning (AQE
    coalesces without a second exchange). The centroid is an exact
    bigint mean of offset-e4 fixed-point coordinates — order-free, so
    partial aggregation never perturbs the hash.

    Returns (user, stay_no, n_points, dur_s, clat_e4, clon_e4).
    """
    d = with_prev_point(df, user_col, ts_col, tiebreak_col, lat, lon)
    leg = P.haversine_m_sql("prev_lat", "prev_lon", lat, lon)
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    g = d.withColumn(
        "new_stay",
        F.when(
            F.col("prev_lat").isNotNull() & (F.expr(leg) < float(dist_m)), 0
        ).otherwise(1),
    ).withColumn("stay_no", F.sum("new_stay").over(cum).cast("long"))
    # offset to non-negative before fixed-pointing: bigint_div floors in
    # DuckDB but truncates in Spark, identical only for non-negative sums
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    agg = g.groupBy(user_col, "stay_no").agg(
        F.count("*").cast("long").alias("n_points"),
        F.floor(F.max(epoch) - F.min(epoch)).cast("long").alias("dur_s"),
        F.expr(
            P.bigint_div(
                f"sum({P.floor_scaled_sql(f'({lat} + 90.0)', 4)})",
                "count(*)",
                P.SPARK,
            )
        ).alias("_olat"),
        F.expr(
            P.bigint_div(
                f"sum({P.floor_scaled_sql(f'({lon} + 180.0)', 4)})",
                "count(*)",
                P.SPARK,
            )
        ).alias("_olon"),
    )
    return (
        agg.where((F.col("n_points") >= min_points) & (F.col("dur_s") >= min_dur_s))
        .withColumn("clat_e4", (F.col("_olat") - 900000).cast("long"))
        .withColumn("clon_e4", (F.col("_olon") - 1800000).cast("long"))
        .drop("_olat", "_olon")
    )


def hausdorff_distance(
    points: DataFrame,
    pairs: DataFrame,
    traj_col: str = "traj_id",
    key_col: str = "pt_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Symmetric Hausdorff distance between trajectory pairs — the standard
    trajectory-similarity measure (`[R] SURVEY.md §2.C DistanceProcess`
    family lifted from point layers to point SETS): h(A,B) = max over a of
    min over b of d(a,b); H(A,B) = max(h(A,B), h(B,A)).

    ``points`` holds (traj_id, pt_id, lat, lon); ``pairs`` holds
    (pair_id, a, b) naming the two trajectories to compare. Returns
    (pair_id, h_ab_m_e3, h_ba_m_e3, hausdorff_m_e3).

    Scale shape: the cross product is scoped PER PAIR by the pair_id
    equi-join (never corpus-wide all-pairs), so cost is Σ_pairs |A|·|B|
    — the exact-semantics price of Hausdorff. Both directed maxima come
    from the same joined relation via two combinable min/max aggregate
    chains. A trajectory pair must jointly fit a shuffle partition
    (~10^4 points each is fine); beyond that, prefilter candidates with
    a cell-cover near join and compute the exact max-min only on
    boundary cells — the documented scale path, not implemented here.

    Engine-determinism: each pairwise haversine quantizes to e3-mm
    fixed-point bigint BEFORE min/max, so the nested extrema are exact
    integer comparisons — bit-identical in any engine or partitioning."""
    d_sql = P.floor_scaled_sql(
        P.haversine_m_sql("alat", "alon", "blat", "blon"), 3
    )
    pa = pairs.join(
        points.select(
            F.col(traj_col).alias("a"),
            F.col(key_col).alias("apid"),
            F.col(lat).alias("alat"),
            F.col(lon).alias("alon"),
        ),
        "a",
    ).select("pair_id", "apid", "alat", "alon")
    pb = pairs.join(
        points.select(
            F.col(traj_col).alias("b"),
            F.col(key_col).alias("bpid"),
            F.col(lat).alias("blat"),
            F.col(lon).alias("blon"),
        ),
        "b",
    ).select("pair_id", "bpid", "blat", "blon")
    d = pa.join(pb, "pair_id").select(
        "pair_id", "apid", "bpid", F.expr(d_sql).alias("d_e3")
    )
    h_ab = (
        d.groupBy("pair_id", "apid")
        .agg(F.min("d_e3").alias("_m"))
        .groupBy("pair_id")
        .agg(F.max("_m").cast("long").alias("h_ab_m_e3"))
    )
    h_ba = (
        d.groupBy("pair_id", "bpid")
        .agg(F.min("d_e3").alias("_m"))
        .groupBy("pair_id")
        .agg(F.max("_m").cast("long").alias("h_ba_m_e3"))
    )
    return h_ab.join(h_ba, "pair_id").select(
        "pair_id",
        "h_ab_m_e3",
        "h_ba_m_e3",
        F.greatest("h_ab_m_e3", "h_ba_m_e3").alias("hausdorff_m_e3"),
    )


def frechet_distance(
    points: DataFrame,
    pairs: DataFrame,
    traj_col: str = "traj_id",
    order_col: str = "seq",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Discrete Fréchet distance between trajectory pairs (Eiter-Mannila
    1994 coupling DP) — the ORDER-AWARE sibling of
    :func:`hausdorff_distance`: the minimal leash length walking both
    polylines monotonically, so out-and-back routes that Hausdorff calls
    identical are told apart.

    ``points`` holds (traj_id, seq, lat, lon); ``pairs`` holds
    (pair_id, a, b). Returns (pair_id, n_a, n_b, frechet_m_e3).

    Scale shape: the |A|×|B| DP grid is inherently sequential along
    antidiagonals, so it runs as ONE Arrow-batched applyInPandas task per
    pair (int64 DP; the sequential inner recurrence makes ~10^3-point
    trajectories the comfortable per-task bound — downsample or
    Douglas-Peucker-simplify longer ones first); pair GROUPS distribute
    perfectly. This is the
    documented (b)-tier custom operator: composition can't express the
    recurrence without O(n+m) chained shuffles.

    Engine-determinism: every pairwise haversine quantizes to e3-mm
    fixed-point bigint BEFORE the DP, whose max/min recurrence is exact
    integer arithmetic — the DuckDB oracle replays the SAME ints with an
    antidiagonal recursive CTE, so even this Python-kernel operator is
    hash-checked, not rows-only."""
    d_sql = P.floor_scaled_sql(
        P.haversine_m_sql("alat", "alon", "blat", "blon"), 3
    )
    pa = pairs.join(
        points.select(
            F.col(traj_col).alias("a"),
            F.col(order_col).alias("ai"),
            F.col(lat).alias("alat"),
            F.col(lon).alias("alon"),
        ),
        "a",
    ).select("pair_id", "ai", "alat", "alon")
    pb = pairs.join(
        points.select(
            F.col(traj_col).alias("b"),
            F.col(order_col).alias("bi"),
            F.col(lat).alias("blat"),
            F.col(lon).alias("blon"),
        ),
        "b",
    ).select("pair_id", "bi", "blat", "blon")
    d = pa.join(pb, "pair_id").select(
        "pair_id", "ai", "bi", F.expr(d_sql).alias("d_e3")
    )
    ptype = d.schema["pair_id"].dataType.simpleString()
    schema = f"pair_id {ptype}, n_a long, n_b long, frechet_m_e3 long"

    def dp(key, pdf):
        import numpy as np
        import pandas as pd

        ai = np.sort(pdf["ai"].unique())
        bi = np.sort(pdf["bi"].unique())
        n, m = len(ai), len(bi)
        grid = np.full((n, m), np.iinfo(np.int64).max, dtype=np.int64)
        grid[
            np.searchsorted(ai, pdf["ai"].to_numpy()),
            np.searchsorted(bi, pdf["bi"].to_numpy()),
        ] = pdf["d_e3"].to_numpy(dtype=np.int64)
        c = np.empty((n, m), dtype=np.int64)
        c[0, 0] = grid[0, 0]
        for i in range(1, n):
            c[i, 0] = max(c[i - 1, 0], grid[i, 0])
        for j in range(1, m):
            c[0, j] = max(c[0, j - 1], grid[0, j])
        for i in range(1, n):
            prev, cur = c[i - 1], c[i]
            for j in range(1, m):
                cur[j] = max(min(prev[j], cur[j - 1], prev[j - 1]), grid[i, j])
        return pd.DataFrame(
            {"pair_id": [key[0]], "n_a": [n], "n_b": [m],
             "frechet_m_e3": [int(c[n - 1, m - 1])]}
        )

    return d.groupBy("pair_id").applyInPandas(dp, schema)


def ipf_step_sql(m_e12: str, target: str, s_e12: str) -> str:
    """One IPF scaling of an e12 fixed-point flow: value·target/rowsum,
    re-quantized to e12 — shared verbatim with the oracle. ``target`` is
    a natural-units double, ``m_e12``/``s_e12`` exact e12 bigints; the
    whole step is one fixed IEEE operation tree over exact integers, so
    both engines produce the identical bigint."""
    return (
        f"cast(floor(cast({m_e12} as double) * ({target})"
        f" * cast(1000000000000 as double) / cast({s_e12} as double)"
        f" + cast(0.5 as double)) as bigint)"
    )


def ipf_balance(
    od: DataFrame,
    row_targets: DataFrame,
    col_targets: DataFrame,
    rounds: int = 3,
    from_col: str = "cell_from",
    to_col: str = "cell_to",
    flow_col: str = "n_trips",
) -> DataFrame:
    """Iterative proportional fitting (Furness balancing) of an OD matrix
    to target margins — the trip-distribution workhorse (gravity-model
    calibration, census raking): alternately scale rows to
    ``row_targets`` (from_key, r) and columns to ``col_targets``
    (to_key, c) for ``rounds`` rounds.

    Scale shape (10^12-cell OD matrices): each half-round is ONE
    combinable margin aggregate + ONE key equi-join (margins broadcast —
    they are zone-sized, the matrix is zone²-sized); lineage is cut per
    round. The classic pagerank shape, alternating axes.

    Engine-determinism: flows live as e12 fixed-point BIGINTS between
    half-rounds — margin sums are exact integer aggregation
    (order-independent), and each scaling is one fixed IEEE expression
    over exact ints (:func:`ipf_step_sql`), so every intermediate matrix
    is bit-identical cross-engine. Returns (from, to, flow_e6)."""
    from gaia_spark.session import iter_checkpoint

    m = od.select(
        F.col(from_col).alias("_f"),
        F.col(to_col).alias("_t"),
        (F.col(flow_col).cast("double") * 1_000_000_000_000)
        .cast("long")
        .alias("m_e12"),
    )
    rt = row_targets.select(
        F.col(from_col).alias("_f"), F.col("r").cast("double").alias("_r")
    )
    ct = col_targets.select(
        F.col(to_col).alias("_t"), F.col("c").cast("double").alias("_c")
    )
    for _ in range(rounds):
        s = m.groupBy("_f").agg(F.sum("m_e12").cast("long").alias("s_e12"))
        m = (
            m.join(s, "_f")
            .join(F.broadcast(rt), "_f")
            .select(
                "_f", "_t", F.expr(ipf_step_sql("m_e12", "_r", "s_e12")).alias("m_e12")
            )
        )
        s2 = m.groupBy("_t").agg(F.sum("m_e12").cast("long").alias("s_e12"))
        m = (
            m.join(s2, "_t")
            .join(F.broadcast(ct), "_t")
            .select(
                "_f", "_t", F.expr(ipf_step_sql("m_e12", "_c", "s_e12")).alias("m_e12")
            )
        )
        m = iter_checkpoint(m)
    return m.select(
        F.col("_f").alias(from_col),
        F.col("_t").alias(to_col),
        F.expr(P.bigint_div("m_e12", "1000000", P.SPARK)).alias("flow_e6"),
    )


def directional_mean(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Per-user directional mean of movement bearings (circular statistics;
    the ArcGIS Linear Directional Mean role): mean azimuth
    atan2(Σsin θ, Σcos θ) over each user's consecutive-event legs, plus
    the resultant length R = |Σe^{iθ}|/n in [0,1] (1 = perfectly aligned
    travel, 0 = directionless).

    Same ONE-window shape as :func:`trip_stats`. The sin/cos components
    quantize to e6 bigints BEFORE the per-user sums (float summation is
    order-dependent; exact integer aggregation is not), and the mean
    bearing / R derive from the two exact sums by one shared IEEE
    expression each. Returns (user, n_legs, mean_bearing_e4, r_e6);
    users with no legs are dropped, legs of zero length contribute
    bearing 0 (the shared formula's atan2(0, cos0) branch)."""
    d = with_prev_point(df, user_col, ts_col, tiebreak_col, lat, lon)
    theta = (
        f"radians({P.bearing_deg_sql('prev_lat', 'prev_lon', lat, lon)})"
    )
    legs = d.where(F.col("prev_lat").isNotNull()).select(
        F.col(user_col),
        F.expr(P.floor_scaled_sql(f"sin({theta})", 6)).alias("_s"),
        F.expr(P.floor_scaled_sql(f"cos({theta})", 6)).alias("_c"),
    )
    mean_b = P.pos_mod_sql(
        "degrees(atan2(cast(_ss as double), cast(_sc as double)))", 360.0
    )
    r = (
        "sqrt(cast(_ss as double) * cast(_ss as double)"
        " + cast(_sc as double) * cast(_sc as double))"
        " / (cast(1000000 as double) * cast(n_legs as double))"
    )
    return (
        legs.groupBy(user_col)
        .agg(
            F.count("*").cast("long").alias("n_legs"),
            F.sum("_s").cast("long").alias("_ss"),
            F.sum("_c").cast("long").alias("_sc"),
        )
        .select(
            user_col,
            "n_legs",
            F.expr(P.floor_scaled_sql(mean_b, 4)).alias("mean_bearing_e4"),
            F.expr(P.floor_scaled_sql(r, 6)).alias("r_e6"),
        )
    )


def chaikin_round(
    df: DataFrame,
    key: str = "user_id",
    ord_col: str = "ord",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """ONE Chaikin corner-cutting round over integer polyline vertices.

    Input: one row per vertex, ``(key, ord, x, y)`` with x/y exact-bigint
    fixed-point coordinates; output: the refined open polyline with 2n
    vertices whose coordinates are exact bigints at 4x the input scale
    (q = 3a + b, r = a + 3b — the division by 4 is carried in the scale so
    no precision is ever lost and both engines agree bit-for-bit).
    Endpoints are retained (open-curve Chaikin), emitted at 4x scale.

    Scale shape (100 TB): ONE window shuffle per round (partition by the
    trajectory key), then a narrow inline-explode — output ords are
    computed from the row number so no second shuffle or sort is needed,
    and round k+1 reuses the same key partitioning (AQE coalesces the
    exchange). No Python anywhere.
    """
    w = Window.partitionBy(key).orderBy(ord_col)
    d = (
        df.withColumn("_rn", F.row_number().over(w) - 1)
        .withColumn("_nx", F.lead(x).over(w))
        .withColumn("_ny", F.lead(y).over(w))
    )
    start = F.array(
        F.struct(
            F.lit(0).cast("long").alias("o"),
            (F.col(x) * 4).alias("px"),
            (F.col(y) * 4).alias("py"),
        )
    )
    legs = F.array(
        F.struct(
            (F.col("_rn") * 2 + 1).cast("long").alias("o"),
            (F.col(x) * 3 + F.col("_nx")).alias("px"),
            (F.col(y) * 3 + F.col("_ny")).alias("py"),
        ),
        F.struct(
            (F.col("_rn") * 2 + 2).cast("long").alias("o"),
            (F.col(x) + F.col("_nx") * 3).alias("px"),
            (F.col(y) + F.col("_ny") * 3).alias("py"),
        ),
    )
    endp = F.array(
        F.struct(
            (F.col("_rn") * 2 + 1).cast("long").alias("o"),
            (F.col(x) * 4).alias("px"),
            (F.col(y) * 4).alias("py"),
        )
    )
    # typed empty array via zero-length slice (F.array() alone is untyped)
    arr = F.concat(
        F.when(F.col("_rn") == 0, start).otherwise(F.slice(start, 1, 0)),
        F.when(F.col("_nx").isNotNull(), legs).otherwise(endp),
    )
    out = d.select(key, F.inline(arr))
    return out.select(
        F.col(key), F.col("o").alias(ord_col), F.col("px").alias(x), F.col("py").alias(y)
    )


def chaikin_smooth(df: DataFrame, rounds: int = 2, **kw) -> DataFrame:
    """`rounds` Chaikin refinement rounds; output coordinates carry a
    4^rounds scale factor (exact bigints, no division)."""
    for _ in range(rounds):
        df = chaikin_round(df, **kw)
    return df


def map_match(
    points: DataFrame,
    roads: DataFrame,
    n_cand: int = 3,
    switch_penalty_e3: int = 50_000_000,
    user_col: str = "user_id",
    seq_col: str = "seq",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """HMM map matching (Newson-Krumm shape, deterministic costs): snap
    each noisy trajectory point to the road network by Viterbi decoding
    over a per-point candidate lattice.

    ``points``: (user, seq, lat, lon); ``roads``: (road_id, y1, x1, y2,
    x2) single-segment polylines. Per point the ``n_cand`` nearest roads
    (clamped snap projection, mm-quantized distance, road-id tie-break)
    become lattice states; the path cost is

        Σ emission  (point→candidate snap distance, e3 int)
      + Σ transition (0 when the road is kept, else switch_penalty +
                      gap between the consecutive PROJECTED points, e3
                      int from the e6-quantized projections)

    and the decoded path is the exact integer-cost argmin with a total
    deterministic tie-break: every DP state carries (cost, zero-padded
    path string) and minimizes the PAIR, so equal-cost paths resolve
    identically in any engine or partition order.

    Scale shape (100 TB): the road network is broadcast (candidate
    generation = one broadcast join + a per-point top-k aggregation; swap
    in snap_to_lines' cell scatter when the network outgrows a broadcast);
    transitions (n_cand² per step) come from a lag() pairing of
    consecutive candidate arrays — no self-join; the whole operator is
    ONE user-keyed exchange, and the Viterbi recurrence — sequential in
    seq by nature — runs as ONE user-bucketed Arrow stage over pure
    int64/str state (the same (b)-tier shape as frechet_distance, with
    the same ~10^3-points-per-task comfort bound). NO trig in Python:
    every distance is pre-quantized by the shared SQL formulas.
    """
    t_sql = __import__(
        "gaia_spark.operators.snap", fromlist=["snap_t_sql"]
    ).snap_t_sql(lat, lon, "y1", "x1", "y2", "x2")
    from gaia_spark.operators.snap import snap_point_sql

    sy, sx = snap_point_sql("_t", "y1", "x1", "y2", "x2")
    cand = (
        points.crossJoin(F.broadcast(roads))
        .withColumn("_t", F.expr(t_sql))
        .withColumn("_sy", F.expr(sy))
        .withColumn("_sx", F.expr(sx))
        .select(
            F.col(user_col).alias("user_id"),
            F.col(seq_col).alias("seq"),
            "road_id",
            F.expr(
                P.floor_scaled_sql(P.haversine_m_sql(lat, lon, "_sy", "_sx"), 3)
            ).alias("emis_e3"),
            F.expr(P.floor_scaled_sql("_sy", 6)).alias("plat_e6"),
            F.expr(P.floor_scaled_sql("_sx", 6)).alias("plon_e6"),
        )
    )
    # per-point top-n_cand by (emis, road_id): ONE hash aggregation with
    # an O(m log m) in-group sort of the ≤|roads| candidate structs —
    # replaces the row_number window, whose global per-partition sort of
    # the full (points × roads) candidate table was the single largest
    # stage of the operator (same ranking: array_sort orders
    # struct-lexicographically by (emis_e3, road_id, …), and (plat, plon)
    # are functions of road_id so they never affect the order).
    #
    # The whole operator is ONE exchange: candidates are hash-partitioned
    # by user_id up front (explicit numPartitions ⇒ not AQE-coalesced, the
    # round-5 forced-fanout lesson); hash(user_id) satisfies the
    # (user_id, seq) aggregation's clustering AND the lag window's
    # user partitioning AND the DP's per-user colocation, so the
    # aggregate, the window, the lattice/transition explode and the
    # mapInPandas DP all run shuffle-free on that single partitioning.
    # Transitions come from a lag() pairing of consecutive candidate
    # arrays — the former lattice self-join (plus the localCheckpoint
    # that materialized the lattice for its three consumers) is gone;
    # the candidate cross join is computed exactly once either way.
    n_part = int(points.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    topk = (
        cand.repartition(n_part, "user_id")
        .groupBy("user_id", "seq")
        .agg(
            F.expr(
                f"slice(array_sort(collect_list(struct(emis_e3, road_id, "
                f"plat_e6, plon_e6))), 1, {int(n_cand)})"
            ).alias("_top")
        )
    )
    w = Window.partitionBy("user_id").orderBy("seq")
    paired = topk.select(
        "user_id",
        "seq",
        "_top",
        F.lag("_top").over(w).alias("_prev"),
        F.lag("seq").over(w).alias("_pseq"),
    )
    # identical float algebra to the former self-join: e6-int projections
    # re-floated as cast(x as double) / cast(1000000 as double)
    gap = P.haversine_m_sql(
        "(cast(a.plat_e6 as double) / cast(1000000 as double))",
        "(cast(a.plon_e6 as double) / cast(1000000 as double))",
        "(cast(b.plat_e6 as double) / cast(1000000 as double))",
        "(cast(b.plon_e6 as double) / cast(1000000 as double))",
    )
    # lattice rows (tag 0): one per candidate, k = 1-based rank
    lattice_rows = (
        "transform(_top, (b, j) -> struct("
        "cast(seq as bigint) as seq, cast(j + 1 as bigint) as _x1, "
        "cast(b.road_id as bigint) as _x2, cast(b.emis_e3 as bigint) as _x3, "
        "0 as _tag))"
    )
    # transition rows (tag 1), keyed by the EARLIER seq, only for
    # consecutive seq values (a gap emits nothing, so the DP's loud
    # missing-transition error is preserved); the zero-length slice is a
    # typed empty array of the same struct type as _prev
    trans_rows = (
        "flatten(transform("
        "CASE WHEN _pseq = seq - 1 THEN _prev ELSE slice(_top, 1, 0) END, "
        "(a, i) -> transform(_top, (b, j) -> struct("
        "cast(seq - 1 as bigint) as seq, cast(i + 1 as bigint) as _x1, "
        "cast(j + 1 as bigint) as _x2, "
        f"CASE WHEN a.road_id = b.road_id THEN cast(0 as bigint) "
        f"ELSE {switch_penalty_e3} + {P.floor_scaled_sql(gap, 3)} END as _x3, "
        "1 as _tag))))"
    )

    utype = points.schema[user_col].dataType.simpleString()
    schema = (
        f"user_id {utype}, seq long, road_id long, emis_e3 long, "
        "total_cost_e3 long"
    )

    def _viterbi_user(uid, lat_arr, tr_arr):
        # plain python-int rows from numpy arrays — per-tiny-group pandas
        # ops (groupby/sort_values/itertuples) cost ~8x more than the
        # whole DP (measured 13.5 s vs 1.7 s over 1500 sf0.1 trajectories)
        import numpy as np

        arr = lat_arr[np.lexsort((lat_arr[:, 1], lat_arr[:, 0]))]
        tr = {}
        for s_, ka_, kb_, c_ in tr_arr.tolist():
            tr[(s_, ka_, kb_)] = c_
        by_step: dict = {}
        emis = {}
        for s_, k_, rd_, e_ in arr.tolist():
            if not (0 <= rd_ < 1000):
                # ADVICE r5: the deterministic tie-break pads road ids to
                # width 3 on BOTH engines (python f"{:03d}" vs the
                # oracle's lpad(..., 3, '0')); DuckDB's lpad TRUNCATES
                # wider ids while python does not, so ids outside [0, 999]
                # would silently diverge the engines' tie-breaks — the id
                # domain is an explicit contract, enforced loudly
                raise ValueError(
                    f"map_match: road_id {rd_} outside the documented "
                    "[0, 1000) tie-break padding domain — widen the pad "
                    "(both engines) before using larger road networks"
                )
            by_step.setdefault(s_, []).append((k_, rd_, e_))
            emis[(s_, rd_)] = e_
        seqs = sorted(by_step)
        # state per k: (cost, path string of zero-padded road ids)
        state = {
            k_: (e_, f"{rd_:03d}") for k_, rd_, e_ in by_step[seqs[0]]
        }
        for prev_s, s in zip(seqs, seqs[1:]):
            nxt = {}
            for kb, road_b, e_b in by_step[s]:
                best = None
                for ka, (c_a, p_a) in state.items():
                    tc = tr.get((prev_s, ka, kb))
                    if tc is None:
                        # ADVICE r5: a gap in seq (transitions join seq to
                        # seq-1) must fail loudly, not as an opaque KeyError
                        raise ValueError(
                            f"map_match: no transition for seq {prev_s}->{s} "
                            f"(ka={ka}, kb={kb}) — seq values must be "
                            "consecutive per trajectory; densify with "
                            "row_number first"
                        )
                    c = c_a + tc + e_b
                    cand_state = (c, p_a + "|" + f"{road_b:03d}")
                    if best is None or cand_state < best:
                        best = cand_state
                nxt[kb] = best
            state = nxt
        total, path = min(state.values())
        rows = []
        for i, tok in enumerate(path.split("|")):
            road = int(tok)
            s = seqs[i]
            rows.append((uid, int(s), road, emis[(s, road)], int(total)))
        return rows

    def run(batches):
        import numpy as np
        import pandas as pd

        chunks = list(batches)
        if not chunks:
            return
        full = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        if not len(full):
            return
        uids = full["user_id"].to_numpy()
        arr = full[["seq", "_x1", "_x2", "_x3", "_tag"]].to_numpy(dtype=np.int64)
        order = np.argsort(uids, kind="stable")
        uids_s, arr_s = uids[order], arr[order]
        bounds = np.flatnonzero(
            np.r_[True, uids_s[1:] != uids_s[:-1]]
        ).tolist() + [len(uids_s)]
        out = []
        for start, end in zip(bounds, bounds[1:]):
            g = arr_s[start:end]
            uid = uids_s[start]
            uid = uid.item() if hasattr(uid, "item") else uid
            out.extend(
                _viterbi_user(uid, g[g[:, 4] == 0][:, :4], g[g[:, 4] == 1][:, :4])
            )
        yield pd.DataFrame(
            out, columns=["user_id", "seq", "road_id", "emis_e3", "total_cost_e3"]
        )

    # ONE Python stage over the user-bucketed partitions established up
    # front: each mapInPandas task decodes ALL its users from one numpy
    # conversion (per-TASK Arrow overhead, not per-trajectory — the
    # per-group cogroup overhead ran ~16k times per bench run).
    rows = paired.select(
        "user_id", F.expr(f"inline(concat({lattice_rows}, {trans_rows}))")
    )
    return rows.mapInPandas(run, schema)
