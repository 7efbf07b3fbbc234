"""Streaming-scale sketches: Count-Min frequency estimation and
HyperLogLog cardinality — the approximate-aggregation tier of a web-scale
pipeline (heavy-hitter detection over token streams, distinct-visitor
counts per host), built from scratch so they are ENGINE-DETERMINISTIC:
md5-derived hash functions and exact-integer registers make even the
"approximate" results bit-identical cross-engine and hash-checkable,
unlike Spark's built-in approx_count_distinct (whose HLL++ internals no
oracle can replay).

Role: `[R] SURVEY.md §2.D` distinct/approx-distinct family, the
scale-out members.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gaia_spark.functions import portable as P

# --- Count-Min ----------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket_sql(item: str, row: int, dialect: str, width: int = CMS_WIDTH) -> str:
    """Hash row ``row``'s bucket for ``item`` — shared with the oracle."""
    salted = f"'{row}:' || {item}"
    return f"({P.md5_int60(salted, dialect)} % {width})"


def count_min_sketch(
    items: DataFrame,
    item_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build a Count-Min sketch of item frequencies: ``depth`` md5-derived
    hash rows × ``width`` buckets. ONE explode + ONE combinable agg —
    sketch size is depth·width rows regardless of input scale (the whole
    point: a bounded-size summary mergeable across partitions/streams).
    Returns (row, bucket, cnt)."""
    rows = items.select(
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("row"),
        F.col(item_col).alias("_it"),
    )
    bucket = F.expr(
        "CASE "
        + " ".join(
            f"WHEN row = {j} THEN {cms_bucket_sql('_it', j, P.SPARK, width)}"
            for j in range(depth)
        )
        + " END"
    )
    return (
        rows.select("row", bucket.alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    query_col: str = "q",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch: est(q) = min over rows of the q-bucket
    count (the classic one-sided overestimate). The sketch is depth·width
    rows — broadcast side of the join by construction."""
    qb = queries.select(
        F.col(query_col).alias("q"),
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("row"),
    ).select(
        "q",
        "row",
        F.expr(
            "CASE "
            + " ".join(
                f"WHEN row = {j} THEN {cms_bucket_sql('q', j, P.SPARK, width)}"
                for j in range(depth)
            )
            + " END"
        ).alias("bucket"),
    )
    return (
        qb.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("q")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_est"))
    )


# --- HyperLogLog ----------------------------------------------------------------

HLL_B = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_B
HLL_BITS = 60 - HLL_B          # rank bits after the register index
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_rho_sql(hdiv: str, bits: int = HLL_BITS) -> str:
    """Position of the first 1-bit (from the LSB-side convention used
    here: rho = bits − floor(log2(h)) for h > 0, bits+1 for h = 0) as an
    UNROLLED integer-comparison CASE chain — no log2/float anywhere, so
    no libm boundary risk. Shared verbatim with the oracle."""
    arms = " ".join(
        f"WHEN ({hdiv}) >= {1 << (bits - k)} THEN {k}" for k in range(1, bits + 1)
    )
    return f"(CASE WHEN ({hdiv}) = 0 THEN {bits + 1} {arms} END)"


def hll_registers(
    items: DataFrame,
    item_col: str,
) -> DataFrame:
    """HLL register table: md5 hash → low b bits pick the register, the
    remaining bits' first-1 position is the rank; register value = max
    rank (max is order-independent — deterministic under any
    partitioning). Returns (reg, m_j), occupied registers only."""
    h = P.md5_int60(item_col, P.SPARK)
    return (
        items.select(
            F.expr(f"({h}) % {HLL_M}").alias("reg"),
            F.expr(hll_rho_sql(f"({h}) div {HLL_M}")).alias("_rho"),
        )
        .groupBy("reg")
        .agg(F.max("_rho").cast("long").alias("m_j"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Cardinality estimate from the register table. The harmonic sum is
    EXACT: each term 2^(bits+1−m_j) is an integer (m_j ≤ bits+1), empty
    registers contribute 2^(bits+1) — so Σ is one bigint and the raw
    estimate is a single IEEE division. Small-range (linear counting)
    correction applied per the original paper when E ≤ 2.5m and empty
    registers exist. Returns (n_registers_used, est_e2)."""
    top = HLL_BITS + 1
    agg = registers.agg(
        F.count("*").cast("long").alias("_used"),
        F.sum(F.expr(f"cast(pow(cast(2 as double), {top} - m_j) as bigint)"))
        .cast("long")
        .alias("_occ_sum"),
    )
    raw = (
        f"cast({HLL_ALPHA!r} as double) * {HLL_M} * {HLL_M} * pow(cast(2 as double), {top})"
        f" / cast(_occ_sum + ({HLL_M} - _used) * {1 << top} as double)"
    )
    est = (
        f"CASE WHEN ({raw}) <= cast({2.5 * HLL_M} as double) AND _used < {HLL_M}"
        f" THEN cast({HLL_M} as double) * ln(cast({HLL_M} as double)"
        f" / cast({HLL_M} - _used as double))"
        f" ELSE ({raw}) END"
    )
    return agg.select(
        F.col("_used").alias("n_registers_used"),
        F.expr(P.floor_scaled_sql(est, 2)).alias("est_e2"),
    )


# --- Bloom filter ---------------------------------------------------------------

BLOOM_WORDS = 4096  # 4096 words x 32 bits = 131,072 bits
BLOOM_K = 4


def bloom_pos_sql(item: str, j: str, dialect: str, n_words: int = BLOOM_WORDS) -> str:
    """Bit position of hash ``j`` for ``item`` in an ``n_words``×32-bit
    filter — md5-derived, shared with the oracle."""
    salted = f"'b' || cast({j} as string) || ':' || {item}"
    return f"({P.md5_int60(salted, dialect)} % {n_words * 32})"


def bloom_build(
    items: DataFrame,
    item_col: str,
    n_words: int = BLOOM_WORDS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Build a Bloom-filter membership sketch: ``k`` md5 hash positions per
    item OR-ed into 32-bit words. ONE in-plan explode + ONE combinable
    bit_or agg; the sketch is ≤ ``n_words`` rows — constant-size,
    mergeable (bit_or again), broadcastable. Words stay < 2³² (sign-safe
    bigints). Returns (word, bits)."""
    pos = bloom_pos_sql(item_col, "_j", P.SPARK, n_words)
    return (
        items.select(item_col)
        .withColumn("_j", F.explode(F.expr(f"sequence(0, {k - 1})")))
        .select(
            F.expr(P.idiv_sql(pos, 32)).alias("word"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(({pos}) % 32 as int))").alias("_m"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(_m)").cast("long").alias("bits"))
    )


def bloom_contains(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    n_words: int = BLOOM_WORDS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Probe the sketch: member ⟺ all ``k`` bits set (one-sided — false
    positives possible at the documented m/n rate, never false negatives;
    both engines see the identical deterministic bit pattern). The sketch
    rides as a broadcast. Returns the query rows + (n_hits, member)."""
    pos = bloom_pos_sql(item_col, "_j", P.SPARK, n_words)
    cols = queries.columns
    probe = (
        queries.withColumn("_j", F.explode(F.expr(f"sequence(0, {k - 1})")))
        .select(
            *cols,
            F.expr(P.idiv_sql(pos, 32)).alias("word"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(({pos}) % 32 as int))").alias("_m"),
        )
    )
    hit = F.when(
        F.col("bits").isNotNull()
        & (F.col("bits").bitwiseAND(F.col("_m")) == F.col("_m")),
        1,
    ).otherwise(0)
    return (
        probe.join(F.broadcast(sketch), "word", "left")
        .groupBy(*cols)
        .agg(F.sum(hit).cast("long").alias("n_hits"))
        .withColumn("member", (F.col("n_hits") == k).cast("int"))
    )


def kmv_mins(df: DataFrame, k: int, key_sql: str) -> DataFrame:
    """The KMV (k-minimum-values) sketch of a key expression: the k
    smallest DISTINCT md5-int60 hash values. ONE distinct-agg + an exact
    distributed top-k (TakeOrdered — never a full sort); output is k
    rows, broadcast-sized."""
    h = df.select(F.expr(P.md5_int60(key_sql, P.SPARK)).alias("h")).distinct()
    return h.orderBy(F.col("h").asc()).limit(k)


def kmv_overlap(mins_a: DataFrame, mins_b: DataFrame, k: int) -> DataFrame:
    """Distinct-cardinality and overlap estimation from two KMV sketches —
    the cross-shard dedup-rate estimator (how many documents do two
    corpus shards share?) that never joins the corpora: |D| ≈ (k−1)/θ
    with θ = k-th min / 2^60, the union sketch is the k smallest of the
    merged sketches, ρ = union-sketch members present in BOTH sketches,
    |A∩B| ≈ (ρ/k)·|A∪B| (Beyer et al. 2007).

    Everything derives from exact int60 hash values: θ picks are exact
    rank selections, ρ is an exact count, and each estimate is one
    shared IEEE expression floored to integers — hash-checkable. Sketches
    smaller than k fall back to their exact distinct count. Returns ONE
    row (k, n_a, n_b, est_a, est_b, est_union, rho, jaccard_e6,
    est_inter)."""
    a = mins_a.select(F.col("h").alias("ha"))
    b = mins_b.select(F.col("h").alias("hb"))
    u = (
        a.select(F.col("ha").alias("h"))
        .unionByName(b.select(F.col("hb").alias("h")))
        .distinct()
        .orderBy(F.col("h").asc())
        .limit(k)
    )
    marked = (
        u.join(F.broadcast(a), u["h"] == a["ha"], "left")
        .join(F.broadcast(b), u["h"] == b["hb"], "left")
        .select(
            "h",
            (F.col("ha").isNotNull() & F.col("hb").isNotNull())
            .cast("int")
            .alias("_both"),
        )
    )
    est = kmv_est_sql(k)

    def shard_est(mins, name):
        return mins.agg(
            F.count("*").cast("long").alias(f"n_{name}"),
            F.max("h").cast("long").alias("_kth"),
        ).select(
            f"n_{name}",
            F.expr(
                f"CASE WHEN n_{name} < {k} THEN cast(n_{name} as bigint) "
                f"ELSE cast({est} as bigint) END"
            ).alias(f"est_{name}"),
        )
    ua = shard_est(a.select(F.col("ha").alias("h")), "a")
    ub = shard_est(b.select(F.col("hb").alias("h")), "b")
    uu = marked.agg(
        F.count("*").cast("long").alias("n_u"),
        F.max("h").cast("long").alias("_kth"),
        F.sum("_both").cast("long").alias("rho"),
    ).select(
        "n_u", "rho",
        F.expr(
            f"CASE WHEN n_u < {k} THEN cast(n_u as bigint) "
            f"ELSE cast({est} as bigint) END"
        ).alias("est_union"),
    )
    jac = P.bigint_div("rho * 1000000", "n_u", P.SPARK)
    inter = P.bigint_div("rho * est_union", "n_u", P.SPARK)
    return (
        ua.crossJoin(F.broadcast(ub))
        .crossJoin(F.broadcast(uu))
        .select(
            F.lit(k).cast("long").alias("k"),
            "n_a", "n_b", "est_a", "est_b", "est_union", "rho",
            F.expr(f"CASE WHEN n_u > 0 THEN {jac} ELSE NULL END").alias(
                "jaccard_e6"
            ),
            F.expr(f"CASE WHEN n_u > 0 THEN {inter} ELSE NULL END").alias(
                "est_inter"
            ),
        )
    )


def kmv_est_sql(k: int) -> str:
    """(k−1)/θ distinct-count estimate over the exact bigint k-th minimum
    ``_kth`` — shared verbatim with the oracle."""
    return (
        f"floor(cast({k} - 1 as double) * cast({float(1 << 60)} as double)"
        " / cast(_kth as double))"
    )
