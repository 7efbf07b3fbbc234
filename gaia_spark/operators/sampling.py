"""Deterministic sampling for training-data mixes.

A 100-TB corpus is never trained on uniformly: the data mix assigns each
stratum (language, source, quality band) its own sampling rate. These
operators make row selection a PURE FUNCTION of (row identity, rate) via
an md5-hash threshold (:func:`portable.md5_int60` / 2^60 → uniform in
[0, 1)), so

- resampling is reproducible across runs AND engines (DuckDB replays the
  exact selection — the driver hash-checks the sampled rows themselves,
  not just their count);
- raising one stratum's rate only ADDS rows (the kept set at rate r is a
  subset of the kept set at rate r' > r) and never reshuffles another
  stratum's sample;
- the plan is a single filter over the scan — no shuffle, no RNG state,
  no seed plumbing to executors, trivially resumable.

``spark.sample()`` by contrast is seed-per-partition: the selection
changes whenever partitioning does, which is exactly what a resumable
100-TB pipeline cannot tolerate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gaia_spark.functions import portable as P

_U60 = float(1 << 60)


def _uniform_sql(key_col: str, salt: str, dialect: str) -> str:
    """U(key) in [0,1): md5-derived, identical in both engines. ``salt``
    decorrelates independent sampling decisions over the same keys."""
    keyed = f"concat('{salt}:', cast({key_col} as string))"
    return f"({P.md5_int60(keyed, dialect)} / {_U60!r})"


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = "s0"
) -> DataFrame:
    """Keep each row iff U(key) < fraction — deterministic Bernoulli."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(F.expr(f"{_uniform_sql(key_col, salt, P.SPARK)} < {fraction!r}"))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mix operator.

    ``rates``: stratum value → keep fraction. Strata not listed keep
    ``default_rate``. The rate map rides as a literal CASE expression in
    the filter (no join, no broadcast — a mix has tens of strata, not
    millions).
    """
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {v}")
    case = rate_case_sql(rates, strata_col, default_rate)
    return df.where(F.expr(f"{_uniform_sql(key_col, salt, P.SPARK)} < {case}"))


def rate_case_sql(rates: dict[str, float], strata_col: str, default_rate: float) -> str:
    """The stratum→rate CASE expression (dialect-neutral; shared with the
    DuckDB oracle so both engines evaluate the identical literal map)."""
    whens = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {float(v)!r}" for k, v in sorted(rates.items())
    )
    return f"(CASE {whens} ELSE {float(default_rate)!r} END)"


def dsir_logratio(
    target: DataFrame,
    pool: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every pool document
    by how target-like its hashed-bigram feature distribution is,

        w(doc) = Σ_grams [ ln p_target(bucket) − ln p_pool(bucket) ],

    with add-1 smoothing over the ``n_buckets`` hashed features. The two
    bucket-count tables are CONSTANT-size (n_buckets rows — broadcast, like
    the Bloom/CMS sketches), so scoring is one explode + one broadcast
    join + one combinable per-doc agg regardless of corpus size. Sampling
    the top of this score (or hash-thresholding against it) is the
    importance-resampling step; the weight itself is the operator.

    Determinism: one ln per gram occurrence of an exact rational
    ((ct+1)(Np+B)) / ((cp+1)(Nt+B)), e4-floored BEFORE the doc sum.
    Returns (id, n_grams, sum_lr_e4)."""
    from gaia_spark.functions.text import shingles_sql

    grams_sql = shingles_sql(text_col, P.SPARK, 2)
    b = f"({P.md5_int60('g', P.SPARK)} % {n_buckets})"

    def buckets(df, with_id: bool):
        cols = [F.col(id_col)] if with_id else []
        return df.select(
            *cols, F.explode(F.expr(grams_sql)).alias("g")
        ).select(*cols, F.expr(b).alias("_b"))

    ct = buckets(target, False).groupBy("_b").agg(
        F.count("*").cast("long").alias("_ct")
    )
    cp = buckets(pool, False).groupBy("_b").agg(
        F.count("*").cast("long").alias("_cp")
    )
    nt = ct.agg(F.sum("_ct").cast("long").alias("_nt"))
    np_ = cp.agg(F.sum("_cp").cast("long").alias("_np"))
    lr = (
        f"ln(cast(coalesce(_ct, 0) + 1 as double) * cast(_np + {n_buckets} as double) "
        f"/ (cast(coalesce(_cp, 0) + 1 as double) * cast(_nt + {n_buckets} as double)))"
    )
    return (
        buckets(pool, True)
        .join(F.broadcast(ct), "_b", "left")
        .join(F.broadcast(cp), "_b", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(np_))
        .withColumn("_lr_e4", F.expr(P.floor_scaled_sql(lr, 4)))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("_lr_e4").cast("long").alias("sum_lr_e4"),
        )
    )
