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
