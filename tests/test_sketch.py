"""Count-Min + HyperLogLog: the sketch guarantees as properties —
one-sided CMS overestimation, HLL linear-counting exactness on small
sets, bounded relative error at scale, and exact partitioning
invariance of both (md5 hashing + integer registers)."""

import math

import pyspark.sql.functions as F

from gaia_spark.operators.sketch import (
    HLL_M,
    cms_estimate,
    count_min_sketch,
    hll_estimate,
    hll_registers,
)


def _words(spark, rows):
    return spark.createDataFrame([(w,) for w in rows], "w string")


def test_cms_overestimates_never_under(spark):
    corpus = [f"w{i % 50}" for i in range(1000)] + ["rare"] * 3
    df = _words(spark, corpus)
    sketch = count_min_sketch(df, "w")
    qs = df.select("w").distinct().withColumnRenamed("w", "q")
    est = {r.q: r.cms_est for r in cms_estimate(sketch, qs).collect()}
    true = {r.q: r.cnt for r in df.groupBy(F.col("w").alias("q")).agg(F.count("*").alias("cnt")).collect()}
    assert set(est) == set(true)
    for q, t in true.items():
        assert est[q] >= t, (q, est[q], t)


def test_cms_exact_when_sparse(spark):
    # 5 items in a 4x256 sketch: collisions in ALL 4 rows are overwhelmingly
    # unlikely; with this fixed md5 hash family the estimates are exact
    df = _words(spark, ["a"] * 7 + ["b"] * 3 + ["c", "d", "e"])
    sketch = count_min_sketch(df, "w")
    qs = df.select("w").distinct().withColumnRenamed("w", "q")
    est = {r.q: r.cms_est for r in cms_estimate(sketch, qs).collect()}
    assert est == {"a": 7, "b": 3, "c": 1, "d": 1, "e": 1}


def test_cms_unknown_item_zero(spark):
    df = _words(spark, ["x"] * 4)
    sketch = count_min_sketch(df, "w")
    qs = _words(spark, ["never-seen"]).withColumnRenamed("w", "q")
    est = cms_estimate(sketch, qs).collect()[0]
    assert est.cms_est == 0  # empty buckets coalesce to 0


def test_cms_partitioning_invariance(spark):
    df = _words(spark, [f"t{i % 97}" for i in range(2000)])
    a = sorted(map(tuple, count_min_sketch(df, "w").collect()))
    b = sorted(map(tuple, count_min_sketch(df.repartition(13), "w").collect()))
    assert a == b


def test_hll_linear_counting_small_set(spark):
    # far below 2.5m: the linear-counting branch fires and is a closed
    # form of the used-register count
    df = _words(spark, [f"u{i}" for i in range(30)] * 5)
    regs = hll_registers(df, "w")
    out = hll_estimate(regs).collect()[0]
    used = out.n_registers_used
    expected = HLL_M * math.log(HLL_M / (HLL_M - used))
    assert out.est_e2 == int(math.floor(expected * 100 + 0.5))
    # with 30 distinct values, 28-30 registers are typically occupied
    assert 20 <= used <= 30


def test_hll_relative_error_at_scale(spark):
    n = 5000
    df = _words(spark, [f"user-{i}" for i in range(n)])
    out = hll_estimate(hll_registers(df, "w")).collect()[0]
    est = out.est_e2 / 100.0
    assert abs(est - n) / n < 0.10  # 1.04/sqrt(256) = 6.5% expected
    # duplicates change nothing: registers are max-aggregated
    df2 = _words(spark, [f"user-{i}" for i in range(n)] * 2)
    out2 = hll_estimate(hll_registers(df2, "w")).collect()[0]
    assert (out2.n_registers_used, out2.est_e2) == (out.n_registers_used, out.est_e2)


def test_hll_partitioning_invariance(spark):
    df = _words(spark, [f"k{i % 333}" for i in range(999)])
    a = hll_estimate(hll_registers(df, "w")).collect()[0]
    b = hll_estimate(hll_registers(df.repartition(17), "w")).collect()[0]
    assert tuple(a) == tuple(b)


def test_kmv_overlap_estimates_known_universes(spark):
    from gaia_spark.operators.sketch import kmv_mins, kmv_overlap

    # A = {0..499}, B = {250..749}: |A∩B| = 250, union 750, J = 1/3
    df = spark.range(500).selectExpr("id")
    ma = kmv_mins(df, 64, "concat('u', id)")
    mb = kmv_mins(df, 64, "concat('u', id + 250)")
    r = kmv_overlap(ma, mb, 64).collect()[0]
    assert r.n_a == 64 and r.n_b == 64 and r.rho <= 64
    # KMV with k=64: relative error ~ 1/sqrt(k) ≈ 12.5%; allow 3 sigma
    assert abs(r.est_a - 500) < 200
    assert abs(r.est_union - 750) < 300
    assert abs(r.jaccard_e6 / 1e6 - 1 / 3) < 0.2
    # small shards fall back to exact counts
    tiny = spark.range(10)
    r2 = kmv_overlap(
        kmv_mins(tiny, 64, "concat('u', id)"),
        kmv_mins(tiny, 64, "concat('u', id)"), 64
    ).collect()[0]
    assert (r2.est_a, r2.est_union, r2.jaccard_e6) == (10, 10, 1_000_000)


def test_kmv_partitioning_invariance(spark):
    from gaia_spark.operators.sketch import kmv_mins, kmv_overlap

    df = spark.range(300)
    a = kmv_overlap(
        kmv_mins(df, 32, "concat('x', id)"),
        kmv_mins(df, 32, "concat('x', id + 100)"), 32
    ).collect()
    b = kmv_overlap(
        kmv_mins(df.repartition(13), 32, "concat('x', id)"),
        kmv_mins(df.repartition(7), 32, "concat('x', id + 100)"), 32
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
