"""Bloom filter: one-sidedness, FP rate, mergeability."""

import pyspark.sql.functions as F

from gaia_spark.operators.sketch import bloom_build, bloom_contains


def _items(spark, lo, hi, tag="x"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("it")
    )


def test_bloom_no_false_negatives(spark):
    items = _items(spark, 0, 300)
    out = bloom_contains(bloom_build(items, "it"), items, "it").collect()
    assert len(out) == 300
    assert all(r.member == 1 and r.n_hits == 4 for r in out)


def test_bloom_false_positive_rate_low(spark):
    sketch = bloom_build(_items(spark, 0, 500), "it")
    out = bloom_contains(sketch, _items(spark, 10_000, 11_000), "it").collect()
    fp = sum(r.member for r in out)
    # 500 items * 4 hashes in 131,072 bits -> fpr ~ (2000/131072)^4 ~ 5e-8
    assert fp <= 2


def test_bloom_sketch_is_mergeable(spark):
    a = bloom_build(_items(spark, 0, 100), "it")
    b = bloom_build(_items(spark, 100, 200), "it")
    merged = (
        a.unionByName(b)
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").cast("long").alias("bits"))
    )
    whole = bloom_build(_items(spark, 0, 200), "it")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_bloom_deterministic_under_partitioning(spark):
    items = _items(spark, 0, 400)
    a = sorted(map(tuple, bloom_build(items, "it").collect()))
    b = sorted(map(tuple, bloom_build(items.repartition(13), "it").collect()))
    assert a == b
