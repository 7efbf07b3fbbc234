"""quadkey_sql / morton_sql — published vectors, nesting, Z-order layout."""

import duckdb
import pyspark.sql.functions as F

from gaia_spark.functions import portable as P


def _eval_duck(exprs: str, src: str) -> tuple:
    return duckdb.connect().execute(f"SELECT {exprs} FROM {src}").fetchone()


def test_published_vectors():
    """Bing Maps documentation examples: tile (3,5) level 3 -> '213';
    level-1 tiles are the four quadrants '0','1','2','3'."""
    got = _eval_duck(
        f"{P.quadkey_sql('3', '5', 3)}, {P.morton_sql('3', '5', 3)}", "(SELECT 1)"
    )
    assert got == ("213", 2 * 16 + 1 * 4 + 3)
    for tx, ty, exp in [(0, 0, "0"), (1, 0, "1"), (0, 1, "2"), (1, 1, "3")]:
        assert _eval_duck(P.quadkey_sql(str(tx), str(ty), 1), "(SELECT 1)")[0] == exp


def test_morton_is_base4_quadkey_everywhere(spark):
    """For every tile at zoom 4: int(quadkey, base=4) == morton, parent
    prefix holds, and Spark agrees with DuckDB on the same expressions."""
    tiles = spark.sql(
        "SELECT tx, ty FROM (SELECT explode(sequence(0, 15)) tx) "
        "CROSS JOIN (SELECT explode(sequence(0, 15)) ty)"
    )
    rows = tiles.select(
        "tx", "ty",
        F.expr(P.quadkey_sql("tx", "ty", 4)).alias("qk"),
        F.expr(P.morton_sql("tx", "ty", 4)).alias("m"),
        F.expr(P.quadkey_sql(P.idiv_sql("tx", 2), P.idiv_sql("ty", 2), 3)).alias("qk_parent"),
    ).collect()
    assert len(rows) == 256
    assert len({r.m for r in rows}) == 256  # bijection
    for r in rows:
        assert int(r.qk, 4) == r.m
        assert r.qk[:3] == r.qk_parent


def test_zorder_layout_prunes(spark, tmp_path):
    """The 100-TB claim in miniature: range-partitioning by morton yields
    parquet files whose morton (hence tile) ranges don't interleave — the
    precondition for row-group min/max pruning of bbox scans."""
    df = spark.sql(
        "SELECT tx, ty FROM (SELECT explode(sequence(0, 31)) tx) "
        "CROSS JOIN (SELECT explode(sequence(0, 31)) ty)"
    ).withColumn("morton", F.expr(P.morton_sql("tx", "ty", 5)))
    out = str(tmp_path / "zordered")
    df.repartitionByRange(8, "morton").write.parquet(out)
    back = spark.read.parquet(out).withColumn("f", F.input_file_name())
    stats = back.groupBy("f").agg(
        F.min("morton").alias("lo"), F.max("morton").alias("hi"),
        F.count("*").alias("n"),
    ).collect()
    spans = sorted((r.lo, r.hi) for r in stats if r.n > 0)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next  # disjoint, ordered ranges


# --- Hilbert curve index ---------------------------------------------------------


def _hilbert_map(spark, order):
    from gaia_spark.operators.spatial_join import with_hilbert

    n = 1 << order
    # one point per grid cell, placed at the cell center
    rows = [
        (x * n + y, -180.0 + 360.0 * (x + 0.5) / n, -90.0 + 180.0 * (y + 0.5) / n)
        for x in range(n)
        for y in range(n)
    ]
    df = spark.createDataFrame(rows, "k long, lon double, lat double")
    got = with_hilbert(df, order=order, keep_xy=True).collect()
    return {(r.hx, r.hy): r.hilbert_d for r in got}


def test_hilbert_bijective_and_unit_step(spark):
    """Order-3 (8×8): d values are a permutation of 0..63 and consecutive
    d are always 4-neighbors — the defining Hilbert locality property."""
    m = _hilbert_map(spark, 3)
    inv = {d: xy for xy, d in m.items()}
    assert sorted(inv) == list(range(64))
    for d in range(63):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_order1_base_case(spark):
    """Order-1 curve visits (0,0) → (0,1) → (1,1) → (1,0)."""
    m = _hilbert_map(spark, 1)
    assert m == {(0, 0): 0, (0, 1): 1, (1, 1): 2, (1, 0): 3}


def test_hilbert_reserved_column_guard(spark):
    import pytest

    from gaia_spark.operators.spatial_join import with_hilbert

    df = spark.createDataFrame([(1.0, 2.0, 7)], "lat double, lon double, hilbert_d int")
    with pytest.raises(ValueError):
        with_hilbert(df)


def test_hilbert_bbox_ranges_cover_and_compress(spark):
    """Range decomposition of a 16×12 bbox at order 6: runs are disjoint,
    sorted, cover exactly the bbox cell count, and there are FAR fewer
    runs than cells (the locality win — O(perimeter), not O(area))."""
    from gaia_spark.operators.spatial_join import hilbert_bbox_ranges

    n = 1 << 6
    # bbox spanning x 10..25, y 20..31 in grid units
    la0 = -90.0 + 180.0 * 20.5 / n
    la1 = -90.0 + 180.0 * 31.5 / n
    lo0 = -180.0 + 360.0 * 10.5 / n
    lo1 = -180.0 + 360.0 * 25.5 / n
    runs = sorted(
        (r.d_lo, r.d_hi, r.n_cells)
        for r in hilbert_bbox_ranges(spark, la0, la1, lo0, lo1, order=6).collect()
    )
    area = 16 * 12
    assert sum(nc for _, _, nc in runs) == area
    assert all(hi - lo + 1 == nc for lo, hi, nc in runs)
    for (_, hi1, _), (lo2, _, _) in zip(runs, runs[1:]):
        assert lo2 > hi1 + 1  # maximal and disjoint
    assert len(runs) < area / 4


def test_hilbert_decode_roundtrip(spark):
    """d2xy is the exact inverse of xy2d: decode all order-4 positions and
    check bijectivity onto the 16×16 grid."""
    import pyspark.sql.functions as F

    from gaia_spark.operators.spatial_join import hilbert_decode

    n = 16
    ds = spark.range(n * n).select(F.col("id").alias("hilbert_d"))
    got = {(r.hx, r.hy): r.hilbert_d for r in hilbert_decode(ds, order=4).collect()}
    assert len(got) == n * n  # bijective onto the grid
    assert sorted(got.values()) == list(range(n * n))
    # spot-check the base orientation at this order via the encode map
    m = _hilbert_map(spark, 4)
    assert all(m[(x, y)] == d for (x, y), d in got.items())
