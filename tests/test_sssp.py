"""shortest_paths — closed-form chains, multi-source min, truncation."""

import pytest

from gaia_spark.operators.graph import shortest_paths


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w double")


def _srcs(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


def test_chain_closed_form(spark):
    """a -1> b -2> c -4> d from source a: dists 0, 1, 3, 7; e unreached."""
    e = _edges(spark, [("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 4.0), ("e", "e", 1.0)])
    d = {r.node: r.dist for r in shortest_paths(e, _srcs(spark, ["a"]), iters=3).collect()}
    assert d == {"a": 0.0, "b": 1.0, "c": 3.0, "d": 7.0}


def test_multi_source_takes_nearest(spark):
    """Sources a and d on a line a-b-c-d: b is nearer a, c nearer d."""
    e = _edges(
        spark,
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "b", 1.0), ("d", "c", 1.0)],
    )
    d = {r.node: r.dist for r in shortest_paths(e, _srcs(spark, ["a", "d"]), iters=3).collect()}
    assert d["b"] == 1.0 and d["c"] == 1.0 and d["a"] == 0.0 and d["d"] == 0.0


def test_truncated_iteration_is_partial(spark):
    """With iters=1 only 1-hop nodes are discovered — the documented
    truncation semantics."""
    e = _edges(spark, [("a", "b", 1.0), ("b", "c", 1.0)])
    d = {r.node: r.dist for r in shortest_paths(e, _srcs(spark, ["a"]), iters=1).collect()}
    assert set(d) == {"a", "b"}


def test_shorter_path_wins_over_fewer_hops(spark):
    """Direct a->c weight 10 vs a->b->c weight 2+3: the 2-hop path wins
    once iters >= 2."""
    e = _edges(spark, [("a", "c", 10.0), ("a", "b", 2.0), ("b", "c", 3.0)])
    d1 = {r.node: r.dist for r in shortest_paths(e, _srcs(spark, ["a"]), iters=1).collect()}
    d2 = {r.node: r.dist for r in shortest_paths(e, _srcs(spark, ["a"]), iters=2).collect()}
    assert d1["c"] == 10.0 and d2["c"] == 5.0


def test_negative_weight_raises(spark):
    e = _edges(spark, [("a", "b", -1.0)])
    with pytest.raises(Exception, match="negative edge weight"):
        shortest_paths(e, _srcs(spark, ["a"]), iters=1).collect()
