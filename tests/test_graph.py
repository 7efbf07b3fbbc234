"""pagerank — closed forms, mass conservation, dangling redistribution."""

import pyspark.sql.functions as F

from gaia_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_two_node_cycle_symmetric(spark):
    """A <-> B is symmetric: both ranks stay exactly 0.5 at every
    iteration, any damping."""
    out = {r.node: r.rank for r in pagerank(_edges(spark, [(1, 2), (2, 1)]), iters=4).collect()}
    assert out == {1: 0.5, 2: 0.5}


def test_mass_conserved_with_dangling(spark):
    """Node 3 is dangling (no out-edges): its mass redistributes uniformly
    and total rank mass stays 1 (to quantization)."""
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    ranks = pagerank(e, iters=5).collect()
    total = sum(r.rank for r in ranks)
    assert abs(total - 1.0) < 1e-9
    assert len(ranks) == 3


def test_authority_gets_top_rank(spark):
    """Star graph: everyone links to node 0 (which links back to 1) —
    node 0 must end with the highest rank. Needs enough rounds: the 0<->1
    exchange oscillates with period 2 and decays by d^2 per cycle."""
    e = _edges(spark, [(i, 0) for i in range(1, 6)] + [(0, 1)])
    out = {r.node: r.rank for r in pagerank(e, iters=24).collect()}
    assert max(out, key=out.get) == 0
    assert out[0] > 2 * max(v for k, v in out.items() if k not in (0, 1))


def test_quantization_is_stable_across_partitionings(spark):
    """The e12 re-quantization makes ranks independent of physical
    partitioning (the determinism contract the oracle relies on)."""
    pairs = [(i, (i * 3 + 1) % 11) for i in range(11)] + [(i, (i * 7 + 2) % 11) for i in range(11)]
    a = pagerank(_edges(spark, pairs), iters=5)
    b = pagerank(_edges(spark, pairs).repartition(7), iters=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_triangle_count_k4(spark):
    from gaia_spark.operators.graph import triangle_count

    # K4: 4 triangles, every node in exactly 3
    edges = [(a, b) for a in "wxyz" for b in "wxyz" if a < b]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.node: r.n_tri for r in triangle_count(df).collect()}
    assert out == {"w": 3, "x": 3, "y": 3, "z": 3}


def test_triangle_count_star_and_path_none(spark):
    from gaia_spark.operators.graph import triangle_count

    star = spark.createDataFrame(
        [("hub", f"s{i}") for i in range(5)], "src string, dst string"
    )
    assert triangle_count(star).count() == 0
    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    assert triangle_count(path).count() == 0


def test_triangle_count_dedup_and_direction(spark):
    from gaia_spark.operators.graph import triangle_count

    # duplicated edges, reversed directions, self loops: still ONE triangle
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a"), ("b", "c")],
        "src string, dst string",
    )
    out = {r.node: r.n_tri for r in triangle_count(df).collect()}
    assert out == {"a": 1, "b": 1, "c": 1}


def test_resolve_redirects_chain_cycle_cap(spark):
    from gaia_spark.operators.graph import resolve_redirects

    # a->b->c (c terminal), d<->e cycle, f->d drains into the cycle,
    # g has two snapshot edges (min(dst) wins: g->b, not g->z)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("e", "d"), ("f", "d"),
         ("g", "z"), ("g", "b")],
        "src string, dst string",
    )
    out = {r.src: r for r in resolve_redirects(edges, max_hops_log2=4).collect()}
    assert (out["a"].final, out["a"].n_hops, out["a"].resolved) == ("c", 2, True)
    assert (out["b"].final, out["b"].n_hops, out["b"].resolved) == ("c", 1, True)
    # cycle: position after exactly 16 hops, unresolved
    assert out["d"].resolved is False and out["d"].n_hops == 16
    assert out["d"].final == "d"  # 16 hops around a 2-cycle lands home
    assert out["e"].final == "e" and out["e"].resolved is False
    # f: 1 hop to d, then 15 more around the cycle -> at e, unresolved
    assert out["f"].final == "e" and out["f"].n_hops == 16
    assert not out["f"].resolved
    # snapshot conflict resolves to min(dst) deterministically
    assert (out["g"].final, out["g"].n_hops, out["g"].resolved) == ("c", 2, True)
    assert "c" not in out and "z" not in out  # terminals have no row


def test_resolve_redirects_exact_cap_chain(spark):
    from gaia_spark.operators.graph import resolve_redirects

    # straight chain of 20 hops: n0->n1->...->n20; sources >16 hops from the
    # end stay unresolved at exactly the 16-hop position
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(20)], "src string, dst string"
    )
    out = {r.src: r for r in resolve_redirects(edges, max_hops_log2=4).collect()}
    assert (out["n4"].final, out["n4"].n_hops, out["n4"].resolved) == ("n20", 16, True)
    assert (out["n0"].final, out["n0"].n_hops, out["n0"].resolved) == ("n16", 16, False)
    assert (out["n10"].final, out["n10"].resolved) == ("n20", True)
    assert out["n10"].n_hops == 10


def test_assortativity_star_is_negative_one(spark):
    from gaia_spark.operators.graph import degree_assortativity

    edges = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(5)], "src string, dst string"
    )
    r = degree_assortativity(edges).collect()[0]
    assert (r.n_nodes, r.n_edges) == (6, 5)
    assert r.assortativity_e6 == -1_000_000  # star graph: exactly -1


def test_assortativity_regular_graph_degenerate(spark):
    from gaia_spark.operators.graph import degree_assortativity

    # 4-cycle: all degrees equal -> zero variance -> NULL
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], "src string, dst string"
    )
    r = degree_assortativity(edges).collect()[0]
    assert r.assortativity_e6 is None and r.n_edges == 4


def test_k_core_triangle_with_tail(spark):
    from gaia_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    out = {r.node: r.core_deg for r in k_core(edges, k=2).collect()}
    assert out == {"a": 2, "b": 2, "c": 2}   # two-round tail peel
    assert k_core(edges, k=3).count() == 0   # no 3-core anywhere


def test_k_core_unconverged_raises(spark):
    import pytest

    from gaia_spark.operators.graph import k_core

    # a 12-edge chain needs ~11 peel rounds at k=2; cap at 3 must raise
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(12)], "src string, dst string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(edges, k=2, max_rounds=3)
