"""hits + cocitation_pairs — closed-form graphs and the hot-target guard."""

from gaia_spark.operators.graph import cocitation_pairs, hits


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_hits_star_fixpoint(spark):
    """Two hubs pointing at one authority: auth(c)=1, hub(h1)=hub(h2)=1,
    everything else 0 — the max-normalized fixpoint from round 1 on."""
    e = _edges(spark, [("h1", "c"), ("h2", "c")])
    out = {r.node: r for r in hits(e, iters=2).collect()}
    assert out["c"].auth == 1.0 and out["c"].hub == 0.0
    assert out["h1"].hub == 1.0 and out["h2"].hub == 1.0
    assert out["h1"].auth == 0.0


def test_hits_mutual_reinforcement(spark):
    """A links to both targets, B to one: A is the better hub; the doubly
    cited target is the better authority."""
    e = _edges(spark, [("A", "x"), ("A", "y"), ("B", "x")])
    out = {r.node: r for r in hits(e, iters=4).collect()}
    assert out["A"].hub > out["B"].hub
    assert out["x"].auth > out["y"].auth


def test_cocitation_closed_form(spark):
    e = _edges(spark, [("a", "x"), ("b", "x"), ("b", "y"), ("c", "y"), ("c", "x")])
    got = {(r.a, r.b): r.n_common for r in cocitation_pairs(e).collect()}
    assert got == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 2}


def test_cocitation_hot_target_guard(spark):
    """max_in_degree=2 drops x (cited by 3) — only the y pairing stays."""
    e = _edges(spark, [("a", "x"), ("b", "x"), ("b", "y"), ("c", "y"), ("c", "x")])
    got = {(r.a, r.b): r.n_common for r in cocitation_pairs(e, max_in_degree=2).collect()}
    assert got == {("b", "c"): 1}


def test_cocitation_duplicate_edges_collapse(spark):
    """Repeated identical edges must not inflate n_common."""
    e = _edges(spark, [("a", "x"), ("a", "x"), ("b", "x")])
    got = {(r.a, r.b): r.n_common for r in cocitation_pairs(e).collect()}
    assert got == {("a", "b"): 1}
