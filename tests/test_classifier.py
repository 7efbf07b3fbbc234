"""In-engine logistic regression: hand-computed rounds, separable-corpus
accuracy, partitioning invariance."""

import math

from gaia_spark.operators.classifier import logreg_score, logreg_train


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_logreg_separable_corpus_classifies_perfectly(spark):
    """Disjoint vocabularies per class → every doc predicted correctly
    after training (weights move toward the class sign in round 1 already:
    from w=0, σ=0.5 exactly, so the gradient sign equals 0.5−y)."""
    rows = [(i, "good clean prose text here", "en") for i in range(10)]
    rows += [(i + 10, "zz yy xx ww vv uu tt", "de") for i in range(10)]
    d = _docs(spark, rows)
    w = logreg_train(d, "CASE WHEN lang = 'en' THEN 1 ELSE 0 END", n_buckets=64, n_rounds=3)
    out = {r.doc_id: r.pred for r in logreg_score(d, w, n_buckets=64).collect()}
    assert all(out[i] == 1 for i in range(10))
    assert all(out[i + 10] == 0 for i in range(10))


def test_logreg_two_round_closed_form(spark):
    """One doc, one bigram ('a b' → 1 feature count, some bucket), y=1:
    round 1: σ(0)=0.5, err=-0.5e6, g=-0.5e6, w1=+0.5e6;
    round 2: z=0.5, σ(0.5) e6-floored, w2 follows by hand."""
    d = _docs(spark, [(1, "a b", "en")])
    w = logreg_train(d, "1", n_buckets=4, n_rounds=2).collect()
    assert len(w) == 1
    w1 = 500_000
    sig2 = math.floor(1 / (1 + math.exp(-w1 / 1e6)) * 1e6 + 0.5)
    w2 = w1 - (sig2 - 1_000_000)
    assert w[0].w_e6 == w2


def test_logreg_partitioning_invariance(spark):
    """Identical weights under different input partitionings (integer
    aggregation is order-independent by construction)."""
    rows = [(i, f"tok{i % 7} tok{(i * 3) % 7} filler words", "en" if i % 2 else "de") for i in range(40)]
    d1 = _docs(spark, rows).repartition(1)
    d2 = _docs(spark, rows).repartition(13)
    y = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END"
    w1 = {r._b: r.w_e6 for r in logreg_train(d1, y, n_buckets=16, n_rounds=2).collect()}
    w2 = {r._b: r.w_e6 for r in logreg_train(d2, y, n_buckets=16, n_rounds=2).collect()}
    assert w1 == w2
