"""unigram_logprob — closed-form tiny corpus."""

import math

from gaia_spark.functions.text import unigram_logprob


def test_closed_form(spark):
    """Corpus 'a a b' + 'b c': counts a=2 b=2 c=1, total 5.
    doc 1: lp = 2·ln(2/5) + ln(2/5) = 3·ln(0.4); doc 2: ln(0.4)+ln(0.2)."""
    d = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in unigram_logprob(d).collect()}
    lp4 = lambda p: math.floor(math.log(p) * 1e4 + 0.5)  # noqa: E731
    assert rows[1].n_tokens == 3 and rows[2].n_tokens == 2
    assert rows[1].sum_logp_e4 == 3 * lp4(0.4)
    assert rows[2].sum_logp_e4 == lp4(0.4) + lp4(0.2)
    assert rows[1].nll_e2 == (-rows[1].sum_logp_e4) // 300
    # lower-probability tokens -> higher NLL
    assert rows[2].nll_e2 > rows[1].nll_e2


def test_uniform_corpus_flat_nll(spark):
    """All-distinct tokens: every doc's NLL is exactly ln(V)·100-ish and
    identical across docs of any length."""
    d = spark.createDataFrame(
        [(1, "t0 t1 t2"), (2, "t3 t4 t5 t6 t7")], "doc_id long, text string"
    )
    rows = unigram_logprob(d).collect()
    nlls = {r.nll_e2 for r in rows}
    assert len(nlls) == 1
