"""repetition_stats (Gopher-style quality signals) — closed-form fixtures."""

from gaia_spark.functions.text import repetition_stats


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in repetition_stats(df).collect()}


def test_repetition_closed_form(spark):
    out = _run(spark, ["a a b", "c c c c", "x", "p q r s"])
    r = out[0]  # a:2 b:1 → dup occ 2/3; bigrams {a a, a b} → top 1/2
    assert (r.n_words, r.n_distinct_words, r.dup_word_frac_e4) == (3, 2, 6667)
    assert (r.top_bigram_n, r.top_bigram_frac_e4) == (1, 5000)
    r = out[1]  # all same word → everything duplicated, one bigram repeated
    assert (r.n_words, r.n_distinct_words, r.dup_word_frac_e4) == (4, 1, 10000)
    assert (r.top_bigram_n, r.top_bigram_frac_e4) == (3, 10000)
    r = out[2]  # <2 words: whole-text shingle fallback keeps the doc present
    assert (r.n_words, r.dup_word_frac_e4) == (1, 0)
    assert (r.top_bigram_n, r.top_bigram_frac_e4) == (1, 10000)
    r = out[3]  # all distinct
    assert (r.dup_word_frac_e4, r.top_bigram_frac_e4) == (0, 3333)


def test_repetition_every_doc_represented(spark):
    texts = ["one"] * 3 + ["two words here"] * 2
    out = _run(spark, texts)
    assert len(out) == 5


def test_bigram_lm_closed_form(spark):
    import math

    from gaia_spark.functions.text import bigram_logprob

    train = spark.createDataFrame(
        [(0, "a b a c"), (2, "b a")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(1, "a b a x"), (3, "z")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bigram_logprob(train, score).collect()}
    # train: C1 = {a:3, b:2, c:1}, N=6, V=3; C2 = {(a,b):1, (b,a):2, (a,c):1}
    lp_ab = math.floor(math.log(1 / 3) * 1e4 + 0.5)       # seen: ln(1/3)
    lp_ba = 0                                              # seen: ln(2/2)
    lp_ax = math.floor(math.log(0.4 * 1 / 9) * 1e4 + 0.5)  # backoff, C1(x)=0
    assert out[1].n_big == 3
    assert out[1].sum_lp_e4 == lp_ab + lp_ba + lp_ax
    assert out[1].nll_e4 == (-(lp_ab + lp_ba + lp_ax)) // 3
    assert 3 not in out  # single-word doc has no transitions


def test_bigram_lm_backoff_uses_target_unigram(spark):
    import math

    from gaia_spark.functions.text import bigram_logprob

    train = spark.createDataFrame([(0, "a a a b")], "doc_id long, text string")
    score = spark.createDataFrame([(1, "b a")], "doc_id long, text string")
    out = bigram_logprob(train, score).collect()[0]
    # (b, a) unseen; C1(a)=3, N=4, V=2 -> lp = ln(0.4 * 4 / 6)
    assert out.sum_lp_e4 == math.floor(math.log(0.4 * 4 / 6) * 1e4 + 0.5)


# --- BM25 ----------------------------------------------------------------------


def test_bm25_closed_form(spark):
    """Two docs, query {q}: doc 1 has tf=2 of 4 tokens, doc 2 tf=1 of 2;
    N=2, df=2, TL=6. Scores computed from the formula by hand."""
    import math

    from gaia_spark.functions.text import bm25_scores

    d = spark.createDataFrame(
        [(1, "q w q w"), (2, "q w"), (3, "w w w")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bm25_scores(d, ["q"]).collect()}
    assert set(got) == {1, 2}
    N, TL, df = 3, 9, 2
    idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
    for doc, tf, dl in ((1, 2, 4), (2, 1, 2)):
        tfn = tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl * N / TL))
        assert got[doc].score_e4 == math.floor(idf * tfn * 1e4 + 0.5)
        assert got[doc].n_q_terms == 1


def test_bm25_length_normalization_ranks_shorter_doc_higher(spark):
    """Same tf, shorter doc → larger score (the b·|d|/avgdl penalty)."""
    from gaia_spark.functions.text import bm25_scores

    d = spark.createDataFrame(
        [(1, "q w"), (2, "q w w w w w w w")], "doc_id long, text string"
    )
    got = {r.doc_id: r.score_e4 for r in bm25_scores(d, ["q"]).collect()}
    assert got[1] > got[2]
