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
