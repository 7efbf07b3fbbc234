"""duplicate_passages — brute-force parity and boilerplate-gram guard."""

import numpy as np

from gaia_spark.operators.dedup import duplicate_passages


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_runs(rows, min_run):
    """Independent reference: all maximal common word runs ≥ min_run
    between every doc pair, by dynamic programming over suffix matches."""
    toks = {d: t.split() for d, t in rows}
    out = set()
    ids = sorted(toks)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ta, tb = toks[a], toks[b]
            # match[i][j] = run length ending at ta[i-1], tb[j-1]
            m = np.zeros((len(ta) + 1, len(tb) + 1), dtype=int)
            for i in range(1, len(ta) + 1):
                for j in range(1, len(tb) + 1):
                    if ta[i - 1] == tb[j - 1]:
                        m[i, j] = m[i - 1, j - 1] + 1
            for i in range(1, len(ta) + 1):
                for j in range(1, len(tb) + 1):
                    run = m[i, j]
                    if run >= min_run:
                        # maximal: not extendable right
                        if i == len(ta) or j == len(tb) or ta[i] != tb[j]:
                            s_a, s_b = i - run, j - run
                            out.add((a, b, s_a + 1, s_b + 1, int(run)))
    return out


def test_brute_force_parity(spark):
    """A 15-word passage planted in three docs (at different offsets) plus
    unique filler: every maximal ≥12-word shared run is found with exact
    offsets and text."""
    passage = " ".join(f"p{i}" for i in range(15))
    rows = [
        (1, "u1a u1b " + passage + " u1c"),
        (2, passage + " v2a v2b v2c v2d"),
        (3, "w3a " + passage),
        (4, "none of these words repeat anywhere else at all ok"),
    ]
    got = {
        (r.a, r.b, r.start_a, r.start_b, r.run_len)
        for r in duplicate_passages(_docs(spark, rows), k=4, min_run=12).collect()
    }
    assert got == _brute_runs(rows, 12)


def test_passage_text_is_exact(spark):
    passage = " ".join(f"x{i}" for i in range(12))
    rows = [(1, "aa " + passage), (2, passage + " bb")]
    out = duplicate_passages(_docs(spark, rows), k=4, min_run=12).collect()
    assert len(out) == 1 and out[0].passage == passage
    assert out[0].start_a == 2 and out[0].start_b == 1 and out[0].run_len == 12


def test_boilerplate_gram_cap_bounds_join(spark):
    """A gram shared by every doc is dropped by max_gram_docs; a genuine
    rare duplicate pair still surfaces."""
    boiler = " ".join(f"b{i}" for i in range(8))
    passage = " ".join(f"q{i}" for i in range(12))
    rows = [(i, boiler + f" u{i}a u{i}b") for i in range(20)]
    rows += [(100, "z1 " + passage), (101, passage + " z2")]
    out = duplicate_passages(
        _docs(spark, rows), k=8, min_run=12, max_gram_docs=5
    ).collect()
    pairs = {(r.a, r.b) for r in out}
    assert (100, 101) in pairs
    assert all(a >= 100 for a, _ in pairs)  # boilerplate pairs suppressed


def test_below_min_run_ignored(spark):
    short = " ".join(f"s{i}" for i in range(8))
    rows = [(1, "aa " + short), (2, short + " bb")]
    assert duplicate_passages(_docs(spark, rows), k=4, min_run=12).count() == 0


def test_bpe_train_hand_computed(spark):
    """Sennrich-style fixture: merges + counts hand-derivable, including
    two lexicographic tie-breaks and the aaaa run-parity case."""
    from gaia_spark.operators.dedup import bpe_train

    df = spark.createDataFrame(
        [(1, "low low low lower lower newest newest newest newest widest"),
         (2, "aaaa aaaa ab")],
        "doc_id long, text string",
    )
    out = [(r.round, r.pa, r.pb, r.pair_count) for r in
           bpe_train(df, n_merges=4).orderBy("round").collect()]
    # r1: (a,a)=6 ties (w,e)=6, 'a' wins; r3: lo/ow/st all 5, 'l' wins
    assert out == [(1, "a", "a", 6), (2, "w", "e", 6), (3, "l", "o", 5), (4, "s", "t", 5)]


def test_bpe_train_run_parity_nonoverlap(spark):
    """'aaaa' must merge to [aa, aa] (left-to-right non-overlapping), so
    round 2's winning pair is (aa, aa) with count exactly 1."""
    from gaia_spark.operators.dedup import bpe_train

    df = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    out = [(r.round, r.pa, r.pb, r.pair_count) for r in
           bpe_train(df, n_merges=2).orderBy("round").collect()]
    assert out == [(1, "a", "a", 3), (2, "aa", "aa", 1)]


def test_bpe_train_partitioning_invariance(spark):
    from gaia_spark.operators.dedup import bpe_train
    from gaia_spark.queries import load

    d = load(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(map(tuple, bpe_train(d, n_merges=2).collect()))
    b = sorted(map(tuple, bpe_train(d.repartition(7), n_merges=2).collect()))
    assert a == b


def test_two_passages_same_diagonal(spark):
    """ADVICE r4: two separate duplicated passages on the SAME diagonal of
    a document pair must both be reported (islands, not min-per-diagonal)."""
    p1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    p2 = "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"
    filler_a = "one two three four five six seven eight"
    filler_b = "red blue green gold pink gray teal cyan"  # same length, different words
    a_text = f"{p1} {filler_a} {p2}"
    b_text = f"{p1} {filler_b} {p2}"  # both passages at SAME offsets -> same diagonal
    df = spark.createDataFrame([(1, a_text), (2, b_text)], "doc_id long, text string")
    out = duplicate_passages(df, k=4, min_run=12).collect()
    passages = {r.passage for r in out}
    assert p1 in passages and p2 in passages, passages


def test_bpe_apply_hand_computed(spark):
    from gaia_spark.operators.dedup import bpe_apply

    words = spark.createDataFrame(
        [("ther",), ("thon",), ("aaaa",), ("aaa",), ("er",), ("x",)],
        "w string",
    )
    merges = [("e", "r"), ("t", "h"), ("th", "er"), ("a", "a"), ("o", "n")]
    out = {r.w: r.syms for r in bpe_apply(words, merges).collect()}
    assert out["ther"] == ["ther"]          # merge of merges composes
    assert out["thon"] == ["th", "on"]
    assert out["aaaa"] == ["aa", "aa"]      # run parity: even offsets only
    assert out["aaa"] == ["aa", "a"]
    assert out["er"] == ["er"]
    assert out["x"] == ["x"]                # single-symbol word inert


def test_bpe_encode_counts_rollup(spark):
    from gaia_spark.operators.dedup import bpe_encode_counts

    df = spark.createDataFrame(
        [(1, "ther ther thon"), (2, "x er")],
        "doc_id long, text string",
    )
    merges = [("e", "r"), ("t", "h"), ("th", "er"), ("o", "n")]
    out = {r.doc_id: (r.n_words, r.n_tokens) for r in
           bpe_encode_counts(df, merges).collect()}
    assert out[1] == (3, 1 + 1 + 2)   # ther=1 tok (x2), thon=2
    assert out[2] == (2, 1 + 1)


def test_collocations_hand_computed(spark):
    from gaia_spark.functions.text import collocations

    # "new york" appears 3x; unigrams: new=4, york=4, N=12
    df = spark.createDataFrame(
        [(1, "new york new york"), (2, "new york is new here"),
         (3, "york of the")],
        "doc_id long, text string",
    )
    out = {(r.w1, r.w2): r for r in collocations(df, min_count=3).collect()}
    assert set(out) == {("new", "york")}
    r = out[("new", "york")]
    assert (r.c_ab, r.c_a, r.c_b) == (3, 4, 4)
    # lift = 3*12/(4*4) = 2.25
    assert r.lift_e6 == 2_250_000


def test_top_phrase_occurrences(spark):
    from gaia_spark.functions.text import top_phrase_occurrences

    df = spark.createDataFrame(
        [(1, "the quick fox and the quick fox ran"),
         (2, "a the quick fox b"), (3, "too short")],
        "doc_id long, text string",
    )
    out = top_phrase_occurrences(df, k=3).collect()
    assert all(r.phrase == "the quick fox" and r.n_total == 3 for r in out)
    assert {(r.doc_id, r.pos) for r in out} == {(1, 0), (1, 4), (2, 1)}
