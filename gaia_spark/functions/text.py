"""Text analysis for web-scale training-data pipelines: token stats,
quality scoring, language ID, document fingerprinting.

Beyond the reference's operator set (it has no text ops) — required by the
training-data-pipeline tier of the engine. Every builder here emits SQL for
BOTH dialects from one spec, so each op is oracle-checkable end to end; the
Spark plan consumes the rendered string via ``F.expr`` (whole-stage codegen,
no Python on the hot path).
"""

from __future__ import annotations

from gaia_spark.functions import portable as P

# language marker words — counted space-delimited, lowercased. Ties resolve
# in LANG_ORDER order (deterministic in both engines).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("la", "el", "es", "los"),
    "de": ("der", "und", "die", "das"),
    "fr": ("le", "et", "les", "des"),
}
LANG_ORDER = ("en", "es", "de", "fr")

STOPWORDS = ("the", "a", "and", "of", "to", "is", "in", "it")


def count_occurrences_sql(padded: str, needle: str) -> str:
    """# of occurrences of ``needle`` in ``padded`` via the replace-length
    trick — identical replace semantics in Spark and DuckDB."""
    n = len(needle)
    return (
        f"cast(floor((length({padded}) - length(replace({padded}, '{needle}', ''))) "
        f"/ cast({n} as double)) as bigint)"
    )


def padded_lower_sql(text: str) -> str:
    return f"concat(' ', lower({text}), ' ')"


def word_count_sql(marker: str, text_padded: str) -> str:
    return count_occurrences_sql(text_padded, f" {marker} ")


def lang_score_sql(lang: str, text_padded: str) -> str:
    return "(" + " + ".join(word_count_sql(m, text_padded) for m in LANG_MARKERS[lang]) + ")"


def lang_id_sql(text: str) -> str:
    """argmax over marker-count scores; ties break by LANG_ORDER."""
    tp = padded_lower_sql(text)
    scores = {lg: lang_score_sql(lg, tp) for lg in LANG_ORDER}
    branches = []
    order = list(LANG_ORDER)
    for i, lg in enumerate(order[:-1]):
        rest = [scores[o] for o in order[i + 1 :]]
        ge = f"greatest({', '.join(rest)})" if len(rest) > 1 else rest[0]
        branches.append(f"WHEN {scores[lg]} >= {ge} THEN '{lg}'")
    return "CASE " + " ".join(branches) + f" ELSE '{order[-1]}' END"


def token_count_sql(text: str, dialect: str) -> str:
    return P.arr_size(P.split_ws(text, dialect), dialect)


def stopword_count_sql(text: str) -> str:
    tp = padded_lower_sql(text)
    return "(" + " + ".join(word_count_sql(w, tp) for w in STOPWORDS) + ")"


def quality_score_sql(text: str, dialect: str) -> str:
    """Quality heuristic in [0, 1]-ish: stopword density band + mean word
    length band + length band, equally weighted. Deterministic, portable."""
    n_tok = token_count_sql(text, dialect)
    n_stop = stopword_count_sql(text)
    mean_wl = f"(length(replace(trim({text}), ' ', '')) / cast(greatest({n_tok}, 1) as double))"
    stop_ratio = f"({n_stop} / cast(greatest({n_tok}, 1) as double))"
    return (
        f"(CASE WHEN {stop_ratio} >= 0.05 AND {stop_ratio} <= 0.6 THEN 0.4 ELSE 0.0 END"
        f" + CASE WHEN {mean_wl} >= 3.0 AND {mean_wl} <= 10.0 THEN 0.3 ELSE 0.0 END"
        f" + CASE WHEN {n_tok} >= 10 AND {n_tok} <= 100000 THEN 0.3 ELSE 0.0 END)"
    )


def char_ngram_fingerprint_sql(text: str, dialect: str, n: int = 8) -> str:
    """Winnowing-style document fingerprint: min 60-bit hash over all
    character n-grams (rolling-hash role, md5-backed for cross-engine
    determinism). NULL-safe for texts shorter than n (falls back to whole
    text)."""
    if dialect == P.SPARK:
        grams = (
            f"transform(sequence(1, greatest(length({text}) - {n - 1}, 1)), "
            f"i -> substring({text}, i, {n}))"
        )
        gram_hashes = f"transform({grams}, g -> {P.md5_int60('g', dialect)})"
        return f"array_min({gram_hashes})"
    grams = (
        f"list_transform(range(1, greatest(length({text}) - {n - 1}, 1) + 1), "
        f"i -> substr({text}, i, {n}))"
    )
    gram_hashes = f"list_transform({grams}, g -> {P.md5_int60('g', dialect)})"
    return f"list_min({gram_hashes})"


def shingles_sql(text: str, dialect: str, k: int = 3) -> str:
    """Word k-gram shingle list; texts with < k words fall back to a single
    whole-text shingle (keeps every doc represented in MinHash)."""
    w = P.split_ws(text, dialect)
    if dialect == P.SPARK:
        body = (
            f"transform(sequence(0, size({w}) - {k}), "
            f"i -> concat({', '.join(_spark_elem(w, 'i', j) for j in range(k))}))"
        )
        return f"CASE WHEN size({w}) >= {k} THEN {body} ELSE array(trim({text})) END"
    body = (
        f"list_transform(range(1, len({w}) - {k - 2}), "
        f"i -> {' || '.join(_duck_elem(w, 'i', j) for j in range(k))})"
    )
    return f"CASE WHEN len({w}) >= {k} THEN {body} ELSE [trim({text})] END"


def _spark_elem(w: str, i: str, j: int) -> str:
    parts = f"element_at({w}, {i} + {j + 1})"
    return f"' ', {parts}" if j > 0 else parts


def _duck_elem(w: str, i: str, j: int) -> str:
    e = f"{w}[{i} + {j}]"
    return f"' ' || {e}" if j > 0 else e


def tf_idf_top_terms(
    docs,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-k TF-IDF terms per document (vocabulary/term-weighting for a
    training corpus): tf = term count in doc, idf = ln((N+1)/(df+1)) + 1
    (smoothed), score = tf·idf; ties broken by term ascending.

    Plan shape: one explode + two hash aggregations (tf per (doc, term),
    df per term — both map-side combinable) + one broadcast of the tiny
    (N) scalar + a top-k window partitioned by doc. The df table is
    vocabulary-sized; at 100 TB it stays a shuffle of term counts, never
    of documents. Returns (id_col, term, rank, score_e4)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from gaia_spark.functions import portable as P

    words = docs.select(
        F.col(id_col), F.explode(F.expr(P.split_ws(text_col, P.SPARK))).alias("term")
    )
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = words.select(id_col, "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    n = docs.agg(F.count("*").cast("double").alias("_n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        # rank on the FLOOR-SCALED score: ln() is not correctly rounded and
        # may differ by an ulp between the JVM and DuckDB libm — ranking raw
        # doubles could flip the top-k cut between engines; after the e4
        # floor both engines order identically, ties broken by term
        .withColumn(
            "score_e4",
            F.expr(P.floor_scaled_sql("tf * (ln((_n + 1) / (df + 1)) + 1)", 4)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score_e4"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            id_col, "term", F.col("rank").cast("int").alias("rank"), "score_e4",
        )
    )


def chunk_texts_sql(text: str, dialect: str, max_tokens: int, stride: int) -> str:
    """Array of overlapping word-window chunks of ``text`` — the
    training-data chunking primitive (context-length-bounded splits with
    overlap). Chunk i covers words [i·stride+1, i·stride+max_tokens]
    (1-based, clamped); every word is covered; docs with ≤ max_tokens
    words yield exactly one chunk. Same expression both dialects →
    chunk TEXT is hash-checkable."""
    m, s = int(max_tokens), int(stride)
    if not (0 < s <= m):
        raise ValueError("need 0 < stride <= max_tokens")
    w = P.split_ws(text, dialect)
    if dialect == P.SPARK:
        n = f"size({w})"
        n_chunks = f"CASE WHEN {n} <= {m} THEN 1 ELSE 1 + {P.idiv_sql(f'({n} - {m} + {s} - 1)', s)} END"
        return (
            f"transform(sequence(0, cast(({n_chunks}) as int) - 1), "
            f"i -> array_join(slice({w}, i * {s} + 1, {m}), ' '))"
        )
    n = f"len({w})"
    n_chunks = f"CASE WHEN {n} <= {m} THEN 1 ELSE 1 + {P.idiv_sql(f'({n} - {m} + {s} - 1)', s)} END"
    return (
        f"list_transform(range(0, cast(({n_chunks}) as int)), "
        f"i -> array_to_string(list_slice({w}, i * {s} + 1, i * {s} + {m}), ' '))"
    )


def chunk_documents(df, max_tokens: int = 50, overlap: int = 10, id_col: str = "doc_id", text_col: str = "text"):
    """Explode documents into overlapping training chunks:
    (id, chunk_id, chunk). Pure JVM (split + transform + posexplode) —
    no Python in the path, chunk count per doc is O(len/stride)."""
    import pyspark.sql.functions as F

    stride = max_tokens - overlap
    chunks = chunk_texts_sql(text_col, P.SPARK, max_tokens, stride)
    return df.select(
        F.col(id_col),
        F.posexplode(F.expr(chunks)).alias("chunk_id", "chunk"),
    )


def repetition_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition quality signals per document — the filters a
    training-data pipeline uses to drop boilerplate/spam pages (Rae et al.
    2021 §A1.1 analogs on whitespace words):

    - ``n_words`` / ``n_distinct_words`` — occurrence and vocabulary size;
    - ``dup_word_frac_e4`` — fraction of word OCCURRENCES whose word
      appears more than once in the doc (fixed-point e4);
    - ``top_bigram_n`` / ``top_bigram_frac_e4`` — occurrences of the most
      frequent word bigram and its share of all bigram slots.

    Scale shape: two explode → groupBy(doc, token) → groupBy(doc) chains,
    both with map-side combine; per-doc state is vocabulary-sized, nothing
    is ever keyed by less than doc_id, so skew is bounded by the longest
    single document. Pure JVM throughout (shingles_sql k=2 supplies the
    bigrams — docs under 2 words fall back to one whole-text shingle,
    identically in the oracle)."""
    import pyspark.sql.functions as F

    words = df.select(
        F.col(id_col), F.explode(F.expr(P.split_ws(text_col, P.SPARK))).alias("w")
    )
    wc = words.groupBy(id_col, "w").agg(F.count("*").alias("c"))
    ws = wc.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct_words"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("_dup"),
    )
    grams = df.select(
        F.col(id_col),
        F.explode(F.expr(shingles_sql(text_col, P.SPARK, 2))).alias("g"),
    )
    gc = grams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    gs = gc.groupBy(id_col).agg(
        F.max("c").alias("top_bigram_n"), F.sum("c").alias("_n_bigrams")
    )
    frac = P.floor_scaled_sql("cast(_dup as double) / cast(n_words as double)", 4)
    bfrac = P.floor_scaled_sql(
        "cast(top_bigram_n as double) / cast(_n_bigrams as double)", 4
    )
    return ws.join(gs, id_col).select(
        F.col(id_col),
        F.col("n_words").cast("long"),
        F.col("n_distinct_words").cast("long"),
        F.expr(frac).alias("dup_word_frac_e4"),
        F.col("top_bigram_n").cast("long"),
        F.expr(bfrac).alias("top_bigram_frac_e4"),
    )


# --- PII scrubbing (training-data redaction pass) ----------------------------
#
# Patterns are written with character classes ONLY (no backslash escapes):
# Spark SQL string literals consume backslashes while DuckDB's don't, so a
# shared pattern string must avoid them entirely (round-4 lesson, web.py).
# Both engines treat these identically (Java regex / RE2 common subset).

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PHONE_RE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def scrub_sql(text: str, pattern: str, token: str, dialect: str) -> str:
    """Replace every match of ``pattern`` with ``token``. Spark's SQL
    regexp_replace is global; DuckDB needs the explicit 'g' flag."""
    if dialect == P.SPARK:
        return f"regexp_replace({text}, '{pattern}', '{token}')"
    return f"regexp_replace({text}, '{pattern}', '{token}', 'g')"


def pattern_count_sql(text: str, pattern: str, dialect: str) -> str:
    if dialect == P.SPARK:
        return f"regexp_count({text}, '{pattern}')"
    return f"len(regexp_extract_all({text}, '{pattern}'))"


def pii_scrub_sql(text: str, dialect: str) -> str:
    """Email → phone → IPv4 scrub chain (order matters: the email pattern
    must run before IPv4 so 'user@10.0.0.1' redacts as one email)."""
    s = scrub_sql(text, EMAIL_RE, "<EMAIL>", dialect)
    s = scrub_sql(s, PHONE_RE, "<PHONE>", dialect)
    return scrub_sql(s, IPV4_RE, "<IP>", dialect)


def unigram_logprob(df, id_col: str = "doc_id", text_col: str = "text"):
    """CCNet-style unigram language-model quality score: per-document mean
    negative log-likelihood under the CORPUS's own unigram distribution
    (Wenzek et al. 2020 use a KenLM 5-gram; the unigram variant is the
    deterministic, SQL-expressible member of the family and ranks docs the
    same way for boilerplate/outlier filtering).

    Two passes, both combinable: (1) vocabulary counts (one token agg over
    the corpus), (2) token→count shuffle join + per-doc agg. The corpus
    total rides a one-row broadcast. Per-token log-probs quantize to e4
    BEFORE the doc sum (order-independent integer arithmetic; ln at e4 is
    the q_tfidf_top3 precedent) and the mean NLL derives by exact bigint
    division. Returns (id, n_tokens, sum_logp_e4, nll_e2)."""
    import pyspark.sql.functions as F

    toks = df.select(
        F.col(id_col), F.explode(F.expr(P.split_ws(text_col, P.SPARK))).alias("_tok")
    ).where("_tok != ''")
    vocab = toks.groupBy("_tok").agg(F.count("*").cast("long").alias("_cnt"))
    tot = vocab.agg(F.sum("_cnt").cast("long").alias("_tot"))
    logp = P.floor_scaled_sql(
        "ln(cast(_cnt as double) / cast(_tot as double))", 4
    )
    scored = (
        toks.join(vocab, "_tok")
        .crossJoin(F.broadcast(tot))
        .withColumn("_lp_e4", F.expr(logp))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("_lp_e4").cast("long").alias("sum_logp_e4"),
        )
        .withColumn(
            "nll_e2", F.expr("((-sum_logp_e4) div (n_tokens * 100))").cast("long")
        )
    )


def bigram_pairs_sql(text: str, dialect: str) -> str:
    """Adjacent word-pair structs over the whitespace token stream —
    the bigram twin of :func:`shingles_sql`, kept as (w1, w2) fields so LM
    counts can join on each side separately."""
    a = P.split_ws(text, dialect)
    if dialect == P.SPARK:
        return (
            f"transform(sequence(0, size({a}) - 2), "
            f"i -> struct(element_at({a}, i + 1) AS w1, element_at({a}, i + 2) AS w2))"
        )
    return (
        f"list_transform(range(1, len({a})), "
        f"i -> struct_pack(w1 := {a}[i], w2 := {a}[i + 1]))"
    )


def bigram_logprob(train, score, id_col: str = "doc_id", text_col: str = "text"):
    """Bigram language-model perplexity scoring with Stupid Backoff
    (Brants et al. 2007): the held-out quality signal one tier above
    :func:`unigram_logprob` (CCNet trains KenLM on one shard and scores
    the rest — same split here). Per scored transition w1→w2:

    - seen bigram:   lp = ln(C₂(w1,w2) / C₁(w1))
    - unseen bigram: lp = ln(0.4 · (C₁(w2)+1) / (N+V))   (smoothed backoff)

    Scale shape: bigram/unigram count tables are vocabulary-sized (two
    combinable aggs over the training shard); scoring is two vocab joins +
    one broadcast scalar + ONE per-doc agg. Per-transition log-probs
    floor-quantize to e4 BEFORE the doc sum (the q_tfidf_top3 ln
    precedent) and the mean NLL derives by exact non-negative bigint
    division. Docs with < 2 words have no transitions and drop out
    (documented). Returns (id, n_big, sum_lp_e4, nll_e4)."""
    import pyspark.sql.functions as F

    pair = bigram_pairs_sql(text_col, P.SPARK)
    a = P.split_ws(text_col, P.SPARK)

    def bigrams(df):
        return (
            df.where(F.expr(f"size({a}) >= 2"))
            .select(F.col(id_col), F.explode(F.expr(pair)).alias("_b"))
            .select(id_col, F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
        )

    c2 = bigrams(train).groupBy("w1", "w2").agg(F.count("*").cast("long").alias("_c2"))
    c1 = (
        train.select(F.explode(F.expr(a)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("_c1"))
    )
    scal = c1.agg(
        F.sum("_c1").cast("long").alias("_N"), F.count("*").cast("long").alias("_V")
    )
    lp = (
        "CASE WHEN _c2 IS NOT NULL THEN ln(cast(_c2 as double) / cast(_c1w1 as double)) "
        "ELSE ln((cast(4 as double) / cast(10 as double)) "
        "* cast(coalesce(_c1w2, 0) + 1 as double) / cast(_N + _V as double)) END"
    )
    scored = (
        bigrams(score)
        .join(c2, ["w1", "w2"], "left")
        .join(c1.select(F.col("w").alias("w1"), F.col("_c1").alias("_c1w1")), "w1", "left")
        .join(c1.select(F.col("w").alias("w2"), F.col("_c1").alias("_c1w2")), "w2", "left")
        .crossJoin(F.broadcast(scal))
        .withColumn("_lp_e4", F.expr(P.floor_scaled_sql(lp, 4)))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_big"),
            F.sum("_lp_e4").cast("long").alias("sum_lp_e4"),
        )
        .withColumn(
            "nll_e4",
            F.expr(P.bigint_div("(0 - sum_lp_e4)", "n_big", P.SPARK)).cast("long"),
        )
    )


# BM25 shared float expressions over exact-bigint columns (_tf, _df, _dl,
# _N, _TL) — ONE string rendered into both engines so the IEEE op order is
# identical; constants are integer ratios (a bare 1.2 literal is DECIMAL in
# Spark SQL but DOUBLE in DuckDB).
_BM25_K1 = "(cast(12 as double) / cast(10 as double))"
_BM25_B = "(cast(3 as double) / cast(4 as double))"
BM25_IDF = (
    "ln(cast(1 as double) + (cast(_N as double) - cast(_df as double) "
    "+ cast(5 as double) / cast(10 as double)) "
    "/ (cast(_df as double) + cast(5 as double) / cast(10 as double)))"
)
BM25_TFNORM = (
    f"(cast(_tf as double) * ({_BM25_K1} + cast(1 as double))) / "
    f"(cast(_tf as double) + {_BM25_K1} * (cast(1 as double) - {_BM25_B} "
    f"+ {_BM25_B} * cast(_dl as double) * cast(_N as double) / cast(_TL as double)))"
)
BM25_TERM_SCORE = f"({BM25_IDF}) * ({BM25_TFNORM})"


def bm25_scores(
    df,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """BM25 ranked retrieval (Robertson/Spärck Jones; the Okapi scoring
    every retrieval-augmented data pipeline runs before an LLM sees a
    document): score every document against a fixed bag-of-words query,

        score(d) = Σ_{t∈Q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)),
        idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5)),

    with the standard k1 = 1.2, b = 0.75 (spelled as exact integer ratios —
    a bare ``1.2`` literal is DECIMAL in Spark SQL but DOUBLE in DuckDB).

    Scale shape (100 TB): ONE token explode filtered to the |Q| query terms
    (so the shuffle carries only matching tokens, not the corpus), one
    combinable (doc, term) tf agg; df is a |Q|-row broadcast, (N, total_len)
    a one-row broadcast; |d| is a per-row JVM expression (no second pass).
    avgdl never materializes — b·|d|/avgdl is computed as b·|d|·N/total_len
    so every input to the float expression is an exact bigint.

    Determinism: per-term scores are identical IEEE doubles cross-engine
    (identical op order on exact integer inputs), e4-floored BEFORE the
    per-doc sum. Returns (id, n_q_terms, score_e4) for docs matching ≥ 1
    query term."""
    import pyspark.sql.functions as F

    terms = sorted(set(query_terms))
    tlist = ", ".join(f"'{t}'" for t in terms)
    toks = df.select(
        F.col(id_col),
        F.expr(token_count_sql(text_col, P.SPARK)).cast("long").alias("_dl"),
        F.explode(F.expr(P.split_ws(text_col, P.SPARK))).alias("_tok"),
    ).where(f"_tok IN ({tlist})")
    tf = toks.groupBy(id_col, "_tok", "_dl").agg(
        F.count("*").cast("long").alias("_tf")
    )
    dfreq = tf.groupBy("_tok").agg(F.count("*").cast("long").alias("_df"))
    scal = df.select(
        F.expr(token_count_sql(text_col, P.SPARK)).cast("long").alias("_l")
    ).agg(
        F.count("*").cast("long").alias("_N"),
        F.sum("_l").cast("long").alias("_TL"),
    )
    return (
        tf.join(F.broadcast(dfreq), "_tok")
        .crossJoin(F.broadcast(scal))
        .withColumn("_s_e4", F.expr(P.floor_scaled_sql(BM25_TERM_SCORE, 4)))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_q_terms"),
            F.sum("_s_e4").cast("long").alias("score_e4"),
        )
    )


def collocations(
    df,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """PMI-style collocation mining: adjacent word pairs whose observed
    corpus frequency beats the independence expectation —
    lift = c_ab · N / (c_a · c_b) (monotone with PMI = log lift), kept
    when the pair occurs ≥ ``min_count`` times. The classic phrase-
    detection pass (Mikolov et al. 2013 phrase scoring is this minus the
    discount) before vocabulary building.

    Plan: ONE explode builds positional bigrams JVM-side (struct
    transform over the word array, no self-join), unigram and bigram
    counts are combinable hash aggs, and component frequencies attach by
    two vocabulary-sized equi-joins. The lift is ONE shared IEEE
    expression over exact bigint counts floored to e6 — bit-identical
    cross-engine (no log, no float accumulation).

    Returns (w1, w2, c_ab, c_a, c_b, lift_e6)."""
    import pyspark.sql.functions as F

    w = P.split_ws(text_col, P.SPARK)
    words = df.select(F.explode(F.expr(w)).alias("wd")).where(F.length("wd") > 0)
    uni = words.groupBy("wd").agg(F.count("*").cast("long").alias("c"))
    n_uni = words.agg(F.count("*").cast("long").alias("n"))
    pairs = (
        df.where(F.expr(f"size({w}) >= 2"))
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, size({w}) - 2), "
                    f"i -> struct({w}[i] as a, {w}[i + 1] as b))"
                )
            ).alias("pr")
        )
        .select(F.col("pr.a").alias("w1"), F.col("pr.b").alias("w2"))
        .where((F.length("w1") > 0) & (F.length("w2") > 0))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
    )
    out = (
        pairs.join(uni.select(F.col("wd").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("wd").alias("w2"), F.col("c").alias("c_b")), "w2")
        .crossJoin(F.broadcast(n_uni))
    )
    lift = (
        "cast(c_ab as double) * cast(n as double)"
        " / (cast(c_a as double) * cast(c_b as double))"
    )
    return out.select(
        "w1", "w2", "c_ab", "c_a", "c_b",
        F.expr(P.floor_scaled_sql(lift, 6)).alias("lift_e6"),
    )


def top_phrase_occurrences(
    df,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Positional phrase search: find the most frequent word k-gram in the
    corpus (ties broken lexicographically) and list every occurrence as
    (doc, position) — the positional-inverted-index capability behind
    exact-phrase retrieval, demonstrated end to end (index build → phrase
    selection → posting lookup).

    Plan: ONE positional explode builds (doc, pos, gram) JVM-side (struct
    transform over the word array — the same no-self-join shape as
    :func:`collocations`), the argmax gram is a combinable count agg +
    a 1-row deterministic orderBy/limit, and the posting lookup is a
    broadcast semi-join of that 1-row phrase back onto the SAME exploded
    relation. Exact integers and strings throughout.

    Returns (doc_id, pos, phrase, n_total) — pos is the 0-based word
    offset; n_total the corpus-wide occurrence count."""
    import pyspark.sql.functions as F

    w = P.split_ws(text_col, P.SPARK)
    grams = (
        df.where(F.expr(f"size({w}) >= {k}"))
        .select(
            F.col(id_col),
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size({w}) - {k}), "
                    f"i -> concat_ws(' ', slice({w}, i + 1, {k})))"
                )
            ).alias("pos", "phrase"),
        )
    )
    top = (
        grams.groupBy("phrase")
        .agg(F.count("*").cast("long").alias("n_total"))
        .orderBy(F.col("n_total").desc(), F.col("phrase").asc())
        .limit(1)
    )
    return grams.join(F.broadcast(top), "phrase").select(
        id_col, F.col("pos").cast("long").alias("pos"), "phrase", "n_total"
    )


# --- readability (Flesch-Kincaid) --------------------------------------------

def syllable_runs_sql(text: str, dialect: str) -> str:
    """Total vowel-group runs ([aeiouy]+) in the text — runs never span a
    whitespace boundary, so the text-level count equals the sum of the
    per-word counts (one regex pass instead of an explode)."""
    if dialect == P.SPARK:
        return f"size(regexp_extract_all(lower({text}), '[aeiouy]+', 0))"
    return f"len(regexp_extract_all(lower({text}), '[aeiouy]+'))"


def novowel_words_sql(text: str, dialect: str) -> str:
    """Words with no vowel at all — they still carry one spoken syllable,
    so the FK syllable total is runs + novowel (the per-word max(1, runs)
    identity, computed without exploding)."""
    w = P.split_ws(text, dialect)
    if dialect == P.SPARK:
        return f"size(filter({w}, x -> lower(x) NOT RLIKE '[aeiouy]'))"
    return f"len(list_filter({w}, x -> not regexp_matches(lower(x), '[aeiouy]')))"
