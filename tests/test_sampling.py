

def test_dsir_separates_target_like_docs(spark):
    from gaia_spark.operators.sampling import dsir_logratio

    # target speaks "alpha beta"; pool has one target-like doc and one
    # off-distribution doc — the target-like doc must score higher
    target = spark.createDataFrame(
        [(100 + i, "alpha beta alpha beta alpha") for i in range(5)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [(1, "alpha beta alpha beta"), (2, "zork quux gnarl frotz")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dsir_logratio(target, pool).collect()}
    assert out[1].sum_lr_e4 > out[2].sum_lr_e4
    assert out[1].n_grams == 3 and out[2].n_grams == 3


def test_dsir_closed_form_single_bucket_counts(spark):
    import math

    from gaia_spark.functions import portable as P
    from gaia_spark.operators.sampling import dsir_logratio

    target = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    pool = spark.createDataFrame([(1, "a b"), (2, "c d")], "doc_id long, text string")
    out = {r.doc_id: r for r in dsir_logratio(target, pool, n_buckets=1024).collect()}
    # one gram each; Nt=1, Np=2; target bucket holds ct=1 for 'a b''s bucket
    lr_ab = math.floor(math.log((1 + 1) * (2 + 1024) / ((1 + 1) * (1 + 1024))) * 1e4 + 0.5)
    lr_cd = math.floor(math.log((0 + 1) * (2 + 1024) / ((1 + 1) * (1 + 1024))) * 1e4 + 0.5)
    assert out[1].sum_lr_e4 == lr_ab
    assert out[2].sum_lr_e4 == lr_cd
