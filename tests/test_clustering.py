"""Deterministic k-means: blob separation, exact integer distances,
partitioning invariance, empty-cluster drop-out."""

import numpy as np

from gaia_spark.operators.clustering import KM_OFF, kmeans_assign


def _blob_df(spark, centers, n_per, spread=0.01, dim=8):
    rows = []
    vid = 0
    for bi, c in enumerate(centers):
        for j in range(n_per):
            vec = [
                float(np.float32(c + spread * ((vid * 31 + d * 7) % 5 - 2)))
                for d in range(dim)
            ]
            rows.append((vid, vec, bi))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, blob int")


def test_kmeans_separates_blobs(spark):
    df = _blob_df(spark, centers=[0.0, 5.0], n_per=12)
    out = kmeans_assign(df, k=2, n_rounds=3).collect()
    blob = {r.vec_id: r.vec_id // 12 for r in out}
    by_cid: dict[int, set] = {}
    for r in out:
        by_cid.setdefault(r.cid, set()).add(blob[r.vec_id])
    # each cluster contains exactly one blob, both blobs covered
    assert sorted(len(v) for v in by_cid.values()) == [1, 1]
    assert {b for v in by_cid.values() for b in v} == {0, 1}


def test_kmeans_exact_distance_arithmetic(spark):
    # single cluster: after any round the center is the exact offset-div
    # mean of the quantized points; check dist_e12 for every point
    df = _blob_df(spark, centers=[1.0], n_per=7, spread=0.05, dim=4)
    pts = {
        r.vec_id: np.array(
            [int(np.floor(float(v) * 1e6 + 0.5)) for v in r.embedding], dtype=np.int64
        )
        for r in df.select("vec_id", "embedding").collect()
    }
    xs = np.stack(list(pts.values()))
    n = len(pts)
    center = (xs.sum(axis=0) + n * KM_OFF) // n - KM_OFF
    out = {r.vec_id: r.dist_e12 for r in kmeans_assign(df, k=1, n_rounds=2).collect()}
    for vid, x in pts.items():
        assert out[vid] == int(((x - center) ** 2).sum())


def test_kmeans_partitioning_invariance(spark):
    df = _blob_df(spark, centers=[0.0, 2.0, -3.0], n_per=9, spread=0.3)
    a = sorted(map(tuple, kmeans_assign(df, k=3, n_rounds=2).collect()))
    b = sorted(
        map(tuple, kmeans_assign(df.repartition(11), k=3, n_rounds=2).collect())
    )
    assert a == b


def test_kmeans_converged_rounds_agree(spark):
    df = _blob_df(spark, centers=[0.0, 10.0], n_per=10, spread=0.001)
    a = sorted((r.vec_id, r.cid) for r in kmeans_assign(df, k=2, n_rounds=2).collect())
    b = sorted((r.vec_id, r.cid) for r in kmeans_assign(df, k=2, n_rounds=4).collect())
    assert a == b


def test_semdedup_keeps_one_per_duplicate_group(spark):
    from gaia_spark.operators.clustering import semdedup

    # two tight duplicate pairs in opposite half-spaces + two singletons
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9999, 0.0001, 0.0, 0.0]),     # near-dup of 0
        (2, [-1.0, 0.0, 0.0, 0.0]),
        (3, [-0.9999, -0.0001, 0.0, 0.0]),   # near-dup of 2
        (4, [0.0, 1.0, 0.0, 0.0]),
        (5, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in semdedup(df, k=2, n_rounds=2, threshold=0.95).collect()}
    assert out[1].grp == 0 and out[1].keep == 0 and out[0].keep == 1
    assert out[3].grp == 2 and out[3].keep == 0 and out[2].keep == 1
    assert out[4].keep == 1 and out[4].grp == 4
    assert out[5].keep == 1 and out[5].grp == 5
    # pairs can only link within a k-means cluster
    assert out[0].cid == out[1].cid and out[2].cid == out[3].cid


def test_semdedup_transitive_group(spark):
    from gaia_spark.operators.clustering import semdedup

    # chain a~b, b~c (a-c slightly below threshold): one group, min id kept
    rows = [
        (7, [1.0, 0.00, 0.0, 0.0]),
        (8, [1.0, 0.08, 0.0, 0.0]),
        (9, [1.0, 0.16, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # cos(7,8)=0.99681, cos(8,9)=0.99689 (linked); cos(7,9)=0.98744 (not)
    out = {r.vec_id: r for r in semdedup(df, k=1, n_rounds=1, threshold=0.995).collect()}
    assert [out[i].grp for i in (7, 8, 9)] == [7, 7, 7]
    assert [out[i].keep for i in (7, 8, 9)] == [1, 0, 0]


# --- product quantization --------------------------------------------------------


def test_pq_codes_shape_and_range(spark):
    from gaia_spark.operators.simsearch import pq_codes

    df = _blob_df(spark, [0.1, 0.5, 0.9], 8, dim=8)
    codes, books = pq_codes(df, dim=8, m=2, k=2, n_rounds=2)
    got = codes.collect()
    assert len(got) == 24 * 2                       # one row per (vector, subspace)
    assert all(0 <= r.code < 2 and r.m in (0, 1) for r in got)
    b = books.collect()
    assert all(len(r.c) == 4 for r in b)            # 8 dims / 2 subspaces


def test_pq_adc_matches_numpy_recompute(spark):
    """ADC scores recomputed in numpy from the COLLECTED codes + codebooks
    + raw query agree exactly with the Spark pipeline (two independent
    computation paths over the same exact integers), incl. rank order."""
    from gaia_spark.operators.simsearch import pq_adc_topk, pq_codes

    df = _blob_df(spark, [0.1, 0.5, 0.9], 8, dim=8)
    m, k, sd, qid = 2, 2, 4, 5
    codes, books = pq_codes(df, dim=8, m=m, k=k, n_rounds=2)
    cb = {(r.m, r.cid): np.array(r.c, dtype=np.int64) for r in books.collect()}
    cd = {(r.vec_id, r.m): r.code for r in codes.collect()}
    qvec = df.where(f"vec_id = {qid}").collect()[0].embedding
    qq = np.floor(np.array(qvec, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)
    ids = sorted({v for v, _ in cd})
    exp = {}
    for v in ids:
        s = 0
        for j in range(m):
            diff = qq[j * sd:(j + 1) * sd] - cb[(j, cd[(v, j)])]
            s += int((diff * diff).sum())
        exp[v] = s
    got = pq_adc_topk(df, query_id=qid, topk=10, dim=8, m=m, k=k, n_rounds=2).collect()
    order = sorted(ids, key=lambda v: (exp[v], v))[:10]
    assert [r.vec_id for r in got] == order
    assert all(r.adc_e12 == exp[r.vec_id] for r in got)


def test_pq_adc_self_identity(spark):
    """ADC(query) == Σ_j the query's own assignment residuals — the
    defining asymmetric-distance identity."""
    from gaia_spark.operators.simsearch import pq_adc_topk, pq_codes

    df = _blob_df(spark, [0.2, 0.8], 6, dim=8)
    qid = 3
    codes, _ = pq_codes(df, dim=8, m=2, k=2, n_rounds=2)
    own = sum(r.dist_e12 for r in codes.where(f"vec_id = {qid}").collect())
    adc = {
        r.vec_id: r.adc_e12
        for r in pq_adc_topk(df, query_id=qid, topk=12, dim=8, m=2, k=2, n_rounds=2).collect()
    }
    assert adc[qid] == own
