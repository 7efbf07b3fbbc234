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
