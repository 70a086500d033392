"""Distributed k-means (operators/clustering.py): parity with driver-side
numpy Lloyd's from the same init, determinism, and plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_glm_spark.operators import clustering as C


def _np_lloyd(X, cent, iters):
    """Reference Lloyd's: same conventions as the engine (L2 argmin, first
    index wins ties, empty clusters keep stale centers)."""
    cent = cent.copy()
    for _ in range(iters):
        d = (
            (X * X).sum(1)[:, None]
            - 2.0 * X @ cent.T
            + (cent * cent).sum(1)[None, :]
        )
        assign = d.argmin(1)
        for j in range(len(cent)):
            members = X[assign == j]
            if len(members):
                cent[j] = members.mean(0)
    return cent, assign


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.RandomState(7)
    centers = rng.standard_normal((4, 8)) * 5
    X = np.concatenate([c + rng.standard_normal((50, 8)) for c in centers])
    rows = [(i, x.tolist()) for i, x in enumerate(X)]
    return X, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_matches_numpy_lloyd(spark, blobs):
    X, df = blobs
    rng = np.random.RandomState(0)
    init = X[rng.choice(len(X), size=4, replace=False)].copy()
    got = C.kmeans_fit(df, vec_col="embedding", max_iter=5, tol=0.0, centroids=init)
    want, assign_np = _np_lloyd(X, init, 5)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
    # assignments agree row-for-row
    rows = C.kmeans_assign(df, got).select("vec_id", "cluster").collect()
    _, assign_final = _np_lloyd(X, got, 1)  # one assignment pass on final centers
    d = (X * X).sum(1)[:, None] - 2.0 * X @ got.T + (got * got).sum(1)[None, :]
    expect = d.argmin(1)
    for r in rows:
        assert r["cluster"] == expect[r["vec_id"]]


def test_kmeans_deterministic(spark, blobs):
    _, df = blobs
    a = C.kmeans_fit(df, k=4, max_iter=3, seed=11)
    b = C.kmeans_fit(df, k=4, max_iter=3, seed=11)
    np.testing.assert_array_equal(a, b)


def test_kmeans_separates_blobs(spark, blobs):
    X, df = blobs
    cent = C.kmeans_fit(df, k=4, max_iter=10, seed=3)
    sizes = {r["cluster"]: r["n"] for r in C.cluster_sizes(df, cent).collect()}
    # well-separated blobs of 50: every recovered cluster is one blob
    assert sorted(sizes.values()) == [50, 50, 50, 50]


def test_assign_is_narrow(spark, blobs):
    from dask_glm_spark.plans import audit

    _, df = blobs
    cent = np.zeros((4, 8))
    cent[0, 0] = 1.0
    out = C.kmeans_assign(df, cent)
    audit.assert_narrow(out)


def test_semantic_dedup_finds_planted_pair(spark, blobs):
    X, df = blobs
    # plant a near-duplicate of row 0 with a new id
    import numpy as np

    dup = (X[0] + 1e-4).tolist()
    df2 = df.union(df.sparkSession.createDataFrame([(999, dup)], df.schema))
    pairs = C.semantic_dedup_pairs(df2, k=4, threshold=0.999, max_iter=5).collect()
    assert any({r["id_a"], r["id_b"]} == {0, 999} for r in pairs)


def test_kmeans_matches_public_lloyd_np_from_sampled_init(spark, blobs):
    """The q46 accuracy-contract recipe: same deterministic sample init ->
    distributed rounds allclose to the public driver-side reference
    (C.lloyd_np)."""
    X, df = blobs
    vd = df.select(F.col("embedding").alias("_v"))
    init = C._init_centroids(vd, 4, "_v", C.IVF_SEED)
    got = C.kmeans_fit(df, k=4, max_iter=5, tol=0.0, centroids=init.copy())
    want = C.lloyd_np(X, init, iters=5, tol=0.0)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
