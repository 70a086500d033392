"""PCA / whitening over the embeddings table (operators/embeddings.py)."""

from __future__ import annotations

import numpy as np
import pytest

from dask_glm_spark.operators import embeddings as E


def _load(spark, n=512):
    from dask_glm_spark.sources.glm_source import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(n)


def _np_matrix(df, col="embedding"):
    return np.stack([np.asarray(r[col], dtype=np.float64) for r in df.collect()])


def test_moments_match_numpy(spark):
    emb = _load(spark)
    X = _np_matrix(emb)
    n, mean, cov = E.embedding_moments(emb)
    assert n == len(X)
    np.testing.assert_allclose(mean, X.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(
        cov, np.cov(X, rowvar=False, bias=True), atol=1e-9
    )


def test_pca_matches_numpy_and_is_layout_independent(spark):
    emb = _load(spark)
    X = _np_matrix(emb)
    m = E.fit_pca(emb, k=8)
    # numpy twin with the same sign convention
    cov = np.cov(X, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:8]
    comps = evecs[:, order].T
    for i in range(8):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    np.testing.assert_allclose(m["components"], comps, atol=1e-8)
    np.testing.assert_allclose(
        m["explained_variance"], np.maximum(evals[order], 0.0), atol=1e-9
    )
    m2 = E.fit_pca(emb.repartition(13), k=8)
    np.testing.assert_allclose(m["components"], m2["components"], atol=1e-9)


def test_projection_and_whitening(spark):
    emb = _load(spark)
    X = _np_matrix(emb)
    m = E.fit_pca(emb, k=8)
    proj = E.project_embeddings(emb, m, out_col="p")
    P = _np_matrix(proj, "p")
    np.testing.assert_allclose(
        np.sort(P, axis=0),
        np.sort((X - m["mean"]) @ m["components"].T, axis=0),
        atol=1e-8,
    )
    # whitened output: covariance ~ identity on the kept axes
    white = E.project_embeddings(emb, m, out_col="w", whiten=True)
    W = _np_matrix(white, "w")
    cw = np.cov(W, rowvar=False, bias=True)
    np.testing.assert_allclose(cw, np.eye(8), atol=0.05)
    # input columns ride through
    assert set(proj.columns) == set(emb.columns) | {"p"}


def test_pca_validation_and_empty(spark):
    emb = _load(spark, n=64)
    with pytest.raises(ValueError, match="k must"):
        E.fit_pca(emb, k=0)
    empty = emb.where("vec_id < 0")
    with pytest.raises(ValueError, match="empty"):
        E.embedding_moments(empty)
