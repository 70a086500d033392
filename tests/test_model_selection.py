"""regularization_path (round-10 extension; CV + persistence are covered
in test_estimators.py against the existing estimators-module utilities)."""

from __future__ import annotations

import numpy as np
import pytest

from dask_glm_spark.operators import solvers
from dask_glm_spark.operators.model_selection import regularization_path
from dask_glm_spark.sources.datasets import make_classification


@pytest.fixture(scope="module")
def data(spark):
    df, X, y = make_classification(
        spark, n_samples=400, n_features=4, seed=2024, npartitions=4
    )
    df = df.persist()
    yield df
    df.unpersist()


def test_path_matches_cold_fits(data):
    lams = [2.0, 0.5, 0.1]
    path = regularization_path(
        data, lams, solver="proximal_grad", regularizer="l1",
        max_iter=250, tol=1e-12, accelerate=True,
    )
    assert path.shape == (3, 4)
    for lam, warm_beta in zip(lams, path):
        cold = solvers.proximal_grad(
            data, regularizer="l1", lamduh=lam, max_iter=250, tol=1e-12,
            accelerate=True,
        )
        np.testing.assert_allclose(warm_beta, cold, atol=5e-4, rtol=0)


def test_path_l1_sparsity_monotone(data):
    # heavier λ → no fewer zeros; a big-enough λ kills every coefficient
    lams = [1000.0, 5.0, 0.01]
    path = regularization_path(
        data, lams, solver="proximal_grad", regularizer="l1",
        max_iter=300, tol=1e-12, accelerate=True,
    )
    nnz = [(np.abs(b) > 1e-8).sum() for b in path]
    assert nnz[0] == 0
    assert nnz[0] <= nnz[1] <= nnz[2]


def test_path_input_order_preserved(data):
    lams = [0.1, 2.0]  # ascending input; fits run descending internally
    path = regularization_path(
        data, lams, solver="lbfgs", regularizer="l2", max_iter=200,
    )
    direct_01 = solvers.lbfgs(
        data, regularizer="l2", lamduh=0.1, max_iter=200
    )
    np.testing.assert_allclose(path[0], direct_01, atol=1e-3, rtol=0)


def test_path_validation(data):
    with pytest.raises(ValueError, match="solver"):
        regularization_path(data, [0.1], solver="newton")
    with pytest.raises(ValueError, match="non-empty"):
        regularization_path(data, [])
    with pytest.raises(ValueError, match=">= 0"):
        regularization_path(data, [-1.0])


def test_path_warm_equals_cold_sweep(data):
    # warm=False is the A/B face: same answers, independent starts
    lams = [1.0, 0.2]
    a = regularization_path(
        data, lams, solver="lbfgs", regularizer="l2", max_iter=300,
        tol=1e-10,
    )
    b = regularization_path(
        data, lams, solver="lbfgs", regularizer="l2", max_iter=300,
        tol=1e-10, warm=False,
    )
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=0)
