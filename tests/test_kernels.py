"""Kernel-layer parity: sql vs arrow paths vs driver numpy ground truth."""

import numpy as np
import pytest

from dask_glm_spark.functions import kernels
from dask_glm_spark.functions.families import FAMILIES, Logistic
from dask_glm_spark.sources.datasets import make_classification


@pytest.fixture(scope="module")
def data(spark):
    df, _, _ = make_classification(spark, n_samples=500, n_features=4, seed=20009,
                                   npartitions=5)
    df = df.persist()
    pdf = df.orderBy("id").toPandas()
    X = np.array(list(pdf["features"]))
    y = pdf["label"].to_numpy()
    return df, X, y


BETA = np.array([0.3, -0.7, 0.11, 0.52])


@pytest.mark.parametrize("family", list(FAMILIES.values()))
@pytest.mark.parametrize("path", ["sql", "arrow"])
def test_loss_gradient_matches_numpy(data, family, path):
    df, X, y = data
    yy = np.clip(y, 0, None) if family.name == "poisson" else y
    loss, grad = kernels.loss_gradient(df, family, BETA, path=path)
    xb = X @ BETA
    np.testing.assert_allclose(loss, family.loglike_np(xb, y), rtol=1e-9)
    np.testing.assert_allclose(grad, X.T @ family.residual_np(xb, y), rtol=1e-9)


@pytest.mark.parametrize("family", list(FAMILIES.values()))
@pytest.mark.parametrize("path", ["sql", "arrow"])
def test_gradient_hessian_matches_numpy(data, family, path):
    df, X, y = data
    grad, hess = kernels.gradient_hessian(df, family, BETA, path=path)
    xb = X @ BETA
    w = family.hess_weight_np(xb)
    np.testing.assert_allclose(grad, X.T @ family.residual_np(xb, y), rtol=1e-9)
    np.testing.assert_allclose(hess, X.T @ (w[:, None] * X), rtol=1e-9)
    np.testing.assert_allclose(hess, hess.T)  # symmetry


@pytest.mark.parametrize("path", ["sql", "arrow"])
def test_multi_loss(data, path):
    df, X, y = data
    betas = [BETA, BETA * 0.5, np.zeros(4)]
    losses = kernels.multi_loss(df, Logistic, betas, path=path)
    expected = [Logistic.loglike_np(X @ b, y) for b in betas]
    np.testing.assert_allclose(losses, expected, rtol=1e-9)


def test_moments_population_std(data):
    df, X, y = data
    mean, std = kernels.column_moments(df, 4)
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=1e-9)
    # numpy default ddof=0 == population std (the reference trap, SURVEY §7)
    np.testing.assert_allclose(std, X.std(axis=0), rtol=1e-9)


def test_add_intercept(data):
    df, X, y = data
    df2 = kernels.add_intercept(df)
    assert kernels.infer_p(df2) == 5
    row = df2.select("features").first()
    assert row["features"][-1] == 1.0


def test_arrow_path_is_deterministic(data):
    df, X, y = data
    results = [
        kernels.loss_gradient(df, Logistic, BETA, path="arrow") for _ in range(3)
    ]
    for loss, grad in results[1:]:
        assert loss == results[0][0]  # bit-identical
        np.testing.assert_array_equal(grad, results[0][1])
