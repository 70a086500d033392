"""regularization_path + hash-fold CV (round-10 extension)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_glm_spark import LogisticRegression
from dask_glm_spark.operators import solvers
from dask_glm_spark.operators.model_selection import (
    cross_val_score,
    kfold_column,
    regularization_path,
)
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


def test_kfold_partition_and_determinism(data):
    k = 4
    counts = (
        data.withColumn("_f", kfold_column("id", k))
        .groupBy("_f").count().collect()
    )
    sizes = {int(r["_f"]): int(r["count"]) for r in counts}
    assert set(sizes) == set(range(k))  # exhaustive
    assert sum(sizes.values()) == 400   # disjoint partition
    # deterministic: same expression, same assignment
    a = data.withColumn("_f", kfold_column("id", k)).orderBy("id").collect()
    b = data.withColumn("_f", kfold_column("id", k)).orderBy("id").collect()
    assert [r["_f"] for r in a] == [r["_f"] for r in b]
    with pytest.raises(ValueError, match="k must be"):
        kfold_column("id", 1)


def test_cross_val_score(data):
    est = LogisticRegression(solver="lbfgs", regularizer=None, max_iter=100)
    scores = cross_val_score(est, data, k=3, key_col="id")
    assert scores.shape == (3,)
    assert all(0.4 <= s <= 1.0 for s in scores)
    # deterministic end to end
    scores2 = cross_val_score(est, data, k=3, key_col="id")
    np.testing.assert_array_equal(scores, scores2)
    # the estimator instance passed in is never mutated
    assert est.coef_ is None


def test_cross_val_rows_never_leak(data):
    # a fold's train+test views exactly tile the input
    k = 3
    dff = data.withColumn("_f", kfold_column("id", k))
    n = data.count()
    for i in range(k):
        tr = dff.where(F.col("_f") != i).count()
        te = dff.where(F.col("_f") == i).count()
        assert tr + te == n
