"""Synthetic dataset generators (reference ``dask_glm/datasets.py:8-162``).

Generation happens in driver numpy with fixed seeds (exact reproducibility,
matching FIXTURES.md §B), then becomes a DataFrame with a requested
partition count — the analogue of the reference's ``chunksize``. These are
test/demo fixtures at reference scale (N ≤ ~1e6); a 100 TB pipeline reads
real parquet via ``sources.glm_source``.

Note: the reference's ``make_poisson`` passes ``size=1`` to
``da.random.poisson`` (``datasets.py:161``, upstream quirk) — our replica
generates shape (n,) as FIXTURES.md directs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def _to_df(
    spark: SparkSession, X: np.ndarray, y: np.ndarray, npartitions: int
) -> DataFrame:
    import pandas as pd

    # Arrow path via a pandas frame: X.tolist() is ONE vectorized
    # conversion (per-element Python boxing of n*p floats took multiple GB
    # of driver heap and minutes at the module's advertised N — review r5).
    pdf = pd.DataFrame(
        {
            "id": np.arange(len(y), dtype=np.int64),
            "features": X.astype(np.float64).tolist(),
            "label": y.astype(np.float64),
        }
    )
    df = spark.createDataFrame(
        pdf, schema="id long, features array<double>, label double"
    )
    return df.repartitionByRange(npartitions, "id")


def make_classification(
    spark,
    n_samples=1000,
    n_features=100,
    n_informative=2,
    scale=1.0,
    seed=20009,
    npartitions=10,
):
    rng = np.random.RandomState(seed)
    X = rng.normal(0, 1, size=(n_samples, n_features))
    informative_idx = rng.choice(n_features, n_informative, replace=False)
    beta = (rng.random(n_features) - 1) * scale
    z0 = X[:, informative_idx].dot(beta[informative_idx])
    y = (rng.random(n_samples) < 1.0 / (1.0 + np.exp(-z0))).astype(np.float64)
    return _to_df(spark, X, y, npartitions), informative_idx, beta


def make_regression(
    spark,
    n_samples=1000,
    n_features=100,
    n_informative=2,
    scale=1.0,
    seed=20009,
    npartitions=10,
):
    rng = np.random.RandomState(seed)
    X = rng.normal(0, 1, size=(n_samples, n_features))
    informative_idx = rng.choice(n_features, n_informative, replace=False)
    beta = (rng.random(n_features) - 1) * scale
    z0 = X[:, informative_idx].dot(beta[informative_idx])
    y = rng.random(n_samples)
    del z0
    return _to_df(spark, X, y, npartitions), informative_idx, beta


def make_poisson(
    spark,
    n_samples=1000,
    n_features=100,
    n_informative=2,
    scale=1.0,
    seed=20009,
    npartitions=10,
):
    rng = np.random.RandomState(seed)
    X = rng.normal(0, 1, size=(n_samples, n_features))
    informative_idx = rng.choice(n_features, n_informative, replace=False)
    beta = (rng.random(n_features) - 1) * scale
    z0 = X[:, informative_idx].dot(beta[informative_idx])
    y = rng.poisson(np.exp(z0)).astype(np.float64)
    return _to_df(spark, X, y, npartitions), informative_idx, beta


def make_intercept_data(spark, N, p, seed=20009, npartitions=5):
    """Reference test fixture (``tests/test_algos_families.py:21-37``):
    column-normalized uniform X with a constant last column; Bernoulli y."""
    rng = np.random.RandomState(seed)
    X = rng.random((N, p))
    col_sums = X.sum(axis=0)
    X = X / col_sums[None, :]
    X = np.concatenate([X, np.ones((N, 1))], axis=1)
    beta = rng.random(p + 1)
    z0 = X.dot(beta)
    y = (rng.random(N) < 1.0 / (1.0 + np.exp(-z0))).astype(np.float64)
    return _to_df(spark, X, y, npartitions)
