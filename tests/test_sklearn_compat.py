"""sklearn interop tests, mirroring the reference's
``tests/test_estimators.py:138-154`` (Pipeline + clone/grid-search compat).

sklearn is optional in this environment — these tests run wherever it is
installed (pytest.importorskip) and the clone-contract tests below run
everywhere via the get_params/set_params surface.
"""

from __future__ import annotations

import pytest

from dask_glm_spark.operators.estimators import (
    LinearRegression,
    LogisticRegression,
    PoissonRegression,
)


@pytest.mark.parametrize("cls", [LogisticRegression, LinearRegression, PoissonRegression])
def test_params_roundtrip(cls):
    est = cls(solver="newton", max_iter=7, lamduh=0.3)
    params = est.get_params()
    est2 = cls().set_params(**params)
    assert est2.get_params() == params


def test_sklearn_clone():
    sklearn = pytest.importorskip("sklearn")
    est = LogisticRegression(solver="lbfgs", max_iter=3)
    cloned = sklearn.base.clone(est)
    assert cloned is not est
    assert cloned.get_params() == est.get_params()


def test_sklearn_pipeline_fit_predict(spark):
    pytest.importorskip("sklearn")
    from sklearn.pipeline import Pipeline

    from dask_glm_spark.sources.glm_source import load_glm_fast

    df = load_glm_fast(spark, "/root/testdata/sf0.001")
    pipe = Pipeline([("clf", LogisticRegression(solver="newton", max_iter=5))])
    pipe.fit(df)
    assert pipe.named_steps["clf"].coef_ is not None


def test_grid_search_param_surface():
    """GridSearchCV needs get_params keys to be settable — verify every
    advertised key round-trips (the part of the grid-search contract that
    doesn't require array-sliceable inputs)."""
    est = LogisticRegression()
    for key, val in [("lamduh", 0.5), ("solver", "lbfgs"), ("max_iter", 2)]:
        est.set_params(**{key: val})
        assert est.get_params()[key] == val
