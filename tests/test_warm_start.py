"""Warm-start (``init_beta``) contract — beyond-reference, round 10.

Every solver accepts ``init_beta`` (the reference always cold-starts at
zeros — ``algorithms.py:102,186,258,366,454``); estimators expose it as
sklearn-style ``warm_start=True``. The contract under test:

1. *Fixpoint*: re-starting AT a converged optimum with a tiny iteration
   budget stays at that optimum — i.e. the init actually reaches the
   solver (a zeros cold start with max_iter=1-2 lands far away).
2. *Standardize round-trip*: ``init_beta`` is given in the ORIGINAL
   feature space; the ``@normalize`` wrapper forward-transforms it into
   the standardized space (including the constant-column/intercept
   adjustment), so the fixpoint property holds with normalization on.
3. *Cold-start parity*: ``init_beta=None`` is bit-identical to the old
   behavior (no code path change when unused).
"""

import numpy as np
import pytest

from dask_glm_spark import LogisticRegression, SoftmaxRegression
from dask_glm_spark.operators import solvers
from dask_glm_spark.sources.datasets import make_classification


@pytest.fixture(scope="module")
def data(spark):
    df, X, y = make_classification(
        spark, n_samples=500, n_features=3, seed=11731, npartitions=4
    )
    df = df.persist()
    yield df
    df.unpersist()


def _rel(a, b):
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


@pytest.mark.parametrize(
    "solver_kw",
    [
        dict(name="gradient_descent", max_iter=2),
        dict(name="newton", max_iter=2),
        dict(name="lbfgs", regularizer=None, max_iter=3),
        dict(name="proximal_grad", regularizer="l2", lamduh=0.01, max_iter=2),
        dict(
            name="proximal_grad", regularizer="l2", lamduh=0.01, max_iter=2,
            accelerate=True,
        ),
        # 1 round: admm converges cold in ~4 on this problem, which would
        # make the warm-beats-cold comparison vacuous
        dict(name="admm", regularizer="l2", lamduh=0.01, max_iter=1),
    ],
)
def test_warm_restart_stays_at_optimum(data, solver_kw):
    kw = dict(solver_kw)
    fn = getattr(solvers, kw.pop("name"))
    budget = kw.pop("max_iter")
    beta_star = fn(data, max_iter=200, **kw)
    warm = fn(data, max_iter=budget, init_beta=beta_star, **kw)
    cold = fn(data, max_iter=budget, **kw)
    # warm restart holds the optimum on a budget the cold start cannot
    # reach it with — proves init_beta flows through @normalize's forward
    # transform into the iteration, not just the signature
    assert _rel(warm, beta_star) < 5e-2
    assert _rel(warm, beta_star) < _rel(cold, beta_star)


def test_warm_start_normalize_off_roundtrip(data):
    beta_star = solvers.lbfgs(data, regularizer=None, max_iter=200,
                              normalize=False)
    warm = solvers.lbfgs(
        data, regularizer=None, max_iter=3, init_beta=beta_star,
        normalize=False,
    )
    assert _rel(warm, beta_star) < 1e-6


def test_warm_start_with_constant_column(spark):
    # a constant (intercept-like) column exercises the intercept_idx branch
    # of the forward transform: init[i] must absorb sum(init * mean)
    df, X, y = make_classification(
        spark, n_samples=400, n_features=3, seed=777, npartitions=4
    )
    from dask_glm_spark.functions import kernels

    dfi = kernels.add_intercept(df, "features").persist()
    try:
        beta_star = solvers.newton(dfi, max_iter=100)
        warm = solvers.newton(dfi, max_iter=2, init_beta=beta_star)
        assert _rel(warm, beta_star) < 1e-6
    finally:
        dfi.unpersist()


def test_init_beta_shape_validation(data):
    with pytest.raises(ValueError, match="init_beta"):
        solvers.lbfgs(data, regularizer=None, init_beta=np.zeros(7))


def test_cold_start_parity(data):
    # init_beta=None must not change the result at all
    a = solvers.gradient_descent(data, max_iter=5)
    b = solvers.gradient_descent(data, max_iter=5, init_beta=None)
    assert np.array_equal(a, b)


def test_estimator_warm_start(data):
    est = LogisticRegression(
        solver="lbfgs", regularizer=None, warm_start=True, max_iter=200
    ).fit(data)
    coef1 = est._coef.copy()
    est.max_iter = 3
    est.fit(data)  # resumes from coef1, stays at the optimum
    assert _rel(est._coef, coef1) < 5e-3

    cold = LogisticRegression(
        solver="lbfgs", regularizer=None, warm_start=False, max_iter=3
    ).fit(data)
    assert _rel(est._coef, coef1) < _rel(cold._coef, coef1)


def test_estimator_warm_start_in_params(data):
    est = LogisticRegression(warm_start=True)
    params = est.get_params()
    assert params["warm_start"] is True
    assert LogisticRegression(**params).warm_start is True


def test_softmax_warm_start(spark):
    df, X, y = make_classification(
        spark, n_samples=400, n_features=3, seed=5150, npartitions=4
    )
    df3 = df.persist()
    try:
        est = SoftmaxRegression(
            solver="lbfgs", regularizer=None, warm_start=True, max_iter=200
        ).fit(df3)
        c1 = np.stack(est._coefs)
        est.max_iter = 2
        est.fit(df3)
        assert _rel(np.stack(est._coefs), c1) < 5e-3
    finally:
        df3.unpersist()


def test_sparse_warm_start(spark):
    from dask_glm_spark.sources import vectors as V

    df, X, y = make_classification(
        spark, n_samples=400, n_features=3, seed=31337, npartitions=4
    )
    sp = V.to_sparse_columns(df).persist()
    try:
        beta_star = solvers.lbfgs_sparse(sp, regularizer=None, max_iter=200)
        warm = solvers.lbfgs_sparse(
            sp, regularizer=None, max_iter=3, init_beta=beta_star
        )
        assert _rel(warm, beta_star) < 1e-6
    finally:
        sp.unpersist()


def test_warm_guard_falls_through_on_pathological_curvature():
    """ADVICE r10 backstop: a penalty wall inside (s0/2, s0] along -g fakes
    a machine-flat quadratic reading at the s0 probe; the second (s0/2)
    probe sees the true small-curvature descent and must fall through.

    Geometry (1-D, x0 = 0): gradient 1.0 at x0 gives s0 = min(1/|g|, 1)
    = 1, so the first probe lands at x = -1 — inside the wall, where f
    is raised by 1e8 and the one-probe quadratic model's achievable
    decrease 1/(4e8) reads below the 1e7·eps·|f0| threshold (the exact
    false-fire ADVICE r10 describes). The half-step probe at x = -0.5 is
    in the smooth region and decreases f by ~0.5."""

    def loss_grad(x):
        v = float(x[0])
        if v <= -0.95:
            return 10.0 + 1e8, np.array([1.0])
        return 10.0 + v + 1e-4 * v * v, np.array([1.0])

    info: dict = {}
    fired = solvers._warm_converged(loss_grad, np.zeros(1), 1e-8, info)
    assert fired is False  # must fall through to the real optimizer
    assert info == {}


def test_warm_guard_fires_on_true_flat_optimum():
    """The guard still short-circuits a genuinely factr-converged restart
    (steep-walled, machine-flat valley) — now in 3 scans, not 2."""
    K = 1e8
    g = 1e-3  # above pgtol, so the quadratic-model path is exercised

    def loss_grad(x):
        v = float(x[0])
        return 10.0 + g * v + 0.5 * K * v * v, np.array([g + K * v])

    info: dict = {}
    fired = solvers._warm_converged(loss_grad, np.zeros(1), 1e-8, info)
    assert fired is True
    assert info == {"n_iter": 0, "converged": True, "funcalls": 3}
