"""Hypothesis property tests for the driver-side pure math, mirroring the
reference's property-based strategy (SURVEY §5.2) on the numpy layer:
proximal-operator laws, gradient/finite-difference consistency, and L-BFGS
convergence on random convex quadratics."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from dask_glm_spark.functions.families import Logistic, Normal, Poisson
from dask_glm_spark.functions.optimize import fmin_l_bfgs_b
from dask_glm_spark.functions.regularizers import L1, L2, ElasticNet

finite = st.floats(-10, 10, allow_nan=False, allow_infinity=False)
vec = arrays(np.float64, st.integers(1, 12), elements=finite)
pos_t = st.floats(0.01, 5, allow_nan=False)


@given(beta=vec, t=pos_t)
@settings(max_examples=100, deadline=None)
def test_l2_prox_formula(beta, t):
    np.testing.assert_allclose(L2().proximal_operator(beta, t), beta / (1 + t))


@given(beta=vec, t=pos_t)
@settings(max_examples=100, deadline=None)
def test_l1_prox_soft_threshold(beta, t):
    out = L1().proximal_operator(beta, t)
    expect = np.maximum(0, beta - t) - np.maximum(0, -beta - t)
    np.testing.assert_allclose(out, expect)
    # shrinkage: prox never increases magnitude, never flips sign
    assert np.all(np.abs(out) <= np.abs(beta) + 1e-12)
    assert np.all(out * beta >= -1e-12)


@given(beta=vec, t=pos_t)
@settings(max_examples=100, deadline=None)
def test_prox_nonexpansive(beta, t):
    """prox is firmly non-expansive: |prox(x)-prox(y)| <= |x-y|."""
    other = beta + 0.5
    for reg in (L1(), L2()):
        d = np.linalg.norm(reg.proximal_operator(beta, t) - reg.proximal_operator(other, t))
        assert d <= np.linalg.norm(beta - other) + 1e-9


@given(beta=vec, t=pos_t)
@settings(max_examples=50, deadline=None)
def test_elasticnet_prox_reference_bug_parity(beta, t):
    """The reference's ElasticNet.proximal_operator returns beta unchanged
    (regularizers.py:227) — replicated bug-for-bug by default."""
    np.testing.assert_array_equal(ElasticNet().proximal_operator(beta.copy(), t), beta)


@given(
    beta=arrays(np.float64, 4, elements=st.floats(-2, 2)),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=25, deadline=None)
def test_family_gradient_is_loglike_derivative(beta, seed):
    """Central finite differences of loglike == pointwise_gradient, for
    every family (the reference's formula contract)."""
    rng = np.random.RandomState(seed)
    X = rng.standard_normal((40, 4))
    for fam, y in [
        (Logistic, (rng.uniform(size=40) > 0.5).astype(float)),
        (Normal, rng.standard_normal(40)),
        (Poisson, rng.poisson(2.0, 40).astype(float)),
    ]:
        g = fam.pointwise_gradient(beta, X, y)
        eps = 1e-6
        fd = np.empty_like(beta)
        for j in range(len(beta)):
            e = np.zeros_like(beta)
            e[j] = eps
            fd[j] = (
                fam.pointwise_loss(beta + e, X, y) - fam.pointwise_loss(beta - e, X, y)
            ) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-4, atol=1e-4)


@given(seed=st.integers(0, 10_000), p=st.integers(2, 10))
@settings(max_examples=25, deadline=None)
def test_lbfgs_solves_convex_quadratic(seed, p):
    """The scipy-free L-BFGS reaches the analytic optimum of a random
    well-conditioned quadratic 0.5 x'Ax - b'x."""
    rng = np.random.RandomState(seed)
    M = rng.standard_normal((p, p))
    A = M @ M.T + np.eye(p)  # SPD, eigenvalues >= 1
    b = rng.standard_normal(p)
    x_star = np.linalg.solve(A, b)

    def fg(x):
        return 0.5 * x @ A @ x - b @ x, A @ x - b

    x, fval, _ = fmin_l_bfgs_b(fg, np.zeros(p), pgtol=1e-10, maxiter=500)
    # the solver also stops on relative function decrease, so guarantee is
    # ~sqrt(eps) accuracy in x, not pgtol
    np.testing.assert_allclose(x, x_star, rtol=1e-3, atol=1e-4)


def test_polyhash_python_spark_contract():
    """The documented python form of the rolling hash (used to build oracle
    constants) matches the frozen constants' generator."""
    from dask_glm_spark.operators.dedup import PERM_A, PERM_B, _minstd

    assert PERM_A == [a | 1 for a in _minstd(42, len(PERM_A))]
    assert PERM_B == _minstd(4242, len(PERM_B))
    assert len(set(PERM_A)) == len(PERM_A)  # distinct permutations
