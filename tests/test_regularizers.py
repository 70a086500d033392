"""Exact unit tests for regularizers — mirrors the reference's test values
(``dask_glm/tests/test_regularizers.py``, see SURVEY.md §5.1)."""

import numpy as np
import pytest

from dask_glm_spark.functions.regularizers import L1, L2, ElasticNet, Regularizer


def test_base_not_implemented():
    r = Regularizer()
    beta = np.array([1.0])
    for call in (lambda: r.f(beta), lambda: r.gradient(beta),
                 lambda: r.hessian(beta), lambda: r.proximal_operator(beta, 1.0)):
        with pytest.raises(NotImplementedError):
            call()


def test_registry_lookup():
    assert isinstance(Regularizer.get("l1"), L1)
    assert isinstance(Regularizer.get("l2"), L2)
    assert isinstance(Regularizer.get("elastic_net"), ElasticNet)
    inst = L1()
    assert Regularizer.get(inst) is inst
    with pytest.raises(TypeError):
        Regularizer.get(42)


def test_registry_by_subclassing():
    # reference contract: subclassing registers (test_regularizers.py:48-52)
    class Mine(Regularizer):
        name = "mine"

    assert isinstance(Regularizer.get("mine"), Mine)


def test_l2_values():
    beta = np.array([1.0, 2.0, 3.0])
    r = L2()
    assert r.f(beta) == pytest.approx(7.0)
    np.testing.assert_allclose(r.gradient(beta), beta)
    np.testing.assert_allclose(r.hessian(beta), np.eye(3))
    # prox halving at t=1 (reference test_regularizers.py:72-80)
    np.testing.assert_allclose(r.proximal_operator(beta, 1.0), [0.5, 1.0, 1.5])


def test_l1_values():
    beta = np.array([1.0, 2.0, 3.0])
    r = L1()
    assert r.f(beta) == pytest.approx(6.0)
    np.testing.assert_allclose(r.gradient(beta), [1, 1, 1])
    # soft threshold (reference test_regularizers.py:121-129)
    np.testing.assert_allclose(r.proximal_operator(beta, 1.0), [0.0, 1.0, 2.0])
    np.testing.assert_allclose(
        r.proximal_operator(np.array([-2.0, 0.5, 3.0]), 1.0), [-1.0, 0.0, 2.0]
    )


def test_l1_raises_at_zero():
    r = L1()
    with pytest.raises(ValueError):
        r.gradient(np.array([1.0, 0.0]))
    with pytest.raises(ValueError):
        r.hessian(np.array([0.0, 2.0]))


def test_elastic_net_weight_degeneracy():
    # weight=1 -> L1, weight=0 -> L2 (reference :139-146,156-166)
    beta = np.array([1.0, -2.0, 3.0])
    assert ElasticNet(weight=1.0).f(beta) == pytest.approx(L1().f(beta))
    assert ElasticNet(weight=0.0).f(beta) == pytest.approx(L2().f(beta))
    np.testing.assert_allclose(
        ElasticNet(weight=1.0).gradient(beta), L1().gradient(beta)
    )
    np.testing.assert_allclose(
        ElasticNet(weight=0.0).hessian(beta), L2().hessian(beta)
    )


def test_elastic_net_prox_reference_bug_parity():
    beta = np.array([1.0, 2.0, 3.0])
    # reference regularizers.py:227 returns beta unchanged
    np.testing.assert_array_equal(
        ElasticNet().proximal_operator(beta, 1.0), beta
    )
    # corrected mode actually shrinks
    fixed = ElasticNet(strict_reference=False).proximal_operator(beta, 1.0)
    assert np.all(np.abs(fixed) < np.abs(beta))


def test_elasticnet_corrected_prox_optimality_conditions():
    """External-oracle substitute for the corrected (strict_reference=False)
    ElasticNet prox (sklearn is not in this environment): the closed form
    must satisfy the EXACT subgradient optimality conditions of
    argmin_z 0.5*||z - x||^2 + t*(w*||z||_1 + (1-w)*||z||^2/2):

      z_i != 0:  z_i - x_i + t*w*sign(z_i) + t*(1-w)*z_i == 0
      z_i == 0:  |x_i| <= t*w

    plus a perturbation check that no nearby point does better."""
    import numpy as np

    from dask_glm_spark.functions.regularizers import ElasticNet

    rng = np.random.RandomState(7)
    for w in (0.0, 0.25, 0.5, 0.9, 1.0):
        en = ElasticNet(weight=w, strict_reference=False)
        for t in (0.01, 0.5, 2.0):
            x = rng.standard_normal(64) * 2
            z = en.proximal_operator(x.copy(), t)
            nz = z != 0
            # stationarity on the non-zero coordinates
            resid = z[nz] - x[nz] + t * w * np.sign(z[nz]) + t * (1 - w) * z[nz]
            np.testing.assert_allclose(resid, 0.0, atol=1e-12)
            # zero coordinates only where the soft-threshold admits them
            assert (np.abs(x[~nz]) <= t * w + 1e-12).all()

            def obj(v):
                return 0.5 * np.sum((v - x) ** 2) + t * (
                    w * np.sum(np.abs(v)) + (1 - w) * 0.5 * np.sum(v**2)
                )

            base = obj(z)
            for _ in range(20):
                d = rng.standard_normal(64)
                eps = 10.0 ** rng.uniform(-6, -1)
                assert obj(z + eps * d) >= base - 1e-12


def test_elastic_net_noop_prox_warns_once_per_site():
    """ADVICE/VERDICT r10: the bug-compatible 'elastic_net' prox silently
    does nothing — users asking for shrinkage (t > 0) get ONE warning
    naming the corrected regularizer; results stay reference-identical."""
    import warnings

    beta = np.array([1.0, 2.0, 3.0])
    with pytest.warns(UserWarning, match="elastic_net_corrected"):
        out = ElasticNet().proximal_operator(beta, 0.5)
    np.testing.assert_array_equal(out, beta)  # parity unchanged
    # t == 0 (no shrinkage requested) and the corrected mode stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ElasticNet().proximal_operator(beta, 0.0)
        ElasticNet(strict_reference=False).proximal_operator(beta, 0.5)
