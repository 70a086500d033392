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
