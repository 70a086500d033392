"""GLM families: the scalar loss algebra, in dual form.

Semantics replicate the reference exactly (``dask_glm/families.py:6-123``):
each family is a class-used-as-namespace with static methods, consumed
generically by every solver via ``family=`` kwargs.

Dual form, per the engine architecture (SURVEY.md §7):

1. **Spark Column expressions** (``loglike_terms``, ``residual``,
   ``hess_weight``): pointwise terms over an ``xb = X·beta`` column.
   These stay inside whole-stage codegen — the hot path never leaves the
   JVM for p small enough to unroll.
2. **numpy statics** (``pointwise_loss``, ``pointwise_gradient``,
   ``loglike_np``): identical formulas over in-memory arrays. Used by the
   ADMM per-partition local solves (inside Arrow batches), by the Arrow
   partial-aggregation kernel path, and by tests.

The gradient of every family factors as ``X^T r(xb, y)`` and the hessian
as ``X^T diag(w(xb)) X`` — ``residual`` and ``hess_weight`` supply the
pointwise ``r`` and ``w`` so the kernel layer can build partial+final
aggregations without family-specific code:

  family    | r (gradient)        | w (hessian)
  ----------|---------------------|----------------
  Logistic  | sigmoid(xb) - y     | s(1-s), s=sigmoid(xb)   (families.py:41-51)
  Normal    | 2(xb - y)           | 2                        (families.py:78-84)
  Poisson   | exp(xb) - y         | exp(xb)                  (families.py:114-123)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def sigmoid_expr(x: Column) -> Column:
    """sigmoid as a Column expr (reference: ``dask_glm/utils.py:49-51``)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def sigmoid_np(x):
    return 1.0 / (1.0 + np.exp(-x))


class Logistic:
    """Binary-outcome family (reference: ``dask_glm/families.py:6-51``)."""

    name = "logistic"

    # --- Spark Column form ------------------------------------------------
    @staticmethod
    def loglike_terms(xb: Column, y: Column) -> Column:
        # sum over rows of: xb + log1p(exp(-xb)) - y*xb   (families.py:24-25)
        return xb + F.log1p(F.exp(-xb)) - y * xb

    @staticmethod
    def residual(xb: Column, y: Column) -> Column:
        return sigmoid_expr(xb) - y

    @staticmethod
    def hess_weight(xb: Column) -> Column:
        s = sigmoid_expr(xb)
        return s * (F.lit(1.0) - s)

    # --- numpy form ---------------------------------------------------------
    @staticmethod
    def loglike_np(Xbeta, y):
        return np.sum(Xbeta + np.log1p(np.exp(-Xbeta))) - np.dot(y, Xbeta)

    @staticmethod
    def loglike_terms_np(Xbeta, y):
        # per-row loss terms (the Column form's numpy twin) — the weighted
        # kernels dot these with the sample-weight vector (round 10)
        return Xbeta + np.log1p(np.exp(-Xbeta)) - y * Xbeta

    @staticmethod
    def residual_np(Xbeta, y):
        return sigmoid_np(Xbeta) - y

    @staticmethod
    def hess_weight_np(Xbeta):
        s = sigmoid_np(Xbeta)
        return s * (1.0 - s)

    @staticmethod
    def pointwise_loss(beta, X, y):
        return Logistic.loglike_np(X.dot(np.ravel(beta)), np.ravel(y))

    @staticmethod
    def pointwise_gradient(beta, X, y):
        return X.T.dot(Logistic.residual_np(X.dot(np.ravel(beta)), np.ravel(y)))


class Normal:
    """OLS family (reference: ``dask_glm/families.py:54-84``).

    Note the loglike is the *unscaled* SSE ``sum((y-xb)^2)`` and the
    gradient carries the factor 2 — reference quirks kept for parity.
    """

    name = "normal"

    @staticmethod
    def loglike_terms(xb: Column, y: Column) -> Column:
        return (y - xb) * (y - xb)

    @staticmethod
    def residual(xb: Column, y: Column) -> Column:
        return F.lit(2.0) * (xb - y)

    @staticmethod
    def hess_weight(xb: Column) -> Column:
        return F.lit(2.0)

    @staticmethod
    def loglike_np(Xbeta, y):
        return np.sum((y - Xbeta) ** 2)

    @staticmethod
    def loglike_terms_np(Xbeta, y):
        return (y - Xbeta) ** 2

    @staticmethod
    def residual_np(Xbeta, y):
        return 2.0 * (Xbeta - y)

    @staticmethod
    def hess_weight_np(Xbeta):
        return np.full_like(Xbeta, 2.0)

    @staticmethod
    def pointwise_loss(beta, X, y):
        return Normal.loglike_np(X.dot(np.ravel(beta)), np.ravel(y))

    @staticmethod
    def pointwise_gradient(beta, X, y):
        return X.T.dot(Normal.residual_np(X.dot(np.ravel(beta)), np.ravel(y)))


class Poisson:
    """Count-data family (reference: ``dask_glm/families.py:87-123``)."""

    name = "poisson"

    @staticmethod
    def loglike_terms(xb: Column, y: Column) -> Column:
        return F.exp(xb) - y * xb

    @staticmethod
    def residual(xb: Column, y: Column) -> Column:
        return F.exp(xb) - y

    @staticmethod
    def hess_weight(xb: Column) -> Column:
        return F.exp(xb)

    @staticmethod
    def loglike_np(Xbeta, y):
        return np.sum(np.exp(Xbeta) - y * Xbeta)

    @staticmethod
    def loglike_terms_np(Xbeta, y):
        return np.exp(Xbeta) - y * Xbeta

    @staticmethod
    def residual_np(Xbeta, y):
        return np.exp(Xbeta) - y

    @staticmethod
    def hess_weight_np(Xbeta):
        return np.exp(Xbeta)

    @staticmethod
    def pointwise_loss(beta, X, y):
        return Poisson.loglike_np(X.dot(np.ravel(beta)), np.ravel(y))

    @staticmethod
    def pointwise_gradient(beta, X, y):
        return X.T.dot(Poisson.residual_np(X.dot(np.ravel(beta)), np.ravel(y)))


class Gamma:
    """Gamma family with log link — beyond-reference (round 10; MLlib GLR
    ``family="gamma", link="log"`` is the public contract). Strictly
    positive continuous responses with constant coefficient of variation
    (V(μ)=μ²) — durations, claim sizes, cost-per-unit.

    The β-MLE is dispersion-free, so the loss is the unit-dispersion
    negative log-likelihood up to constants:

        ll(xb, y) = xb + y·exp(−xb)        (μ = exp(xb))
        r(xb, y)  = 1 − y·exp(−xb)
        w(xb)     = 1   (Fisher weight: (dμ/dη)²/V(μ) = μ²/μ² — the log
                    link is non-canonical for gamma; newton() is IRLS)
    """

    name = "gamma"

    @staticmethod
    def loglike_terms(xb: Column, y: Column) -> Column:
        return xb + y * F.exp(-xb)

    @staticmethod
    def residual(xb: Column, y: Column) -> Column:
        return F.lit(1.0) - y * F.exp(-xb)

    @staticmethod
    def hess_weight(xb: Column) -> Column:
        return F.lit(1.0)

    @staticmethod
    def loglike_np(Xbeta, y):
        return float(np.sum(Xbeta + y * np.exp(-Xbeta)))

    @staticmethod
    def loglike_terms_np(Xbeta, y):
        return Xbeta + y * np.exp(-Xbeta)

    @staticmethod
    def residual_np(Xbeta, y):
        return 1.0 - y * np.exp(-Xbeta)

    @staticmethod
    def hess_weight_np(Xbeta):
        return np.ones_like(Xbeta)

    @staticmethod
    def pointwise_loss(beta, X, y):
        return Gamma.loglike_np(X.dot(np.ravel(beta)), np.ravel(y))

    @staticmethod
    def pointwise_gradient(beta, X, y):
        return X.T.dot(Gamma.residual_np(X.dot(np.ravel(beta)), np.ravel(y)))


class Tweedie:
    """Compound-Poisson Tweedie family with log link — beyond-reference
    (round 10; MLlib GLR ``family="tweedie"`` is the public contract).

    Variance function V(μ) = μ^q with ``var_power`` q ∈ (1, 2): the
    Poisson–gamma compound — nonnegative data with an exact point mass
    at zero plus a continuous tail (insurance claims, rainfall,
    per-document spend). q→1 recovers Poisson, q→2 gamma.

    Quasi-log-likelihood terms under the log link (μ = exp(xb)):

        ll(xb, y) = μ^(2-q)/(2-q) − y·μ^(1-q)/(1-q)
        r(xb, y)  = dll/dxb = μ^(2-q) − y·μ^(1-q)
        w(xb)     = E[d²ll/dxb²] = μ^(2-q)     (Fisher scoring weight —
                    the log link is non-canonical, so newton() runs IRLS/
                    Fisher scoring; same stationary point as the exact
                    Hessian, the standard GLM choice and what MLlib does)

    Instances act exactly like the class-as-namespace families above —
    every solver takes ``family=Tweedie(1.5)`` unchanged, dense or
    sparse, with weights/offsets composing.
    """

    def __init__(self, var_power: float = 1.5):
        if not 1.0 < var_power < 2.0:
            raise ValueError(
                "var_power must be in (1, 2) — use Poisson for 1, a gamma "
                f"family for 2; got {var_power}"
            )
        self.var_power = float(var_power)
        self.name = f"tweedie[{self.var_power}]"

    # --- Spark Column form ------------------------------------------------
    def loglike_terms(self, xb: Column, y: Column) -> Column:
        q = self.var_power
        return F.exp(xb * (2.0 - q)) / (2.0 - q) - y * F.exp(
            xb * (1.0 - q)
        ) / (1.0 - q)

    def residual(self, xb: Column, y: Column) -> Column:
        q = self.var_power
        return F.exp(xb * (2.0 - q)) - y * F.exp(xb * (1.0 - q))

    def hess_weight(self, xb: Column) -> Column:
        return F.exp(xb * (2.0 - self.var_power))

    # --- numpy form -------------------------------------------------------
    def loglike_terms_np(self, Xbeta, y):
        q = self.var_power
        return np.exp(Xbeta * (2.0 - q)) / (2.0 - q) - y * np.exp(
            Xbeta * (1.0 - q)
        ) / (1.0 - q)

    def loglike_np(self, Xbeta, y):
        return float(np.sum(self.loglike_terms_np(Xbeta, y)))

    def residual_np(self, Xbeta, y):
        q = self.var_power
        return np.exp(Xbeta * (2.0 - q)) - y * np.exp(Xbeta * (1.0 - q))

    def hess_weight_np(self, Xbeta):
        return np.exp(Xbeta * (2.0 - self.var_power))

    def pointwise_loss(self, beta, X, y):
        return self.loglike_np(X.dot(np.ravel(beta)), np.ravel(y))

    def pointwise_gradient(self, beta, X, y):
        return X.T.dot(self.residual_np(X.dot(np.ravel(beta)), np.ravel(y)))


# String-dispatch registry of the class-as-namespace families. Tweedie is
# deliberately absent: it is INSTANCE-parameterized by var_power (there is
# no single "tweedie" family to construct from a bare name) — callers pass
# families.Tweedie(q) or use TweedieRegression(var_power=q) (VERDICT r10).
FAMILIES = {f.name: f for f in (Logistic, Normal, Poisson, Gamma)}
