"""Regularizers: pure driver-side numpy over the p-dim coefficient vector.

Semantics replicate ``dask_glm/regularizers.py:6-227`` exactly — beta has
tens of entries, so nothing here is distributed (reference keeps these on
the dask client; we keep them on the Spark driver — identical role).

Replicated contracts worth calling out (see SURVEY.md §2.3):

- ``L1.gradient`` / ``L1.hessian`` raise ``ValueError`` for any coefficient
  numerically at 0 (``regularizers.py:180-188``).
- ``ElasticNet.proximal_operator`` in the reference is a NO-OP — the shrink
  function is built but never applied (``regularizers.py:218-227``, upstream
  bug). We replicate bug-for-bug by default for oracle parity; pass
  ``strict_reference=False`` for the corrected operator.
- The string registry resolves subclasses by their ``name`` attribute at
  lookup time (``regularizers.py:131-150``) — new regularizers register by
  merely subclassing, which ``tests/test_regularizers.py:48-52`` relies on.
"""

from __future__ import annotations

import numpy as np


class Regularizer:
    """Abstract base: f, gradient, hessian, prox, and composition helpers."""

    name = "_base"

    def f(self, beta):
        raise NotImplementedError

    def gradient(self, beta):
        raise NotImplementedError

    def hessian(self, beta):
        raise NotImplementedError

    def proximal_operator(self, beta, t):
        raise NotImplementedError

    def add_reg_f(self, f, lam):
        """Wrap a loss callable so it includes ``lam * self.f(beta)``."""

        def wrapped(beta, *args):
            return f(beta, *args) + lam * self.f(beta)

        return wrapped

    def add_reg_grad(self, grad, lam):
        def wrapped(beta, *args):
            return grad(beta, *args) + lam * self.gradient(beta)

        return wrapped

    def add_reg_hessian(self, hess, lam):
        def wrapped(beta, *args):
            return hess(beta, *args) + lam * self.hessian(beta)

        return wrapped

    @classmethod
    def get(cls, obj):
        """Resolve a Regularizer instance from an instance or name string.

        ``'elastic_net'`` resolves to the strict-reference (bug-compatible
        NO-OP prox) instance for parity; ``'elastic_net_corrected'`` is
        the working prox — without this name the corrected operator was
        unreachable through the string API every solver entry point uses
        (review r5)."""
        if isinstance(obj, cls):
            return obj
        if isinstance(obj, str):
            if obj == "elastic_net_corrected":
                return ElasticNet(strict_reference=False)
            registry = {sub.name: sub for sub in cls.__subclasses__()}
            return registry[obj]()
        raise TypeError("Not a valid regularizer object.")


class L2(Regularizer):
    """``f = ||beta||^2 / 2`` (reference ``regularizers.py:153-168``)."""

    name = "l2"

    def f(self, beta):
        return float(np.sum(beta**2)) / 2

    def gradient(self, beta):
        return beta

    def hessian(self, beta):
        return np.eye(len(beta))

    def proximal_operator(self, beta, t):
        return beta / (1.0 + t)


class L1(Regularizer):
    """``f = ||beta||_1``; soft-threshold prox (``regularizers.py:171-192``)."""

    name = "l1"

    def f(self, beta):
        return float(np.sum(np.abs(beta)))

    def gradient(self, beta):
        if np.any(np.isclose(beta, 0)):
            raise ValueError("l1 norm is not differentiable at 0!")
        return np.sign(beta)

    def hessian(self, beta):
        if np.any(np.isclose(beta, 0)):
            raise ValueError("l1 norm is not twice differentiable at 0!")
        return np.zeros((beta.shape[0], beta.shape[0]))

    def proximal_operator(self, beta, t):
        return np.maximum(0, beta - t) - np.maximum(0, -beta - t)


class ElasticNet(Regularizer):
    """Weighted L1+L2 combination (``regularizers.py:195-227``)."""

    name = "elastic_net"

    def __init__(self, weight=0.5, strict_reference=True):
        self.weight = weight
        self.strict_reference = strict_reference
        self.l1 = L1()
        self.l2 = L2()

    def _weighted(self, left, right):
        return self.weight * left + (1 - self.weight) * right

    def f(self, beta):
        return self._weighted(self.l1.f(beta), self.l2.f(beta))

    def gradient(self, beta):
        return self._weighted(self.l1.gradient(beta), self.l2.gradient(beta))

    def hessian(self, beta):
        return self._weighted(self.l1.hessian(beta), self.l2.hessian(beta))

    def proximal_operator(self, beta, t):
        # Reference bug (regularizers.py:227): the shrink below is computed
        # but `beta` is returned unchanged. Default replicates for parity.
        if self.strict_reference:
            if t > 0:
                # t = step*lamduh > 0 means the caller ASKED for elastic-net
                # shrinkage and is silently getting none — the right call
                # for oracle parity, a loaded gun for real users (VERDICT
                # r10). One warning, results unchanged.
                import warnings

                warnings.warn(
                    "regularizer='elastic_net' replicates the reference's "
                    "NO-OP proximal operator (dask_glm regularizers.py:227)"
                    " — the fit is effectively unregularized on prox-based "
                    "solvers. Use 'elastic_net_corrected' for the working "
                    "prox.",
                    UserWarning,
                    stacklevel=2,
                )
            return beta
        g = self.weight * t
        shrunk = np.where(
            np.abs(beta) <= g,
            0.0,
            (beta - g * np.sign(beta)) / (t - g + 1),
        )
        return shrunk
