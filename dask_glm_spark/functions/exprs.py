"""Shared Column-expression combinators.

One home for the let-binding trick that three operator families
(text probes, MinHash/SimHash derivations, multiclass scoring) each
rediscovered — promoted here in round 7 so ML code no longer imports a
text-processing module's private helper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body) -> Column:
    """Evaluate ``value`` once per row and bind it into ``body`` (the
    single-element ``transform`` trick).

    Higher-order-function expressions are interpreted (no whole-stage
    codegen) and Catalyst's project collapse re-inlines a subtree at every
    reference — without this binding, an expression like a shingle-hash
    array is recomputed once per permutation/band (measured 10-60x
    slowdowns on the MinHash/SimHash paths), langid's 25 marker probes
    each re-normalize the whole document, and a k-class score array is
    evaluated ~k+2 times per row in softmax/OvR ``predict_proba``.

    Nested bindings compose: ``let(a, lambda a_: let(f(a_), lambda b_:
    g(a_, b_)))``.
    """
    return F.transform(F.array(value), body)[0]
