"""Model-selection utilities — beyond-reference (round 10 extension).

The reference ships bare solvers; every practitioner immediately wraps
them in a λ-sweep and a cross-validation loop. Both are implemented here
Spark-first:

- ``regularization_path``: warm-started λ sweep (sklearn ``lasso_path``
  analogue). Fits run strongest-λ-first so each fit resumes from the
  previous optimum (``init_beta``, round 10) — on a 100 TB cache the
  whole path costs a handful of extra rounds per λ instead of a cold
  fit each.
- ``kfold_column`` / ``cross_val_score``: deterministic hash-fold CV.
  Fold membership is a pure narrow expression on a stable key (the
  ``sampling.train_test_split`` discipline — same row, same fold, on
  every run, engine, and partitioning), so folds never materialize and
  the k fits share ONE cached input.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_glm_spark.functions.families import Logistic
from dask_glm_spark.operators import solvers
from dask_glm_spark.operators.sampling import hash_bucket_expr

# λ-sweep support: solvers whose objective actually contains lamduh*R
_PATH_SOLVERS = ("proximal_grad", "lbfgs", "admm")


def regularization_path(
    df: DataFrame,
    lamduhs,
    solver: str = "proximal_grad",
    regularizer: str = "l1",
    family=Logistic,
    warm: bool = True,
    **kwargs,
) -> np.ndarray:
    """Coefficients along a regularization path: returns ``(len(lamduhs),
    p)`` with row i the fit at ``lamduhs[i]`` (input order preserved).

    Fits execute in DESCENDING λ order regardless of input order — the
    heaviest-regularized fit is cheapest from zeros, and each subsequent
    fit warm-starts from its predecessor (``warm=False`` cold-starts
    every fit, for A/Bs). The input is persisted once around the sweep so
    the per-λ fits share one cache; with ``normalize`` on (the default)
    each fit still runs its own one-scan moments job — λ-independent but
    intentionally NOT hoisted, to keep each fit's standardization
    identical to a standalone call.
    """
    if solver not in _PATH_SOLVERS:
        raise ValueError(
            f"regularization_path supports solver in {_PATH_SOLVERS}, "
            f"got {solver!r}"
        )
    lams = [float(v) for v in lamduhs]
    if not lams:
        raise ValueError("lamduhs must be non-empty")
    if any(v < 0 for v in lams):
        raise ValueError("lamduhs must be >= 0")
    fn = solvers._solvers[solver]

    from pyspark import StorageLevel

    we_persisted = False
    if not df.is_cached:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        we_persisted = True
    try:
        order = sorted(range(len(lams)), key=lambda i: -lams[i])
        betas: list[np.ndarray | None] = [None] * len(lams)
        prev = None
        for i in order:
            kw = dict(kwargs)
            if warm and prev is not None:
                kw.setdefault("init_beta", prev)
            beta = np.asarray(
                fn(
                    df,
                    regularizer=regularizer,
                    lamduh=lams[i],
                    family=family,
                    **kw,
                ),
                dtype=np.float64,
            )
            betas[i] = beta
            prev = beta
        return np.stack(betas)
    finally:
        if we_persisted:
            df.unpersist()


def kfold_column(key: Column | str, k: int, salt: str = "cv") -> Column:
    """Deterministic fold id in [0, k) from a stable key — a pure narrow
    expression (no shuffle, no materialized split). Same row → same fold
    across runs, engines, and layouts."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return hash_bucket_expr(key, k, salt)


def cross_val_score(
    estimator,
    df: DataFrame,
    k: int = 5,
    key_col: str = "id",
    salt: str = "cv",
) -> np.ndarray:
    """k-fold cross-validation scores for any estimator with the sklearn
    ``get_params``/``fit``/``score`` contract (all of this package's).

    The input is cached ONCE; each fold's train/test views are narrow
    filters over that cache (fold membership = ``kfold_column``), so k
    fits never copy or shuffle the data. Returns the k test scores in
    fold order. Deterministic end to end: hash folds + deterministic
    solvers → identical scores on every run.
    """
    from pyspark import StorageLevel

    fold = kfold_column(key_col, k, salt)
    dff = df.withColumn("_fold", fold)
    we_persisted = False
    if not df.is_cached:
        dff = dff.persist(StorageLevel.MEMORY_AND_DISK)
        we_persisted = True
    try:
        scores = []
        for i in range(k):
            est = type(estimator)(**estimator.get_params())
            train = dff.where(F.col("_fold") != i).drop("_fold")
            test = dff.where(F.col("_fold") == i).drop("_fold")
            est.fit(train)
            scores.append(float(est.score(test)))
        return np.array(scores)
    finally:
        if we_persisted:
            dff.unpersist()
