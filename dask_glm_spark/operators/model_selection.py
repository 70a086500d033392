"""λ-path model selection — beyond-reference (round 10 extension).

``regularization_path`` is the sklearn ``lasso_path`` analogue built on
the round-10 warm-start support: fits run strongest-λ-first so each fit
resumes from the previous optimum (``init_beta``) over ONE shared cache —
on a 100 TB input the whole path costs a handful of extra rounds per λ
instead of a cold fit each.

Deterministic k-fold CV and JSON model persistence already live in
``operators.estimators`` (``cross_val_score`` with content-hash folds,
``save_model`` / ``load_model``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from dask_glm_spark.functions.families import Logistic
from dask_glm_spark.operators import solvers

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
    # a caller-supplied fit_info would be shared (and silently
    # overwritten) by every per-λ fit — collect per-λ dicts instead,
    # returned in INPUT order under "per_lamduh"
    caller_info = kwargs.pop("fit_info", None)
    infos: list[dict] = [{} for _ in lams]
    try:
        order = sorted(range(len(lams)), key=lambda i: -lams[i])
        betas: list[np.ndarray | None] = [None] * len(lams)
        prev = None
        for i in order:
            kw = dict(kwargs)
            kw["fit_info"] = infos[i]
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
        if caller_info is not None:
            caller_info["per_lamduh"] = infos
        return np.stack(betas)
    finally:
        if we_persisted:
            df.unpersist()


def softmax_regularization_path(
    df: DataFrame,
    lamduhs,
    k: int,
    regularizer: str = "l1",
    warm: bool = True,
    **kwargs,
) -> np.ndarray:
    """Multinomial λ-path (round 12): the softmax twin of
    ``regularization_path`` over ``solvers.softmax_proximal`` — returns
    ``(len(lamduhs), p, k)`` with row i the joint fit at ``lamduhs[i]``
    (input order preserved; execution strongest-λ-first with (p, k)
    warm starts over one shared cache). ``label_col`` must hold class
    indices in [0, k) — the solver-level contract; use
    ``SoftmaxRegression`` for label mapping."""
    lams = [float(v) for v in lamduhs]
    if not lams:
        raise ValueError("lamduhs must be non-empty")
    if any(v < 0 for v in lams):
        raise ValueError("lamduhs must be >= 0")

    from pyspark import StorageLevel

    we_persisted = False
    if not df.is_cached:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        we_persisted = True
    caller_info = kwargs.pop("fit_info", None)
    infos: list[dict] = [{} for _ in lams]
    try:
        order = sorted(range(len(lams)), key=lambda i: -lams[i])
        betas: list[np.ndarray | None] = [None] * len(lams)
        prev = None
        for i in order:
            kw = dict(kwargs)
            kw["fit_info"] = infos[i]
            if warm and prev is not None:
                kw.setdefault("init_beta", prev)
            B = np.asarray(
                solvers.softmax_proximal(
                    df, k, regularizer=regularizer, lamduh=lams[i], **kw
                ),
                dtype=np.float64,
            )
            betas[i] = B
            prev = B
        if caller_info is not None:
            caller_info["per_lamduh"] = infos
        return np.stack(betas)
    finally:
        if we_persisted:
            df.unpersist()


def cv_fold_column(
    df: DataFrame,
    n_folds: int,
    features_col: str = "features",
    label_col: str = "label",
    fold_col: str = "_cvfold",
) -> DataFrame:
    """THE deterministic content-hash fold assignment — one definition
    (review r12) shared by ``cross_val_score`` and ``cv_lamduh``:
    ``xxhash64(features, label) % n_folds``, a pure narrow expression, so
    folds are identical across partitionings, reruns, and cluster shapes
    (``randomSplit`` changes with layout)."""
    from pyspark.sql import functions as F

    if n_folds < 2:
        raise ValueError(f"n_folds must be >= 2, got {n_folds}")
    return df.withColumn(
        fold_col, F.pmod(F.xxhash64(features_col, label_col), F.lit(n_folds))
    )


def cv_lamduh(
    df: DataFrame,
    lamduhs,
    solver: str = "proximal_grad",
    regularizer: str = "l1",
    family=Logistic,
    n_folds: int = 5,
    features_col: str = "features",
    label_col: str = "label",
    **kwargs,
) -> dict:
    """Cross-validated λ selection (the glmnet ``cv.glmnet`` analogue) —
    round 12. Per fold: one warm-started ``regularization_path`` over the
    train split's shared cache (strongest-λ-first, each fit a few rounds
    from its predecessor), then ONE ``kernels.multi_loss`` scan of the
    held-out split scoring ALL λ candidates together — k·(path fits) +
    k scans total, never a per-λ test job.

    Folds are the deterministic content-hash folds ``cross_val_score``
    uses (``xxhash64(features, label) % n_folds`` — identical across
    partitionings/reruns/cluster shapes; ``randomSplit`` is not).

    Returns ``{"best_lamduh", "mean_test_loss" (input order, per-row
    mean held-out NLL — the family's deviance-equivalent criterion),
    "fold_test_loss" (n_folds, len(lamduhs)), "betas" (full-data refit
    path, len(lamduhs) × p)}``. The final betas come from one
    regularization_path over the FULL frame (the standard cv.glmnet
    contract: select λ by CV, refit on everything)."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from dask_glm_spark.functions import kernels

    lams = [float(v) for v in lamduhs]
    if not lams:
        raise ValueError("lamduhs must be non-empty")

    # held-out scoring must use the SAME objective the fits minimize
    # (review r12): weighted fits score by the weighted per-unit NLL
    # Σw·ll/Σw, and offsets re-enter the test linear predictor
    weight_col = kwargs.get("weight_col")
    offset_col = kwargs.get("offset_col")
    folded = cv_fold_column(df, n_folds, features_col, label_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        fold_losses = np.empty((n_folds, len(lams)))
        for i in range(n_folds):
            train = folded.where(F.col("_cvfold") != i).drop("_cvfold")
            test = folded.where(F.col("_cvfold") == i).drop("_cvfold")
            betas = regularization_path(
                train, lams, solver=solver, regularizer=regularizer,
                family=family, features_col=features_col,
                label_col=label_col, **kwargs,
            )
            if weight_col is not None:
                row = test.agg(F.sum(weight_col).alias("sw")).first()
                denom = float(row["sw"] or 0.0)
            else:
                denom = float(test.count())
            if denom <= 0:
                raise ValueError(
                    f"fold {i} has no held-out mass (n_folds={n_folds} "
                    "too large for this dataset)"
                )
            losses = kernels.multi_loss(
                test, family, [betas[j] for j in range(len(lams))],
                features_col=features_col, label_col=label_col,
                weight_col=weight_col, offset_col=offset_col,
            )
            fold_losses[i] = np.asarray(losses) / denom
        mean_loss = fold_losses.mean(axis=0)
        best = lams[int(np.argmin(mean_loss))]
        # full-data refit runs on the STILL-CACHED folded frame (the
        # extra fold column is invisible to the solver's column-named
        # scans) — dropping _cvfold first yielded an uncached derived
        # frame that regularization_path persisted as a second full copy
        # of the dataset (ADVICE r12)
        betas_full = regularization_path(
            folded, lams, solver=solver,
            regularizer=regularizer, family=family,
            features_col=features_col, label_col=label_col, **kwargs,
        )
        return {
            "best_lamduh": best,
            "mean_test_loss": mean_loss,
            "fold_test_loss": fold_losses,
            "betas": betas_full,
            "lamduhs": lams,
        }
    finally:
        folded.unpersist()


def softmax_cv_lamduh(
    df: DataFrame,
    lamduhs,
    k: int,
    regularizer: str = "l1",
    n_folds: int = 5,
    features_col: str = "features",
    label_col: str = "label",
    **kwargs,
) -> dict:
    """Cross-validated λ selection for the JOINT multinomial path —
    round 13 (VERDICT r12 #6): the softmax twin of ``cv_lamduh``, so the
    multiclass user has a selector, not just a path. Per fold: one
    warm-started ``softmax_regularization_path`` over the train split's
    shared cache (strongest-λ-first, (p, k) warm starts), then ONE
    ``kernels.softmax_multi_loss`` scan of the held-out split scoring
    ALL λ candidates together — never a per-λ test job. Folds are the
    same deterministic content-hash folds every CV surface here uses
    (identical across partitionings/reruns/cluster shapes).

    ``label_col`` must hold class indices in [0, k) — the solver-level
    contract (use ``SoftmaxRegression`` for label mapping). ``weight_col``
    in kwargs scores by the weighted per-unit NLL Σw·ll/Σw, matching the
    weighted fit objective. Returns the ``cv_lamduh`` dict shape with
    ``betas`` of shape (len(lamduhs), p, k) — full-data refit over the
    STILL-CACHED folded frame (the ADVICE-r12 double-cache fix applies
    here too)."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from dask_glm_spark.functions import kernels

    lams = [float(v) for v in lamduhs]
    if not lams:
        raise ValueError("lamduhs must be non-empty")
    weight_col = kwargs.get("weight_col")
    folded = cv_fold_column(df, n_folds, features_col, label_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        fold_losses = np.empty((n_folds, len(lams)))
        for i in range(n_folds):
            train = folded.where(F.col("_cvfold") != i).drop("_cvfold")
            test = folded.where(F.col("_cvfold") == i).drop("_cvfold")
            betas = softmax_regularization_path(
                train, lams, k, regularizer=regularizer,
                features_col=features_col, label_col=label_col, **kwargs,
            )
            if weight_col is not None:
                row = test.agg(F.sum(weight_col).alias("sw")).first()
                denom = float(row["sw"] or 0.0)
            else:
                denom = float(test.count())
            if denom <= 0:
                raise ValueError(
                    f"fold {i} has no held-out mass (n_folds={n_folds} "
                    "too large for this dataset)"
                )
            losses = kernels.softmax_multi_loss(
                test, [betas[j] for j in range(len(lams))],
                features_col=features_col, label_col=label_col,
                weight_col=weight_col,
            )
            fold_losses[i] = np.asarray(losses) / denom
        mean_loss = fold_losses.mean(axis=0)
        best = lams[int(np.argmin(mean_loss))]
        betas_full = softmax_regularization_path(
            folded, lams, k, regularizer=regularizer,
            features_col=features_col, label_col=label_col, **kwargs,
        )
        return {
            "best_lamduh": best,
            "mean_test_loss": mean_loss,
            "fold_test_loss": fold_losses,
            "betas": betas_full,
            "lamduhs": lams,
        }
    finally:
        folded.unpersist()


def lamduh_max(
    df: DataFrame,
    family=Logistic,
    features_col: str = "features",
    label_col: str = "label",
    weight_col: str | None = None,
) -> float:
    """Smallest λ whose L1 solution is exactly zero: ``||∇L(0)||_∞`` (the
    sklearn/glmnet ``alpha_max`` convention) — one fused loss+gradient
    scan at β=0.

    Computed on the features AS GIVEN: pair it with ``normalize=False``
    fits (the raw-space penalty, matching MLlib's
    ``standardization=False``), or standardize the features yourself
    first — the default standardized fits penalize in a different space.
    """
    from dask_glm_spark.functions import kernels

    p = kernels.infer_p(df, features_col)
    _, grad = kernels.loss_gradient(
        df, family, np.zeros(p), p, features_col, label_col,
        weight_col=weight_col,
    )
    return float(np.max(np.abs(grad)))
