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
from dask_glm_spark.plans.layout import ensure_min_parallelism

# λ-sweep support: solvers whose objective actually contains lamduh*R
_PATH_SOLVERS = ("proximal_grad", "lbfgs", "admm")


def regularization_path(
    df: DataFrame,
    lamduhs,
    solver: str = "proximal_grad",
    regularizer: str = "l1",
    family=Logistic,
    warm: bool = True,
    batched: bool = False,
    **kwargs,
) -> np.ndarray:
    """Coefficients along a regularization path: returns ``(len(lamduhs),
    p)`` with row i the fit at ``lamduhs[i]`` (input order preserved).

    Fits execute in DESCENDING λ order regardless of input order — the
    heaviest-regularized fit is cheapest from zeros, and each subsequent
    fit warm-starts from its predecessor (``warm=False`` cold-starts
    every fit, for A/Bs). The input is persisted once around the sweep so
    the per-λ fits share one cache; with ``normalize`` on (the default)
    the λ-independent moments job runs ONCE here (r13) and seeds every
    dense fit through the wrapper's ``_moments`` hook — the identical
    floats each per-fit scan would have produced, so standardization is
    bit-equal to a standalone call (pinned in tests/test_model_selection).

    ``batched=True`` (round 13, proximal_grad only) runs every λ's ISTA
    state machine SIMULTANEOUSLY — one fused ``multi_loss_gradient``
    scan advances all still-active λ per iteration, instead of one fit's
    worth of scans per λ. At 100 TB the path's cost is passes over the
    data, and batching divides them by ~len(lamduhs): the sequential
    sweep pays Σ_i iters(λ_i) scans, the batched sweep max_i iters(λ_i)
    (each scan carrying every active λ's probe candidates). Per-λ update
    policy, acceptance, and stopping are EXACTLY ``_prox_loop``'s, so
    each row converges to the same point as a cold standalone fit
    (``warm`` is ignored — λs no longer chain; parity pinned in
    tests/test_model_selection.py). ``accelerate=True`` composes: the
    batched core then mirrors ``_fista_loop`` per λ (momentum,
    majorization acceptance, full-objective stopping — both mirrors are
    pinned bit-exactly against the sequential loops with shared numpy
    closures). Standardization is hoisted to ONE
    moments pass shared by all λ (same transform the per-fit pass would
    compute — it is λ-independent). Dense and wide-sparse inputs.
    """
    if solver not in _PATH_SOLVERS:
        raise ValueError(
            f"regularization_path supports solver in {_PATH_SOLVERS}, "
            f"got {solver!r}"
        )
    if batched:
        if solver != "proximal_grad":
            raise ValueError(
                "batched=True supports solver='proximal_grad' only, "
                f"got {solver!r}"
            )
        lams_b = [float(v) for v in lamduhs]
        if not lams_b:
            raise ValueError("lamduhs must be non-empty")
        if any(v < 0 for v in lams_b):
            raise ValueError("lamduhs must be >= 0")
        return _regularization_path_batched(
            df, lams_b, regularizer, family, **kwargs
        )
    lams = [float(v) for v in lamduhs]
    if not lams:
        raise ValueError("lamduhs must be non-empty")
    if any(v < 0 for v in lams):
        raise ValueError("lamduhs must be >= 0")
    fn = solvers._solvers[solver]

    from pyspark import StorageLevel

    we_persisted = False
    cached = None  # unpersist handle (df may be re-bound to a coalesce view)
    if not df.is_cached:
        # spread BEFORE caching (round 13) — the solvers' own @normalize
        # persist is skipped on an already-cached frame, so a 3-split
        # parquet would otherwise run every iteration scan 3-wide
        df = ensure_min_parallelism(df)
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        cached = df
        we_persisted = True
    # a caller-supplied fit_info would be shared (and silently
    # overwritten) by every per-λ fit — collect per-λ dicts instead,
    # returned in INPUT order under "per_lamduh"
    caller_info = kwargs.pop("fit_info", None)
    infos: list[dict] = [{} for _ in lams]
    try:
        # r13 (guide §2.1: don't run identical passes twice): the per-fit
        # @normalize moments job is λ-INDEPENDENT — same cached frame, same
        # weight column — so ONE fused moments scan here seeds every fit
        # through the wrapper's ``_moments`` hook. The seed holds the
        # identical floats each per-fit scan would produce (the sweep goes
        # from len(lams) moments jobs to 1); copies are passed per fit
        # because the wrapper zeroes the intercept coordinate in place.
        moments = None
        if kwargs.get("normalize", True):
            from dask_glm_spark.functions import kernels
            from dask_glm_spark.sources import vectors as V

            if not V.is_sparse_columns(df):
                moments = kernels.column_moments_full(
                    df,
                    kwargs.get("features_col", "features"),
                    weight_col=kwargs.get("weight_col"),
                )
        # r14 pass 3 (guide §2.2): the shared moments job materialized the
        # cache and yields n_rows — every per-λ fit's kernel evaluations
        # then run over a right-sized coalesce VIEW of it (see
        # plans.layout.right_size_kernel_cache; no-op at scale). persist is
        # forced off for the fits: a view is not ``is_cached``, and the
        # wrapper would otherwise build a second cache over this one.
        if we_persisted and moments is not None:
            from dask_glm_spark.plans.layout import right_size_kernel_cache

            df = right_size_kernel_cache(df, moments[0])
            kwargs.setdefault("persist", False)
        order = sorted(range(len(lams)), key=lambda i: -lams[i])
        betas: list[np.ndarray | None] = [None] * len(lams)
        prev = None
        for i in order:
            kw = dict(kwargs)
            kw["fit_info"] = infos[i]
            if moments is not None:
                kw["_moments"] = (
                    moments[0], moments[1].copy(), moments[2].copy(),
                )
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
            cached.unpersist()


# Candidate budget per batched probe scan, spread across the λs still
# backtracking — bounds the multi_loss_gradient partial at (1+p)·PROBE_TOTAL
# doubles per partition regardless of path length.
_BATCH_PROBE_TOTAL = 32


def _batched_prox_core(multi_lg, p, lams, regularizer, max_iter, tol,
                       init_beta, infos):
    """Every λ's ISTA state machine advanced by shared fused scans.

    Per-λ policy is byte-for-byte ``solvers._prox_loop``'s (same
    backtracking sequence s·mult^k, same first-simple-decrease
    acceptance, same step growth/underflow/relative-decrease stopping, and
    the accepted candidate's gradient feeds its next iteration) — the
    batching ONLY changes which scan evaluates a candidate, never which
    candidate is accepted: within an iteration the probe sequence is
    deterministic, so candidates can be co-evaluated speculatively across
    λ without reading each other's results. One multi_loss_gradient scan
    per probe round serves every active λ.
    """
    from dask_glm_spark.functions.regularizers import Regularizer

    reg = Regularizer.get(regularizer)
    L = len(lams)
    first_backtrack, next_backtrack = 0.1, 0.5
    step_growth = 1.25
    beta0 = solvers._init_vec(init_beta, p)
    betas = [beta0.copy() for _ in range(L)]
    steps = [1.0] * L
    bmult = [first_backtrack] * L
    done = [False] * L
    conv = [False] * L
    iters = [0] * L
    # one scan: loss+gradient at every starting β (identical starts give
    # identical columns — per-candidate results are column-independent)
    losses0, grads0 = multi_lg(betas)
    funcs = [float(losses0[i]) for i in range(L)]
    gradv = [np.asarray(grads0[:, i], dtype=np.float64) for i in range(L)]
    for _ in range(max_iter):
        active = [i for i in range(L) if not done[i]]
        if not active:
            break
        for i in active:
            iters[i] += 1
        # per-λ backtracking state for THIS iteration
        obeta = {i: betas[i] for i in active}
        lf = {i: funcs[i] for i in active}
        ograd = {i: gradv[i] for i in active}
        nexti = {i: 0 for i in active}       # next candidate index to probe
        accepted: dict[int, bool] = {}
        searching = list(active)
        while searching:
            cpl = max(1, _BATCH_PROBE_TOTAL // len(searching))
            batch: list[tuple[int, float, np.ndarray]] = []
            for i in searching:
                hi = min(nexti[i] + cpl, solvers.MAX_BACKTRACKS)
                for k in range(nexti[i], hi):
                    s = steps[i] * bmult[i] ** k
                    cand = reg.proximal_operator(
                        obeta[i] - s * ograd[i], s * lams[i]
                    )
                    batch.append((i, s, cand))
                nexti[i] = hi
            losses_b, grads_b = multi_lg([c for _, _, c in batch])
            next_searching = []
            pos_by_i: dict[int, list[int]] = {}
            for pos, (i, _, _) in enumerate(batch):
                pos_by_i.setdefault(i, []).append(pos)
            for i in searching:
                found = False
                for pos in pos_by_i[i]:
                    _, s, cand = batch[pos]
                    fval = float(losses_b[pos])
                    # mirror _prox_loop: every examined candidate becomes
                    # the iterate until one is accepted
                    betas[i] = cand
                    funcs[i] = fval
                    gradv[i] = np.asarray(grads_b[:, pos], dtype=np.float64)
                    if lf[i] - fval > 0:
                        steps[i] = s
                        found = True
                        break
                if found:
                    accepted[i] = True
                elif nexti[i] < solvers.MAX_BACKTRACKS:
                    next_searching.append(i)
                else:
                    accepted[i] = False
                    steps[i] = s  # last probed size (_prox_loop's for-else)
            searching = next_searching
        for i in active:
            if steps[i] == 0:
                done[i] = True  # step underflow: _prox_loop's hard break
                continue
            df_rel = (lf[i] - funcs[i]) / max(funcs[i], lf[i])
            if df_rel < tol:
                conv[i] = True
                done[i] = True
                continue
            steps[i] *= step_growth
            bmult[i] = next_backtrack
    for i in range(L):
        solvers._fill_info(infos[i], iters[i], conv[i])
    return np.stack(betas)


def _batched_fista_core(multi_lg, p, lams, regularizer, max_iter, tol,
                        init_beta, infos):
    """Every λ's FISTA state machine advanced by shared fused scans — the
    accelerated twin of ``_batched_prox_core`` (``solvers._fista_loop``'s
    per-λ policy byte-for-byte: the extrapolated-point gradient, the
    0.5^i backtracking sequence, the majorization acceptance test, the
    Nesterov momentum update, and the full-objective stopping rule).
    Per outer iteration: ONE multi_lg scan evaluates every active λ's
    extrapolated point, then shared probe scans carry every
    still-searching λ's candidates (probe losses read from the same
    multi_lg — the sparse sequential FISTA's convention; gradients ride
    along unused)."""
    from dask_glm_spark.functions.regularizers import Regularizer

    reg = Regularizer.get(regularizer)
    L = len(lams)
    x0 = solvers._init_vec(init_beta, p)
    xs = [x0.copy() for _ in range(L)]
    ys = [x0.copy() for _ in range(L)]
    ts = [1.0] * L
    steps = [1.0] * L
    fprev: list[float | None] = [None] * L
    done = [False] * L
    conv = [False] * L
    iters = [0] * L
    for _ in range(max_iter):
        active = [i for i in range(L) if not done[i]]
        if not active:
            break
        for i in active:
            iters[i] += 1
        fys, gys = multi_lg([ys[i] for i in active])
        fy = {i: float(fys[j]) for j, i in enumerate(active)}
        gy = {
            i: np.asarray(gys[:, j], dtype=np.float64)
            for j, i in enumerate(active)
        }
        nexti = {i: 0 for i in active}
        result: dict[int, tuple | None] = {}
        searching = list(active)
        while searching:
            cpl = max(1, _BATCH_PROBE_TOTAL // len(searching))
            batch: list[tuple[int, float, np.ndarray]] = []
            for i in searching:
                hi = min(nexti[i] + cpl, solvers.MAX_BACKTRACKS)
                for kk in range(nexti[i], hi):
                    s = steps[i] * (0.5 ** kk)
                    cand = reg.proximal_operator(
                        ys[i] - s * gy[i], s * lams[i]
                    )
                    batch.append((i, s, cand))
                nexti[i] = hi
            losses_b, _ = multi_lg([c for _, _, c in batch])
            pos_by_i: dict[int, list[int]] = {}
            for pos, (i, _, _) in enumerate(batch):
                pos_by_i.setdefault(i, []).append(pos)
            nxt = []
            for i in searching:
                found = False
                for pos in pos_by_i[i]:
                    _, s, cand = batch[pos]
                    fval = float(losses_b[pos])
                    d = cand - ys[i]
                    if fval <= fy[i] + gy[i] @ d + (d @ d) / (2.0 * s):
                        result[i] = (cand, fval, s)
                        found = True
                        break
                if found:
                    continue
                if nexti[i] < solvers.MAX_BACKTRACKS:
                    nxt.append(i)
                else:
                    result[i] = None
            searching = nxt
        for i in active:
            r = result[i]
            if r is None:
                done[i] = True  # step underflow: y_i is numerically fixed
                continue
            xn, fx, s = r
            steps[i] = s
            tn = (1.0 + np.sqrt(1.0 + 4.0 * ts[i] * ts[i])) / 2.0
            ys[i] = xn + ((ts[i] - 1.0) / tn) * (xn - xs[i])
            xs[i], ts[i] = xn, tn
            fobj = fx + lams[i] * reg.f(xn)
            if fprev[i] is not None and abs(fprev[i] - fobj) / max(
                abs(fobj), abs(fprev[i]), 1.0
            ) < tol:
                conv[i] = True
                done[i] = True
                continue
            fprev[i] = fobj
            steps[i] *= 1.25
    for i in range(L):
        solvers._fill_info(infos[i], iters[i], conv[i])
    return np.stack(xs)


def _regularization_path_batched(df, lams, regularizer, family, **kwargs):
    """Dispatch + standardization wrapper for the batched λ-path: persist
    once, hoist ONE moments pass (λ-independent — the same transform every
    per-fit ``@normalize`` pass would compute), run the batched core in
    the standardized space, back-transform every row exactly as
    ``solvers.normalize`` does per fit. Wide-sparse (findices, fvalues)
    input runs the O(k·nnz) sparse probe kernel and never standardizes
    (the sparse-path contract)."""
    from pyspark import StorageLevel

    from dask_glm_spark.functions import kernels, kernels_sparse
    from dask_glm_spark.sources import vectors as V

    features_col = kwargs.pop("features_col", "features")
    label_col = kwargs.pop("label_col", "label")
    idx_col = kwargs.pop("idx_col", "findices")
    val_col = kwargs.pop("val_col", "fvalues")
    weight_col = kwargs.pop("weight_col", None)
    offset_col = kwargs.pop("offset_col", None)
    max_iter = kwargs.pop("max_iter", 100)
    tol = kwargs.pop("tol", 1e-8)
    init_beta = kwargs.pop("init_beta", None)
    accelerate = kwargs.pop("accelerate", False)
    do_norm = kwargs.pop("normalize", True)
    p = kwargs.pop("p", None)
    caller_info = kwargs.pop("fit_info", None)
    if kwargs:
        raise TypeError(
            f"unexpected keyword arguments for batched path: {sorted(kwargs)}"
        )
    infos: list[dict] = [{} for _ in lams]
    core = _batched_fista_core if accelerate else _batched_prox_core
    sparse = V.is_sparse_columns(df, idx_col, val_col)

    we_persisted = False
    if not df.is_cached:
        df = ensure_min_parallelism(df)
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        we_persisted = True
    try:
        if sparse:
            pp = int(p) if p else V.sparse_p(df, idx_col)

            def multi_lg(cands):
                return kernels_sparse.multi_loss_gradient_sparse(
                    df, family, cands, pp, idx_col, val_col, label_col,
                    weight_col=weight_col, offset_col=offset_col,
                )

            out = core(
                multi_lg, pp, lams, regularizer, max_iter, tol,
                init_beta, infos,
            )
        elif not do_norm:
            pp = int(p) if p else kernels.infer_p(df, features_col)

            def multi_lg(cands):
                return kernels.multi_loss_gradient(
                    df, family, cands, features_col, label_col,
                    weight_col=weight_col, offset_col=offset_col,
                )

            out = core(
                multi_lg, pp, lams, regularizer, max_iter, tol,
                init_beta, infos,
            )
        else:
            # solvers.normalize's exact quirks, hoisted once: population
            # std, >1 constant column raises, no-constant-column means
            # scale-only standardization
            _, mean, std = kernels.column_moments_full(
                df, features_col, weight_col=weight_col
            )
            pp = len(mean)
            intercept_idx = np.where(std == 0)[0]
            if len(intercept_idx) > 1:
                raise ValueError("Multiple constant columns detected!")
            mean[intercept_idx] = 0
            std[intercept_idx] = 1
            if len(intercept_idx) == 0:
                mean = np.zeros_like(mean)
            ib = init_beta
            if ib is not None:
                ib = np.asarray(ib, dtype=np.float64).ravel()
                if ib.shape != std.shape:
                    raise ValueError(
                        f"init_beta must have shape {std.shape}, got {ib.shape}"
                    )
                ib_std = ib * std
                ib_std[intercept_idx] += np.sum(ib * mean)
                ib = ib_std
            dfn = df.withColumn(
                features_col,
                kernels.standardize_expr(mean, std, features_col),
            )

            def multi_lg(cands):
                return kernels.multi_loss_gradient(
                    dfn, family, cands, features_col, label_col,
                    weight_col=weight_col, offset_col=offset_col,
                )

            out = core(
                multi_lg, pp, lams, regularizer, max_iter, tol, ib, infos,
            )
            # per-row inverse of solvers.normalize's back-transform
            for b in out:
                i_adj = np.sum(b * mean / std)
                b[intercept_idx] -= i_adj
                b /= std
        if caller_info is not None:
            caller_info["per_lamduh"] = infos
        return out
    finally:
        if we_persisted:
            df.unpersist()


def softmax_regularization_path(
    df: DataFrame,
    lamduhs,
    k: int,
    regularizer: str = "l1",
    warm: bool = True,
    batched: bool = False,
    **kwargs,
) -> np.ndarray:
    """Multinomial λ-path (round 12): the softmax twin of
    ``regularization_path`` over ``solvers.softmax_proximal`` — returns
    ``(len(lamduhs), p, k)`` with row i the joint fit at ``lamduhs[i]``
    (input order preserved; execution strongest-λ-first with (p, k)
    warm starts over one shared cache). ``label_col`` must hold class
    indices in [0, k) — the solver-level contract; use
    ``SoftmaxRegression`` for label mapping.

    ``batched=True`` (round 13): every λ's FISTA state machine advanced
    by shared ``softmax_multi_loss_gradient`` scans — the multinomial
    twin of ``regularization_path(batched=True)``, same Σ-of-iterations →
    max-of-iterations pass count. Per-λ policy is exactly
    ``solvers._fista_loop``'s (the loop ``softmax_proximal`` runs), so
    each row lands on the cold standalone fit's optimum; ``warm`` is
    ignored. Dense features only (the ``softmax_proximal`` scope)."""
    lams = [float(v) for v in lamduhs]
    if not lams:
        raise ValueError("lamduhs must be non-empty")
    if any(v < 0 for v in lams):
        raise ValueError("lamduhs must be >= 0")
    if batched:
        return _softmax_path_batched(df, lams, k, regularizer, **kwargs)

    from pyspark import StorageLevel

    we_persisted = False
    if not df.is_cached:
        # spread BEFORE caching (round 13) — the solvers' own @normalize
        # persist is skipped on an already-cached frame, so a 3-split
        # parquet would otherwise run every iteration scan 3-wide
        df = ensure_min_parallelism(df)
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


def _softmax_path_batched(df, lams, k, regularizer, **kwargs):
    """Batched multinomial λ-path: one ``_SoftmaxStandardizer`` pass
    hoisted for all λ (the same λ-independent transform each
    ``softmax_proximal`` call would compute), then ``_batched_fista_core``
    over the flattened (p·k) vectors with ONE
    ``softmax_multi_loss_gradient`` scan per evaluation round. Probe
    scans ride the same kernel (gradients along unused — the sparse
    sequential FISTA convention), so the per-scan partial is
    c·(1 + p·k) doubles; the candidate budget caps c at
    ``_BATCH_PROBE_TOTAL``."""
    from pyspark import StorageLevel

    from dask_glm_spark.functions import kernels

    features_col = kwargs.pop("features_col", "features")
    label_col = kwargs.pop("label_col", "label")
    weight_col = kwargs.pop("weight_col", None)
    max_iter = kwargs.pop("max_iter", 100)
    tol = kwargs.pop("tol", 1e-8)
    init_beta = kwargs.pop("init_beta", None)
    normalize = kwargs.pop("normalize", True)
    caller_info = kwargs.pop("fit_info", None)
    if kwargs:
        raise TypeError(
            f"unexpected keyword arguments for batched path: {sorted(kwargs)}"
        )
    infos: list[dict] = [{} for _ in lams]
    we_persisted = False
    if not df.is_cached:
        df = ensure_min_parallelism(df)
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        we_persisted = True
    try:
        stdz = solvers._SoftmaxStandardizer(
            df, features_col, weight_col, normalize
        )
        p, dfn = stdz.p, stdz.dfn
        b0 = stdz.forward(init_beta, k)

        def multi_lg(cands):
            return kernels.softmax_multi_loss_gradient(
                dfn,
                [np.asarray(c, dtype=np.float64).reshape(p, k) for c in cands],
                features_col, label_col, weight_col=weight_col,
            )

        flat = _batched_fista_core(
            multi_lg, p * k, lams, regularizer, max_iter, tol, b0, infos,
        )
        if caller_info is not None:
            caller_info["per_lamduh"] = infos
        return np.stack(
            [
                stdz.backward(
                    np.asarray(v, dtype=np.float64).reshape(p, k)
                )
                for v in flat
            ]
        )
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
    folded = ensure_min_parallelism(
        cv_fold_column(df, n_folds, features_col, label_col)
    ).persist(StorageLevel.MEMORY_AND_DISK)
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
            # denominator (Σw or row count) fused into the scoring scan —
            # the separate agg/count job was a second full pass over the
            # held-out split per fold (r13, guide §2.1)
            losses, denom = kernels.multi_loss(
                test, family, [betas[j] for j in range(len(lams))],
                features_col=features_col, label_col=label_col,
                weight_col=weight_col, offset_col=offset_col,
                with_denom=True,
            )
            if denom <= 0:
                raise ValueError(
                    f"fold {i} has no held-out mass (n_folds={n_folds} "
                    "too large for this dataset)"
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
    folded = ensure_min_parallelism(
        cv_fold_column(df, n_folds, features_col, label_col)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        fold_losses = np.empty((n_folds, len(lams)))
        for i in range(n_folds):
            train = folded.where(F.col("_cvfold") != i).drop("_cvfold")
            test = folded.where(F.col("_cvfold") == i).drop("_cvfold")
            betas = softmax_regularization_path(
                train, lams, k, regularizer=regularizer,
                features_col=features_col, label_col=label_col, **kwargs,
            )
            # denominator fused into the scoring scan (r13, guide §2.1 —
            # see cv_lamduh)
            losses, denom = kernels.softmax_multi_loss(
                test, [betas[j] for j in range(len(lams))],
                features_col=features_col, label_col=label_col,
                weight_col=weight_col, with_denom=True,
            )
            if denom <= 0:
                raise ValueError(
                    f"fold {i} has no held-out mass (n_folds={n_folds} "
                    "too large for this dataset)"
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


def softmax_lamduh_max(
    df: DataFrame,
    k: int,
    features_col: str = "features",
    label_col: str = "label",
    weight_col: str | None = None,
) -> float:
    """Multinomial twin of ``lamduh_max`` (round 13): ``||∇L(0)||_∞``
    over the flattened (p, k) gradient — at B=0 every class probability
    is 1/k and one fused ``softmax_loss_gradient`` scan yields
    Xᵀ(1/k − onehot); any ``lamduh`` at or above this soft-thresholds
    the whole first ISTA/FISTA step to zero, and B=0 satisfies the L1
    stationarity condition (the elementwise penalty's subdifferential
    covers every coordinate). Same raw-space caveat as the binary
    version: pair with ``normalize=False`` or standardize yourself."""
    from dask_glm_spark.functions import kernels

    p = kernels.infer_p(df, features_col)
    _, G = kernels.softmax_loss_gradient(
        df, np.zeros((p, k)), features_col, label_col,
        weight_col=weight_col,
    )
    return float(np.max(np.abs(G)))
