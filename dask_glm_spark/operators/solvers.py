"""The five GLM solvers: driver-resident control flow over kernel jobs.

Reference semantics: ``dask_glm/algorithms.py`` (each solver's docstring
cites the lines it replicates). The universal input is one DataFrame with
``features: array<double>`` and ``label: double`` columns; model state
(beta, p floats) lives on the driver and is folded into each job as
codegen literals or closure capture — never shuffled.

Per-iteration cluster cost (the scale contract):

  solver            jobs/iter   bytes leaving executors
  ----------------- ----------- -------------------------
  lbfgs             1           p + 1 floats per partition
  gradient_descent  ~probes/8   (k·(p+1) floats per partition; the fused
                                probe also returns candidate gradients, so
                                the per-iteration gradient job is gone — r7)
  proximal_grad     ~probes/8   (same)
  newton            1           p² + p floats per partition
  admm              1           p floats per partition (NO scan of X by the
                                JVM at all — partition-local scipy solves)

X is scanned from cache each job (MEMORY_AND_DISK); lineage never grows
because every job is a fresh plan over the cached scan — Spark's analogue
of the reference's ``recalcRate`` graph-depth bounding (algorithms.py:117)
comes for free.
"""

from __future__ import annotations

from functools import wraps

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_glm_spark.functions import kernels
from dask_glm_spark.functions.families import Logistic
from dask_glm_spark.functions.regularizers import Regularizer
from dask_glm_spark.plans.layout import (
    ensure_min_parallelism,
    right_size_kernel_cache,
)

import logging

_log = logging.getLogger(__name__)

PROBE_BATCH = 8  # line-search candidates evaluated per scan
MAX_BACKTRACKS = 100  # reference: algorithms.py:71,478
MIN_ADMM_BLOCK_ROWS = 100_000  # admm: amortize per-round task overhead
# ~160 MB of X at p=100: the largest block worth materializing as one
# numpy array on an executor; past this the nblocks heuristic adds blocks
# beyond core count rather than growing blocks with n.
MAX_ADMM_BLOCK_ROWS = 2_000_000
# Wide-p twin caps (round 11): the row caps alone are a memory hazard at
# large p (a 2M-row block is 80 MB of X at the benched p=5 but 16 GB at
# p=1000). Block sizing takes min(row cap, byte cap / 8p) on both ends —
# chosen so the byte caps only BIND past p≈8 (8 MB / 8·100k = p 10;
# 128 MB / 8·2M = p 8): every benched/gated plan (p ≤ 6) is untouched.
MIN_ADMM_BLOCK_BYTES = 8 * 1024 * 1024
MAX_ADMM_BLOCK_BYTES = 128 * 1024 * 1024
# Measured bound (round 11, examples/wide_p_probe.py on local[32], 200k
# rows): newton's per-iteration wall is 7.4 s at p=256 and 42.8 s at
# p=1024 — vs lbfgs ~6.6 s/iter at the same p=1024 — because the fused
# Gram partial is p² doubles per partition (8 MB at p=1024) plus a p×p
# driver lstsq, both growing quadratically while lbfgs carries O(p).
# Past this, newton is the wrong plan; warn, don't refuse (small-n wide-p
# fits on a cached frame can still prefer its quadratic convergence).
NEWTON_WIDE_P = 1024


def normalize(algo):
    """Standardize-fit-backtransform wrapper (``dask_glm/utils.py:14-39``).

    Reference quirks replicated exactly:
    - population std (numpy ddof=0) — Spark's ``stddev`` would be wrong;
    - >1 constant column raises;
    - when NO constant column exists the mean is treated as zero (scale-only
      standardization) — see ``utils.py:26-30``.

    Also owns persistence: the input is cached here (the moments pass is
    the first materialization, mirroring the reference's first compute at
    ``utils.py:19``), and the standardized view is lazy arithmetic over the
    cache — nothing standardized is ever materialized.

    Warm start (beyond-reference, round 10): a caller-supplied
    ``init_beta`` is in the ORIGINAL feature space (the same space as the
    returned coefficients), so it is forward-transformed here into the
    standardized space the wrapped solver optimizes in — the exact inverse
    of the back-transform below (``out/std`` with the intercept
    adjustment), so ``init_beta=previous_fit`` resumes at the previous
    optimum regardless of standardization.
    """

    @wraps(algo)
    def wrapped(df: DataFrame, *args, **kwargs):
        do_norm = kwargs.pop("normalize", True)
        # r13: ``_moments`` lets λ-sweep callers (regularization_path)
        # seed the λ-independent (n_rows, mean, std) from ONE shared scan
        # instead of re-running the identical moments job per fit. The
        # seed must be the exact tuple column_moments_full would return
        # for (df, features_col, weight_col) — callers pass array copies
        # because mean/std are mutated in place below.
        moments_seed = kwargs.pop("_moments", None)
        features_col = kwargs.get("features_col", "features")
        persist = kwargs.pop("persist", True)
        we_persisted = False
        cached = None  # the handle unpersist must see (df may be re-bound
        # to a coalesce view of this cache below)
        if persist and not df.is_cached:
            # Single-row-group inputs arrive as ONE scan task; every
            # iteration would then run on one core. Spread BEFORE caching
            # (no-op whenever the scan already has >= core-count splits).
            # ADMM owns its block layout (nblocks; 0 = keep the caller's
            # partitioning verbatim) — repartitioning here would both
            # double-shuffle and silently break that contract.
            if algo.__name__ != "admm":
                df = ensure_min_parallelism(df)
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            cached = df
            we_persisted = True
        try:
            if not do_norm:
                return algo(df, *args, **kwargs)
            # ONE fused preamble job: n/p/mean/std from a single Arrow scan
            # (round 6); p and n thread into the solver via kwargs so no
            # solver re-probes them with extra jobs.
            # weighted fits standardize with the WEIGHTED moments (ADVICE
            # r10) — the moments of the row-replicated dataset, so the L2/L1
            # penalty applies in the same standardized space replication
            # (and MLlib's weighted summarizer) would produce
            n_rows, mean, std = (
                moments_seed
                if moments_seed is not None
                else kernels.column_moments_full(
                    df, features_col, weight_col=kwargs.get("weight_col")
                )
            )
            kwargs.setdefault("p", len(mean))
            kwargs.setdefault("n_rows", n_rows)
            intercept_idx = np.where(std == 0)[0]
            if len(intercept_idx) > 1:
                raise ValueError("Multiple constant columns detected!")
            mean[intercept_idx] = 0
            std[intercept_idx] = 1
            if len(intercept_idx) == 0:
                mean = np.zeros_like(mean)
            # r14 pass 3 (guide §2.2): the moments job just materialized
            # the cache AND told us n_rows — every subsequent kernel
            # evaluation then runs over a coalesce VIEW sized to the data
            # instead of the blanket core-count partitioning (a 600k-row
            # bench cache pays ~60 ms/evaluation of task scheduling at 32
            # partitions vs ~10). View only, no re-materialization; the
            # original handle is what gets unpersisted in finally. ADMM is
            # excluded (it owns its block layout via nblocks).
            if we_persisted and algo.__name__ != "admm":
                df = right_size_kernel_cache(df, n_rows)
            ib = kwargs.get("init_beta")
            if ib is not None:
                # inverse of the back-transform: b -> b*std, then the
                # intercept coordinate absorbs sum(b*mean) (mean is already
                # zeroed at the intercept index, so the sum is over the
                # non-constant columns only)
                ib = np.asarray(ib, dtype=np.float64).ravel()
                if ib.shape != std.shape:
                    raise ValueError(
                        f"init_beta must have shape {std.shape}, got {ib.shape}"
                    )
                ib_std = ib * std
                ib_std[intercept_idx] += np.sum(ib * mean)
                kwargs["init_beta"] = ib_std
            dfn = df.withColumn(
                features_col, kernels.standardize_expr(mean, std, features_col)
            )
            out = np.array(algo(dfn, *args, **kwargs), dtype=np.float64)
            i_adj = np.sum(out * mean / std)
            out[intercept_idx] -= i_adj
            return out / std
        finally:
            if we_persisted:
                cached.unpersist()

    return wrapped


def _armijo_probe(
    multi_loss_grad,
    beta,
    step_dir,
    lf,
    step_size,
    steplen,
    armijo_mult,
    backtrack_mult,
):
    """Backtracking Armijo line search (``algorithms.py:27-86``), with the
    sequential candidate schedule evaluated in batched single-scan probes.

    Candidates ``s_i = step_size * backtrack_mult**i`` are exactly the
    reference's sequence; evaluating PROBE_BATCH of them per scan keeps the
    accept decision identical (first ``i`` meeting the Armijo test wins)
    while cutting jobs ~8x. ``multi_loss_grad(candidates) -> (losses,
    grads)`` is the one-scan FUSED probe kernel (round 7): each probe also
    returns the candidates' gradients, so the accepted candidate's
    gradient is handed back for the next outer iteration and the separate
    per-iteration loss_gradient scan disappears — GD runs ~one job per
    iteration. Dense or sparse, the control flow is identical.

    Returns (step_size, loss, grad_at_new_beta | None) — None only with
    step 0 (beta unchanged; caller breaks)."""
    func = lf
    for base in range(0, MAX_BACKTRACKS, PROBE_BATCH):
        # clamp the final batch so exactly MAX_BACKTRACKS candidates are
        # evaluated (the reference evaluates exactly 100, algorithms.py:71)
        sizes = [
            step_size * backtrack_mult**i
            for i in range(base, min(base + PROBE_BATCH, MAX_BACKTRACKS))
        ]
        # reference early-exit (algorithms.py:73-75): candidate beta no
        # longer distinguishable from current beta -> stepSize 0.
        candidates, kept_sizes = [], []
        for idx, s in enumerate(sizes):
            cand = beta - s * step_dir
            if (base + idx) > 0 and np.array_equal(cand, beta):
                if candidates:
                    losses, grads = multi_loss_grad(candidates)
                    for i, (s2, fval) in enumerate(zip(kept_sizes, losses)):
                        if lf - fval >= armijo_mult * s2 * steplen:
                            return s2, fval, grads[:, i]
                return 0.0, func, None
            candidates.append(cand)
            kept_sizes.append(s)
        losses, grads = multi_loss_grad(candidates)
        for i, (s2, fval) in enumerate(zip(kept_sizes, losses)):
            func = fval
            if lf - fval >= armijo_mult * s2 * steplen:
                return s2, fval, grads[:, i]
    return kept_sizes[-1], func, grads[:, -1]



def _resolve_p(df, features_col, kwargs):
    """p threaded from @normalize's fused moments pass when present
    (kwargs['p']); direct solver calls (normalize=False) probe it."""
    p = kwargs.pop("p", None)
    return int(p) if p else kernels.infer_p(df, features_col)


def _reject_offset_col(kwargs, solver_name: str) -> None:
    """Loud failure for solvers without offset/exposure support — their
    ``**kwargs`` would otherwise silently swallow ``offset_col`` and fit
    with NO offset. (Only the joint-softmax objectives remain guarded.)"""
    if kwargs.pop("offset_col", None) is not None:
        raise NotImplementedError(
            f"{solver_name} does not support offset_col; fit per-class "
            "binary models (OvR) instead"
        )


def _warm_converged(compute_loss_grad, x0, pgtol, fit_info) -> bool:
    """Iteration-0 convergence check for L-BFGS warm restarts.

    Restarting AT a converged optimum is degenerate for scipy's
    optimizer: the prior fit stopped either right at the pgtol boundary
    or (at large n, where |loss| is O(n)) on the factr relative-decrease
    test with a still-sizeable gradient — either way the restart sits on
    a machine-flat function and the first line search burns ~MAXLS=20
    objective scans before the factr stop fires (measured: 22 funcalls /
    9.5 s vs 12 / 4.3 cold at sf0.1). Two explicit scans reproduce both
    of scipy's own stopping tests up front: the pgtol check at x0, then
    one gradient-step probe at scipy's first-trial step size — if the
    probe can't decrease f measurably (the factr criterion), the line
    search wouldn't either (backtracking only shrinks the step). Genuine
    refits (data actually changed) fail both checks after 2 scans and
    proceed; restart-on-unchanged-data returns in 2 scans instead of 22.
    """
    f0, g0 = compute_loss_grad(x0)
    if float(np.max(np.abs(g0))) <= pgtol:
        _fill_info(fit_info, 0, True, funcalls=1)
        return True
    gnorm = float(np.linalg.norm(g0))
    s0 = min(1.0 / gnorm, 1.0)  # scipy's first trial step
    # Quadratic model along d=-g through (f0, slope -|g|², f(s)): the best
    # achievable decrease on that ray is |g|⁴/(4c). At a factr-converged
    # optimum of a large-n loss the valley is steep-walled but machine-
    # flat at the bottom (measured at sf0.1: the unit trial step RAISES f
    # by 2e5 while the achievable decrease is 1.6e-7 against a 1.4e-3
    # factr threshold) — exactly the shape that makes the Wolfe search
    # burn its full eval budget. A genuinely-moved problem (new data, new
    # λ) has an achievable decrease orders above the threshold and falls
    # through to the real optimizer. c <= 0 (non-convex reading) always
    # falls through.
    #
    # TWO probe scales (s0 and s0/2, ADVICE r10 backstop): a single probe
    # can be fooled by pathological curvature — a penalty wall inside
    # (s0/2, s0] inflates c while the true curvature near 0 is small and a
    # shorter step still decreases f measurably. Requiring the machine-flat
    # reading at both scales (and no actual decrease at either probe)
    # catches that family; unchanged-data restarts now cost 3 scans instead
    # of 2 — still far below the ~22-funcall Wolfe burn this guard avoids.
    gsq = gnorm * gnorm
    eps = float(np.finfo(np.float64).eps)
    thresh = 1e7 * eps * max(abs(f0), 1.0)
    for s in (s0, 0.5 * s0):
        fs, _ = compute_loss_grad(x0 - s * g0)
        if fs < f0 - thresh:  # the probe itself made measurable progress
            return False
        c = (fs - f0 + s * gsq) / (s * s)
        if not (c > 0 and (gsq * gsq) / (4.0 * c) <= thresh):
            return False
    _fill_info(fit_info, 0, True, funcalls=3)
    return True


def _init_vec(init_beta, p: int) -> np.ndarray:
    """Resolve a solver's starting point: zeros (the reference's init) or a
    caller-supplied warm start (beyond-reference, round 10 — refit after an
    append, resume after a failure, or continue a standardized fit)."""
    if init_beta is None:
        return np.zeros(p)
    beta0 = np.array(init_beta, dtype=np.float64).ravel()
    if beta0.shape != (p,):
        raise ValueError(f"init_beta must have shape ({p},), got {beta0.shape}")
    return beta0


def _fill_info(fit_info, n_iter: int, converged: bool, **extra) -> None:
    """Record convergence diagnostics into the caller-supplied ``fit_info``
    dict (round 10): every solver fills ``n_iter`` (iterations executed)
    and ``converged`` (tolerance-based stop fired, vs budget exhausted or
    step underflow). No-op when the caller passed none."""
    if fit_info is not None:
        fit_info["n_iter"] = int(n_iter)
        fit_info["converged"] = bool(converged)
        fit_info.update(extra)


def _gd_loop(
    loss_grad, multi_loss_grad, p, max_iter, tol, init_beta=None,
    fit_info=None,
):
    """Gradient-descent control flow shared by the dense and sparse paths:
    ONE ``loss_grad(beta0)`` scan up front, then ~one fused probe scan per
    iteration — ``multi_loss_grad`` returns each candidate's gradient, and
    the accepted candidate's gradient IS the next iteration's (round 7;
    previously every iteration paid a separate loss_gradient job). The
    candidate schedule, Armijo accept rule, and convergence checks are
    unchanged — the gradient the probe hands back is the same quantity the
    dropped job recomputed."""
    first_backtrack, next_backtrack = 0.1, 0.5
    armijo_mult, step_growth = 0.1, 1.25
    step_size = 1.0
    backtrack_mult = first_backtrack
    beta = _init_vec(init_beta, p)

    converged = False
    it = 0
    func, grad = loss_grad(beta)
    for it in range(1, max_iter + 1):
        steplen = float(np.sum(grad**2))
        lf = func
        step_size, func, ngrad = _armijo_probe(
            multi_loss_grad, beta, grad, lf, step_size, steplen,
            armijo_mult, backtrack_mult,
        )
        beta = beta - step_size * grad
        if step_size == 0:
            break
        df_rel = (lf - func) / max(func, lf)
        if df_rel < tol:
            converged = True
            break
        step_size *= step_growth
        backtrack_mult = next_backtrack
        grad = ngrad
    _fill_info(fit_info, it, converged)
    return beta


def _prox_loop(
    loss_grad, multi_loss_grad, p, regularizer, lamduh, max_iter, tol,
    init_beta=None, fit_info=None,
):
    """Proximal-gradient / ISTA control flow shared by the dense and sparse
    paths (``algorithms.py:422-505``): ONE fused loss+gradient scan up
    front, then batched FUSED probe scans per iteration where each
    candidate is ``prox(beta - s*grad, s*lamduh)`` and acceptance is
    simple decrease (``df > 0``, :489-491). As in ``_gd_loop`` (round 7),
    the probe returns each candidate's gradient, so the accepted (or last
    evaluated) candidate's gradient feeds the next iteration without a
    separate scan."""
    first_backtrack, next_backtrack = 0.1, 0.5
    step_growth = 1.25
    step_size = 1.0
    backtrack_mult = first_backtrack
    beta = _init_vec(init_beta, p)
    regularizer = Regularizer.get(regularizer)

    converged = False
    it = 0
    func, grad = loss_grad(beta)
    for it in range(1, max_iter + 1):
        obeta = beta
        lf = func
        ngrad = grad
        accepted = False
        for base in range(0, MAX_BACKTRACKS, PROBE_BATCH):
            sizes = [
                step_size * backtrack_mult**i
                for i in range(base, min(base + PROBE_BATCH, MAX_BACKTRACKS))
            ]
            cands = [
                regularizer.proximal_operator(obeta - s * grad, s * lamduh)
                for s in sizes
            ]
            losses, grads = multi_loss_grad(cands)
            for i, (s, cand, fval) in enumerate(zip(sizes, cands, losses)):
                beta, func, ngrad = cand, fval, grads[:, i]
                if lf - fval > 0:
                    step_size = s
                    accepted = True
                    break
            if accepted:
                break
        else:
            step_size = sizes[-1]
        if step_size == 0:
            break
        df_rel = (lf - func) / max(func, lf)
        if df_rel < tol:
            converged = True
            break
        step_size *= step_growth
        backtrack_mult = next_backtrack
        grad = ngrad
    _fill_info(fit_info, it, converged)
    return beta


def _fista_loop(
    loss_grad, multi_loss_grad, p, regularizer, lamduh, max_iter, tol,
    init_beta=None, fit_info=None,
):
    """Accelerated proximal gradient (FISTA, Beck & Teboulle 2009) — the
    beyond-reference fast path behind ``proximal_grad(accelerate=True)``.

    Why it exists: the reference's ISTA step policy (replicated exactly in
    ``_prox_loop``) terminates on relative SMOOTH-loss decrease, and once
    backtracking has shrunk the step the per-iteration decrease can drop
    below ``tol`` while the iterate is still ~1e-3 from the optimum (seen
    against the MLlib/OWL-QN oracle in tests/test_mllib_oracle.py). FISTA's
    O(1/k^2) rate plus a majorization-based acceptance reaches oracle-grade
    optima in tens of iterations.

    Per iteration: one fused loss+gradient scan at the extrapolated point
    ``y`` plus batched candidate-loss probe scans (the same two kernel
    surfaces ISTA uses — no new kernel). Acceptance is the backtracking
    majorization test ``f(x) <= f(y) + g·(x-y) + ||x-y||^2/(2s)`` (required
    for the accelerated rate; plain decrease is not valid under momentum).
    Convergence on the relative change of the FULL objective
    ``f(x) + lamduh*R(x)`` — the quantity the optimum actually minimizes."""
    step_size = 1.0
    regularizer = Regularizer.get(regularizer)
    x = _init_vec(init_beta, p)
    yk = x.copy()
    t = 1.0
    fobj_prev = None
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        fy, gy = loss_grad(yk)
        accepted = False
        fx = fy
        xn = yk
        for base in range(0, MAX_BACKTRACKS, PROBE_BATCH):
            sizes = [
                step_size * (0.5 ** i)
                for i in range(base, min(base + PROBE_BATCH, MAX_BACKTRACKS))
            ]
            cands = [
                regularizer.proximal_operator(yk - s * gy, s * lamduh)
                for s in sizes
            ]
            losses, _ = multi_loss_grad(cands)
            for s, cand, fval in zip(sizes, cands, losses):
                d = cand - yk
                if fval <= fy + gy @ d + (d @ d) / (2.0 * s):
                    xn, fx, step_size = cand, fval, s
                    accepted = True
                    break
            if accepted:
                break
        if not accepted:
            break  # step underflow: yk is numerically a fixed point
        tn = (1.0 + np.sqrt(1.0 + 4.0 * t * t)) / 2.0
        yk = xn + ((t - 1.0) / tn) * (xn - x)
        x, t = xn, tn
        fobj = fx + lamduh * regularizer.f(x)
        if fobj_prev is not None and abs(fobj_prev - fobj) / max(
            abs(fobj), abs(fobj_prev), 1.0
        ) < tol:
            converged = True
            break
        fobj_prev = fobj
        step_size *= 1.25  # mild growth: re-probe larger steps next round
    _fill_info(fit_info, it, converged)
    return x


def gd_step(
    df: DataFrame,
    beta,
    stepsize: float,
    family=Logistic,
    features_col: str = "features",
    label_col: str = "label",
    path: str = "auto",
    compute_loss: bool = True,
) -> tuple[np.ndarray, float | None]:
    """ONE unrolled fixed-step gradient-descent iteration.

    Exactly the update line of the GD loop (``beta - stepSize * grad``,
    reference ``algorithms.py:154``; our ``_gd_loop`` at the
    ``beta = beta - step_size * grad`` line) with the line search pinned to
    a fixed ``stepsize`` so the iteration becomes a deterministic, SQL-
    expressible two-pass dataflow: one fused loss+gradient scan at ``beta``
    and one loss scan at the updated ``beta1``. Returns ``(beta1, loss at
    beta1)``. This is the oracle surface for the solver update math (q48):
    the same ``kernels.loss_gradient`` the real loop calls, hash-checked
    against DuckDB running the algebra symbolically.

    ``compute_loss=False`` (r14, guide §2.4) skips the loss scan and
    returns ``(beta1, None)`` — for callers that already evaluate a fused
    probe at a candidate set containing ``beta1`` (q48's
    ``multi_loss_gradient [BETA, beta1]``), whose candidate loss is
    bit-identical to the skipped job (same per-row terms, same row-order
    accumulation per candidate; pinned by
    tests/test_kernels.py::test_multi_loss_gradient_candidate_loss_matches_loss).
    """
    beta = np.asarray(beta, dtype=np.float64)
    p = len(beta)
    _, grad = kernels.loss_gradient(
        df, family, beta, p, features_col, label_col, path
    )
    beta1 = beta - float(stepsize) * grad
    if not compute_loss:
        return beta1, None
    loss1 = kernels.loss(
        df, family, beta1,
        features_col=features_col, label_col=label_col, path=path,
    )
    return beta1, float(loss1)


def prox_step(
    df: DataFrame,
    beta,
    stepsize: float,
    lamduh: float,
    regularizer="l1",
    family=Logistic,
    features_col: str = "features",
    label_col: str = "label",
    path: str = "auto",
    candidate=None,
) -> np.ndarray:
    """ONE unrolled proximal-gradient iteration at a fixed step size.

    The candidate construction of the ISTA loop (reference
    ``algorithms.py:479-481``: ``prox(beta - s*grad, s*lamduh)``; our
    ``_prox_loop`` candidate line) with the backtracking pinned so the
    update is deterministic. Uses the REAL ``Regularizer.proximal_operator``
    — for q49 the DuckDB oracle re-derives the L1 soft-threshold
    symbolically, putting the prox math under the hash gate.

    ``candidate`` (r14, guide §2.4): a precomputed ``beta - stepsize*grad``
    — when the caller just ran ``gd_step`` at the SAME (beta, stepsize),
    its ``beta1`` IS this candidate, so passing it skips a duplicate
    gradient job; the result is bit-identical because the skipped job is
    deterministic (pinned by tests/test_solvers_steps parity).
    """
    beta = np.asarray(beta, dtype=np.float64)
    p = len(beta)
    if candidate is None:
        _, grad = kernels.loss_gradient(
            df, family, beta, p, features_col, label_col, path
        )
        candidate = beta - float(stepsize) * grad
    reg = Regularizer.get(regularizer)
    return reg.proximal_operator(
        np.asarray(candidate, dtype=np.float64),
        float(stepsize) * float(lamduh),
    )


@normalize
def gradient_descent(
    df: DataFrame,
    max_iter: int = 100,
    tol: float = 1e-14,
    family=Logistic,
    features_col: str = "features",
    label_col: str = "label",
    path: str = "auto",
    init_beta=None,
    **kwargs,
):
    """Batch GD with Armijo backtracking (``algorithms.py:89-167``).

    One fused loss+gradient scan per iteration (the reference's separate
    grad / Xgradient / line-search jobs collapse: loss and gradient share
    the xb subexpression — O4) plus batched line-search probes.
    ``init_beta`` warm-starts the iteration (original feature space; the
    ``@normalize`` wrapper owns the transform). ``weight_col`` names a
    per-row sample-weight column (weighted GLM, round 10): loss/gradient
    become Σ w·ll and Xᵀ(w⊙r) — same scans, one extra multiply.
    """
    p = _resolve_p(df, features_col, kwargs)
    weight_col = kwargs.pop("weight_col", None)
    offset_col = kwargs.pop("offset_col", None)
    return _gd_loop(
        lambda beta: kernels.loss_gradient(
            df, family, beta, p, features_col, label_col, path,
            weight_col=weight_col, offset_col=offset_col,
        ),
        lambda cands: kernels.multi_loss_gradient(
            df, family, cands, features_col, label_col, path,
            weight_col=weight_col, offset_col=offset_col,
        ),
        p, max_iter, tol, init_beta, kwargs.pop("fit_info", None),
    )


@normalize
def newton(
    df: DataFrame,
    max_iter: int = 50,
    tol: float = 1e-8,
    family=Logistic,
    features_col: str = "features",
    label_col: str = "label",
    path: str = "auto",
    init_beta=None,
    **kwargs,
):
    """Full Newton (``algorithms.py:170-221``): one fused grad+Hessian scan
    per iteration; the p×p solve stays driver-side numpy (lstsq), exactly
    like the reference. ``init_beta`` warm-starts the iteration;
    ``weight_col`` names a sample-weight column (weighted IRLS:
    grad = Xᵀ(w⊙r), hess = Xᵀdiag(w⊙hw)X).

    Wide p: the Gram partial is p² doubles PER PARTITION and the solve is
    a p×p driver lstsq — measured 6.5× lbfgs's per-iteration wall at
    p=1024 (``NEWTON_WIDE_P``; examples/wide_p_probe.py). Past that a
    warning recommends lbfgs (O(p) partials) instead."""
    p = _resolve_p(df, features_col, kwargs)
    if p > NEWTON_WIDE_P:
        _log.warning(
            "newton at p=%d: the fused Gram partial is p^2 doubles per "
            "partition (%.0f MB) and each iteration solves a p x p lstsq "
            "on the driver — measured ~6.5x lbfgs's per-iteration cost at "
            "p=1024 (round-11 wide-p probe). Prefer solver='newton_cg' "
            "(matrix-free, O(p) partials, same semantics) or 'lbfgs' for "
            "wide dense features.",
            p, p * p * 8 / 1e6,
        )
    weight_col = kwargs.pop("weight_col", None)
    offset_col = kwargs.pop("offset_col", None)
    fit_info = kwargs.pop("fit_info", None)
    beta = _init_vec(init_beta, p)
    iter_count = 0
    converged = False
    tol_ok = False
    while not converged:
        grad, hess = kernels.gradient_hessian(
            df, family, beta, p, features_col, label_col, path,
            weight_col=weight_col, offset_col=offset_col,
        )
        step, *_ = np.linalg.lstsq(hess, grad, rcond=-1)
        beta_old = beta
        beta = beta_old - step
        iter_count += 1
        coef_change = np.absolute(beta_old - beta)
        # loop condition is reference-exact (can run max_iter+1 steps);
        # converged_ reports whether the TOL test fired, not the budget
        tol_ok = not np.any(coef_change > tol)
        converged = tol_ok or (iter_count > max_iter)
    _fill_info(fit_info, iter_count, tol_ok)
    return beta


def _cg_solve(matvec, b, rtol: float, maxiter: int, first_matvec=None):
    """Conjugate gradient for ``A x = b`` with A given only as a matvec
    closure (driver-side numpy; each ``matvec`` call is one cluster scan in
    newton_cg). Stops at relative residual ``rtol`` or ``maxiter``.

    ``first_matvec``: optional precomputed ``A·b`` — since the first CG
    direction IS b, a caller that already evaluated ``A·b`` (e.g. the
    identification probe in ``sparse_coef_se``) saves one full cluster
    scan (review r12).

    Returns ``(x, n_matvecs, rel_resid)``; ``rel_resid`` is the final
    ``‖Ax − b‖/‖b‖``, so callers needing a TIGHT solve (inference) can
    verify convergence — truncation is deliberate in newton_cg, which
    ignores it.

    Truncated-Newton negative-curvature guard: GLM Fisher information is
    PSD, but data can make it singular along a direction — if ``dᵀAd <= 0``
    CG stops and returns the progress so far (the raw gradient when it
    happens on the very first step, i.e. a plain descent direction).
    """
    x = np.zeros_like(b)
    r = b.copy()
    d = r.copy()
    rs = float(r @ r)
    bnorm = np.sqrt(rs)
    stop = (rtol * bnorm) ** 2
    n_mv = 0
    for it in range(maxiter):
        if rs <= stop:
            break
        if it == 0 and first_matvec is not None:
            Ad = first_matvec
        else:
            Ad = matvec(d)
            n_mv += 1
        dAd = float(d @ Ad)
        if dAd <= 0:
            if it == 0:
                x = b.copy()
            break
        alpha = rs / dAd
        x += alpha * d
        r -= alpha * Ad
        rs_new = float(r @ r)
        d = r + (rs_new / rs) * d
        rs = rs_new
    rel = np.sqrt(rs) / bnorm if bnorm > 0 else 0.0
    return x, n_mv, rel


@normalize
def newton_cg(
    df: DataFrame,
    max_iter: int = 50,
    tol: float = 1e-8,
    family=Logistic,
    features_col: str = "features",
    label_col: str = "label",
    path: str = "auto",
    init_beta=None,
    cg_tol: float | None = None,
    max_cg_iter: int | None = None,
    **kwargs,
):
    """Matrix-free truncated Newton (Newton-CG) — round 12.

    Same semantics as ``newton`` (reference ``algorithms.py:170-221``:
    full Newton step, no line search, coefficient-change stopping rule),
    but the p×p system is solved by conjugate gradient using only
    Hessian-vector products ``Xᵀ(hw ⊙ (X·v))`` — one fused Arrow scan per
    CG iteration, O(p) bytes per partition, no p² object anywhere (not in
    partials, not on the driver). This removes the ``NEWTON_WIDE_P`` wall:
    ``newton`` ships p² doubles per partition and runs a p×p driver lstsq
    (measured 110.7 s/iter at p=2048, round-11 probe); newton_cg's
    per-iteration cost is (#CG steps) × one lbfgs-shaped scan.

    CG forcing sequence: ``cg_tol=None`` uses Eisenstat-Walker
    ``min(0.5, sqrt(||g||))`` relative residual (superlinear local
    convergence without over-solving early iterations); pass an explicit
    ``cg_tol`` to pin it. ``max_cg_iter`` defaults to ``min(p, 64)``.
    Supports ``weight_col`` / ``offset_col`` like every dense solver.
    """
    p = _resolve_p(df, features_col, kwargs)
    weight_col = kwargs.pop("weight_col", None)
    offset_col = kwargs.pop("offset_col", None)
    return _newton_cg_loop(
        lambda beta: kernels.gradient(
            df, family, beta, p=p, features_col=features_col,
            label_col=label_col, path=path, weight_col=weight_col,
            offset_col=offset_col,
        ),
        lambda beta, v: kernels.hessian_vector_product(
            df, family, beta, v, p=p, features_col=features_col,
            label_col=label_col, path=path, weight_col=weight_col,
            offset_col=offset_col,
        ),
        p, max_iter, tol, init_beta, kwargs.pop("fit_info", None),
        cg_tol, max_cg_iter,
    )


def _newton_cg_loop(
    gradient_fn, hvp_fn, p, max_iter, tol, init_beta, fit_info,
    cg_tol, max_cg_iter,
):
    """Truncated-Newton control flow shared by the dense and sparse
    paths: per outer iteration one gradient scan, then CG on the Hvp
    closure; stopping rule and budget semantics match ``newton``."""
    if max_cg_iter is None:
        max_cg_iter = min(p, 64)
    beta = _init_vec(init_beta, p)
    iter_count = 0
    converged = False
    tol_ok = False
    total_cg = 0
    while not converged:
        grad = gradient_fn(beta)
        gnorm = float(np.linalg.norm(grad))
        if gnorm == 0.0:
            step = np.zeros(p)
        else:
            rtol = cg_tol if cg_tol is not None else min(0.5, np.sqrt(gnorm))
            b = beta
            step, n_mv, _ = _cg_solve(
                lambda v: hvp_fn(b, v), grad, rtol=rtol, maxiter=max_cg_iter,
            )
            total_cg += n_mv
        beta_old = beta
        beta = beta_old - step
        iter_count += 1
        coef_change = np.absolute(beta_old - beta)
        # loop shape matches newton (reference-exact budget semantics)
        tol_ok = not np.any(coef_change > tol)
        converged = tol_ok or (iter_count > max_iter)
    _fill_info(fit_info, iter_count, tol_ok, cg_iters=total_cg)
    return beta


@normalize
def lbfgs(
    df: DataFrame,
    regularizer=None,
    lamduh: float = 1.0,
    max_iter: int = 100,
    tol: float = 1e-4,
    family=Logistic,
    verbose: bool = False,
    features_col: str = "features",
    label_col: str = "label",
    path: str = "auto",
    init_beta=None,
    **kwargs,
):
    """scipy L-BFGS-B on the driver; each objective evaluation is ONE fused
    loss+gradient scan (``algorithms.py:351-419``; the reference's shared
    ``compute(loss_fn, gradient_fn)`` at :405 is the same single-scan idea).
    Architecturally identical to MLlib's LogisticRegression (breeze LBFGS +
    treeAggregate), which doubles as an independent oracle in tests.
    ``init_beta`` warm-starts the optimizer."""
    from dask_glm_spark.functions.optimize import fmin_l_bfgs_b

    p = _resolve_p(df, features_col, kwargs)
    weight_col = kwargs.pop("weight_col", None)
    offset_col = kwargs.pop("offset_col", None)
    fit_info = kwargs.pop("fit_info", None)
    reg_f = reg_grad = None
    if regularizer is not None:
        reg = Regularizer.get(regularizer)
        reg_f, reg_grad = reg.f, reg.gradient

    def compute_loss_grad(beta):
        loss, grad = kernels.loss_gradient(
            df, family, beta, p, features_col, label_col, path,
            weight_col=weight_col, offset_col=offset_col,
        )
        if reg_f is not None:
            loss = loss + lamduh * reg_f(beta)
            grad = grad + lamduh * reg_grad(beta)
        return loss, grad

    x0 = _init_vec(init_beta, p)
    if init_beta is not None and _warm_converged(
        compute_loss_grad, x0, tol, fit_info
    ):
        return x0
    beta, _, d = fmin_l_bfgs_b(
        compute_loss_grad,
        x0,
        fprime=None,
        iprint=(verbose > 0) - 1,
        pgtol=tol,
        maxiter=max_iter,
    )
    _fill_info(
        fit_info, d.get("nit", 0), d.get("warnflag", 1) == 0,
        funcalls=int(d.get("funcalls", 0)),
    )
    return beta


@normalize
def proximal_grad(
    df: DataFrame,
    regularizer="l1",
    lamduh: float = 0.1,
    family=Logistic,
    max_iter: int = 100,
    tol: float = 1e-8,
    features_col: str = "features",
    label_col: str = "label",
    path: str = "auto",
    accelerate: bool = False,
    init_beta=None,
    **kwargs,
):
    """Proximal gradient / ISTA with backtracking (``algorithms.py:422-505``).

    Per outer iteration: one fused loss+gradient scan, then batched probe
    scans where each candidate is ``prox(beta - s*grad, s*lamduh)`` and
    acceptance is simple decrease (``df > 0``, :489-491).

    ``accelerate=True`` (beyond-reference, round 8): FISTA momentum with
    majorization backtracking — same two kernel surfaces, O(1/k^2) rate,
    and a full-objective stopping rule; reaches the MLlib/OWL-QN optimum
    where the reference's step policy stalls (see ``_fista_loop``)."""
    p = _resolve_p(df, features_col, kwargs)
    weight_col = kwargs.pop("weight_col", None)
    offset_col = kwargs.pop("offset_col", None)
    loop = _fista_loop if accelerate else _prox_loop
    return loop(
        lambda beta: kernels.loss_gradient(
            df, family, beta, p, features_col, label_col, path,
            weight_col=weight_col, offset_col=offset_col,
        ),
        lambda cands: kernels.multi_loss_gradient(
            df, family, cands, features_col, label_col, path,
            weight_col=weight_col, offset_col=offset_col,
        ),
        p, regularizer, lamduh, max_iter, tol, init_beta,
        kwargs.pop("fit_info", None),
    )


def lbfgs_sparse(
    df: DataFrame,
    regularizer=None,
    lamduh: float = 1.0,
    max_iter: int = 100,
    tol: float = 1e-4,
    family=Logistic,
    p: int | None = None,
    idx_col: str = "findices",
    val_col: str = "fvalues",
    label_col: str = "label",
    init_beta=None,
    **kwargs,
):
    """L-BFGS over wide-sparse ``(indices, values)`` features.

    Same driver-optimizer / cluster-evaluator split as ``lbfgs``, but each
    objective evaluation is one O(nnz) scan via
    ``kernels_sparse.loss_gradient_sparse`` — rows are never densified.
    No ``@normalize``: standardizing one-hot columns would densify them,
    which is exactly why the reference auto-disables normalization for
    sparse inputs (``dask_glm/estimators.py:82-83``).
    """
    from dask_glm_spark.functions import kernels_sparse
    from dask_glm_spark.functions.optimize import fmin_l_bfgs_b

    weight_col = kwargs.pop("weight_col", None)
    offset_col = kwargs.pop("offset_col", None)
    fit_info = kwargs.pop("fit_info", None)
    persist = kwargs.pop("persist", True)

    reg_f = reg_grad = None
    if regularizer is not None:
        reg = Regularizer.get(regularizer)
        reg_f, reg_grad = reg.f, reg.gradient

    def body(dfc, pp):
        def compute_loss_grad(beta):
            loss, grad = kernels_sparse.loss_gradient_sparse(
                dfc, family, beta, pp, idx_col, val_col, label_col,
                weight_col=weight_col, offset_col=offset_col,
            )
            if reg_f is not None:
                loss = loss + lamduh * reg_f(beta)
                grad = grad + lamduh * reg_grad(beta)
            return loss, grad

        x0 = _init_vec(init_beta, pp)
        if init_beta is not None and _warm_converged(
            compute_loss_grad, x0, tol, fit_info
        ):
            return x0
        beta, _, d = fmin_l_bfgs_b(
            compute_loss_grad,
            x0,
            fprime=None,
            pgtol=tol,
            maxiter=max_iter,
        )
        _fill_info(
            fit_info, d.get("nit", 0), d.get("warnflag", 1) == 0,
            funcalls=int(d.get("funcalls", 0)),
        )
        return beta

    return _run_sparse(df, idx_col, p, body, persist=persist)


def _run_sparse(df, idx_col, p, body, persist=True):
    """Persist-if-needed wrapper shared by the sparse solvers: caches the
    (indices, values, label) frame for the iteration scans, resolves p, and
    runs ``body(df, p)``. ``persist=False`` (round 13) skips the cache —
    the sparse-OvR parent persists ONCE and each per-class relabeled view
    scans that cache through a narrow withColumn, exactly the dense OvR
    contract (k classes never means k cached copies)."""
    from dask_glm_spark.sources.vectors import sparse_p

    we_persisted = False
    if persist and not df.is_cached:
        df = ensure_min_parallelism(df)
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        we_persisted = True
    try:
        return body(df, p or sparse_p(df, idx_col))
    finally:
        if we_persisted:
            df.unpersist()


def gradient_descent_sparse(
    df: DataFrame,
    max_iter: int = 100,
    tol: float = 1e-14,
    family=Logistic,
    p: int | None = None,
    idx_col: str = "findices",
    val_col: str = "fvalues",
    label_col: str = "label",
    init_beta=None,
    **kwargs,
):
    """Batch GD over wide-sparse ``(indices, values)`` features: the exact
    ``_gd_loop`` control flow of the dense solver, with O(nnz) scan kernels
    and O(p) bytes leaving each executor. No ``@normalize`` — same rationale
    as ``lbfgs_sparse`` (standardizing one-hot columns densifies them;
    reference auto-disables it, ``dask_glm/estimators.py:82-83``)."""
    from dask_glm_spark.functions import kernels_sparse

    weight_col = kwargs.pop("weight_col", None)
    offset_col = kwargs.pop("offset_col", None)
    persist = kwargs.pop("persist", True)
    return _run_sparse(
        df, idx_col, p,
        lambda dfc, pp: _gd_loop(
            lambda beta: kernels_sparse.loss_gradient_sparse(
                dfc, family, beta, pp, idx_col, val_col, label_col,
                weight_col=weight_col, offset_col=offset_col,
            ),
            lambda cands: kernels_sparse.multi_loss_gradient_sparse(
                dfc, family, cands, pp, idx_col, val_col, label_col,
                weight_col=weight_col, offset_col=offset_col,
            ),
            pp, max_iter, tol, init_beta, kwargs.pop("fit_info", None),
        ),
        persist=persist,
    )


def newton_cg_sparse(
    df: DataFrame,
    max_iter: int = 50,
    tol: float = 1e-8,
    family=Logistic,
    p: int | None = None,
    idx_col: str = "findices",
    val_col: str = "fvalues",
    label_col: str = "label",
    init_beta=None,
    cg_tol: float | None = None,
    max_cg_iter: int | None = None,
    **kwargs,
):
    """Matrix-free truncated Newton over wide-sparse features — round 12.
    Plain ``newton`` is excluded from the sparse path because its p²
    Gram is the wrong object at hashed-text widths; the Hvp
    (``kernels_sparse.hessian_vector_product_sparse``, two O(nnz)
    bincount scatters per batch, O(p) partials) never forms it, so
    wide-sparse fits get Newton semantics too. Same control flow as the
    dense ``newton_cg`` (``_newton_cg_loop``); no standardization, like
    every sparse solver."""
    from dask_glm_spark.functions import kernels_sparse

    weight_col = kwargs.pop("weight_col", None)
    offset_col = kwargs.pop("offset_col", None)
    persist = kwargs.pop("persist", True)
    return _run_sparse(
        df, idx_col, p,
        lambda dfc, pp: _newton_cg_loop(
            lambda beta: kernels_sparse.loss_gradient_sparse(
                dfc, family, beta, pp, idx_col, val_col, label_col,
                weight_col=weight_col, offset_col=offset_col,
            )[1],
            lambda beta, v: kernels_sparse.hessian_vector_product_sparse(
                dfc, family, beta, v, pp, idx_col, val_col, label_col,
                weight_col=weight_col, offset_col=offset_col,
            ),
            pp, max_iter, tol, init_beta, kwargs.pop("fit_info", None),
            cg_tol, max_cg_iter,
        ),
        persist=persist,
    )


def proximal_grad_sparse(
    df: DataFrame,
    regularizer="l1",
    lamduh: float = 0.1,
    family=Logistic,
    max_iter: int = 100,
    tol: float = 1e-8,
    p: int | None = None,
    idx_col: str = "findices",
    val_col: str = "fvalues",
    label_col: str = "label",
    accelerate: bool = False,
    init_beta=None,
    **kwargs,
):
    """Proximal gradient over wide-sparse features — L1 on hashed text is
    the canonical sparse GLM workload (reference runs every solver on
    sparse inputs, ``dask_glm/tests/test_estimators.py:57-135``). Same
    ``_prox_loop`` control flow as the dense solver with O(nnz) kernels;
    ``accelerate=True`` swaps in the FISTA loop (see ``proximal_grad``)."""
    from dask_glm_spark.functions import kernels_sparse

    weight_col = kwargs.pop("weight_col", None)
    offset_col = kwargs.pop("offset_col", None)
    persist = kwargs.pop("persist", True)
    return _run_sparse(
        df, idx_col, p,
        lambda dfc, pp: (_fista_loop if accelerate else _prox_loop)(
            lambda beta: kernels_sparse.loss_gradient_sparse(
                dfc, family, beta, pp, idx_col, val_col, label_col,
                weight_col=weight_col, offset_col=offset_col,
            ),
            lambda cands: kernels_sparse.multi_loss_gradient_sparse(
                dfc, family, cands, pp, idx_col, val_col, label_col,
                weight_col=weight_col, offset_col=offset_col,
            ),
            pp, regularizer, lamduh, max_iter, tol, init_beta,
            kwargs.pop("fit_info", None),
        ),
        persist=persist,
    )


class _AugmentedFamily:
    """Weighted and/or offset view of a family for the ADMM local solves:
    the block's ``y`` buffer carries ``vstack([y][, w][, o])`` (rows in
    that fixed order) and the adapter splits it — the consensus machinery
    stays weight/offset-agnostic (round 10). Module-level so block
    closures pickle."""

    def __init__(self, fam, weighted: bool, offset: bool):
        self.fam = fam
        self.weighted = weighted
        self.offset = offset

    def _split(self, Y):
        y = Y[0]
        i = 1
        w = None
        o = None
        if self.weighted:
            w = Y[i]
            i += 1
        if self.offset:
            o = Y[i]
        return y, w, o

    def pointwise_loss(self, beta, X, Y):
        y, w, o = self._split(Y)
        xb = X.dot(np.ravel(beta))
        if o is not None:
            xb = xb + o
        terms = self.fam.loglike_terms_np(xb, y)
        return float(np.dot(w, terms)) if w is not None else float(np.sum(terms))

    def pointwise_gradient(self, beta, X, Y):
        y, w, o = self._split(Y)
        xb = X.dot(np.ravel(beta))
        if o is not None:
            xb = xb + o
        r = self.fam.residual_np(xb, y)
        return X.T.dot(w * r if w is not None else r)


def _admm_local_update(X, y, beta, z, u, rho, family, solver=None):
    """Single-partition augmented-Lagrangian solve (``algorithms.py:339-348``,
    objective augmentation :263-283). Pure numpy — runs inside the Arrow
    batch on each executor's Python worker."""
    from dask_glm_spark.functions.optimize import fmin_l_bfgs_b

    solver = solver or fmin_l_bfgs_b

    def f(b, X_, y_, z_, u_, rho_):
        return family.pointwise_loss(b, X_, y_) + (rho_ / 2) * np.dot(
            b - z_ + u_, b - z_ + u_
        )

    def fprime(b, X_, y_, z_, u_, rho_):
        return family.pointwise_gradient(b, X_, y_) + rho_ * (b - z_ + u_)

    solver_args = (X, y, z.ravel(), u.ravel(), rho)
    beta, _, _ = solver(
        f, beta.ravel(), fprime=fprime, args=solver_args, maxiter=200, maxfun=250
    )
    return beta


@normalize
def admm(
    df: DataFrame,
    regularizer="l1",
    lamduh: float = 0.1,
    rho: float = 1,
    over_relax: float = 1,
    max_iter: int = 250,
    abstol: float = 1e-4,
    reltol: float = 1e-2,
    family=Logistic,
    features_col: str = "features",
    label_col: str = "label",
    nblocks: int | None = None,
    init_beta=None,
    **kwargs,
):
    """Consensus ADMM (``algorithms.py:224-336``) with executor-resident
    per-partition state. ``init_beta`` warm-starts z AND every block's
    local β_i at the supplied point (duals start at zero — the standard
    ADMM restart); with ``init_beta=None`` the reference init (z=0,
    β_i=1) is preserved bit-for-bit. ``weight_col`` (sample weights) and
    ``offset_col`` (fixed linear-predictor offset, e.g. log-exposure)
    ride inside each cached block (stacked with y) and only the local
    loss/gradient change (``_AugmentedFamily``) — the consensus rounds
    and their O(p) traffic are identical.

    ``nblocks`` controls the consensus block count (the reference's dask
    chunk count). Default: ``min(sc.defaultParallelism, rows // 100k)``
    (at least 1) — a raw parquet scan can arrive as a handful of
    file-splits (or ONE, on a single-file table), which would serialize
    the entire fit into one task; conversely, blocks much under ~100k rows
    make the per-round task/serialization overhead dominate the local
    solves (measured: 32 tiny blocks are ~40% slower than 6 right-sized
    ones at 600k rows). At cluster scale rows/100k >> cores, so the
    default degenerates to one block per core — exactly what consensus
    ADMM wants. Pass ``nblocks=0`` to keep the input partitioning
    (pre-partitioned pipelines), or an explicit count.

    Scale design (VERDICT r1 #8 hardening): round 1 materializes each
    partition as a cached numpy block ``(pid, X, y, beta_i, u_i,
    beta_hat_i)`` — after that, per-round cluster traffic is exactly

      driver -> executors : z            (p floats, ONE broadcast)
      executors -> driver : (beta_i, beta_hat_i + u_i) per partition
                            (2p floats each — needed for the global z-prox
                             and the residual stopping rule)

    ``u_i``/``beta_i`` NEVER leave their executor: the dual update
    ``u_i += beta_hat_i - z`` is computed partition-locally at the start of
    the next round, when the new ``z`` arrives (same update order as the
    reference, deferred by half a round). The old design broadcast a dict of
    every partition's state — O(k*p) bytes to every executor per round,
    quadratic-ish at many-partitions x wide-p.

    Block lineage: each round is ``blocks.map(...)``; persisted per round,
    previous round unpersisted (checkpointed rounds keep their blocks —
    they ARE the checkpoint), ``localCheckpoint`` every 10 rounds bounds
    the chain (the reference's recalcRate rhythm, algorithms.py:117).
    X converts Arrow->numpy ONCE at block build (vectorized buffer reshape,
    no per-row Python); rounds touch only numpy.
    """
    weight_col = kwargs.pop("weight_col", None)
    offset_col = kwargs.pop("offset_col", None)
    fit_info = kwargs.pop("fit_info", None)
    block_storage = kwargs.pop("block_storage", "auto")
    regularizer = Regularizer.get(regularizer)
    p = _resolve_p(df, features_col, kwargs)

    augmented = weight_col is not None or offset_col is not None
    fam = (
        _AugmentedFamily(family, weight_col is not None, offset_col is not None)
        if augmented
        else family
    )
    sc = df.sparkSession.sparkContext
    # Block store (round 13, VERDICT r12 #8): 'disk' writes each block as
    # a local .npy pair and caches only the paths — rounds memmap straight
    # from page cache, so the one-time multi-GB pickled block build (the
    # 100× probe's single-JVM GC component) AND the per-round JVM→Python
    # block copy both disappear. 'auto' enables it ONLY in local mode:
    # there one JVM holds every block (the GC effect) and one filesystem
    # guarantees path visibility. On a real cluster the blocks already
    # spread across executor JVMs (heap pressure divides by the executor
    # count) and a round task rescheduled off the writing executor under
    # delay scheduling would not see the file — the JVM block-manager
    # cache stays the robust default there.
    if block_storage == "auto":
        block_storage = "disk" if sc.master.startswith("local") else "jvm"
    if block_storage not in ("disk", "jvm"):
        raise ValueError(
            f"block_storage must be 'auto', 'disk' or 'jvm', got "
            f"{block_storage!r}"
        )

    cur = df.rdd.getNumPartitions()
    if nblocks is None:
        # row count threaded from @normalize's fused moments pass when
        # present; a direct admm() call pays one cached-scan count
        n_rows = kwargs.pop("n_rows", None)
        if n_rows is None:
            with kernels.kernel_exec(df.sparkSession):
                n_rows = df.count()
        # Both caps are min(row cap, byte cap / 8p): identical to the
        # row-only heuristic at the benched p <= 6, but at wide p (round
        # 11 probe) the byte caps keep each materialized numpy block
        # bounded in BYTES, not rows — at p=1000 the max block is ~16k
        # rows (128 MB), never the 16 GB a 2M-row block would be.
        row_bytes = 8 * max(p, 1)
        min_rows = max(1, min(MIN_ADMM_BLOCK_ROWS,
                              MIN_ADMM_BLOCK_BYTES // row_bytes))
        max_rows = max(min_rows, min(MAX_ADMM_BLOCK_ROWS,
                                     MAX_ADMM_BLOCK_BYTES // row_bytes))
        nblocks = max(1, min(sc.defaultParallelism, n_rows // min_rows))
        # memory guard: one-block-per-core would make each materialized
        # numpy block n_rows/cores × p doubles — unbounded in n. Cap block
        # rows so a huge-n fit raises the block count past core count
        # (tasks queue; consensus still sees every block each round)
        # instead of building multi-GB partitions.
        nblocks = max(nblocks, n_rows // max_rows)
        # Round-9 A/B note: keeping an already-right-sized input layout to
        # skip the repartition exchange was tried and MEASURED SLOWER
        # (interleaved in-process A/B at sf0.1: 3-split input kept = 6.2 s
        # min vs repartition-to-6 = 4.4 s min). The exchange costs ~0.8 s
        # once, but the first-round cache materialization (parquet read +
        # standardize + numpy block build, the fit's most CPU-heavy pass)
        # parallelizes nblocks-wide and dominates — don't "fix" this again.
    if nblocks and cur != nblocks:
        if nblocks < cur:
            # contiguous merge, NO shuffle — each block is a union of
            # adjacent input splits, exactly the reference's dask-array
            # chunking (contiguous row ranges, algorithms.py admm blocks),
            # and a full-data exchange cheaper at any scale. Round-robin
            # repartition bought nothing: consensus ADMM only needs every
            # block visited per round, not IID blocks, and the reference
            # itself fits contiguous chunks.
            df = df.coalesce(nblocks)
        else:
            # can't split partitions without an exchange (rare: tiny
            # file-split count on a single-file table)
            df = df.repartition(nblocks)

    # Block build (VERDICT r2 #3): one Arrow pass converts each partition
    # to a single (pid, X-bytes, y-bytes) row — column batches flatten to
    # numpy via zero-copy buffer views, never a per-row Python loop over
    # pickled Rows. The tiny one-row-per-partition DataFrame then crosses
    # to the RDD layer, where np.frombuffer restores the blocks.
    aux_cols = [c for c in (weight_col, offset_col) if c is not None]
    n_yrows = 1 + len(aux_cols)

    def _assemble_block(batches):
        """Arrow batches -> one (pid, X, y) numpy block (zero-copy buffer
        reshape, never a per-row Python loop)."""
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        Xs, ys = [], []
        auxs = [[] for _ in aux_cols]
        for batch in batches:
            if batch.num_rows == 0:
                continue
            feats = batch.column(0)
            flat = feats.flatten()  # list<double> -> values array
            Xs.append(flat.to_numpy(zero_copy_only=False).reshape(-1, p))
            ys.append(batch.column(1).to_numpy(zero_copy_only=False))
            for j in range(len(aux_cols)):
                auxs[j].append(
                    batch.column(2 + j).to_numpy(zero_copy_only=False)
                )
        if not Xs:
            return None
        X = np.ascontiguousarray(np.concatenate(Xs))
        y = np.concatenate(ys)
        if aux_cols:
            # y-buffer carries vstack([y][, w][, o]); _AugmentedFamily
            # splits it in the local solves
            y = np.vstack([y] + [np.concatenate(a) for a in auxs])
        y = np.ascontiguousarray(y)
        return pid, X, y

    def build_block_arrow(batches):
        import pyarrow as pa

        blk = _assemble_block(batches)
        if blk is None:
            return
        pid, X, y = blk
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], type=pa.int64()),
                pa.array([X.tobytes()], type=pa.large_binary()),
                pa.array([y.tobytes()], type=pa.large_binary()),
            ],
            names=["pid", "xb", "yb"],
        )

    blockdir = None
    if block_storage == "disk":
        import tempfile

        blockdir = tempfile.mkdtemp(prefix="dgs-admm-blocks-")

    def build_block_disk(batches, _dir=blockdir):
        import os

        import pyarrow as pa

        blk = _assemble_block(batches)
        if blk is None:
            return
        pid, X, y = blk
        xpath = os.path.join(_dir, f"blk_{pid}_x.npy")
        ypath = os.path.join(_dir, f"blk_{pid}_y.npy")
        # write-then-rename: a lineage recompute of this partition (cache
        # eviction) must never leave a concurrent reader a torn file
        np.save(xpath + ".tmp.npy", X)
        os.replace(xpath + ".tmp.npy", xpath)
        np.save(ypath + ".tmp.npy", y)
        os.replace(ypath + ".tmp.npy", ypath)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], type=pa.int64()),
                pa.array([xpath], type=pa.string()),
                pa.array([ypath], type=pa.string()),
            ],
            names=["pid", "xb", "yb"],
        )

    proj = df.select(
        df[features_col].cast("array<double>"), df[label_col].cast("double"),
        *[F.col(c).cast("double") for c in aux_cols],
    )
    if block_storage == "disk":
        packed = proj.mapInArrow(
            build_block_disk, schema="pid long, xb string, yb string"
        )

        def unpack(row):
            # state: (pid, X-ref, y-ref, beta_i, u_i, beta_hat_i or None);
            # the refs memmap lazily inside each round task (_block_xy)
            return (
                row.pid, _NpyRef(row.xb), _NpyRef(row.yb),
                np.ones(p), np.zeros(p), None,
            )
    else:
        packed = proj.mapInArrow(
            build_block_arrow, schema="pid long, xb binary, yb binary"
        )

        def unpack(row):
            X = np.frombuffer(row.xb, dtype=np.float64).reshape(-1, p)
            y = np.frombuffer(row.yb, dtype=np.float64)
            if n_yrows > 1:
                y = y.reshape(n_yrows, -1)
            # state: (pid, X, y, beta_i, u_i, beta_hat_i or None)
            return (row.pid, X, y, np.ones(p), np.zeros(p), None)

    blocks = packed.rdd.map(unpack, preservesPartitioning=True)
    try:
        return _admm_consensus(
            blocks, p, regularizer, lamduh, rho, over_relax,
            max_iter, abstol, reltol, fam, sc, init_beta=init_beta,
            fit_info=fit_info,
        )
    finally:
        if blockdir is not None:
            import shutil

            shutil.rmtree(blockdir, ignore_errors=True)


# Above this many bytes of (k x 2p floats) per-round state, broadcasting it
# is worse than keeping state inside the block rows (wide-p sparse ADMM).
MAX_DRIVER_STATE_BYTES = 64 * 1024 * 1024


class _NpyRef:
    """Pickles as a path; resolves to a read-only numpy memmap on use —
    the ADMM local-disk block store (round 13, VERDICT r12 #8). The data
    RDD then caches O(bytes-of-path) rows instead of multi-GB pickled
    numpy blocks, which removes BOTH the single-JVM heap/GC pressure of
    the one-time block build (the 100× probe's one super-linear
    component) AND the per-round JVM→Python socket copy + unpickle of
    every block (reads come straight from page cache via mmap)."""

    __slots__ = ("path",)

    def __init__(self, path: str):
        self.path = path

    def load(self) -> np.ndarray:
        return np.load(self.path, mmap_mode="r")


def _block_xy(X, y):
    """Resolve a consensus block's (X, y) — plain arrays pass through;
    local-disk blocks (``_NpyRef``) memmap lazily inside the round task."""
    if isinstance(X, _NpyRef):
        return X.load(), y.load()
    return X, y


def _admm_consensus(
    blocks, p, regularizer, lamduh, rho, over_relax,
    max_iter, abstol, reltol, fam, sc, init_beta=None, fit_info=None,
):
    """The consensus rounds shared by the dense and sparse ADMM paths:
    blocks are (pid, X, y, beta_i, u_i, beta_hat_i) with X anything the
    family math can ``.dot`` (dense ndarray or CSRMatrix).

    Two state layouts, chosen by per-round state size (k x 2p floats):

    - **driver-resident** (dense / modest p — the common case): the data
      RDD is immutable ``(pid, X, y)`` cached once; β_i/u_i live on the
      driver and are broadcast each round. In PySpark, an RDD whose rows
      are mutated every round re-serializes X across the JVM<->Python
      boundary TWICE per round (worker read + re-persist write of the
      returned blocks) — measured as the dominant, data-proportional
      per-round cost at 10x bench scale (3.4 s/round at 6M rows). With
      immutable data, X crosses once (the unavoidable cached-block read)
      and nothing data-sized ever crosses back; lineage never grows, so
      the per-round persist/localCheckpoint dance disappears too.
    - **executor-resident** (wide-p sparse): k x 2p floats of state is
      too big to broadcast (p ~ 10^6 hashed-text features => GBs), so
      state rides a separate tiny RDD zipped against the immutable data
      RDD each round — X is still read from cache per round, but the
      round's OUTPUT is O(p) per block, so nothing data-sized is ever
      serialized back either.
    """
    # Block count upper bound without a job: each input partition yields at
    # most one block (admm may request nblocks > defaultParallelism, and
    # nblocks=0 keeps the caller's partitioning — defaultParallelism would
    # under-count both).
    nparts = max(1, blocks.getNumPartitions())
    if 2 * p * 8 * nparts <= MAX_DRIVER_STATE_BYTES:
        return _admm_consensus_driver_state(
            blocks, p, regularizer, lamduh, rho, over_relax,
            max_iter, abstol, reltol, fam, sc, init_beta=init_beta,
            fit_info=fit_info,
        )
    # Immutable data (pid, X, y) cached ONCE; the per-block state rides a
    # SEPARATE tiny RDD zipped back each round (both are one-element-per-
    # partition children of the same parent, so zip alignment is exact).
    # X is read from cache each round (unavoidable in PySpark) but never
    # serialized back — the round's output is O(p) per block, so the
    # per-round persist/localCheckpoint machinery touches state only.
    data = blocks.map(
        lambda b: (b[0], b[1], b[2]), preservesPartitioning=True
    ).persist(StorageLevel.MEMORY_AND_DISK)
    nchunks = data.count()  # empty partitions contribute no block
    if nchunks == 0:
        raise ValueError("empty input DataFrame")
    b0 = np.ones(p) if init_beta is None else _init_vec(init_beta, p)
    state = data.map(
        lambda b: (b[0], b0, np.zeros(p), None),
        preservesPartitioning=True,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    state.count()

    z = np.zeros(p) if init_beta is None else _init_vec(init_beta, p)

    def make_round(z_bc, first):
        def run(pair):
            (pid, X, y), (_, beta, u, beta_hat_prev) = pair
            X, y = _block_xy(X, y)
            zv = z_bc.value
            if not first:
                # deferred dual update from the previous round, now that the
                # new z is known (reference: u += beta_hat - z, :322)
                u = u + beta_hat_prev - zv
            new_beta = _admm_local_update(X, y, beta, zv, u, rho, fam)
            beta_hat = over_relax * new_beta + (1 - over_relax) * zv
            return (pid, new_beta, u, beta_hat)

        return run

    prev = state
    prev_ckpt = False
    for it in range(max_iter):
        z_bc = sc.broadcast(z)
        nxt = data.zip(prev).map(
            make_round(z_bc, first=(it == 0)), preservesPartitioning=True
        )
        nxt_ckpt = (it + 1) % 10 == 0
        if nxt_ckpt:
            nxt.localCheckpoint()
        else:
            nxt = nxt.persist(StorageLevel.MEMORY_AND_DISK)
        # one action per round: ship back (pid, beta_i, beta_hat_i + u_i)
        stats = nxt.map(lambda s: (s[0], s[1], s[3] + s[2])).collect()
        # ADVICE r2: never unpersist a localCheckpoint'd round — its state
        # rows ARE the checkpoint (lineage is truncated; dropping them
        # would make any later recompute fail with missing blocks).
        if prev is not state and not prev_ckpt:
            prev.unpersist(False)
        prev, prev_ckpt = nxt, nxt_ckpt
        z_bc.unpersist(False)

        stats.sort(key=lambda t: t[0])  # deterministic reduction order
        new_betas = np.array([t[1] for t in stats])
        v = np.array([t[2] for t in stats])  # beta_hat_i + u_i

        zold = z.copy()
        ztilde = np.mean(v, axis=0)
        z = regularizer.proximal_operator(ztilde, lamduh / (rho * nchunks))

        u_next = v - z  # u_i^{t+1} = u_i^t + beta_hat_i - z^{t+1}

        primal_res = np.linalg.norm(new_betas - z)
        dual_res = np.linalg.norm(rho * (z - zold))
        eps_pri = np.sqrt(p * nchunks) * abstol + reltol * np.maximum(
            np.linalg.norm(new_betas), np.sqrt(nchunks) * np.linalg.norm(z)
        )
        eps_dual = np.sqrt(p * nchunks) * abstol + reltol * np.linalg.norm(
            rho * u_next
        )
        if primal_res < eps_pri and dual_res < eps_dual:
            _log.info("admm (executor-state) converged after %d rounds", it + 1)
            _fill_info(fit_info, it + 1, True)
            break
    else:
        _fill_info(fit_info, max_iter, False)

    data.unpersist(False)
    state.unpersist(False)
    if prev is not state and not prev_ckpt:
        prev.unpersist(False)
    return z


def _admm_consensus_driver_state(
    blocks, p, regularizer, lamduh, rho, over_relax,
    max_iter, abstol, reltol, fam, sc, init_beta=None, fit_info=None,
):
    """Driver-resident-state consensus rounds (see ``_admm_consensus``).

    Update order is EXACTLY the reference's (algorithms.py:224-336) with
    the dual step relocated, not reordered: the executor-resident layout
    applies ``u_i += beta_hat_i - z`` lazily at the start of the next
    round once the new z arrives; here the driver applies the identical
    update eagerly at the end of the round that produced z — same u_i
    values enter every local solve (parity pinned by the existing
    test_admm suite, which runs both layouts via the p-size dispatch).
    """
    data = blocks.map(
        lambda b: (b[0], b[1], b[2]), preservesPartitioning=True
    ).persist(StorageLevel.MEMORY_AND_DISK)

    z = np.zeros(p) if init_beta is None else _init_vec(init_beta, p)
    b0_default = None if init_beta is None else _init_vec(init_beta, p)
    # Lazy state init (round 9): the pid set used to come from a separate
    # `data.map(pid).collect()` job whose only real effect was forcing the
    # cache materialization — one full job of pure floor at bench scale.
    # Round 1 now materializes the cache itself and returns the pids in
    # its stats; unknown pids default to the same block-build init
    # (beta=ones, u=zeros), so the math is bit-identical.
    betas: dict = {}
    us: dict = {}
    nchunks = 0

    for it in range(max_iter):
        st_bc = sc.broadcast((z, betas, us))

        def run(block, _st=st_bc, _p=p, _b0=b0_default):
            pid, X, y = block
            X, y = _block_xy(X, y)
            zv, bs, uss = _st.value
            b0 = bs.get(pid)
            u0 = uss.get(pid)
            if b0 is None:
                # block-build init parity; warm start overrides the
                # reference's ones-init with the supplied point
                b0 = np.ones(_p) if _b0 is None else _b0
            if u0 is None:
                u0 = np.zeros(_p)
            new_beta = _admm_local_update(X, y, b0, zv, u0, rho, fam)
            beta_hat = over_relax * new_beta + (1 - over_relax) * zv
            return (pid, new_beta, beta_hat)

        stats = data.map(run, preservesPartitioning=True).collect()
        st_bc.unpersist(False)
        if not stats:
            raise ValueError("empty input DataFrame")
        if not nchunks:
            nchunks = len(stats)
            us = {t[0]: np.zeros(p) for t in stats}

        stats.sort(key=lambda t: t[0])  # deterministic reduction order
        new_betas = np.array([t[1] for t in stats])
        v = np.array(
            [t[2] + us[t[0]] for t in stats]
        )  # beta_hat_i + u_i, pid-sorted

        zold = z.copy()
        ztilde = np.mean(v, axis=0)
        z = regularizer.proximal_operator(ztilde, lamduh / (rho * nchunks))

        # u_i^{t+1} = u_i^t + beta_hat_i - z^{t+1}, applied driver-side
        for i, t in enumerate(stats):
            us[t[0]] = v[i] - z
            betas[t[0]] = new_betas[i]

        primal_res = np.linalg.norm(new_betas - z)
        dual_res = np.linalg.norm(rho * (z - zold))
        eps_pri = np.sqrt(p * nchunks) * abstol + reltol * np.maximum(
            np.linalg.norm(new_betas), np.sqrt(nchunks) * np.linalg.norm(z)
        )
        eps_dual = np.sqrt(p * nchunks) * abstol + reltol * np.linalg.norm(
            rho * np.array([us[pid] for pid in sorted(us)])
        )
        if primal_res < eps_pri and dual_res < eps_dual:
            _log.info("admm (driver-state) converged after %d rounds", it + 1)
            _fill_info(fit_info, it + 1, True)
            break
    else:
        _fill_info(fit_info, max_iter, False)

    data.unpersist(False)
    return z


def admm_sparse(
    df: DataFrame,
    regularizer="l1",
    lamduh: float = 0.1,
    rho: float = 1,
    over_relax: float = 1,
    max_iter: int = 250,
    abstol: float = 1e-4,
    reltol: float = 1e-2,
    family=Logistic,
    p: int | None = None,
    idx_col: str = "findices",
    val_col: str = "fvalues",
    label_col: str = "label",
    nblocks: int | None = None,
    init_beta=None,
    **kwargs,
):
    """Consensus ADMM over wide-sparse ``(indices, values)`` features.

    Identical consensus rounds to ``admm`` (shared ``_admm_consensus``);
    only the block representation differs: each partition packs into a
    scipy-free ``CSRMatrix`` (three flat arrays, 24 bytes/nnz), and the
    local L-BFGS update duck-types through ``X.dot``/``X.T.dot`` as O(nnz)
    scatter-adds — rows are never densified, so p in the 10^5-10^6 hashed
    -text range stays tractable per executor. No standardization, same
    rationale as ``lbfgs_sparse``. ``nblocks`` defaults to
    ``sc.defaultParallelism`` (no row count is available pre-scan on this
    path); 0 keeps the input partitioning.
    """
    from dask_glm_spark.functions.kernels_sparse import CSRMatrix
    from dask_glm_spark.sources.vectors import sparse_p

    weight_col = kwargs.pop("weight_col", None)
    offset_col = kwargs.pop("offset_col", None)
    fit_info = kwargs.pop("fit_info", None)
    augmented = weight_col is not None or offset_col is not None
    fam = (
        _AugmentedFamily(family, weight_col is not None, offset_col is not None)
        if augmented
        else family
    )
    regularizer = Regularizer.get(regularizer)
    sc = df.sparkSession.sparkContext
    p = p or sparse_p(df, idx_col)

    if nblocks is None:
        nblocks = sc.defaultParallelism
    cur = df.rdd.getNumPartitions()
    if nblocks and cur != nblocks:
        # same layout rule as the dense path: contiguous no-shuffle merge
        # when reducing (reference chunking is contiguous), exchange only
        # when partitions must be split
        df = df.coalesce(nblocks) if nblocks < cur else df.repartition(nblocks)

    aux_cols = [c for c in (weight_col, offset_col) if c is not None]
    n_yrows = 1 + len(aux_cols)

    def build_block_arrow(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        idxs, vals, lens, ys = [], [], [], []
        auxs = [[] for _ in aux_cols]
        for batch in batches:
            if batch.num_rows == 0:
                continue
            il = batch.column(0)
            idxs.append(il.flatten().to_numpy(zero_copy_only=False).astype(np.int64))
            lens.append(il.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64))
            vals.append(batch.column(1).flatten().to_numpy(zero_copy_only=False))
            ys.append(batch.column(2).to_numpy(zero_copy_only=False))
            for j in range(len(aux_cols)):
                auxs[j].append(
                    batch.column(3 + j).to_numpy(zero_copy_only=False)
                )
        if not ys:
            return
        lens_all = np.concatenate(lens)
        row_ids = np.repeat(np.arange(len(lens_all), dtype=np.int64), lens_all)
        y = np.concatenate(ys)
        if aux_cols:
            # same convention as the dense path: the y-buffer carries
            # vstack([y][, w][, o]) and _AugmentedFamily splits it
            y = np.vstack([y] + [np.concatenate(a) for a in auxs])
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], type=pa.int64()),
                pa.array([np.ascontiguousarray(np.concatenate(idxs)).tobytes()],
                         type=pa.large_binary()),
                pa.array([np.ascontiguousarray(np.concatenate(vals)).tobytes()],
                         type=pa.large_binary()),
                pa.array([np.ascontiguousarray(row_ids).tobytes()], type=pa.large_binary()),
                pa.array([np.ascontiguousarray(y).tobytes()],
                         type=pa.large_binary()),
            ],
            names=["pid", "ib", "vb", "rb", "yb"],
        )

    packed = df.select(
        df[idx_col].cast("array<long>"), df[val_col].cast("array<double>"),
        df[label_col].cast("double"),
        *[F.col(c).cast("double") for c in aux_cols],
    ).mapInArrow(
        build_block_arrow, schema="pid long, ib binary, vb binary, rb binary, yb binary"
    )

    def unpack(row):
        y = np.frombuffer(row.yb, dtype=np.float64)
        if n_yrows > 1:
            y = y.reshape(n_yrows, -1)
        n_rows_blk = y.shape[-1]
        X = CSRMatrix(
            np.frombuffer(row.ib, dtype=np.int64),
            np.frombuffer(row.vb, dtype=np.float64),
            np.frombuffer(row.rb, dtype=np.int64),
            (n_rows_blk, p),
        )
        return (row.pid, X, y, np.ones(p), np.zeros(p), None)

    blocks = packed.rdd.map(unpack, preservesPartitioning=True)
    return _admm_consensus(
        blocks, p, regularizer, lamduh, rho, over_relax,
        max_iter, abstol, reltol, fam, sc, init_beta=init_beta,
        fit_info=fit_info,
    )


class _SoftmaxStandardizer:
    """Columnwise standardize-fit-backtransform shared by the dense
    softmax solvers (``softmax_lbfgs`` / ``softmax_proximal`` — review
    r12: the ~35-line block previously lived verbatim in both). Same
    reference quirks as the 1-D ``@normalize`` wrapper: population std,
    >1 constant column raises, scale-only when no constant column; the
    init forward transform is the exact inverse of the backtransform,
    applied per class column."""

    def __init__(self, df, features_col, weight_col, normalize):
        self.normalize = normalize
        if normalize:
            _, mean, std = kernels.column_moments_full(
                df, features_col, weight_col=weight_col
            )
            self.p = len(mean)
            intercept_idx = np.where(std == 0)[0]
            if len(intercept_idx) > 1:
                raise ValueError("Multiple constant columns detected!")
            mean[intercept_idx] = 0
            std[intercept_idx] = 1
            if len(intercept_idx) == 0:
                mean = np.zeros_like(mean)
            self.mean, self.std = mean, std
            self.intercept_idx = intercept_idx
            self.dfn = df.withColumn(
                features_col,
                kernels.standardize_expr(mean, std, features_col),
            )
        else:
            self.p = kernels.infer_p(df, features_col)
            self.dfn = df

    def forward(self, init_beta, k: int) -> np.ndarray | None:
        """Validate + map a caller init (original space) into the space
        the solver optimizes in; returns the flat start vector."""
        if init_beta is None:
            return None
        B0 = np.array(init_beta, dtype=np.float64)
        if B0.shape != (self.p, k):
            raise ValueError(
                f"init_beta must have shape ({self.p}, {k}), got {B0.shape}"
            )
        if self.normalize:
            B0s = B0 * self.std[:, None]
            B0s[self.intercept_idx, :] += (B0 * self.mean[:, None]).sum(
                axis=0
            )[None, :]
            B0 = B0s
        return B0.ravel()

    def backward(self, B: np.ndarray) -> np.ndarray:
        if not self.normalize:
            return B
        i_adj = (B * (self.mean / self.std)[:, None]).sum(axis=0)
        B[self.intercept_idx, :] -= i_adj[None, :]
        return B / self.std[:, None]


def softmax_lbfgs(
    df: DataFrame,
    k: int,
    regularizer=None,
    lamduh: float = 1.0,
    max_iter: int = 100,
    tol: float = 1e-4,
    features_col: str = "features",
    label_col: str = "label",
    normalize: bool = True,
    persist: bool = True,
    init_beta=None,
    fit_info=None,
    weight_col: str | None = None,
) -> np.ndarray:
    """True multinomial (softmax) fit: L-BFGS on the driver over the
    flattened (p, k) coefficient matrix; each objective evaluation is ONE
    fused ``kernels.softmax_loss_gradient`` scan computing all k class
    gradients together — vs one-vs-rest's k separate re-scans of the cache
    per sweep (VERDICT r6 gap #1). ``label_col`` must hold class indices
    in [0, k).

    Owns its standardize-fit-backtransform (the ``@normalize`` wrapper is
    1-D): same reference quirks — population std, >1 constant column
    raises, scale-only when no constant column — applied columnwise per
    class on the way back. Returns (p, k); column c is class c's
    coefficients over the (maybe intercept-extended) features."""
    from dask_glm_spark.functions.optimize import fmin_l_bfgs_b

    we_persisted = False
    if persist and not df.is_cached:
        df = ensure_min_parallelism(df)
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        we_persisted = True
    try:
        stdz = _SoftmaxStandardizer(df, features_col, weight_col, normalize)
        p, dfn = stdz.p, stdz.dfn

        reg_f = reg_grad = None
        if regularizer is not None:
            reg = Regularizer.get(regularizer)
            reg_f, reg_grad = reg.f, reg.gradient

        def compute_loss_grad(bflat):
            B = bflat.reshape(p, k)
            loss, grad = kernels.softmax_loss_gradient(
                dfn, B, features_col, label_col, weight_col=weight_col
            )
            if reg_f is not None:
                loss = loss + lamduh * reg_f(bflat)
                grad = grad + lamduh * reg_grad(bflat).reshape(p, k)
            return loss, grad.ravel()

        b_start = stdz.forward(init_beta, k)
        if b_start is None:
            b_start = np.zeros(p * k)
        bflat, _, d = fmin_l_bfgs_b(
            compute_loss_grad, b_start, pgtol=tol, maxiter=max_iter
        )
        _fill_info(
            fit_info, d.get("nit", 0), d.get("warnflag", 1) == 0,
            funcalls=int(d.get("funcalls", 0)),
        )
        return stdz.backward(bflat.reshape(p, k))
    finally:
        if we_persisted:
            df.unpersist()


def softmax_lbfgs_sparse(
    df: DataFrame,
    k: int,
    regularizer=None,
    lamduh: float = 1.0,
    max_iter: int = 100,
    tol: float = 1e-4,
    p: int | None = None,
    idx_col: str = "findices",
    val_col: str = "fvalues",
    label_col: str = "label",
    init_beta=None,
    fit_info=None,
    weight_col: str | None = None,
    persist: bool = True,
    **kwargs,
):
    """True multinomial fit over wide-sparse (indices, values) features:
    the sparse twin of ``softmax_lbfgs`` — each L-BFGS evaluation is one
    O(k·nnz) ``kernels_sparse.softmax_loss_gradient_sparse`` scan. No
    standardization (the ``lbfgs_sparse`` rationale: standardizing
    one-hot/hashed columns would densify them — reference
    ``dask_glm/estimators.py:82-83``). Returns (p, k)."""
    from dask_glm_spark.functions import kernels_sparse
    from dask_glm_spark.functions.optimize import fmin_l_bfgs_b

    _reject_offset_col(kwargs, "softmax_lbfgs_sparse")

    reg_f = reg_grad = None
    if regularizer is not None:
        reg = Regularizer.get(regularizer)
        reg_f, reg_grad = reg.f, reg.gradient

    def body(dfc, pp):
        def compute_loss_grad(bflat):
            B = bflat.reshape(pp, k)
            loss, grad = kernels_sparse.softmax_loss_gradient_sparse(
                dfc, B, pp, idx_col, val_col, label_col,
                weight_col=weight_col,
            )
            if reg_f is not None:
                loss = loss + lamduh * reg_f(bflat)
                grad = grad + lamduh * reg_grad(bflat).reshape(pp, k)
            return loss, grad.ravel()

        if init_beta is None:
            b_start = np.zeros(pp * k)
        else:
            B0 = np.array(init_beta, dtype=np.float64)
            if B0.shape != (pp, k):
                raise ValueError(
                    f"init_beta must have shape ({pp}, {k}), got {B0.shape}"
                )
            b_start = B0.ravel()
        bflat, _, d = fmin_l_bfgs_b(
            compute_loss_grad, b_start, pgtol=tol, maxiter=max_iter
        )
        _fill_info(
            fit_info, d.get("nit", 0), d.get("warnflag", 1) == 0,
            funcalls=int(d.get("funcalls", 0)),
        )
        return bflat.reshape(pp, k)

    return _run_sparse(df, idx_col, p, body, persist=persist)


def softmax_proximal(
    df: DataFrame,
    k: int,
    regularizer="l1",
    lamduh: float = 0.1,
    max_iter: int = 100,
    tol: float = 1e-8,
    features_col: str = "features",
    label_col: str = "label",
    normalize: bool = True,
    persist: bool = True,
    init_beta=None,
    fit_info=None,
    weight_col: str | None = None,
) -> np.ndarray:
    """L1/L2-penalized multinomial fit by proximal gradient over the
    flattened (p, k) matrix — round 12 (VERDICT r11 #4: sparse text
    classifiers want feature selection; softmax previously fit only
    smooth objectives via lbfgs). The elementwise soft-threshold is
    group-agnostic: vec(B) through the SAME ``Regularizer.
    proximal_operator`` the binary path uses, so ``_fista_loop`` runs
    unchanged on the p·k vector (FISTA only — its probe needs losses,
    not per-candidate gradients). Per iteration: one
    fused ``softmax_loss_gradient`` scan at the extrapolated point plus
    batched ``softmax_multi_loss`` probe scans. Standardize-fit-
    backtransform mirrors ``softmax_lbfgs`` exactly. Returns (p, k)."""
    we_persisted = False
    if persist and not df.is_cached:
        df = ensure_min_parallelism(df)
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        we_persisted = True
    try:
        stdz = _SoftmaxStandardizer(df, features_col, weight_col, normalize)
        p, dfn = stdz.p, stdz.dfn
        b0 = stdz.forward(init_beta, k)

        def loss_grad(bflat):
            loss, grad = kernels.softmax_loss_gradient(
                dfn, bflat.reshape(p, k), features_col, label_col,
                weight_col=weight_col,
            )
            return loss, grad.ravel()

        def multi_loss_grad(cands):
            losses = kernels.softmax_multi_loss(
                dfn, [c.reshape(p, k) for c in cands], features_col,
                label_col, weight_col=weight_col,
            )
            return losses, None

        bflat = _fista_loop(
            loss_grad, multi_loss_grad, p * k, regularizer, lamduh,
            max_iter, tol, b0, fit_info,
        )
        return stdz.backward(np.asarray(bflat, dtype=np.float64).reshape(p, k))
    finally:
        if we_persisted:
            df.unpersist()


def softmax_proximal_sparse(
    df: DataFrame,
    k: int,
    regularizer="l1",
    lamduh: float = 0.1,
    max_iter: int = 100,
    tol: float = 1e-8,
    p: int | None = None,
    idx_col: str = "findices",
    val_col: str = "fvalues",
    label_col: str = "label",
    init_beta=None,
    fit_info=None,
    weight_col: str | None = None,
    persist: bool = True,
) -> np.ndarray:
    """Sparse twin of ``softmax_proximal``: O(k·nnz) fused scans, no
    standardization (it would densify) — the 2^18-dim hashed-text
    feature-selection path. Returns (p, k)."""
    from dask_glm_spark.functions import kernels_sparse

    def body(dfc, pp):
        b0 = None
        if init_beta is not None:
            B0 = np.array(init_beta, dtype=np.float64)
            if B0.shape != (pp, k):
                raise ValueError(
                    f"init_beta must have shape ({pp}, {k}), got {B0.shape}"
                )
            b0 = B0.ravel()

        def loss_grad(bflat):
            loss, grad = kernels_sparse.softmax_loss_gradient_sparse(
                dfc, bflat.reshape(pp, k), pp, idx_col, val_col, label_col,
                weight_col=weight_col,
            )
            return loss, grad.ravel()

        def multi_loss_grad(cands):
            losses = kernels_sparse.softmax_multi_loss_sparse(
                dfc, [c.reshape(pp, k) for c in cands], pp, idx_col,
                val_col, label_col, weight_col=weight_col,
            )
            return losses, None

        bflat = _fista_loop(
            loss_grad, multi_loss_grad, pp * k, regularizer, lamduh,
            max_iter, tol, b0, fit_info,
        )
        return np.asarray(bflat, dtype=np.float64).reshape(pp, k)

    return _run_sparse(df, idx_col, p, body, persist=persist)


def _softmax_shift_proj(vf: np.ndarray, p: int, k: int) -> np.ndarray:
    """Remove the per-feature class-shift (softmax null-space) component
    from a flattened (p, k) vector: V − rowmean(V). See the
    shift-invariance note on ``softmax_newton_cg``."""
    V = vf.reshape(p, k)
    return (V - V.mean(axis=1, keepdims=True)).ravel()


def softmax_newton_cg(
    df: DataFrame,
    k: int,
    max_iter: int = 50,
    tol: float = 1e-8,
    features_col: str = "features",
    label_col: str = "label",
    normalize: bool = True,
    persist: bool = True,
    init_beta=None,
    fit_info=None,
    weight_col: str | None = None,
    cg_tol: float | None = None,
    max_cg_iter: int | None = None,
) -> np.ndarray:
    """Matrix-free truncated Newton for the JOINT multinomial fit —
    round 13 (VERDICT r12 #5). The exact ``_newton_cg_loop`` control flow
    of the binary ``newton_cg`` over the flattened (p·k) coefficient
    vector: per outer iteration one fused ``softmax_loss_gradient`` scan,
    then CG where each matvec is one ``softmax_hessian_vector_product``
    scan (two GEMMs per batch, p·k doubles per partition — no (p·k)²
    object anywhere, so wide p·k fits get Newton semantics at lbfgs byte
    shape). Pure-MLE like ``newton``/``newton_cg`` (no regularizer
    routes here — penalized softmax fits go through lbfgs /
    proximal_grad).

    Shift-invariance: the raw softmax parameterization has a
    p-dimensional Hessian null space (adding one vector to every class
    column changes nothing). The gradient and every exact Hvp live in
    its orthogonal complement (columns sum to zero per feature), but CG
    on a singular system is numerically unstable there — a direction
    with a rounding-level null component has dᵀAd ≈ 0, so α = rs/dᵀAd
    amplifies that component unboundedly (observed: intercept-extended
    fits converged to a true MLE, gradient ~1e-13, carrying an O(10)
    class-shift component). Both closures therefore PROJECT the shift
    out (``_softmax_shift_proj``) of the CG inputs and outputs — exact
    (the projector commutes with H; the true Newton step is sum-zero)
    and stable (CG runs on the subspace where H is positive definite),
    so iterates stay in the same sum-zero representation L-BFGS
    converges to; parity is pinned in tests. Standardize-fit-
    backtransform mirrors the other dense softmax solvers
    (``_SoftmaxStandardizer``). Returns (p, k)."""
    we_persisted = False
    if persist and not df.is_cached:
        df = ensure_min_parallelism(df)
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        we_persisted = True
    try:
        stdz = _SoftmaxStandardizer(df, features_col, weight_col, normalize)
        p, dfn = stdz.p, stdz.dfn
        b0 = stdz.forward(init_beta, k)
        bflat = _newton_cg_loop(
            lambda bf: _softmax_shift_proj(
                kernels.softmax_loss_gradient(
                    dfn, bf.reshape(p, k), features_col, label_col,
                    weight_col=weight_col,
                )[1].ravel(),
                p, k,
            ),
            lambda bf, v: _softmax_shift_proj(
                kernels.softmax_hessian_vector_product(
                    dfn, bf.reshape(p, k),
                    _softmax_shift_proj(v, p, k).reshape(p, k),
                    features_col, weight_col=weight_col,
                ).ravel(),
                p, k,
            ),
            p * k, max_iter, tol, b0, fit_info, cg_tol, max_cg_iter,
        )
        return stdz.backward(
            np.asarray(bflat, dtype=np.float64).reshape(p, k)
        )
    finally:
        if we_persisted:
            df.unpersist()


def softmax_newton_cg_sparse(
    df: DataFrame,
    k: int,
    max_iter: int = 50,
    tol: float = 1e-8,
    p: int | None = None,
    idx_col: str = "findices",
    val_col: str = "fvalues",
    label_col: str = "label",
    init_beta=None,
    fit_info=None,
    weight_col: str | None = None,
    cg_tol: float | None = None,
    max_cg_iter: int | None = None,
    persist: bool = True,
) -> np.ndarray:
    """Sparse twin of ``softmax_newton_cg``: O(k·nnz) fused scans
    (``softmax_loss_gradient_sparse`` for the outer gradient,
    ``softmax_hessian_vector_product_sparse`` for each CG matvec), no
    standardization (it would densify) — Newton semantics for the
    2^18-dim hashed-text multinomial without ever forming p² or (p·k)².
    Returns (p, k)."""
    from dask_glm_spark.functions import kernels_sparse

    def body(dfc, pp):
        b0 = None
        if init_beta is not None:
            B0 = np.array(init_beta, dtype=np.float64)
            if B0.shape != (pp, k):
                raise ValueError(
                    f"init_beta must have shape ({pp}, {k}), got {B0.shape}"
                )
            b0 = B0.ravel()
        bflat = _newton_cg_loop(
            lambda bf: _softmax_shift_proj(
                kernels_sparse.softmax_loss_gradient_sparse(
                    dfc, bf.reshape(pp, k), pp, idx_col, val_col,
                    label_col, weight_col=weight_col,
                )[1].ravel(),
                pp, k,
            ),
            lambda bf, v: _softmax_shift_proj(
                kernels_sparse.softmax_hessian_vector_product_sparse(
                    dfc, bf.reshape(pp, k),
                    _softmax_shift_proj(v, pp, k).reshape(pp, k),
                    pp, idx_col, val_col, weight_col=weight_col,
                ).ravel(),
                pp, k,
            ),
            pp * k, max_iter, tol, b0, fit_info, cg_tol, max_cg_iter,
        )
        return np.asarray(bflat, dtype=np.float64).reshape(pp, k)

    return _run_sparse(df, idx_col, p, body, persist=persist)


_solvers = {
    "admm": admm,
    "gradient_descent": gradient_descent,
    "newton": newton,
    "newton_cg": newton_cg,
    "lbfgs": lbfgs,
    "proximal_grad": proximal_grad,
}
