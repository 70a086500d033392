"""Driver-side L-BFGS, scipy-free.

The reference delegates its inner solves to ``scipy.optimize.fmin_l_bfgs_b``
(``dask_glm/algorithms.py:13,339-348,409-417``) but never passes bounds, so
the required semantics are plain unconstrained L-BFGS: two-loop recursion
with a strong-Wolfe line search. Implemented here from the published
algorithm (Nocedal & Wright, *Numerical Optimization* 2e, Algorithms 7.4/7.5
and 3.5/3.6) because scipy is not available in this environment. When scipy
IS importable we use it instead — behavior then matches the reference
bit-for-bit.

``fmin_l_bfgs_b`` mirrors the scipy call signature subset the engine uses
and returns ``(x, f, info)``.
"""

from __future__ import annotations

import numpy as np

try:  # prefer scipy when present (exact reference parity)
    from scipy.optimize import fmin_l_bfgs_b as _scipy_lbfgsb
except ImportError:
    _scipy_lbfgsb = None


def _wolfe_line_search(
    fg, x, f0, g0, d, args, c1=1e-4, c2=0.9, alpha0=1.0, max_evals=25
):
    """Strong-Wolfe line search via bracket + zoom (N&W Algs 3.5/3.6).

    Returns (alpha, f_new, g_new, nevals). Falls back to the best
    sufficient-decrease point seen if the Wolfe pair can't be bracketed.
    """
    dg0 = float(np.dot(g0, d))
    if dg0 >= 0:  # not a descent direction; caller resets to steepest descent
        return None, f0, g0, 0

    def phi(alpha):
        fv, gv = fg(x + alpha * d, *args)
        return float(fv), gv

    alpha_prev, f_prev = 0.0, f0
    alpha = alpha0
    nev = 0
    f_alpha, g_alpha = f0, g0

    for i in range(max_evals):
        f_alpha, g_alpha = phi(alpha)
        nev += 1
        if f_alpha > f0 + c1 * alpha * dg0 or (i > 0 and f_alpha >= f_prev):
            return _zoom(
                phi, f0, dg0, alpha_prev, alpha, f_prev, f_alpha, d, c1, c2, nev,
                max_evals,
            )
        dg = float(np.dot(g_alpha, d))
        if abs(dg) <= -c2 * dg0:
            return alpha, f_alpha, g_alpha, nev
        if dg >= 0:
            return _zoom(
                phi, f0, dg0, alpha, alpha_prev, f_alpha, f_prev, d, c1, c2, nev,
                max_evals,
            )
        alpha_prev, f_prev = alpha, f_alpha
        alpha *= 2.0
    return alpha, f_alpha, g_alpha, nev


def _zoom(phi, f0, dg0, lo, hi, f_lo, f_hi, d, c1, c2, nev, max_evals):
    g_best = None
    for _ in range(max_evals):
        alpha = 0.5 * (lo + hi)
        f_a, g_a = phi(alpha)
        nev += 1
        if f_a > f0 + c1 * alpha * dg0 or f_a >= f_lo:
            hi, f_hi = alpha, f_a
        else:
            dg = float(np.dot(g_a, d))
            if abs(dg) <= -c2 * dg0:
                return alpha, f_a, g_a, nev
            if dg * (hi - lo) >= 0:
                hi, f_hi = lo, f_lo
            lo, f_lo, g_best = alpha, f_a, g_a
        if abs(hi - lo) < 1e-16:
            break
    if g_best is not None:
        return lo, f_lo, g_best, nev
    if lo > 0:
        # lo satisfied sufficient decrease when it entered the bracket —
        # safe to accept even without the curvature condition
        f_a, g_a = phi(lo)
        return lo, f_a, g_a, nev + 1
    # lo == 0 and no midpoint ever passed the Armijo test: hi is KNOWN to
    # violate sufficient decrease, so returning it would let the caller
    # accept an ascent step (review r5). Signal failure instead — the
    # L-BFGS loop restarts along -g / terminates.
    return None, f0, None, nev


def fmin_l_bfgs_b(
    func,
    x0,
    fprime=None,
    args=(),
    m=10,
    pgtol=1e-5,
    factr=1e7,
    maxiter=15000,
    maxfun=15000,
    iprint=-1,
    **_ignored,
):
    """Unconstrained L-BFGS with the scipy return convention ``(x, f, d)``.

    ``func`` returns ``(f, grad)`` when ``fprime is None``, else ``f`` alone
    with ``fprime`` supplying the gradient — both scipy conventions the
    reference uses (``algorithms.py:344-345, 409-417``).
    """
    if _scipy_lbfgsb is not None:
        return _scipy_lbfgsb(
            func, x0, fprime=fprime, args=args, m=m, pgtol=pgtol, factr=factr,
            maxiter=maxiter, maxfun=maxfun, iprint=iprint,
        )

    if fprime is None:
        fg = lambda x, *a: func(x, *a)  # noqa: E731
    else:
        fg = lambda x, *a: (func(x, *a), fprime(x, *a))  # noqa: E731

    x = np.asarray(x0, dtype=np.float64).copy()
    n = x.size
    f, g = fg(x, *args)
    f, g = float(f), np.asarray(g, dtype=np.float64)
    nfun = 1

    s_hist: list[np.ndarray] = []
    y_hist: list[np.ndarray] = []
    rho_hist: list[float] = []
    eps = np.finfo(np.float64).eps

    warnflag = 0
    it = 0
    for it in range(1, maxiter + 1):
        if np.max(np.abs(g)) <= pgtol:
            break
        # two-loop recursion (N&W Alg 7.4)
        q = g.copy()
        alphas = []
        for s, y, rho in zip(reversed(s_hist), reversed(y_hist), reversed(rho_hist)):
            a = rho * np.dot(s, q)
            alphas.append(a)
            q -= a * y
        if y_hist:
            gamma = np.dot(s_hist[-1], y_hist[-1]) / np.dot(y_hist[-1], y_hist[-1])
        else:
            gamma = 1.0 / max(np.linalg.norm(g), 1.0)
        r = gamma * q
        for (s, y, rho), a in zip(zip(s_hist, y_hist, rho_hist), reversed(alphas)):
            b = rho * np.dot(y, r)
            r += (a - b) * s
        d = -r

        alpha, f_new, g_new, nev = _wolfe_line_search(fg, x, f, g, d, args)
        nfun += nev
        if alpha is None:  # not a descent direction — restart from gradient
            s_hist.clear(); y_hist.clear(); rho_hist.clear()
            d = -g
            alpha, f_new, g_new, nev = _wolfe_line_search(fg, x, f, g, d, args)
            nfun += nev
            if alpha is None or alpha == 0.0:
                warnflag = 2
                break

        x_new = x + alpha * d
        s = x_new - x
        yv = g_new - g
        sy = float(np.dot(s, yv))
        if sy > 1e-10 * float(np.dot(yv, yv)):
            s_hist.append(s)
            y_hist.append(yv)
            rho_hist.append(1.0 / sy)
            if len(s_hist) > m:
                s_hist.pop(0); y_hist.pop(0); rho_hist.pop(0)

        f_old, x, f, g = f, x_new, float(f_new), np.asarray(g_new)
        # scipy's factr relative-decrease stop
        if abs(f_old - f) <= factr * eps * max(abs(f_old), abs(f), 1.0):
            break
        if nfun >= maxfun:
            warnflag = 1
            break
    else:
        warnflag = 1

    info = {"grad": g, "task": b"CONVERGED", "funcalls": nfun, "nit": it,
            "warnflag": warnflag}
    return x, f, info
