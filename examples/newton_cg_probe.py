"""Newton-CG wide-p probe (round 12, VERDICT r11 #1).

The round-11 probe measured ``newton``'s per-iteration wall at
7.4 / 42.8 / 110.7 s for p = 256 / 1024 / 2048 (p² Gram partials + p×p
driver lstsq — quadratic). ``newton_cg`` replaces the Gram with
Hessian-vector products: one lbfgs-shaped scan (O(p) partials) per CG
step. This probe measures:

1. **Per-Hvp-scan wall at p ∈ {256, 1024, 2048, 4096}** — must bend
   linearly in p (it is exactly the loss_gradient scan shape), unlike
   newton's per-iteration quadratic.
2. **Full-fit parity with lbfgs at p = 2048 and p = 4096**: both solvers
   chase the same MLE; compare final loss and max|Δβ|.

Run:  python examples/newton_cg_probe.py [workdir]
Results from the local[32] container are recorded in SURVEY.md §19.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.wide_p_probe import _gen_dense  # noqa: E402


def main(workdir: str | None = None):
    from dask_glm_spark.functions import kernels
    from dask_glm_spark.operators import solvers
    from dask_glm_spark.session import get_spark

    workdir = workdir or tempfile.mkdtemp(prefix="dask_glm_spark_ncg_")
    spark = get_spark(app_name="newton_cg_probe")
    out: dict[str, float] = {}

    for p in (256, 1024, 2048, 4096):
        path = f"{workdir}/dense_p{p}.parquet"
        _gen_dense(spark, path, p)
        df = spark.read.parquet(path).persist()
        df.count()
        rng = np.random.RandomState(3)
        beta = rng.standard_normal(p) * 0.01
        v = rng.standard_normal(p)
        # warm once (plan compile), then min-of-3 Hvp scans
        kernels.hessian_vector_product(df, solvers.Logistic, beta, v, p=p)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            kernels.hessian_vector_product(df, solvers.Logistic, beta, v, p=p)
            times.append(time.perf_counter() - t0)
        out[f"hvp_scan_p{p}"] = round(min(times), 3)
        print(f"hvp_scan_p{p}: {out[f'hvp_scan_p{p}']}s")

        if p in (2048, 4096):
            t0 = time.perf_counter()
            info: dict = {}
            b_ncg = solvers.newton_cg(
                df, max_iter=8, tol=1e-8, fit_info=info, normalize=False,
            )
            out[f"newton_cg_fit_p{p}"] = round(time.perf_counter() - t0, 3)
            print(
                f"newton_cg_fit_p{p}: {out[f'newton_cg_fit_p{p}']}s "
                f"(outer={info['n_iter']} cg_scans={info['cg_iters']})"
            )
            t0 = time.perf_counter()
            b_lb = solvers.lbfgs(
                df, regularizer=None, max_iter=200, tol=1e-10,
                normalize=False,
            )
            out[f"lbfgs_fit_p{p}"] = round(time.perf_counter() - t0, 3)
            print(f"lbfgs_fit_p{p}: {out[f'lbfgs_fit_p{p}']}s")
            l_ncg = kernels.loss(df, solvers.Logistic, b_ncg)
            l_lb = kernels.loss(df, solvers.Logistic, b_lb)
            dbeta = float(np.max(np.abs(b_ncg - b_lb)))
            print(
                f"parity p={p}: loss ncg={l_ncg:.6f} lbfgs={l_lb:.6f} "
                f"(gap {l_ncg - l_lb:+.2e}) max|dbeta|={dbeta:.2e}"
            )
            out[f"parity_loss_gap_p{p}"] = round(l_ncg - l_lb, 6)
            out[f"parity_max_dbeta_p{p}"] = dbeta
        df.unpersist()

    # -- wide-k softmax section (round 13, VERDICT r12 #5): the joint
    # multinomial Hvp is two GEMMs per scan with (1 + p·k) partial
    # doubles — the per-scan wall must bend ~linearly in k at fixed p,
    # the same shape argument as the binary Hvp in p. Labels are never
    # read by the Hvp, so the binary frames above are reused; the fit
    # parity pin uses a hash-derived k-class label.
    from pyspark.sql import functions as F

    p = 512
    path = f"{workdir}/dense_p{p}.parquet"
    _gen_dense(spark, path, p)
    for k in (4, 16, 64):
        df = spark.read.parquet(path).persist()
        df.count()
        rng = np.random.RandomState(7)
        B = rng.standard_normal((p, k)) * 0.01
        V = rng.standard_normal((p, k))
        kernels.softmax_hessian_vector_product(df, B, V)  # warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            kernels.softmax_hessian_vector_product(df, B, V)
            times.append(time.perf_counter() - t0)
        out[f"softmax_hvp_scan_p{p}_k{k}"] = round(min(times), 3)
        print(
            f"softmax_hvp_scan_p{p}_k{k}: "
            f"{out[f'softmax_hvp_scan_p{p}_k{k}']}s"
        )
        df.unpersist()

    k = 8
    dfk = (
        spark.read.parquet(path)
        .withColumn(
            "label", (F.abs(F.xxhash64("features")) % k).cast("double")
        )
        .persist()
    )
    dfk.count()
    info2: dict = {}
    t0 = time.perf_counter()
    B_ncg = solvers.softmax_newton_cg(
        dfk, k, max_iter=8, tol=1e-8, normalize=False, fit_info=info2,
    )
    out[f"softmax_newton_cg_fit_p{p}_k{k}"] = round(
        time.perf_counter() - t0, 3
    )
    print(
        f"softmax_newton_cg_fit_p{p}_k{k}: "
        f"{out[f'softmax_newton_cg_fit_p{p}_k{k}']}s "
        f"(outer={info2['n_iter']} cg_scans={info2['cg_iters']})"
    )
    t0 = time.perf_counter()
    B_lb = solvers.softmax_lbfgs(
        dfk, k, regularizer=None, max_iter=200, tol=1e-10,
        normalize=False,
    )
    out[f"softmax_lbfgs_fit_p{p}_k{k}"] = round(time.perf_counter() - t0, 3)
    print(
        f"softmax_lbfgs_fit_p{p}_k{k}: "
        f"{out[f'softmax_lbfgs_fit_p{p}_k{k}']}s"
    )
    l_ncg = kernels.softmax_multi_loss(dfk, [B_ncg])[0]
    l_lb = kernels.softmax_multi_loss(dfk, [B_lb])[0]
    dB = float(np.max(np.abs(B_ncg - B_lb)))
    print(
        f"softmax parity p={p} k={k}: loss ncg={l_ncg:.6f} "
        f"lbfgs={l_lb:.6f} (gap {l_ncg - l_lb:+.2e}) max|dB|={dB:.2e}"
    )
    out[f"softmax_parity_loss_gap_p{p}_k{k}"] = round(l_ncg - l_lb, 6)
    out[f"softmax_parity_max_dB_p{p}_k{k}"] = dB
    dfk.unpersist()

    print(out)
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
