"""100x solver scale probe (round 12, VERDICT r11 #7).

The 10x story is proven (examples/scale_probe.py, SURVEY §9); the brief's
target is 100 TB — two orders past the bench SF. This probe manufactures
a 100x frame (sf0.1 glm projection unioned 100 times ≈ 60M rows, written
once) and times the three cheap reference-parity fits plus the raw fused
kernel scan at 1x / 10x / 100x:

1. fused loss+gradient scan (the per-iteration unit of every solver),
2. L-BFGS fit (10 iterations),
3. gradient descent fit (10 iterations),
4. ADMM fit (10 rounds; byte-capped executor-resident blocks).

Contract: wall ratios at 100x stay ~linear in rows (the fixed job floor
makes small-SF scans look sub-linear; the 10x->100x ratio is the honest
signal). newton/newton_cg are excluded on cost grounds only — their
per-iteration scan is the same shape.

Run:  python examples/solver_100x_probe.py [sf_dir] [workdir]
Results from the local[32] container are recorded in SURVEY.md §20.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.1", workdir: str | None = None):
    from functools import reduce

    from dask_glm_spark.functions import kernels
    from dask_glm_spark.functions.families import Logistic
    from dask_glm_spark.operators.estimators import LogisticRegression
    from dask_glm_spark.session import get_spark
    from dask_glm_spark.sources.glm_source import load_glm_fast

    workdir = workdir or tempfile.mkdtemp(prefix="dask_glm_spark_100x_")
    spark = get_spark(app_name="solver_100x_probe")

    base = load_glm_fast(spark, sf_dir).select("features", "label")
    n1 = base.count()
    frames = {"1x": base}
    for mult, parts in ((10, 64), (100, 256)):
        path = f"{workdir}/glm_{mult}x.parquet"
        reduce(lambda a, b: a.unionAll(b), [base] * mult).repartition(
            parts
        ).write.mode("overwrite").parquet(path)
        frames[f"{mult}x"] = spark.read.parquet(path)
        print(f"rows {mult}x = {frames[f'{mult}x'].count()} ({n1} x {mult})")

    beta = np.array([0.1, -0.2, 0.3, 0.05])
    out: dict[str, float] = {}
    for tag, df in frames.items():
        kernels.loss_gradient(df, Logistic, beta, 4)  # warm
        t = []
        for _ in range(2):
            t0 = time.perf_counter()
            kernels.loss_gradient(df, Logistic, beta, 4)
            t.append(time.perf_counter() - t0)
        out[f"kernel_{tag}"] = round(min(t), 3)
        print(f"kernel_{tag}: {out[f'kernel_{tag}']}s")

        for name, est_kw in (
            ("lbfgs", dict(solver="lbfgs", regularizer=None)),
            ("gd", dict(solver="gradient_descent")),
            ("admm", dict(solver="admm", regularizer="l2")),
        ):
            t0 = time.perf_counter()
            LogisticRegression(
                fit_intercept=False, max_iter=10, **est_kw
            ).fit(df)
            out[f"{name}_{tag}"] = round(time.perf_counter() - t0, 3)
            print(f"{name}_{tag}: {out[f'{name}_{tag}']}s")

    for k in ("kernel", "lbfgs", "gd", "admm"):
        r100 = out[f"{k}_100x"] / out[f"{k}_1x"]
        r_step = out[f"{k}_100x"] / out[f"{k}_10x"]
        print(
            f"{k}: 1x={out[f'{k}_1x']}s 10x={out[f'{k}_10x']}s "
            f"100x={out[f'{k}_100x']}s  1x->100x={r100:.1f}x "
            f"10x->100x={r_step:.1f}x"
        )
    print(out)
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
