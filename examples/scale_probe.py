"""sf1-equivalent scale probe: does the per-iteration contract hold at 10x?

The solver scale story says per-iteration cluster cost is one narrow scan
plus O(p) bytes per partition — so wall time per iteration should grow
(sub-)linearly in rows and the fit should never hit a super-linear cliff.
No sf1 testdata directory exists, so this probe manufactures a 10x frame
by unioning the sf0.1 glm projection with itself (10 copies, repartitioned
to spread them), writes it to a local parquet once, and times:

1. one fused loss+gradient kernel scan at 1x vs 10x,
2. an ADMM fit (10 rounds) at 1x vs 10x,
3. an L-BFGS fit (10 iterations) at 1x vs 10x.

Run:  python examples/scale_probe.py [sf_dir] [workdir]
Results from the local[32] container are recorded in SURVEY.md §9.
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

    workdir = workdir or tempfile.mkdtemp(prefix="dask_glm_spark_sf1_")
    spark = get_spark(app_name="scale_probe")

    base = load_glm_fast(spark, sf_dir)
    n1 = base.count()

    big_path = f"{workdir}/glm_10x.parquet"
    reduce(lambda a, b: a.unionAll(b), [base] * 10).repartition(64).write.mode(
        "overwrite"
    ).parquet(big_path)
    big = spark.read.parquet(big_path)
    n10 = big.count()
    print(f"rows: 1x={n1} 10x={n10}")

    beta = np.array([0.1, -0.2, 0.3, 0.05])
    out = {}
    for tag, df in (("1x", base), ("10x", big)):
        # warm the scan, then time the fused kernel twice and keep the min
        kernels.loss_gradient(df, Logistic, beta, 4)
        t = []
        for _ in range(2):
            t0 = time.perf_counter()
            kernels.loss_gradient(df, Logistic, beta, 4)
            t.append(time.perf_counter() - t0)
        out[f"kernel_{tag}"] = round(min(t), 3)

        t0 = time.perf_counter()
        LogisticRegression(
            solver="admm", regularizer="l2", fit_intercept=False, max_iter=10
        ).fit(df)
        out[f"admm_{tag}"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        LogisticRegression(
            solver="lbfgs", regularizer=None, fit_intercept=False, max_iter=10
        ).fit(df)
        out[f"lbfgs_{tag}"] = round(time.perf_counter() - t0, 3)

    for k in ("kernel", "admm", "lbfgs"):
        r = out[f"{k}_10x"] / out[f"{k}_1x"]
        print(f"{k}: 1x={out[f'{k}_1x']}s 10x={out[f'{k}_10x']}s ratio={r:.2f}x")
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
