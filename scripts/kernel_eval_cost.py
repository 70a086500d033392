#!/usr/bin/env python
"""Per-evaluation kernel cost probe (guide §1: measure first).

Times repeated kernel evaluations over a warm cached frame in three
conditions:

- sql path, FIXED beta      -> plan + codegen source identical across
                               calls: Janino cache HIT (floor of the path)
- sql path, FRESH beta      -> new scalar literals each call: Janino cache
                               MISS every call (what the iterative solvers
                               actually pay per evaluation today)
- arrow path, FRESH beta    -> literal-free plan (beta rides the Python
                               closure): source identical across calls

The fresh-vs-fixed sql delta IS the per-iteration Catalyst+Janino tax;
comparing it against the arrow row decides which physical path an
iterative solver should run at bench p.

Usage: python scripts/kernel_eval_cost.py [-n 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=10)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import numpy as np
    from pyspark import StorageLevel

    from dask_glm_spark.session import get_spark
    from dask_glm_spark.sources.glm_source import load_glm_fast
    from dask_glm_spark.functions import kernels
    from dask_glm_spark.functions.families import Logistic
    from dask_glm_spark.plans.layout import ensure_min_parallelism

    spark = get_spark(app_name="kernel_eval_cost")
    df = load_glm_fast(spark, sf_dir)
    df = ensure_min_parallelism(df).persist(StorageLevel.MEMORY_AND_DISK)
    n_rows = df.count()
    p = kernels.infer_p(df)
    print(f"rows={n_rows} p={p}", flush=True)
    spark.range(32).repartition(32).mapInArrow(lambda it: it, "id long").count()

    rng = np.random.RandomState(0)

    def bench(kname, fn, fresh: bool, n: int):
        fn(np.full(p, 0.125))  # warm: compile this shape once
        ts = []
        for _ in range(n):
            beta = rng.rand(p) * 0.5 if fresh else np.full(p, 0.125)
            t0 = time.perf_counter()
            fn(beta)
            ts.append(time.perf_counter() - t0)
        lab = "fresh" if fresh else "fixed"
        print(
            f"{kname:24s} {lab}: min={min(ts)*1e3:7.1f}ms "
            f"mean={sum(ts)/len(ts)*1e3:7.1f}ms", flush=True,
        )

    lg_sql = lambda b: kernels.loss_gradient(df, Logistic, b, p, path="sql")
    lg_arrow = lambda b: kernels.loss_gradient(df, Logistic, b, p, path="arrow")
    gh_sql = lambda b: kernels.gradient_hessian(df, Logistic, b, p, path="sql")
    gh_arrow = lambda b: kernels.gradient_hessian(df, Logistic, b, p, path="arrow")
    hv_sql = lambda b: kernels.hessian_vector_product(
        df, Logistic, b, np.full(p, 0.1), p, path="sql")
    hv_arrow = lambda b: kernels.hessian_vector_product(
        df, Logistic, b, np.full(p, 0.1), p, path="arrow")

    for name, fn in [
        ("loss_gradient/sql", lg_sql),
        ("loss_gradient/arrow", lg_arrow),
        ("gradient_hessian/sql", gh_sql),
        ("gradient_hessian/arrow", gh_arrow),
        ("hvp/sql", hv_sql),
        ("hvp/arrow", hv_arrow),
    ]:
        bench(name, fn, fresh=False, n=args.n)
        bench(name, fn, fresh=True, n=args.n)

    # Is an array literal access constant-folded back into a scalar
    # literal? (Decides whether a literal-free sql form is even possible.)
    from pyspark.sql import functions as F

    probe = spark.range(1).select(
        (F.lit([1.5, 2.5])[1] * F.col("id").cast("double")).alias("x")
    )
    plan = probe._jdf.queryExecution().optimizedPlan().toString()
    print("array-literal fold probe:", "FOLDED" if "2.5" in plan else "KEPT")
    print(plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
