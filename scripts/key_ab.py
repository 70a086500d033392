#!/usr/bin/env python
"""Isolated per-key A/B timer: one bench key (fit or declared query) in a
fresh process with the bench's warm-up discipline, min-of-N samples.

Usage:
    python scripts/key_ab.py q48_solver_steps [-n 3]
    python scripts/key_ab.py fit_admm_l2 fit_lbfgs
    SPARK_GRAFT_EXTRA_CONF="spark.sql.adaptive.enabled=false" \
        python scripts/key_ab.py q45_lsh_buckets

Prints one line per key:  KEY <name> <min_sec> samples=[...]
Fit keys replicate bench.py's exact constructor calls; query keys run
queries()[name] with the bench's collect-vs-noop sink choice, after one
warm pass at the warm SF (plan-shape compile) exactly like bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("-n", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    extra = {}
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()

    from dask_glm_spark.session import get_spark
    from dask_glm_spark.sources.glm_source import load_glm_fast, load_table
    from dask_glm_spark.operators.estimators import (
        LogisticRegression, TweedieRegression,
    )

    spark = get_spark(app_name="key_ab", extra_conf=extra or None)
    df = load_glm_fast(spark, sf_dir)
    df.count()
    spark.range(32).repartition(32).mapInArrow(lambda it: it, "id long").count()
    warm = df.limit(20_000)
    LogisticRegression(
        solver="admm", regularizer="l2", fit_intercept=False, max_iter=2
    ).fit(warm)
    LogisticRegression(solver="lbfgs", regularizer=None, max_iter=3).fit(warm)

    from pyspark.sql import functions as F

    def _fit_weighted():
        dfw = load_glm_fast(spark, sf_dir).withColumn(
            "w", (F.abs(F.hash("label")) % 3 + 1).cast("double")
        )
        LogisticRegression(
            solver="lbfgs", regularizer=None, fit_intercept=False,
            weight_col="w",
        ).fit(dfw)

    def _fit_reg_path():
        from dask_glm_spark.operators.model_selection import regularization_path

        regularization_path(
            load_glm_fast(spark, sf_dir),
            [0.3, 0.1, 0.03, 0.01],
            solver="proximal_grad",
            regularizer="l1",
            max_iter=30,
        )

    def _fit_sparse_softmax():
        from dask_glm_spark.operators.text import fit_text_classifier

        fit_text_classifier(
            load_table(spark, sf_dir, "documents").repartition(8),
            num_features=2**13,
            sparse=True,
            max_iter=10,
        )

    fits = {
        "fit_admm_l2": lambda: LogisticRegression(
            solver="admm", regularizer="l2", fit_intercept=False, max_iter=10
        ).fit(load_glm_fast(spark, sf_dir)),
        "fit_lbfgs": lambda: LogisticRegression(
            solver="lbfgs", regularizer=None, fit_intercept=False
        ).fit(load_glm_fast(spark, sf_dir)),
        "fit_newton": lambda: LogisticRegression(solver="newton", max_iter=20).fit(
            load_glm_fast(spark, sf_dir)
        ),
        "fit_newton_cg": lambda: LogisticRegression(
            solver="newton_cg", max_iter=20
        ).fit(load_glm_fast(spark, sf_dir)),
        "fit_gradient_descent": lambda: LogisticRegression(
            solver="gradient_descent", max_iter=30
        ).fit(load_glm_fast(spark, sf_dir)),
        "fit_proximal_grad_l1": lambda: LogisticRegression(
            solver="proximal_grad", regularizer="l1", lamduh=0.01, max_iter=30
        ).fit(load_glm_fast(spark, sf_dir)),
        "fit_weighted_lbfgs": _fit_weighted,
        "fit_tweedie_newton": lambda: TweedieRegression(
            var_power=1.5, solver="newton", max_iter=20
        ).fit(load_glm_fast(spark, sf_dir)),
        "fit_reg_path": _fit_reg_path,
        "fit_sparse_softmax_text": _fit_sparse_softmax,
    }

    import __spark_entry__ as e

    qs = e.queries()
    noop_materialize = {"q30_simhash_pairs", "q31_tfidf"}

    def run_query(name: str, d: str) -> None:
        df_q = qs[name](spark, d)
        if name in noop_materialize:
            df_q.write.format("noop").mode("overwrite").save()
        else:
            df_q.collect()

    for key in args.keys:
        if key in fits:
            runner = fits[key]
        elif key in qs:
            try:
                run_query(key, warm_dir)  # plan-shape warm pass
            except Exception:
                pass
            spark.catalog.clearCache()
            runner = lambda key=key: run_query(key, sf_dir)
        else:
            print(f"KEY {key} UNKNOWN")
            continue
        samples = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            runner()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(f"KEY {key} {min(samples)} samples={samples}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
