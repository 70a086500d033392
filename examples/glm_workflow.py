"""End-to-end tour of the round-10 GLM workflow surface:

weighted fit → convergence diagnostics → warm-started refit →
λ_max + regularization path → cross-validation → offset (exposure)
Poisson model → JSON persistence round-trip.

Run: python examples/glm_workflow.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_glm_spark import (  # noqa: E402
    LogisticRegression,
    PoissonRegression,
    cv_lamduh,
    regularization_path,
)
from dask_glm_spark.sources.vectors import to_sparse_columns  # noqa: E402
from dask_glm_spark.operators.estimators import (  # noqa: E402
    cross_val_score,
    load_model,
    save_model,
)
from dask_glm_spark.operators.model_selection import (  # noqa: E402
    lamduh_max,
    softmax_lamduh_max,
    softmax_regularization_path,
)
from dask_glm_spark.session import get_spark  # noqa: E402
from dask_glm_spark.sources.glm_source import load_glm_fast  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="glm_workflow", shuffle_partitions=8)
    df = load_glm_fast(spark, sf_dir).repartition(5)

    # 1. weighted fit + diagnostics: upweight the positive class 2x
    dfw = df.withColumn(
        "w", F.when(F.col("label") > 0, 2.0).otherwise(1.0)
    ).persist()
    lr = LogisticRegression(
        solver="lbfgs", regularizer=None, weight_col="w", warm_start=True,
        max_iter=200,
    ).fit(dfw)
    print(
        f"[1] weighted fit: acc={lr.score(dfw):.3f} "
        f"n_iter={lr.n_iter_} converged={lr.converged_}"
    )

    # 2. warm-started refit (same data stands in for refit-after-append):
    # resumes at the optimum, so very few iterations
    lr.max_iter = 5
    lr.fit(dfw)
    print(f"[2] warm refit: n_iter={lr.n_iter_} converged={lr.converged_}")

    # 3. λ_max and a warm-started L1 path over one shared cache
    lmax = lamduh_max(dfw)
    lams = [lmax, lmax / 10, lmax / 100]
    path = regularization_path(
        dfw, lams, solver="proximal_grad", regularizer="l1",
        accelerate=True, max_iter=200, normalize=False,
    )
    nnz = [(np.abs(b) > 1e-8).sum() for b in path]
    print(f"[3] L1 path at λ={['%.3g' % v for v in lams]}: nnz={nnz}")
    assert nnz[0] == 0, "λ_max must kill every coefficient"

    # 4. deterministic 3-fold CV (content-hash folds — layout-independent)
    scores = cross_val_score(
        lambda: LogisticRegression(solver="lbfgs", regularizer=None),
        df, n_folds=3,
    )
    print(f"[4] 3-fold CV accuracy: {[round(s, 3) for s in scores]}")

    # 5. Poisson with an exposure offset: y ~ Poisson(T·exp(Xβ))
    dfe = df.withColumn(
        "off", F.log(F.lit(1.0) + (F.abs(F.hash("label")) % 4).cast("double"))
    ).withColumn("label", F.round(F.exp("label")).cast("double"))
    pr = PoissonRegression(
        solver="newton", offset_col="off", max_iter=60
    ).fit(dfe)
    print(
        f"[5] Poisson+offset: deviance={pr.get_deviance(dfe):.2f} "
        f"n_iter={pr.n_iter_}"
    )

    # 6. persistence round-trip (human-readable JSON, no pickle)
    with tempfile.TemporaryDirectory() as td:
        path_json = os.path.join(td, "model.json")
        save_model(lr, path_json)
        acc2 = load_model(path_json).score(dfw)
        print(f"[6] save/load round-trip: acc={acc2:.3f}")

    # 7. Wald inference (round 11): std errors / p-values at the fit,
    # per-row deviance residuals, and mean-response confidence intervals
    s = lr.summary(dfw)
    sig = [
        f"b[{j}]" for j, p in enumerate(s.p_values) if p < 0.05
    ]
    print(
        f"[7] summary: dispersion={s.dispersion:.3g} "
        f"({s.statistic_kind}-statistics), significant at 5%: {sig}"
    )
    rss = (
        lr.residuals(dfw, kind="deviance")
        .agg(F.sum(F.col("residual") ** 2).alias("d"))
        .collect()[0]["d"]
    )
    print(f"[7] sum of squared deviance residuals: {rss:.2f}")
    band = lr.predict_interval(dfw, s, level=0.95).agg(
        F.avg(F.col("hi") - F.col("lo")).alias("w")
    ).collect()[0]["w"]
    print(f"[7] mean 95% CI width (probability scale): {band:.4f}")

    # 8. round 12: matrix-free Newton-CG (newton semantics at any p),
    # the refit-at-MLE escape hatch for penalized fits, CV λ selection,
    # and per-coordinate Wald SEs on a wide-sparse fit
    ncg = LogisticRegression(
        solver="newton_cg", regularizer=None, max_iter=50, tol=1e-10
    ).fit(dfw)
    print(f"[8] newton_cg fit: acc={ncg.score(dfw):.3f} n_iter={ncg.n_iter_}")
    pen = LogisticRegression(max_iter=50).fit(dfw)  # admm + L2 (default)
    s_mle = pen.refit_mle(dfw).summary(dfw)
    print(
        f"[8] refit_mle on the default penalized config: "
        f"max SE={s_mle.std_errors.max():.4f}"
    )
    cv = cv_lamduh(
        dfw, [lmax, lmax / 10, lmax / 100], solver="proximal_grad",
        regularizer="l1", n_folds=3, max_iter=100, accelerate=True,
        normalize=False,
    )
    print(
        f"[8] cv_lamduh best λ={cv['best_lamduh']:.3g} "
        f"(mean held-out NLL {['%.4f' % v for v in cv['mean_test_loss']]})"
    )
    sd = to_sparse_columns(dfw.select("features", "label"))
    sp = LogisticRegression(
        solver="lbfgs", regularizer=None, fit_intercept=True, max_iter=200
    ).fit(sd, p=4)
    s_sp = sp.summary(sd, coords=[0, 4])  # slope 0 + the intercept coord
    print(
        f"[8] sparse coords SE (matrix-free CG): "
        f"{[round(v, 4) for v in s_sp.std_errors]}"
    )

    # 9. round 13: the batched λ-path — every λ's FISTA advanced by
    # shared fused scans (Σ-of-iterations → max-of-iterations passes
    # over the data), and the multinomial λ_max / path / CV trio
    bat = regularization_path(
        dfw, lams, solver="proximal_grad", regularizer="l1",
        batched=True, accelerate=True, max_iter=200, normalize=False,
    )
    print(
        f"[9] batched λ-path max|Δ| vs sequential: "
        f"{np.max(np.abs(bat - path)):.2e}"
    )
    df3 = dfw.withColumn(
        "label", (F.abs(F.hash("label")) % 3).cast("double")
    )
    slmax = softmax_lamduh_max(df3, 3)
    spath = softmax_regularization_path(
        df3, [slmax * 1.01, slmax / 20], 3, regularizer="l1",
        batched=True, max_iter=150, normalize=False,
    )
    print(
        f"[9] softmax λ_max={slmax:.3g}: nnz along path = "
        f"{[(np.abs(B) > 1e-8).sum() for B in spath]} (first must be 0)"
    )
    assert (np.abs(spath[0]) > 1e-8).sum() == 0

    dfw.unpersist()
    print("workflow complete")


if __name__ == "__main__":
    main(*sys.argv[1:2])
