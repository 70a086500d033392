"""Sparse-kernel scale probe (round 13, after the mapInArrow conversion).

The sparse CSR kernels went arrow-native this round
(``kernels_sparse._batch_csr`` reads ListArray offsets/values zero-copy
instead of paying the arrow→pandas per-row ndarray allocation). This
probe manufactures 1x / 10x / 100x wide-sparse frames (hashed unigram
features over the documents table, nnz ≈ tokens per row, p = 2^15 —
the fit_text_classifier shape) and times the two per-iteration kernel
units every sparse solver is built from:

1. ``loss_gradient_sparse``        — the fused solver gradient scan,
2. ``multi_loss_gradient_sparse``  — the 8-candidate line-search probe.

Contract: the 10x→100x wall ratio stays ~linear in rows (the job floor
makes 1x→10x look sub-linear; the honest signal is the big step). The
partial stays (1 + p) / k·(1 + p) doubles per partition regardless of
rows — any super-linearity would be python-side per-batch overhead,
which is exactly what the arrow conversion removed.

Run:  python examples/sparse_scale_probe.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P = 2**15


def main(sf_dir: str = "/root/testdata/sf0.1", workdir: str | None = None):
    from functools import reduce

    from pyspark.sql import functions as F

    from dask_glm_spark.functions import kernels_sparse
    from dask_glm_spark.functions.families import Logistic
    from dask_glm_spark.operators.text import _sparse_rows
    from dask_glm_spark.session import get_spark
    from dask_glm_spark.sources.glm_source import load_table

    workdir = workdir or tempfile.mkdtemp(prefix="dask_glm_spark_sparse_")
    spark = get_spark(app_name="sparse_scale_probe")

    docs = load_table(spark, sf_dir, "documents")
    feats = (
        _sparse_rows(docs, "text", "doc_id", P)
        .where(F.size("buckets") > 0)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .select(
            F.col("buckets").alias("findices"),
            F.col("tfs").alias("fvalues"),
            (F.col("n_chars") % 2).cast("double").alias("label"),
        )
    )
    n1 = feats.count()
    frames = {"1x": feats}
    # each level = 10 copies of the PREVIOUS level's parquet (a 1000-way
    # unionAll of the base plan would explode the logical plan; reading
    # the prior level back keeps every union 10-wide)
    prev = feats
    for mult, parts in ((10, 32), (100, 128), (1000, 256)):
        path = f"{workdir}/sparse_{mult}x.parquet"
        reduce(lambda a, b: a.unionAll(b), [prev] * 10).repartition(
            parts
        ).write.mode("overwrite").parquet(path)
        prev = frames[f"{mult}x"] = spark.read.parquet(path)
        print(f"rows {mult}x = {frames[f'{mult}x'].count()} ({n1} x {mult})")

    rng = np.random.default_rng(7)
    beta = rng.normal(0, 0.01, P)
    cands = [beta * (1 - 0.1 * i) for i in range(8)]
    out: dict[str, float] = {}
    for tag, df in frames.items():
        df = df.persist()
        df.count()
        for name, fn in (
            (
                "loss_grad",
                lambda d=df: kernels_sparse.loss_gradient_sparse(
                    d, Logistic, beta, P
                ),
            ),
            (
                "probe8",
                lambda d=df: kernels_sparse.multi_loss_gradient_sparse(
                    d, Logistic, cands, P
                ),
            ),
        ):
            fn()  # warm (plan + python workers)
            best = min(
                (lambda t0=time.perf_counter(): (fn(), time.perf_counter() - t0)[1])()
                for _ in range(2)
            )
            out[f"{name}_{tag}"] = best
            print(f"{name:10s} {tag:>4s}  {best:7.2f}s")
        df.unpersist()

    for name in ("loss_grad", "probe8"):
        r10 = out[f"{name}_10x"] / out[f"{name}_1x"]
        r100 = out[f"{name}_100x"] / out[f"{name}_10x"]
        r1000 = out[f"{name}_1000x"] / out[f"{name}_100x"]
        print(
            f"{name}: 1x->10x {r10:.1f}x, 10x->100x {r100:.1f}x, "
            f"100x->1000x {r1000:.1f}x (linear = 10x)"
        )
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
