"""Wide-p scale probe (VERDICT r10 #2): the GLM core past the benched p=5.

Every fit bench runs at p=5; the 100 TB text-classifier story claims
O(k·nnz) per scan at 2^18 hashed dims, and the dense solvers' partials
are p (gradient) or p² (Gram) floats per partition. This probe measures
both claims on real plans:

1. **Sparse softmax text classifier at 2^16 buckets**, 1x vs 10x rows
   (documents table unioned 10x, written once): the per-evaluation cost
   must scale with rows (O(k·nnz)), never with the 65k-dim dense shape.
2. **Dense lbfgs at p=1000**: one fused loss+gradient scan per
   evaluation carries p doubles per partition — the fit should look like
   the p=5 fit with a fatter scan.
3. **Dense newton single iterations at p ∈ {256, 1024, 2048}**: the Gram
   partial is p² doubles per partition (0.5/8/32 MB) merged driver-side
   plus one p×p lstsq — this measures where that bends, calibrating
   ``solvers.NEWTON_WIDE_P`` (the warn threshold past which lbfgs is the
   right plan).
4. **Dense ADMM at p=1000**: exercises the round-11 byte-aware block
   caps (blocks bounded at 128 MB of X regardless of p).

Run:  python examples/wide_p_probe.py [sf_dir] [workdir]
Results from the local[32] container are recorded in SURVEY.md §19.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DENSE = 200_000  # rows for the dense wide-p frames
TRUE_P = 8  # informative dims; the rest are noise columns


def _gen_dense(spark, path: str, p: int) -> None:
    """Deterministic n x p logistic data written once: numpy per Arrow
    batch, seeded by the batch's first id — no driver-side row building."""
    import pyarrow as pa

    def gen(batches):
        rng_w = np.random.RandomState(7)
        w = rng_w.standard_normal(TRUE_P)
        for b in batches:
            ids = b.column("id").to_numpy()
            rng = np.random.RandomState(int(ids[0]) % (2**31 - 1))
            X = rng.standard_normal((len(ids), p))
            z = X[:, :TRUE_P] @ w
            y = (1.0 / (1.0 + np.exp(-z)) > rng.uniform(size=len(ids)))
            yield pa.RecordBatch.from_arrays(
                [pa.array(list(X), type=pa.list_(pa.float64())),
                 pa.array(y.astype(np.float64))],
                names=["features", "label"],
            )

    spark.range(N_DENSE, numPartitions=32).mapInArrow(
        gen, "features array<double>, label double"
    ).write.mode("overwrite").parquet(path)


def main(sf_dir: str = "/root/testdata/sf0.1", workdir: str | None = None):
    from functools import reduce

    from pyspark.sql import functions as F

    from dask_glm_spark.operators import solvers
    from dask_glm_spark.operators.text import fit_text_classifier
    from dask_glm_spark.session import get_spark

    workdir = workdir or tempfile.mkdtemp(prefix="dask_glm_spark_widep_")
    spark = get_spark(app_name="wide_p_probe")
    out: dict[str, float] = {}

    # -- 1. sparse softmax classifier, 2^16 buckets, 1x vs 10x rows -------
    docs1 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    big_path = f"{workdir}/docs_10x.parquet"
    reduce(
        lambda a, b: a.unionAll(b),
        [
            docs1.withColumn(
                "doc_id", F.concat(F.col("doc_id"), F.lit(f"_{i}"))
            )
            for i in range(10)
        ],
    ).repartition(32).write.mode("overwrite").parquet(big_path)
    docs10 = spark.read.parquet(big_path)
    print(f"docs: 1x={docs1.count()} 10x={docs10.count()}")

    for tag, docs in (("1x", docs1), ("10x", docs10)):
        # warm pass compiles the plan shape at 1/4 of the budget
        fit_text_classifier(
            docs, num_features=2**16, sparse=True, max_iter=2, lamduh=0.0,
            regularizer=None,
        )
        t0 = time.perf_counter()
        m = fit_text_classifier(
            docs, num_features=2**16, sparse=True, max_iter=10, lamduh=0.0,
            regularizer=None,
        )
        out[f"sparse_softmax_{tag}"] = round(time.perf_counter() - t0, 3)
        print(
            f"sparse_softmax_{tag}: {out[f'sparse_softmax_{tag}']}s "
            f"(n_iter={m.n_iter_})"
        )

    # -- 2-4. dense wide-p ------------------------------------------------
    for p in (256, 1024, 2048):
        path = f"{workdir}/dense_p{p}.parquet"
        _gen_dense(spark, path, p)
        df = spark.read.parquet(path)
        if p == 1024:
            # lbfgs full fit: the recommended wide-p dense plan
            t0 = time.perf_counter()
            solvers.lbfgs(
                df, regularizer=None, max_iter=10, tol=1e-12,
            )
            out[f"lbfgs_p{p}"] = round(time.perf_counter() - t0, 3)
            print(f"lbfgs_p{p}: {out[f'lbfgs_p{p}']}s (10 iters)")
            # admm with the byte-aware block caps (10 rounds)
            t0 = time.perf_counter()
            solvers.admm(df, regularizer="l2", lamduh=0.1, max_iter=10)
            out[f"admm_p{p}"] = round(time.perf_counter() - t0, 3)
            print(f"admm_p{p}: {out[f'admm_p{p}']}s (10 rounds)")
        # newton: 2 iterations (the Gram partial is the whole story);
        # min-of-2 over per-iteration wall
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            solvers.newton(df, max_iter=2, tol=0.0)
            times.append((time.perf_counter() - t0) / 2)
        out[f"newton_iter_p{p}"] = round(min(times), 3)
        print(f"newton_iter_p{p}: {out[f'newton_iter_p{p}']}s/iter")

    print(out)
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
