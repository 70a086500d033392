"""Distributed k-means over embedding columns.

Beyond-reference surface: the clustering counterpart of the GLM solvers,
built on the same driver-optimizer / cluster-evaluator split
(SURVEY.md §3.2): the k x d centroid matrix lives on the driver (small),
the data never moves, and each Lloyd iteration is ONE plan-stable
``mapInPandas`` pass over the persisted vectors: per Arrow batch a GEMM
argmax assigns (identical math to ``similarity._kmeans_np``), a
scatter-add builds the (cluster, count, sum-vector) partials, and the
driver reduces n_partitions x k partial rows — the GLM kernels'
partial-aggregation shape. Centroids ride the function closure, NOT plan
literals: the literal-folded groupBy it replaces generated a fresh plan
(fresh Janino compile) every round, which dominated the O(k·d) data work
at bench scale. The one-shot ``assign_expr`` literal map remains the
right shape for the non-iterative consumers (``kmeans_assign``,
``cluster_sizes``, the IVF index) where the plan compiles once.

So per-iteration cluster traffic is O(k·d) in and out, independent of
corpus size — the same contract as the GLM gradient kernels. Centroid
init is a seeded driver-side sample (``similarity.train_ivf_centroids``
shape): deterministic and corpus-size-independent.

Parity: ``tests/test_clustering.py`` pins the Spark iteration against
driver-side numpy Lloyd's (``similarity._kmeans_np``) from the same init
— same assignments, centroids to fp tolerance. The iteration itself is
not ANSI-SQL-expressible (it is a fixpoint loop), so the declared query
q46 reports cluster sizes under the driver's weaker rows-only check —
the assignment math it rides on is hash-checked separately by q45.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_glm_spark.functions.kernels import kernel_exec
from dask_glm_spark.operators.similarity import (
    IVF_SAMPLE_ROWS,
    IVF_SEED,
    _centroid_sims_expr,
)
from dask_glm_spark.plans.layout import ensure_min_parallelism


def assign_expr(vec: Column, centroids: np.ndarray) -> Column:
    """0-based nearest-centroid id (L2) as one narrow codegen'd argmax."""
    sims = _centroid_sims_expr(vec, centroids)
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def _init_centroids(
    df: DataFrame, k: int, vec_col: str, seed: int
) -> np.ndarray:
    """Seeded sample-based init (bounded driver collect via the SAME
    ``similarity.sample_vectors`` policy the IVF quantizer uses — one
    definition of the sampling bound/determinism caveat)."""
    from dask_glm_spark.operators.similarity import sample_vectors

    X = sample_vectors(df, vec_col, IVF_SAMPLE_ROWS)
    rng = np.random.RandomState(seed)
    return X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()


def kmeans_fit(
    df: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    max_iter: int = 10,
    tol: float = 1e-6,
    seed: int = IVF_SEED,
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Lloyd's k-means; returns the (k, d) centroid matrix.

    Empty clusters keep their previous centroid (the standard
    keep-stale-center convention — matches ``similarity._kmeans_np``).
    Stops when max centroid shift (L2) <= ``tol`` or after ``max_iter``.
    """
    import pandas as pd
    from pyspark import StorageLevel

    # Iterative-input discipline (same as the GLM solvers' @normalize,
    # solvers.py:65-75): project to just the vector column and persist
    # ONCE, so each Lloyd round scans the cache instead of re-reading the
    # source and re-executing the ensure_min_parallelism shuffle.
    # r14 (guide §5, the q48 shared-projection pattern): when the CALLER
    # already holds the prepared projection — cached, single vector
    # column — reuse it instead of building a second identical cache
    # (q46 shares one cache across init, the Lloyd rounds, the sizes
    # histogram and its gate collect; contract: the column must already
    # be array<double>, which exact float->double widening guarantees
    # for float embeddings).
    we_persisted = False
    if df.is_cached and df.columns == [vec_col]:
        data = df if vec_col == "_v" else df.select(F.col(vec_col).alias("_v"))
    else:
        vd = F.col(vec_col).cast("array<double>")
        data = ensure_min_parallelism(df.select(vd.alias("_v"))).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        we_persisted = True
    try:
        if centroids is None:
            centroids = _init_centroids(data, k, "_v", seed)
        k = len(centroids)

        # Each round is ONE plan-stable mapInPandas pass emitting per-batch
        # partial (cluster, count, sum-vector) rows — the GLM kernels'
        # partial-aggregation shape (kernels._arrow_partials). Centroids
        # travel in the function closure, so the Spark PLAN is byte-
        # identical across rounds: the literal-folded groupBy(d avg
        # columns) it replaces re-Janino-compiled a fresh plan per round
        # (fresh centroid literals), and at bench scale that compile
        # dominated the actual O(k*d) data work ~5:1. Per-batch math is
        # pure BLAS: one GEMM argmax + one scatter-add. Cluster traffic
        # stays O(n_partitions * k * d) per round, corpus-size independent.
        for _ in range(max_iter):
            cent = np.ascontiguousarray(centroids, dtype=np.float64)
            half = 0.5 * (cent * cent).sum(axis=1)

            def partials(batches):
                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                    a = (X @ cent.T - half).argmax(axis=1)
                    cnt = np.bincount(a, minlength=k)
                    # one-hot GEMM, not np.add.at: the buffered-ufunc
                    # scatter is the slow path (same reason it was removed
                    # from the sparse line-search probes); k x m indicator
                    # times (m, d) is real BLAS.
                    onehot = np.zeros((k, len(a)))
                    onehot[a, np.arange(len(a))] = 1.0
                    S = onehot @ X
                    nz = np.nonzero(cnt)[0]
                    yield pd.DataFrame(
                        {
                            "cluster": nz.astype(np.int32),
                            "n": cnt[nz].astype(np.int64),
                            "s": [S[j].tolist() for j in nz],
                        }
                    )

            # O(n_partitions * k) partial rows, no exchange in the plan —
            # the GLM kernels' tiny-result action shape (skip AQE barriers)
            with kernel_exec(data.sparkSession):
                rows = data.mapInPandas(
                    partials, "cluster int, n long, s array<double>"
                ).collect()
            tot_n = np.zeros(k)
            tot_s = np.zeros_like(cent)
            for r in rows:
                tot_n[r["cluster"]] += r["n"]
                tot_s[r["cluster"]] += np.asarray(r["s"])
            new = centroids.copy()
            nz = tot_n > 0
            new[nz] = tot_s[nz] / tot_n[nz, None]
            shift = float(np.sqrt(((new - centroids) ** 2).sum(axis=1)).max())
            centroids = new
            if shift <= tol:
                break
    finally:
        if we_persisted:
            data.unpersist()
    return centroids


def lloyd_np(
    X: np.ndarray, centroids: np.ndarray, iters: int, tol: float = 0.0
) -> np.ndarray:
    """Driver-side reference Lloyd from a GIVEN init — the parity oracle
    for ``kmeans_fit`` (same assignment math: argmax of x·c - ||c||²/2,
    same keep-stale-empty-centroid convention, same max-shift stop), used
    by the q46 accuracy-contract query and tests/test_clustering.py.
    Distributed partial sums reorder fp addition, so parity is allclose
    (~1e-9), not bit equality."""
    X = np.asarray(X, dtype=np.float64)
    cent = np.ascontiguousarray(centroids, dtype=np.float64).copy()
    for _ in range(iters):
        half = 0.5 * (cent * cent).sum(axis=1)
        a = (X @ cent.T - half).argmax(axis=1)
        new = cent.copy()
        for j in range(len(cent)):
            m = X[a == j]
            if len(m):
                new[j] = m.mean(axis=0)
        shift = float(np.sqrt(((new - cent) ** 2).sum(axis=1)).max())
        cent = new
        if shift <= tol:
            break
    return cent


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Attach the nearest-centroid id — a pure narrow map (zero shuffle),
    composable with any downstream filter/sample/dedup-by-cluster step."""
    return df.withColumn(out_col, assign_expr(F.col(vec_col), centroids))


def cluster_sizes(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, n) histogram — the q46 reporting shape."""
    return (
        kmeans_assign(df, centroids, vec_col)
        .groupBy("cluster")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("cluster")
    )


def semantic_dedup_pairs(
    df: DataFrame,
    k: int = 64,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 5,
    seed: int = IVF_SEED,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup-style near-duplicate pairs: k-means clusters as blocks,
    exact GEMM cosine within each block.

    The published recipe (Abbas et al. 2023): semantically near-identical
    documents land in the same coarse cluster, so the quadratic
    cosine search runs per cluster — O(sum m_c²) instead of O(n²) — and k
    is the knob trading recall (cross-cluster dup pairs are missed) for
    cost. Composes ``kmeans_fit`` + ``embedding_neardup_pairs('exact')``;
    cluster ids are the block column, one GEMM per cluster.
    """
    from dask_glm_spark.operators.similarity import embedding_neardup_pairs

    if centroids is None:
        centroids = kmeans_fit(
            df, k=k, vec_col=vec_col, max_iter=max_iter, seed=seed
        )
    assigned = kmeans_assign(df, centroids, vec_col, out_col="_cluster")
    return embedding_neardup_pairs(
        assigned,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        block_col="_cluster",
        method="exact",
    )
