"""Graph operators: connected components over near-duplicate pair graphs,
and component-based dedup survivors.

Beyond-reference surface (SURVEY.md §7 step 10 follow-on). MinHash/SimHash
dedup emits PAIRS, but the action a curation pipeline takes is per-CLUSTER:
keep one representative of each connected component of the pair graph
(near-duplication is not transitive, so without the closure a chain
A~B~C keeps A and C even though they are both "duplicates of B's cluster").

Scale contract:

- **Alternating large-star / small-star** (Kiveris, Lattanzi, Mirrokni,
  Rastogi, Vassilvitskii — "Connected Components in MapReduce and Beyond",
  ACM SoCC'14): converges in O(log n) rounds on any graph, against O(D)
  rounds for naive label propagation on a diameter-D chain — at 100 TB a
  boilerplate chain through the corpus easily has D in the thousands.
- **No neighbor buffers.** Each star phase is an aggregate (min over the
  adjacency) plus an equi-join back on the node id — never
  ``collect_list(neighbors)``, so a hub node with millions of neighbors is
  a skewed join key (AQE skew-split parallelizes it) instead of one task's
  in-memory list. The same discipline as dedup.lsh_candidates.
- **Bounded lineage.** Every round ends in ``localCheckpoint(eager=True)``
  so the iterative plan never grows; a round's blocks are dropped by the
  ContextCleaner once the next round's checkpoint stops referencing them.
- **O(edges) traffic per round.** Both phases shuffle the (deduplicated)
  edge set only; edge count is non-increasing across rounds after the
  first large-star.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set in (larger, smaller) orientation, self-loops
    dropped, deduplicated."""
    return (
        edges.where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )


def _local_components(edges: DataFrame, rows=None) -> DataFrame:
    """Driver-side union-find over a small collected edge set. Produces the
    same min-label components as the distributed contraction. ``rows``
    lets the caller pass an already-collected edge list (the
    single-probe-job path in ``connected_components``)."""
    if rows is None:
        rows = edges.collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        u, v = r["u"], r["v"]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by label order keeps every root the min of its tree
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    out = [(x, find(x)) for x in parent]
    schema = (
        edges.select(F.col("u").alias("id"), F.col("u").alias("component"))
        .schema
    )
    return edges.sparkSession.createDataFrame(out, schema)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    local_threshold: int = 200_000,
) -> DataFrame:
    """Connected components of the undirected pair graph.

    Returns ``(id, component)`` for every node that appears in ``pairs``,
    where ``component`` is the minimum node id of the component (a
    canonical, deterministic label). Nodes with no pairs don't appear —
    callers treat absence as "singleton component of itself"
    (`neardup_survivors` does exactly that via an anti-join).

    Convergence is detected by a (count, hash-sum) signature of the edge
    set staying fixed across a round — two cheap aggregates, no
    set-subtract shuffle. The star fixpoint is a forest of stars, so at
    convergence every edge is (member, root) and labels fall out without
    further work.

    ``local_threshold``: verified near-dup pair graphs are typically
    vanishing next to the corpus (LSH emits only real near-dups), and each
    distributed round costs several fixed-latency stages. When the
    deduplicated edge count fits comfortably on the driver (default 200k
    edges ≈ a few MB), a driver-side union-find produces identical labels
    in one collect — the same adaptive small-side escape hatch as a
    broadcast join. Set ``local_threshold=0`` to force the distributed
    contraction (huge graphs take it automatically).
    """
    from pyspark import StorageLevel

    from dask_glm_spark.functions.kernels import kernel_exec

    canon = _canonical(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    )
    if local_threshold:
        # ONE bounded probe job decides the escape hatch AND fetches the
        # edges (r13, guide §1/§5: the old shape paid three fixed-latency
        # jobs — eager checkpoint, count, collect — before any real work).
        # If limit(threshold+1) did not truncate, the collected list IS the
        # entire deduplicated edge set; otherwise the persisted partials
        # and the probe's completed shuffle map stages feed the checkpoint
        # below instead of being recomputed from the source.
        canon = canon.persist(StorageLevel.MEMORY_AND_DISK)
        # try/finally (ADVICE r13): a raise in the probe collect or the
        # local union-find must not leak the MEMORY_AND_DISK cache for the
        # session lifetime.
        try:
            with kernel_exec(canon.sparkSession):
                probe = canon.limit(local_threshold + 1).collect()
            if len(probe) <= local_threshold:
                return _local_components(canon, rows=probe)
            edges = canon.localCheckpoint(eager=True)
        finally:
            canon.unpersist()
    else:
        edges = canon.localCheckpoint(eager=True)

    prev_sig = None
    for it in range(max_iter):
        # -- large-star: for each u, connect every larger neighbor to
        # m(u) = min(neighborhood(u) + u).  Aggregate + join, no buffers.
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        large = _canonical(
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

        # -- small-star: edges directed (larger -> smaller); for each u,
        # point every smaller neighbor (and u itself) at min(N(u)).
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = _canonical(
            large.join(mins2, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select("u", F.col("m").alias("v")))
        )

        edges = small.localCheckpoint(eager=True)
        # bit_xor: order-independent AND overflow-free under ANSI mode
        # (sum(hash) raises ARITHMETIC_OVERFLOW on long); scalar result
        # over a checkpointed set — tiny-result kernel action shape
        with kernel_exec(edges.sparkSession):
            row = edges.agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(xxhash64(u, v))").alias("h"),
            ).collect()[0]
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            _log.info("connected_components converged after %d rounds", it + 1)
            break
        prev_sig = sig
    else:
        _log.warning(
            "connected_components: max_iter=%d hit before convergence "
            "(labels below are still a valid partial contraction)",
            max_iter,
        )

    # At the star fixpoint every canonical edge is (member, root).  The
    # min-agg is a no-op then, but keeps labels well-defined if max_iter
    # was hit mid-contraction.
    members = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("id"), F.col("v").alias("component"))
    return (
        members.union(roots)
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )


def component_stats(cc: DataFrame) -> DataFrame:
    """Per-component member counts — the cluster-size histogram input.
    One hash aggregate; partial aggregation makes it O(components) traffic."""
    return cc.groupBy("component").agg(F.count("*").cast("long").alias("n_members"))


def neardup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep one representative per near-dup cluster: the row whose id IS
    the component label (the minimum id of its component), plus every row
    in no pair at all. The pair graph is vanishingly small next to the
    corpus (LSH emits only verified near-dups), so the anti-join's right
    side — non-root members only — is broadcastable at any realistic
    dup rate; Spark's AQE converts it to a broadcast join on size."""
    cc = connected_components(pairs, src=src, dst=dst)
    losers = cc.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, on=id_col, how="left_anti")
