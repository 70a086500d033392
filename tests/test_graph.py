"""Connected components + component dedup survivors.

Oracle: a driver-side union-find over the same pair list — the textbook
sequential algorithm, structurally unrelated to the distributed
alternating-star implementation it checks.
"""

from __future__ import annotations

import random

import pytest

from dask_glm_spark.operators.graph import (
    component_stats,
    connected_components,
    neardup_survivors,
)


def _union_find(n_nodes: list[int], pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent = {x: x for x in n_nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-label: min id reachable = root after path compression
    # (roots are always the min of their tree by the union rule above)
    return {x: find(x) for x in n_nodes}


def _cc_dict(pairs_df, **kw) -> dict[int, int]:
    return {
        r["id"]: r["component"]
        for r in connected_components(pairs_df, **kw).collect()
    }


@pytest.mark.parametrize("local_threshold", [0, 200_000])
def test_chain_collapses_to_min(spark, local_threshold):
    # 0-1-2-...-9: one component, label 0; exercises multi-hop closure
    # in BOTH the distributed star contraction (threshold 0) and the
    # driver union-find fast path (default threshold)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    got = _cc_dict(pairs, local_threshold=local_threshold)
    assert got == {i: 0 for i in range(10)}


def test_two_components_and_duplicate_reversed_edges(spark):
    rows = [(1, 2), (2, 1), (2, 3), (1, 3), (10, 11), (10, 11)]
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    got = _cc_dict(pairs)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_self_loops_ignored(spark):
    pairs = spark.createDataFrame([(5, 5), (5, 6)], "id_a long, id_b long")
    assert _cc_dict(pairs) == {5: 5, 6: 5}


@pytest.mark.parametrize("local_threshold", [0, 200_000])
def test_empty_pairs(spark, local_threshold):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs, local_threshold=local_threshold).count() == 0


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("local_threshold", [0, 200_000])
def test_random_graph_matches_union_find(spark, seed, local_threshold):
    rng = random.Random(seed)
    nodes = list(range(60))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(45)
    ]
    pairs_df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = _cc_dict(pairs_df, local_threshold=local_threshold)
    touched = sorted({x for p in pairs for x in p if p[0] != p[1]})
    expect = _union_find(touched, [p for p in pairs if p[0] != p[1]])
    assert got == expect


def test_component_stats(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    cc = connected_components(pairs)
    stats = {
        r["component"]: r["n_members"] for r in component_stats(cc).collect()
    }
    assert stats == {1: 3, 10: 2}


def test_neardup_survivors_keeps_root_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(7)], "doc_id long, text string"
    )
    # clusters {0,1,2} and {4,5}; 3 and 6 are singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"] for r in neardup_survivors(docs, pairs).collect()
    )
    assert kept == [0, 3, 4, 6]


def test_survivors_transitive_chain(spark):
    # A~B, B~C but NOT A~C: without the closure both A and C survive;
    # with it only A does — the reason this operator exists.
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in neardup_survivors(docs, pairs).collect())
    assert kept == [1]


def test_hub_graph_converges_in_log_rounds(spark, caplog):
    """VERDICT r6 #6: power-law hub fixture. One hub node sits in ~30% of
    edges; the star contraction must still converge in O(log n) rounds
    (the hub is a skewed JOIN KEY for the min-agg + join-back, never an
    in-memory neighbor list) and produce the same labels as union-find."""
    import logging

    rng = random.Random(7)
    n = 400
    nodes = list(range(n))
    edges: list[tuple[int, int]] = []
    # chain backbone over the non-hub nodes (worst case for naive O(D)
    # label propagation), then hub spokes until the hub holds ~30%
    for i in range(1, n - 1):
        edges.append((i, i + 1))
    hub = 0
    n_spokes = len(edges) * 3 // 7 + 1  # spokes/(chain+spokes) ≈ 30%
    for _ in range(n_spokes):
        edges.append((hub, rng.randrange(1, n)))
    assert sum(1 for a, b in edges if hub in (a, b)) / len(edges) >= 0.29

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    with caplog.at_level(logging.INFO, logger="dask_glm_spark.operators.graph"):
        got = _cc_dict(pairs, local_threshold=0)  # force distributed path
    assert got == _union_find(nodes, edges)  # all one component, label 0

    rounds = [
        int(rec.args[0])
        for rec in caplog.records
        if "converged" in rec.getMessage()
    ]
    assert rounds, "distributed path did not log convergence"
    # O(log n): log2(400) ≈ 8.6; alternating stars converge well under it,
    # and far under the O(D)=400 a label-propagation loop would need.
    assert rounds[-1] <= 10
