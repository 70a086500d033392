"""Physical-layout helpers: parallelism floor for compute-dense inputs.

A parquet file is split at ROW-GROUP granularity: a table written as one
row group arrives as ONE Spark task no matter how many cores the cluster
has, and everything narrow downstream (interpreted higher-order text
expressions, per-row hashing, Arrow solver kernels) serializes onto that
single core. At 100 TB inputs have thousands of row groups and this is
never an issue — the hazard is the small-to-medium table (a benchmark
slice, one day of a feed, a dimension dump) whose per-row compute is
expensive.

``ensure_min_parallelism`` is the gated fix: IF the plan's current
partition count is below the session's core count, round-robin
repartition to it; otherwise return the input untouched (so at scale it
is exactly a no-op and scan locality / pushdown shapes are preserved).
The one-time shuffle of the raw rows is paid only when the alternative is
running the whole operator on one core.

Applied at the compute-dense entry points only (iterative solver caches,
dedup shingle projections, TF hashing) — never inside ``load_*`` paths,
where it would sit between the scan and later filters and break predicate
pushdown (tests/test_plans.py pins those shapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the session's
    defaultParallelism) iff it currently has fewer partitions; no-op
    otherwise. Deterministic round-robin — safe for any downstream
    aggregate/join; do not rely on row order afterwards."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        # Planning-only failure (e.g. streaming frame) — leave untouched.
        return df
    if current < target:
        return df.repartition(target)
    return df
