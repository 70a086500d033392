"""Exact per-group top-k without a Window: the two-level partial-aggregate
shape shared by weighted sampling and the large-scale ANN join.

A ``row_number() OVER (PARTITION BY g ORDER BY ...) <= k`` funnels every
row of a hot group through ONE window task — the anti-pattern this module
replaces. Here each input partition first reduces every group it holds to
its local top-k (one map-side ``array_sort ∘ collect_list`` bounded by
partition size), then a final aggregate reduces the ≤ k·partitions
survivors per group. Per-task memory is bounded by partition size at
level 1 and by k·partitions at level 2, independent of how hot a group
is.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    by: str | Sequence[str],
    order_cols: Sequence[str],
    k: int,
    carry_cols: Sequence[str] = (),
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the k smallest rows per group under the ASCENDING lexicographic
    order of ``order_cols`` (negate a column upstream for descending).

    Returns ``by + order_cols + carry_cols`` (+ ``rank_col``, 1-based, if
    requested — free: the slice is already sorted, so the explode position
    IS the rank). ``carry_cols`` ride the comparison struct AFTER the
    order columns; they only influence ordering on full order-column ties,
    so make ``order_cols`` end in a unique tiebreaker (every caller here
    uses an id)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    gcols = [by] if isinstance(by, str) else list(by)
    fields = list(order_cols) + list(carry_cols)
    pair = F.struct(*[F.col(c).alias(c) for c in fields])
    lvl1 = df.groupBy(*gcols, F.spark_partition_id().alias("_tkpid")).agg(
        F.slice(F.array_sort(F.collect_list(pair)), 1, k).alias("_top")
    )
    final = lvl1.select(*gcols, F.explode("_top").alias("_t")).groupBy(
        *gcols
    ).agg(F.slice(F.array_sort(F.collect_list("_t")), 1, k).alias("_top"))
    if rank_col is None:
        ex = final.select(*gcols, F.explode("_top").alias("_t"))
        return ex.select(*gcols, *[F.col(f"_t.{c}").alias(c) for c in fields])
    ex = final.select(
        *gcols, F.posexplode("_top").alias("_pos", "_t")
    )
    return ex.select(
        *gcols,
        *[F.col(f"_t.{c}").alias(c) for c in fields],
        (F.col("_pos") + 1).cast("int").alias(rank_col),
    )
