"""Join-layout helpers: bucketed co-located joins and skew salting.

The 100 TB join playbook, as first-class helpers:

- **Broadcast** small dims — free via ``F.broadcast`` (used throughout the
  engine, e.g. similarity.brute_force_topk).
- **Bucketing** for repeatedly-joined big tables: ``write_bucketed`` sinks
  a table hash-bucketed (and optionally sorted) by the join key, so a join
  of two co-bucketed tables needs NO shuffle of either side — the scan is
  already partitioned by the key. The win compounds: pay one shuffle at
  write time, skip it on every subsequent join/aggregate on that key.
- **Salting** for skewed keys where AQE's skew-join split isn't available
  (e.g. the skewed side feeds an aggregation, or static planning):
  ``salted_join`` fans each hot key into ``salt_buckets`` sub-keys by
  salting the big side deterministically per-row and replicating the small
  side once per salt value. Correctness is layout-independent; tests
  assert the salted result equals the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Sink ``df`` as a parquet table hash-bucketed by ``bucket_cols``.

    Joins and aggregations between tables bucketed the same way (same
    columns, same ``num_buckets``) run shuffle-free: Spark recognizes the
    scan's bucketing as a satisfying output partitioning. ``sort_cols``
    additionally sorts within buckets (enables sort-merge join without a
    per-task sort). Bucket count is a layout contract — pick once per
    subject area and reuse it everywhere that key is joined.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed join keys.

    The big side gets a deterministic per-row salt (hash of all its
    columns mod ``salt_buckets`` — stable under task retries, unlike
    ``rand()``); the small side is replicated once per salt value
    (``salt_buckets``x rows — keep it the genuinely smaller side). The
    join key becomes (key, salt), so one hot key spreads across
    ``salt_buckets`` reducers instead of one straggler task.

    Result is identical to ``big.join(small, on, how)`` for inner and
    left joins (each big row matches exactly its salt replica).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    b = big.withColumn("_salt", salt.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = b.join(s, on + ["_salt"], how)
    return out.drop("_salt")
