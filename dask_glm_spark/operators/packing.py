"""Sequence packing: assign documents to fixed-token-budget training
sequences.

Beyond-reference surface (training-data pipeline). Two standard packing
disciplines, both deterministic given (bucket, doc order):

- ``chunked_pack`` — concat-then-chunk: documents are laid end-to-end in
  id order within a bucket and a document belongs to the chunk where it
  STARTS (documents may straddle chunk boundaries at tokenization time).
  Pure window arithmetic (`cumsum - tokens`), one shuffle on the bucket
  key, whole-stage codegen'd — the scale path.
- ``greedy_pack`` — no-split first-fit: a document that would overflow
  the current sequence opens a new one (oversized documents get their own
  sequence). This is an order-dependent sequential fold — not expressible
  as a window function — so it runs as an ``applyInPandas`` fold per
  bucket: one shuffle, then O(rows) vectorized-ish work per group.

Scale contract: parallelism equals the number of buckets and each bucket's
rows must fit one executor's memory (applyInPandas materializes the
group), so the caller sizes ``n_buckets`` to ~rows/budgeted-group-size.
The bucket assignment is the shared double-polyhash (operators/sampling),
so bucket membership — hence the entire packing — is reproducible across
runs, partitionings, and engines; the DuckDB oracle replays the greedy
fold exactly via a recursive CTE (``__spark_entry__._greedy_pack_oracle``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_glm_spark.operators.sampling import hash_bucket_expr


def pack_bucket_expr(key: Column | str, n_buckets: int, salt: str = "pack") -> Column:
    """Deterministic pack bucket in [0, n_buckets) — a direct modular
    reduction of the full-range hash. (Review r5: the previous
    ``sample_bucket % n_buckets`` composed two mods, capping buckets at
    100 — parallelism-limiting at the contract's ~rows/group sizing — and
    biasing whenever 100 % n_buckets != 0.)"""
    return hash_bucket_expr(key, n_buckets, salt)


def chunked_pack(
    df: DataFrame,
    tokens_col: str,
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    budget: int = 256,
) -> DataFrame:
    """Adds ``chunk_id``: the budget-sized chunk where this document starts
    when documents are concatenated in ``id_col`` order within a bucket.
    ``floor((cumsum(tokens) - tokens) / budget)`` — one window over the
    bucket partition, no sequential state."""
    w = (
        Window.partitionBy(bucket_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return df.withColumn(
        "chunk_id", F.floor(offset / F.lit(budget)).cast("long")
    )


def greedy_pack(
    df: DataFrame,
    tokens_col: str,
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    budget: int = 256,
) -> DataFrame:
    """Adds ``seq_id``: first-fit contiguous packing without splitting —
    a document that would push the running sequence past ``budget`` starts
    the next sequence; a document alone larger than ``budget`` occupies
    its own sequence. Sequential fold per bucket via applyInPandas."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("seq_id", T.LongType())]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        if pdf[tokens_col].isna().any():
            bad = pdf.loc[pdf[tokens_col].isna(), id_col].iloc[0]
            raise ValueError(
                f"greedy_pack: NULL in {tokens_col!r} (first at "
                f"{id_col}={bad!r}) — token counts must be non-null"
            )
        toks = pdf[tokens_col].to_numpy()
        seq_ids = [0] * len(toks)
        seq, fill = 0, 0
        for i, t in enumerate(toks):
            t = int(t)
            if i > 0 and fill + t > budget:
                seq, fill = seq + 1, t
            else:
                fill += t
            seq_ids[i] = seq
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        return pdf

    return df.groupBy(bucket_col).applyInPandas(fold, out_schema)
