"""Sequence packing: chunked (window) and greedy (fold) disciplines."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dask_glm_spark.operators.packing import (
    chunked_pack,
    greedy_pack,
    pack_bucket_expr,
)


def _greedy_reference(tokens: list[int], budget: int) -> list[int]:
    out, seq, fill = [], 0, 0
    for i, t in enumerate(tokens):
        if i > 0 and fill + t > budget:
            seq, fill = seq + 1, t
        else:
            fill += t
        out.append(seq)
    return out


@pytest.fixture()
def docs(spark):
    rng = random.Random(7)
    rows = [(i, 0, rng.randint(10, 120)) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, bucket long, n_tokens long")


def test_chunked_pack_formula(spark):
    rows = [(1, 0, 100), (2, 0, 100), (3, 0, 100), (4, 0, 10)]
    df = spark.createDataFrame(rows, "doc_id long, bucket long, n_tokens long")
    got = {
        r["doc_id"]: r["chunk_id"]
        for r in chunked_pack(df, "n_tokens", budget=256).collect()
    }
    # offsets 0, 100, 200, 300 -> chunks 0, 0, 0, 1
    assert got == {1: 0, 2: 0, 3: 0, 4: 1}


def test_greedy_pack_matches_reference(docs):
    got = {
        r["doc_id"]: r["seq_id"]
        for r in greedy_pack(docs, "n_tokens", budget=256).collect()
    }
    toks = [r["n_tokens"] for r in docs.orderBy("doc_id").collect()]
    expect = dict(enumerate(_greedy_reference(toks, 256)))
    assert got == expect


def test_greedy_pack_never_overflows_budget(docs):
    packed = greedy_pack(docs, "n_tokens", budget=256)
    fills = packed.groupBy("seq_id").agg(F.sum("n_tokens").alias("fill"))
    assert fills.where(F.col("fill") > 256).count() == 0


def test_greedy_oversized_doc_gets_own_sequence(spark):
    rows = [(1, 0, 50), (2, 0, 999), (3, 0, 50), (4, 0, 50)]
    df = spark.createDataFrame(rows, "doc_id long, bucket long, n_tokens long")
    got = {
        r["doc_id"]: r["seq_id"]
        for r in greedy_pack(df, "n_tokens", budget=100).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 2}


def test_greedy_deterministic_across_partitionings(docs):
    a = sorted(
        (r["doc_id"], r["seq_id"])
        for r in greedy_pack(docs, "n_tokens", budget=256).collect()
    )
    b = sorted(
        (r["doc_id"], r["seq_id"])
        for r in greedy_pack(
            docs.repartition(17), "n_tokens", budget=256
        ).collect()
    )
    assert a == b


def test_buckets_pack_independently(spark):
    rows = [(i, i % 3, 100) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, bucket long, n_tokens long")
    packed = greedy_pack(df, "n_tokens", budget=200)
    # each bucket has 10 docs of 100 tokens -> 5 sequences of 2 docs
    per_bucket = (
        packed.groupBy("bucket")
        .agg(F.countDistinct("seq_id").alias("n_seq"))
        .collect()
    )
    assert {r["n_seq"] for r in per_bucket} == {5}


def test_pack_bucket_range(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    row = df.select(
        F.min(pack_bucket_expr("doc_id", 8)).alias("lo"),
        F.max(pack_bucket_expr("doc_id", 8)).alias("hi"),
        F.countDistinct(pack_bucket_expr("doc_id", 8)).alias("n"),
    ).collect()[0]
    assert row["lo"] >= 0 and row["hi"] <= 7 and row["n"] == 8


def test_pack_bucket_uses_full_range(spark):
    """Review r5: pack buckets must cover [0, n_buckets) even above 100
    (the old sample%n composition capped them at 100)."""
    from pyspark.sql import functions as F

    from dask_glm_spark.operators.packing import pack_bucket_expr

    df = spark.range(20000).select(F.col("id").alias("doc_id"))
    got = {
        r[0]
        for r in df.select(pack_bucket_expr("doc_id", 512).alias("b"))
        .distinct()
        .collect()
    }
    assert max(got) >= 100 and len(got) > 450  # well beyond the old cap


def test_greedy_pack_null_tokens_clear_error(spark):
    import pytest as _pytest

    from dask_glm_spark.operators.packing import greedy_pack

    df = spark.createDataFrame(
        [(1, 10, 0), (2, None, 0)], "doc_id long, n_tokens long, bucket int"
    )
    with _pytest.raises(Exception, match="NULL in 'n_tokens'"):
        greedy_pack(df, "n_tokens").collect()
