"""Sketch-based corpus statistics: accuracy bounds at real cardinalities
(the q53 gate only sees the synthetic corpus's tiny vocab; here the HLL
and theta estimates face 200k distinct values)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_theta_within_tolerance_at_scale(spark):
    from dask_glm_spark.functions.sketches import HLL_LGK

    n = 200_000
    df = spark.range(n).select(
        F.concat(F.lit("tok_"), F.col("id").cast("string")).alias("tok")
    )
    row = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("tok", F.lit(HLL_LGK))).alias("hll"),
        F.theta_sketch_estimate(F.theta_sketch_agg("tok")).alias("theta"),
    ).first()
    assert abs(row["hll"] / n - 1) < 0.05
    assert abs(row["theta"] / n - 1) < 0.05


def test_vocab_sketch_stats_contract(spark):
    from dask_glm_spark.functions.sketches import vocab_sketch_stats
    from dask_glm_spark.sources.glm_source import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    r = vocab_sketch_stats(docs).first()
    assert r["hll_ok"] and r["theta_ok"] and r["n_exact"] > 0


def test_vocab_cardinality_by_matches_exact_small(spark):
    """Per-group HLL estimates == exact counts at tiny cardinalities
    (HLL is exact in sparse mode far below 2^lgk)."""
    from dask_glm_spark.functions.sketches import vocab_cardinality_by
    from dask_glm_spark.operators.text import tokens_expr
    from dask_glm_spark.sources.glm_source import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    est = {
        r["source"]: r["est_distinct_tokens"]
        for r in vocab_cardinality_by(docs).collect()
    }
    exact = {
        r["source"]: r["n"]
        for r in docs.select("source", F.explode(tokens_expr("text")).alias("tok"))
        .where(F.length("tok") > 0)
        .groupBy("source")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    assert est == exact


def test_vocab_sketch_stats_empty_corpus_zero_guard(spark):
    """ADVICE r5: exact=0 must not hit a DIVIDE_BY_ZERO under ANSI mode;
    the empty-corpus contract is hll_ok/theta_ok TRUE iff the estimates
    are also 0."""
    from dask_glm_spark.functions.sketches import vocab_sketch_stats

    docs = spark.createDataFrame(
        [(1, ""), (2, "   ")], "doc_id long, text string"
    )
    r = vocab_sketch_stats(docs).first()
    assert r["n_exact"] == 0
    assert r["hll_ok"] and r["theta_ok"]
