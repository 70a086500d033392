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


def test_cms_overestimates_never_under(spark):
    """CMS contract: est(t) >= tf(t) for EVERY token (collisions add,
    never subtract), with a small width so collisions are real."""
    from dask_glm_spark.functions.sketches import cms_counters, cms_estimate
    from dask_glm_spark.operators.text import tokens_expr
    from dask_glm_spark.sources.glm_source import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    exact = (
        docs.select(F.explode(tokens_expr("text")).alias("token"))
        .where(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    ctr = cms_counters(docs, depth=4, width=64)
    est = cms_estimate(exact, ctr, depth=4, width=64)
    bad = est.where(F.col("cms_est") < F.col("tf")).count()
    assert bad == 0
    # width 64 over a real vocab MUST collide somewhere — the test is
    # vacuous otherwise
    assert est.where(F.col("cms_est") > F.col("tf")).count() > 0


def test_cms_exact_when_no_collisions(spark):
    """A wide sketch over a tiny vocab has no collisions: est == tf."""
    from dask_glm_spark.functions.sketches import cms_counters, cms_estimate

    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "b c d"), (3, "a")],
        "doc_id long, text string",
    )
    exact = {"a": 3, "b": 2, "c": 2, "d": 1}
    toks = spark.createDataFrame(
        [(t,) for t in exact], "token string"
    )
    ctr = cms_counters(docs, depth=4, width=1 << 14)
    got = {
        r["token"]: r["cms_est"]
        for r in cms_estimate(toks, ctr, depth=4, width=1 << 14).collect()
    }
    assert got == exact


def test_cms_counters_merge_by_addition(spark):
    """Mergeability: counters(A union B) == cellwise counters(A) +
    counters(B) — the property that lets day-over-day sketches combine
    without rescanning raw data."""
    from dask_glm_spark.functions.sketches import cms_counters
    from dask_glm_spark.sources.glm_source import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)

    def grid(df):
        return {
            (r["i"], r["bucket"]): r["cnt"]
            for r in cms_counters(df, depth=2, width=32).collect()
        }

    ga, gb, gu = grid(a), grid(b), grid(a.unionByName(b))
    summed: dict = {}
    for g in (ga, gb):
        for k, v in g.items():
            summed[k] = summed.get(k, 0) + v
    assert gu == summed


def test_cms_unseen_token_estimates_from_grid(spark):
    """A token absent from the corpus still gets an estimate (its
    buckets' collision mass, possibly 0) — never null, never negative."""
    from dask_glm_spark.functions.sketches import cms_counters, cms_estimate

    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    toks = spark.createDataFrame([("never-seen",)], "token string")
    ctr = cms_counters(docs, depth=4, width=1 << 14)
    r = cms_estimate(toks, ctr, depth=4, width=1 << 14).first()
    assert r["cms_est"] is not None and r["cms_est"] >= 0
