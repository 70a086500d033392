"""Deterministic sampling: reproducibility, rate accuracy, disjointness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_glm_spark.operators.sampling import (
    hash_sample,
    sample_bucket_expr,
    stratified_sample,
    train_test_split,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).select(F.col("id").alias("doc_id"))


def test_sample_is_deterministic_across_partitionings(ids):
    a = sorted(r["doc_id"] for r in hash_sample(ids, "doc_id", 30).collect())
    b = sorted(
        r["doc_id"]
        for r in hash_sample(ids.repartition(13), "doc_id", 30).collect()
    )
    assert a == b and len(a) > 0


def test_sample_rate_within_tolerance(ids):
    n = hash_sample(ids, "doc_id", 30).count()
    assert abs(n / 5000 - 0.30) < 0.03


def test_distinct_salts_are_independent(ids):
    a = {r["doc_id"] for r in hash_sample(ids, "doc_id", 50, salt="a").collect()}
    b = {r["doc_id"] for r in hash_sample(ids, "doc_id", 50, salt="b").collect()}
    overlap = len(a & b) / 5000
    # independent 50% samples overlap ~25%
    assert 0.15 < overlap < 0.35
    assert a != b


def test_rate_bounds_validated(ids):
    with pytest.raises(ValueError):
        hash_sample(ids, "doc_id", 101)
    with pytest.raises(ValueError):
        stratified_sample(ids, "doc_id", {"x": -1})
    with pytest.raises(ValueError):
        train_test_split(ids, "doc_id", 0)


def test_stratified_rates_and_default(spark):
    rows = [(i, "en" if i % 2 == 0 else ("de" if i % 4 == 1 else "xx")) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = stratified_sample(
        df, "lang", {"en": 80, "de": 20}, default_pct=0
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert abs(by_lang["en"] / 2000 - 0.80) < 0.05
    assert abs(by_lang["de"] / 1000 - 0.20) < 0.05
    assert "xx" not in by_lang  # default 0: unknown strata dropped


def test_train_test_split_disjoint_exhaustive(ids):
    train, test = train_test_split(ids, "doc_id", test_pct=20)
    tr = {r["doc_id"] for r in train.collect()}
    te = {r["doc_id"] for r in test.collect()}
    assert tr.isdisjoint(te)
    assert len(tr) + len(te) == 5000
    assert abs(len(te) / 5000 - 0.20) < 0.03


def test_split_boundary_is_narrow_plan(ids):
    # membership must be a filter on the scan: no Exchange in the plan
    train, _ = train_test_split(ids, "doc_id", test_pct=20)
    plan = train._sc._jvm.PythonSQLUtils.explainString(
        train._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan


def test_bucket_expr_range(ids):
    row = ids.select(
        F.min(sample_bucket_expr("doc_id")).alias("lo"),
        F.max(sample_bucket_expr("doc_id")).alias("hi"),
    ).collect()[0]
    assert 0 <= row["lo"] and row["hi"] <= 99


def test_null_keys_are_not_silently_dropped(spark):
    """Review r5: a NULL key hashes via a sentinel instead of
    null-propagating — the split stays exhaustive and rate=100 keeps all."""
    from dask_glm_spark.operators.sampling import hash_sample, train_test_split

    df = spark.createDataFrame([(1,), (2,), (None,)], "doc_id long")
    train, test = train_test_split(df, "doc_id", test_pct=10)
    assert train.count() + test.count() == 3
    assert hash_sample(df, "doc_id", 100).count() == 3


def test_stratified_default_pct_validated(spark):
    import pytest as _pytest

    from dask_glm_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with _pytest.raises(ValueError, match="default_pct"):
        stratified_sample(df, "lang", {"en": 60}, default_pct=150)
