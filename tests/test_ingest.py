"""Ingest/sink tests: CSV and JSON round-trips into the universal
(features, label) relation, filter pushdown, and the parquet sink."""

from __future__ import annotations

import numpy as np
import pytest

# r14 (VERDICT r13 #2): multi-minute file on a latency-floor box — skipped
# by the default serial run, always run by scripts/partest.py (see conftest)
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from dask_glm_spark.sources import ingest


@pytest.fixture(scope="module")
def raw_rows():
    rng = np.random.RandomState(3)
    return [
        (float(i), float(rng.uniform()), float(rng.uniform()), int(i % 2))
        for i in range(100)
    ]


def test_read_csv(spark, tmp_path_factory, raw_rows):
    d = str(tmp_path_factory.mktemp("csv_src"))
    spark.createDataFrame(raw_rows, "a double, b double, c double, flag int").write.mode(
        "overwrite"
    ).csv(d, header=True)
    out = ingest.read_csv(
        spark, d, ["a", "b", "c"], label=(F.col("flag") > 0).cast("double")
    )
    assert out.columns == ["features", "label"]
    assert out.count() == 100
    r = out.first()
    assert len(r["features"]) == 3
    assert r["label"] in (0.0, 1.0)


def test_read_csv_with_filter(spark, tmp_path_factory, raw_rows):
    d = str(tmp_path_factory.mktemp("csv_flt"))
    spark.createDataFrame(raw_rows, "a double, b double, c double, flag int").write.mode(
        "overwrite"
    ).csv(d, header=True)
    out = ingest.read_csv(
        spark, d, ["b", "c"], label="flag", where=F.col("a") < 50
    )
    assert out.count() == 50


def test_read_json(spark, tmp_path_factory, raw_rows):
    d = str(tmp_path_factory.mktemp("json_src"))
    spark.createDataFrame(raw_rows, "a double, b double, c double, flag int").write.mode(
        "overwrite"
    ).json(d)
    out = ingest.read_json(spark, d, ["a", "b"], label="flag")
    assert out.count() == 100
    assert dict(out.dtypes) == {"features": "array<double>", "label": "double"}


def test_parquet_sink_partitioned(spark, tmp_path_factory, raw_rows):
    d = str(tmp_path_factory.mktemp("pq_sink"))
    df = spark.createDataFrame(raw_rows, "a double, b double, c double, flag int")
    ingest.write_parquet(df, d, partition_by=["flag"])
    back = spark.read.parquet(d)
    assert back.count() == 100
    assert back.where(F.col("flag") == 1).count() == 50


def test_ingest_feeds_fit(spark, tmp_path_factory, raw_rows):
    from dask_glm_spark.operators.estimators import LogisticRegression

    d = str(tmp_path_factory.mktemp("csv_fit"))
    spark.createDataFrame(raw_rows, "a double, b double, c double, flag int").write.mode(
        "overwrite"
    ).csv(d, header=True)
    df = ingest.read_csv(spark, d, ["b", "c"], label="flag")
    lr = LogisticRegression(solver="newton", max_iter=10).fit(df)
    assert len(lr.coef_) == 2 and np.isfinite(lr.intercept_)


def test_orc_roundtrip_and_fit(spark, tmp_path_factory):
    """ORC sink -> reader -> solver end-to-end (format parity with the
    parquet path)."""
    import numpy as np
    from pyspark.sql import functions as F

    from dask_glm_spark.operators.estimators import LogisticRegression
    from dask_glm_spark.sources.ingest import read_orc, write_orc

    d = str(tmp_path_factory.mktemp("orc_ingest")) + "/t.orc"
    rng = np.random.RandomState(3)
    rows = [
        (float(a), float(b), float(int(a + b > 0)))
        for a, b in rng.standard_normal((400, 2))
    ]
    src = spark.createDataFrame(rows, "a double, b double, flag double")
    write_orc(src, d)
    df = read_orc(spark, d, ["a", "b"], "flag", where=F.col("a") > -10)
    assert df.count() == 400
    lr = LogisticRegression(solver="lbfgs", regularizer=None, max_iter=20).fit(df)
    assert lr.score(df) > 0.8


def test_load_glm_top_matches_global_sort(spark):
    """load_glm_top(n) == load_glm().orderBy(id).limit(n) value-for-value
    — the TakeOrdered head replaces the single-partition row_number sort
    for the row-addressed gate queries."""
    from dask_glm_spark.sources.glm_source import load_glm, load_glm_top

    sf = "/root/testdata/sf0.001"
    want = [
        tuple(r)
        for r in load_glm(spark, sf).orderBy("id").limit(25).drop("features").collect()
    ]
    got = [
        tuple(r)
        for r in load_glm_top(spark, sf, 25).orderBy("id").drop("features").collect()
    ]
    assert got == want and len(got) == 25
