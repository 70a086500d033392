"""Join-layout helpers: bucketed joins must be shuffle-free, salted joins
must equal their plain counterparts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_glm_spark.operators import joins as J
from dask_glm_spark.plans import audit
from dask_glm_spark.sources.glm_source import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    J.write_bucketed(orders, "t_orders_b", ["o_orderkey"], num_buckets=8,
                     sort_cols=["o_orderkey"])
    J.write_bucketed(li, "t_lineitem_b", ["l_orderkey"], num_buckets=8,
                     sort_cols=["l_orderkey"])
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    """Two co-bucketed tables join with ZERO exchanges — the write-time
    shuffle is amortized over every later join on the key. (Broadcast is
    disabled so the test exercises the bucketed sort-merge path — at real
    scale neither side fits a broadcast.)"""
    to, tl = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(to)
        l = spark.table(tl)
        joined = o.join(l, o["o_orderkey"] == l["l_orderkey"])
        assert audit.count_exchanges(joined) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # and it still returns the right rows
    plain = (
        load_table(spark, SF, "orders")
        .select("o_orderkey")
        .join(
            load_table(spark, SF, "lineitem").select("l_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    assert joined.count() == plain.count()


def test_bucketed_agg_is_shuffle_free(spark, bucketed_tables):
    """groupBy on the bucket key needs no exchange either."""
    _, tl = bucketed_tables
    agg = spark.table(tl).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert audit.count_exchanges(agg) == 0


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    small = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(small, ["l_orderkey"]).groupBy().agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 3).alias("s")
    ).first()
    salted = J.salted_join(li, small, ["l_orderkey"], salt_buckets=8).groupBy().agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 3).alias("s")
    ).first()
    assert plain["n"] == salted["n"]
    assert plain["s"] == salted["s"]


def test_salted_left_join_keeps_unmatched(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (99, "z")], "k long, v string")
    b = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, w double")
    out = {r["k"]: r["w"] for r in J.salted_join(a, b, ["k"], salt_buckets=4, how="left").collect()}
    assert out == {1: 10.0, 2: 20.0, 99: None}


def test_salted_join_rejects_right(spark):
    a = spark.createDataFrame([(1, "x")], "k long, v string")
    with pytest.raises(ValueError):
        J.salted_join(a, a, ["k"], how="right")
