"""Tests for streaming/scoring.py: batch/stream agreement of the hourly
rollup, and streaming model scoring via the availableNow trigger."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_glm_spark.streaming import scoring as SC

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return SC.load_events(spark, SF_DIR)


def test_hourly_stats_deterministic(spark, events):
    a = SC.hourly_event_stats(events).collect()
    b = SC.hourly_event_stats(events).collect()
    assert a == b
    assert len(a) > 0
    total = sum(r["n"] for r in a)
    assert total == events.count()


def test_windowed_matches_arithmetic_in_batch(spark, events):
    arith = {
        (r["hour_bucket"], r["event_type"]): (r["n"], r["sum_value"])
        for r in SC.hourly_event_stats(events).collect()
    }
    windowed = {
        (r["hour_bucket"], r["event_type"]): (r["n"], r["sum_value"])
        for r in SC.windowed_event_stats(events).collect()
    }
    assert arith == windowed


def test_stream_windowed_agg_available_now(spark, events):
    """readStream -> watermark+window agg -> memory sink (complete mode)
    equals the batch rollup."""
    stream = SC.stream_events(spark, SF_DIR)
    assert stream.isStreaming
    agg = SC.windowed_event_stats(stream, watermark="1 hour")
    SC.run_stream_to_memory(agg, "hourly_stream_test", mode="complete")
    got = {
        (r["hour_bucket"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.table("hourly_stream_test").collect()
    }
    expect = {
        (r["hour_bucket"], r["event_type"]): (r["n"], r["sum_value"])
        for r in SC.hourly_event_stats(events).collect()
    }
    assert got == expect


def test_scored_event_stream(spark, events):
    """Stateless scoring attaches a finite probability to every event, and
    the streaming result matches the batch expression row-for-row."""
    beta = [0.05]
    stream = SC.stream_events(spark, SF_DIR)
    scored = SC.scored_event_stream(stream, beta, ["value"])
    SC.run_stream_to_memory(scored, "scored_stream_test", mode="append")
    got = (
        spark.table("scored_stream_test")
        .select("event_id", "probability")
        .orderBy("event_id")
        .collect()
    )
    batch = (
        SC.scored_event_stream(events, beta, ["value"])
        .select("event_id", "probability")
        .orderBy("event_id")
        .collect()
    )
    assert len(got) == events.count()
    assert all(0.0 <= r["probability"] <= 1.0 for r in got)
    np.testing.assert_allclose(
        [r["probability"] for r in got], [r["probability"] for r in batch]
    )
