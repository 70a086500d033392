"""Tests for streaming/scoring.py: batch/stream agreement of the hourly
rollup, and streaming model scoring via the availableNow trigger."""

from __future__ import annotations

import numpy as np
import pytest

# r14 (VERDICT r13 #2): multi-minute file on a latency-floor box — skipped
# by the default serial run, always run by scripts/partest.py (see conftest)
pytestmark = pytest.mark.slow
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


def test_sessionize_batch_shapes(spark, events):
    from dask_glm_spark.streaming import sessions as SES

    out = SES.sessionize_batch(events, gap_minutes=30)
    rows = out.collect()
    assert len(rows) > 0
    assert events.count() == sum(r["n_events"] for r in rows)
    # sessions of one user never overlap
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for sess in by_user.values():
        sess.sort(key=lambda r: r["session_start"])
        for a, b in zip(sess, sess[1:]):
            assert a["session_end"] < b["session_start"]


def test_sessionize_stream_matches_batch(spark, events, tmp_path_factory):
    """applyInPandasWithState sessionization across multiple microbatches
    equals the batch lag/cumsum form, minus each user's still-open session."""
    from dask_glm_spark.streaming import sessions as SES

    d = str(tmp_path_factory.mktemp("ev_stream"))
    # split by time into 3 files -> 3 microbatches in ts order
    ev = events.orderBy("ts").withColumn(
        "part", F.ntile(3).over(__import__("pyspark").sql.Window.orderBy("ts"))
    )
    for i in (1, 2, 3):
        ev.where(F.col("part") == i).drop("part").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/batch={i}")

    schema = spark.read.parquet(f"{d}/batch=1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/batch=*")
    )
    out = SES.sessionize_stream(stream, gap_minutes=30)
    SC.run_stream_to_memory(out, "sessions_stream_test", mode="append")
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in spark.table("sessions_stream_test").collect()
    }

    batch = SES.sessionize_batch(events, gap_minutes=30).collect()
    # drop each user's last (still-open) session
    last_per_user = {}
    for r in batch:
        cur = last_per_user.get(r["user_id"])
        if cur is None or r["session_start"] > cur["session_start"]:
            last_per_user[r["user_id"]] = r
    expect = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in batch
        if last_per_user[r["user_id"]] is not r
    }
    assert got == expect


def test_dedup_stream_first_arrival_wins(spark, tmp_path_factory):
    """Streaming dedup keeps exactly one row per key within the watermark
    delay; rows with distinct keys all survive."""
    import datetime as dt

    from dask_glm_spark.streaming.dedup import dedup_stream

    d = str(tmp_path_factory.mktemp("dedup_stream"))
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, "a"),
        (1, t0 + dt.timedelta(minutes=1), "a-dup"),       # dup of key 1 within delay
        (2, t0 + dt.timedelta(minutes=2), "b"),
        (2, t0 + dt.timedelta(minutes=3), "b-dup"),       # dup of key 2 within delay
        (3, t0 + dt.timedelta(minutes=4), "c"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, payload string")
    df.coalesce(1).write.mode("overwrite").parquet(d)

    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    out = dedup_stream(stream, ["k"], ts_col="ts", delay="30 minutes")
    SC.run_stream_to_memory(out, "dedup_stream_test", mode="append")
    got = spark.table("dedup_stream_test").collect()
    assert sorted(r["k"] for r in got) == [1, 2, 3]


def test_dedup_stream_matches_batch_exact_dedup_keys(spark, events, tmp_path_factory):
    """On the real events table (event_type as the key): the streaming
    dedup's key set equals the batch distinct key set."""
    from dask_glm_spark.streaming.dedup import dedup_stream

    stream = SC.stream_events(spark, SF_DIR)
    out = dedup_stream(stream, ["event_type"], ts_col="ts", delay="10 hours")
    SC.run_stream_to_memory(out, "dedup_stream_events_test", mode="append")
    got = {r["event_type"] for r in spark.table("dedup_stream_events_test").collect()}
    expect = {r["event_type"] for r in events.select("event_type").distinct().collect()}
    assert got == expect


def test_quality_exprs_streamable(spark, tmp_path_factory):
    """The text quality/scrub layer is stateless Columns, so it composes
    with readStream unchanged: stream output == batch output row-for-row."""
    import pyspark.sql.functions as F

    from dask_glm_spark.operators.quality import scrub_expr
    from dask_glm_spark.operators.text import quality_score_expr

    d = str(tmp_path_factory.mktemp("qdocs"))
    rows = [
        (1, "mail me a@b.io now"),
        (2, "see https://x.io/y ok"),
        (3, "the and of to is clean text here"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    batch.write.mode("overwrite").parquet(d)
    sel = lambda df: df.select(  # noqa: E731
        "doc_id",
        scrub_expr("text").alias("scrubbed"),
        F.round(quality_score_expr("text"), 6).alias("q"),
    )
    want = {tuple(r) for r in sel(batch).collect()}
    stream = spark.readStream.schema(batch.schema).parquet(d)
    SC.run_stream_to_memory(sel(stream), "quality_stream_test", mode="append")
    got = {tuple(r) for r in spark.table("quality_stream_test").collect()}
    assert got == want


def test_bpe_encode_streamable(spark, tmp_path_factory):
    """bpe_encode is a stateless mapInPandas transform (the merge table
    rides the closure), so it composes with readStream unchanged —
    tokenize-on-ingest for a continuously arriving corpus: stream output
    == batch output row-for-row."""
    from dask_glm_spark.operators.bpe import FIXED_MERGES_EN, bpe_encode

    d = str(tmp_path_factory.mktemp("bdocs"))
    rows = [
        (1, "the theme standing"),
        (2, "interesting anthem chest"),
        (3, ""),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    batch.write.mode("overwrite").parquet(d)
    sel = lambda df: bpe_encode(df, FIXED_MERGES_EN).select(  # noqa: E731
        "doc_id", "bpe_tokens"
    )
    want = {(r["doc_id"], tuple(r["bpe_tokens"])) for r in sel(batch).collect()}
    stream = spark.readStream.schema(batch.schema).parquet(d)
    SC.run_stream_to_memory(sel(stream), "bpe_stream_test", mode="append")
    got = {
        (r["doc_id"], tuple(r["bpe_tokens"]))
        for r in spark.table("bpe_stream_test").collect()
    }
    assert got == want


def test_sessionize_stream_late_event_within_gap(spark, tmp_path_factory):
    """Review r5: a cross-microbatch late event INSIDE the gap must merge
    without moving the session end backwards (previously `last = ts`
    regressed session_end and falsely closed the session at the next
    on-time event)."""
    import datetime as dt

    from dask_glm_spark.streaming import sessions as SES

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(minutes):
        return base + dt.timedelta(minutes=minutes)

    d = str(tmp_path_factory.mktemp("late_stream"))
    batches = [
        [(7, mk(0), 1.0), (7, mk(10), 1.0)],   # on-time
        [(7, mk(-5), 1.0)],                    # late, within gap of 12:10
        [(7, mk(30), 1.0)],                    # on-time: 20min after 12:10
        [(7, mk(90), 1.0)],                    # closes the first session
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/b={i}")
    schema = spark.read.parquet(f"{d}/b=0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/b=*")
    )
    out = SES.sessionize_stream(stream, gap_minutes=30)
    SC.run_stream_to_memory(out, "late_sessions_test", mode="append")
    rows = spark.table("late_sessions_test").collect()
    # ONE closed session: 11:55 .. 12:30, 4 events (the late 11:55 merged;
    # 13:30 remains open). Pre-fix this emitted a bogus session ending 11:55.
    assert len(rows) == 1
    r = rows[0]
    assert r["n_events"] == 4
    assert r["session_start"] == mk(-5)
    assert r["session_end"] == mk(30)
    assert r["sum_value"] == 4.0


def test_score_events_expr_intercept_and_validation(spark, events):
    """Review r5: trailing intercept is applied (not silently zip-dropped)
    and other length mismatches raise."""
    import math

    import pytest as _pytest

    r = events.limit(1).select(
        F.col("value"),
        SC.score_events_expr([0.5], ["value"]).alias("p0"),
        SC.score_events_expr([0.5, 2.0], ["value"]).alias("p1"),
    ).first()
    sig = lambda z: 1.0 / (1.0 + math.exp(-z))
    assert abs(r["p0"] - sig(0.5 * r["value"])) < 1e-12
    assert abs(r["p1"] - sig(0.5 * r["value"] + 2.0)) < 1e-12
    with _pytest.raises(ValueError, match="coefficients"):
        SC.score_events_expr([1.0, 2.0, 3.0], ["value"])


def test_sessionize_stream_far_early_event_forms_own_session(
    spark, tmp_path_factory
):
    """ADVICE r5: an event arriving more than `gap` BEFORE the open
    session's span is NOT min/max-merged (which stretched session_start
    arbitrarily far back) — batch semantics put a boundary there, so it
    forms its own earlier session and is emitted immediately."""
    import datetime as dt

    from dask_glm_spark.streaming import sessions as SES

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(minutes):
        return base + dt.timedelta(minutes=minutes)

    d = str(tmp_path_factory.mktemp("far_early_stream"))
    batches = [
        [(9, mk(0), 1.0), (9, mk(10), 1.0)],   # open session 12:00..12:10
        [(9, mk(-120), 1.0)],                  # 2h before: beyond the gap
        [(9, mk(90), 1.0)],                    # closes the 12:00 session
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/b={i}")
    schema = spark.read.parquet(f"{d}/b=0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/b=*")
    )
    out = SES.sessionize_stream(stream, gap_minutes=30)
    SC.run_stream_to_memory(out, "far_early_sessions_test", mode="append")
    rows = sorted(
        spark.table("far_early_sessions_test").collect(),
        key=lambda r: r["session_start"],
    )
    # Two closed sessions: the far-early singleton and the 12:00..12:10
    # pair; 13:30 remains open. Pre-fix: ONE session 10:00..12:10 (n=3).
    assert [(r["session_start"], r["session_end"], r["n_events"]) for r in rows] == [
        (mk(-120), mk(-120), 1),
        (mk(0), mk(10), 2),
    ]


def test_asof_enrich_stream_matches_batch_asof(spark, tmp_path_factory):
    """The stream enrichment over an in-order tagged stream equals the
    batch asof_join (backward, left semantics, right-wins-at-equal-ts),
    and state stays two reference rows per key."""
    import datetime as dt

    from dask_glm_spark.operators.joins import asof_join
    from dask_glm_spark.streaming.enrich import asof_enrich_stream

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(m):
        return base + dt.timedelta(minutes=m)

    # reference updates (side=r) and events (side=l) for two keys
    rrows = [
        (None, 1, mk(0), "r", 10.0),
        (None, 1, mk(30), "r", 20.0),
        (None, 2, mk(10), "r", 99.0),
    ]
    lrows = [
        (100, 1, mk(5), "l", None),    # after r@0  -> 10.0
        (101, 1, mk(30), "l", None),   # ties r@30  -> 20.0 (right first)
        (102, 1, mk(45), "l", None),   # after r@30 -> 20.0
        (103, 2, mk(5), "l", None),    # before any r -> NULL
        (104, 3, mk(5), "l", None),    # key never updated -> NULL
    ]
    schema = "event_id long, user_id long, ts timestamp, side string, price double"
    d = str(tmp_path_factory.mktemp("enrich_stream"))
    # two microbatches, in event-time order
    spark.createDataFrame(rrows[:1] + lrows[:1], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/b=0")
    spark.createDataFrame(rrows[1:] + lrows[1:], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/b=1")
    sch = spark.read.parquet(f"{d}/b=0").schema
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/b=*")
    )
    out = asof_enrich_stream(stream, ["price"])
    SC.run_stream_to_memory(out, "enrich_stream_test", mode="append")
    got = {
        r["event_id"]: r["price_asof"]
        for r in spark.table("enrich_stream_test").collect()
    }
    # batch oracle on the same data
    left = spark.createDataFrame(
        [(e, u, t) for e, u, t, _, _ in lrows],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(u, t, p) for _, u, t, _, p in rrows],
        "user_id long, ts timestamp, price double",
    )
    want = {
        r["event_id"]: r["price_asof"]
        for r in asof_join(left, right, value_cols=["price"]).collect()
    }
    as_f = lambda v: None if v is None else float(v)
    assert {k: as_f(v) for k, v in got.items()} == want
    assert len(got) == 5


def test_asof_enrich_stream_pre_epoch_timestamps(spark, tmp_path_factory):
    """Regression (ADVICE r6): absence is marked by an empty payload, not a
    ts >= -1 sentinel — a reference with a pre-epoch (negative unix micros)
    timestamp must be stored and matched exactly like the batch asof_join."""
    import datetime as dt

    from dask_glm_spark.streaming.enrich import asof_enrich_stream

    pre = dt.datetime(1969, 12, 31, 12, 0, 0)  # negative unix micros

    def mk(m):
        return pre + dt.timedelta(minutes=m)

    rows = [
        (None, 1, mk(0), "r", 7.0),       # pre-epoch reference
        (200, 1, mk(5), "l", None),       # pre-epoch event -> 7.0
        (201, 1, dt.datetime(2024, 1, 1), "l", None),  # post-epoch -> 7.0
        (202, 1, mk(-5), "l", None),      # before the reference -> NULL
    ]
    schema = "event_id long, user_id long, ts timestamp, side string, price double"
    d = str(tmp_path_factory.mktemp("enrich_pre_epoch"))
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/b=0")
    sch = spark.read.parquet(f"{d}/b=0").schema
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/b=*")
    )
    out = asof_enrich_stream(stream, ["price"])
    SC.run_stream_to_memory(out, "enrich_pre_epoch_test", mode="append")
    got = {
        r["event_id"]: r["price_asof"]
        for r in spark.table("enrich_pre_epoch_test").collect()
    }
    assert got == {200: "7.0", 201: "7.0", 202: None}


def test_softmax_scored_stream_matches_batch_estimator(spark, tmp_path_factory):
    """Streaming softmax scoring (stateless map over named columns) equals
    the fitted SoftmaxRegression's batch predict_proba/predict on the same
    rows — the fit's coefficient list drops in directly."""
    import numpy as np

    from dask_glm_spark import SoftmaxRegression
    from dask_glm_spark.streaming.scoring import softmax_scored_event_stream

    rng = np.random.RandomState(9)
    centers = np.array([[3.0, 0.0], [-3.0, 2.0], [0.0, -4.0]])
    rows = [
        (int(i), float(c), *map(float, centers[c] + rng.standard_normal(2)))
        for i, c in enumerate(rng.randint(0, 3, size=120))
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, label double, f1 double, f2 double"
    )
    feat = batch.select(
        "event_id", "label", F.array("f1", "f2").alias("features")
    )
    m = SoftmaxRegression(solver="lbfgs", regularizer=None).fit(feat)

    d = str(tmp_path_factory.mktemp("softmax_stream"))
    batch.coalesce(1).write.mode("overwrite").parquet(f"{d}/b=0")
    sch = spark.read.parquet(f"{d}/b=0").schema
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/b=*")
    )
    out = softmax_scored_event_stream(
        stream, m._coefs, m.classes_, ["f1", "f2"]
    )
    SC.run_stream_to_memory(out, "softmax_stream_test", mode="append")
    got = {
        r["event_id"]: (list(r["probabilities"]), r["prediction"])
        for r in spark.table("softmax_stream_test").collect()
    }
    want_rows = (
        m.predict_proba(feat)
        .join(m.predict(feat).select("event_id", "prediction"), "event_id")
        .collect()
    )
    want = {
        r["event_id"]: (list(r["probabilities"]), r["prediction"])
        for r in want_rows
    }
    assert set(got) == set(want) and len(got) == 120
    for k in got:
        np.testing.assert_allclose(got[k][0], want[k][0], rtol=1e-12)
        assert got[k][1] == want[k][1]


def test_dedup_stream_incremental_unbounded_horizon(spark, tmp_path_factory):
    """Two availableNow runs over a growing source dir: batch-2 documents
    whose text appeared in batch 1 are dropped no matter the gap (the
    watermark variant would forget), within-batch dups dedup, and the
    epoch-addressed outputs equal the sequential batch
    exact_dedup_incremental replay."""
    import os

    from dask_glm_spark.operators.dedup import exact_dedup_incremental
    from dask_glm_spark.streaming.dedup import dedup_stream_incremental

    root = tmp_path_factory.mktemp("inc_stream")
    src = os.path.join(str(root), "src")
    out = os.path.join(str(root), "out")
    state = os.path.join(str(root), "state")
    ckpt = os.path.join(str(root), "ckpt")

    b1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(10, "alpha text"), (11, "gamma text"), (12, "gamma text"),
         (13, "beta text")],
        "doc_id long, text string",
    )
    b1.write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = dedup_stream_incremental(stream, out, state, ckpt)
    q.awaitTermination(120)

    b2.write.mode("append").parquet(src)
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
    q2 = dedup_stream_incremental(stream2, out, state, ckpt)
    q2.awaitTermination(120)

    got = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "epoch-*")).collect()
    }
    # sequential batch replay as the oracle
    s1, idx = exact_dedup_incremental(b1, None)
    s2, _ = exact_dedup_incremental(b2, idx)
    want = {r["doc_id"] for r in s1.collect()} | {
        r["doc_id"] for r in s2.collect()
    }
    assert got == want
    assert 1 in got or 3 in got          # one alpha survivor from batch 1
    assert 10 not in got                  # late cross-batch dup suppressed
    assert 11 in got and 12 not in got    # within-batch dedup in batch 2
    assert 13 not in got


def test_neardup_stream_incremental_unbounded_horizon(spark, tmp_path_factory):
    """Round 9 (VERDICT r8 #4): the MinHash companion of the exact
    incremental stream — two availableNow runs over a growing source dir
    equal the sequential batch minhash_dedup_incremental replay; late
    cross-batch NEAR-dups (not byte-equal) are suppressed via the
    signature index."""
    import os

    from dask_glm_spark.operators.dedup import minhash_dedup_incremental
    from dask_glm_spark.streaming.dedup import neardup_stream_incremental

    root = tmp_path_factory.mktemp("neardup_stream")
    src = os.path.join(str(root), "src")
    out = os.path.join(str(root), "out")
    state = os.path.join(str(root), "state")
    ckpt = os.path.join(str(root), "ckpt")

    base_a = " ".join(f"alpha{i} token" for i in range(20))
    base_b = " ".join(f"beta{i} word" for i in range(20))
    base_c = " ".join(f"gamma{i} item" for i in range(20))
    near = lambda t: t.replace("5 ", "5x ", 1)  # noqa: E731 - one-word edit

    b1 = spark.createDataFrame(
        [(1, base_a), (2, base_b), (3, near(base_a))],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(10, near(base_a)), (11, base_c), (12, near(base_c)),
         (13, near(base_b))],
        "doc_id long, text string",
    )
    b1.write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = neardup_stream_incremental(stream, out, state, ckpt)
    q.awaitTermination(120)

    b2.write.mode("append").parquet(src)
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
    q2 = neardup_stream_incremental(stream2, out, state, ckpt)
    q2.awaitTermination(120)

    got = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "epoch-*")).collect()
    }
    # sequential batch replay as the oracle
    s1, idx = minhash_dedup_incremental(b1, None)
    s2, _ = minhash_dedup_incremental(b2, idx)
    want = {r["doc_id"] for r in s1.collect()} | {
        r["doc_id"] for r in s2.collect()
    }
    assert got == want
    assert 2 in got                       # distinct batch-1 doc kept
    assert (1 in got) != (3 in got)       # one near-dup survivor of A
    assert 10 not in got                  # late cross-batch NEAR-dup dropped
    assert (11 in got) != (12 in got)     # within-batch near-dedup
    assert 13 not in got                  # near-dup of batch-1 B
    # the persisted index holds signatures, never text
    idx_cols = set(
        spark.read.parquet(os.path.join(state, "epoch-*")).columns
    )
    assert idx_cols == {"doc_id", "sig", "bands"}


def test_simhash_stream_incremental_unbounded_horizon(spark, tmp_path_factory):
    """Round 10 (VERDICT r9 #7): the SimHash companion — two availableNow
    runs over a growing source dir equal the sequential batch
    simhash_dedup_incremental replay; late cross-batch near-dups are
    suppressed via the (doc_id, simhash) index and the state schema is
    pinned to one long per kept doc."""
    import os

    from dask_glm_spark.operators.dedup import simhash_dedup_incremental
    from dask_glm_spark.streaming.dedup import simhash_stream_incremental

    root = tmp_path_factory.mktemp("simhash_stream")
    src = os.path.join(str(root), "src")
    out = os.path.join(str(root), "out")
    state = os.path.join(str(root), "state")
    ckpt = os.path.join(str(root), "ckpt")

    base_a = " ".join(f"alpha{i} token" for i in range(20))
    base_b = " ".join(f"beta{i} word" for i in range(20))
    base_c = " ".join(f"gamma{i} item" for i in range(20))
    near = lambda t: t.replace("5 ", "5x ", 1)  # noqa: E731 - one-word edit

    b1 = spark.createDataFrame(
        [(1, base_a), (2, base_b), (3, near(base_a))],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(10, near(base_a)), (11, base_c), (12, near(base_c)),
         (13, near(base_b))],
        "doc_id long, text string",
    )
    b1.write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = simhash_stream_incremental(stream, out, state, ckpt)
    q.awaitTermination(120)

    b2.write.mode("append").parquet(src)
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
    q2 = simhash_stream_incremental(stream2, out, state, ckpt)
    q2.awaitTermination(120)

    got = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "epoch-*")).collect()
    }
    # sequential batch replay as the oracle
    s1, idx = simhash_dedup_incremental(b1, None)
    s2, _ = simhash_dedup_incremental(b2, idx)
    want = {r["doc_id"] for r in s1.collect()} | {
        r["doc_id"] for r in s2.collect()
    }
    assert got == want
    assert 2 in got                       # distinct batch-1 doc kept
    # the persisted index is (doc_id, simhash), never text
    st = spark.read.parquet(os.path.join(state, "epoch-*"))
    assert set(st.columns) == {"doc_id", "simhash"}
    # one state row per kept doc, no duplicated signatures
    assert st.count() == st.select("doc_id").distinct().count() == len(want)


def test_neardup_stream_additions_under_doc_id_reuse(spark, tmp_path_factory):
    """ADVICE r9: a doc_id REUSED in a later epoch by a changed doc that
    survives must add exactly one new index row — the old derivation
    (semi-join on doc_id against this epoch's survivors) re-wrote the
    prior epoch's signature row into the new epoch's state, duplicating
    it in every future read."""
    import os

    from dask_glm_spark.streaming.dedup import neardup_stream_incremental

    root = tmp_path_factory.mktemp("neardup_reuse")
    src = os.path.join(str(root), "src")
    out = os.path.join(str(root), "out")
    state = os.path.join(str(root), "state")
    ckpt = os.path.join(str(root), "ckpt")

    base_a = " ".join(f"alpha{i} token" for i in range(20))
    base_b = " ".join(f"beta{i} word" for i in range(20))

    b1 = spark.createDataFrame([(1, base_a)], "doc_id long, text string")
    # doc_id 1 REUSED for an unrelated doc (survives the near-dup check)
    b2 = spark.createDataFrame([(1, base_b)], "doc_id long, text string")

    b1.write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    neardup_stream_incremental(stream, out, state, ckpt).awaitTermination(120)
    b2.write.mode("append").parquet(src)
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
    neardup_stream_incremental(stream2, out, state, ckpt).awaitTermination(120)

    st = spark.read.parquet(os.path.join(state, "epoch-*"))
    rows = st.collect()
    # both docs' signatures present exactly once — no prior-epoch row
    # duplicated into the later epoch's directory
    assert len(rows) == 2
    sigs = {tuple(r["sig"]) for r in rows}
    assert len(sigs) == 2


def test_index_stream_incremental(spark, tmp_path_factory):
    """Round 10: continuous ANN indexing — two availableNow runs over a
    growing embedding source build an epoch-partitioned IVF-PQ artifact
    whose probe results equal the in-session index over the full
    corpus; a pre-existing batch (non-epoch) layout is rejected loudly."""
    import os

    import numpy as np

    from dask_glm_spark.operators import similarity as S
    from dask_glm_spark.streaming.indexing import index_stream_incremental

    root = tmp_path_factory.mktemp("idx_stream")
    src = os.path.join(str(root), "src")
    art = os.path.join(str(root), "art")
    ckpt = os.path.join(str(root), "ckpt")

    rng = np.random.RandomState(21)
    centers = rng.standard_normal((6, 8))
    lab = rng.randint(0, 6, 80)
    X = centers[lab] + 0.15 * rng.standard_normal((80, 8))
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(80)]
    schema = "vec_id long, embedding array<double>"
    full = spark.createDataFrame(rows, schema)

    # bootstrap: quantizers only (trained once), no index dir yet
    cent = S.train_ivf_centroids(full, 6)
    cb = S.pq_train(full, m=4, ksub=16)
    os.makedirs(art, exist_ok=True)
    S.save_pq(os.path.join(art, "model.json"), cb, centroids=cent)

    spark.createDataFrame(rows[:50], schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    index_stream_incremental(stream, art, ckpt).awaitTermination(120)
    spark.createDataFrame(rows[50:], schema).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    index_stream_incremental(stream2, art, ckpt).awaitTermination(120)

    idx, cent2, cb2, br = S.load_ivf_pq_index(spark, art)
    assert idx.count() == 80
    assert dict(idx.dtypes)["cell"] == "bigint"
    queries = full.where(F.col("vec_id") < 5)
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in S.ivf_pq_ann_topk(
            full, queries, k=3, n_centroids=6, nprobe=3,
            centroids=cent, codebooks=cb,
        ).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in S.ivf_pq_probe(
            idx, queries, cent2, cb2, k=3, nprobe=3, prune_cells=True
        ).collect()
    }
    assert got == want

    # mixed-layout guard: batch artifact cannot be streamed into
    art2 = os.path.join(str(root), "art2")
    S.save_ivf_pq_index(
        art2, S.ivf_pq_index(full, cent, cb), cent, cb,
        partition_by_cell=True,
    )
    stream3 = spark.readStream.schema(schema).parquet(src)
    q3 = index_stream_incremental(
        stream3, art2, os.path.join(str(root), "ckpt2")
    )
    import pytest as _pytest
    with _pytest.raises(Exception, match="non-epoch layout"):
        q3.awaitTermination(120)
        q3.stop()


def test_compact_index_epochs(spark, tmp_path_factory):
    """Round 10: compacting a stream-built (epoch-partitioned) artifact
    yields the plain cell-partitioned batch layout with identical probe
    results; batch append composes afterwards."""
    import os

    import numpy as np

    from dask_glm_spark.operators import similarity as S
    from dask_glm_spark.streaming.indexing import index_stream_incremental

    root = tmp_path_factory.mktemp("idx_compact")
    src = os.path.join(str(root), "src")
    art = os.path.join(str(root), "art")
    ckpt = os.path.join(str(root), "ckpt")

    rng = np.random.RandomState(31)
    X = rng.standard_normal((60, 8))
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(60)]
    schema = "vec_id long, embedding array<double>"
    full = spark.createDataFrame(rows, schema)
    cent = S.train_ivf_centroids(full, 5)
    cb = S.pq_train(full, m=4, ksub=16)
    os.makedirs(art, exist_ok=True)
    S.save_pq(os.path.join(art, "model.json"), cb, centroids=cent)

    spark.createDataFrame(rows[:30], schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    index_stream_incremental(stream, art, ckpt).awaitTermination(120)
    spark.createDataFrame(rows[30:50], schema).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    index_stream_incremental(stream2, art, ckpt).awaitTermination(120)

    queries = full.where(F.col("vec_id") < 4)

    def probe():
        idx, c2, cb2, _ = S.load_ivf_pq_index(spark, art)
        return idx, {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in S.ivf_pq_probe(
                idx, queries, c2, cb2, k=3, nprobe=3, prune_cells=True
            ).collect()
        }

    idx_before, before = probe()
    assert idx_before.count() == 50
    S.compact_ivf_pq_index(spark, art)
    idx_after, after = probe()
    assert after == before
    assert idx_after.count() == 50
    assert "epoch" not in idx_after.columns
    tops = [d for d in os.listdir(os.path.join(art, "index"))
            if not d.startswith(("_", "."))]
    assert tops and all(d.startswith("cell=") for d in tops)
    # batch append composes on the compacted layout
    S.append_to_ivf_pq_index(
        art, spark.createDataFrame(rows[50:], schema)
    )
    idx_final, _ = probe()
    assert idx_final.count() == 60
