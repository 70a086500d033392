"""Continuous GLM training (``streaming.training``) — round 11.

Contract under test: after the stream drains, ``latest.json`` IS the
batch fit over every row seen (stream ≡ batch parity); epochs are
replay-idempotent (dynamic partition overwrite); the warm-start chain
resumes from the persisted model; a state_dir holding a different
estimator type fails loudly."""

from __future__ import annotations

import os

import numpy as np
import pytest

from dask_glm_spark import LinearRegression, LogisticRegression
from dask_glm_spark.operators.estimators import load_model, save_model
from dask_glm_spark.streaming.training import fit_stream_incremental


def _make_batches(spark, d: str, n_batches: int = 3, n: int = 300):
    rng = np.random.RandomState(99)
    X = rng.standard_normal((n, 2))
    z = X @ np.array([1.0, -0.5]) + 0.2
    y = (1 / (1 + np.exp(-z)) > rng.uniform(size=n)).astype(np.float64)
    rows = [([float(v) for v in X[i]], float(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "features array<double>, label double")
    per = n // n_batches
    parts = []
    for i in range(n_batches):
        part = spark.createDataFrame(
            rows[i * per: (i + 1) * per],
            "features array<double>, label double",
        )
        part.coalesce(1).write.mode("overwrite").parquet(f"{d}/b={i}")
        parts.append(part)
    return df


def _run_stream(spark, src: str, state: str, ckpt: str, est):
    schema = spark.read.parquet(f"{src}/b=0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b=*")
    )
    q = fit_stream_incremental(stream, est, state, ckpt)
    q.awaitTermination(180)
    return state


def _fresh_est():
    return LogisticRegression(
        solver="lbfgs", regularizer=None, tol=1e-10, max_iter=300
    )


def test_stream_fit_equals_batch_and_replays_idempotently(
    spark, tmp_path_factory
):
    d = str(tmp_path_factory.mktemp("glm_stream"))
    state = str(tmp_path_factory.mktemp("glm_state"))
    full = _make_batches(spark, d)

    _run_stream(spark, d, state, f"{state}/ckpt1", _fresh_est())
    models = sorted(
        f for f in os.listdir(f"{state}/models") if f.startswith("epoch_")
    )
    assert len(models) == 3  # one refit per micro-batch
    m = load_model(f"{state}/models/latest.json")
    batch = _fresh_est().fit(full)
    np.testing.assert_allclose(m._coef, batch._coef, atol=1e-5, rtol=0)
    n_rows = spark.read.parquet(f"{state}/data").count()
    assert n_rows == full.count()

    # replay: fresh checkpoint, SAME state dir — every epoch rewrites its
    # own partition; row count and model unchanged (not doubled)
    _run_stream(spark, d, state, f"{state}/ckpt2", _fresh_est())
    assert spark.read.parquet(f"{state}/data").count() == n_rows
    m2 = load_model(f"{state}/models/latest.json")
    np.testing.assert_allclose(m2._coef, batch._coef, atol=1e-5, rtol=0)


def test_stream_fit_resumes_warm_chain_and_guards_type(
    spark, tmp_path_factory
):
    d = str(tmp_path_factory.mktemp("glm_stream2"))
    state = str(tmp_path_factory.mktemp("glm_state2"))
    full = _make_batches(spark, d, n_batches=2)

    _run_stream(spark, d, state, f"{state}/ckpt1", _fresh_est())
    batch = _fresh_est().fit(full)

    # "driver restart": a brand-new estimator instance adopts latest.json
    # as its warm start (observable: the refit over unchanged data stays
    # at the batch optimum with a tiny budget — a zeros cold start with
    # max_iter=2 would land far away)
    est = LogisticRegression(
        solver="lbfgs", regularizer=None, tol=1e-6, max_iter=2
    )
    _run_stream(spark, d, state, f"{state}/ckpt2", est)
    m = load_model(f"{state}/models/latest.json")
    np.testing.assert_allclose(m._coef, batch._coef, atol=1e-4, rtol=0)

    # type guard: latest.json of a different estimator class fails loudly
    wrong = LinearRegression(solver="newton", max_iter=5)
    wrong._coef = np.zeros(3)
    save_model(wrong, f"{state}/models/latest.json")
    with pytest.raises(Exception, match="state_dir mismatch"):
        _run_stream(spark, d, state, f"{state}/ckpt3", _fresh_est())


def test_refit_once_skips_empty_first_batch(spark, tmp_path_factory):
    """Review r11: an empty FIRST micro-batch must not kill the query
    (no parquet schema would exist for the read-back)."""
    from dask_glm_spark.streaming.training import _refit_once

    state = str(tmp_path_factory.mktemp("glm_state_empty"))
    empty = spark.createDataFrame(
        [], "features array<double>, label double"
    )
    est = _fresh_est()
    _refit_once(est, empty, 0, f"{state}/data", f"{state}/models")
    assert not os.path.exists(f"{state}/data")
    assert est._coef is None  # no refit happened


def test_remote_scheme_guards(spark, tmp_path_factory):
    """Review r11: model JSON persistence is driver-local — a remote
    state_dir without an explicit driver-visible models_dir refuses."""
    d = str(tmp_path_factory.mktemp("glm_stream3"))
    _make_batches(spark, d, n_batches=1)
    schema = spark.read.parquet(f"{d}/b=0").schema
    stream = spark.readStream.schema(schema).parquet(f"{d}/b=*")
    with pytest.raises(ValueError, match="models_dir"):
        fit_stream_incremental(
            stream, _fresh_est(), "s3a://bucket/glm", f"{d}/ckpt"
        )
    with pytest.raises(ValueError, match="driver-visible"):
        fit_stream_incremental(
            stream, _fresh_est(), f"{d}/state", f"{d}/ckpt",
            models_dir="hdfs://nn/models",
        )


def test_multiclass_state_adoption(spark, tmp_path_factory):
    """Review r11: the warm-chain resume must adopt _coefs/classes_ for
    multiclass estimators, not just the binary _coef."""
    from dask_glm_spark import MulticlassLogisticRegression
    from dask_glm_spark.streaming.training import _adopt_state, _fitted

    rng = np.random.RandomState(4)
    X = rng.standard_normal((120, 2))
    y = np.argmax(X @ rng.standard_normal((2, 3)), axis=1).astype(float)
    df = spark.createDataFrame(
        [([float(v) for v in X[i]], float(y[i])) for i in range(120)],
        "features array<double>, label double",
    )
    fitted = MulticlassLogisticRegression(
        solver="lbfgs", regularizer=None, max_iter=50
    ).fit(df)
    fresh = MulticlassLogisticRegression(
        solver="lbfgs", regularizer=None, max_iter=50
    )
    assert not _fitted(fresh)
    _adopt_state(fresh, fitted)
    assert _fitted(fresh)
    assert fresh.classes_ == fitted.classes_
    np.testing.assert_array_equal(
        np.stack(fresh._coefs), np.stack(fitted._coefs)
    )
    with pytest.raises(ValueError, match="state_dir mismatch"):
        _adopt_state(LinearRegression(), fitted)
