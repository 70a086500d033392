"""Continuous GLM training: keep a fitted model fresh from a stream of
labeled rows — beyond-reference (round 11), built on the round-10 warm
starts.

Each micro-batch (1) lands its rows in an epoch-addressed state parquet
via dynamic partition overwrite — the repo's streaming discipline: a
replayed epoch rewrites exactly its own ``epoch=K`` partition, so the
accumulated training set is correct under at-least-once delivery — and
(2) REFITS the estimator over the full accumulated state, warm-started
from the previous optimum, then (3) persists the model as
``models/epoch_K.json`` plus an atomically-swapped ``latest.json``
(write-aside + rename — no crash window where latest is torn). Serving
processes ``load_model(latest.json)`` on their own cadence.

Semantics: after epoch K the model IS the batch fit over all rows of
epochs 0..K (same objective, same optimizer, tighter-than-tol agreement
— pinned by the stream≡batch parity test). This is honest continuous
training, not an approximation: the warm start only changes WHERE the
optimizer starts, and the round-10 restart guard plus λ-path
measurements put the incremental cost at a few scans per epoch when the
data drifts slowly (cold refits re-pay the full iteration budget).

Filesystems: the DATA state is written by Spark and works on any
supported scheme (s3a://, hdfs://, ...). The MODEL files are
driver-local JSON (``open``/``os.replace`` — the atomic-swap contract
needs a POSIX rename), so ``models_dir`` must be a driver-visible path;
when ``state_dir`` carries a remote scheme you MUST pass an explicit
local/shared-mount ``models_dir`` or the sink refuses loudly (review
r11 — silently writing "s3a:/bucket/..." as a literal local directory
split state across filesystems).

At 100 TB: the state parquet accretes one epoch directory per
micro-batch (compact offline like the dedup state sinks); each refit is
the solver's usual one-scan-per-iteration shape over the accumulated
cache — with warm starts, a handful of scans. A restart of the driver
process resumes the warm-start chain from ``latest.json``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_remote(path: str) -> bool:
    scheme = path.split("://", 1)[0] if "://" in path else ""
    return scheme not in ("", "file")


def _adopt_state(est, prev) -> None:
    """Copy fitted state from a loaded model into the live estimator —
    binary (``_coef``) AND multiclass (``_coefs``/``classes_``; the OvR
    and softmax warm starts key on those, review r11)."""
    if type(prev) is not type(est):
        raise ValueError(
            f"latest.json holds a {type(prev).__name__}, the sink fits a "
            f"{type(est).__name__} — state_dir mismatch"
        )
    est._coef = prev._coef
    if getattr(prev, "_coefs", None) is not None:
        est._coefs = prev._coefs
        est.classes_ = prev.classes_


def _fitted(est) -> bool:
    return (
        est._coef is not None or getattr(est, "_coefs", None) is not None
    )


def _refit_once(
    est, batch_df: DataFrame, epoch_id: int, data_dir: str,
    models_dir: str, **fit_kwargs,
) -> None:
    """One epoch of the sink — module-level so the guards are unit-
    testable without a streaming query."""
    from dask_glm_spark.operators.estimators import load_model, save_model

    spark = batch_df.sparkSession
    if batch_df.isEmpty():
        # nothing new: skip the write AND the refit (a first empty batch
        # would otherwise leave no parquet schema and kill the read)
        return
    rows = batch_df.withColumn("epoch", F.lit(int(epoch_id)))
    key = "spark.sql.sources.partitionOverwriteMode"
    prior = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        rows.write.mode("overwrite").partitionBy("epoch").parquet(data_dir)
    finally:
        spark.conf.set(key, prior)
    # resume the warm-start chain across driver restarts: if this process
    # holds no coefficients yet, adopt the persisted latest
    latest = os.path.join(models_dir, "latest.json")
    if not _fitted(est) and os.path.exists(latest):
        _adopt_state(est, load_model(latest))
    full = spark.read.parquet(data_dir).drop("epoch")
    est.fit(full, **fit_kwargs)
    os.makedirs(models_dir, exist_ok=True)
    save_model(est, os.path.join(models_dir, f"epoch_{int(epoch_id)}.json"))
    tmp = os.path.join(models_dir, ".latest.json.tmp")
    save_model(est, tmp)
    os.replace(tmp, latest)  # atomic swap: no torn latest.json


def fit_stream_incremental(
    stream_df: DataFrame,
    estimator,
    state_dir: str,
    checkpoint_dir: str,
    models_dir: str | None = None,
    trigger_available_now: bool = True,
    **fit_kwargs,
):
    """foreachBatch sink that maintains ``state_dir/data`` (epoch-
    partitioned training rows; any Spark-supported filesystem) and
    ``models_dir`` (per-epoch JSON + ``latest.json``; driver-local,
    defaults to ``state_dir/models``). ``estimator`` is any
    dense-features estimator from ``operators.estimators`` (its
    ``warm_start`` is forced on); extra ``fit_kwargs`` pass through to
    every refit. Returns the started StreamingQuery."""
    est = estimator
    est.warm_start = True
    data_dir = os.path.join(state_dir, "data")
    if models_dir is None:
        if _is_remote(state_dir):
            raise ValueError(
                f"state_dir {state_dir!r} is on a remote filesystem, but "
                "model JSON persistence is driver-local (atomic rename) — "
                "pass models_dir= pointing at a driver-visible path "
                "(local disk or a shared mount)"
            )
        models_dir = os.path.join(state_dir, "models")
    elif _is_remote(models_dir):
        raise ValueError(
            f"models_dir {models_dir!r} must be driver-visible (local "
            "path or shared mount) — the atomic latest.json swap uses "
            "os.replace"
        )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        _refit_once(
            est, batch_df, epoch_id, data_dir, models_dir, **fit_kwargs
        )

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
