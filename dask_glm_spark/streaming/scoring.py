"""Structured Streaming: event-stream aggregation and model scoring.

Beyond-reference surface (SURVEY.md §7 step 10; the reference has no
streaming — dask ``persist`` futures are its only async surface). Design:

- **One logical aggregation, two run modes.** ``hourly_event_stats`` is the
  oracle-checkable batch form (pure epoch arithmetic — timezone-free, so a
  vanilla driver session in any TZ matches DuckDB). ``windowed_event_stats``
  is the same rollup expressed with ``F.window`` + watermark so it runs
  incrementally under ``readStream`` with bounded state; its batch-mode
  output is asserted equal to the arithmetic form in tests.
- **Scoring is a narrow map.** ``score_events_expr`` applies a fitted GLM
  (P1 mat-vec with beta folded in as literals) to feature columns of the
  stream — stateless, so it composes with any sink/trigger, and the exact
  same Column works in batch.

At scale: the stream aggregation shuffles only (bucket, event_type) keyed
partials (Structured Streaming's state store holds one row per open
window x type), and the watermark bounds state for late data.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MICROS_PER_HOUR = 3_600_000_000


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch read of the events table with the nanos->micros conversion."""
    from dask_glm_spark.sources.glm_source import load_table

    return load_table(spark, sf_dir, "events")


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the same events parquet (schema pinned from a
    batch read; ``readStream`` requires an explicit schema)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        # FileStreamSource wants a directory; the testdata table is a single
        # file inside sf_dir, so stream the directory with a filename filter
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from dask_glm_spark.sources.glm_source import NANO_TS_COLS, repair_nano_timestamps

    return repair_nano_timestamps(raw, NANO_TS_COLS.get("events", []))


def hourly_event_stats(events: DataFrame) -> DataFrame:
    """Per (epoch-hour, event_type): count and sum(value).

    Pure integer arithmetic on the UTC instant (``unix_micros`` is
    timezone-independent), so the result is identical under any session
    timezone and reproducible in the DuckDB oracle via
    ``floor(epoch_ns(ts)/3600e9)``.
    """
    bucket = F.floor(F.unix_micros(F.col("ts")) / F.lit(MICROS_PER_HOUR))
    return (
        events.groupBy(
            bucket.cast("long").alias("hour_bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 3).cast("double").alias("sum_value"),
        )
        .orderBy("hour_bucket", "event_type")
    )


def windowed_event_stats(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """The same hourly rollup as ``F.window`` + watermark — streamable.

    On a streaming DataFrame the watermark bounds the state store (windows
    older than max(event time) - watermark are finalized and evicted); on a
    batch DataFrame it degenerates to a plain windowed groupBy whose output
    matches ``hourly_event_stats`` bucket-for-bucket (asserted in tests).
    """
    withw = events.withWatermark("ts", watermark) if events.isStreaming else events
    return withw.groupBy(
        F.window("ts", "1 hour").alias("w"), F.col("event_type")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 3).cast("double").alias("sum_value"),
    ).select(
        F.floor(F.unix_micros(F.col("w.start")) / F.lit(MICROS_PER_HOUR))
        .cast("long")
        .alias("hour_bucket"),
        "event_type",
        "n",
        "sum_value",
    )


def score_events_expr(beta: Iterable[float], feature_cols: list[str]) -> F.Column:
    """P1 mat-vec over named scalar columns + logistic link, as one narrow
    Column — usable identically on batch and streaming frames.

    ``len(beta) == len(feature_cols) + 1`` treats the LAST coefficient as
    the intercept (the estimators' ``_coef`` layout, estimators.py), so a
    fitted ``model._coef`` drops in directly. Any other length mismatch
    raises — the previous zip silently truncated, scoring with a
    partially-applied model (review r5)."""
    from dask_glm_spark.functions.families import sigmoid_expr

    beta = [float(b) for b in beta]
    if len(beta) == len(feature_cols) + 1:
        xb: F.Column | None = F.lit(beta[-1])
        beta = beta[:-1]
    elif len(beta) == len(feature_cols):
        xb = None
    else:
        raise ValueError(
            f"beta has {len(beta)} coefficients for {len(feature_cols)} "
            "feature columns (expected equal, or one extra trailing "
            "intercept)"
        )
    for c, b in zip(feature_cols, beta):
        term = F.col(c) * b
        xb = term if xb is None else xb + term
    return sigmoid_expr(xb)


def scored_event_stream(
    events: DataFrame, beta: Iterable[float], feature_cols: list[str] | None = None
) -> DataFrame:
    """Attach a fitted-model probability to each event (stateless map)."""
    feature_cols = feature_cols or ["value"]
    return events.withColumn(
        "probability", score_events_expr(beta, feature_cols)
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, mode: str = "append"
) -> None:
    """Drain a stream into an in-memory table with the availableNow trigger
    (test/driver harness helper): processes everything currently in the
    source, then stops."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def softmax_score_expr(
    coefs, classes: list, feature_cols: list[str]
) -> F.Column:
    """Jointly-normalized class probabilities over named scalar columns —
    the streaming twin of ``SoftmaxRegression.predict_proba`` (round 7).
    ``coefs`` is the estimator's per-class coefficient list (each length
    len(feature_cols)+1 with a trailing intercept, or exactly
    len(feature_cols)); returns an array<double> of len(classes)
    probabilities, numerically stable (max-shifted), score array
    let-bound once. Stateless: usable identically on batch and streaming
    frames."""
    from dask_glm_spark.functions.exprs import let as _let

    def linear(beta):
        beta = [float(b) for b in beta]
        if len(beta) == len(feature_cols) + 1:
            xb: F.Column = F.lit(beta[-1])
            beta = beta[:-1]
        elif len(beta) == len(feature_cols):
            xb = F.lit(0.0)
        else:
            raise ValueError(
                f"class coefficient vector has {len(beta)} entries for "
                f"{len(feature_cols)} feature columns"
            )
        for c, b in zip(feature_cols, beta):
            xb = xb + F.col(c) * b
        return xb

    if len(coefs) != len(classes):
        raise ValueError(f"{len(coefs)} coefficient vectors for {len(classes)} classes")
    scores = F.array(*[linear(b) for b in coefs])
    return _let(
        scores,
        lambda s: _let(
            F.transform(s, lambda x: F.exp(x - F.array_max(s))),
            lambda e: _let(
                F.aggregate(e, F.lit(0.0), lambda a, x: a + x),
                lambda total: F.transform(e, lambda x: x / total),
            ),
        ),
    )


def softmax_scored_event_stream(
    events: DataFrame,
    coefs,
    classes: list,
    feature_cols: list[str],
) -> DataFrame:
    """Attach multiclass probabilities + argmax prediction to each event
    (stateless narrow map — works on batch and streaming frames alike).
    ``coefs``/``classes`` drop in from a fitted ``SoftmaxRegression``
    (``m._coefs`` / ``m.classes_``) or a ``load_model`` artifact."""
    cls_arr = F.array(*[F.lit(c) for c in classes])
    probs = softmax_score_expr(coefs, classes, feature_cols)
    from dask_glm_spark.functions.exprs import let as _let

    out = events.withColumn("probabilities", probs)
    pred = _let(
        F.col("probabilities"),
        lambda p: F.element_at(
            cls_arr, F.array_position(p, F.array_max(p)).cast("int")
        ),
    )
    return out.withColumn("prediction", pred)
