"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
Pandas-UDF decode / feature-extraction / resize / frame-sampling plumbing.

Beyond-reference surface (SURVEY.md §7 step 10). The container image has no
image/audio codecs, so the *codec* step is stubbed exactly as the build
brief requires: ``decode_image``/``resize_images`` raise a clearly-marked
``NotImplementedError`` unless PIL is importable. Everything around the
codec — schema convention, Arrow batch flow through ``mapInPandas``, batch
shapes, partition sizing for large payloads, deterministic byte-level
features — is real and tested.

Schema convention for a multimodal table::

    payload     binary          -- the opaque media bytes
    media_type  string          -- 'image/png', 'audio/wav', 'video/mp4', ...
    meta        struct<width int, height int, n_frames int, sample_rate int>

Scale notes:

- Binary payloads dominate row size; ``repartition_for_payloads`` sizes
  partitions by *bytes*, not rows, so an executor never materializes more
  than ~target_mb of media per Arrow batch.
- All feature extraction is ``mapInPandas`` (Arrow-batched, zero-copy into
  numpy); per-row Python is never used.
- Byte-histogram features are *real* computation (no codec needed) and
  deterministic — they give the GLM layer a multimodal feature path today,
  and the DuckDB oracle recomputes them exactly (q27).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HIST_BINS = 16

META_FIELDS = "width int, height int, n_frames int, sample_rate int"


def attach_text_payloads(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Turn a text column into the multimodal schema (deterministic fake
    payloads = UTF-8 bytes; stands in for real media in tests/queries)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("text/plain")
    )


def repartition_for_payloads(
    df: DataFrame, target_mb: int = 128, size_col: str | None = None
) -> DataFrame:
    """Repartition so each partition holds ~target_mb of payload bytes.

    Estimates total bytes from ``length(payload)`` (cheap agg over a
    column-pruned scan) — at 100 TB the right number of partitions is a
    function of bytes, not rows, or a skewed media table OOMs executors."""
    size = (
        F.col(size_col)
        if size_col
        else F.length(F.col("payload")).cast("long")
    )
    total = df.agg(F.sum(size).alias("b")).first()["b"] or 0
    n = max(1, int(total / (target_mb * 1024 * 1024)) + 1)
    return df.repartition(n)


# ---------------------------------------------------------------------------
# Stubbed codec boundary
# ---------------------------------------------------------------------------
def _require_codec(kind: str) -> None:
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            f"STUB: {kind} decoding requires an image codec (PIL/pillow), "
            "which is not installed in this environment. The Spark-side "
            "plumbing (schema, mapInPandas batching, partitioning) is real; "
            "swap this guard for the codec call on a cluster image that "
            "ships one."
        ) from exc


def decode_image(df: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Decode image payloads to pixel arrays. STUBBED: raises unless a
    codec library is present (see module docstring)."""
    _require_codec("image")
    raise NotImplementedError("codec present but decode path not wired yet")


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:  # pragma: no cover - stub
    """Resize image payloads. STUBBED like ``decode_image``."""
    _require_codec("image")
    raise NotImplementedError("codec present but resize path not wired yet")


# ---------------------------------------------------------------------------
# Real byte-level feature extraction (no codec needed)
# ---------------------------------------------------------------------------
def byte_histogram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_bins: int = N_HIST_BINS,
) -> DataFrame:
    """(id, features array<double>): histogram of payload bytes mod n_bins.

    One ``mapInPandas`` pass; each Arrow batch becomes one numpy bincount
    per row (vectorized via frombuffer). Deterministic, codec-free, and
    recomputable in ANSI SQL — the q27 oracle does exactly that.
    """
    from dask_glm_spark.plans.layout import ensure_min_parallelism

    df = ensure_min_parallelism(df)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                np.bincount(
                    np.frombuffer(buf, dtype=np.uint8) % n_bins, minlength=n_bins
                ).astype(np.float64)
                for buf in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "features": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(op, schema=f"{id_col} long, features array<double>")


def waveform_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-row waveform features from raw little-endian int16 PCM payloads
    (the WAV data-chunk layout): n_samples, mean, rms, zero_crossings.

    No codec needed — raw PCM is just bytes — so unlike the stubbed
    decode_image path this is real end-to-end computation: one
    ``mapInPandas`` pass, ``np.frombuffer`` per row (zero-copy view),
    vectorized reductions. A trailing odd byte is ignored (torn sample).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ns, mean, rms, zc = [], [], [], []
            for buf in pdf[payload_col]:
                x = np.frombuffer(
                    buf[: len(buf) // 2 * 2], dtype="<i2"
                ).astype(np.float64)
                n = len(x)
                ns.append(n)
                if n == 0:
                    mean.append(0.0)
                    rms.append(0.0)
                    zc.append(0)
                    continue
                mean.append(float(x.mean()))
                rms.append(float(np.sqrt((x * x).mean())))
                zc.append(int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_samples": np.asarray(ns, dtype=np.int64),
                    "mean": np.asarray(mean, dtype=np.float64),
                    "rms": np.asarray(rms, dtype=np.float64),
                    "zero_crossings": np.asarray(zc, dtype=np.int64),
                }
            )

    from dask_glm_spark.plans.layout import ensure_min_parallelism

    return ensure_min_parallelism(df).mapInPandas(
        op,
        schema=(
            f"{id_col} long, n_samples long, mean double, rms double, "
            "zero_crossings long"
        ),
    )


def frame_sample_indices(
    df: DataFrame, every_n: int = 10, meta_col: str = "meta"
) -> DataFrame:
    """Frame indices 0, every_n, 2*every_n, ... per video row — metadata-only
    (no decode), as an ``array<int>`` column. The downstream decode of the
    selected frames is the stubbed codec step."""
    n_frames = F.col(f"{meta_col}.n_frames")
    return df.withColumn(
        "frame_indices",
        F.when(
            n_frames > 0,
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)),
        ).otherwise(F.array().cast("array<int>")),
    )
