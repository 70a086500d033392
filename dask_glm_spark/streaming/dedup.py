"""Streaming exact deduplication with bounded state.

The streaming face of ``operators/dedup.exact_dedup``: keep the FIRST
arrival of each key tuple in an unbounded stream. Naive
``dropDuplicates`` on a stream grows its state forever (every key ever
seen); ``dedup_stream`` uses ``dropDuplicatesWithinWatermark`` so the
state store only holds keys younger than the watermark delay — at
100 TB/day the state is bounded by (keys per delay window), not stream
lifetime. Duplicates arriving later than ``delay`` after the original are
NOT suppressed — that is the documented trade-off of bounded state; set
``delay`` to the pipeline's real out-of-orderness bound (and let the
batch ``exact_dedup`` sweep the sink for late stragglers if needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    cols: list[str],
    ts_col: str = "ts",
    delay: str = "30 minutes",
) -> DataFrame:
    """First-arrival-wins streaming dedup on ``cols``.

    Emits each distinct ``cols`` tuple once (append mode); a duplicate is
    dropped iff it arrives within ``delay`` (event time) of the retained
    row still being in state. Works identically under ``availableNow``
    backfills and continuous micro-batches.
    """
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(cols)
