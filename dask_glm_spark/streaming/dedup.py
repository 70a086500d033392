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

import os

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


def dedup_stream_incremental(
    stream_df: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
):
    """Streaming exact dedup with an UNBOUNDED horizon — the foreachBatch
    face of ``operators/dedup.exact_dedup_incremental``. Where
    ``dedup_stream`` bounds state with a watermark (and therefore forgets
    keys older than the delay), this sink keeps the full fingerprint
    index in parquet: a duplicate is suppressed no matter how late it
    arrives, and state is one fp row per distinct document ever kept —
    the smallest exact memory, off-heap, shared across restarts.

    Exactly-once without transactions: every epoch writes to
    epoch-addressed directories (``out_dir/epoch-N`` survivors,
    ``state_dir/epoch-N`` their fingerprints) and anti-joins ONLY the
    fingerprints of epochs < N. A replayed epoch therefore re-derives the
    identical survivor set (its own half-written state is excluded from
    the anti-join) and mode="overwrite" republishes it — idempotent, the
    tar-shard-sink convention. Read the deduped corpus back with
    ``spark.read.parquet(f"{out_dir}/epoch-*")``.

    At 100 TB: the index is fingerprints only (text never lands in
    state); compact ``state_dir`` offline into a bucketed table
    (``joins.write_bucketed``) when epoch-file counts grow — the
    anti-join is a plain equi-join either way."""
    from dask_glm_spark.operators.dedup import exact_dedup_incremental
    from dask_glm_spark.operators.text import fingerprint_fast_expr

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        eid = int(epoch_id)
        prior = sorted(
            os.path.join(state_dir, d)
            for d in (os.listdir(state_dir) if os.path.isdir(state_dir) else [])
            if d.startswith("epoch-") and int(d.split("-")[1]) < eid
        )
        seen = spark.read.parquet(*prior) if prior else None
        survivors, _ = exact_dedup_incremental(
            batch_df, seen, text_col=text_col, id_col=id_col
        )
        survivors = survivors.localCheckpoint()  # one derivation, two writes
        survivors.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch-{eid:06d}")
        )
        survivors.select(
            fingerprint_fast_expr(text_col).alias("fp")
        ).distinct().write.mode("overwrite").parquet(
            os.path.join(state_dir, f"epoch-{eid:06d}")
        )

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def simhash_stream_incremental(
    stream_df: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
):
    """Streaming SimHash near-dedup with an unbounded horizon — the
    foreachBatch face of ``operators/dedup.simhash_dedup_incremental``
    (round 10, VERDICT r9 #7: the third and last incremental dedup
    variant to get a streaming face; exact and MinHash are
    ``dedup_stream_incremental`` / ``neardup_stream_incremental``).

    Same epoch-addressed exactly-once discipline: survivors land in
    ``out_dir/epoch-N``, index ADDITIONS in ``state_dir/epoch-N``, and
    the batch anti-joins only epochs < N, so a replayed epoch re-derives
    the identical survivor set and ``mode="overwrite"`` republishes it.

    Index schema (pinned): ``(doc_id, simhash bigint)`` — ONE long per
    kept doc, the cheapest near-dup state of the three variants. The
    cross-batch check is EXACT hamming (the simhash IS the similarity
    state), candidates from the pigeonhole band equi-join. At 100 TB the
    state table is 16 bytes/doc; compact epoch files offline when file
    counts grow."""
    from dask_glm_spark.operators.dedup import simhash_dedup_incremental

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        eid = int(epoch_id)
        prior = sorted(
            os.path.join(state_dir, d)
            for d in (os.listdir(state_dir) if os.path.isdir(state_dir) else [])
            if d.startswith("epoch-") and int(d.split("-")[1]) < eid
        )
        seen = spark.read.parquet(*prior) if prior else None
        survivors, updated = simhash_dedup_incremental(
            batch_df, seen, max_hamming=max_hamming,
            text_col=text_col, id_col=id_col,
        )
        survivors = survivors.localCheckpoint()  # one derivation, two reads
        survivors.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch-{eid:06d}")
        )
        # full-row anti-join, not a doc_id semi-join (ADVICE r9 — see
        # neardup_stream_incremental): additions are exactly this
        # epoch's new (doc_id, simhash) rows even under id reuse
        additions = (
            updated
            if seen is None
            else updated.join(seen, list(updated.columns), "left_anti")
        )
        additions.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"epoch-{eid:06d}")
        )

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def neardup_stream_incremental(
    stream_df: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
):
    """Streaming NEAR-dedup with an unbounded horizon — the foreachBatch
    face of ``operators/dedup.minhash_dedup_incremental`` (round 9,
    VERDICT r8 #4), the MinHash companion to ``dedup_stream_incremental``.

    Same epoch-addressed exactly-once discipline as the exact variant:
    every epoch writes survivors to ``out_dir/epoch-N`` and its index
    ADDITIONS to ``state_dir/epoch-N``; the batch anti-joins only epochs
    < N, so a replayed epoch re-derives the identical survivor set and
    ``mode="overwrite"`` republishes it.

    Index schema (one row per KEPT doc, ~200 bytes, never text):

    - ``doc_id``: the kept doc's id (the input ``id_col``, renamed)
    - ``sig array<int>``: the NUM_PERM MinHash signature
    - ``bands array<bigint>``: the banded-LSH keys of ``sig``

    Semantics per epoch (from ``minhash_dedup_incremental``): a new doc
    whose banded candidates against the index include an estimated
    Jaccard >= ``threshold`` is dropped (estimator-based by design — the
    index keeps no text); intra-epoch near-dups resolve with the exact
    verified pipeline + connected-component survivors. At 100 TB the
    state is a plain parquet table of signatures — compact epoch files
    offline into a band-bucketed table when file counts grow."""
    from dask_glm_spark.operators.dedup import minhash_dedup_incremental

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        eid = int(epoch_id)
        prior = sorted(
            os.path.join(state_dir, d)
            for d in (os.listdir(state_dir) if os.path.isdir(state_dir) else [])
            if d.startswith("epoch-") and int(d.split("-")[1]) < eid
        )
        seen = spark.read.parquet(*prior) if prior else None
        survivors, updated = minhash_dedup_incremental(
            batch_df, seen, threshold=threshold,
            text_col=text_col, id_col=id_col,
        )
        survivors = survivors.localCheckpoint()  # one derivation, two reads
        survivors.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch-{eid:06d}")
        )
        # State additions = the updated index MINUS the prior epochs'
        # rows, anti-joined on ALL columns (ADVICE r9): a doc_id-only
        # semi-join against this epoch's survivors re-wrote the PRIOR
        # epoch's index row whenever an id was reused across epochs and
        # survived again (duplicating signatures in state forever). The
        # full-row anti-join emits exactly this epoch's new signature
        # rows — id reuse with a changed doc adds its new signature and
        # leaves the old epoch's row where it already lives.
        additions = (
            updated
            if seen is None
            else updated.join(seen, list(updated.columns), "left_anti")
        )
        additions.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"epoch-{eid:06d}")
        )

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
