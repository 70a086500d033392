"""Streaming as-of enrichment: each event joins the most recent reference
row for its key — the stream twin of ``operators/joins.asof_join``
(backward direction).

The classic "enrich clicks with the user's latest profile/model/price"
pattern. Spark's built-in stream-stream join buffers BOTH sides within a
time range; for as-of semantics the right side only ever needs its LATEST
row per key, so ``applyInPandasWithState`` keeps exactly (latest_ts,
payload) per key in the state store — state is |keys|, not |events|,
regardless of stream length.

Input is ONE stream with a ``side`` column ('r' = reference updates,
'l' = events to enrich) — the caller unions the two sources with
``unionByName(allowMissingColumns=True)`` (same trick the batch as-of
uses internally). Within a microbatch, rows process in (ts, side) order
with 'r' before 'l' at equal timestamps — matching the batch tie rule
(include the right row at ts == event ts).

Disorder contract (inherent to unbuffered streaming): an event is matched
against the newest reference row with ts <= event.ts **among those seen
so far**; a reference row arriving AFTER an already-emitted event cannot
retro-enrich it. Batch parity over an in-order stream is pytest-pinned;
the operator keeps the two newest reference rows per key so an event
arriving one microbatch late (between the two) still matches exactly.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "ts0 long, p0 string, ts1 long, p1 string"


def asof_enrich_stream(
    tagged: DataFrame,
    value_cols: list[str],
    time_col: str = "ts",
    by: str = "user_id",
    id_col: str = "event_id",
    suffix: str = "_asof",
) -> DataFrame:
    """Enrich side='l' rows with the latest side='r' payload at-or-before
    their ``time_col``; unmatched events keep NULLs (left semantics).

    Output: (id_col, by, time_col, *[c + suffix for value_cols]).
    Payloads ride the state store as JSON strings (state schemas are
    flat); values are parsed back to their column types by the output
    schema cast.
    """
    # id/key types ride through generically (the multimodal id-type lesson,
    # ADVICE r5) — string event ids / keys work unchanged
    id_type = tagged.schema[id_col].dataType.simpleString()
    by_type = tagged.schema[by].dataType.simpleString()
    out_fields = ", ".join(f"{c}{suffix} string" for c in value_cols)
    schema = (
        f"{id_col} {id_type}, {by} {by_type}, {time_col} timestamp, {out_fields}"
    )

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        # Absence is marked by p == "" (json.dumps never returns ""), NOT
        # by a ts sentinel: comparing against -1 silently refused to store
        # or match pre-epoch (negative-micros) timestamps, diverging from
        # the batch asof_join which handles arbitrary ts (ADVICE r6).
        if state.exists:
            ts0, p0, ts1, p1 = state.get
        else:
            ts0, p0, ts1, p1 = 0, "", 0, ""
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((ts0, p0, ts1, p1))
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        # 'r' processes BEFORE 'l' at equal ts (explicit 0/1 key — plain
        # lexicographic 'l' < 'r' would invert it), so a same-instant
        # reference update is included — the batch as-of tie rule
        pdf = pdf.assign(_s=(pdf["side"] != "r").astype(int)).sort_values(
            [time_col, "_s"], kind="mergesort"
        )
        out_rows: list[tuple] = []
        for row in pdf.itertuples(index=False):
            ts_us = int(getattr(row, time_col).value // 1000)  # ns -> us
            if row.side == "r":
                payload = json.dumps(
                    {c: getattr(row, c) for c in value_cols}, default=str
                )
                if p1 == "" or ts_us >= ts1:
                    ts0, p0, ts1, p1 = ts1, p1, ts_us, payload
                elif p0 == "" or ts_us >= ts0:
                    ts0, p0 = ts_us, payload
                continue
            # event: newest reference at-or-before
            if p1 != "" and ts_us >= ts1:
                chosen = p1
            elif p0 != "" and ts_us >= ts0:
                chosen = p0
            else:
                chosen = None
            vals = (
                json.loads(chosen)
                if chosen
                else {c: None for c in value_cols}
            )
            out_rows.append(
                (
                    getattr(row, id_col),
                    key_val,
                    getattr(row, time_col),
                    *[
                        None if vals[c] is None else str(vals[c])
                        for c in value_cols
                    ],
                )
            )
        state.update((ts0, p0, ts1, p1))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[id_col, by, time_col]
                + [f"{c}{suffix}" for c in value_cols],
            )

    return tagged.groupBy(by).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
