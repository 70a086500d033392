"""Physical-plan audit helpers: make plan shape a *tested invariant*.

The engine's scale story rests on plan properties — column-pruned scans,
filter pushdown, partial+final aggregation with tiny exchanges, broadcast
joins for small sides, no shuffle of the feature table. ``.explain`` output
is the ground truth for all of them; these helpers parse it so tests (see
tests/test_plans.py) can fail when a code change silently regresses a plan
into an extra shuffle or a full-width scan — the 100 TB equivalent of a
correctness bug.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (same text ``df.explain`` prints)."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges).

    ``\\bExchange\\b`` alone is correct: ``BroadcastExchange`` and
    ``ReusedExchange`` have no word boundary before "Exchange", so neither
    matches. (An earlier version also subtracted the broadcast count — a
    double-subtraction that went negative on broadcast-only plans.)"""
    plan = explain_str(df, "simple")
    return len(re.findall(r"\bExchange\b", plan))


def has_broadcast(df: DataFrame) -> bool:
    plan = explain_str(df, "simple")
    return "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def _balanced_span(text: str, start: int, open_ch: str, close_ch: str) -> str:
    """Contents of the bracket pair opening at ``start`` (which must point
    at ``open_ch``), honoring nesting — a lazy regex stopped at the FIRST
    closer and silently truncated nested types/filters (review r5)."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == open_ch:
            depth += 1
        elif text[i] == close_ch:
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
    return text[start + 1 :]


def _split_top_level(s: str) -> list[str]:
    """Split on commas at nesting depth 0 (brackets of any kind)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "<([":
            depth += 1
        elif ch in ">)]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [x.strip() for x in out if x.strip()]


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each parquet scan's ReadSchema (pruning evidence).
    Bracket-balanced: columns AFTER a nested type (array/map/struct field)
    are included — the old regex stopped at the first '>' and a widened
    scan could hide behind an array column."""
    plan = explain_str(df, "formatted")
    out = []
    for m in re.finditer(r"ReadSchema: struct", plan):
        body = _balanced_span(plan, m.end(), "<", ">")
        out.append([f.split(":")[0].strip() for f in _split_top_level(body)])
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters reaching the scan (PushedFilters entries, flattened).
    Bracket-balanced: In(...) value lists and compound predicates stay
    whole instead of being shredded at inner brackets/commas."""
    plan = explain_str(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: ", plan):
        body = _balanced_span(plan, m.end(), "[", "]")
        out.extend(_split_top_level(body))
    return out


def codegen_spans(df: DataFrame) -> int:
    """Number of whole-stage codegen spans (wider = fewer interpreter
    boundaries in the hot path)."""
    plan = explain_str(df, "formatted")
    ids = set(re.findall(r"\[codegen id : (\d+)\]", plan))
    return len(ids)


def assert_narrow(df: DataFrame) -> None:
    """Raise if the plan contains any shuffle — for operators documented as
    pure narrow maps over the scan."""
    n = count_exchanges(df)
    if n:
        raise AssertionError(
            f"expected a narrow plan, found {n} exchange(s):\n{explain_str(df, 'simple')}"
        )
