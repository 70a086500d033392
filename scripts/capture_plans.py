#!/usr/bin/env python
"""Capture .explain('formatted') output for declared queries.

Usage: python scripts/capture_plans.py <outdir> [query ...]
Defaults to every declared query at sf0.1. Queries that perform eager
work inside the builder (q45 recall contracts, q46 kmeans, q48 solver
steps) still produce a plan for their RETURNED frame; the eager kernel
jobs are separate (their shapes are captured by the kernel probes in
examples/). Plans are captured lazily -- no query is executed.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1]
    wanted = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as e
    from dask_glm_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    qs = e.queries()
    names = wanted or sorted(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - capture harness
            text = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(text)
        n_ex = text.count("Exchange")
        print(f"{name:28s} exchanges={n_ex} bytes={len(text)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
