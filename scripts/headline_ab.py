"""One fresh-process headline sample: the bench's exact fit_admm_l2
measurement (same warm-up, same config) against the repo root given as
argv[1] — used by the round-13 A/B attributing the BENCH_r12 headline
swing (4.104 -> 5.43 s on identical code; its own retime improved).

Usage: python scripts/headline_ab.py /path/to/repo-root
Prints one line: SAMPLE_SEC <seconds>
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    root = os.path.abspath(sys.argv[1])
    sys.path.insert(0, root)
    from dask_glm_spark.session import get_spark
    from dask_glm_spark.sources.glm_source import load_glm_fast
    from dask_glm_spark.operators.estimators import LogisticRegression

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="headline_ab")
    # bench.py's exact warm-up: page cache + Arrow worker pool + Janino
    # plan-shape compile, so the timed fit measures steady state
    df = load_glm_fast(spark, sf_dir)
    df.count()
    spark.range(32).repartition(32).mapInArrow(lambda it: it, "id long").count()
    warm = df.limit(20_000)
    LogisticRegression(
        solver="admm", regularizer="l2", fit_intercept=False, max_iter=2
    ).fit(warm)

    t0 = time.perf_counter()
    LogisticRegression(
        solver="admm", regularizer="l2", fit_intercept=False, max_iter=10
    ).fit(load_glm_fast(spark, sf_dir))
    dt = time.perf_counter() - t0
    print(f"SAMPLE_SEC {dt:.3f}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
