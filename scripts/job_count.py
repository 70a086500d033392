#!/usr/bin/env python
"""Per-key Spark JOB counter (guide §1: measure first).

On a latency-floor box wall-clock ≈ (sequential job count) × (per-job
floor), so the job count is the structural metric an optimization round
must move. Runs each key once to warm (plan compile, python workers),
then once inside a job group and prints how many Spark jobs the key
launched.

Usage:
    python scripts/job_count.py q48_solver_steps q45_lsh_buckets
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/job_count.py ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    keys = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from dask_glm_spark.session import get_spark

    spark = get_spark(app_name="job_count")
    sc = spark.sparkContext

    import __spark_entry__ as e

    qs = e.queries()
    noop_materialize = {"q30_simhash_pairs", "q31_tfidf"}

    def run_query(name: str) -> None:
        df_q = qs[name](spark, sf_dir)
        if name in noop_materialize:
            df_q.write.format("noop").mode("overwrite").save()
        else:
            df_q.collect()

    for key in keys:
        if key not in qs:
            print(f"KEY {key} UNKNOWN", flush=True)
            continue
        try:
            run_query(key)  # warm: plan compile + workers
        except Exception as ex:  # pragma: no cover - probe tool
            print(f"KEY {key} WARM-FAIL {ex}", flush=True)
            continue
        spark.catalog.clearCache()
        group = f"probe-{key}"
        sc.setJobGroup(group, key)
        run_query(key)
        sc.setJobGroup(None, None)
        spark.catalog.clearCache()
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        print(f"KEY {key} jobs={len(jobs)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
