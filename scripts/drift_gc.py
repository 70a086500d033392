#!/usr/bin/env python
"""Drift root-cause probe: which primitive slows with session age, and
does a forced JVM GC (ContextCleaner purge) restore it?

session_drift.py established: fit_admm_l2 7.75 -> 36.9 s across query
chunks while the trivial-job floor stays ~110 ms flat. This probe times
the fit's component primitives at each phase and injects System.gc()
to test the uncollected-blocks/broadcasts hypothesis.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import numpy as np

    from dask_glm_spark.session import get_spark
    from dask_glm_spark.sources.glm_source import load_glm_fast
    from dask_glm_spark.operators.estimators import LogisticRegression

    spark = get_spark(app_name="drift_gc")
    sc = spark.sparkContext
    jvm = sc._jvm

    def t(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

    def primitives() -> dict:
        out = {}
        out["scan_count"] = t(lambda: load_glm_fast(spark, sf_dir).count())

        def persist_cycle():
            d = load_glm_fast(spark, sf_dir).persist()
            d.count()
            d.unpersist()
        out["persist_cycle"] = t(persist_cycle)

        def bcast():
            b = sc.broadcast(np.zeros(4))
            b.unpersist(False)
        out["broadcast"] = t(bcast)

        def rdd_cycle():
            r = sc.parallelize(range(64), 32).map(lambda x: x + 1)
            r = r.persist()
            r.count()
            r.unpersist(False)
        out["rdd_persist_count"] = t(rdd_cycle)
        out["arrow_job"] = t(
            lambda: spark.range(64).repartition(32)
            .mapInArrow(lambda it: it, "id long").count()
        )
        out["floor"] = t(lambda: spark.range(1).count())
        out["n_cached_rdds"] = len(sc._jsc.sc().getRDDStorageInfo())
        mem = jvm.java.lang.management.ManagementFactory.getMemoryMXBean().getHeapMemoryUsage()
        out["heap_used_mb"] = round(mem.getUsed() / 2**20)
        return out

    def fit_s() -> float:
        return t(lambda: LogisticRegression(
            solver="admm", regularizer="l2", fit_intercept=False, max_iter=10
        ).fit(load_glm_fast(spark, sf_dir)))

    def snap(tag: str) -> None:
        d = {"tag": tag, "fit_s": fit_s()}
        d.update(primitives())
        print(json.dumps(d), flush=True)

    # bench-identical warmups
    df = load_glm_fast(spark, sf_dir)
    df.count()
    spark.range(32).repartition(32).mapInArrow(lambda it: it, "id long").count()
    warm = df.limit(20_000)
    LogisticRegression(
        solver="admm", regularizer="l2", fit_intercept=False, max_iter=2
    ).fit(warm)
    LogisticRegression(solver="lbfgs", regularizer=None, max_iter=3).fit(warm)

    import __spark_entry__ as e

    qs = e.queries()
    names = sorted(qs)
    noop = {"q30_simhash_pairs", "q31_tfidf"}

    snap("warm")
    for name in names:
        try:
            d = qs[name](spark, sf_dir)
            if name in noop:
                d.write.format("noop").mode("overwrite").save()
            else:
                d.collect()
        except Exception as ex:  # pragma: no cover
            print(f"# {name} failed: {ex}", file=sys.stderr, flush=True)
    spark.catalog.clearCache()
    snap("polluted")
    jvm.System.gc()
    time.sleep(3)
    jvm.System.gc()
    time.sleep(3)
    snap("after_gc")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
