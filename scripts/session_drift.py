#!/usr/bin/env python
"""Session-age drift probe (guide §1: measure first; VERDICT r13 wrong-#3).

bench.py's end-of-run fit_admm_l2_retime reads far above the up-front
min (57.8 vs 11.4 s at the r14 round start). Is that (a) session-age
drift — something accumulating in the driver/JVM across ~60 keys — or
(b) host weather at the moment of the single retime sample?

Protocol: alternate [fit timing, floor probe, GC/heap/RSS snapshot]
with chunks of declared queries. Drift shows as a monotone rise with
chunk count; weather shows as uncorrelated scatter. Prints one JSON
line per checkpoint.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dask_glm_spark.session import get_spark
    from dask_glm_spark.sources.glm_source import load_glm_fast
    from dask_glm_spark.operators.estimators import LogisticRegression

    spark = get_spark(app_name="session_drift")
    sc = spark.sparkContext
    jvm = sc._jvm

    def gc_stats() -> tuple[float, float, float]:
        """(gc_seconds_total, heap_used_mb, heap_committed_mb)."""
        beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        gc_ms = sum(b.getCollectionTime() for b in beans)
        mem = jvm.java.lang.management.ManagementFactory.getMemoryMXBean().getHeapMemoryUsage()
        return gc_ms / 1e3, mem.getUsed() / 2**20, mem.getCommitted() / 2**20

    def floor_ms(n: int = 8) -> float:
        """Median latency of a trivial warm 1-partition JVM job."""
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            spark.range(1).count()
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        return round(ts[len(ts) // 2], 1)

    def fit_s() -> float:
        t0 = time.perf_counter()
        LogisticRegression(
            solver="admm", regularizer="l2", fit_intercept=False, max_iter=10
        ).fit(load_glm_fast(spark, sf_dir))
        return round(time.perf_counter() - t0, 2)

    def snap(tag: str, fit: float | None) -> None:
        gc_s, used, comm = gc_stats()
        print(json.dumps({
            "tag": tag,
            "fit_s": fit,
            "floor_ms": floor_ms(),
            "gc_s": round(gc_s, 2),
            "heap_used_mb": round(used),
            "heap_comm_mb": round(comm),
            "py_rss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024,
            "t": round(time.perf_counter() - T0, 1),
        }), flush=True)

    T0 = time.perf_counter()
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

    snap("warm", fit_s())
    chunks = [names[i::4] for i in range(4)]  # 4 interleaved chunks
    for ci, chunk in enumerate(chunks):
        for name in chunk:
            try:
                d = qs[name](spark, sf_dir)
                if name in noop:
                    d.write.format("noop").mode("overwrite").save()
                else:
                    d.collect()
            except Exception as ex:  # pragma: no cover - probe
                print(f"# {name} failed: {ex}", file=sys.stderr, flush=True)
        spark.catalog.clearCache()
        snap(f"after_chunk{ci}", fit_s())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
