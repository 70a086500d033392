"""10x full-gate scale run (round 8, VERDICT r7 #5): execute ALL
declared queries once at sf0.1 and once at an sf1-equivalent directory
(facts x10, dims kept — TPC-H convention), and print the wall table for
SURVEY. The earlier 10x probe (scale_probe.py) covers ~12 operators;
this catches a scale cliff hiding in a query the probe doesn't reach
(q31, q39, q41, q48, ...).

How the 10x corpus is manufactured (no sf1 testdata exists):

- fact tables (lineitem, orders, events, documents, embeddings) are
  unioned 10x with REMAPPED keys (copy k shifts ids by k*10^12, and
  events grows user cardinality 10x rather than deepening each user);
- copy k>0 of ``documents.text`` gets a deterministic PER-DOC word
  permutation (sort by xxhash64(word, doc_id, k)): token counts,
  language markers and quality stats keep their distribution, but
  shingles decorrelate, so near-dup density stays ~1x and the dedup
  queries measure engine scaling instead of a by-construction quadratic
  pair blowup (the r6/r7 union probes' 965x artifact). The sort key
  MUST include doc_id: a per-copy-only key canonicalizes word order,
  which makes same-vocabulary docs within a copy collide into
  hundreds-deep minhash buckets (measured: 3.36M candidate pairs vs the
  true ~2.6k — the first draft of this builder did exactly that);
- copy k>0 of ``embeddings.embedding`` is hash-random (cosine ~0 across
  copies) for the same reason;
- dimension tables (region, nation, customer, supplier, part) are
  copied verbatim once.

Timing protocol (bench.py's): warm each query at sf0.001 first (Janino
plan-shape compile), clearCache between queries, q30/q31 materialize
via the noop sink. One sample per (query, scale) — this is a cliff
finder, not a benchmark; re-measure any outlier in isolation before
believing it.

Run:  python examples/full_gate_scale.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]
OFFSET = 10**12
NOOP = {"q30_simhash_pairs", "q31_tfidf"}


def build_10x(spark, sf_dir: str, out_dir: str) -> None:
    from functools import reduce

    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")
    for t, keys in FACT_KEYS.items():
        base = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        copies = []
        for k in range(10):
            c = base
            for key in keys:
                c = c.withColumn(key, F.col(key) + F.lit(k * OFFSET))
            if t == "documents" and k > 0:
                toks = F.split(F.col("text"), " ")
                perm = F.transform(
                    F.array_sort(
                        F.transform(
                            toks,
                            lambda x: F.struct(
                                F.xxhash64(
                                    x, F.col("doc_id"), F.lit(k)
                                ).alias("h"),
                                x.alias("w"),
                            ),
                        )
                    ),
                    lambda s: s["w"],
                )
                c = c.withColumn(
                    "text",
                    F.when(
                        F.col("text").isNotNull(), F.array_join(perm, " ")
                    ).otherwise(F.col("text")),
                )
            if t == "embeddings" and k > 0:
                d = F.size(F.col("embedding"))
                rnd = F.transform(
                    F.sequence(F.lit(0), d - 1),
                    lambda i: (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), i, F.lit(k)),
                            F.lit(1_000_000),
                        )
                        / 1_000_000.0
                        - 0.5
                    ).cast("float"),
                )
                c = c.withColumn(
                    "embedding",
                    F.when(F.col("embedding").isNotNull(), rnd).otherwise(
                        F.col("embedding")
                    ),
                )
            copies.append(c)
        reduce(lambda a, b: a.unionByName(b), copies).repartition(
            64
        ).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def main(sf_dir: str = "/root/testdata/sf0.1", workdir: str | None = None):
    import __spark_entry__ as e
    from dask_glm_spark.session import get_spark

    workdir = workdir or tempfile.mkdtemp(prefix="dask_glm_spark_gate10x_")
    big_dir = os.path.join(workdir, "sf1ish")
    spark = get_spark(app_name="full_gate_scale")
    t0 = time.perf_counter()
    build_10x(spark, sf_dir, big_dir)
    print(f"-- built 10x dir in {time.perf_counter() - t0:.1f}s: {big_dir}")

    qs = e.queries()

    def run(name: str, d: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, d)
        if name in NOOP:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
        return time.perf_counter() - t0

    rows = []
    for name in sorted(qs):
        try:
            run(name, "/root/testdata/sf0.001")  # warm: compile plan shape
            spark.catalog.clearCache()
            w1 = run(name, sf_dir)
            spark.catalog.clearCache()
            w10 = run(name, big_dir)
            spark.catalog.clearCache()
            rows.append((name, w1, w10, w10 / max(w1, 1e-9)))
            print(f"{name:28s} 1x={w1:7.2f}s  10x={w10:8.2f}s  ({w10 / max(w1, 1e-9):5.2f}x)")
        except Exception as exc:  # noqa: BLE001 - probe harness
            rows.append((name, -1.0, -1.0, -1.0))
            print(f"{name:28s} FAILED: {type(exc).__name__}: {exc}"[:200])

    print("\n| query | 1x (s) | 10x (s) | ratio |")
    print("|---|---|---|---|")
    for name, w1, w10, r in rows:
        print(f"| {name} | {w1:.2f} | {w10:.2f} | {r:.2f}x |")
    bad = [x for x in rows if x[3] > 3.0 and x[1] > 0.5]
    print(f"\n>3x outliers (with 1x > 0.5s): {[x[0] for x in bad] or 'none'}")
    return rows


if __name__ == "__main__":
    main(*sys.argv[1:])
