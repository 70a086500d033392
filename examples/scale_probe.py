"""sf1-equivalent scale probe: does the per-iteration contract hold at 10x?

The solver scale story says per-iteration cluster cost is one narrow scan
plus O(p) bytes per partition — so wall time per iteration should grow
(sub-)linearly in rows and the fit should never hit a super-linear cliff.
No sf1 testdata directory exists, so this probe manufactures a 10x frame
by unioning the sf0.1 glm projection with itself (10 copies, repartitioned
to spread them), writes it to a local parquet once, and times:

1. one fused loss+gradient kernel scan at 1x vs 10x,
2. an ADMM fit (10 rounds) at 1x vs 10x,
3. an L-BFGS fit (10 iterations) at 1x vs 10x.

Run:  python examples/scale_probe.py [sf_dir] [workdir]
Results from the local[32] container are recorded in SURVEY.md §9.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.1", workdir: str | None = None):
    from functools import reduce

    from dask_glm_spark.functions import kernels
    from dask_glm_spark.functions.families import Logistic
    from dask_glm_spark.operators.estimators import LogisticRegression
    from dask_glm_spark.session import get_spark
    from dask_glm_spark.sources.glm_source import load_glm_fast

    workdir = workdir or tempfile.mkdtemp(prefix="dask_glm_spark_sf1_")
    spark = get_spark(app_name="scale_probe")

    # Pipeline probes run FIRST: the 10x solver fits leave the JVM old
    # gen full of dead 48-MB numpy block pickles, and the resulting GC
    # thrash polluted the pipeline numbers when they ran second (round 6:
    # repetition_stats read 37x in-session vs its true 3.2x fresh).
    pipe = pipeline_probe(spark, sf_dir, workdir)

    base = load_glm_fast(spark, sf_dir)
    n1 = base.count()

    big_path = f"{workdir}/glm_10x.parquet"
    reduce(lambda a, b: a.unionAll(b), [base] * 10).repartition(64).write.mode(
        "overwrite"
    ).parquet(big_path)
    big = spark.read.parquet(big_path)
    n10 = big.count()
    print(f"rows: 1x={n1} 10x={n10}")

    beta = np.array([0.1, -0.2, 0.3, 0.05])
    out = {}
    for tag, df in (("1x", base), ("10x", big)):
        # warm the scan, then time the fused kernel twice and keep the min
        kernels.loss_gradient(df, Logistic, beta, 4)
        t = []
        for _ in range(2):
            t0 = time.perf_counter()
            kernels.loss_gradient(df, Logistic, beta, 4)
            t.append(time.perf_counter() - t0)
        out[f"kernel_{tag}"] = round(min(t), 3)

        t0 = time.perf_counter()
        LogisticRegression(
            solver="admm", regularizer="l2", fit_intercept=False, max_iter=10
        ).fit(df)
        out[f"admm_{tag}"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        LogisticRegression(
            solver="lbfgs", regularizer=None, fit_intercept=False, max_iter=10
        ).fit(df)
        out[f"lbfgs_{tag}"] = round(time.perf_counter() - t0, 3)

        # round-10 extension surface: the weighted fit must scale exactly
        # like the plain fit (same scans, one extra Arrow column)
        from pyspark.sql import functions as F

        dfw = df.withColumn(
            "w", (F.abs(F.hash("label")) % 3 + 1).cast("double")
        )
        t0 = time.perf_counter()
        LogisticRegression(
            solver="lbfgs", regularizer=None, fit_intercept=False,
            max_iter=10, weight_col="w",
        ).fit(dfw)
        out[f"wlbfgs_{tag}"] = round(time.perf_counter() - t0, 3)

    for k in ("kernel", "admm", "lbfgs", "wlbfgs"):
        r = out[f"{k}_10x"] / out[f"{k}_1x"]
        print(f"{k}: 1x={out[f'{k}_1x']}s 10x={out[f'{k}_10x']}s ratio={r:.2f}x")
    out.update(pipe)
    return out


def pipeline_probe(spark, sf_dir: str, workdir: str):
    """10x probe for the pipeline operators (VERDICT r4 #6): tfidf,
    repetition_stats, minhash_dedup_pairs, connected_components.

    The 10x corpus is 10 copies of the documents table with offset doc_ids
    and a distinct per-copy marker prepended to the text. Copies of the
    same doc are genuine near-duplicates, so the minhash probe's PAIR
    OUTPUT grows faster than 10x by construction (that's the data, not
    the engine); its wall ratio is reported alongside the pair counts —
    what the probe checks there is that the bucket-cap machinery keeps
    the candidate stage bounded under pathological duplication. The
    components probe scales a disjoint chain graph (10 copies = 10x
    nodes/edges, same structure), so its ratio is a clean engine signal.
    """
    import time

    from functools import reduce

    from pyspark.sql import functions as F

    from dask_glm_spark.operators.dedup import minhash_dedup_pairs
    from dask_glm_spark.operators.graph import connected_components
    from dask_glm_spark.operators.quality import (
        repetition_stats,
        strip_duplicated_spans,
    )
    from dask_glm_spark.operators.text import tfidf_features
    from dask_glm_spark.sources.glm_source import load_table

    docs1 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = [
        docs1.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.lit(f"c{i} "), F.col("text")).alias("text"),
        )
        for i in range(10)
    ]
    docs10_path = f"{workdir}/docs_10x.parquet"
    reduce(lambda a, b: a.unionAll(b), copies).repartition(32).write.mode(
        "overwrite"
    ).parquet(docs10_path)
    docs10 = spark.read.parquet(docs10_path)
    print(f"docs: 1x={docs1.count()} 10x={docs10.count()}")

    def timed_noop(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warm pass on a tiny slice: whole-stage-codegen classes compile once
    # per plan SHAPE — without this the 1x run absorbs all the Janino
    # time and the 10x/1x ratio reads as compiler cost, not data scaling.
    warm = docs1.limit(50).cache()
    warm.count()
    timed_noop(tfidf_features(warm, num_features=64))
    timed_noop(repetition_stats(warm))
    timed_noop(strip_duplicated_spans(warm, w=16))
    minhash_dedup_pairs(warm, threshold=0.8).count()
    wids = warm.select(F.col("doc_id").alias("id_a"))
    connected_components(
        wids.withColumn("id_b", F.col("id_a") + 1).where((F.col("id_a") % 10) != 9)
    ).count()
    # hub probe has a different plan shape (chain ∪ spokes) — warm it too,
    # or the 1x hub run absorbs the Janino compile and reads slower than 10x
    connected_components(
        wids.withColumn("id_b", F.col("id_a") + 1)
        .where((F.col("id_a") % 10) != 9)
        .union(
            wids.where((F.col("id_a") % 7) < 3).select(
                F.lit(0).cast("long").alias("id_a"), F.col("id_a").alias("id_b")
            )
        ),
        local_threshold=0,
    ).count()
    warm.unpersist()
    spark.catalog.clearCache()

    out = {}
    for tag, d in (("1x", docs1), ("10x", docs10)):
        out[f"tfidf_{tag}"] = round(timed_noop(tfidf_features(d, num_features=64)), 3)
        spark.catalog.clearCache()
        out[f"repetition_{tag}"] = round(timed_noop(repetition_stats(d)), 3)
        # span dedup under pathological duplication: the 10x copies differ
        # only in their prepended marker, so aligned windows past the first
        # stride are shared by all 10 copies — unlike minhash PAIRS, the
        # dup-span output is LINEAR in corpus size (first-occurrence is a
        # map-side min-struct aggregate, never an all-pairs join)
        out[f"spans_{tag}"] = round(
            timed_noop(strip_duplicated_spans(d, w=16)), 3
        )
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        npairs = minhash_dedup_pairs(d, threshold=0.8).count()
        out[f"minhash_{tag}"] = round(time.perf_counter() - t0, 3)
        out[f"minhash_pairs_{tag}"] = npairs
        spark.catalog.clearCache()
        # disjoint chain graph per copy: same structure, 1x vs 10x size
        ids = d.select(F.col("doc_id").alias("id_a"))
        edges = ids.withColumn("id_b", F.col("id_a") + 1).where(
            (F.col("id_a") % 100) != 99
        )
        t0 = time.perf_counter()
        ncomp = connected_components(edges).select("component").distinct().count()
        out[f"components_{tag}"] = round(time.perf_counter() - t0, 3)
        out[f"components_n_{tag}"] = ncomp
        spark.catalog.clearCache()
        # power-law hub graph (VERDICT r6 #6): chain backbone + one hub
        # node in ~30% of edges. The hub is a hot JOIN KEY in the star
        # rounds' min-agg + join-back; partial aggregation absorbs the
        # min-agg and AQE skew-split the join, so the ratio should stay
        # near the chain graph's — a single-task blowup would read >>10x.
        # local_threshold=0 forces the distributed contraction.
        hub_edges = ids.withColumn("id_b", F.col("id_a") + 1).where(
            (F.col("id_a") % 100) != 99
        ).union(
            ids.where((F.col("id_a") % 7) < 3).select(
                F.lit(0).cast("long").alias("id_a"), F.col("id_a").alias("id_b")
            )
        )
        t0 = time.perf_counter()
        nhub = (
            connected_components(hub_edges, local_threshold=0)
            .select("component").distinct().count()
        )
        out[f"hub_components_{tag}"] = round(time.perf_counter() - t0, 3)
        out[f"hub_components_n_{tag}"] = nhub
    # ANN join at 10x on BOTH sides (the two-corpus shape): 10 offset
    # copies of the embeddings table joined against itself — candidate
    # volume grows with bucket occupancy on both sides, the per-query
    # top-k stays the two-level aggregate (no Window)
    from dask_glm_spark.operators.similarity import lsh_ann_join
    from dask_glm_spark.sources.glm_source import load_table as _lt

    emb1 = _lt(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    e_copies = [
        emb1.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "embedding",
        )
        for i in range(10)
    ]
    emb10_path = f"{workdir}/emb_10x.parquet"
    reduce(lambda a, b: a.unionAll(b), e_copies).repartition(32).write.mode(
        "overwrite"
    ).parquet(emb10_path)
    emb10 = spark.read.parquet(emb10_path)
    # fixed query set vs growing corpus: candidate volume scales with
    # corpus bucket occupancy (~10x) — a clean engine ratio, unlike a
    # self-join whose per-bucket pair count is quadratic by construction
    qset = emb1.limit(1000).persist()
    qset.count()
    lsh_ann_join(emb1.limit(64), qset.limit(64), k=3).count()  # warm shape
    for tag, emb in (("1x", emb1), ("10x", emb10)):
        t0 = time.perf_counter()
        npairs_ann = lsh_ann_join(emb, qset, k=3).count()
        out[f"ann_join_{tag}"] = round(time.perf_counter() - t0, 3)
        out[f"ann_join_pairs_{tag}"] = npairs_ann
    qset.unpersist()
    spark.catalog.clearCache()

    # time-series joins at 10x events: 10 day-shifted copies of the events
    # table (disjoint in time per copy via a +i-day offset, same structure)
    from dask_glm_spark.operators.joins import asof_join, range_join
    from dask_glm_spark.streaming.scoring import load_events
    from dask_glm_spark.streaming.sessions import sessionize_batch

    ev1 = load_events(spark, sf_dir).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    ev_copies = [
        ev1.select(
            (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
            "user_id",
            (F.col("ts") + F.expr(f"INTERVAL {i * 40} DAYS")).alias("ts"),
            "event_type",
            "value",
        )
        for i in range(10)
    ]
    ev10_path = f"{workdir}/events_10x.parquet"
    reduce(lambda a, b: a.unionAll(b), ev_copies).repartition(32).write.mode(
        "overwrite"
    ).parquet(ev10_path)
    ev10 = spark.read.parquet(ev10_path)
    for tag, ev in (("1x", ev1), ("10x", ev10)):
        clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
        errors = ev.where(F.col("event_type") == "error").select(
            "user_id", "ts", F.col("event_id").alias("eid"))
        t0 = time.perf_counter()
        asof_join(clicks, errors, time_col="ts", by="user_id",
                  value_cols=["eid"]).write.format("noop").mode("overwrite").save()
        out[f"asof_{tag}"] = round(time.perf_counter() - t0, 3)
        # skew-safe two-pass form (round 6): same result, big window on
        # (user, day-bucket) — the shape that holds when one key is hot
        t0 = time.perf_counter()
        asof_join(
            clicks, errors, time_col="ts", by="user_id",
            value_cols=["eid"], bucket_seconds=86400,
        ).write.format("noop").mode("overwrite").save()
        out[f"asof_bkt_{tag}"] = round(time.perf_counter() - t0, 3)
        sess = sessionize_batch(ev, gap_minutes=30).select(
            "user_id", "session_start", "session_end")
        pts = ev.where(F.col("event_type") == "error").select("user_id", "ts")
        t0 = time.perf_counter()
        range_join(pts, sess).write.format("noop").mode("overwrite").save()
        out[f"range_{tag}"] = round(time.perf_counter() - t0, 3)

    for k in ("tfidf", "repetition", "spans", "minhash", "components",
              "hub_components", "ann_join", "asof", "asof_bkt", "range"):
        r = out[f"{k}_10x"] / max(out[f"{k}_1x"], 1e-9)
        print(f"{k}: 1x={out[f'{k}_1x']}s 10x={out[f'{k}_10x']}s ratio={r:.2f}x")
    print(
        f"minhash pairs: 1x={out['minhash_pairs_1x']} 10x={out['minhash_pairs_10x']}"
        f" | components: 1x={out['components_n_1x']} 10x={out['components_n_10x']}"
    )
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
