"""ANN index lifecycle: build a compressed vector index ONCE, persist
the model, reload in a fresh context, and serve query batches.

    embeddings ──> coarse quantizer + residual-PQ codebooks (one bounded
        sample) ──> compressed index (id, cell, code — m bytes/vector,
        parquet) + model JSON
    ... later session ...
    load model ──> encode nothing (index is on disk) ──> probe cells
        ──> ADC shortlist ──> exact refine ──> top-k
        ──> recall checked against brute force

This is the 100 TB serving shape: the float vectors are read once at
index build; every query batch afterwards touches only the m-byte codes
plus the queries x refine shortlist. The suite runs this at sf0.001 as
an integration test. Run:  python examples/ann_index.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    import numpy as np
    from pyspark.sql import functions as F

    from dask_glm_spark.operators import similarity as S
    from dask_glm_spark.session import get_spark
    from dask_glm_spark.sources.glm_source import load_table

    spark = get_spark(app_name="ann_index", shuffle_partitions=8)
    emb = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="dask_glm_spark_ann_")

    # 1. train the quantizers off ONE bounded sample (corpus-size
    # independent), residual encoding (the FAISS IVFPQ default)
    sv = S.sample_vectors(emb, "embedding")
    cent = S.train_ivf_centroids(emb, 12, sample=sv)
    assign = (sv @ cent.T - 0.5 * (cent * cent).sum(1)[None, :]).argmax(1)
    cb = S.pq_train(emb, m=16, ksub=64, sample=sv - cent[assign])

    # 2+3. build the compressed index (the only corpus-wide pass — the
    # frame the query path uses: id, cell, residual code, m bytes/vector)
    # and persist index + quantizers as ONE artifact (round 10: the FAISS
    # write_index analogue — model.json + index/ parquet under one root;
    # bucket the index by cell at real scale)
    art_path = os.path.join(root, "ivfpq_artifact")
    S.save_ivf_pq_index(
        art_path, S.ivf_pq_index(emb, cent, cb, by_residual=True),
        cent, cb, by_residual=True,
        # hive-partition by cell: probes then PRUNE the scan to their
        # nprobe/C slice of the index (the 100 TB read path)
        partition_by_cell=True,
    )

    # 4. "later session": reload the artifact and serve a query batch
    # without touching the float corpus (corpus= is only for the exact
    # refine re-rank, which reads just the queries x refine shortlist)
    index2, cent2, cb2, by_residual = S.load_ivf_pq_index(spark, art_path)
    assert by_residual and np.array_equal(cb, cb2)
    idx_rows = index2.count()
    queries = emb.where(F.col("vec_id") < 10)
    approx = S.ivf_pq_probe(
        index2, queries, cent2, cb2, k=5, nprobe=6,
        by_residual=by_residual, refine=30, corpus=emb,
        prune_cells=True,  # partition-pruned scan over the cell layout
    ).collect()

    # 5. accuracy check vs brute force on the same corpus
    exact = S.brute_force_topk(emb, queries, k=5).collect()
    truth: dict = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    found: dict = {}
    for r in approx:
        found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = sum(
        len(truth[q] & found.get(q, set())) / len(truth[q]) for q in truth
    ) / len(truth)

    out = {
        "indexed": idx_rows,
        "queries": len(truth),
        "recall_at_5": round(float(recall), 3),
        "code_bytes_per_vector": int(cb.shape[0]),
    }
    print(out)
    assert out["indexed"] > 0 and out["recall_at_5"] >= 0.6
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
