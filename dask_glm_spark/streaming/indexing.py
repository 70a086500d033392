"""Continuous ANN indexing: keep an IVF-PQ index artifact fresh from a
stream of embedding rows.

The batch lifecycle (``similarity.save_ivf_pq_index`` → ``append_to_…``)
leaves replay coordination to the caller because raw ``mode("append")``
is not idempotent. This sink closes that gap with the repo's streaming
discipline: each micro-batch encodes with the artifact's FROZEN
quantizers and lands under ``index/epoch=K/cell=N/`` via Spark's dynamic
partition overwrite — a replayed epoch rewrites exactly its own
``epoch=K`` partitions and nothing else, so the artifact is correct
under at-least-once delivery. Cell stays a partition level beneath
epoch, so ``ivf_pq_probe(prune_cells=True)`` still prunes the scan.

At 100 TB: the index accretes one epoch directory per micro-batch;
compact epochs offline (read + rewrite partitioned by cell alone) when
file counts grow — the same offline-compaction note as the dedup state
sinks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def index_stream_incremental(
    stream_df: DataFrame,
    artifact_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_available_now: bool = True,
):
    """foreachBatch sink appending each epoch's vectors to a
    ``save_ivf_pq_index`` artifact (whose ``model.json`` quantizers must
    already exist — train once on a bootstrap sample, the standard IVF
    contract). Epoch-idempotent via dynamic partition overwrite; read
    the result back with ``load_ivf_pq_index`` + ``ivf_pq_probe``."""
    from dask_glm_spark.operators.similarity import ivf_pq_index, load_pq

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        cb, cent, by_residual = load_pq(
            os.path.join(artifact_path, "model.json")
        )
        if cent is None:
            raise ValueError(
                f"{artifact_path}/model.json has no centroids — "
                "bootstrap the artifact with save_pq(centroids=...) first"
            )
        idx_dir = os.path.join(artifact_path, "index")
        if os.path.isdir(idx_dir):
            tops = [d for d in os.listdir(idx_dir)
                    if not d.startswith(("_", "."))]  # skip _SUCCESS/.crc
            if tops and not all(d.startswith("epoch=") for d in tops):
                raise ValueError(
                    f"{idx_dir} holds a non-epoch layout (batch "
                    "save_ivf_pq_index output?) — partition depths would "
                    "mix; stream into a fresh artifact (feed the initial "
                    "corpus through the stream as its first batch) or "
                    "compact offline first"
                )
        rows = ivf_pq_index(
            batch_df, cent, cb, id_col=id_col, vec_col=vec_col,
            by_residual=by_residual,
        ).withColumn("epoch", F.lit(int(epoch_id)))
        key = "spark.sql.sources.partitionOverwriteMode"
        prior = spark.conf.get(key, "static")
        spark.conf.set(key, "dynamic")
        try:
            # overwrite + dynamic: only the partitions present in this
            # write (epoch=K/...) are replaced — replay-idempotent
            rows.repartition("cell").write.mode("overwrite").partitionBy(
                "epoch", "cell"
            ).parquet(os.path.join(artifact_path, "index"))
        finally:
            spark.conf.set(key, prior)

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
