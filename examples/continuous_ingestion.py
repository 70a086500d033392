"""Continuous ingestion: dedup an ever-growing corpus across runs, land
training shards.

    day-1 snapshot ──> streaming incremental dedup ──> epoch dirs
    day-2 snapshot ──> (same checkpoint/index)     ──> only-new survivors
        ──> normalize ──> tar shards (+ .idx sidecars) ──> seek check

The point of the incremental family: day 2 must NOT rescan or re-shuffle
day 1's text — the persisted state is one fingerprint per kept doc, and a
duplicate arriving a month late still drops (the watermark variant would
have forgotten it). Every stage is an engine operator; the suite runs
this at sf0.001 as an integration test. Run:
python examples/continuous_ingestion.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from pyspark.sql import functions as F

    from dask_glm_spark.operators.text import normalize_text
    from dask_glm_spark.session import get_spark
    from dask_glm_spark.sources.glm_source import load_table
    from dask_glm_spark.sources.shards import write_tar_shards
    from dask_glm_spark.streaming.dedup import dedup_stream_incremental

    spark = get_spark(app_name="continuous_ingestion", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="dask_glm_spark_ingest_")
    src = os.path.join(root, "src")
    out = os.path.join(root, "dedup")
    state = os.path.join(root, "state")
    ckpt = os.path.join(root, "ckpt")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # day 1: even doc ids land
    docs.where(F.col("doc_id") % 2 == 0).write.mode("append").parquet(src)
    schema = "doc_id long, text string"
    q = dedup_stream_incremental(
        spark.readStream.schema(schema).parquet(src), out, state, ckpt
    )
    q.awaitTermination(120)
    day1 = spark.read.parquet(os.path.join(out, "epoch-*")).count()

    # day 2: odd ids + REPLAYS of day-1 docs under new ids (late dups)
    odd = docs.where(F.col("doc_id") % 2 == 1)
    replay = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    odd.unionByName(replay).write.mode("append").parquet(src)
    q2 = dedup_stream_incremental(
        spark.readStream.schema(schema).parquet(src), out, state, ckpt
    )
    q2.awaitTermination(120)
    survivors = spark.read.parquet(os.path.join(out, "epoch-*"))
    total = survivors.count()
    n_replayed_kept = survivors.where(F.col("doc_id") >= 1_000_000).count()

    # training handoff: normalized text into indexed tar shards
    shard_dir = os.path.join(root, "shards")
    manifest = write_tar_shards(
        normalize_text(survivors, collapse_whitespace=True),
        shard_dir,
        n_shards=4,
        member_order="shuffled",
        write_index=True,
    ).collect()
    n_sharded = sum(m["n_files"] for m in manifest)

    # random access via the .idx sidecar: seek to one member, no tarfile
    idx = sorted(f for f in os.listdir(shard_dir) if f.endswith(".idx"))[0]
    with open(os.path.join(shard_dir, idx)) as fh:
        name, off, size = fh.readline().rstrip("\n").split("\t")
    with open(os.path.join(shard_dir, idx.replace(".idx", ".tar")), "rb") as tf:
        tf.seek(int(off))
        sample = tf.read(int(size)).decode("utf-8")

    result = {
        "day1_kept": day1,
        "total_kept": total,
        "late_dups_kept": n_replayed_kept,  # must be 0
        "sharded": n_sharded,
        "seek_sample_ok": len(sample) >= 0 and name.endswith(".txt"),
    }
    print(result)
    return result


if __name__ == "__main__":
    main(*sys.argv[1:])
