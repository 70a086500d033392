"""Sharded tar sink: the training-loader handoff format.

Beyond-reference surface. Large-scale training jobs consume corpora as
fixed-count tar shards (the webdataset convention: one archive member per
sample, shard files streamed sequentially by data loaders) — the natural
last stage after curation/packing. Stdlib ``tarfile`` only; no extra deps.

Scale shape: one ``applyInPandas`` group per shard — shard assignment is
a DETERMINISTIC content hash of the sample id (layout/rerun/engine
stable, the sampling-operator convention), so re-running the sink on the
same corpus reproduces byte-identical shards (fixed mtime/uid, sorted
member order). Each task materializes exactly one shard; pick
``n_shards`` so corpus_bytes / n_shards fits comfortably in a worker
(the same sizing rule data loaders want anyway — shards of hundreds of
MB, not GB).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_glm_spark.operators.sampling import hash_bucket_expr


def write_tar_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    payload_col: str = "text",
    id_col: str = "doc_id",
    ext: str = "txt",
    salt: str = "shard",
    member_order: str = "id",
    write_index: bool = False,
) -> DataFrame:
    """Write ``path/shard-NNNNN.tar`` files, one archive member per row
    (member name ``{id}.{ext}``), and return the shard manifest
    ``(shard, n_files, n_bytes)`` — the sink's action doubles as its
    verification handle.

    ``payload_col`` may be string (utf-8 encoded) or binary. Member order
    inside a shard is id-sorted (``member_order="id"``) or hash-shuffled
    (``member_order="shuffled"`` — the training-epoch order: members sort
    by the deterministic hash-uniform of their id under salt
    ``f"{salt}-ord"``, so hash shard assignment + shuffled member order is
    a complete reproducible epoch shuffle a sequential data loader streams
    straight off the tars). Either way metadata is pinned (mtime=0,
    uid/gid=0), so the same corpus always produces byte-identical shards
    regardless of partitioning or task order.

    ``write_index=True`` additionally publishes ``shard-NNNNN.idx``
    (one ``name<TAB>data_offset<TAB>size`` line per member, same atomic
    tmp+rename) — the random-access sidecar loaders use to seek straight
    to a sample without streaming the tar. Offsets are exact BECAUSE the
    tar is opened with ``format=tarfile.USTAR_FORMAT`` and each member is
    validated to fit a single 512-byte ustar header (name <= 100 bytes,
    size < 8 GiB): Python's default PAX format silently emits extended
    header blocks for longer names / larger payloads, which would shift
    that member's and every subsequent member's offset. Violations raise
    loudly instead of corrupting the sidecar."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if member_order not in ("id", "shuffled"):
        raise ValueError(f"member_order must be 'id' or 'shuffled', got {member_order!r}")
    os.makedirs(path, exist_ok=True)
    is_binary = dict(df.dtypes)[payload_col] == "binary"
    from dask_glm_spark.operators.sampling import uniform_unit_expr

    rows = df.select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(payload_col).alias("_payload"),
        hash_bucket_expr(id_col, n_shards, salt).alias("_shard"),
        (
            uniform_unit_expr(id_col, salt=f"{salt}-ord")
            if member_order == "shuffled"
            else F.lit(0.0)
        ).alias("_ord"),
    )

    def write_shard(key, pdf):
        import io
        import tarfile

        import pandas as pd

        shard = int(key[0])
        pdf = pdf.sort_values(["_ord", "_id"], kind="mergesort")
        out = os.path.join(path, f"shard-{shard:05d}.tar")
        tmp = out + ".tmp"
        n_bytes = 0
        index_lines = []
        # USTAR: exactly one 512-byte header per member, so .idx offsets
        # stay exact; oversize names/payloads fail loudly (see docstring)
        with tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT) as tf:
            for _id, payload in zip(pdf["_id"], pdf["_payload"]):
                data = (
                    bytes(payload)
                    if is_binary
                    else str(payload).encode("utf-8")
                )
                name = f"{_id}.{ext}"
                if len(name.encode("utf-8")) > 100:
                    raise ValueError(
                        f"tar member name {name!r} exceeds the 100-byte "
                        "ustar header limit; longer names would need PAX "
                        "extension blocks that shift .idx offsets"
                    )
                if len(data) >= 8 * 1024**3:
                    raise ValueError(
                        f"tar member {name!r} payload {len(data)} bytes "
                        ">= 8 GiB ustar size limit"
                    )
                info = tarfile.TarInfo(name=name)
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                if write_index:
                    # tf.offset = this member's HEADER position; data
                    # follows one 512-byte ustar header later
                    index_lines.append(
                        f"{name}\t{tf.offset + 512}\t{len(data)}\n"
                    )
                tf.addfile(info, io.BytesIO(data))
                n_bytes += len(data)
        os.replace(tmp, out)  # atomic publish: no torn shards on retry
        if write_index:
            idx = os.path.join(path, f"shard-{shard:05d}.idx")
            with open(idx + ".tmp", "w") as fh:
                fh.writelines(index_lines)
            os.replace(idx + ".tmp", idx)
        return pd.DataFrame(
            {"shard": [shard], "n_files": [len(pdf)], "n_bytes": [n_bytes]}
        )

    return rows.groupBy("_shard").applyInPandas(
        write_shard, schema="shard long, n_files long, n_bytes long"
    )


def read_tar_shards(spark, path: str, ext: str = "txt") -> DataFrame:
    """Round-trip reader: (shard, id, payload binary) from every
    ``shard-*.tar`` under ``path``. One task per shard file (binaryFile
    source), stdlib tarfile unpack — the verification twin of the sink
    and a loader for downstream Spark stages."""
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "shard-*.tar")
    )

    def unpack(batches):
        import io
        import re
        import tarfile

        import pandas as pd

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                m = re.search(r"shard-(\d+)\.tar$", fpath)
                shard = int(m.group(1)) if m else -1
                with tarfile.open(fileobj=io.BytesIO(content)) as tf:
                    names, payloads = [], []
                    for member in tf.getmembers():
                        names.append(member.name.rsplit(".", 1)[0])
                        payloads.append(tf.extractfile(member).read())
                yield pd.DataFrame(
                    {
                        "shard": [shard] * len(names),
                        "id": names,
                        "payload": payloads,
                    }
                )

    return files.select("path", "content").mapInPandas(
        unpack, schema="shard long, id string, payload binary"
    )


def stream_to_tar_shards(
    stream_df: DataFrame,
    path: str,
    n_shards: int,
    checkpoint_dir: str,
    payload_col: str = "text",
    id_col: str = "doc_id",
    ext: str = "txt",
    salt: str = "shard",
    trigger_available_now: bool = True,
):
    """Streaming twin of ``write_tar_shards``: each micro-batch lands as
    ``path/batch-NNNNNN/shard-*.tar`` via ``foreachBatch`` — exactly-once
    per epoch directory (the checkpoint replays an incomplete epoch, and
    the sink's atomic tmp+rename publish makes the rewrite idempotent:
    shard content is a pure function of the batch rows). Returns the
    started StreamingQuery; callers own awaitTermination /
    processAllAvailable."""

    def sink(batch_df, epoch_id: int):
        out = os.path.join(path, f"batch-{int(epoch_id):06d}")
        write_tar_shards(
            batch_df, out, n_shards,
            payload_col=payload_col, id_col=id_col, ext=ext, salt=salt,
        ).collect()

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
