"""SparkSession factory tuned for the engine's workload shape.

Workload: iterative full-table scans with tiny (p or p**2 floats) results,
plus text/embedding pipeline operators. Configs chosen for that shape:

- AQE on: coalesces the tiny post-agg exchanges and handles skew joins in
  the dedup/similarity operators at scale.
- Arrow on: every solver hot path is a pandas-UDF partial aggregation.
- shuffle.partitions defaults to the local core count; on a real cluster
  this should be ~2-3x total cores (the engine never shuffles the feature
  matrix, so this only affects the pipeline operators).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "dask_glm_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(DEFAULT_CPUS)
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    # Pin worker Python to the driver's interpreter unless the user chose
    # one: a venv-installed driver (pip install -e .) otherwise spawns
    # workers with whatever system python Spark defaults to, which cannot
    # see the venv's site-packages — the pandas-UDF kernels then fail with
    # ModuleNotFoundError: dask_glm_spark on every executor.
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Large Arrow batches amortize Python-worker round trips in the
        # pandas-UDF partial-aggregation kernels (each batch is one numpy
        # BLAS call; bigger batch => fewer calls, same memory order as a
        # parquet row group).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # testdata parquet uses TIMESTAMP(NANOS); read as long + convert in
        # sources.glm_source.load_table (DuckDB-truncation parity).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # The console progress bar's redraw thread wakes every ~100 ms and
        # repaints per active stage; on high-latency hosts the repaints
        # measurably perturb job scheduling (isolated A/B: warm 600k-row
        # agg job 772 -> 562 ms with the bar off, r13). Purely cosmetic —
        # plans and results are untouched.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # Session hygiene (r14, guide §5 "unpersist when done"). Spark
        # frees dead RDD/broadcast/shuffle state via ContextCleaner WEAK
        # REFERENCES, which only fire when the driver JVM actually runs a
        # GC — and a long-running driver with a large, pressure-free heap
        # may not run one for hours (the documented failure mode this
        # conf exists for). localCheckpoint() blocks in particular are
        # invisible to catalog.clearCache(), so a long session
        # accumulates dead cached blocks that crowd the unified storage
        # pool and degrade later persist-heavy jobs (measured with
        # scripts/drift_gc.py: same fit 10.9 s fresh -> 37.8 s after 50
        # queries -> 9.4 s after a forced GC; see OPTIMIZATION_r14.md).
        # Default 30min is far too slow for both the bench session and a
        # 100 TB driver managing millions of shuffle files; 60s bounds
        # the dead-state window at the cost of one concurrent-safe
        # System.gc() per minute on the driver only.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC_INTERVAL", "60s"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
