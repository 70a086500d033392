"""File-format ingest and sinks for the GLM pipeline.

Reference parity: dask-glm's docs ingest CSV with dd.read_csv, filter rows,
and assemble a feature matrix with ``.values`` (docs/examples/
basic_api.ipynb cells 4-12). Spark-native equivalents here:

- ``read_csv`` / ``read_json`` / ``read_parquet``: format readers that end
  in ``assemble_features`` — one narrow projection building
  ``(features array<double>, label double)``. Pre-assembly filters are
  plain DataFrame filters, so Catalyst pushes them into the scan (for
  parquet: ``PushedFilters`` + column pruning; the 100 TB read touches
  only referenced columns).
- ``write_parquet``: partitioned sink (e.g. scored outputs / dedup
  survivors), with optional bucketing note for re-join-able outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def assemble_features(
    df: DataFrame,
    feature_cols: list[str],
    label: str | Column,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Project raw columns into the engine's universal (features, label)
    relation. A narrow map — Catalyst prunes every unreferenced column out
    of the upstream scan."""
    label_col = F.col(label) if isinstance(label, str) else label
    cols = [
        F.array(*[F.col(c).cast("double") for c in feature_cols]).alias("features"),
        label_col.cast("double").alias("label"),
    ]
    for extra in keep_cols or []:
        cols.append(F.col(extra))
    return df.select(*cols)


def read_csv(
    spark: SparkSession,
    path: str,
    feature_cols: list[str],
    label: str | Column,
    header: bool = True,
    infer_schema: bool = True,
    where: Column | None = None,
    **options,
) -> DataFrame:
    df = spark.read.csv(
        path, header=header, inferSchema=infer_schema, **options
    )
    if where is not None:
        df = df.where(where)
    return assemble_features(df, feature_cols, label)


def read_json(
    spark: SparkSession,
    path: str,
    feature_cols: list[str],
    label: str | Column,
    where: Column | None = None,
    **options,
) -> DataFrame:
    df = spark.read.json(path, **options)
    if where is not None:
        df = df.where(where)
    return assemble_features(df, feature_cols, label)


def read_parquet(
    spark: SparkSession,
    path: str,
    feature_cols: list[str],
    label: str | Column,
    where: Column | None = None,
) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # nanosAsLong surfaces TIMESTAMP(NANOS) columns as raw int64 nanos;
    # repair them (footer-detected) BEFORE feature assembly — otherwise a
    # 1.7e18-scale long silently cast to double destroys the fit.
    from dask_glm_spark.sources.glm_source import (
        nano_ts_columns_of,
        repair_nano_timestamps,
    )

    df = repair_nano_timestamps(df, nano_ts_columns_of(path))
    if where is not None:
        df = df.where(where)  # pushed into the scan (PushedFilters)
    return assemble_features(df, feature_cols, label)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink. ``partition_by`` low-cardinality keys only
    (each distinct value is a directory; at 100 TB partition by date/source,
    never by a high-cardinality id)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_orc(
    spark: SparkSession,
    path: str,
    feature_cols: list[str],
    label: str | Column,
    where: Column | None = None,
) -> DataFrame:
    """ORC reader -> (features, label); same pushdown/pruning properties
    as parquet (ORC scans report PushedFilters too)."""
    df = spark.read.orc(path)
    if where is not None:
        df = df.where(where)
    return assemble_features(df, feature_cols, label)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned ORC sink — same layout contract as ``write_parquet``."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
