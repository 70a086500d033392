"""Vector-column ingest: MLlib VectorUDT and wide-sparse representations.

Reference parity target: dask-glm accepts pydata/sparse COO feature
matrices end-to-end (``dask_glm/utils.py:132-146``), auto-disabling
standardization for them (``estimators.py:82-83``). The Spark-native
equivalents:

- **MLlib vectors** (``pyspark.ml.linalg`` SparseVector/DenseVector, i.e.
  the output of ``HashingTF``/``CountVectorizer``/``VectorAssembler``):
  ``from_vector_column`` converts to the engine's ``array<double>`` via the
  JVM ``vector_to_array`` (no Python in the loop). Right for p up to a few
  thousand — the dense row is what the BLAS kernels want anyway.
- **Wide sparse** (one-hot text features, p in the 10^5-10^6 range, where
  densifying rows would explode bytes-on-wire): ``to_sparse_columns``
  keeps ``(indices array<int>, values array<double>)`` per row, and
  ``functions.kernels_sparse`` computes loss/gradient with bincount-based
  scatter-adds — per-partition cost O(nnz), bytes leaving executors O(p),
  X never densified anywhere.

Detection helpers let the estimator route automatically and replicate the
reference's "sparse input => normalize=False" behavior.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def is_vector_column(df: DataFrame, col: str = "features") -> bool:
    """True if `col` is an MLlib VectorUDT column."""
    for f in df.schema.fields:
        if f.name == col:
            return f.dataType.typeName() == "vector" or (
                type(f.dataType).__name__ == "VectorUDT"
            )
    return False


def is_sparse_columns(df: DataFrame, idx_col: str = "findices", val_col: str = "fvalues") -> bool:
    names = set(df.columns)
    return idx_col in names and val_col in names


def from_vector_column(df: DataFrame, col: str = "features") -> DataFrame:
    """VectorUDT -> array<double> (JVM-side, lazy, no Python)."""
    from pyspark.ml.functions import vector_to_array

    return df.withColumn(col, vector_to_array(F.col(col)).cast("array<double>"))


def to_sparse_columns(
    df: DataFrame,
    col: str = "features",
    idx_col: str = "findices",
    val_col: str = "fvalues",
) -> DataFrame:
    """Explode a vector/array column into (indices, values) sparse columns.

    For VectorUDT input this reads SparseVector.indices/.values directly
    inside an Arrow batch (no densification ever); for array input it
    filters nonzeros declaratively.
    """
    if is_vector_column(df, col):
        other = [c for c in df.columns if c != col]

        def split_vec(v) -> tuple[list[int], list[float]]:
            # Arrow hands the UDT over as its storage struct: a dict with
            # keys (type, size, indices, values); type 0 = sparse, 1 = dense.
            if isinstance(v, dict):
                if v.get("type") == 0:
                    return (
                        [int(i) for i in v["indices"]],
                        [float(x) for x in v["values"]],
                    )
                dense = v["values"]
            elif hasattr(v, "indices"):
                return [int(i) for i in v.indices], [float(x) for x in v.values]
            else:
                dense = v.toArray()
            return (
                [i for i, x in enumerate(dense) if x != 0],
                [float(x) for x in dense if x != 0],
            )

        def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                out = pdf[other].copy()
                pairs = [split_vec(v) for v in pdf[col]]
                out[idx_col] = [p[0] for p in pairs]
                out[val_col] = [p[1] for p in pairs]
                yield out

        fields = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name != col
        )
        schema = f"{fields}, {idx_col} array<int>, {val_col} array<double>"
        return df.mapInPandas(op, schema=schema)

    zipped = F.arrays_zip(
        F.sequence(F.lit(0), F.size(F.col(col)) - 1).alias("i"), F.col(col).alias("x")
    )
    nz = F.filter(zipped, lambda s: s["x"] != 0)
    return df.withColumn(idx_col, F.transform(nz, lambda s: s["i"].cast("int"))).withColumn(
        val_col, F.transform(nz, lambda s: s["x"].cast("double"))
    ).drop(col)


def from_coo(
    df: DataFrame,
    row_col: str = "row",
    col_col: str = "col",
    value_col: str = "value",
    idx_col: str = "findices",
    val_col: str = "fvalues",
) -> DataFrame:
    """COO triplets (row, col, value) -> the engine's wide-sparse rows
    (row id + sorted ``findices``/``fvalues``), closing the reference's
    ``sparse.COO`` ingest format (``dask_glm/utils.py:132-146``,
    ``estimators.py:82-83``) Spark-natively: the distributed analogue of a
    COO array IS a triplet table.

    Duplicate (row, col) entries sum (standard COO semantics). Two
    aggregates on the same row-hash partitioning: the (row, col) combine,
    then the per-row sorted gather — ``array_sort`` on (col, value)
    structs orders by col first, so indices come out sorted the way the
    sparse kernels require. Explicit zeros are kept (COO keeps what you
    stored; the kernels' scatter-adds are value-driven, so zeros are
    harmless). Rows absent from the triplets don't appear — same as a COO
    matrix with an all-zero row only existing by shape, which a caller
    models by joining labels on the row id.
    """
    summed = (
        df.groupBy(row_col, col_col)
        .agg(F.sum(F.col(value_col)).cast("double").alias("_v"))
    )
    z = F.array_sort(
        F.collect_list(F.struct(F.col(col_col).cast("int").alias("i"), F.col("_v").alias("x")))
    )
    return summed.groupBy(row_col).agg(
        F.transform(z, lambda s: s["i"]).alias(idx_col),
        F.transform(z, lambda s: s["x"]).alias(val_col),
    )


def sparse_p(df: DataFrame, idx_col: str = "findices") -> int:
    """Feature dimension of a sparse-columns frame: max index + 1 (one
    column-pruned scan; callers should pass p explicitly when known)."""
    from dask_glm_spark.functions.kernels import kernel_exec

    with kernel_exec(df.sparkSession):
        row = df.agg(F.max(F.array_max(F.col(idx_col))).alias("m")).first()
    if row is None or row["m"] is None:
        raise ValueError("cannot infer p from empty sparse frame")
    return int(row["m"]) + 1


def append_intercept_coord(
    df: DataFrame,
    p_base: int,
    idx_col: str = "findices",
    val_col: str = "fvalues",
) -> DataFrame:
    """Append the constant-1 intercept coordinate at index ``p_base`` to
    every (indices, values) row — the sparse twin of the dense
    ``add_intercept`` column append (one (int, double) pair per row,
    never a densification). The ONE definition shared by the sparse fit
    paths and the coords-summary path, so they always address the same
    intercept-extended design (review r12)."""
    return df.withColumn(
        idx_col, F.concat(idx_col, F.array(F.lit(int(p_base)).cast("int")))
    ).withColumn(val_col, F.concat(val_col, F.array(F.lit(1.0))))
