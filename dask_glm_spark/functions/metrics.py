"""Model metrics, replicating ``dask_glm/utils.py:172-181`` semantics.

Column-expression forms (lazy, aggregated in one job) plus numpy forms for
driver-side arrays. Note ``poisson_deviance`` uses ``log1p`` — NOT the
standard ``log`` deviance — an intentional reference quirk kept for parity
(``utils.py:181``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mean_squared_error_expr(y_true: Column, y_pred: Column) -> Column:
    return F.avg((y_true - y_pred) * (y_true - y_pred))


def accuracy_score_expr(y_true: Column, y_pred: Column) -> Column:
    return F.avg(F.when(y_true == y_pred, 1.0).otherwise(0.0))


def poisson_deviance_expr(y_true: Column, y_pred: Column) -> Column:
    # y_pred == 0 explicit: Spark's non-ANSI x/0 yields NULL, which F.sum
    # would silently SKIP — hiding degenerate predictions behind a finite
    # deviance. numpy semantics instead: y/0 -> inf (y>0) or nan (y==0),
    # both of which poison the sum loudly; mirror them (review r5).
    ratio = F.when(y_pred != 0, y_true / y_pred).otherwise(
        F.when(y_true > 0, F.lit(float("inf"))).otherwise(F.lit(float("nan")))
    )
    return F.lit(2.0) * F.sum(y_true * F.log1p(ratio) - (y_true - y_pred))


def _agg_scalar(df: DataFrame, expr: Column) -> float:
    return float(df.agg(expr.alias("v")).collect()[0]["v"])


def mean_squared_error(df: DataFrame, y_true: str, y_pred: str) -> float:
    return _agg_scalar(df, mean_squared_error_expr(F.col(y_true), F.col(y_pred)))


def accuracy_score(df: DataFrame, y_true: str, y_pred: str) -> float:
    return _agg_scalar(df, accuracy_score_expr(F.col(y_true), F.col(y_pred)))


def poisson_deviance(df: DataFrame, y_true: str, y_pred: str) -> float:
    return _agg_scalar(df, poisson_deviance_expr(F.col(y_true), F.col(y_pred)))


# numpy forms (for driver-side arrays in tests)
def mean_squared_error_np(y_true, y_pred):
    return float(np.mean((y_true - y_pred) ** 2))


def accuracy_score_np(y_true, y_pred):
    return float(np.mean(y_true == y_pred))


def poisson_deviance_np(y_true, y_pred):
    return float(2 * np.sum(y_true * np.log1p(y_true / y_pred) - (y_true - y_pred)))
