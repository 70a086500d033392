"""dask_glm_spark — a PySpark-native GLM + large-scale data-pipeline engine.

Brand-new engine with the capabilities of dask/dask-glm (reference at
/root/reference, studied in SURVEY.md), re-architected for Spark:

- One DataFrame ``(id, features array<double>, label double)`` is the
  universal input (reference: row-block-chunked dask arrays X (n,p) + y (n),
  ``dask_glm/algorithms.py:96-97``).
- Kernel layer (``functions.kernels``) exposes each distributed primitive
  (mat-vec, gradient, Gram, moments) both as pure Spark SQL expressions
  (DuckDB-oracle checkable) and as Arrow-batched partial-aggregation fast
  paths (the solver hot path).
- Families / regularizers / solvers / estimators mirror the reference's
  public API surface exactly (``dask_glm/{families,regularizers,algorithms,
  estimators}.py``).
- ``operators.{dedup,similarity,text}`` and ``streaming.scoring`` extend
  beyond the reference with the operators a 100 TB training-data pipeline
  needs: exact + MinHash-LSH + SimHash dedup, cosine top-k / LSH ANN over
  embeddings, language-ID / quality / fingerprint / TF-IDF text analysis,
  and Structured Streaming event rollups + model scoring.

Scale design: the only large object is the feature DataFrame; model state
(p floats) lives on the driver and is broadcast per job. Every cluster-side
computation is a single narrow map + partial/final aggregation — no shuffles
of the feature matrix, ever. This matches MLlib's own treeAggregate
architecture and survives a 1000-executor scale-up by construction.
"""

__version__ = "0.1.0"

from dask_glm_spark.operators.estimators import (  # noqa: F401
    GammaRegression,
    LinearRegression,
    LogisticRegression,
    MulticlassLogisticRegression,
    PoissonRegression,
    SoftmaxRegression,
    TweedieRegression,
)
from dask_glm_spark.functions.inference import (  # noqa: F401
    GLMSummary,
    SoftmaxSummary,
    glm_predict_interval,
    glm_residuals,
    glm_summary,
    softmax_summary,
    sparse_coef_se,
)
from dask_glm_spark.operators.model_selection import (  # noqa: F401
    cv_lamduh,
    lamduh_max,
    regularization_path,
    softmax_cv_lamduh,
    softmax_lamduh_max,
    softmax_regularization_path,
)
