"""Distributed kernel layer: the 9 dataflow primitives every solver uses.

Reference analogue: SURVEY.md §2.5 (P1-P9). Every solver iteration is some
combination of:

  P1 mat-vec        X·beta            -> per-row `xb` Column expression
  P2 gradient       X^T r(xb,y)       -> p-vector partial+final aggregation
  P3 weighted Gram  X^T diag(w) X     -> p×p partial+final aggregation
  P4 scalar maps    exp/log1p/sigmoid -> built-in Column functions
  P5 reductions     sum(loss terms)   -> df.agg(F.sum(...))
  P6 column moments mean/std per col  -> one agg (population std!)
  P7 per-partition fan-out (ADMM)     -> mapInPandas, see operators/solvers.py
  P8 broadcast of beta                -> literal folding (p floats -> codegen
                                         constants) or closure capture
  P9 intercept append                 -> F.concat(features, array(1.0))

Each aggregation kernel has two physical paths:

- ``sql``: fully unrolled JVM Column expressions — whole-stage codegen,
  partial+final HashAggregate, zero Python in the loop. Best for small p
  (the unroll produces p (+p²/2) sum columns). This is also the
  DuckDB-checkable form (SURVEY §2.6 queries).
- ``arrow``: ``mapInPandas`` partials — each partition computes its numpy
  BLAS partial (``X.T @ r``: one GEMV per Arrow batch), emits ONE row of
  ``(pid, partials...)``; the driver sums partials **in sorted partition
  order** (bit-deterministic across runs, replicating dask's deterministic
  chunk-tree reductions — needed by the reference determinism tests,
  ``tests/test_algos_families.py:141-160``). Scales to wide p where
  unrolling would blow up codegen.

Path choice (``auto``): sql for p <= UNROLL_MAX, arrow beyond. At 100 TB
both are a single scan of the cached feature table with only O(p) or O(p²)
bytes leaving each executor — the shape of MLlib's treeAggregate; there is
no shuffle of X, ever.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from functools import reduce
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNROLL_MAX = 64

# ---------------------------------------------------------------------------
# AQE bypass for kernel jobs (r13 optimization, guide §1.2/§2.4).
#
# Every kernel job here is scan -> partial aggregate -> one tiny exchange
# (O(p)/O(p²) bytes) -> final aggregate. AQE has nothing to optimize on
# that shape AT ANY SCALE: a global aggregate's final stage is single-
# partition regardless, there is no join to re-strategize, and the tree
# merge's repartition(n, ...) is an explicit user partitioning AQE leaves
# alone. What AQE does add is a materialization barrier per query stage —
# pure scheduling latency that an ITERATIVE solver pays once per
# evaluation (isolated A/B on a warm cached 600k-row agg job: 772 ms with
# AQE vs 176 ms without; x10-25 evaluations per fit). Pipeline operators
# (joins, dedup, groupBys) keep the session's AQE setting — coalescing
# and skew handling matter there.
#
# Session-conf toggle, refcounted + locked so nested/overlapping kernel
# actions never leave the session conf flipped. CAVEAT (ADVICE r13): the
# flip is session-wide, so a PIPELINE query planned on another thread of
# the same session while a kernel action is in flight would be planned
# without AQE. This library runs kernel actions sequentially on the
# calling thread (the r13 thread-pool experiment measured concurrent
# driver jobs slower and was removed); callers embedding the library in a
# multi-threaded driver should serialize kernel actions with their own
# pipeline queries or give them a separate SparkSession.newSession().
# ---------------------------------------------------------------------------
_AQE_LOCK = threading.Lock()
_AQE_STATE: dict[int, tuple[int, str]] = {}  # session id -> (depth, saved)
# r14 (second pass): iterative solvers re-plan the same SQL kernel with a
# NEW beta every evaluation. Scalar double literals are inlined into the
# whole-stage-codegen SOURCE, so each evaluation is a Janino cache MISS —
# measured +70-100 ms/evaluation on this box (scripts/kernel_eval_cost.py:
# loss_gradient 249 vs 179 ms, gradient_hessian 387 vs 289, hvp 258 vs
# 177). The fix: beta rides ONE ArrayType literal (non-primitive literals
# are codegen REFERENCES — data, not source), and ConstantFolding is
# excluded while the kernel action plans so the optimizer cannot fold the
# element accesses back into inlined scalars. The generated source is then
# byte-identical across evaluations -> Janino cache HIT. Values are
# bit-identical (folding is pure extraction), pinned by
# tests/test_kernels.py::test_matvec_array_literal_bit_exact.
_NOFOLD_STATE: dict[int, tuple[int, str | None, str | None]] = {}
_NOFOLD_RULE = "org.apache.spark.sql.catalyst.optimizer.ConstantFolding"
_EXCLUDED_RULES_KEY = "spark.sql.optimizer.excludedRules"
# Stable-source kernel actions also pin the reduce side of their (by
# contract BOUNDED) exchanges to one task: the explode-probe's
# groupBy(candidate) otherwise fans its k×(p+1)-value exchange across
# the session's full shuffle.partitions — 31 empty reduce tasks of pure
# scheduling latency per solver iteration (measured 343 -> 237 ms/probe
# at 32 -> 4). Scale-safe for exactly the reason kernel_exec exists:
# every wrapped exchange carries O(p²)/O(k·p) bytes at ANY data scale,
# and per-group merge order stays map-id order (values bit-identical).
# Pipeline shuffles never run under stable_source and keep the session
# setting.
_SHUFFLE_KEY = "spark.sql.shuffle.partitions"


@contextmanager
def kernel_exec(spark, stable_source: bool = False):
    """Run a tiny-result kernel action with AQE off, restoring the
    session's prior setting when the outermost kernel job finishes.

    ``stable_source=True`` (iterative GLM kernels only) additionally
    excludes the ConstantFolding optimizer rule for the action, keeping
    per-iteration beta array literals out of the generated code so the
    solver loop reuses one compiled plan instead of paying a Janino
    compile per evaluation. Only the GLM kernel aggregates opt in: their
    plans contain no foldable work besides the beta elements (a pipeline
    plan with e.g. a folded ``from_json`` literal table must NOT run
    under it)."""
    key = id(spark)
    with _AQE_LOCK:
        depth, saved = _AQE_STATE.get(key, (0, "true"))
        if depth == 0:
            try:
                saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
            except Exception:
                saved = "true"
            if saved != "false":
                spark.conf.set("spark.sql.adaptive.enabled", "false")
        _AQE_STATE[key] = (depth + 1, saved)
        if stable_source:
            nf_depth, nf_saved, sp_saved = _NOFOLD_STATE.get(
                key, (0, None, None)
            )
            if nf_depth == 0:
                try:
                    nf_saved = spark.conf.get(_EXCLUDED_RULES_KEY, None)
                except Exception:
                    nf_saved = None
                if not nf_saved:
                    spark.conf.set(_EXCLUDED_RULES_KEY, _NOFOLD_RULE)
                elif _NOFOLD_RULE not in nf_saved:
                    spark.conf.set(
                        _EXCLUDED_RULES_KEY, nf_saved + "," + _NOFOLD_RULE
                    )
                try:
                    sp_saved = spark.conf.get(_SHUFFLE_KEY, None)
                except Exception:
                    sp_saved = None
                if sp_saved != "1":
                    spark.conf.set(_SHUFFLE_KEY, "1")
            _NOFOLD_STATE[key] = (nf_depth + 1, nf_saved, sp_saved)
    try:
        yield
    finally:
        with _AQE_LOCK:
            if stable_source and key in _NOFOLD_STATE:
                nf_depth, nf_saved, sp_saved = _NOFOLD_STATE[key]
                if nf_depth == 1:
                    try:
                        if nf_saved:
                            spark.conf.set(_EXCLUDED_RULES_KEY, nf_saved)
                        else:
                            spark.conf.unset(_EXCLUDED_RULES_KEY)
                        if sp_saved is not None and sp_saved != "1":
                            spark.conf.set(_SHUFFLE_KEY, sp_saved)
                        elif sp_saved is None:
                            spark.conf.unset(_SHUFFLE_KEY)
                    finally:
                        del _NOFOLD_STATE[key]
                else:
                    _NOFOLD_STATE[key] = (nf_depth - 1, nf_saved, sp_saved)
            depth, saved = _AQE_STATE[key]
            if depth == 1:
                # Delete the state entry even if the restore throws (e.g.
                # stopped session) — a leaked depth-1 entry would make a
                # later session that reuses this id() skip the save/disable
                # entirely (ADVICE r13).
                try:
                    if saved != "false":
                        spark.conf.set("spark.sql.adaptive.enabled", saved)
                finally:
                    del _AQE_STATE[key]
            else:
                _AQE_STATE[key] = (depth - 1, saved)


# ---------------------------------------------------------------------------
# P1: mat-vec as a codegen'd expression (beta folded in as literals — P8)
# ---------------------------------------------------------------------------
def _vec_elems(vec, n: int) -> list[Column]:
    """The n elements of ``vec`` as Columns over ONE ArrayType literal.

    An ArrayType literal lands in the codegen ``references`` array (data),
    not the generated source, so a plan built from these elements has
    byte-identical source across different vec values — under
    ``kernel_exec(stable_source=True)`` (ConstantFolding excluded) the
    iterative solvers then hit the Janino cache every evaluation instead
    of recompiling per beta (measured +70-100 ms/evaluation saved; see
    kernel_exec). Anywhere ConstantFolding IS active (every declared
    query plan) the optimizer folds each element access back into the
    exact scalar literal the old form inlined — the optimized plans are
    byte-identical, pinned by the plans/r14 dumps. Falls back to plain
    float literals when the runtime cannot build an ndarray literal
    (pre-4.0 PySpark)."""
    try:
        arr = F.lit(np.asarray(list(vec), dtype=np.float64))
        return [arr[int(j)] for j in range(n)]
    except Exception:
        return [F.lit(float(b)) for b in list(vec)[:n]]


def matvec_expr(beta: Iterable[float], features_col: str = "features") -> Column:
    """``xb = Σ_j features[j] * beta[j]`` — unrolled, constant-folded."""
    col = F.col(features_col)
    beta = list(beta)
    elems = _vec_elems(beta, len(beta))
    terms = [col[int(j)] * elems[j] for j in range(len(beta))]
    return reduce(lambda a, b: a + b, terms)


# P9: intercept append (reference ``dask_glm/utils.py:139-162``)
def add_intercept(df: DataFrame, features_col: str = "features") -> DataFrame:
    return df.withColumn(
        features_col, F.concat(F.col(features_col), F.array(F.lit(1.0)))
    )


def infer_p(df: DataFrame, features_col: str = "features") -> int:
    with kernel_exec(df.sparkSession):
        row = df.select(F.size(F.col(features_col)).alias("p")).first()
    if row is None:
        raise ValueError("empty input DataFrame")
    return int(row["p"])


# ---------------------------------------------------------------------------
# Arrow partial-aggregation machinery (P2/P3/P5 fused, deterministic merge)
# ---------------------------------------------------------------------------
def _features_matrix(pdf: pd.DataFrame, features_col: str) -> np.ndarray:
    # np.stack over the object array of ndarrays is a single vectorized copy
    # (ADVICE r1: np.array(list(...)) looped per row inside the hot Arrow path).
    vals = pdf[features_col].to_numpy()
    return np.stack(vals).astype(np.float64, copy=False)


# Above this partition count, insert an executor-side combine stage before
# the driver merge (tree aggregation). At 10^4-10^5 partitions x wide p the
# single-level driver merge of p² Hessian partials is the bottleneck
# (VERDICT r1); below it, one level is both faster and simpler.
TREE_MERGE_THRESHOLD = 256
TREE_FANIN = 64
# Driver-pull byte budget (round 11): the count-based threshold alone let a
# p=2048 Gram job ship 32 x 34 MB = 1.03 GB of partials to the driver —
# over spark.driver.maxResultSize (measured: job abort in the wide-p
# probe). Kernels that know their partial width pass ``partial_doubles``;
# the tree merge then also triggers (with a fanin sized to fit) whenever
# nparts x row bytes would exceed this budget.
DRIVER_PULL_BUDGET_BYTES = 256 * 1024 * 1024


def _sum_partial_rows(
    rows: Iterable, columns: list[str], merges: dict | None = None
) -> dict:
    """Fold partial rows (already sorted by pid) column-wise: arrays sum
    element-wise, scalars add; a per-column entry in ``merges`` overrides
    the combine (e.g. np.minimum for a running min)."""
    acc: dict = {}
    for r in rows:
        for c in columns:
            v = r[c]
            v = np.asarray(v, dtype=np.float64) if isinstance(v, (list, tuple)) else v
            if c not in acc:
                acc[c] = v
            else:
                m = merges.get(c) if merges else None
                acc[c] = m(acc[c], v) if m is not None else acc[c] + v
    return acc


def _arrow_field_type(ddl: str):
    """Minimal Spark-DDL → pyarrow type map for partial-row schemas."""
    import pyarrow as pa

    ddl = ddl.strip()
    if ddl == "double":
        return pa.float64()
    if ddl == "int":
        return pa.int32()
    if ddl == "array<double>":
        return pa.list_(pa.float64())
    raise ValueError(f"unsupported partial field type {ddl!r}")


def _arrow_partials_generic(
    df: DataFrame,
    batch_partial_fn,
    out_fields: str,
    tree_threshold: int | None = None,
    merges: dict | None = None,
    partial_doubles: int | None = None,
    arrow_batches: bool = False,
) -> list:
    """Run ``batch_partial_fn(pdf) -> dict`` per Arrow batch, sum within the
    partition, one output row per partition.

    Partials are merged on the driver in sorted partition-id order so the
    float reduction order is run-invariant. Above ``tree_threshold``
    partitions a two-level (tree) merge combines ~TREE_FANIN partials per
    group executor-side first — the driver then folds #groups rows instead
    of #partitions (what MLlib's treeAggregate does for the same reason).
    Grouping is pid-deterministic (``pid // TREE_FANIN``) and group-internal
    order is sorted-pid, so tree results are also run-invariant.

    Shared by the dense kernels here and functions/kernels_sparse.py.

    ``arrow_batches=True`` (round 13) runs the scan stage through
    ``mapInArrow`` instead of ``mapInPandas``: ``batch_partial_fn``
    receives a ``pyarrow.RecordBatch``. For list-typed columns the
    arrow→pandas conversion allocates one small ndarray PER ROW (measured
    ~300× the cost of reading the flat Arrow buffers directly), so the
    sparse CSR kernels read offsets/values zero-copy via
    ``kernels_sparse._batch_csr_arrow``. Identical batch boundaries and
    identical flat arrays → partials are bit-identical to the pandas
    mode; only the conversion cost changes.
    """
    from pyspark import TaskContext

    value_cols = [f.split()[0] for f in out_fields.split(",")]

    def _acc_fold(acc, part):
        if acc is None:
            return dict(part)
        for k, v in part.items():
            m = merges.get(k) if merges else None
            acc[k] = m(acc[k], v) if m is not None else acc[k] + v
        return acc

    if arrow_batches:
        import pyarrow as pa

        pa_schema = pa.schema(
            [("pid", pa.int32())]
            + [
                (f.split()[0], _arrow_field_type(f.split(None, 1)[1]))
                for f in out_fields.split(",")
            ]
        )

        def op_arrow(batches):
            acc: dict | None = None
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                acc = _acc_fold(acc, batch_partial_fn(rb))
            if acc is not None:
                ctx = TaskContext.get()
                pid = ctx.partitionId() if ctx is not None else 0
                cols = [pa.array([pid], type=pa.int32())]
                for name, typ in zip(value_cols, list(pa_schema)[1:]):
                    v = acc[name]
                    if isinstance(v, np.ndarray):
                        cols.append(pa.array([v], type=typ.type))
                    else:
                        cols.append(pa.array([float(v)], type=pa.float64()))
                yield pa.RecordBatch.from_arrays(cols, schema=pa_schema)

        out = df.mapInArrow(op_arrow, schema=f"pid int, {out_fields}")
    else:

        def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc: dict | None = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                acc = _acc_fold(acc, batch_partial_fn(pdf))
            if acc is not None:
                ctx = TaskContext.get()
                pid = ctx.partitionId() if ctx is not None else 0
                row = {"pid": [pid]}
                for k, v in acc.items():
                    row[k] = [
                        v.tolist() if isinstance(v, np.ndarray) else float(v)
                    ]
                yield pd.DataFrame(row)

        out = df.mapInPandas(op, schema=f"pid int, {out_fields}")

    if tree_threshold is None:
        tree_threshold = TREE_MERGE_THRESHOLD
    nparts = df.rdd.getNumPartitions()
    # bytes-aware pull cap: tree-merge whenever the single-level driver
    # pull would exceed the byte budget, independent of partition count
    max_driver_rows = None
    if partial_doubles:
        max_driver_rows = max(
            1, DRIVER_PULL_BUDGET_BYTES // (8 * int(partial_doubles))
        )

    def make_combine(stride: int):
        def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # one output row PER KEY GROUP (pid // stride), not per task:
            # hash repartitioning can land two group keys in one task
            # (birthday collisions), and folding the whole task would
            # make the summed values depend on which keys collided —
            # per-group folding keeps every value identical regardless
            # of collision layout (review r12). The single rows.sort
            # fixes the deterministic merge order; per-chunk pre-sorts
            # were dead work.
            rows = [r for pdf in batches for r in pdf.to_dict("records")]
            if not rows:
                return
            rows.sort(key=lambda r: r["pid"])
            groups: dict[int, list] = {}
            for r in rows:
                groups.setdefault(int(r["pid"]) // stride, []).append(r)
            for key in sorted(groups):
                grp = groups[key]
                acc = _sum_partial_rows(grp, value_cols, merges)
                row = {"pid": [int(grp[0]["pid"])]}
                for c in value_cols:
                    v = acc[c]
                    row[c] = [
                        v.tolist() if isinstance(v, np.ndarray) else float(v)
                    ]
                yield pd.DataFrame(row)

        return combine

    def _needs_merge(n: int) -> bool:
        return n > tree_threshold or (
            max_driver_rows is not None and n > max_driver_rows
        )

    # Multi-level merge (ADVICE r11): fanin is capped so one key group
    # never exceeds the byte budget of partial rows — the old
    # single-level merge sized fanin to ceil(nparts/max_driver_rows),
    # which at wide p with many partitions put GBs of partials in one
    # executor task (p=2048 Gram, 1000 parts: 143 x 34 MB ≈ 4.8 GB). Now
    # fanin ≤ min(TREE_FANIN, max_driver_rows) and levels repeat until the
    # driver pull fits. Grouping stays pid-deterministic: each combined
    # row keeps its group's MIN original pid, so level L groups by
    # pid // (fanin₁·…·fanin_L) and the sorted-pid fold order is
    # run-invariant at every level. Hash-repartition collisions can still
    # co-locate 2+ key groups in one task (expected only a few; a strict
    # per-task cap would need deterministic range partitioning), but the
    # per-group combine keeps the VALUES collision-independent and each
    # group's materialized rows within fanin.
    n_rows = nparts
    stride = 1
    while _needs_merge(n_rows):
        fanin = TREE_FANIN
        if max_driver_rows is not None:
            fanin = min(fanin, max_driver_rows)
        fanin = max(fanin, 2)
        stride *= fanin
        n_rows = (n_rows + fanin - 1) // fanin
        out = out.repartition(
            n_rows, (F.col("pid") / stride).cast("int")
        ).mapInPandas(make_combine(stride), schema=f"pid int, {out_fields}")

    # Columnar retrieval (round 11): collect() boxes every float of every
    # partial row Python-side — negligible at p=5 (40 B/row) but ~84 MB of
    # boxing PER EVALUATION at wide p·k (2^16-bucket softmax, k=5: 2.6 MB
    # per partition row, 32 partitions; measured 44.1 -> 10.6 s on that
    # fit). toArrow() keeps the transfer columnar and list cells land as
    # numpy arrays; every consumer already goes through np.asarray, and
    # the pid-sorted driver fold order (the determinism contract) is
    # unchanged. toArrow is a PySpark 4.0 API — on the declared 3.5
    # minimum fall back to collect() (same values, boxed transfer).
    with kernel_exec(df.sparkSession):
        if hasattr(out, "toArrow"):
            recs = out.toArrow().to_pandas().to_dict("records")
            recs.sort(key=lambda r: int(r["pid"]))
            return recs
        rows = out.collect()
        rows.sort(key=lambda r: r["pid"])
        return rows


def _arrow_partials(
    df: DataFrame,
    features_col: str,
    label_col: str,
    partial_fn,
    out_fields: str,
    tree_threshold: int | None = None,
    weight_col: str | None = None,
    offset_col: str | None = None,
    partial_doubles: int | None = None,
) -> list:
    """Dense-features wrapper: ``partial_fn(X, y) -> dict`` per batch;
    ``weight_col`` appends a positional w argument (weighted GLM) and
    ``offset_col`` a keyword ``o=`` offset vector (both round 10)."""

    def batch_partial(pdf: pd.DataFrame) -> dict:
        X = _features_matrix(pdf, features_col)
        y = pdf[label_col].to_numpy(dtype=np.float64)
        args = [X, y]
        if weight_col is not None:
            args.append(pdf[weight_col].to_numpy(dtype=np.float64))
        kw = {}
        if offset_col is not None:
            kw["o"] = pdf[offset_col].to_numpy(dtype=np.float64)
        return partial_fn(*args, **kw)

    return _arrow_partials_generic(
        df, batch_partial, out_fields, tree_threshold,
        partial_doubles=partial_doubles,
    )


# ---------------------------------------------------------------------------
# Fused loss + gradient (the per-iteration job of lbfgs/GD/prox_grad; O4:
# loss and gradient share the xb subexpression and one scan of X)
# ---------------------------------------------------------------------------
def _loss_gradient_sql_parts(
    family,
    beta: np.ndarray,
    p: int,
    features_col: str,
    label_col: str,
    weight_col: str | None,
    offset_col: str | None,
    prefix: str = "",
) -> tuple[list[Column], list[Column]]:
    """The sql-path loss+gradient as (projection columns, aggregate
    columns) — the ONE definition, shared by ``loss_gradient`` and
    ``loss_gradient_fused`` so a fused multi-spec scan computes
    bit-identical sums (same expressions, same per-partition
    accumulation order).

    Split shape (r14, plan-stability): the beta-dependent per-row terms
    (``ll``, ``r``) are PROJECTED below the aggregate instead of inlined
    into every sum. Catalyst's subexpression elimination orders its
    extracted functions by a hash that includes literal VALUES, so an
    aggregate whose sums all embed beta emitted differently-ordered code
    per evaluation — a Janino cache miss per solver iteration even with
    the beta array literal kept out of the source. With the terms
    projected, the aggregate's expressions are literal-free (stable
    hash ⇒ stable order) and the projection's subexpressions (xb and its
    exp terms) have distinct heights (stable sort). Per-row arithmetic
    and per-partition accumulation order are unchanged, so every sum is
    bit-identical to the inlined form (pinned by
    tests/test_kernels.py::test_matvec_array_literal_bit_exact)."""
    xb = matvec_expr(beta, features_col)
    # offset/exposure (round 10, MLlib offsetCol): the linear predictor
    # becomes xb + offset — a fixed per-row term with no coefficient
    if offset_col is not None:
        xb = xb + F.col(offset_col)
    y = F.col(label_col)
    r = family.residual(xb, y)
    # weighted GLM (round 10): loss = sum(w*ll), grad = X^T (w*r) —
    # same single scan, one extra multiply inside codegen
    if weight_col is not None:
        w = F.col(weight_col)
        ll = w * family.loglike_terms(xb, y)
        r = w * r
    else:
        ll = family.loglike_terms(xb, y)
    proj = [ll.alias(f"_{prefix}ll"), r.alias(f"_{prefix}r")]
    fcol = F.col(features_col)
    rcol = F.col(f"_{prefix}r")
    # coalesce: F.sum is NULL on empty input; the arrow path returns
    # 0.0/zeros — keep both physical paths consistent (ADVICE r1).
    aggs = [
        F.coalesce(F.sum(F.col(f"_{prefix}ll")), F.lit(0.0)).alias(
            f"{prefix}loss"
        )
    ]
    aggs += [
        F.coalesce(F.sum(fcol[j] * rcol), F.lit(0.0)).alias(f"{prefix}g{j}")
        for j in range(p)
    ]
    return proj, aggs


def loss_gradient(
    df: DataFrame,
    family,
    beta: np.ndarray,
    p: int | None = None,
    features_col: str = "features",
    label_col: str = "label",
    path: str = "auto",
    weight_col: str | None = None,
    offset_col: str | None = None,
) -> tuple[float, np.ndarray]:
    beta = np.asarray(beta, dtype=np.float64)
    p = p or len(beta)
    if path == "auto":
        path = "sql" if p <= UNROLL_MAX else "arrow"
    if path == "sql":
        proj, aggs = _loss_gradient_sql_parts(
            family, beta, p, features_col, label_col, weight_col, offset_col
        )
        with kernel_exec(df.sparkSession, stable_source=True):
            row = df.select(F.col(features_col), *proj).agg(*aggs).collect()[0]
        return float(row["loss"]), np.array([row[f"g{j}"] for j in range(p)])

    def partial(X, y, w=None, o=None):
        xb = X @ beta if o is None else X @ beta + o
        if w is None:
            loss = family.loglike_np(xb, y)
            r = family.residual_np(xb, y)
        else:
            loss = float(np.dot(w, family.loglike_terms_np(xb, y)))
            r = w * family.residual_np(xb, y)
        return {"loss": loss, "grad": X.T @ r}

    rows = _arrow_partials(
        df, features_col, label_col, partial,
        "loss double, grad array<double>", weight_col=weight_col,
        offset_col=offset_col, partial_doubles=1 + p,
    )
    loss = 0.0
    grad = np.zeros(p)
    for r_ in rows:
        loss += r_["loss"]
        grad += np.asarray(r_["grad"], dtype=np.float64)
    return loss, grad


def gradient(df, family, beta, **kw) -> np.ndarray:
    return loss_gradient(df, family, beta, **kw)[1]


def loss_gradient_fused(
    df: DataFrame,
    family,
    beta: np.ndarray,
    p: int | None = None,
    specs: list[dict] | None = None,
    features_col: str = "features",
    label_col: str = "label",
) -> list[tuple[float, np.ndarray]]:
    """Several sql-path ``loss_gradient`` evaluations at the SAME beta in
    ONE scan/agg job — e.g. the weighted and the offset variant of a
    model over one frame (r14, guide §2.3 "aggregate before you shuffle"
    / §2.4: N scans sharing a source become one). Each ``specs`` entry is
    ``{"weight_col": ..., "offset_col": ...}`` (both optional). Sums are
    bit-identical to N separate ``loss_gradient`` calls: the per-spec
    expressions come from the same ``_loss_gradient_sql_parts`` builder and
    each sum's per-partition accumulation order is unchanged (pinned by
    tests/test_kernels.py::test_loss_gradient_fused_matches_separate)."""
    beta = np.asarray(beta, dtype=np.float64)
    p = p or len(beta)
    specs = specs or [{}]
    proj: list[Column] = []
    aggs: list[Column] = []
    for i, spec in enumerate(specs):
        sp, sa = _loss_gradient_sql_parts(
            family, beta, p, features_col, label_col,
            spec.get("weight_col"), spec.get("offset_col"), prefix=f"s{i}_",
        )
        proj += sp
        aggs += sa
    with kernel_exec(df.sparkSession, stable_source=True):
        row = (
            df.select(F.col(features_col), *proj).agg(*aggs).collect()[0]
        )
    return [
        (
            float(row[f"s{i}_loss"]),
            np.array([row[f"s{i}_g{j}"] for j in range(p)]),
        )
        for i in range(len(specs))
    ]


# ---------------------------------------------------------------------------
# Fused gradient + Hessian (the Newton per-iteration job)
# ---------------------------------------------------------------------------
def gradient_hessian(
    df: DataFrame,
    family,
    beta: np.ndarray,
    p: int | None = None,
    features_col: str = "features",
    label_col: str = "label",
    path: str = "auto",
    weight_col: str | None = None,
    offset_col: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    beta = np.asarray(beta, dtype=np.float64)
    p = p or len(beta)
    if path == "auto":
        # p² agg columns unroll much faster than p — lower threshold.
        path = "sql" if p <= 16 else "arrow"
    if path == "sql":
        xb = matvec_expr(beta, features_col)
        if offset_col is not None:
            xb = xb + F.col(offset_col)
        y = F.col(label_col)
        r = family.residual(xb, y)
        w = family.hess_weight(xb)
        if weight_col is not None:
            sw = F.col(weight_col)
            r = sw * r
            w = sw * w
        fcol = F.col(features_col)
        # beta-dependent per-row terms projected below the aggregate —
        # keeps the aggregate's subexpression hashes literal-free so the
        # generated source is identical across iterations (see
        # _loss_gradient_sql_parts); arithmetic and accumulation order
        # unchanged, sums bit-identical.
        pre = df.select(fcol, r.alias("_r"), w.alias("_w"))
        rcol, wcol = F.col("_r"), F.col("_w")
        aggs = [
            F.coalesce(F.sum(fcol[j] * rcol), F.lit(0.0)).alias(f"g{j}")
            for j in range(p)
        ]
        aggs += [
            F.coalesce(
                F.sum(wcol * fcol[i] * fcol[j]), F.lit(0.0)
            ).alias(f"h{i}_{j}")
            for i in range(p)
            for j in range(i, p)
        ]
        with kernel_exec(df.sparkSession, stable_source=True):
            row = pre.agg(*aggs).collect()[0]
        grad = np.array([row[f"g{j}"] for j in range(p)])
        hess = np.empty((p, p))
        for i in range(p):
            for j in range(i, p):
                hess[i, j] = hess[j, i] = row[f"h{i}_{j}"]
        return grad, hess

    def partial(X, y, sw=None, o=None):
        xb = X @ beta if o is None else X @ beta + o
        r = family.residual_np(xb, y)
        hw = family.hess_weight_np(xb)
        if sw is not None:
            r = sw * r
            hw = sw * hw
        return {
            "grad": X.T @ r,
            "hess": (X.T @ (hw[:, None] * X)).ravel(),
        }

    rows = _arrow_partials(
        df, features_col, label_col, partial,
        "grad array<double>, hess array<double>", weight_col=weight_col,
        offset_col=offset_col, partial_doubles=p + p * p,
    )
    grad = np.zeros(p)
    hess = np.zeros(p * p)
    for r_ in rows:
        grad += np.asarray(r_["grad"], dtype=np.float64)
        hess += np.asarray(r_["hess"], dtype=np.float64)
    return grad, hess.reshape(p, p)


# ---------------------------------------------------------------------------
# Hessian-vector product (round 12): Hv = Xᵀ(hw(xb) ⊙ (X·v)) — the
# matrix-free Newton-CG primitive. Serves the same ``newton`` semantics
# (reference ``algorithms.py:170-221``) without ever forming the p×p Gram:
# partials are O(p) doubles per partition regardless of p, so the kernel
# carries lbfgs's byte shape while CG recovers Newton's curvature. One
# fused scan per CG iteration (xb, hw, X·v, and the Xᵀ reduce share it).
# ---------------------------------------------------------------------------
def _hvp_arrow_partial(family, beta: np.ndarray, v: np.ndarray):
    """Per-batch closure of ``hessian_vector_product``'s arrow path as a
    factory (see ``_softmax_lg_partial``)."""
    beta = np.asarray(beta, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)

    def partial(X, y, sw=None, o=None):
        xb = X @ beta if o is None else X @ beta + o
        hw = family.hess_weight_np(xb)
        if sw is not None:
            hw = sw * hw
        return {"hv": X.T @ (hw * (X @ v))}

    return partial


def hessian_vector_product(
    df: DataFrame,
    family,
    beta: np.ndarray,
    v: np.ndarray,
    p: int | None = None,
    features_col: str = "features",
    label_col: str = "label",
    path: str = "auto",
    weight_col: str | None = None,
    offset_col: str | None = None,
) -> np.ndarray:
    beta = np.asarray(beta, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    p = p or len(beta)
    if path == "auto":
        path = "sql" if p <= UNROLL_MAX else "arrow"
    if path == "sql":
        xb = matvec_expr(beta, features_col)
        if offset_col is not None:
            xb = xb + F.col(offset_col)
        fcol = F.col(features_col)
        # per-row scalar t = hw·(X·v) projected below the aggregate for
        # iteration-stable codegen source (see _loss_gradient_sql_parts).
        # Two stacked projects: xb and xv are SAME-height matvecs whose
        # subexpression hashes both embed literal values, so one project
        # holding both re-ties the extraction order per (beta, v) —
        # aliasing xb first leaves each project with at most one
        # literal-bearing subexpression tree. Sums bit-identical.
        pre1 = df.select(
            fcol,
            xb.alias("_xb"),
            *([F.col(weight_col)] if weight_col is not None else []),
        )
        hw = family.hess_weight(F.col("_xb"))
        if weight_col is not None:
            hw = F.col(weight_col) * hw
        t = hw * matvec_expr(v, features_col)
        pre = pre1.select(fcol, t.alias("_t"))
        tcol = F.col("_t")
        aggs = [
            F.coalesce(F.sum(fcol[j] * tcol), F.lit(0.0)).alias(f"hv{j}")
            for j in range(p)
        ]
        with kernel_exec(df.sparkSession, stable_source=True):
            row = pre.agg(*aggs).collect()[0]
        return np.array([row[f"hv{j}"] for j in range(p)])

    partial = _hvp_arrow_partial(family, beta, v)

    rows = _arrow_partials(
        df, features_col, label_col, partial, "hv array<double>",
        weight_col=weight_col, offset_col=offset_col, partial_doubles=p,
    )
    hv = np.zeros(p)
    for r_ in rows:
        hv += np.asarray(r_["hv"], dtype=np.float64)
    return hv


# ---------------------------------------------------------------------------
# Multi-probe loss: k candidate betas in ONE scan (vectorized line search —
# the Spark-side improvement over the reference's one-job-per-backtrack,
# SURVEY §2.1). Arrow path: one (n,p)x(p,k) GEMM per batch.
# ---------------------------------------------------------------------------
def multi_loss(
    df: DataFrame,
    family,
    betas: list[np.ndarray],
    features_col: str = "features",
    label_col: str = "label",
    path: str = "auto",
    weight_col: str | None = None,
    offset_col: str | None = None,
    with_denom: bool = False,
) -> np.ndarray:
    """``with_denom=True`` additionally returns Σw (or the row count when
    unweighted) from the SAME scan — the CV fold scorer's per-unit
    denominator, which otherwise cost a second full pass over the split
    (r13, guide §2.1: shuffle/scan fewer bytes by fusing aggregates)."""
    k = len(betas)
    p = len(betas[0])
    if path == "auto":
        path = "sql" if p * k <= 4 * UNROLL_MAX else "arrow"
    if path == "sql":
        y = F.col(label_col)

        def _term(b):
            xb = matvec_expr(b, features_col)
            if offset_col is not None:
                xb = xb + F.col(offset_col)
            t = family.loglike_terms(xb, y)
            return F.col(weight_col) * t if weight_col is not None else t

        # per-candidate loglike terms projected below the aggregate for
        # iteration-stable codegen source at k=1, the solver-loop shape
        # (see _loss_gradient_sql_parts); sums bit-identical.
        proj = [_term(b).alias(f"_t{i}") for i, b in enumerate(betas)]
        if with_denom and weight_col is not None:
            proj.append(F.col(weight_col))
        pre = df.select(*proj)
        aggs = [
            F.coalesce(F.sum(F.col(f"_t{i}")), F.lit(0.0)).alias(f"s{i}")
            for i in range(len(betas))
        ]
        if with_denom:
            d = (
                F.sum(F.col(weight_col))
                if weight_col is not None
                else F.count("*").cast("double")
            )
            aggs.append(F.coalesce(d, F.lit(0.0)).alias("_denom"))
        with kernel_exec(df.sparkSession, stable_source=True):
            row = pre.agg(*aggs).collect()[0]
        losses_out = np.array([row[f"s{i}"] for i in range(k)])
        if with_denom:
            return losses_out, float(row["_denom"])
        return losses_out

    B = np.column_stack([np.asarray(b, dtype=np.float64) for b in betas])

    def partial(X, y, w=None, o=None):
        XB = X @ B  # (n, k)
        if o is not None:
            XB = XB + o[:, None]
        if w is None:
            losses = np.array([family.loglike_np(XB[:, i], y) for i in range(k)])
        else:
            losses = np.array(
                [np.dot(w, family.loglike_terms_np(XB[:, i], y)) for i in range(k)]
            )
        out = {"losses": losses}
        if with_denom:
            out["denom"] = float(w.sum() if w is not None else len(y))
        return out

    fields = "losses array<double>" + (", denom double" if with_denom else "")
    rows = _arrow_partials(
        df, features_col, label_col, partial, fields,
        weight_col=weight_col, offset_col=offset_col,
        partial_doubles=k + (1 if with_denom else 0),
    )
    out = np.zeros(k)
    denom = 0.0
    for r_ in rows:
        out += np.asarray(r_["losses"], dtype=np.float64)
        if with_denom:
            denom += float(r_["denom"])
    if with_denom:
        return out, denom
    return out


def multi_loss_gradient(
    df: DataFrame,
    family,
    betas: list[np.ndarray],
    features_col: str = "features",
    label_col: str = "label",
    path: str = "auto",
    weight_col: str | None = None,
    offset_col: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(losses (k,), grads (p, k)) for k candidate betas in ONE scan — the
    fused line-search probe (round 7): when the Armijo/ISTA probe also
    returns each candidate's gradient, the accepted candidate's gradient
    IS the next iteration's — so the per-iteration loss_gradient job
    disappears and GD/prox run ~one scan per iteration instead of two.
    On this box that halves the dominant ~0.2 s/job scheduling floor; at
    scale it halves passes over the data (the gradient reuses the batch
    the probe already read).

    Arrow path: XB and XᵀR are two (n,p)x(p,k)-shaped GEMMs per batch;
    partials are (k + p·k) doubles. SQL path (r14, explode form): the k
    candidates ride ONE array-of-array-literals column, ``posexplode``
    fans each row out to (candidate_id, beta_c) pairs, and a
    ``groupBy(candidate_id)`` aggregates each candidate's loss and
    gradient sums — per-candidate row arithmetic and accumulation order
    are IDENTICAL to the former unrolled k-column aggregate (bit-equal,
    pinned by tests/test_kernels.py::test_multi_loss_gradient_paths_agree
    via the unchanged 1e-12 sql/arrow parity plus the solver-trajectory
    suites), but the plan contains no per-candidate expressions, so its
    codegen source is byte-identical across iterations — the Janino-
    recompile-per-iteration problem that originally forced ``auto`` to
    ARROW (r6: gd 5.4 s sql vs 3.5 arrow) is gone at the root.

    ``auto`` now resolves like ``multi_loss``: sql while p·k stays small
    (one JVM-only job, ~300 ms/probe on this box vs ~500 ms for the
    arrow path's Python-worker round trip), arrow beyond (the explode
    multiplies row work by k; wide p·k wants the per-batch GEMMs)."""
    k = len(betas)
    p = len(betas[0])
    if path == "auto":
        path = "sql" if p * k <= 4 * UNROLL_MAX else "arrow"
    if path == "sql":
        y = F.col(label_col)
        fcol = F.col(features_col)
        cand = F.array(
            *[F.lit(np.asarray(b, dtype=np.float64)) for b in betas]
        )
        extra = [F.col(c) for c in (weight_col, offset_col) if c is not None]
        pre = df.select(
            fcol,
            y.alias("_y"),
            *extra,
            F.posexplode(cand).alias("_c", "_b"),
        )
        b = F.col("_b")
        xb = reduce(
            lambda a, c: a + c, [fcol[j] * b[j] for j in range(p)]
        )
        if offset_col is not None:
            xb = xb + F.col(offset_col)
        ll = family.loglike_terms(xb, F.col("_y"))
        r = family.residual(xb, F.col("_y"))
        if weight_col is not None:
            w = F.col(weight_col)
            ll = w * ll
            r = w * r
        pre2 = pre.select("_c", fcol, ll.alias("_ll"), r.alias("_r"))
        aggs = [F.coalesce(F.sum("_ll"), F.lit(0.0)).alias("s")]
        aggs += [
            F.coalesce(F.sum(fcol[j] * F.col("_r")), F.lit(0.0)).alias(
                f"g{j}"
            )
            for j in range(p)
        ]
        with kernel_exec(df.sparkSession, stable_source=True):
            rows = pre2.groupBy("_c").agg(*aggs).collect()
        by_c = {int(r_["_c"]): r_ for r_ in rows}
        # empty input produces zero groups: zero-fill to match the arrow
        # path's zeros and the former coalesce-0.0 per-candidate sums
        losses = np.zeros(k)
        grads = np.zeros((p, k))
        for i in range(k):
            r_ = by_c.get(i)
            if r_ is not None:
                losses[i] = r_["s"]
                for j in range(p):
                    grads[j, i] = r_[f"g{j}"]
        return losses, grads

    B = np.column_stack([np.asarray(b, dtype=np.float64) for b in betas])

    def partial(X, y, w=None, o=None):
        # Extreme line-search candidates legitimately overflow exp
        # (inf/nan losses reject themselves); silence the per-task
        # warning spam.
        with np.errstate(over="ignore", invalid="ignore"):
            XB = X @ B  # (n, k)
            if o is not None:
                XB = XB + o[:, None]
            if w is None:
                losses = np.array(
                    [family.loglike_np(XB[:, i], y) for i in range(k)]
                )
                R = np.column_stack(
                    [family.residual_np(XB[:, i], y) for i in range(k)]
                )
            else:
                losses = np.array(
                    [
                        np.dot(w, family.loglike_terms_np(XB[:, i], y))
                        for i in range(k)
                    ]
                )
                R = np.column_stack(
                    [w * family.residual_np(XB[:, i], y) for i in range(k)]
                )
            return {"losses": losses, "grads": (X.T @ R).ravel()}

    rows = _arrow_partials(
        df, features_col, label_col, partial,
        "losses array<double>, grads array<double>",
        weight_col=weight_col, offset_col=offset_col,
        partial_doubles=k + k * p,
    )
    losses = np.zeros(k)
    grads = np.zeros(p * k)
    for r_ in rows:
        losses += np.asarray(r_["losses"], dtype=np.float64)
        grads += np.asarray(r_["grads"], dtype=np.float64)
    return losses, grads.reshape(p, k)


def loss(df, family, beta, **kw) -> float:
    return float(multi_loss(df, family, [np.asarray(beta)], **kw)[0])


# ---------------------------------------------------------------------------
# Fused softmax (multinomial) loss + gradient: ALL k class gradients in ONE
# Arrow scan per iteration — the same partial-aggregation shape as P2 but
# with a (p, k) partial. Closes the reference's "multiclass broken" TODO
# (dask_glm/estimators.py:146) with a true jointly-normalized softmax
# instead of k one-vs-rest re-scans (VERDICT r6 gap #1).
# ---------------------------------------------------------------------------
def _softmax_lg_partial(B: np.ndarray):
    """Per-batch closure of ``softmax_loss_gradient`` as a factory, so a
    fused multi-kernel scan (``fused_softmax_hvp``) evaluates the
    byte-identical arithmetic the standalone kernel job runs."""
    B = np.ascontiguousarray(B, dtype=np.float64)

    def _batch(X, y, w=None):
        Z = X @ B
        m = Z.max(axis=1, keepdims=True)
        ez = np.exp(Z - m)
        se = ez.sum(axis=1)
        lse = m[:, 0] + np.log(se)
        yi = y.astype(np.int64)
        rows = np.arange(len(yi))
        ll = lse - Z[rows, yi]
        P = ez / se[:, None]
        P[rows, yi] -= 1.0
        if w is not None:
            loss = float(np.dot(w, ll))
            P = P * w[:, None]
        else:
            loss = float(ll.sum())
        return {"loss": loss, "grad": (X.T @ P).ravel()}

    return _batch


def softmax_loss_gradient(
    df: DataFrame,
    B: np.ndarray,
    features_col: str = "features",
    label_col: str = "label",
    weight_col: str | None = None,
) -> tuple[float, np.ndarray]:
    """(negative log-likelihood, (p, k) gradient) for multinomial logistic.

    ``label_col`` must hold the class INDEX in [0, k). Per Arrow batch:
    Z = X·B is one (n,p)x(p,k) GEMM, the row logsumexp is numerically
    stable (max-shifted), and the gradient is Xᵀ(softmax(Z) − onehot(y)) —
    another GEMM. Partials are (1 + p·k) doubles per partition; driver
    fold order is pid-sorted (run-invariant) like every other kernel.
    ``weight_col`` applies per-row sample weights: loss Σ w·ll and the
    per-row probability residual scales by w before the gradient GEMM."""
    B = np.ascontiguousarray(B, dtype=np.float64)
    p, k = B.shape

    partial = _softmax_lg_partial(B)

    rows_ = _arrow_partials(
        df, features_col, label_col, partial,
        "loss double, grad array<double>", weight_col=weight_col,
        partial_doubles=1 + p * k,
    )
    loss = 0.0
    grad = np.zeros(p * k)
    for r_ in rows_:
        loss += r_["loss"]
        grad += np.asarray(r_["grad"], dtype=np.float64)
    return loss, grad.reshape(p, k)


def fused_softmax_hvp(
    df: DataFrame,
    B: np.ndarray,
    family,
    beta: np.ndarray,
    v: np.ndarray,
    p: int | None = None,
    softmax_label_col: str = "_l3",
    label_col: str = "label",
    features_col: str = "features",
) -> tuple[float, np.ndarray, np.ndarray]:
    """``softmax_loss_gradient`` (over ``softmax_label_col``) +
    ``hessian_vector_product(path='arrow')`` (over ``label_col``) in ONE
    scan of the same frame (r14 pass 3, guide §2.4: two jobs sharing a
    cached source become one — q48's dense arrow gate section).

    Returns ``(smloss, smgrad (p,k), hv (p,))``, bit-identical to the two
    standalone jobs: each value's per-batch arithmetic is the unchanged
    factory closure (``_softmax_lg_partial`` / ``_hvp_arrow_partial``)
    fed the same ``_features_matrix`` X and the same float64 label pulls
    the ``_arrow_partials`` wrapper performs, batch boundaries are fixed
    by row count, and fold/merge are the shared machinery. Pinned by
    tests/test_kernels.py::test_fused_softmax_hvp_matches_separate."""
    B = np.ascontiguousarray(B, dtype=np.float64)
    pB, k = B.shape
    p = p or pB
    smb = _softmax_lg_partial(B)
    hvb = _hvp_arrow_partial(family, beta, v)

    def batch_partial(pdf: pd.DataFrame) -> dict:
        X = _features_matrix(pdf, features_col)
        d1 = smb(X, pdf[softmax_label_col].to_numpy(dtype=np.float64))
        d2 = hvb(X, pdf[label_col].to_numpy(dtype=np.float64))
        return {"smloss": d1["loss"], "smgrad": d1["grad"], "hv": d2["hv"]}

    rows = _arrow_partials_generic(
        df, batch_partial,
        "smloss double, smgrad array<double>, hv array<double>",
        partial_doubles=1 + pB * k + p,
    )
    smloss = 0.0
    smgrad = np.zeros(pB * k)
    hv = np.zeros(p)
    for r_ in rows:
        smloss += r_["smloss"]
        smgrad += np.asarray(r_["smgrad"], dtype=np.float64)
        hv += np.asarray(r_["hv"], dtype=np.float64)
    return float(smloss), smgrad.reshape(pB, k), hv


def softmax_multi_loss(
    df: DataFrame,
    Bs: list[np.ndarray],
    features_col: str = "features",
    label_col: str = "label",
    weight_col: str | None = None,
    with_denom: bool = False,
) -> np.ndarray:
    """Negative log-likelihoods of c candidate (p, k) softmax coefficient
    matrices in ONE scan (the multinomial twin of ``multi_loss`` — the
    FISTA/ISTA backtracking probe surface, round 12): per Arrow batch one
    (n,p)×(p,k) GEMM and one stable logsumexp per candidate; partials are
    c doubles per partition. ``with_denom=True`` fuses the Σw / row-count
    denominator into the same scan (r13, the ``multi_loss`` twin)."""
    mats = [np.ascontiguousarray(b, dtype=np.float64) for b in Bs]
    c = len(mats)

    def partial(X, y, w=None):
        yi = y.astype(np.int64)
        rows = np.arange(len(yi))
        losses = np.empty(c)
        with np.errstate(over="ignore", invalid="ignore"):
            for i, B in enumerate(mats):
                Z = X @ B
                m = Z.max(axis=1, keepdims=True)
                lse = m[:, 0] + np.log(np.exp(Z - m).sum(axis=1))
                ll = lse - Z[rows, yi]
                losses[i] = np.dot(w, ll) if w is not None else ll.sum()
        out = {"losses": losses}
        if with_denom:
            out["denom"] = float(w.sum() if w is not None else len(y))
        return out

    fields = "losses array<double>" + (", denom double" if with_denom else "")
    rows_ = _arrow_partials(
        df, features_col, label_col, partial, fields,
        weight_col=weight_col, partial_doubles=c + (1 if with_denom else 0),
    )
    out = np.zeros(c)
    denom = 0.0
    for r_ in rows_:
        out += np.asarray(r_["losses"], dtype=np.float64)
        if with_denom:
            denom += float(r_["denom"])
    if with_denom:
        return out, denom
    return out


def softmax_multi_loss_gradient(
    df: DataFrame,
    Bs: list[np.ndarray],
    features_col: str = "features",
    label_col: str = "label",
    weight_col: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(losses (c,), gradients (p·k, c)) for c candidate (p, k) softmax
    matrices in ONE scan — the multinomial twin of ``multi_loss_gradient``
    (round 13: the batched-λ FISTA path evaluates every λ's extrapolated
    point together). Per candidate the arithmetic is byte-for-byte
    ``softmax_loss_gradient``'s (two GEMMs + stable logsumexp), so the
    c=1 column is bit-identical to the single-candidate kernel; partials
    are c·(1 + p·k) doubles per partition."""
    mats = [np.ascontiguousarray(b, dtype=np.float64) for b in Bs]
    c = len(mats)
    p, k = mats[0].shape

    def partial(X, y, w=None):
        yi = y.astype(np.int64)
        rows = np.arange(len(yi))
        losses = np.empty(c)
        grads = np.empty((c, p * k))
        with np.errstate(over="ignore", invalid="ignore"):
            for i, B in enumerate(mats):
                Z = X @ B
                m = Z.max(axis=1, keepdims=True)
                ez = np.exp(Z - m)
                se = ez.sum(axis=1)
                lse = m[:, 0] + np.log(se)
                ll = lse - Z[rows, yi]
                P = ez / se[:, None]
                P[rows, yi] -= 1.0
                if w is not None:
                    losses[i] = float(np.dot(w, ll))
                    P = P * w[:, None]
                else:
                    losses[i] = float(ll.sum())
                grads[i] = (X.T @ P).ravel()
        return {"losses": losses, "grads": grads.ravel()}

    rows_ = _arrow_partials(
        df, features_col, label_col, partial,
        "losses array<double>, grads array<double>",
        weight_col=weight_col, partial_doubles=c * (1 + p * k),
    )
    losses = np.zeros(c)
    grads = np.zeros(c * p * k)
    for r_ in rows_:
        losses += np.asarray(r_["losses"], dtype=np.float64)
        grads += np.asarray(r_["grads"], dtype=np.float64)
    return losses, grads.reshape(c, p * k).T


def softmax_hessian_vector_product(
    df: DataFrame,
    B: np.ndarray,
    V: np.ndarray,
    features_col: str = "features",
    weight_col: str | None = None,
) -> np.ndarray:
    """Multinomial Hessian-vector product ``H(B)·V`` as a (p, k) matrix —
    the matrix-free softmax Newton-CG primitive (round 13, VERDICT r12
    #5). Per Arrow batch it is exactly TWO GEMMs (the
    ``softmax_loss_gradient`` shape): ``A = X·V``, then with P the fitted
    row probabilities the per-row curvature action is
    ``M = w ⊙ P ⊙ (A − (Σ_c P_c·A_c))`` (the ``(diag(P) − PPᵀ)``
    block applied to Vᵀx — canonical link, so observed = expected and
    the LABEL IS NEVER READ), and the partial is ``Xᵀ·M`` — p·k doubles
    per partition, no (p·k)² object anywhere. Shift-invariance note: the
    output columns sum to zero per feature (range(H) ⊥ the softmax null
    space), so CG iterates started at the gradient stay identified."""
    B = np.ascontiguousarray(B, dtype=np.float64)
    V = np.ascontiguousarray(V, dtype=np.float64)
    p, k = B.shape

    def batch_partial(pdf) -> dict:
        X = _features_matrix(pdf, features_col)
        Z = X @ B
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(axis=1, keepdims=True)
        A = X @ V
        M = P * (A - (A * P).sum(axis=1, keepdims=True))
        if weight_col is not None:
            M = M * pdf[weight_col].to_numpy(dtype=np.float64)[:, None]
        return {"hv": (X.T @ M).ravel()}

    rows_ = _arrow_partials_generic(
        df, batch_partial, "hv array<double>", partial_doubles=p * k
    )
    hv = np.zeros(p * k)
    for r_ in rows_:
        hv += np.asarray(r_["hv"], dtype=np.float64)
    return hv.reshape(p, k)


# ---------------------------------------------------------------------------
# P6: per-feature column moments (population std — numpy ddof=0 parity;
# Spark's default `stddev` is the SAMPLE std. SURVEY §7 correctness trap.)
# ---------------------------------------------------------------------------
def column_moments_full(
    df: DataFrame,
    features_col: str = "features",
    weight_col: str | None = None,
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n_rows, mean, std) in ONE Arrow partial-aggregation scan that also
    discovers p from the vectors — the solver preamble's ONLY job.

    Previously every fit paid three small jobs before iterating (infer_p
    probe + a p-wide codegen agg + admm's row count); on this box each job
    has a ~0.2 s scheduling floor, so the fusion is ~0.5 s off every fit
    wall (round 6). Partials (n, Σx, Σx², min, max) merge driver-side in
    sorted-pid order (run-invariant); std is the population form
    sqrt(max(Σx²/n − mean², 0)), then forced to EXACTLY 0.0 wherever
    min == max: the non-central form is fp-exact-zero only for the
    all-ones intercept column, so a constant non-one column could yield a
    tiny nonzero std and silently evade normalize()'s constant-column
    detection (intercept identification / multi-constant error) — the
    min/max probe rides the same scan for free (ADVICE r6).

    ``weight_col`` (ADVICE r10): mean/std become the WEIGHTED population
    moments (Σw·x/Σw, sqrt(Σw·x²/Σw − mean²)) — exactly the moments of the
    integer-weight row-replicated dataset and MLlib's weighted summarizer,
    so weighted regularized fits under ``normalize=True`` penalize in the
    replication-consistent standardized space. The returned ``n_rows``
    stays the RAW row count (it sizes physical block layout, not math);
    the min/max constant-column probe also stays raw — a column constant
    on all positive-weight rows but varying on zero-weight ones is treated
    as non-constant (documented divergence from strict replication; such
    inputs are degenerate)."""

    def batch_partial(pdf: pd.DataFrame) -> dict:
        X = _features_matrix(pdf, features_col)
        if weight_col is not None:
            w = pdf[weight_col].to_numpy(dtype=np.float64)
            Xw = X * w[:, None]
            return {
                "n": np.float64(len(X)),
                "sw": np.float64(w.sum()),
                "s": Xw.sum(axis=0),
                "ss": (Xw * X).sum(axis=0),
                "mn": X.min(axis=0),
                "mx": X.max(axis=0),
            }
        return {
            "n": np.float64(len(X)),
            "sw": np.float64(len(X)),
            "s": X.sum(axis=0),
            "ss": (X * X).sum(axis=0),
            "mn": X.min(axis=0),  # generic op skips empty batches
            "mx": X.max(axis=0),
        }

    cols = [features_col] if weight_col is None else [features_col, weight_col]
    rows = _arrow_partials_generic(
        df.select(*cols),
        batch_partial,
        "n double, sw double, s array<double>, ss array<double>, "
        "mn array<double>, mx array<double>",
        merges={"mn": np.minimum, "mx": np.maximum},
    )
    if not rows:
        raise ValueError("empty input DataFrame")
    n = 0.0
    sw = 0.0
    s = np.zeros(len(rows[0]["s"]))
    ss = np.zeros_like(s)
    mn = np.full_like(s, np.inf)
    mx = np.full_like(s, -np.inf)
    for r in rows:  # rows arrive pid-sorted: deterministic fold order
        n += r["n"]
        sw += r["sw"]
        s += np.asarray(r["s"], dtype=np.float64)
        ss += np.asarray(r["ss"], dtype=np.float64)
        mn = np.minimum(mn, np.asarray(r["mn"], dtype=np.float64))
        mx = np.maximum(mx, np.asarray(r["mx"], dtype=np.float64))
    mean = s / sw
    var = np.maximum(ss / sw - mean * mean, 0.0)
    std = np.sqrt(var)
    std[mn == mx] = 0.0  # constant columns: exact zero, robustly
    return int(n), mean, std


def column_moments(
    df: DataFrame, p: int | None = None, features_col: str = "features"
) -> tuple[np.ndarray, np.ndarray]:
    """One-shot moments. With ``p`` given: the p-wide codegen aggregate
    (stddev_pop — JVM-only, fastest over an uncached scan; the q09/q15
    gate shape). Without ``p``: delegates to the fused Arrow pass, which
    discovers p. Parity between the two forms is pytest-pinned (same
    population std to ~1e-13)."""
    if p is None:
        _, mean, std = column_moments_full(df, features_col)
        return mean, std
    fcol = F.col(features_col)
    aggs = [F.avg(fcol[j]).alias(f"m{j}") for j in range(p)]
    aggs += [F.stddev_pop(fcol[j]).alias(f"s{j}") for j in range(p)]
    with kernel_exec(df.sparkSession):
        row = df.agg(*aggs).collect()[0]
    mean = np.array([row[f"m{j}"] for j in range(p)])
    std = np.array([row[f"s{j}"] for j in range(p)])
    return mean, std


def standardize_expr(
    mean: np.ndarray, std: np.ndarray, features_col: str = "features"
) -> Column:
    """Per-element ``(x - mean_j) / std_j`` as a new features array.

    p <= UNROLL_MAX keeps the unrolled ``F.array`` form (plan-identical
    for every gated/benched width). Past that the unrolled projection is
    p element expressions in ONE codegen method — at p=2048 it blows
    Janino's 64 KB method limit (measured: InternalCompilerException from
    the round-11 wide-p probe) — so wide p switches to a ``transform``
    loop over the array with the moments as two folded array literals
    (the ``bloom_words_lit`` from_json pattern: one plan node each, not
    p Literal nodes). Values are identical; only code shape changes."""
    col = F.col(features_col)
    if len(mean) <= UNROLL_MAX:
        return F.array(
            *[
                (col[j] - float(mean[j])) / float(std[j])
                for j in range(len(mean))
            ]
        )
    import json

    m = F.from_json(
        F.lit(json.dumps([float(v) for v in mean])), "array<double>"
    )
    s = F.from_json(
        F.lit(json.dumps([float(v) for v in std])), "array<double>"
    )
    return F.transform(col, lambda x, i: (x - F.get(m, i)) / F.get(s, i))
