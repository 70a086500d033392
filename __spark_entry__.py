"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship GLM fit + scoring on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2); each
callable takes (spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — the DuckDB-equivalent SQL for each query.

Design: every SQL-expressible kernel query is ONE shared ANSI-SQL string
(functions restricted to the Spark∩DuckDB dialect: ln, exp, round, pow,
stddev_pop, CASE, CAST) executed verbatim by both engines — the Spark
callable registers the raw parquet tables as temp views and runs the same
text the oracle runs. Rounding is pinned in the query text to make the
value-hashes float-stable (SURVEY.md §2.6).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Fixed kernel-check coefficients (FIXTURES.md §A): beta = [0.1,-0.2,0.3,0.05]
XB = "(0.1*f1 - 0.2*f2 + 0.3*f3 + 0.05*f4)"
SIG = f"(1/(1+exp(-{XB})))"

# glm derivation — identical text in Spark SQL and DuckDB (FIXTURES.md §A).
GLM = """glm AS (
  SELECT
    CAST(row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS BIGINT) AS id,
    l_quantity * 1.0        AS f1,
    l_extendedprice / 1e4   AS f2,
    l_discount * 10.0       AS f3,
    l_tax * 10.0            AS f4,
    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS label,
    l_quantity * 1.0        AS label_reg,
    CAST(round(l_quantity) AS DOUBLE) AS label_cnt
  FROM lineitem
)"""


def _grad_sql(residual: str, label_expr: str) -> str:
    """One-pass p-vector gradient: aggregate once, unpivot via CASE.

    Mirrors the engine's physical plan (partial+final aggregation of p
    sums in a single scan — kernels.loss_gradient sql path)."""
    sums = ", ".join(f"sum(f{j}*r) AS g{j}" for j in range(1, 5))
    case = "CASE j WHEN 1 THEN g1 WHEN 2 THEN g2 WHEN 3 THEN g3 ELSE g4 END"
    return f"""WITH {GLM},
t AS (SELECT f1, f2, f3, f4, {residual} AS r FROM (SELECT *, {label_expr} AS yy FROM glm) s),
agg AS (SELECT {sums} FROM t),
js AS (SELECT 1 AS j UNION ALL SELECT 2 UNION ALL SELECT 3 UNION ALL SELECT 4)
SELECT j, CAST(round({case}, 4) AS DOUBLE) AS g FROM agg, js ORDER BY j"""


def _gram_sql() -> str:
    """Logistic-hessian Gram entries sum(w*f_i*f_j), upper triangle, one scan."""
    pairs = [(i, j) for i in range(1, 5) for j in range(i, 5)]
    sums = ", ".join(f"sum(w*f{i}*f{j}) AS h{i}{j}" for i, j in pairs)
    whens = " ".join(
        f"WHEN i = {i} AND j = {j} THEN h{i}{j}" for i, j in pairs
    )
    ijs = " UNION ALL ".join(f"SELECT {i} AS i, {j} AS j" for i, j in pairs)
    return f"""WITH {GLM},
t AS (SELECT f1, f2, f3, f4, {SIG}*(1-{SIG}) AS w FROM glm),
agg AS (SELECT {sums} FROM t),
ijs AS ({ijs})
SELECT i, j, CAST(round(CASE {whens} END, 4) AS DOUBLE) AS h
FROM agg, ijs ORDER BY i, j"""


# --- declared correctness queries (SURVEY.md §2.6, Q1-Q15) -----------------
KERNEL_SQL: dict[str, str] = {
    # P1 mat-vec sample
    "q01_matvec": f"""WITH {GLM}
SELECT id, CAST(round({XB}, 6) AS DOUBLE) AS xb FROM glm ORDER BY id LIMIT 100""",
    # family loglike scalars (families.py:25,64,100)
    "q02_logistic_loglike": f"""WITH {GLM}
SELECT CAST(round(sum({XB} + ln(1+exp(-{XB})) - label*{XB}), 3) AS DOUBLE) AS loglike FROM glm""",
    "q03_normal_loglike": f"""WITH {GLM}
SELECT CAST(round(sum(pow(label_reg - {XB}, 2)), 3) AS DOUBLE) AS sse FROM glm""",
    "q04_poisson_loglike": f"""WITH {GLM}
SELECT CAST(round(sum(exp({XB}) - label_cnt*{XB}), 3) AS DOUBLE) AS loglike FROM glm""",
    # family gradients (families.py:45,80,117): X^T r
    "q05_logistic_gradient": _grad_sql(f"{SIG} - yy", "label"),
    "q06_normal_gradient": _grad_sql(f"2*({XB} - yy)", "label_reg"),
    "q07_poisson_gradient": _grad_sql(f"exp({XB}) - yy", "label_cnt"),
    # P3 weighted Gram / logistic hessian (families.py:51)
    "q08_gram_hessian": _gram_sql(),
    # P6 column moments — population std (utils.py:19 parity trap)
    "q09_moments": f"""WITH {GLM},
js AS (SELECT 1 AS j UNION ALL SELECT 2 UNION ALL SELECT 3 UNION ALL SELECT 4),
agg AS (SELECT avg(f1) m1, avg(f2) m2, avg(f3) m3, avg(f4) m4,
               stddev_pop(f1) s1, stddev_pop(f2) s2, stddev_pop(f3) s3, stddev_pop(f4) s4 FROM glm)
SELECT j,
  CAST(round(CASE j WHEN 1 THEN m1 WHEN 2 THEN m2 WHEN 3 THEN m3 ELSE m4 END, 6) AS DOUBLE) AS mean,
  CAST(round(CASE j WHEN 1 THEN s1 WHEN 2 THEN s2 WHEN 3 THEN s3 ELSE s4 END, 6) AS DOUBLE) AS std
FROM agg, js ORDER BY j""",
    # P4 sigmoid map (utils.py:49-51)
    "q10_sigmoid": f"""WITH {GLM}
SELECT id, CAST(round({SIG}, 6) AS DOUBLE) AS sig FROM glm ORDER BY id LIMIT 100""",
    # metrics (utils.py:172-181)
    "q11_accuracy": f"""WITH {GLM}
SELECT CAST(round(avg(CAST(CASE WHEN ({SIG} > 0.5) = (label > 0.5) THEN 1 ELSE 0 END AS DOUBLE)), 6) AS DOUBLE) AS acc
FROM glm""",
    "q12_mse": f"""WITH {GLM}
SELECT CAST(round(avg(pow(label_reg - {XB}, 2)), 6) AS DOUBLE) AS mse FROM glm""",
    "q13_poisson_deviance": f"""WITH {GLM},
t AS (SELECT label_cnt AS y, exp({XB}) AS mu FROM glm)
SELECT CAST(round(2*sum(y*ln(1 + y/mu) - (y - mu)), 3) AS DOUBLE) AS deviance FROM t""",
    # P9 intercept append (utils.py:139-162)
    "q14_add_intercept": f"""WITH {GLM}
SELECT id, f1, f2, f3, f4, CAST(1.0 AS DOUBLE) AS icpt FROM glm ORDER BY id LIMIT 100""",
    # O1 standardization rewrite (utils.py:31) — scale/center by moments
    "q15_standardize": f"""WITH {GLM},
stats AS (SELECT avg(f1) m1, avg(f2) m2, avg(f3) m3, avg(f4) m4,
                 stddev_pop(f1) s1, stddev_pop(f2) s2, stddev_pop(f3) s3, stddev_pop(f4) s4 FROM glm)
SELECT id,
  CAST(round((f1-m1)/s1, 6) AS DOUBLE) AS z1,
  CAST(round((f2-m2)/s2, 6) AS DOUBLE) AS z2,
  CAST(round((f3-m3)/s3, 6) AS DOUBLE) AS z3,
  CAST(round((f4-m4)/s4, 6) AS DOUBLE) AS z4
FROM glm, stats ORDER BY id LIMIT 100""",
}


def _register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = ("lineitem",)
) -> None:
    """Register only the tables a query actually references (VERDICT r1 #1:
    loading all 10 tables made every kernel query die on `events`, a table
    none of them touch)."""
    from dask_glm_spark.sources.glm_source import load_table

    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def _sql_runner(
    sql: str, tables: tuple[str, ...] = ("lineitem",)
) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register_tables(spark, sf_dir, tables)
        return spark.sql(sql)

    return run


# ---------------------------------------------------------------------------
# Engine-backed Spark runners (ADVICE r1, medium): the Spark side of each
# correctness check runs the ENGINE's kernel/family/metric code — the same
# functions every solver iteration calls — not the oracle's SQL text.  The
# DuckDB oracle (KERNEL_SQL above) stays the independent formulation, so the
# gate now validates the implementation, not Spark/DuckDB dialect agreement.
# Rounding is applied as Spark expressions (F.round) so half-away-from-zero
# semantics match both engines; driver-side scalars/vectors from the kernels
# are re-wrapped in tiny DataFrames at full precision, then rounded in Spark.
# ---------------------------------------------------------------------------
BETA = [0.1, -0.2, 0.3, 0.05]  # fixed kernel-check coefficients (FIXTURES.md §A)


def _glm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_glm_spark.sources.glm_source import load_glm

    return load_glm(spark, sf_dir)


def _scalar_df(spark: SparkSession, value: float, name: str, digits: int) -> DataFrame:
    from pyspark.sql import functions as F

    return spark.range(1).select(
        F.round(F.lit(float(value)), digits).cast("double").alias(name)
    )


def _q_matvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dask_glm_spark.functions import kernels

    df = _glm(spark, sf_dir)
    return (
        df.select(
            "id", F.round(kernels.matvec_expr(BETA), 6).cast("double").alias("xb")
        )
        .orderBy("id")
        .limit(100)
    )


def _q_loglike(family_name: str, label_col: str, out_name: str, digits: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dask_glm_spark.functions import kernels
        from dask_glm_spark.functions.families import FAMILIES

        df = _glm(spark, sf_dir)
        val = kernels.loss(df, FAMILIES[family_name], BETA, label_col=label_col)
        return _scalar_df(spark, val, out_name, digits)

    return run


def _q_gradient(family_name: str, label_col: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F

        from dask_glm_spark.functions import kernels
        from dask_glm_spark.functions.families import FAMILIES

        df = _glm(spark, sf_dir)
        g = kernels.gradient(df, FAMILIES[family_name], BETA, label_col=label_col)
        rows = [(j + 1, float(g[j])) for j in range(len(g))]
        return (
            spark.createDataFrame(rows, "j int, g double")
            .select("j", F.round("g", 4).cast("double").alias("g"))
            .orderBy("j")
        )

    return run


def _q_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dask_glm_spark.functions import kernels
    from dask_glm_spark.functions.families import Logistic

    df = _glm(spark, sf_dir)
    _, hess = kernels.gradient_hessian(df, Logistic, BETA, label_col="label")
    p = hess.shape[0]
    rows = [(i + 1, j + 1, float(hess[i, j])) for i in range(p) for j in range(i, p)]
    return (
        spark.createDataFrame(rows, "i int, j int, h double")
        .select("i", "j", F.round("h", 4).cast("double").alias("h"))
        .orderBy("i", "j")
    )


def _q_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dask_glm_spark.functions import kernels

    df = _glm(spark, sf_dir)
    mean, std = kernels.column_moments(df, p=4)
    rows = [(j + 1, float(mean[j]), float(std[j])) for j in range(4)]
    return (
        spark.createDataFrame(rows, "j int, mean double, std double")
        .select(
            "j",
            F.round("mean", 6).cast("double").alias("mean"),
            F.round("std", 6).cast("double").alias("std"),
        )
        .orderBy("j")
    )


def _q_sigmoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dask_glm_spark.functions import kernels
    from dask_glm_spark.functions.families import sigmoid_expr

    df = _glm(spark, sf_dir)
    return (
        df.select(
            "id",
            F.round(sigmoid_expr(kernels.matvec_expr(BETA)), 6)
            .cast("double")
            .alias("sig"),
        )
        .orderBy("id")
        .limit(100)
    )


def _q_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dask_glm_spark.functions import kernels, metrics
    from dask_glm_spark.functions.families import sigmoid_expr

    df = _glm(spark, sf_dir)
    scored = df.select(
        (sigmoid_expr(kernels.matvec_expr(BETA)) > 0.5).cast("double").alias("pred"),
        (F.col("label") > 0.5).cast("double").alias("truth"),
    )
    val = metrics.accuracy_score(scored, "truth", "pred")
    return _scalar_df(spark, val, "acc", 6)


def _q_mse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_glm_spark.functions import kernels, metrics

    df = _glm(spark, sf_dir)
    scored = df.select(
        kernels.matvec_expr(BETA).alias("pred"), df["label_reg"].alias("truth")
    )
    val = metrics.mean_squared_error(scored, "truth", "pred")
    return _scalar_df(spark, val, "mse", 6)


def _q_poisson_deviance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dask_glm_spark.functions import kernels, metrics

    df = _glm(spark, sf_dir)
    scored = df.select(
        F.exp(kernels.matvec_expr(BETA)).alias("mu"), df["label_cnt"].alias("y")
    )
    val = metrics.poisson_deviance(scored, "y", "mu")
    return _scalar_df(spark, val, "deviance", 3)


def _q_add_intercept(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dask_glm_spark.functions import kernels

    df = kernels.add_intercept(_glm(spark, sf_dir))
    fc = F.col("features")
    return (
        df.select(
            "id",
            fc[0].alias("f1"),
            fc[1].alias("f2"),
            fc[2].alias("f3"),
            fc[3].alias("f4"),
            fc[4].alias("icpt"),
        )
        .orderBy("id")
        .limit(100)
    )


def _q_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dask_glm_spark.functions import kernels

    df = _glm(spark, sf_dir)
    mean, std = kernels.column_moments(df, p=4)
    z = kernels.standardize_expr(mean, std)
    return (
        df.withColumn("z", z)
        .select(
            "id",
            *[
                F.round(F.col("z")[j], 6).cast("double").alias(f"z{j + 1}")
                for j in range(4)
            ],
        )
        .orderBy("id")
        .limit(100)
    )


ENGINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_matvec": _q_matvec,
    "q02_logistic_loglike": _q_loglike("logistic", "label", "loglike", 3),
    "q03_normal_loglike": _q_loglike("normal", "label_reg", "sse", 3),
    "q04_poisson_loglike": _q_loglike("poisson", "label_cnt", "loglike", 3),
    "q05_logistic_gradient": _q_gradient("logistic", "label"),
    "q06_normal_gradient": _q_gradient("normal", "label_reg"),
    "q07_poisson_gradient": _q_gradient("poisson", "label_cnt"),
    "q08_gram_hessian": _q_gram,
    "q09_moments": _q_moments,
    "q10_sigmoid": _q_sigmoid,
    "q11_accuracy": _q_accuracy,
    "q12_mse": _q_mse,
    "q13_poisson_deviance": _q_poisson_deviance,
    "q14_add_intercept": _q_add_intercept,
    "q15_standardize": _q_standardize,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: logistic regression fit (newton) on sf0.001 + lazy scoring.

    Returns the per-class calibration summary of the fitted model — small,
    stable schema, exercises ingest -> kernels -> solver -> predict."""
    from pyspark.sql import functions as F

    from dask_glm_spark.operators.estimators import LogisticRegression
    from dask_glm_spark.sources.glm_source import load_glm_fast

    df = load_glm_fast(spark, "/root/testdata/sf0.001")
    lr = LogisticRegression(solver="newton", max_iter=20).fit(df)
    pred = lr.predict(df)
    return (
        pred.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.avg("probability").alias("avg_probability"),
            F.avg("prediction").alias("avg_prediction"),
        )
        .orderBy("label")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(ENGINE_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(KERNEL_SQL)
