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
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: _sql_runner(sql) for name, sql in KERNEL_SQL.items()
    }
    return out


def oracle_sql() -> dict[str, str]:
    return dict(KERNEL_SQL)
