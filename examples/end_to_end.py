"""End-to-end example: CSV ingest -> filter -> fit -> score -> sink.

The analogue of the reference's executable docs (dask-glm
``docs/examples/basic_api.ipynb`` cells 4-12: ``dd.read_csv`` a taxi CSV,
filter rows, assemble ``.values``, fit, score). Spark-first version of the
same workflow over the synthetic lineitem table:

1. export a raw CSV (stand-in for "data lands as CSV somewhere"),
2. ``ingest.read_csv`` with a pre-assembly filter — the filter and the
   column projection reach the scan, so only referenced bytes are read,
3. ``LogisticRegression().fit`` (lbfgs), 4. accuracy score,
5. partitioned parquet sink of the per-row predictions.

Run directly:  python examples/end_to_end.py [sf_dir] [workdir]
Asserted in CI: tests/test_example.py (must finish in well under 60 s).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

RAW_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag"]


def main(sf_dir: str = "/root/testdata/sf0.001", workdir: str | None = None):
    from dask_glm_spark import LogisticRegression
    from dask_glm_spark.sources import ingest
    from dask_glm_spark.sources.glm_source import load_table

    workdir = workdir or tempfile.mkdtemp(prefix="dask_glm_spark_example_")
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("end_to_end_example")
        .getOrCreate()
    )

    # 1. land the raw data as CSV (the reference example's starting point)
    csv_dir = f"{workdir}/raw_csv"
    load_table(spark, sf_dir, "lineitem").select(RAW_COLS).write.mode(
        "overwrite"
    ).option("header", True).csv(csv_dir)

    # 2. CSV ingest with a pre-assembly filter; label = "was returned"
    df = ingest.read_csv(
        spark,
        csv_dir,
        feature_cols=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        label=(F.col("l_returnflag") == "R").cast("double"),
        where=F.col("l_quantity") > 1,
    )

    # 3. fit / 4. score (accuracy + distributed ROC AUC — round 7)
    lr = LogisticRegression(solver="lbfgs", regularizer=None, max_iter=50).fit(df)
    acc = lr.score(df)
    auc = lr.get_auc(df)

    # 3b. true multinomial over a derived 3-way label (same cached input;
    # one fused scan per L-BFGS evaluation computes all class gradients)
    from dask_glm_spark import SoftmaxRegression

    df3 = df.withColumn(
        "label",
        F.when(F.col("features")[0] < 10, 0.0)
        .when(F.col("features")[0] < 30, 1.0)
        .otherwise(2.0),
    )
    sm = SoftmaxRegression(solver="lbfgs", regularizer=None).fit(df3)
    sm_acc = sm.score(df3)

    # 5. partitioned predictions sink
    out_dir = f"{workdir}/predictions"
    ingest.write_parquet(
        lr.predict(df).withColumn("bucket", F.col("prediction").cast("int")),
        out_dir,
        partition_by=["bucket"],
    )

    # 6. persist the model and score elsewhere from the JSON artifact
    # (fit-once / score-anywhere — no pickle, human-readable)
    from dask_glm_spark.operators.estimators import load_model, save_model

    model_path = f"{workdir}/model.json"
    save_model(lr, model_path)
    acc2 = load_model(model_path).score(df)
    assert acc2 == acc

    print(f"coef={lr.coef_} intercept={lr.intercept_} accuracy={acc:.4f} auc={auc:.4f}")
    print(f"softmax 3-class accuracy={sm_acc:.4f} classes={sm.classes_}")
    print(f"predictions written to {out_dir}; model saved to {model_path}")
    return lr.coef_, float(acc)


if __name__ == "__main__":
    main(*sys.argv[1:])
