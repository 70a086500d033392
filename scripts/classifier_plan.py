#!/usr/bin/env python
"""Dump the .explain('formatted') plan of the fit_text_classifier DATA
frame (the featurized (features|findices/fvalues, label) input the
softmax fit consumes) — the fit itself is eager, so the declared-query
plan dumps cannot show the featurize→label join shape; this probe can.

Usage: python scripts/classifier_plan.py <out.txt> dense|sparse
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_path, mode = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from dask_glm_spark.operators import text as T
    from dask_glm_spark.session import get_spark
    from dask_glm_spark.sources.glm_source import load_table

    spark = get_spark(app_name="classifier_plan")
    docs = load_table(spark, sf_dir, "documents").repartition(8)
    if mode == "sparse":
        rows = T._sparse_rows(
            docs.withColumn("label", F.col("lang")),
            "text", "doc_id", 2 ** 13, carry_cols=("label",),
        ).where(F.size("buckets") > 0)
        data = rows.select(
            F.col("buckets").alias("findices"),
            F.col("tfs").alias("fvalues"),
            "label",
        )
    else:
        # mirror fit_text_classifier's dense branch exactly (label join
        # before r14, carry_cols after)
        try:
            feats = T.hashing_tf(
                docs.withColumn("label", F.col("lang")),
                text_col="text", id_col="doc_id", num_features=256,
                carry_cols=("label",),
            )
            data = feats.select("features", "label")
        except TypeError:  # pre-r14 signature: label joined back on id
            feats = T.hashing_tf(
                docs, text_col="text", id_col="doc_id", num_features=256
            )
            labels = docs.select("doc_id", F.col("lang").alias("label"))
            data = feats.join(labels, "doc_id").select("features", "label")
    buf = io.StringIO()
    with redirect_stdout(buf):
        data.explain("formatted")
    text = buf.getvalue()
    with open(out_path, "w") as fh:
        fh.write(text)
    print(f"{out_path}: exchanges={text.count('Exchange')} joins={text.count('Join')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
