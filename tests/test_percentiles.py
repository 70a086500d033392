"""token_percentiles: exact path vs numpy, approx path contract."""

from __future__ import annotations

import numpy as np
import pytest

from dask_glm_spark.operators.text import token_percentiles


@pytest.fixture()
def docs(spark):
    rows = [
        (i, "src%d" % (i % 2), " ".join(["w"] * (5 + (i * 7) % 40)))
        for i in range(100)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_cont_matches_numpy_linear(docs):
    got = {
        r["source"]: r
        for r in token_percentiles(docs, by="source", method="cont").collect()
    }
    pdf = docs.toPandas()
    for src, grp in pdf.groupby("source"):
        n_tok = grp["text"].str.split().str.len().to_numpy(float)
        row = got[src]
        assert row["n_docs"] == len(n_tok)
        assert row["max_tokens"] == int(n_tok.max())
        for q in (25, 50, 90, 99):
            assert row[f"p{q}"] == pytest.approx(
                round(float(np.percentile(n_tok, q)), 4), abs=1e-9
            )


def test_disc_matches_numpy_inverted_cdf(docs):
    got = {
        r["source"]: r
        for r in token_percentiles(docs, by="source", method="disc").collect()
    }
    pdf = docs.toPandas()
    for src, grp in pdf.groupby("source"):
        n_tok = np.sort(grp["text"].str.split().str.len().to_numpy(float))
        row = got[src]
        for q in (25, 50, 90, 99):
            # percentile_disc: smallest value with CDF >= q
            k = int(np.ceil(q / 100 * len(n_tok))) - 1
            assert row[f"p{q}"] == n_tok[max(k, 0)]


def test_approx_same_schema_and_close(docs):
    exact = token_percentiles(docs, by="source", method="cont")
    approx = token_percentiles(docs, by="source", method="approx")
    assert exact.columns == approx.columns
    e = {r["source"]: r for r in exact.collect()}
    a = {r["source"]: r for r in approx.collect()}
    for src in e:
        # small groups: the sketch is near-exact; generous tolerance
        assert a[src]["p50"] == pytest.approx(e[src]["p50"], rel=0.2)


def test_bad_method_raises(docs):
    with pytest.raises(ValueError):
        token_percentiles(docs, method="nope")
