"""Deterministic sampling: reproducibility, rate accuracy, disjointness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_glm_spark.operators.sampling import (
    hash_sample,
    sample_bucket_expr,
    stratified_sample,
    train_test_split,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).select(F.col("id").alias("doc_id"))


def test_sample_is_deterministic_across_partitionings(ids):
    a = sorted(r["doc_id"] for r in hash_sample(ids, "doc_id", 30).collect())
    b = sorted(
        r["doc_id"]
        for r in hash_sample(ids.repartition(13), "doc_id", 30).collect()
    )
    assert a == b and len(a) > 0


def test_sample_rate_within_tolerance(ids):
    n = hash_sample(ids, "doc_id", 30).count()
    assert abs(n / 5000 - 0.30) < 0.03


def test_distinct_salts_are_independent(ids):
    a = {r["doc_id"] for r in hash_sample(ids, "doc_id", 50, salt="a").collect()}
    b = {r["doc_id"] for r in hash_sample(ids, "doc_id", 50, salt="b").collect()}
    overlap = len(a & b) / 5000
    # independent 50% samples overlap ~25%
    assert 0.15 < overlap < 0.35
    assert a != b


def test_rate_bounds_validated(ids):
    with pytest.raises(ValueError):
        hash_sample(ids, "doc_id", 101)
    with pytest.raises(ValueError):
        stratified_sample(ids, "doc_id", {"x": -1})
    with pytest.raises(ValueError):
        train_test_split(ids, "doc_id", 0)


def test_stratified_rates_and_default(spark):
    rows = [(i, "en" if i % 2 == 0 else ("de" if i % 4 == 1 else "xx")) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = stratified_sample(
        df, "lang", {"en": 80, "de": 20}, default_pct=0
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert abs(by_lang["en"] / 2000 - 0.80) < 0.05
    assert abs(by_lang["de"] / 1000 - 0.20) < 0.05
    assert "xx" not in by_lang  # default 0: unknown strata dropped


def test_train_test_split_disjoint_exhaustive(ids):
    train, test = train_test_split(ids, "doc_id", test_pct=20)
    tr = {r["doc_id"] for r in train.collect()}
    te = {r["doc_id"] for r in test.collect()}
    assert tr.isdisjoint(te)
    assert len(tr) + len(te) == 5000
    assert abs(len(te) / 5000 - 0.20) < 0.03


def test_split_boundary_is_narrow_plan(ids):
    # membership must be a filter on the scan: no Exchange in the plan
    train, _ = train_test_split(ids, "doc_id", test_pct=20)
    plan = train._sc._jvm.PythonSQLUtils.explainString(
        train._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan


def test_bucket_expr_range(ids):
    row = ids.select(
        F.min(sample_bucket_expr("doc_id")).alias("lo"),
        F.max(sample_bucket_expr("doc_id")).alias("hi"),
    ).collect()[0]
    assert 0 <= row["lo"] and row["hi"] <= 99


def test_null_keys_are_not_silently_dropped(spark):
    """Review r5: a NULL key hashes via a sentinel instead of
    null-propagating — the split stays exhaustive and rate=100 keeps all."""
    from dask_glm_spark.operators.sampling import hash_sample, train_test_split

    df = spark.createDataFrame([(1,), (2,), (None,)], "doc_id long")
    train, test = train_test_split(df, "doc_id", test_pct=10)
    assert train.count() + test.count() == 3
    assert hash_sample(df, "doc_id", 100).count() == 3


def test_stratified_default_pct_validated(spark):
    import pytest as _pytest

    from dask_glm_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with _pytest.raises(ValueError, match="default_pct"):
        stratified_sample(df, "lang", {"en": 60}, default_pct=150)


# --- weighted_sample_k -------------------------------------------------

_P = 1_000_000_007


def _ph(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % _P
    return h


def _ws_twin_key(key, weight, salt):
    """Driver-side twin of weighted_sample_k's sort key (polyhash +
    Fibonacci mix, Gumbel-form priority, 9dp half-up rounding)."""
    import math

    b = ((_ph(f"{salt}:{key}") * 2654435761) % (1 << 32)) >> 12
    u = (b + 0.5) / float(1 << 20)
    x = math.log(-math.log(u)) - math.log(weight)
    return math.floor(x * 1e9 + 0.5) / 1e9


def _ws_twin_select(rows, k, salt):
    """rows: (group, key, weight) -> set of selected keys (top-k per
    group by (sortkey, key), positive weights only)."""
    from collections import defaultdict

    per = defaultdict(list)
    for g, key, w in rows:
        if w is not None and w > 0:
            per[g].append((_ws_twin_key(key, w, salt), key))
    out = set()
    for g, lst in per.items():
        lst.sort()
        out.update(key for _, key in lst[:k])
    return out


@pytest.fixture(scope="module")
def weighted_docs(spark):
    rows = [
        (i, ["a", "b", "c"][i % 3], float(1 + (i * 7) % 40)) for i in range(300)
    ]
    # a few degenerate weights: null, zero, negative — never sampled
    rows += [
        (1000, "a", None), (1001, "b", 0.0), (1002, "c", -3.0),
        (1003, "a", float("nan")),  # Spark orders NaN above every double
    ]
    return spark.createDataFrame(
        rows, "doc_id long, grp string, w double"
    ).persist()


def test_weighted_sample_matches_twin_and_is_layout_stable(weighted_docs):
    from dask_glm_spark.operators.sampling import weighted_sample_k

    base = [(r["grp"], r["doc_id"], r["w"]) for r in weighted_docs.collect()]
    want = _ws_twin_select(base, 10, "wt")
    got = {
        r["doc_id"]
        for r in weighted_sample_k(
            weighted_docs, 10, "w", by="grp", key_col="doc_id", salt="wt"
        ).collect()
    }
    assert got == want
    got2 = {
        r["doc_id"]
        for r in weighted_sample_k(
            weighted_docs.repartition(17), 10, "w", by="grp",
            key_col="doc_id", salt="wt",
        ).collect()
    }
    assert got2 == want  # partitioning-independent
    assert not got & {1000, 1001, 1002, 1003}  # degenerate weights excluded
    # exactly k per group (groups are 100-strong)
    per = weighted_sample_k(
        weighted_docs, 10, "w", by="grp", key_col="doc_id", salt="wt"
    ).groupBy("grp").count().collect()
    assert sorted((r["grp"], r["count"]) for r in per) == [
        ("a", 10), ("b", 10), ("c", 10)
    ]


def test_weighted_sample_small_group_and_global(weighted_docs, spark):
    from dask_glm_spark.operators.sampling import weighted_sample_k

    tiny = spark.createDataFrame(
        [(1, "g", 2.0), (2, "g", 5.0)], "doc_id long, grp string, w double"
    )
    assert weighted_sample_k(tiny, 10, "w", by="grp").count() == 2
    # by=None ranks globally (distributed TakeOrdered)
    base = [("*", r["doc_id"], r["w"]) for r in weighted_docs.collect()]
    want = _ws_twin_select(base, 25, "gl")
    got = {
        r["doc_id"]
        for r in weighted_sample_k(
            weighted_docs, 25, "w", key_col="doc_id", salt="gl"
        ).collect()
    }
    assert got == want and len(got) == 25


def test_weighted_sample_inclusion_tracks_weight():
    """Statistical contract on the (twin of the) exact formula: with k=1
    the winner is drawn with probability w_i/Σw (Efraimidis–Spirakis).
    Runs driver-side over many salts — the Spark path is pinned to this
    twin by test_weighted_sample_matches_twin_and_is_layout_stable."""
    rows = [("g", i, 10.0 if i < 10 else 1.0) for i in range(110)]
    # Σw = 200; P(heavy wins) = 100/200 = 0.5
    heavy_wins = sum(
        1
        for s in range(400)
        if min(_ws_twin_select(rows, 1, f"s{s}")) < 10
    )
    assert 0.40 < heavy_wins / 400 < 0.60


def test_weighted_sample_keys_only_matches_join_back(weighted_docs):
    from dask_glm_spark.operators.sampling import weighted_sample_k

    full = weighted_sample_k(
        weighted_docs, 10, "w", by="grp", key_col="doc_id", salt="wt"
    )
    keys = weighted_sample_k(
        weighted_docs, 10, "w", by="grp", key_col="doc_id", salt="wt",
        keys_only=True,
    )
    assert {r["doc_id"] for r in keys.collect()} == {
        r["doc_id"] for r in full.collect()
    }
    # carried weights are the source weights
    w_by_id = {r["doc_id"]: r["w"] for r in weighted_docs.collect()}
    for r in keys.collect():
        assert r["weight"] == w_by_id[r["doc_id"]]
    # global variant too
    g = weighted_sample_k(
        weighted_docs, 7, "w", key_col="doc_id", salt="gl", keys_only=True
    ).collect()
    assert len(g) == 7 and all(r["weight"] == w_by_id[r["doc_id"]] for r in g)


def test_weighted_sample_multi_column_group(spark):
    from dask_glm_spark.operators.sampling import weighted_sample_k

    rows = [
        (i, ["x", "y"][i % 2], ["p", "q"][(i // 2) % 2], float(1 + i % 9))
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "doc_id long, a string, b string, w double")
    got = weighted_sample_k(
        df, 5, "w", by=["a", "b"], key_col="doc_id", salt="mc"
    )
    per = {
        (r["a"], r["b"]): r["count"]
        for r in got.groupBy("a", "b").count().collect()
    }
    assert per == {(x, y): 5 for x in "xy" for y in "pq"}
    # keys_only carries both group columns
    keys = weighted_sample_k(
        df, 5, "w", by=["a", "b"], key_col="doc_id", salt="mc", keys_only=True
    )
    assert set(keys.columns) == {"a", "b", "doc_id", "weight"}
    assert {r["doc_id"] for r in keys.collect()} == {
        r["doc_id"] for r in got.collect()
    }


def test_sample_k_per_group_uniform(spark):
    from dask_glm_spark.operators.sampling import sample_k_per_group

    df = spark.createDataFrame(
        [(i, ["g1", "g2"][i % 2]) for i in range(200)],
        "doc_id long, grp string",
    )
    got = sample_k_per_group(df, 15, by="grp")
    per = {r["grp"]: r["count"] for r in got.groupBy("grp").count().collect()}
    assert per == {"g1": 15, "g2": 15}
    # deterministic across layouts
    a = {r["doc_id"] for r in got.collect()}
    b = {r["doc_id"] for r in sample_k_per_group(df.repartition(9), 15, by="grp").collect()}
    assert a == b


def test_shuffled_is_deterministic_and_layout_independent(spark):
    """shuffled(): the collected row order is a pure function of keys and
    salt — identical across input layouts and reruns, different under a
    different salt, a permutation of the input either way."""
    from dask_glm_spark.operators.sampling import shuffled

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    o1 = [r["doc_id"] for r in shuffled(df, n_partitions=7).collect()]
    o2 = [
        r["doc_id"]
        for r in shuffled(df.repartition(13), n_partitions=7).collect()
    ]
    o3 = [r["doc_id"] for r in shuffled(df, n_partitions=7).collect()]
    assert o1 == o2 == o3
    assert sorted(o1) == list(range(500))
    assert o1 != list(range(500))  # actually shuffled
    oe = [
        r["doc_id"]
        for r in shuffled(df, salt="epoch1", n_partitions=7).collect()
    ]
    assert sorted(oe) == list(range(500)) and oe != o1  # fresh epoch order


def test_shuffled_matches_hash_order(spark):
    """The order IS ascending (uniform_unit, key) — verified against the
    expression itself."""
    from dask_glm_spark.operators.sampling import shuffled, uniform_unit_expr

    df = spark.range(300).select(F.col("id").alias("doc_id"))
    got = [r["doc_id"] for r in shuffled(df, n_partitions=5).collect()]
    want = [
        r["doc_id"]
        for r in df.select(
            "doc_id", uniform_unit_expr("doc_id", "epoch0").alias("_u")
        )
        .orderBy("_u", "doc_id")
        .collect()
    ]
    assert got == want


def test_shuffled_plan_has_no_global_sort(spark):
    """Plan shape: one range exchange + in-partition sort — a global
    single-task sort would be the 100-TB anti-pattern."""
    from dask_glm_spark.operators.sampling import shuffled
    from dask_glm_spark.plans.audit import explain_str

    df = spark.range(100).select(F.col("id").alias("doc_id"))
    plan = explain_str(shuffled(df, n_partitions=4), "formatted")
    assert "rangepartitioning" in plan.lower()
    import re

    # formatted Sort node: "Arguments: [...], <global>, 0"
    flags = re.findall(r"\], (true|false), \d+", plan)
    assert flags, f"no Sort node found in plan:\n{plan}"
    assert all(f == "false" for f in flags), f"global sort in plan:\n{plan}"


def test_interleave_by_weight_prefix_proportions(spark):
    """A 3:1 weighted interleave puts ~75% of source-a rows in every
    prefix — checked at the 20% and 50% marks — while a uniform shuffle
    of the same frame sits at ~50%. Deterministic, so the bounds are
    exact-once-measured, not flake-prone."""
    from dask_glm_spark.operators.sampling import interleave_by_weight

    rows = [(i, "a" if i < 2000 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    w = F.when(F.col("src") == "a", 3.0).otherwise(1.0)
    order = [r["src"] for r in interleave_by_weight(df, w, n_partitions=6).collect()]
    assert len(order) == 4000
    for frac in (0.2, 0.5):
        pre = order[: int(4000 * frac)]
        share_a = pre.count("a") / len(pre)
        assert 0.68 <= share_a <= 0.82, f"prefix {frac}: share_a={share_a}"


def test_interleave_layout_independent_and_drops_bad_weights(spark):
    from dask_glm_spark.operators.sampling import interleave_by_weight

    rows = [(i, float(1 + i % 3)) for i in range(300)] + [
        (1000, 0.0),
        (1001, -1.0),
        (1002, float("nan")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    o1 = [r["doc_id"] for r in interleave_by_weight(df, "w", n_partitions=5).collect()]
    o2 = [
        r["doc_id"]
        for r in interleave_by_weight(df.repartition(13), "w", n_partitions=5).collect()
    ]
    assert o1 == o2
    assert sorted(o1) == list(range(300))  # bad-weight rows dropped


def test_quantile_band_mixture(spark):
    """Head/middle/tail by score: explicit thresholds reproduce the band
    split exactly; derived thresholds land near the requested quantiles;
    rates apply per band via the deterministic key hash; NULL/NaN scores
    fall in b0."""
    from dask_glm_spark.operators.sampling import (
        band_by_thresholds_expr,
        quantile_band_expr,
        stratified_sample_by_quantile,
    )

    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") / n).cast("double").alias("q")
    )
    band, thr = quantile_band_expr(df, "q", [0.3, 0.7])
    assert len(thr) == 2 and 0.25 < thr[0] < 0.35 and 0.65 < thr[1] < 0.75
    counts = {
        r["_b"]: r["n"]
        for r in df.select(band.alias("_b")).groupBy("_b").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert set(counts) == {"b0", "b1", "b2"}
    assert abs(counts["b0"] - 0.3 * n) < 0.02 * n
    assert abs(counts["b2"] - 0.3 * n) < 0.02 * n

    # keep the whole head, drop the tail, thin the middle
    kept = stratified_sample_by_quantile(
        df, "q", [0.3, 0.7], {"b2": 100, "b1": 50, "b0": 0}
    )
    got = {r["doc_id"] for r in kept.collect()}
    head = {r["doc_id"] for r in df.where(F.col("q") >= thr[1]).collect()}
    tail = {r["doc_id"] for r in df.where(F.col("q") < thr[0]).collect()}
    assert head <= got and not (tail & got)
    mid_kept = len(got) - len(head)
    mid_total = n - len(head) - len(tail)
    assert abs(mid_kept / mid_total - 0.5) < 0.1

    # explicit thresholds: identical output, zero threshold job
    again = {
        r["doc_id"]
        for r in stratified_sample_by_quantile(
            df, "q", [0.3, 0.7], {"b2": 100, "b1": 50, "b0": 0},
            thresholds=thr,
        ).collect()
    }
    assert again == got

    # NULL and NaN scores land in b0 (and are droppable there)
    weird = spark.createDataFrame(
        [(1, None), (2, float("nan")), (3, 0.99)], "doc_id long, q double"
    )
    bands = {
        r["doc_id"]: r["_b"]
        for r in weird.select(
            "doc_id", band_by_thresholds_expr("q", thr).alias("_b")
        ).collect()
    }
    assert bands[1] == "b0" and bands[2] == "b0" and bands[3] == "b2"
    import pytest as _pt

    with _pt.raises(ValueError, match="edges"):
        quantile_band_expr(df, "q", [0.7, 0.3])


def test_downsample_to_mixture(spark):
    """Post-sample proportions track the target, the binding group keeps
    ~100%, untargeted groups drop, layouts agree, validation raises."""
    from dask_glm_spark.operators.sampling import downsample_to_mixture

    # 6000 web / 1000 code / 500 junk; target web:code = 7:3
    df = spark.range(7500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 6000, "web")
        .when(F.col("id") < 7000, "code")
        .otherwise("junk")
        .alias("source"),
    )
    kept, rates = downsample_to_mixture(df, {"web": 7, "code": 3})
    # binding group: code (1000/3 < 6000/7) -> kept whole
    assert rates["code"] == 1.0
    assert abs(rates["web"] - (1000 / 3) * 7 / 6000) < 1e-9
    got = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert "junk" not in got
    assert got["code"] == 1000
    web_expected = 6000 * rates["web"]
    assert abs(got["web"] - web_expected) < 0.1 * web_expected
    # ~7:3 achieved
    assert abs(got["web"] / got["code"] - 7 / 3) < 0.3
    # layout independence
    kept2, _ = downsample_to_mixture(df.repartition(13), {"web": 7, "code": 3})
    assert {r["doc_id"] for r in kept.collect()} == {
        r["doc_id"] for r in kept2.collect()
    }
    import pytest as _pt

    with _pt.raises(ValueError, match="non-negative"):
        downsample_to_mixture(df, {"web": -1})
    with _pt.raises(ValueError, match="absent"):
        downsample_to_mixture(df, {"nope": 1})


def test_negative_sample_ids(spark):
    """k negatives per anchor, none equal to the anchor, deterministic
    across layouts, ~uniform over the pool; validation raises."""
    from dask_glm_spark.operators.sampling import negative_sample_ids

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = negative_sample_ids(df, k=4, pool_size=64)
    rows = out.collect()
    per_anchor = {}
    for r in rows:
        per_anchor.setdefault(r["doc_id"], []).append(
            (r["neg_idx"], r["neg_key"])
        )
        assert r["neg_key"] != r["doc_id"]
    # near-exact k per anchor (double self-collision drop is ~(1/64)^2)
    sizes = [len(v) for v in per_anchor.values()]
    assert len(per_anchor) == 500 and min(sizes) >= 3 and max(sizes) == 4
    # deterministic under relayout
    rows2 = negative_sample_ids(df.repartition(11), k=4, pool_size=64).collect()
    assert {tuple(r) for r in rows} == {tuple(r) for r in rows2}
    # coverage: a 64-key pool should be nearly fully hit by 2000 draws
    hit = {r["neg_key"] for r in rows}
    assert len(hit) > 50
    import pytest as _pt

    with _pt.raises(ValueError, match="k and pool"):
        negative_sample_ids(df, k=0)
    with _pt.raises(ValueError, match="at least 2"):
        negative_sample_ids(df.limit(1), k=2)


def test_hash_sample_frac_subpercent(spark):
    """0.5% of 200k keys lands within binomial noise; same salt -> same
    subset under relayout; disjoint salts -> ~independent; validation."""
    from dask_glm_spark.operators.sampling import hash_sample_frac

    df = spark.range(200_000).select(F.col("id").alias("doc_id"))
    kept = hash_sample_frac(df, "doc_id", 0.005)
    n = kept.count()
    assert abs(n - 1000) < 150  # ~4.7 sigma of binomial(200k, 0.005)
    a = {r["doc_id"] for r in kept.collect()}
    b = {
        r["doc_id"]
        for r in hash_sample_frac(df.repartition(13), "doc_id", 0.005).collect()
    }
    assert a == b
    c = {
        r["doc_id"]
        for r in hash_sample_frac(df, "doc_id", 0.005, salt="other").collect()
    }
    overlap = len(a & c)
    assert overlap < 30  # expected ~5 under independence
    import pytest as _pt

    with _pt.raises(ValueError, match="rate"):
        hash_sample_frac(df, "doc_id", 1.5)


class TestDSIR:
    """Round 9: DSIR hashed-unigram importance weighting (Xie et al.
    2023) — log-ratio vector + per-doc score expression."""

    def _corpora(self, spark):
        en = [
            (i, "en", "the quick brown fox and the lazy dog again " * 3)
            for i in range(10)
        ]
        de = [
            (100 + i, "de", "der schnelle braune fuchs und der faule hund " * 3)
            for i in range(10)
        ]
        return spark.createDataFrame(
            en + de, "doc_id long, lang string, text string"
        )

    def test_scores_rank_target_like_docs_higher(self, spark):
        from pyspark.sql import functions as F

        from dask_glm_spark.operators.sampling import (
            dsir_logratio_vector,
            dsir_score_expr,
        )

        docs = self._corpora(spark)
        w = dsir_logratio_vector(
            docs.where(F.col("lang") == "en"), docs, nf=256
        )
        got = {
            r["doc_id"]: r["s"]
            for r in docs.select(
                "doc_id", dsir_score_expr("text", w).alias("s")
            ).collect()
        }
        # every English doc outranks every German doc under the en target
        assert min(got[i] for i in range(10)) > max(
            got[100 + i] for i in range(10)
        )

    def test_score_matches_python_twin_and_empty_is_zero(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from dask_glm_spark.operators.sampling import (
            dsir_logratio_vector,
            dsir_score_expr,
        )

        docs = self._corpora(spark)
        nf = 128
        w = dsir_logratio_vector(
            docs.where(F.col("lang") == "en"), docs, nf=nf
        )
        extra = spark.createDataFrame(
            [(900, "x", None), (901, "x", ""), (902, "x", "the fox")],
            "doc_id long, lang string, text string",
        )
        got = {
            r["doc_id"]: r["s"]
            for r in extra.select(
                "doc_id", dsir_score_expr("text", w).alias("s")
            ).collect()
        }
        assert got[900] == 0.0 and got[901] == 0.0

        def phash(t):
            h = 0
            for ch in t:
                h = (h * 31 + ord(ch)) % 1_000_000_007
            return h

        want = sum(w[phash(t) % nf] for t in "the fox".split())
        assert got[902] == pytest.approx(want, abs=1e-12)

    def test_logratio_vector_properties(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from dask_glm_spark.operators.sampling import dsir_logratio_vector

        docs = self._corpora(spark)
        w = dsir_logratio_vector(docs.where(F.col("lang") == "en"), docs, nf=64)
        assert w.shape == (64,) and np.isfinite(w).all()
        # target == source -> identically zero log-ratios
        w0 = dsir_logratio_vector(docs, docs, nf=64)
        assert np.allclose(w0, 0.0)
        with pytest.raises(ValueError, match="nf"):
            dsir_logratio_vector(docs, docs, nf=0)

    def test_fused_cond_form_equals_two_pass(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from dask_glm_spark.operators.sampling import dsir_logratio_vector

        docs = self._corpora(spark)
        two = dsir_logratio_vector(
            docs.where(F.col("lang") == "en"), docs, nf=64
        )
        one = dsir_logratio_vector(
            docs, nf=64, target_cond=(F.col("lang") == "en")
        )
        assert np.array_equal(two, one)  # integer counts -> bit-equal
        with pytest.raises(ValueError, match="exactly one"):
            dsir_logratio_vector(docs, docs, nf=64, target_cond=F.lit(True))
        with pytest.raises(ValueError, match="exactly one"):
            dsir_logratio_vector(docs, nf=64)

    def test_xx_hash_path(self, spark):
        """Production hash='xx' (JVM xxhash64 buckets): vector + score
        agree with each other; mixing hashes raises no error but scores
        differ (documented: same hash on both sides), and unknown names
        raise."""
        from pyspark.sql import functions as F

        from dask_glm_spark.operators.sampling import (
            dsir_logratio_vector,
            dsir_score_expr,
        )

        docs = self._corpora(spark)
        w = dsir_logratio_vector(
            docs, nf=64, target_cond=(F.col("lang") == "en"), hash="xx"
        )
        got = {
            r["doc_id"]: r["s"]
            for r in docs.select(
                "doc_id", dsir_score_expr("text", w, hash="xx").alias("s")
            ).collect()
        }
        assert min(got[i] for i in range(10)) > max(
            got[100 + i] for i in range(10)
        )
        with pytest.raises(ValueError, match="hash"):
            dsir_logratio_vector(
                docs, nf=64, target_cond=F.lit(True), hash="md5"
            )
