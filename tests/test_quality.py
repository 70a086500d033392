"""Quality-gate operators: repetition stats, scrubbing, decontamination,
token-budget selection (operators/quality.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_glm_spark.operators import quality as Q


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_scrub_masks_email_url_digits(spark):
    df = _docs(
        spark,
        [
            (1, "a", "mail Bob.Smith+x@Corp.Example.COM now"),
            (2, "a", "see https://ex.com/p?q=1#f and http://t.co/x"),
            (3, "a", "id 12345678 ok 123456 kept"),
            (4, "a", "clean text stays clean"),
        ],
    )
    out = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", Q.scrub_expr("text").alias("s")).collect()
    }
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "see <URL> and <URL>"
    # 7+ digits masked, 6 digits kept
    assert out[3] == "id <NUM> ok 123456 kept"
    assert out[4] == "clean text stays clean"


def test_repetition_stats_known_values(spark):
    # doc 1: 4 lines, "dup" twice -> dup_line_frac = 1 - 3/4
    # doc 2: no repeats at all
    df = _docs(
        spark,
        [
            (1, "a", "dup\nuniq one\ndup\nother line"),
            (2, "a", "all fresh tokens here"),
            (3, "a", "x y x y x y x y"),  # top bigram "x y" 4/7 slots
        ],
    )
    out = {r["doc_id"]: r for r in Q.repetition_stats(df).collect()}
    assert out[1]["n_lines"] == 4
    assert out[1]["dup_line_frac"] == pytest.approx(0.25)
    # "dup" chars: 2 lines x 3 chars = 6 of 3+8+3+10=24 line chars
    assert out[1]["dup_line_char_frac"] == pytest.approx(6 / 24)
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["dup_ngram_frac"] == 0.0
    assert out[3]["top_bigram_frac"] == pytest.approx(4 / 7)
    # doc 3: 8 tokens -> 4 5-gram slots, "x y x y x" and "y x y x y"
    # alternate -> 2 distinct over 4 slots
    assert out[3]["dup_ngram_frac"] == pytest.approx(1 - 2 / 4)


def test_ngrams_short_doc_empty(spark):
    df = _docs(spark, [(1, "a", "only two")])
    grams = df.select(Q.ngrams_expr("text", 5).alias("g")).collect()[0]["g"]
    assert grams == []


def test_decontaminate_flag_and_drop(spark):
    bench = _docs(spark, [(100, "b", "the quick brown fox jumps over it")])
    corpus = _docs(
        spark,
        [
            (1, "a", "prefix the quick brown fox jumps suffix"),  # shares 5-gram
            (2, "a", "completely unrelated words in this document"),
        ],
    )
    flagged = {
        r["doc_id"]: r["contaminated"]
        for r in Q.decontaminate(corpus, bench, n=5).collect()
    }
    assert flagged == {1: True, 2: False}
    kept = [r["doc_id"] for r in Q.decontaminate(corpus, bench, n=5, mode="drop").collect()]
    assert kept == [2]
    with pytest.raises(ValueError):
        Q.decontaminate(corpus, bench, mode="bogus")


def test_decontaminate_broadcasts_benchmark(spark):
    from dask_glm_spark.plans import audit

    bench = _docs(spark, [(100, "b", "one two three four five six")])
    corpus = _docs(spark, [(1, "a", "one two three four five six seven")])
    out = Q.decontaminate(corpus, bench, n=5)
    assert audit.has_broadcast(out)


def test_token_budget_scalar_and_per_group(spark):
    # a: 3+3+3 tokens; budget 5 -> rows kept while PRIOR sum < 5: docs 1, 2
    df = _docs(
        spark,
        [
            (1, "a", "t t t"),
            (2, "a", "t t t"),
            (3, "a", "t t t"),
            (10, "b", "u u u u u u u u"),  # 8 tokens, first row always kept
            (11, "b", "u u"),
        ],
    )
    kept = sorted(
        r["doc_id"] for r in Q.select_to_token_budget(df, 5, by="source").collect()
    )
    assert kept == [1, 2, 10]
    per_group = sorted(
        r["doc_id"]
        for r in Q.select_to_token_budget(
            df, {"a": 7, "b": 9}, by="source"
        ).collect()
    )
    assert per_group == [1, 2, 3, 10, 11]


def test_token_budget_priority_order(spark):
    df = _docs(
        spark,
        [
            (1, "a", "w w w w"),
            (2, "a", "w w w w"),
            (3, "a", "w w w w"),
        ],
    ).withColumn("prio", F.col("doc_id").cast("double"))
    # priority desc: doc 3 first, then 2 (prior=4<8), then 1 excluded (prior=8)
    kept = sorted(
        r["doc_id"]
        for r in Q.select_to_token_budget(df, 8, by="source", priority="prio").collect()
    )
    assert kept == [2, 3]


def test_repetition_stats_includes_zero_line_docs(spark):
    """Review r5: docs with no non-empty lines report zeros instead of
    vanishing from the report."""
    from dask_glm_spark.operators.quality import repetition_stats

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, ""), (2, " \n  \n"), (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[1]["n_lines"] == 0 and out[1]["dup_line_frac"] == 0.0
    assert out[2]["n_lines"] == 0 and out[2]["dup_ngram_frac"] == 0.0
    # NULL text reports the same all-zeros row the anchor-join design did
    assert out[3]["n_lines"] == 0 and out[3]["top_bigram_frac"] == 0.0
    assert out[3]["dup_line_char_frac"] == 0.0 and out[3]["dup_ngram_frac"] == 0.0


def test_ngrams_expr_binds_tokens_once():
    """Review r5: the token array is let-bound — exactly ONE tokenize
    subtree in the expression, not one per n-gram position."""
    from dask_glm_spark.operators.quality import ngrams_expr

    expr = repr(ngrams_expr("text", 5))
    assert expr.lower().count("split") == 1


class TestParagraphDedup:
    def _corpus(self, spark):
        boiler = "subscribe to our newsletter"
        rows = [
            (0, f"intro zero\n\n{boiler}\n\nbody zero"),
            (1, f"{boiler}\n\nbody one"),
            (2, "body two\n\nintro zero"),     # 'intro zero' first seen in doc 0
            (3, boiler),                        # loses everything -> ""
            (4, "unique four"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_first_occurrence_semantics(self, spark):
        from dask_glm_spark.operators.quality import paragraph_dedup

        df = self._corpus(spark)
        out = {
            r["doc_id"]: r["text"]
            for r in paragraph_dedup(df).collect()
        }
        boiler = "subscribe to our newsletter"
        assert out[0] == f"intro zero\n\n{boiler}\n\nbody zero"  # first owner keeps
        assert out[1] == "body one"
        assert out[2] == "body two"
        assert out[3] == ""                    # all paragraphs were dupes
        assert out[4] == "unique four"
        assert len(out) == 5                   # row count preserved

    def test_matches_naive_oracle_and_layout_independent(self, spark):
        import numpy as np

        from dask_glm_spark.operators.quality import paragraph_dedup

        rng = np.random.RandomState(3)
        pool = [f"para {i}" for i in range(12)]
        rows = [
            (i, "\n\n".join(pool[j] for j in rng.randint(0, 12, size=rng.randint(1, 6))))
            for i in range(60)
        ]
        # naive oracle: global first occurrence by (doc_id, pos)
        seen: dict = {}
        for i, text in rows:
            for pos, par in enumerate(text.split("\n\n")):
                if par not in seen:
                    seen[par] = (i, pos)
        want = {
            i: "\n\n".join(
                par
                for pos, par in enumerate(text.split("\n\n"))
                if seen[par] == (i, pos)
            )
            for i, text in rows
        }
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for nparts in (1, 7):
            got = {
                r["doc_id"]: r["text"]
                for r in paragraph_dedup(df.repartition(nparts)).collect()
            }
            assert got == want, nparts

    def test_out_col_and_extra_columns_ride_through(self, spark):
        from dask_glm_spark.operators.quality import paragraph_dedup

        df = spark.createDataFrame(
            [(0, "a\n\nb", "s1"), (1, "a\n\nc", "s2")],
            "doc_id long, text string, source string",
        )
        out = paragraph_dedup(df, out_col="clean").orderBy("doc_id").collect()
        assert out[0]["text"] == "a\n\nb" and out[0]["clean"] == "a\n\nb"
        assert out[1]["text"] == "a\n\nc" and out[1]["clean"] == "c"
        assert out[0]["source"] == "s1"


class TestDomainCaps:
    def _docs(self, spark):
        rows = [(i, "big.com" if i < 80 else f"small{i}.org") for i in range(100)]
        return spark.createDataFrame(rows, "doc_id long, domain string")

    def test_exact_cap(self, spark):
        from dask_glm_spark.operators.quality import domain_caps

        df = self._docs(spark)
        out = domain_caps(df, "domain", cap=10, exact=True)
        by_dom: dict = {}
        for r in out.collect():
            by_dom[r["domain"]] = by_dom.get(r["domain"], 0) + 1
        assert by_dom["big.com"] == 10
        assert all(v == 1 for d, v in by_dom.items() if d != "big.com")
        # deterministic across layouts
        a = sorted(r["doc_id"] for r in out.collect())
        b = sorted(
            r["doc_id"]
            for r in domain_caps(
                df.repartition(7), "domain", cap=10, exact=True
            ).collect()
        )
        assert a == b

    def test_hash_thinning_cap(self, spark):
        from dask_glm_spark.operators.quality import domain_caps

        df = self._docs(spark)
        out = domain_caps(df, "domain", cap=10).collect()
        by_dom: dict = {}
        for r in out:
            by_dom[r["domain"]] = by_dom.get(r["domain"], 0) + 1
        # expected ~10 from the 80-doc domain (hash thinning, not exact)
        assert 2 <= by_dom["big.com"] <= 30
        # small domains (<= cap) are untouched
        assert sum(1 for d in by_dom if d != "big.com") == 20
        # deterministic: same survivors on a different layout
        a = sorted(r["doc_id"] for r in out)
        b = sorted(
            r["doc_id"]
            for r in domain_caps(df.repartition(5), "domain", cap=10).collect()
        )
        assert a == b

    def test_hash_thinning_near_boundary_unbiased(self, spark):
        # n just above cap must still keep ~cap survivors (the old
        # ceil(n/cap) rate rule dropped to ~n/2 at n=cap+1); with the
        # pmod(h, n) < cap rule, E[survivors] = cap exactly. Average over
        # many domains so the hash variance washes out.
        from dask_glm_spark.operators.quality import domain_caps

        rows = [
            (d * 1000 + i, f"dom{d}.com")
            for d in range(40)
            for i in range(11)  # n=11, cap=10
        ]
        df = spark.createDataFrame(rows, "doc_id long, domain string")
        out = domain_caps(df, "domain", cap=10).collect()
        mean_kept = len(out) / 40
        # old rule: ~5.5; unbiased rule: ~10 (binomial(11, 10/11))
        assert 9.0 <= mean_kept <= 11.0

    def test_domain_expr(self, spark):
        from dask_glm_spark.operators.quality import domain_expr

        rows = [
            ("https://WWW.Example.com/path?q=1",),
            ("http://sub.site.org:8080/x",),
            ("bare-host.net/abc",),
        ]
        df = spark.createDataFrame(rows, "url string")
        got = [r[0] for r in df.select(domain_expr("url")).collect()]
        assert got == ["www.example.com", "sub.site.org", "bare-host.net"]


def test_bloom_decontam_matches_exact_at_wide_bits(spark):
    """At ~10 bits/gram the fp rate is negligible: the Bloom flag set
    EQUALS the exact semi-join flag set on the real corpus split."""
    from dask_glm_spark.operators.quality import decontaminate, decontaminate_bloom
    from dask_glm_spark.sources.glm_source import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.where(F.col("doc_id") % 31 == 0)
    corpus = docs.where(F.col("doc_id") % 31 != 0)
    exact = {
        r["doc_id"]
        for r in decontaminate(corpus, bench, n=5)
        .where("contaminated")
        .select("doc_id")
        .collect()
    }
    bloom = {
        r["doc_id"]
        for r in decontaminate_bloom(corpus, bench, n=5, n_bits=1 << 20)
        .where("contaminated")
        .select("doc_id")
        .collect()
    }
    assert exact  # non-vacuous: the split really contaminates
    assert bloom == exact


def test_bloom_decontam_no_false_negatives_under_pressure(spark):
    """A deliberately tiny filter (256 bits) collides hard: the flag set
    must still be a SUPERSET of the exact set (collisions only add bits),
    and at this density false positives must actually occur — otherwise
    the pressure test is vacuous."""
    from dask_glm_spark.operators.quality import decontaminate, decontaminate_bloom
    from dask_glm_spark.sources.glm_source import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.where(F.col("doc_id") % 31 == 0)
    corpus = docs.where(F.col("doc_id") % 31 != 0)
    exact = {
        r["doc_id"]
        for r in decontaminate(corpus, bench, n=5)
        .where("contaminated")
        .select("doc_id")
        .collect()
    }
    bloom = {
        r["doc_id"]
        for r in decontaminate_bloom(corpus, bench, n=5, n_bits=256)
        .where("contaminated")
        .select("doc_id")
        .collect()
    }
    assert bloom >= exact
    assert bloom > exact  # fps present at 256 bits


def test_bloom_decontam_flag_is_narrow_and_drop_is_complement(spark):
    """mode='flag' adds ZERO exchanges on the corpus side (the 100-TB
    rationale for the Bloom variant) and mode='drop' returns exactly the
    unflagged docs."""
    from dask_glm_spark.operators.quality import decontaminate_bloom
    from dask_glm_spark.plans.audit import assert_narrow
    from dask_glm_spark.sources.glm_source import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.where(F.col("doc_id") % 31 == 0)
    corpus = docs.where(F.col("doc_id") % 31 != 0)
    flagged = decontaminate_bloom(corpus, bench, n=5)
    assert_narrow(flagged)
    kept = decontaminate_bloom(corpus, bench, n=5, mode="drop")
    n_corpus = corpus.count()
    n_flagged = flagged.where("contaminated").count()
    assert kept.count() == n_corpus - n_flagged


def test_two_phase_decontam_equals_exact_under_fp_pressure(spark):
    """decontaminate_two_phase == decontaminate bit-for-bit in BOTH modes,
    with the filter sized (256 bits) so Bloom false positives provably
    occur — the exact re-check must strip every one of them."""
    from dask_glm_spark.operators.quality import (
        decontaminate,
        decontaminate_two_phase,
    )
    from dask_glm_spark.sources.glm_source import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.where(F.col("doc_id") % 31 == 0)
    corpus = docs.where(F.col("doc_id") % 31 != 0)
    exact_flag = {
        (r["doc_id"], r["contaminated"])
        for r in decontaminate(corpus, bench, n=5)
        .select("doc_id", "contaminated")
        .collect()
    }
    two_flag = {
        (r["doc_id"], r["contaminated"])
        for r in decontaminate_two_phase(
            corpus, bench, n=5, mode="flag", n_bits=256
        )
        .select("doc_id", "contaminated")
        .collect()
    }
    assert two_flag == exact_flag
    exact_drop = {
        r["doc_id"]
        for r in decontaminate(corpus, bench, n=5, mode="drop").collect()
    }
    two_drop = {
        r["doc_id"]
        for r in decontaminate_two_phase(
            corpus, bench, n=5, mode="drop", n_bits=256
        ).collect()
    }
    assert two_drop == exact_drop
    with pytest.raises(ValueError, match="mode"):
        decontaminate_two_phase(corpus, bench, mode="bogus")


def test_bloom_literal_is_one_plan_node(spark):
    """The filter words ship as ONE from_json(string) node, folded by
    Catalyst to a plain array literal. Regression pin: F.lit(words) built
    array() of 16k Literal nodes — 16k py4j round trips (~16 s) and a
    16k-node subtree at every downstream reference, which OOM'd the
    example pipeline's driver when threaded into an iterative fit
    (round 7). Build must be near-instant and the ANALYZED plan small."""
    import time

    from dask_glm_spark.operators.quality import decontaminate_bloom
    from dask_glm_spark.sources.glm_source import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.where(F.col("doc_id") % 31 == 0).limit(20)
    t0 = time.time()
    flagged = decontaminate_bloom(docs, bench, n=5, n_bits=1 << 20)
    build_s = time.time() - t0
    assert build_s < 10.0, f"bloom plan build took {build_s:.1f}s"
    analyzed = flagged._jdf.queryExecution().analyzed().toString()
    assert len(analyzed) < 500_000, f"analyzed plan {len(analyzed)} chars"
    # the folded literal must still test bits correctly
    assert flagged.where("contaminated").count() >= bench.count()


def test_bloom_build_validation(spark):
    from dask_glm_spark.operators.quality import BLOOM_MAX_BITS, build_ngram_bloom

    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_bits"):
        build_ngram_bloom(docs, n_bits=BLOOM_MAX_BITS * 2)
    with pytest.raises(ValueError, match="n_hashes"):
        build_ngram_bloom(docs, n_hashes=0)
    # empty benchmark -> all-zero filter -> nothing can be flagged
    empty = spark.createDataFrame([], "doc_id long, text string")
    words = build_ngram_bloom(empty, n_bits=1 << 10)
    assert all(w == 0 for w in words)


def test_duplicated_span_positions_and_strip(spark):
    """A 4-token span shared by three docs survives only at the smallest
    (doc_id, start); within-doc repeats keep their first occurrence;
    short docs emit no windows and pass through."""
    from dask_glm_spark.operators.quality import (
        duplicated_span_positions,
        strip_duplicated_spans,
    )

    span = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (1, f"intro one {span} tail one"),
            (2, f"{span} middle two {span}"),  # leading copy + in-doc repeat
            (3, f"unique text here {span}"),
            (4, "too short"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    dups = {
        (r["doc_id"], r["start"])
        for r in duplicated_span_positions(docs, w=4, stride=1).collect()
    }
    # first occurrence is (1, 2); doc 2's copies at 0 and 6, doc 3's at 3
    assert (1, 2) not in dups
    assert {(2, 0), (2, 6), (3, 3)} <= dups

    out = {
        r["doc_id"]: r["text"]
        for r in strip_duplicated_spans(docs, w=4, stride=1).collect()
    }
    assert out[1] == f"intro one {span} tail one"  # first copy intact
    assert out[2] == "middle two"
    assert out[3] == "unique text here"
    assert out[4] == "too short"
    assert out[5] == ""
    assert len(out) == 5  # row count preserved


def test_strip_duplicated_spans_layout_independent(spark):
    """Same output under any partitioning (the sampling-operator
    reproducibility contract) and out_col appends when named."""
    from dask_glm_spark.operators.quality import strip_duplicated_spans
    from dask_glm_spark.sources.glm_source import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", F.concat_ws(" ", "text", F.lit("shared span of six tokens x")).alias("text")
    )
    a = {
        r["doc_id"]: r["clean"]
        for r in strip_duplicated_spans(
            docs, w=6, out_col="clean"
        ).select("doc_id", "clean").collect()
    }
    b = {
        r["doc_id"]: r["clean"]
        for r in strip_duplicated_spans(
            docs.repartition(17), w=6, out_col="clean"
        ).select("doc_id", "clean").collect()
    }
    assert a == b and len(a) > 0
    with pytest.raises(ValueError, match="w must"):
        strip_duplicated_spans(docs, w=0)


def test_contamination_scores_and_overlap_threshold(spark):
    """Known overlap fractions; threshold decides the drop where any-hit
    would false-positive; short docs report 0 grams, 0.0 overlap."""
    from dask_glm_spark.operators.quality import (
        contamination_scores,
        decontaminate_by_overlap,
    )

    bench = spark.createDataFrame(
        [(100, "a b c d e f g h")], "doc_id long, text string"
    )  # distinct 5-grams: abcde bcdef cdefg defgh
    corpus = spark.createDataFrame(
        [
            # 4 distinct grams, all 4 in bench -> 1.0
            (1, "a b c d e f g h"),
            # grams: 'x a b c d','a b c d e','b c d e y' -> 1/3 hit
            (2, "x a b c d e y"),
            # no shared grams -> 0.0
            (3, "p q r s t u v w"),
            # shorter than 5 tokens -> 0 grams
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["overlap_frac"])
        for r in contamination_scores(corpus, bench, n=5).collect()
    }
    assert got[1] == (4, 4, 1.0)
    assert got[2] == (3, 1, round(1 / 3, 6))
    assert got[3] == (4, 0, 0.0)
    assert got[4] == (0, 0, 0.0)

    kept = {
        r["doc_id"]
        for r in decontaminate_by_overlap(corpus, bench, 0.5, n=5).collect()
    }
    assert kept == {2, 3, 4}  # doc 1 (1.0) dropped; doc 2 (0.33) survives
    flagged = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate_by_overlap(
            corpus, bench, 0.2, n=5, mode="flag"
        ).collect()
    }
    assert flagged == {1: True, 2: True, 3: False, 4: False}
    with pytest.raises(ValueError, match="min_overlap_frac"):
        decontaminate_by_overlap(corpus, bench, 0.0)


def test_strip_duplicated_spans_matches_naive_oracle(spark):
    """Hypothesis property: random corpora over a 3-token alphabet (heavy
    genuine window collisions — the regime where first-occurrence
    ordering, in-doc repeats, and overlapping-span union can hide bugs)
    must match a brute-force python oracle for several (w, stride)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dask_glm_spark.operators.quality import strip_duplicated_spans

    def naive(rows, w, stride):
        first = {}
        for i, text in rows:  # rows pre-sorted by id
            toks = text.split()
            for s in range(0, max(len(toks) - w + 1, 0), stride):
                wt = " ".join(toks[s : s + w])
                first.setdefault(wt, (i, s))
        out = {}
        for i, text in rows:
            toks = text.split()
            bad: set = set()
            for s in range(0, max(len(toks) - w + 1, 0), stride):
                wt = " ".join(toks[s : s + w])
                if first[wt] != (i, s):
                    bad |= set(range(s, s + w))
            out[i] = " ".join(
                t for p, t in enumerate(toks) if p not in bad
            )
        return out

    docs_strategy = st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=8,
    )

    @given(
        docs=docs_strategy,
        w=st.integers(2, 4),
        sdelta=st.integers(0, 2),
    )
    @settings(max_examples=12, deadline=None)
    def check(docs, w, sdelta):
        stride = max(1, w - sdelta)
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["text"]
            for r in strip_duplicated_spans(df, w=w, stride=stride).collect()
        }
        assert got == naive(rows, w, stride)

    check()


def test_corpus_report(spark):
    """Known corpus: volumes, duplicate-rate estimate, empties, lang mix."""
    from dask_glm_spark.operators.quality import corpus_report

    rows = [
        (1, "en", "one two three four five six seven eight nine ten eleven"),
        (2, "en", "dup text here"),
        (3, "de", "dup text here"),
        (4, "de", ""),
        (5, "fr", "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    rep = corpus_report(df, lang_col="lang")
    assert rep["n_docs"] == 5
    assert rep["n_empty"] == 1
    assert rep["n_under_10_tokens"] == 4
    assert rep["min_tokens"] == 1 and rep["max_tokens"] == 11
    # 4 distinct texts over 5 docs -> dup rate 0.2 (HLL exact at this n)
    assert rep["distinct_texts_est"] == 4
    assert rep["dup_rate_est"] == 0.2
    assert rep["lang_mix"] == {"en": 2, "de": 2, "fr": 1}
    # no lang col requested -> key absent
    assert "lang_mix" not in corpus_report(df)


class TestStripBoilerplateLines:
    def _docs(self, spark):
        banner = "accept our cookies"
        rows = [
            (1, f"{banner}\nunique one\nnav menu"),
            (2, f"{banner}\nunique two\nnav menu"),
            (3, f"  {banner}  \nunique three"),   # whitespace variant collapses
            (4, "unique four\nnav menu"),
            (5, "unique five"),
            (6, ""),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_strips_common_lines_everywhere(self, spark):
        from dask_glm_spark.operators.quality import strip_boilerplate_lines

        out = {
            r["doc_id"]: r["text"]
            for r in strip_boilerplate_lines(self._docs(spark), min_docs=3).collect()
        }
        # banner (3 docs incl. whitespace variant) and nav menu (3 docs) gone
        assert out[1] == "unique one"
        assert out[2] == "unique two"
        assert out[3] == "unique three"
        assert out[4] == "unique four"
        assert out[5] == "unique five"
        assert out[6] == ""

    def test_threshold_and_structure_preserved(self, spark):
        from dask_glm_spark.operators.quality import strip_boilerplate_lines

        out = {
            r["doc_id"]: r["bp"]
            for r in strip_boilerplate_lines(
                self._docs(spark), min_docs=4, out_col="bp"
            ).collect()
        }
        # nothing reaches 4 docs -> text unchanged (whitespace variant kept)
        assert out[3] == "  accept our cookies  \nunique three"
        assert out[1] == "accept our cookies\nunique one\nnav menu"

    def test_empty_lines_never_counted_or_stripped(self, spark):
        from dask_glm_spark.operators.quality import strip_boilerplate_lines

        rows = [(i, "a b c\n\nkeep me " + str(i)) for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = strip_boilerplate_lines(df, min_docs=3).collect()
        for r in out:
            # 'a b c' stripped (5 docs); the EMPTY line survives
            assert r["text"] == "\nkeep me " + str(r["doc_id"])

    def test_max_common_cap_is_deterministic(self, spark):
        from dask_glm_spark.operators.quality import strip_boilerplate_lines

        # 6 lines each in 3 docs; cap at 2 -> the 2 smallest fps win,
        # same result on any layout
        rows = [
            (d * 10 + i, "\n".join(f"common line {j}" for j in range(6)))
            for d in range(3)
            for i in range(1)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(
            (r["doc_id"], r["text"])
            for r in strip_boilerplate_lines(df, min_docs=3, max_common=2).collect()
        )
        b = sorted(
            (r["doc_id"], r["text"])
            for r in strip_boilerplate_lines(
                df.repartition(5), min_docs=3, max_common=2
            ).collect()
        )
        assert a == b
        # exactly 4 of 6 lines survive under the cap
        assert all(t.count("common line") == 4 for _, t in a)

    def test_rebuild_is_narrow(self, spark):
        """The rebuild pass (after the one driver aggregate) must be a
        pure narrow map — no second exchange over the text."""
        from dask_glm_spark.operators.quality import strip_boilerplate_lines
        from dask_glm_spark.plans import audit

        out = strip_boilerplate_lines(self._docs(spark), min_docs=3)
        audit.assert_narrow(out)

    def test_min_docs_validation(self, spark):
        import pytest

        from dask_glm_spark.operators.quality import strip_boilerplate_lines

        with pytest.raises(ValueError, match="min_docs"):
            strip_boilerplate_lines(self._docs(spark), min_docs=1)

    def test_bloom_pregate_path_is_exact(self, spark):
        """>256 common lines switches to the Bloom-pregated membership —
        output must EXACTLY equal the python oracle (two-phase contract),
        and the rebuild stays narrow."""
        from dask_glm_spark.operators.quality import strip_boilerplate_lines
        from dask_glm_spark.plans import audit

        common = [f"banner line number {j}" for j in range(300)]
        rows = [
            (d, "\n".join(common + [f"unique {d} tail"])) for d in range(3)
        ] + [(99, "unique solo doc\nbanner line number 7")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = strip_boilerplate_lines(df, min_docs=3)
        audit.assert_narrow(out)
        got = {r["doc_id"]: r["text"] for r in out.collect()}
        # all 300 banners (3 docs each... banner 7 is in 4) stripped
        assert got[0] == "unique 0 tail"
        assert got[1] == "unique 1 tail"
        assert got[2] == "unique 2 tail"
        assert got[99] == "unique solo doc"

    def test_xxhash64_fingerprint_matches_poly(self, spark):
        """Round 9 (ADVICE r8): the 64-bit production fingerprint option
        produces the same output as the oracle-portable polyhash on a
        collision-free corpus, on BOTH the small-set and Bloom-pregated
        paths; unknown names raise."""
        import pytest

        from dask_glm_spark.operators.quality import strip_boilerplate_lines

        small = self._docs(spark)
        a = sorted(
            (r["doc_id"], r["text"])
            for r in strip_boilerplate_lines(small, min_docs=3).collect()
        )
        b = sorted(
            (r["doc_id"], r["text"])
            for r in strip_boilerplate_lines(
                small, min_docs=3, fingerprint="xxhash64"
            ).collect()
        )
        assert a == b
        common = [f"banner line number {j}" for j in range(300)]
        rows = [
            (d, "\n".join(common + [f"unique {d} tail"])) for d in range(3)
        ]
        big = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["text"]
            for r in strip_boilerplate_lines(
                big, min_docs=3, fingerprint="xxhash64"
            ).collect()
        }
        assert got == {0: "unique 0 tail", 1: "unique 1 tail", 2: "unique 2 tail"}
        with pytest.raises(ValueError, match="fingerprint"):
            strip_boilerplate_lines(small, fingerprint="md5")
