"""BPE tokenizer tests (round 8): hand-verified merge sequence on the
reference paper's corpus, layout determinism, and bit-parity of the
three encode paths (python twin / Arrow mapInPandas / pure-Column
replace chain)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _word_corpus(spark, counts: dict[str, int]):
    rows = [(i, w) for i, w in enumerate(
        w for w, c in sorted(counts.items()) for _ in range(c)
    )]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTrain:
    def test_sennrich_corpus_merge_sequence(self, spark):
        """The paper's example vocabulary {low:5, lower:2, newest:6,
        widest:3} with the </w> marker. The first merges are forced by
        the counts; ties (equal counts) break on the lexicographically
        smallest pair — our documented deterministic rule — giving this
        exact hand-derived sequence."""
        from dask_glm_spark.operators.bpe import bpe_train

        df = _word_corpus(
            spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        )
        merges = bpe_train(df, 9, end_of_word="</w>", min_pair_count=1)
        assert merges == [
            ("e", "s"),          # 9 (newest+widest); ties (s,t),(t,</w>)
            ("es", "t"),         # 9
            ("est", "</w>"),     # 9
            ("l", "o"),          # 7 (low+lower); tie (o,w)
            ("lo", "w"),         # 7
            ("e", "w"),          # 6; ties (n,e),(w,est</w>) — 'e' smallest
            ("ew", "est</w>"),   # 6; tie (n,ew)
            ("n", "ewest</w>"),  # 6
            ("low", "</w>"),     # 5
        ]

    def test_train_deterministic_across_layouts(self, spark):
        from dask_glm_spark.operators.bpe import bpe_train
        from dask_glm_spark.sources.glm_source import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        a = bpe_train(docs, 40)
        b = bpe_train(docs.repartition(13), 40)
        assert a == b and len(a) == 40

    def test_tokens_df_hook_matches_text_path(self, spark):
        from dask_glm_spark.operators.bpe import bpe_train
        from dask_glm_spark.operators.text import tokens_projection
        from dask_glm_spark.sources.glm_source import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        tokd = tokens_projection(docs).persist()
        try:
            assert bpe_train(docs, 30, tokens_df=tokd) == bpe_train(docs, 30)
        finally:
            tokd.unpersist()

    def test_min_pair_count_stops_early(self, spark):
        from dask_glm_spark.operators.bpe import bpe_train

        df = _word_corpus(spark, {"ab": 1, "cd": 1})
        assert bpe_train(df, 10, min_pair_count=2) == []
        assert len(bpe_train(df, 10, min_pair_count=1)) > 0


class TestEncodeParity:
    WORDS = [
        "the", "theme", "anthem", "standing", "x", "", "that",
        "interesting", "chesterton", "aaaa", "thethethe", "a-b.c",
        "ingesting", "northern", "12345", "resting",
    ]

    def _merges(self, spark):
        from dask_glm_spark.operators.bpe import bpe_train
        from dask_glm_spark.sources.glm_source import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        return bpe_train(docs, 60)

    def test_expr_matches_python_twin(self, spark):
        from dask_glm_spark.operators.bpe import (
            bpe_encode_word,
            bpe_split_expr,
        )

        merges = self._merges(spark)
        df = spark.createDataFrame(
            [(w,) for w in self.WORDS], "w string"
        ).select(bpe_split_expr("w", merges).alias("toks"))
        got = [tuple(r["toks"]) for r in df.collect()]
        want = [bpe_encode_word(w, merges) for w in self.WORDS]
        assert got == want

    def test_arrow_matches_python_twin(self, spark):
        from dask_glm_spark.operators.bpe import bpe_encode, bpe_encode_word

        merges = self._merges(spark)
        texts = [
            "the theme standing anthem",
            "interesting resting x",
            "",
            "   ",
            "aaaa thethethe 12345",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: list(r["bpe_tokens"])
            for r in bpe_encode(df, merges).collect()
        }
        for i, t in enumerate(texts):
            want = []
            for w in t.lower().split():
                want.extend(bpe_encode_word(w, merges))
            assert out[i] == want, f"doc {i}"

    def test_fixed_table_count_expr_matches_python(self, spark):
        from dask_glm_spark.operators.bpe import (
            FIXED_MERGES_EN,
            bpe_encode_word,
            bpe_token_count_expr,
        )
        from dask_glm_spark.sources.glm_source import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        got = {
            r["doc_id"]: r["n"]
            for r in docs.select(
                "doc_id",
                bpe_token_count_expr("text", FIXED_MERGES_EN).alias("n"),
            ).collect()
        }
        pdf = docs.select("doc_id", "text").toPandas()
        for _, row in pdf.head(200).iterrows():
            want = sum(
                len(bpe_encode_word(w, FIXED_MERGES_EN))
                for w in str(row["text"]).lower().split()
            )
            assert got[row["doc_id"]] == want, row["doc_id"]

    def test_count_expr_null_text_is_zero(self, spark):
        from dask_glm_spark.operators.bpe import (
            FIXED_MERGES_EN,
            bpe_token_count_expr,
        )

        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "the")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["n"]
            for r in df.select(
                "doc_id",
                bpe_token_count_expr("text", FIXED_MERGES_EN).alias("n"),
            ).collect()
        }
        assert got == {1: 0, 2: 0, 3: 1}

    def test_count_arrow_matches_count_expr(self, spark):
        """Round 9 (VERDICT r8 #3): the Arrow cached-word count path that
        now serves q40's gate columns must be bit-identical to the
        expression replace chain (the DuckDB-oracle form), including NULL
        and empty text."""
        from dask_glm_spark.operators.bpe import (
            FIXED_MERGES_EN,
            bpe_token_count_arrow,
            bpe_token_count_expr,
        )
        from dask_glm_spark.sources.glm_source import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        edge = spark.createDataFrame(
            [(100001, None, "x"), (100002, "", "x"), (100003, "THE and", "x")],
            "doc_id long, text string, source string",
        )
        both = docs.select("doc_id", "text").unionByName(
            edge.select("doc_id", "text")
        )
        want = {
            r["doc_id"]: r["n"]
            for r in both.select(
                "doc_id",
                bpe_token_count_expr("text", FIXED_MERGES_EN).alias("n"),
            ).collect()
        }
        got = {
            r["doc_id"]: r["n_bpe"]
            for r in bpe_token_count_arrow(both, FIXED_MERGES_EN).collect()
        }
        assert got == want

    def test_roundtrip_concat(self, spark):
        """No end_of_word: concatenating a word's subwords reproduces the
        word — merges only ever concatenate."""
        from dask_glm_spark.operators.bpe import bpe_encode_word

        merges = self._merges(spark)
        for w in self.WORDS:
            assert "".join(bpe_encode_word(w, merges)) == w.replace("\x1f", "")

    def test_greedy_leftmost_same_pair(self, spark):
        from dask_glm_spark.operators.bpe import (
            bpe_encode_word,
            bpe_split_expr,
        )

        merges = [("a", "a")]
        assert bpe_encode_word("aaa", merges) == ("aa", "a")
        assert bpe_encode_word("aaaa", merges) == ("aa", "aa")
        df = spark.createDataFrame([("aaa",), ("aaaa",)], "w string")
        got = [
            tuple(r["t"])
            for r in df.select(bpe_split_expr("w", merges).alias("t")).collect()
        ]
        assert got == [("aa", "a"), ("aa", "aa")]


class TestFuzzParity:
    def test_seeded_fuzz_expr_equals_python(self, spark):
        """200 seeded random words over a merge-heavy alphabet (letters
        the fixed table merges, repeats, punctuation, non-ASCII): the
        Column replace-chain path must equal the python twin on every
        word, and concatenation must reproduce the word."""
        import numpy as np

        from dask_glm_spark.operators.bpe import (
            FIXED_MERGES_EN,
            bpe_encode_word,
            bpe_split_expr,
        )

        rng = np.random.RandomState(80)
        alphabet = list("theanristoud") + ["t", "h", "e", ".", "-", "é", "ß"]
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
            for _ in range(200)
        ]
        # adversarial fixtures: runs of mergeable pairs, full merges
        words += ["thththth", "ananan", "eeee", "thethethe", "ing" * 4]
        df = spark.createDataFrame([(w,) for w in words], "w string").select(
            "w", bpe_split_expr("w", FIXED_MERGES_EN).alias("toks")
        )
        for r in df.collect():
            want = bpe_encode_word(r["w"], FIXED_MERGES_EN)
            assert tuple(r["toks"]) == want, r["w"]
            assert "".join(want) == r["w"]


class TestPersistence:
    def test_merges_round_trip(self, spark, tmp_path):
        from dask_glm_spark.operators.bpe import (
            bpe_encode_word,
            bpe_train,
            bpe_vocab,
            load_merges,
            save_merges,
        )

        df = _word_corpus(
            spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        )
        merges = bpe_train(df, 9, end_of_word="</w>", min_pair_count=1)
        p = str(tmp_path / "merges.json")
        save_merges(merges, p, end_of_word="</w>")
        loaded, eow = load_merges(p)
        assert loaded == merges and eow == "</w>"
        # loaded table encodes identically
        assert bpe_encode_word("lowest", loaded, eow) == bpe_encode_word(
            "lowest", merges, "</w>"
        )
        # every non-char emitted token is a merge product
        vocab = bpe_vocab(merges)
        for tok in bpe_encode_word("lowest", merges, "</w>"):
            assert len(tok) == 1 or tok == "</w>" or tok in vocab

    def test_load_rejects_foreign_json(self, tmp_path):
        import json

        import pytest

        from dask_glm_spark.operators.bpe import load_merges

        p = str(tmp_path / "other.json")
        json.dump({"params": {}}, open(p, "w"))
        with pytest.raises(ValueError, match="not a bpe_merges"):
            load_merges(p)


class TestBudgetIntegration:
    def test_corpus_report_under_bpe_counts(self, spark):
        from dask_glm_spark.operators.bpe import (
            FIXED_MERGES_EN,
            bpe_encode_word,
            bpe_token_count_expr,
        )
        from dask_glm_spark.operators.quality import corpus_report

        rows = [(1, "the theme"), (2, "standing anthem chest")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        rep = corpus_report(
            df, count_expr=bpe_token_count_expr("text", FIXED_MERGES_EN)
        )
        want = sum(
            len(bpe_encode_word(w, FIXED_MERGES_EN))
            for _, t in rows
            for w in t.split()
        )
        assert rep["total_tokens"] == want and rep["n_docs"] == 2

    def test_token_percentiles_under_bpe_counts(self, spark):
        from dask_glm_spark.operators.bpe import (
            FIXED_MERGES_EN,
            bpe_encode_word,
            bpe_token_count_expr,
        )
        from dask_glm_spark.operators.text import token_percentiles

        rows = [(i, "s", "the theme " * (i + 1)) for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = token_percentiles(
            df, by="source",
            count_expr=bpe_token_count_expr("text", FIXED_MERGES_EN),
        ).collect()[0]
        per_rep = sum(
            len(bpe_encode_word(w, FIXED_MERGES_EN)) for w in ["the", "theme"]
        )
        assert out["n_docs"] == 4 and out["max_tokens"] == 4 * per_rep
        assert out["p50"] == 2 * per_rep  # percentile_disc(0.5) of {1,2,3,4}x

    def test_greedy_pack_under_bpe_counts(self, spark):
        """Sequence packing in trained-subword units: bins respect the
        budget measured in BPE tokens, not whitespace words."""
        from pyspark.sql import functions as F

        from dask_glm_spark.operators.bpe import (
            FIXED_MERGES_EN,
            bpe_token_count_expr,
        )
        from dask_glm_spark.operators.packing import greedy_pack

        rows = [(i, i % 2, "the theme " * (1 + i % 3)) for i in range(12)]
        df = spark.createDataFrame(
            rows, "doc_id long, bucket int, text string"
        ).withColumn("n_bpe", bpe_token_count_expr("text", FIXED_MERGES_EN))
        budget = 20  # every doc (4/8/12 BPE tokens) fits alone
        packed = greedy_pack(df, "n_bpe", budget=budget)
        per_seq = (
            packed.groupBy("bucket", "seq_id")
            .agg(F.sum("n_bpe").alias("s"))
            .collect()
        )
        assert len(per_seq) > 0
        for r in per_seq:
            assert r["s"] <= budget

    def test_select_to_token_budget_under_bpe_counts(self, spark):
        from dask_glm_spark.operators.bpe import (
            FIXED_MERGES_EN,
            bpe_token_count_expr,
        )
        from dask_glm_spark.operators.quality import select_to_token_budget

        rows = [(i, "src", "the theme standing " * 4) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        cnt = bpe_token_count_expr("text", FIXED_MERGES_EN)
        per_doc = df.select(cnt.alias("n")).first()["n"]
        kept = select_to_token_budget(
            df, int(per_doc * 3), by="source", count_expr=cnt
        ).count()
        # greedy-fill: kept while PRIOR count < budget -> docs 0,1,2
        assert kept == 3
