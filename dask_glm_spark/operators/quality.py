"""Corpus-quality operators for training-data curation.

Beyond-reference surface (the reference dask-glm stops at model fitting;
a 100 TB pre-training pipeline also needs the standard published quality
gates between raw text and the trainer). Public-knowledge heuristics:

- ``repetition_stats``    Gopher-style repetition measures (Rae et al.
                          2021 §A1.1: duplicate-line fraction, duplicate-
                          line *character* fraction, top-bigram token
                          fraction) — degenerate crawl text repeats
                          itself; thresholding these is the first filter
                          every published pipeline applies.
- ``scrub_expr``          C4-style PII/URL masking (emails, URLs, long
                          digit runs → typed placeholder tokens) as one
                          codegen'd regexp chain.
- ``decontaminate``       n-gram-overlap benchmark decontamination (the
                          GPT-3 appendix-C / PaLM procedure): a document
                          is contaminated iff it shares any word n-gram
                          with the benchmark set. The benchmark n-gram
                          table is tiny → broadcast semi-join; the corpus
                          side is a narrow explode, never shuffled.
- ``select_to_token_budget``  per-group greedy corpus selection: order by
                          a priority column, keep rows while the group's
                          running token total fits the budget — the
                          mixture-construction step that turns "weights
                          per source" into an actual row selection.

Everything is built-in Spark SQL (no Python UDFs): repetition stats are
one shuffle-free per-row projection (in-row sorted-array counting);
scrubbing is a pure narrow map; decontamination's only wide op is the
broadcast of the benchmark n-grams; budget selection is one window per
group. All four are DuckDB-oracle-checkable (q41-q44) with the regex
subset common to Java and RE2 dialects.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_glm_spark.functions.kernels import kernel_exec
from dask_glm_spark.operators.text import token_count_expr, tokens_expr

_log = logging.getLogger(__name__)

# Portable regex subset: no backrefs, no lookaround (Java regex and
# DuckDB's RE2 agree on these); applied to the raw (not lowercased) text
# with (?i) where case-insensitivity matters.
EMAIL_RE = r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
URL_RE = r"(?i)https?://[^\s]+"
LONG_DIGITS_RE = r"[0-9]{7,}"


def scrub_expr(text: Column | str) -> Column:
    """Mask emails, then URLs, then 7+-digit runs with placeholder tokens.

    Order matters (an email inside a URL must not be half-masked); the
    chain is three regexp_replace nodes inside one codegen span — a pure
    narrow map at any scale.
    """
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, URL_RE, "<URL>")
    c = F.regexp_replace(c, LONG_DIGITS_RE, "<NUM>")
    return c


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = r"\n",
    dup_ngram_n: int = 5,
) -> DataFrame:
    """Per-document repetition measures (Gopher §A1.1 family):

    - ``n_lines``            non-empty lines
    - ``dup_line_frac``      1 - distinct/total lines
    - ``dup_line_char_frac`` characters inside repeated lines / all line
                             characters (a doc that repeats its longest
                             paragraph scores high even with few lines)
    - ``top_bigram_frac``    occurrences of the most frequent token
                             bigram / total bigram slots
    - ``dup_ngram_frac``     duplicate ``dup_ngram_n``-gram occurrences /
                             total n-gram slots (1 - distinct/total)

    ``line_sep`` is a Java REGEX (it feeds ``F.split``): pass ``r'\\. '``
    — not ``'. '`` — for sentence splitting.

    Every input doc appears in the output: a doc with zero non-empty
    lines reports n_lines=0 and 0.0 for every fraction (review r5 — the
    most degenerate docs previously vanished from the report, exactly the
    ones a curation threshold needs to see).

    Plan (r14): every measure depends only on the doc's OWN text, so the
    whole report is ONE narrow per-row projection — no explode, no
    shuffle, no join at any scale. Duplicate counting runs on xxhash64 of
    the line/gram (8-byte elements instead of gram-sized strings; a
    collision would need ~2^32 distinct grams IN ONE DOCUMENT to become
    likely — not a real document), via sorted in-row arrays:
    ``array_distinct`` for distinct counts, sorted-neighbor equality for
    repeated-line chars, a run-length ``aggregate`` for the top-bigram
    count. Every fraction divides the SAME integer counts the former
    explode→groupBy plan produced, so the doubles are bit-identical.
    Per-doc state stays bounded by the doc's own token count (the same
    bound the exploded rows had).
    """
    from dask_glm_spark.functions.exprs import let as _let
    from dask_glm_spark.plans.layout import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    c = F.col(text_col)
    zero = F.lit(0).cast("long")

    def _lines_structs():
        # (lh, llen) per non-empty trimmed line — the former groupBy key.
        return F.transform(
            F.filter(
                F.transform(F.split(c, line_sep), lambda s: F.trim(s)),
                lambda s: F.length(s) > 0,
            ),
            lambda s: F.struct(
                F.xxhash64(s).alias("lh"), F.length(s).alias("llen")
            ),
        )

    def _frac_dup(arr):
        # 1 - distinct/total over an in-row array (0.0 when empty), the
        # same longs the former two-level agg divided.
        n = F.size(arr)
        return F.when(
            n > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(arr)).cast("double") / n.cast("double"),
        ).otherwise(F.lit(0.0))

    # coalesce: a NULL text yields a NULL array (size -> NULL), but the
    # former anchor-join design reported 0 for every input doc
    n_lines_e = F.coalesce(
        F.size(
            F.filter(
                F.transform(F.split(c, line_sep), lambda s: F.trim(s)),
                lambda s: F.length(s) > 0,
            )
        ),
        F.lit(0),
    ).cast("long")

    dup_line_frac_e = _let(_lines_structs(), _frac_dup)

    def _dup_char_frac(ls):
        # ls sorted by (lh, llen): an occurrence belongs to a repeated
        # line iff it equals a neighbor. Numerator/denominator are the
        # former sum(cnt*llen | cnt>1) / sum(cnt*llen) longs.
        dup_chars = F.aggregate(
            F.transform(
                ls,
                lambda x, i: F.when(
                    (F.get(ls, i - 1) == x) | (F.get(ls, i + 1) == x),
                    x["llen"].cast("long"),
                ).otherwise(zero),
            ),
            zero,
            lambda a, b: a + b,
        )
        total_chars = F.aggregate(
            ls, zero, lambda a, x: a + x["llen"].cast("long")
        )
        return F.when(
            total_chars > 0,
            dup_chars.cast("double") / total_chars.cast("double"),
        ).otherwise(F.lit(0.0))

    dup_line_char_frac_e = _let(F.array_sort(_lines_structs()), _dup_char_frac)

    def _top_run_frac(bs):
        # bs sorted: the max per-value count is the longest equal run.
        best = F.aggregate(
            bs,
            F.struct(
                F.lit(None).cast("bigint").alias("prev"),
                zero.alias("run"),
                zero.alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("long"))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                        F.lit(1).cast("long")
                    ),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        )
        n = F.size(bs)
        return F.when(
            n > 0, best.cast("double") / n.cast("double")
        ).otherwise(F.lit(0.0))

    top_bigram_frac_e = _let(
        F.array_sort(
            F.transform(ngrams_expr(text_col, 2), lambda g: F.xxhash64(g))
        ),
        _top_run_frac,
    )

    dup_ngram_frac_e = _let(
        F.transform(ngrams_expr(text_col, dup_ngram_n), lambda g: F.xxhash64(g)),
        _frac_dup,
    )

    return df.select(
        id_col,
        n_lines_e.alias("n_lines"),
        F.round(dup_line_frac_e, 6).cast("double").alias("dup_line_frac"),
        F.round(dup_line_char_frac_e, 6)
        .cast("double")
        .alias("dup_line_char_frac"),
        F.round(top_bigram_frac_e, 6).cast("double").alias("top_bigram_frac"),
        F.round(dup_ngram_frac_e, 6).cast("double").alias("dup_ngram_frac"),
    )


def ngrams_expr(text: Column | str, n: int) -> Column:
    """Word n-grams of the whitespace-lowercased tokens, joined by single
    spaces — the published decontamination unit (token n-gram strings).

    The token array is bound ONCE via ``_let``: higher-order functions are
    interpreted and Catalyst re-inlines an unbound subtree at every lambda
    reference, so without the binding the full tokenize re-ran once per
    n-gram position — O(tokens^2) per doc (review r5; same measured 10-60x
    class as the MinHash paths ``_let`` was built for)."""
    from dask_glm_spark.operators.dedup import _let

    return _let(
        tokens_expr(text),
        lambda t: F.transform(
            F.slice(t, 1, F.greatest(F.size(t) - (n - 1), F.lit(0))),
            lambda _, i: F.array_join(F.slice(t, i + 1, n), " "),
        ),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "flag",
) -> DataFrame:
    """Mark (or drop) corpus documents sharing any word ``n``-gram with
    the benchmark set.

    The benchmark n-gram table (distinct grams of the eval set — thousands
    of rows, never corpus-scale) is **broadcast**; the corpus side explodes
    its grams and LEFT SEMI joins, so the corpus is scanned once and never
    shuffled. ``mode='flag'`` returns docs + a ``contaminated`` bool;
    ``mode='drop'`` returns only clean docs.
    """
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be flag|drop, got {mode!r}")
    bench_grams = (
        benchmark.select(F.explode(ngrams_expr(text_col, n)).alias("g")).distinct()
    )
    doc_grams = docs.select(id_col, F.explode(ngrams_expr(text_col, n)).alias("g"))
    hit_ids = (
        doc_grams.join(F.broadcast(bench_grams), "g", "left_semi")
        .select(id_col)
        .distinct()
    )
    if mode == "drop":
        return docs.join(hit_ids, id_col, "left_anti")
    return docs.join(
        hit_ids.withColumn("contaminated", F.lit(True)), id_col, "left"
    ).withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Graduated contamination: per doc, ``(n_grams, n_hit, overlap_frac)``
    over its DISTINCT word ``n``-grams vs the benchmark set — the
    PaLM/GPT-3-style report where a threshold on the overlap FRACTION
    decides the drop (a single shared idiom 5-gram flagging a whole doc
    is the boolean ``decontaminate``'s known false-positive mode).

    One corpus scan: distinct per-doc grams LEFT-join the broadcast
    benchmark table, and a single aggregate counts totals and hits.
    Docs with no n-grams (shorter than ``n`` tokens) report
    ``n_grams = 0, overlap_frac = 0.0`` — observable, never NULL."""
    bench_grams = benchmark.select(
        F.explode(ngrams_expr(text_col, n)).alias("g")
    ).distinct()
    doc_grams = docs.select(
        id_col, F.explode_outer(F.array_distinct(ngrams_expr(text_col, n))).alias("g")
    )
    hits = doc_grams.join(
        F.broadcast(bench_grams.withColumn("_hit", F.lit(1))), "g", "left"
    )
    return hits.groupBy(id_col).agg(
        F.count("g").cast("long").alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hit"),
        F.round(
            F.when(
                F.count("g") > 0,
                F.coalesce(F.sum("_hit"), F.lit(0))
                / F.count("g").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("overlap_frac"),
    )


def decontaminate_by_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    min_overlap_frac: float,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "drop",
) -> DataFrame:
    """``decontaminate`` with a graduated threshold: a doc is contaminated
    only when ≥ ``min_overlap_frac`` of its distinct ``n``-grams appear in
    the benchmark (``min_overlap_frac=0+ε`` recovers the boolean any-hit
    semantics; real pipelines run ~0.5-0.8 to tolerate idiom collisions).
    Same plan shape as ``contamination_scores`` + one join back."""
    if not 0 < min_overlap_frac <= 1:
        raise ValueError(
            f"min_overlap_frac must be in (0, 1], got {min_overlap_frac}"
        )
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be flag|drop, got {mode!r}")
    bad = (
        contamination_scores(
            docs, benchmark, n=n, text_col=text_col, id_col=id_col
        )
        .where(F.col("overlap_frac") >= min_overlap_frac)
        .select(id_col)
    )
    if mode == "drop":
        return docs.join(bad, id_col, "left_anti")
    return docs.join(
        bad.withColumn("contaminated", F.lit(True)), id_col, "left"
    ).withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))


BLOOM_MAX_BITS = 1 << 24


def build_ngram_bloom(
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
    salt: str = "bloom",
) -> list[int]:
    """Driver-side Bloom filter (packed 64-bit words, signed for the Spark
    long literal) over the benchmark's distinct word ``n``-grams.

    The bit POSITIONS are computed distributed (explode ``n_hashes``
    salted-xxhash64 buckets per gram, distinct) and only the set
    positions come to the driver — ≤ ``min(n_bits, n_hashes·|grams|)``
    ints, bounded by ``n_bits`` regardless of benchmark size. ``n_bits``
    is capped at 2^24 (2 MiB of words) so the literal the filter ships in
    stays broadcast-sized; benchmark sets are eval suites, not corpora
    (the ``decontaminate`` contract), so 2^24 bits at ~10 bits/gram
    covers ~1.6M grams at <1% fp.

    Hash family: ``xxhash64(salt_j, gram)`` — NOT the portable double
    polyhash the sampling operators use. The k positions must be
    independent per gram PAIR, and any scheme post-processing one 30-bit
    inner hash (the polyhash form) collapses: a single inner collision
    between a corpus gram and any benchmark gram makes ALL k positions
    match at once (~8% somewhere at 50k×1.6k grams — caught by the
    pressure test while polyhash-backed). xxhash64's 64-bit space makes
    full-pair collisions ~2^-64 and each salt is an independent seed."""
    if not 0 < n_bits <= BLOOM_MAX_BITS:
        raise ValueError(f"n_bits must be in (0, {BLOOM_MAX_BITS}], got {n_bits}")
    if n_hashes <= 0:
        raise ValueError(f"n_hashes must be positive, got {n_hashes}")
    grams = benchmark.select(
        F.explode(ngrams_expr(text_col, n)).alias("g")
    ).distinct()
    pos = grams.select(
        F.explode(
            F.array(
                *[
                    _bloom_pos_expr(F.col("g"), n_bits, salt, j)
                    for j in range(n_hashes)
                ]
            )
        ).alias("p")
    ).distinct()
    words = [0] * ((n_bits + 63) // 64)
    with kernel_exec(benchmark.sparkSession):
        pos_rows = pos.collect()
    for r in pos_rows:
        p = int(r["p"])
        words[p >> 6] |= 1 << (p & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_words_lit(words: list[int]) -> Column:
    """The Bloom word array as ONE plan node: ``from_json`` of a single
    string literal, which ConstantFolding evaluates to a plain array
    Literal during optimization (verified: the optimized plan shows the
    folded value, no from_json). ``F.lit(words)`` instead builds
    ``array()`` of len(words) Literal nodes — 16k py4j round trips
    (~16 s to BUILD at the default 2^20 bits) and a 16k-node subtree
    copied into every downstream plan reference; threading that through
    an iterative fit OOM'd a 48 GiB driver (round 7)."""
    import json as _json

    return F.from_json(F.lit(_json.dumps(words)), "array<bigint>")


def _bloom_pos_expr(col: Column, n_bits: int, salt: str, j: int) -> Column:
    """Bit position for hash row ``j``: ``pmod(xxhash64(salt_j, gram),
    n_bits)`` — independent 64-bit hash per row (see build_ngram_bloom's
    hash-family note)."""
    return F.pmod(F.xxhash64(F.lit(f"{salt}{j}"), col), F.lit(n_bits)).cast(
        "long"
    )


def bloom_contains_expr(
    col: Column,
    words_arr: Column,
    n_bits: int,
    n_hashes: int = 4,
    salt: str = "bloom",
) -> Column:
    """Membership test against a Bloom word array: all ``n_hashes`` bits
    set. ``words_arr`` must be ONE shared ``bloom_words_lit(words)``
    column (a constant-folded array literal — cheap to reference). Bit
    extraction is ``(word >> (p % 64)) & 1`` — arithmetic shift
    sign-extends, which is harmless for single-bit extraction."""
    from dask_glm_spark.functions.exprs import let

    def bit_set(p: Column) -> Column:
        word = F.element_at(words_arr, (p / F.lit(64)).cast("int") + F.lit(1))
        return (
            F.call_function(
                "shiftright", word, (p % F.lit(64)).cast("int")
            ).bitwiseAND(F.lit(1))
            == F.lit(1)
        )

    checks = [
        # let-bind the bucket: the hash feeds both the word index and
        # the shift, and Catalyst would re-inline it at each reference
        let(_bloom_pos_expr(col, n_bits, salt, j), bit_set)
        for j in range(n_hashes)
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "flag",
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """``decontaminate`` with the benchmark compiled into a Bloom filter:
    the corpus side becomes a PURE NARROW MAP — no gram explode, no join,
    no shuffle; each doc evaluates ``exists(grams, bloom_contains)``
    against the in-plan word array. At 100 TB this is the shape you want:
    the exact variant's semi-join explodes every corpus n-gram into the
    exchange, this one touches nothing but the scan.

    Guarantee: NO false negatives (every truly-contaminated doc is
    flagged — collisions only ADD bits). False positives are possible at
    rate ~(n_hashes·|grams|/n_bits)^n_hashes per distinct gram — size
    ``n_bits`` at ~10·|grams| for <1%; ``mode='flag'`` callers can re-check
    flagged docs with the exact ``decontaminate`` (two-phase: cheap narrow
    pass over everything, exact join over the tiny flagged subset)."""
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be flag|drop, got {mode!r}")
    words = build_ngram_bloom(
        benchmark, n=n, text_col=text_col, n_bits=n_bits,
        n_hashes=n_hashes, salt=salt,
    )
    arr = bloom_words_lit(words)
    # NULL text yields a NULL gram array and F.exists propagates the
    # NULL; coalesce to False so such rows are kept (and flagged False),
    # matching the exact `decontaminate` path.
    hit = F.coalesce(
        F.exists(
            ngrams_expr(text_col, n),
            lambda g: bloom_contains_expr(g, arr, n_bits, n_hashes, salt),
        ),
        F.lit(False),
    )
    if mode == "drop":
        return docs.where(~hit)
    return docs.withColumn("contaminated", hit)


def decontaminate_two_phase(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "drop",
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """EXACT decontamination at Bloom cost: identical output to
    ``decontaminate`` (bit-for-bit — pinned against a filter sized to
    produce real false positives), but the corpus-wide gram explode +
    semi-join is replaced by the Bloom narrow map; only the flagged
    subset (true hits + Bloom false positives, a tiny fraction of the
    corpus when ``n_bits`` is sized right) pays the exact gram check.

    Plan shape: no union and no double-branch of the corpus — the exact
    re-check produces a small ``bad_ids`` set and the result is ONE
    anti/left join of ``docs`` against it, so the corpus lineage is
    referenced twice (narrow bloom map + join left), not three times as
    a hand-wired flag/recheck/union would (the curation example's
    original wiring — re-embedding a deep upstream lineage at every
    reference is what OOM'd its driver, round 7)."""
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be flag|drop, got {mode!r}")
    suspects = decontaminate_bloom(
        docs, benchmark, n=n, text_col=text_col, id_col=id_col,
        mode="flag", n_bits=n_bits, n_hashes=n_hashes, salt=salt,
    ).where("contaminated")
    bench_grams = benchmark.select(
        F.explode(ngrams_expr(text_col, n)).alias("g")
    ).distinct()
    suspect_grams = suspects.select(
        id_col, F.explode(ngrams_expr(text_col, n)).alias("g")
    )
    bad_ids = (
        suspect_grams.join(F.broadcast(bench_grams), "g", "left_semi")
        .select(id_col)
        .distinct()
    )
    if mode == "drop":
        return docs.join(bad_ids, id_col, "left_anti")
    return docs.join(
        bad_ids.withColumn("contaminated", F.lit(True)), id_col, "left"
    ).withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))


def select_to_token_budget(
    df: DataFrame,
    budget_tokens: dict[str, int] | int,
    by: str = "source",
    priority: Column | str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    default_budget: int = 0,
    count_expr: Column | None = None,
) -> DataFrame:
    """Greedy per-group selection under a token budget.

    ``count_expr`` overrides the per-row token count (default: whitespace
    ``token_count_expr(text_col)``) — e.g. ``bpe_token_count_expr(text,
    merges)`` to budget in TRAINED subword tokens (round 8), or a
    precomputed column.

    Rows are ordered inside each ``by`` group by ``priority`` (descending;
    default: quality-free deterministic doc order by ``id_col``) and kept
    while the group's running token count *before this row* is below the
    group's budget — so the selection always makes progress (the first doc
    of a group is kept even if it alone exceeds the budget, matching the
    greedy-fill semantics of mixture samplers).

    Groups absent from a dict ``budget_tokens`` get ``default_budget``
    (default 0 = the whole group is dropped, explicitly — never the NULL
    comparison that would drop it silently). Pass a large
    ``default_budget`` to keep unlisted groups whole.

    One window per group (parallel across groups) over (group, priority)
    — the same shuffle a groupBy would need; everything else is narrow.
    """
    from pyspark.sql import Window

    if isinstance(priority, str):
        priority = F.col(priority)
    order = [priority.desc(), F.col(id_col).asc()] if priority is not None else [
        F.col(id_col).asc()
    ]
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    if isinstance(budget_tokens, int):
        budget = F.lit(budget_tokens)
    else:
        budget = F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in budget_tokens.items() for x in kv]
                ),
                F.col(by),
            ),
            F.lit(int(default_budget)),
        )
    n_tok = count_expr if count_expr is not None else token_count_expr(text_col)
    prior = F.coalesce(F.sum(n_tok).over(w), F.lit(0))
    return (
        df.withColumn("_prior_tokens", prior)
        .where(F.col("_prior_tokens") < budget)
        .drop("_prior_tokens")
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    out_col: str | None = None,
) -> DataFrame:
    """Corpus-level exact PARAGRAPH dedup (the Dolma-style pass that
    strips boilerplate headers/footers shared across millions of pages
    without dropping whole documents): a paragraph occurring anywhere
    else in the corpus survives only at its FIRST occurrence — smallest
    (doc id, position) — and every document is reassembled from its
    surviving paragraphs in original order. Docs losing every paragraph
    keep an empty string (row count is preserved).

    Scale shape — NO window over paragraph-hash groups (a boilerplate
    paragraph duplicated across millions of docs would put all its
    occurrences into one window task's sort):

    1. ``posexplode(split(text, sep))`` — narrow;
    2. one ``groupBy(xxhash64(paragraph))`` aggregate computing the
       ``min(struct(id, pos, paragraph))`` first occurrence — map-side
       combinable, hot paragraphs collapse to one row per partition
       before the exchange;
    3. equi-join occurrences back on the hash (paragraph TEXT re-checked
       in the join condition, so a 64-bit collision can drop nothing);
    4. per-doc reassembly via ``array_sort(collect_list(struct(pos,
       par)))`` — state bounded by a single document's paragraph count;
    5. left join to the input preserves paragraph-less docs.

    Returns the input columns with ``out_col`` (default: ``text_col`` —
    replaced in place) holding the deduplicated text.
    """
    import re

    out_col = out_col or text_col
    # sep is a LITERAL separator: escape it for the regex split (an
    # unescaped '|' would split on every character), reuse it verbatim in
    # the concat_ws reassembly
    pars = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
            "_pos", "_par"
        ),
    )
    first = pars.groupBy(F.xxhash64("_par").alias("_ph")).agg(
        F.min(F.struct("_id", "_pos", "_par")).alias("_first")
    )
    kept = (
        pars.join(
            first,
            (F.xxhash64(pars["_par"]) == first["_ph"])
            & (pars["_par"] == first["_first"]["_par"]),
        )
        .where(
            (F.col("_id") == F.col("_first._id"))
            & (F.col("_pos") == F.col("_first._pos"))
        )
        .select("_id", "_pos", "_par")
    )
    rebuilt = kept.groupBy("_id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_par"))),
                lambda x: x["_par"],
            ),
        ).alias("_rebuilt")
    )
    joined = df.join(rebuilt, df[id_col] == rebuilt["_id"], "left")
    keep_cols = [c for c in df.columns if c != out_col]
    return joined.select(
        *[df[c] for c in keep_cols],
        F.coalesce(F.col("_rebuilt"), F.lit("")).alias(out_col),
    ).select(*df.columns if out_col in df.columns else [*df.columns, out_col])


def _ws_tokens(text: Column | str) -> Column:
    """Case-preserving whitespace tokens (empty tokens dropped). NOT
    ``text.tokens_expr`` (which lowercases): span stripping rebuilds the
    document from these tokens, and dedup surgery must not also change
    case. The rebuild collapses whitespace runs to single spaces."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.trim(c), r"\s+"), lambda t: t != F.lit("")
    )


def duplicated_span_positions(
    df: DataFrame,
    w: int = 50,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, start) of every ``w``-token window whose text occurs EARLIER
    in the corpus — the detection half of FineWeb/RefinedWeb-style
    repeated-span removal (boilerplate licenses, navigation blocks,
    quoted chunks shared across pages; exact-substring dedup at window
    granularity, the Spark-shaped stand-in for a suffix array).

    Windows start at 0, stride, 2·stride, … over the doc's whitespace
    tokens; only full windows count (docs shorter than ``w`` emit none).
    ``stride`` defaults to ``w`` (non-overlapping blocks — misses spans
    offset by <w tokens; pass a smaller stride for recall at
    proportionally more window rows, ~w/stride·corpus tokens).

    First occurrence = smallest ``(id, start)`` over the window's exact
    text, computed as ONE map-side-combinable min-struct aggregate per
    window hash (the ``paragraph_dedup`` shape — never a window function
    over hot hash groups); the join back re-checks the window TEXT, so a
    64-bit hash collision cannot flag anything."""
    if w <= 0:
        raise ValueError(f"w must be positive, got {w}")
    stride = stride or w
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    tk = _ws_tokens(text_col)
    n = F.size(tk)
    # windows array built in one transform: (n/stride) structs of
    # (start, w-token text) — nothing outlives the per-doc projection
    wins_arr = F.transform(
        F.sequence(F.lit(0), F.floor((n - F.lit(w)) / F.lit(stride))),
        lambda i: F.struct(
            (i * stride).cast("int").alias("start"),
            F.concat_ws(" ", F.slice(tk, i * stride + 1, w)).alias("wt"),
        ),
    )
    wins = (
        df.where(n >= w)
        .select(F.col(id_col).alias("_id"), F.explode(wins_arr).alias("_w"))
        .select("_id", F.col("_w.start").alias("_st"), F.col("_w.wt").alias("_wt"))
    )
    first = wins.groupBy(F.xxhash64("_wt").alias("_wh")).agg(
        F.min(F.struct("_id", "_st", "_wt")).alias("_f")
    )
    return (
        wins.join(
            first,
            (F.xxhash64(wins["_wt"]) == first["_wh"])
            & (wins["_wt"] == first["_f"]["_wt"]),
        )
        .where(
            (F.col("_id") != F.col("_f._id"))
            | (F.col("_st") != F.col("_f._st"))
        )
        .select(F.col("_id").alias(id_col), F.col("_st").alias("start"))
    )


def strip_duplicated_spans(
    df: DataFrame,
    w: int = 50,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str | None = None,
) -> DataFrame:
    """Remove every duplicated ``w``-token span (see
    ``duplicated_span_positions``) from its non-first occurrences and
    reassemble each document from the surviving tokens, in order — the
    global first occurrence keeps its text, later copies lose exactly the
    repeated window(s). Row count preserved; documents with no duplicated
    span pass through (token-normalized: the rebuild joins the
    case-preserved whitespace tokens with single spaces). Overlapping
    spans (stride < w) union their positions before stripping.

    Scale shape: the span list joins back as ONE small (id, positions)
    array per affected doc (bounded by the doc's own token count); the
    rebuild is a narrow per-row ``filter`` over the token array — the
    corpus never shuffles."""
    out_col = out_col or text_col
    stride = stride or w
    dups = duplicated_span_positions(
        df, w=w, stride=stride, text_col=text_col, id_col=id_col
    )
    bad = dups.groupBy(F.col(id_col).alias("_bid")).agg(
        F.array_distinct(
            F.flatten(
                F.collect_list(
                    F.sequence(
                        F.col("start"), F.col("start") + F.lit(w - 1)
                    )
                )
            )
        ).alias("_bad")
    )
    joined = df.join(bad, df[id_col] == bad["_bid"], "left")
    tk = _ws_tokens(df[text_col])
    rebuilt = F.concat_ws(
        " ",
        F.filter(
            tk,
            lambda t, i: ~F.array_contains(
                F.coalesce(F.col("_bad"), F.array().cast("array<int>")), i
            ),
        ),
    )
    keep_cols = [c for c in df.columns if c != out_col]
    out = joined.select(*[df[c] for c in keep_cols], rebuilt.alias(out_col))
    return out.select(
        *(df.columns if out_col in df.columns else [*df.columns, out_col])
    )


def strip_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
    sep: str = "\n",
    out_col: str | None = None,
    max_common: int = 10_000,
    min_line_chars: int = 1,
    fingerprint: str = "poly",
) -> DataFrame:
    """Corpus-level BOILERPLATE removal: strip every occurrence of any
    line appearing in >= ``min_docs`` DISTINCT documents (cookie banners,
    nav menus, share buttons — the lines `paragraph_dedup` would keep
    once but a training corpus wants gone entirely). Complements
    `paragraph_dedup` (first-occurrence-wins) and
    `strip_duplicated_spans` (window-granularity): here the unit is the
    line and the rule is a document-frequency threshold.

    Scale shape: ONE corpus aggregate + ONE narrow rebuild —
    1. explode lines, fingerprint the TRIMMED line with the
       engine-portable polyhash (leading/trailing-whitespace variants of
       a banner collapse), count DISTINCT docs per fingerprint
       (map-side-combinable two-phase distinct);
    2. the common set (df >= min_docs) is collected to the driver —
       boilerplate is by definition FEW distinct lines — deterministic
       top-``max_common`` by (doc_count desc, fp asc) with a logged,
       observable truncation if the cap binds;
    3. rebuild is a PURE NARROW MAP: the fp set ships as ONE
       constant-foldable literal (the ``bloom_words_lit`` plan-node
       discipline) and each doc filters its own line array against it —
       no second shuffle, text never leaves its partition.

    Lines with trimmed length < ``min_line_chars`` are never counted or
    stripped (empty lines are document structure). Returns the input
    columns with ``out_col`` (default: ``text_col``, replaced in place).

    Fingerprint collision tradeoff (review r8): membership keys on the
    line FINGERPRINT, not the line itself. The default ``fingerprint=
    "poly"`` is the 31-base polyhash mod 1e9+7 (chosen because the DuckDB
    oracle re-derives it in SQL) — at real corpus scale (millions of
    distinct trimmed lines) birthday collisions against a 10k common set
    are expected at roughly ``n_distinct * len(fps) / 1e9+7`` lines, each
    of which would be silently stripped everywhere. For production (non-
    oracle) pipelines pass ``fingerprint="xxhash64"``: the full 64-bit
    space makes a collision against a 10k set negligible (~5e-9 even at
    1e8 distinct lines). Both paths share the same two-phase plan shape.
    """
    import json as _json
    import re

    from dask_glm_spark.functions.exprs import let as _let
    from dask_glm_spark.operators.text import polyhash_expr

    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if fingerprint == "poly":
        _fp_expr = polyhash_expr
    elif fingerprint == "xxhash64":
        _fp_expr = F.xxhash64
    else:
        raise ValueError(
            f"fingerprint must be 'poly' or 'xxhash64', got {fingerprint!r}"
        )
    out_col = out_col or text_col
    esc = re.escape(sep)
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), esc)).alias("_ln"),
    )
    # NO AQE bypass here (r14, VERDICT r13 #6): the count-distinct runs a
    # LINE-scale (fp, id) shuffle over the exploded corpus — Zipf-skewed,
    # data-scale exchanges where AQE's coalescing matters at 100 TB. The
    # collected result is tiny, but kernel_exec is scoped to jobs whose
    # exchanges are tiny too.
    common_rows = (
        lines.where(F.length(F.trim("_ln")) >= min_line_chars)
        .select("_id", _fp_expr(F.trim(F.col("_ln"))).alias("_fp"))
        .groupBy("_fp")
        .agg(F.count_distinct("_id").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .orderBy(F.desc("_nd"), F.asc("_fp"))
        .limit(int(max_common) + 1)
        .collect()
    )
    if len(common_rows) > max_common:
        _log.warning(
            "strip_boilerplate_lines: common-line set exceeds max_common=%d; "
            "keeping the %d highest-document-frequency lines (deterministic). "
            "Raise max_common or min_docs to cover the tail.",
            max_common, max_common,
        )
        common_rows = common_rows[:max_common]
    fps = [int(r["_fp"]) for r in common_rows]
    if not fps:
        return df.withColumn(out_col, F.col(text_col))
    arr = F.from_json(F.lit(_json.dumps(fps)), "array<bigint>")

    if len(fps) > 256:
        # Large common set: array_contains is a linear scan per LINE, so a
        # 10k-entry set costs 10k comparisons per line of the corpus. A
        # Bloom pre-gate makes the common (non-boilerplate) case
        # constant-time, and the exact array_contains re-check runs only
        # on Bloom hits (codegen And short-circuits) — two-phase, output
        # EXACTLY equal to the plain scan (the decontaminate_two_phase
        # contract). Positions are computed via one tiny Spark job over
        # the already-collected fps (same xxhash64 family as
        # build_ngram_bloom — the driver never re-implements the hash).
        n_bits = min(1 << max(14, (8 * len(fps)).bit_length()), BLOOM_MAX_BITS)
        n_hashes = 4
        salt = "bplines"
        fp_df = df.sparkSession.createDataFrame([(f,) for f in fps], "fp long")
        with kernel_exec(df.sparkSession):
            pos_rows = (
                fp_df.select(
                    F.explode(
                        F.array(
                            *[
                                _bloom_pos_expr(F.col("fp"), n_bits, salt, j)
                                for j in range(n_hashes)
                            ]
                        )
                    ).alias("p")
                )
                .distinct()
                .collect()
            )
        words = [0] * ((n_bits + 63) // 64)
        for r in pos_rows:
            p = int(r["p"])
            words[p >> 6] |= 1 << (p & 63)
        words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
        warr = bloom_words_lit(words)

        def member(fp):
            return bloom_contains_expr(
                fp, warr, n_bits, n_hashes, salt
            ) & F.array_contains(arr, fp)

    else:

        def member(fp):
            return F.array_contains(arr, fp)

    from dask_glm_spark.functions.exprs import let as _let_bp

    def keep(ln):
        # let-bind trim and the fp: the fp feeds every Bloom row plus the
        # exact check, and Catalyst re-inlines the per-char polyhash fold
        # at each reference otherwise
        return ~_let_bp(
            F.trim(ln),
            lambda t: (F.length(t) >= min_line_chars)
            & _let_bp(_fp_expr(t), member),
        )

    rebuilt = _let(
        F.split(F.col(text_col), esc),
        lambda ls: F.array_join(F.filter(ls, keep), sep),
    )
    return df.withColumn(out_col, rebuilt)


def domain_expr(url: Column | str) -> Column:
    """Registrable-host extraction from a URL-ish string (scheme and
    path/port/query stripped; no public-suffix list — the curation use
    is grouping, not cookie policy)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_extract(c, r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?([^/:?#]+)", 1)
    )


def domain_caps(
    df: DataFrame,
    domain_col: str,
    cap: int,
    id_col: str = "doc_id",
    exact: bool = False,
    hash_col: Column | None = None,
) -> DataFrame:
    """Cap documents per domain (the "no single domain dominates the mix"
    curation rule).

    Default (``exact=False``) — the 100 TB shape: ONE count aggregate per
    domain (map-side combinable; output is O(domains)), joined back, then
    a deterministic hash-thinning filter keeps a row iff
    ``pmod(hash(id), n) < cap`` — EXPECTED exactly ``cap`` survivors per
    over-cap domain at EVERY n (the earlier ``% ceil(n/cap) == 0`` rule
    undershot up to 2× just above the cap: n=11, cap=10 kept ~5.5), no
    per-domain sort anywhere, a million-doc hot domain costs the same as
    a ten-doc one. Domains with ``n <= cap`` are untouched (the mod-n
    residue is always < cap there). Survivors are a stable function of
    ids (reruns and relayouts agree).

    ``exact=True``: precise cap via the smallest-``xxhash64(id)``-wins
    rank — a row_number window per domain; exact counts, but a hot
    domain's rows all sort in one window task (use only when domain
    cardinality balance is known).

    ``hash_col`` overrides the keep-hash expression (default
    ``xxhash64(id)``) — e.g. the engine-portable 31-base polyhash so an
    external SQL engine can re-derive the exact survivor set (the q37
    oracle does).
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    h = hash_col if hash_col is not None else F.xxhash64(F.col(id_col))
    if exact:
        from pyspark.sql import Window

        w = Window.partitionBy(domain_col).orderBy(
            h.asc(), F.col(id_col).asc()
        )
        return (
            df.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= cap)
            .drop("_rk")
        )
    counts = df.groupBy(domain_col).agg(F.count("*").alias("_n"))
    keep = F.pmod(h, F.col("_n")) < F.lit(cap)
    return df.join(counts, domain_col).where(keep).drop("_n")


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = None,
    count_expr: Column | None = None,
) -> dict:
    """One-stop corpus health report — the numbers every curation run
    logs between stages: document/token volume, length distribution,
    exact-duplicate rate (HLL-estimated distinct fingerprints, so the
    check is one mergeable aggregate, never a fingerprint shuffle), empty
    and near-empty counts, and the language mix when ``lang_col`` exists.

    ONE aggregate job over ONE scan (plus a tiny groupBy when lang_col is
    given) — cheap enough to run after every stage; all estimates are
    clearly suffixed ``_est``. Returns a plain dict (driver-side, the
    manifest convention).

    ``count_expr`` overrides the per-doc token count (default whitespace
    ``token_count_expr``) — e.g. ``bpe_token_count_expr(text, merges)``
    so every volume stat reports TRAINED subword tokens (round 8)."""
    from dask_glm_spark.operators.text import (
        fingerprint_fast_expr,
        token_count_expr,
    )

    ntok = count_expr if count_expr is not None else token_count_expr(text_col)
    empty = F.trim(F.col(text_col)) == ""
    with kernel_exec(df.sparkSession):
        row = df.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(ntok).cast("long").alias("total_tokens"),
            F.round(F.avg(ntok), 2).alias("avg_tokens"),
            F.min(ntok).cast("long").alias("min_tokens"),
            F.max(ntok).cast("long").alias("max_tokens"),
            F.percentile_approx(ntok, F.lit(0.5), F.lit(10_000))
            .cast("long")
            .alias("median_tokens_est"),
            F.sum(empty.cast("long")).cast("long").alias("n_empty"),
            F.sum((ntok < 10).cast("long"))
            .cast("long")
            .alias("n_under_10_tokens"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg(fingerprint_fast_expr(text_col), F.lit(14))
            ).cast("long").alias("distinct_texts_est"),
        ).collect()[0]
    out = dict(row.asDict())
    out["dup_rate_est"] = (
        round(1.0 - min(out["distinct_texts_est"], out["n_docs"]) / out["n_docs"], 4)
        if out["n_docs"]
        else 0.0
    )
    if lang_col is not None and lang_col in df.columns:
        with kernel_exec(df.sparkSession):
            out["lang_mix"] = {
                r["l"]: r["n"]
                for r in df.groupBy(F.col(lang_col).alias("l"))
                .agg(F.count("*").cast("long").alias("n"))
                .collect()
            }
    return out
