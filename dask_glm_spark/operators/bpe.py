"""Trainable byte-pair-encoding (BPE) subword tokenizer (round 8,
VERDICT r7 #4): ``regex_token_count_expr`` is "BPE-ish"; real token
budgets (packing, ``select_to_token_budget``, ``corpus_report``) should
be computable under a TRAINED merge table. Public algorithm: Sennrich,
Haddow & Birch 2016 ("Neural Machine Translation of Rare Words with
Subword Units").

Scale shape — the part that matters at 100 TB:

- **Training** touches the corpus exactly ONCE: a word-count aggregate
  (map-side combinable, output O(distinct words)), truncated to the
  ``max_words`` most frequent words (count desc, word asc — a Zipf
  corpus concentrates >99.9% of occurrences in the head, so the
  truncation changes merges only in the statistical noise floor). The
  merge loop itself runs DRIVER-SIDE over that bounded table with
  incremental pair-count maintenance — the same split sentencepiece and
  HF tokenizers use, because the merge loop is inherently sequential
  and its input is vocabulary-sized, not corpus-sized. A naive
  "distributed merge loop" would run one shuffle per merge (10k merges
  = 10k jobs); this runs one job total.
- **Encoding** is embarrassingly parallel: an Arrow ``mapInPandas`` pass
  with the merge list broadcast and a per-batch distinct-word cache
  (Zipf again: a batch's distinct/total word ratio is tiny, so each
  distinct word is encoded once per batch). For SMALL merge tables
  there is also a pure-Column expression path (``bpe_split_expr`` /
  ``bpe_token_count_expr``) — JVM-side, codegen-able, and mirrorable in
  any SQL engine via the same replace chain (how the q16 oracle
  re-derives BPE token counts in DuckDB).

Encode semantics (pinned, all three paths agree bit-for-bit): merges
apply IN TRAINING ORDER, each as ONE greedy leftmost non-overlapping
pass over the word's current symbol sequence — exactly the reference
paper's ``re.sub``-based apply. The expression path implements this
with the wrapped-symbol encoding ``\\x1f sym \\x1f`` per symbol, where
one string ``replace`` per merge IS one greedy leftmost pass (each
symbol carries its own separators, so a replacement never consumes a
neighbour's boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_glm_spark.operators.text import tokens_expr

SEP = "\x1f"  # unit separator: never appears in normal text; stripped


def _merge_word(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    """One greedy leftmost non-overlapping merge pass."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int = 200_000,
    min_pair_count: int = 2,
    end_of_word: str | None = None,
    tokens_df: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list (the model — pass it to ``bpe_encode`` /
    ``bpe_token_count_expr``).

    One distributed word-count aggregate (the only corpus-scale work),
    truncated deterministically to ``max_words`` (count desc, word asc),
    then the standard driver-side merge loop with incremental pair-count
    maintenance. Words are the engine's whitespace tokens (lowercased,
    empties dropped — ``text.tokens_expr``); ``SEP`` bytes are stripped.
    ``end_of_word`` (e.g. ``"</w>"``) appends the reference paper's
    word-final marker as ONE extra symbol so word-final subwords can
    learn distinct merges; default off (the engine's token-count
    consumers want plain counts).

    Deterministic: ties in pair frequency break on the lexicographically
    smallest (left, right). Stops early when the best pair's count drops
    below ``min_pair_count`` (merging noise would overfit the head
    truncation).

    ``tokens_df``: a caller-persisted ``text.tokens_projection`` (id,
    toks) — the shared-projection convention: a pipeline that already
    tokenized for LM scoring / sketches trains the tokenizer off the
    same cache instead of re-tokenizing the corpus."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    tok = (
        tokens_df.select(F.explode("toks").alias("w"))
        if tokens_df is not None
        else df.select(F.explode(tokens_expr(text_col)).alias("w")).where(
            F.length("w") > 0
        )
    )
    # NO AQE bypass here (r14, VERDICT r13 #6): the word count shuffles a
    # vocabulary-scale, Zipf-skewed group table built from the corpus-
    # scale token stream — exactly where AQE's post-shuffle coalescing
    # matters at 100 TB. kernel_exec stays scoped to jobs whose
    # exchanges (not just results) are tiny.
    wc = (
        tok.select(F.replace(F.col("w"), F.lit(SEP), F.lit("")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(int(max_words))
        .collect()
    )
    words: list[tuple[tuple[str, ...], int]] = []
    for r in wc:
        syms = tuple(r["w"]) + ((end_of_word,) if end_of_word else ())
        words.append((syms, int(r["c"])))

    from collections import defaultdict

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wid, (syms, cnt) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += cnt
            pair_words[(a, b)].add(wid)

    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        if not pair_counts:
            break
        # max count, tie -> lexicographically smallest pair (determinism)
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        for wid in list(pair_words[best]):
            syms, cnt = words[wid]
            new = _merge_word(syms, *best)
            if new == syms:
                continue
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= cnt
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                    pair_words.pop(p, None)
                elif p in pair_words:
                    pair_words[p].discard(wid)
            for p in zip(new, new[1:]):
                pair_counts[p] += cnt
                pair_words[p].add(wid)
            words[wid] = (new, cnt)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def bpe_encode_word(
    word: str, merges: list[tuple[str, str]], end_of_word: str | None = None
) -> tuple[str, ...]:
    """Encode ONE word (driver/executor-side python twin of the
    expression path): merges in training order, one greedy leftmost pass
    each, with a substring pre-filter so untouched merges cost O(1)."""
    word = word.replace(SEP, "")
    if not word:
        return ()
    syms = tuple(word) + ((end_of_word,) if end_of_word else ())
    for left, right in merges:
        if len(syms) == 1:
            break
        if left not in syms or right not in syms:
            continue
        syms = _merge_word(syms, left, right)
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    end_of_word: str | None = None,
) -> DataFrame:
    """Append ``out_col: array<string>`` — the BPE token stream of the
    whole text (words in order, each word's subwords in order). One
    Arrow ``mapInPandas`` pass; the merge list rides the closure (one
    broadcast per executor), and a per-batch distinct-word cache makes
    the cost O(distinct words · merges touched), not O(tokens)."""
    import pandas as pd

    from dask_glm_spark.operators.text import _tokenize_py

    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists on the input")
    fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    schema = f"{fields}, `{out_col}` array<string>"
    mlist = [tuple(m) for m in merges]
    eow = end_of_word

    def op(batches):
        cache: dict[str, tuple[str, ...]] = {}

        def enc_text(text):
            out: list[str] = []
            for w in _tokenize_py(text):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = bpe_encode_word(w, mlist, eow)
                out.extend(got)
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(
                [enc_text(t) for t in pdf[text_col]], index=pdf.index,
                dtype=object,
            )
            yield pdf

    return df.mapInPandas(op, schema=schema)


def bpe_token_count_arrow(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe",
    end_of_word: str | None = None,
) -> DataFrame:
    """Append ``out_col: long`` — the whole-text BPE token count — via ONE
    Arrow ``mapInPandas`` pass with a per-batch distinct-word count cache
    (the ``bpe_encode`` machinery, summing subword counts instead of
    materializing the token stream). Bit-identical to
    ``bpe_token_count_expr`` (same ``bpe_encode_word`` semantics; NULL
    text counts 0 — the expr path's coalesce) but the per-word cost is a
    cached python encode instead of an interpreted per-row replace chain,
    so this is the production path for large merge tables / large corpora
    (VERDICT r8 #3: the q40 gate columns moved here; the expression chain
    remains the DuckDB-oracle form)."""
    import pandas as pd

    from dask_glm_spark.operators.text import _tokenize_py

    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists on the input")
    fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    schema = f"{fields}, `{out_col}` long"
    mlist = [tuple(m) for m in merges]
    eow = end_of_word

    def op(batches):
        cache: dict[str, int] = {}

        def count_text(text):
            n = 0
            for w in _tokenize_py(text):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = len(bpe_encode_word(w, mlist, eow))
                n += got
            return n

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(
                [count_text(t) for t in pdf[text_col]],
                index=pdf.index,
                dtype="int64",
            )
            yield pdf

    return df.mapInPandas(op, schema=schema)


def _word_split_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Wrapped-symbol replace chain over ONE word column: returns the
    encoded word as ``SEP sym SEP SEP sym SEP ...``."""
    for left, right in merges:
        if SEP in left or SEP in right:
            raise ValueError("merge symbols may not contain SEP")
    s = F.regexp_replace(
        F.replace(word, F.lit(SEP), F.lit("")), "(.)", f"{SEP}$1{SEP}"
    )
    for left, right in merges:
        s = F.replace(
            s,
            F.lit(f"{SEP}{left}{SEP}{SEP}{right}{SEP}"),
            F.lit(f"{SEP}{left}{right}{SEP}"),
        )
    return s


def bpe_split_expr(word: Column | str, merges: list[tuple[str, str]]) -> Column:
    """``array<string>`` of one WORD's BPE tokens as a pure Column
    expression — JVM-side, no UDF; for SMALL merge tables (each merge is
    one ``replace`` node, so keep it to a few hundred or use
    ``bpe_encode``). Exactly ``bpe_encode_word`` without end_of_word."""
    c = F.col(word) if isinstance(word, str) else word
    s = F.btrim(_word_split_expr(c, merges), F.lit(SEP))
    return F.filter(F.split(s, SEP * 2), lambda t: F.length(t) > 0).cast(
        "array<string>"
    )


def bpe_token_count_expr(
    text: Column | str, merges: list[tuple[str, str]]
) -> Column:
    """BPE token count of the whole text under a FIXED merge table, as a
    pure Column expression (the q16 gate column; any SQL engine mirrors
    it with the same replace chain). Sum over words of (SEP count)/2 of
    the encoded word — each symbol carries exactly two separators."""
    from dask_glm_spark.functions.exprs import let as _let

    toks = F.filter(tokens_expr(text), lambda t: F.length(t) > 0)

    def per_word(w):
        # let-bind the encoded word: it feeds both length() calls, and
        # Catalyst would otherwise inline (and EXECUTE) the whole replace
        # chain twice per word
        return _let(
            _word_split_expr(w, merges),
            lambda s: (
                (
                    F.length(s)
                    - F.length(F.replace(s, F.lit(SEP), F.lit("")))
                )
                / 2
            ).cast("long"),
        )

    # coalesce: NULL text propagates a NULL array through the whole chain
    # in both engines; report 0 tokens (the DuckDB twin coalesces too)
    return F.coalesce(
        F.aggregate(
            F.transform(toks, per_word),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
        F.lit(0).cast("long"),
    )


def save_merges(
    merges: list[tuple[str, str]], path: str, end_of_word: str | None = None
) -> None:
    """Persist a trained merge table as human-readable JSON (the
    `save_model` convention: params + content round-trip exactly, no
    pickle) — a tokenizer trained once on the corpus is reused by every
    downstream budget/packing/encode job and across rounds."""
    import json

    with open(path, "w") as fh:
        json.dump(
            {
                "format": "bpe_merges",
                "version": 1,
                "end_of_word": end_of_word,
                "merges": [list(m) for m in merges],
            },
            fh,
        )


def load_merges(path: str) -> tuple[list[tuple[str, str]], str | None]:
    """Load a merge table written by ``save_merges``; returns
    ``(merges, end_of_word)``."""
    import json

    with open(path) as fh:
        obj = json.load(fh)
    if obj.get("format") != "bpe_merges":
        raise ValueError(f"{path}: not a bpe_merges file")
    return [tuple(m) for m in obj["merges"]], obj.get("end_of_word")


def bpe_vocab(
    merges: list[tuple[str, str]], base: set[str] | None = None
) -> set[str]:
    """The token vocabulary a merge table can emit: every merge product
    (plus the caller's base symbol set, if given). Encoded tokens are
    always either single input characters, the end-of-word symbol, or
    members of this set."""
    out = set(base or ())
    out.update(left + right for left, right in merges)
    return out


# Fixed, data-independent demonstration table (common-English digraph
# chains) — the q16 gate applies THIS table so the DuckDB oracle can
# re-derive counts at every SF with the identical literal replace chain.
FIXED_MERGES_EN: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"), ("e", "n"),
    ("a", "t"), ("e", "s"), ("t", "i"), ("s", "t"), ("a", "r"),
    ("o", "u"), ("i", "s"), ("i", "t"), ("o", "f"), ("t", "o"),
    ("in", "g"), ("e", "d"), ("a", "l"), ("c", "h"),
]
