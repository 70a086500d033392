"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Beyond-reference surface (SURVEY.md §7 step 10). Scale contract — the part
the 100 TB design hinges on:

- **Never all-pairs.** Candidate generation is always a *bucketed
  equi-join*: MinHash band keys, SimHash bands, or a caller-supplied block
  column. The only O(pairs) work is the verification of candidates that
  already share a bucket (LSH guarantees that's a vanishing fraction of
  n²/2 at any realistic threshold).
- **Narrow until the join.** Shingling, hashing, signatures are per-row
  expressions (codegen'd, no Python). The band explode multiplies rows by
  BANDS (a small constant), then one shuffle on the band key. Skewed
  buckets (e.g. a boilerplate header shared by millions of docs) are
  handled by AQE skew-join plus the ``max_bucket`` guard that drops
  degenerate buckets with a logged count.
- All hashes derive from the engine-portable 31-base polynomial hash
  (operators/text.py), so signatures are deterministic across runs,
  sessions, and engines — the DuckDB oracle can recompute them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_glm_spark.operators.text import POLY_MOD, polyhash_expr, tokens_expr

SHINGLE_K = 3
NUM_PERM = 16
BANDS = 4
ROWS_PER_BAND = NUM_PERM // BANDS

# Fixed affine-permutation parameters (a*h + b) mod POLY_MOD, deterministic
# across runs — generated once from the classic MINSTD LCG (seed 42) and
# frozen here so the oracle can hardcode the same values.
_LCG_M = 2_147_483_647


def _minstd(seed: int, n: int) -> list[int]:
    out, x = [], seed
    for _ in range(n):
        x = (x * 16807) % _LCG_M
        out.append(x)
    return out


PERM_A = [a | 1 for a in _minstd(42, NUM_PERM)]  # odd => invertible-ish
PERM_B = _minstd(4242, NUM_PERM)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """Keep one row per distinct `cols` value — hash-shuffle on the dedup
    key (min of a stable id per group, not dropDuplicates, so the survivor
    is deterministic across partitionings)."""
    other = [c for c in df.columns if c not in cols]
    if not other:
        return df.distinct()
    w = df.groupBy(*cols).agg(*[F.min(c).alias(c) for c in other])
    return w.select(df.columns)


def duplicate_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """(dup_groups, dup_rows): groups with >1 identical `cols`, and the
    number of redundant rows they contain."""
    g = df.groupBy(*cols).agg(F.count("*").alias("c")).where(F.col("c") > 1)
    return g.agg(
        F.coalesce(F.count("*"), F.lit(0)).cast("long").alias("dup_groups"),
        F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("long").alias("dup_rows"),
    )


# ---------------------------------------------------------------------------
# Shingles + MinHash + banded LSH
# ---------------------------------------------------------------------------
def shingles_expr(text: Column | str, k: int = SHINGLE_K) -> Column:
    """Distinct k-token shingles (space-joined). Docs shorter than k tokens
    contribute their full token string as a single shingle."""
    toks = tokens_expr(text)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.array_distinct(F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", toks))))


def _let(value: Column, body) -> Column:
    """Evaluate ``value`` once and bind it into ``body`` (single-element
    ``transform`` trick). Higher-order-function expressions are interpreted
    (no whole-stage codegen) and Catalyst's project collapse re-inlines a
    subtree at every reference — without this binding, an expression like
    the shingle-hash array would be recomputed once per permutation/band
    (measured 10-60x slowdowns on the MinHash/SimHash paths)."""
    return F.transform(F.array(value), body)[0]


def shingle_hashes_expr(text: Column | str, k: int = SHINGLE_K) -> Column:
    return F.transform(shingles_expr(text, k), polyhash_expr)


def minhash_signature_expr(text: Column | str, k: int = SHINGLE_K) -> Column:
    """NUM_PERM-long signature: sig[i] = min over shingles of (a_i*h + b_i)
    mod 1e9+7 — computed as ONE fold over the shingle hashes that updates
    all NUM_PERM running minima per hash, so the (expensive) shingle
    hashing happens exactly once per row."""
    hashes = shingle_hashes_expr(text, k)
    # sentinel: every permuted value is < POLY_MOD, so POLY_MOD = +inf here
    init = F.array_repeat(F.lit(POLY_MOD).cast("long"), NUM_PERM)

    def merge(acc: Column, h: Column) -> Column:
        perms = F.array(*[(h * a + b) % POLY_MOD for a, b in zip(PERM_A, PERM_B)])
        return F.zip_with(acc, perms, lambda x, y: F.least(x, y))

    return F.aggregate(hashes, init, merge)


def band_keys_expr(sig: Column) -> Column:
    """BANDS band keys: polyhash of the '-'-joined signature slice, salted
    with the band index so different bands never collide. The signature is
    let-bound so it is computed once, not once per band."""

    def body(s: Column) -> Column:
        keys = []
        for b in range(BANDS):
            piece = F.concat_ws(
                "-",
                F.lit(str(b)),
                *[s[b * ROWS_PER_BAND + r].cast("string") for r in range(ROWS_PER_BAND)],
            )
            keys.append(polyhash_expr(piece))
        return F.array(*keys)

    return _let(sig, body)


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = SHINGLE_K
) -> DataFrame:
    return df.select(
        F.col(id_col),
        minhash_signature_expr(text_col, k).alias("signature"),
    )


def lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing >= 1 MinHash band.

    Plan: narrow signature map -> explode BANDS rows/doc -> shuffle on band
    key -> self-join within buckets. ``max_bucket`` drops degenerate
    buckets (a bucket of m docs contributes m(m-1)/2 pairs; at 100 TB a
    boilerplate bucket would otherwise quadratically explode — those docs
    are better handled by exact dedup upstream)."""
    sig = df.select(F.col(id_col), band_keys_expr(minhash_signature_expr(text_col, k)).alias("bands"))
    banded = sig.select(id_col, F.explode("bands").alias("band_key"))
    sized = banded.groupBy("band_key").agg(
        F.collect_list(id_col).alias("ids"), F.count("*").alias("m")
    )
    ok = sized.where((F.col("m") > 1) & (F.col("m") <= max_bucket))
    pairs = ok.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda a: F.transform(F.col("ids"), lambda b: F.struct(a.alias("id_a"), b.alias("id_b"))),
                    )
                ),
                lambda s: s["id_a"] < s["id_b"],
            )
        ).alias("pair")
    )
    return pairs.select("pair.id_a", "pair.id_b").distinct()


def jaccard_expr(sh_a: Column, sh_b: Column) -> Column:
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    union = (F.size(sh_a) + F.size(sh_b)).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    k: int = SHINGLE_K,
) -> DataFrame:
    """Verified near-duplicate pairs: LSH candidates whose exact shingle
    Jaccard >= threshold. Verification joins shingle sets back by id (two
    broadcast-or-shuffle hash joins on the id key), touching only
    candidates — never n²."""
    cands = lsh_candidates(df, text_col, id_col, k)
    sh = df.select(
        F.col(id_col), F.array_distinct(shingles_expr(text_col, k)).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    j = cands.join(a, "id_a").join(b, "id_b")
    return (
        j.select(
            "id_a",
            "id_b",
            F.round(jaccard_expr(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
SIMHASH_BITS = 32


def simhash_expr(text: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """Classic SimHash over token polyhashes: bit j of the output is 1 iff
    the sum over tokens of ±1 (per token-hash bit j) is positive."""
    toks = F.array_distinct(tokens_expr(text))
    hashes = F.transform(toks, polyhash_expr)

    def bit_vote(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    def body(hs: Column) -> Column:
        # hs is the let-bound, already-evaluated hash array: the 32 bit
        # folds each walk the array values without re-hashing the tokens
        out = F.lit(0).cast("long")
        for j in range(bits):
            vote = F.aggregate(hs, F.lit(0).cast("long"), bit_vote(j))
            out = out + F.when(vote > 0, F.lit(2**j).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        return out

    return _let(hashes, body)


def hamming_expr(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded: the `bits`-bit
    hash splits into (max_hamming+1) bands; any pair within `max_hamming`
    shares at least one exact band (pigeonhole), so candidates come from a
    bucketed equi-join on (band_idx, band_value), never all-pairs."""
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    sh = df.select(F.col(id_col), simhash_expr(text_col, bits).alias("simhash"))
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.shiftright(F.col("simhash"), i * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for i in range(n_bands)
        ]
    )
    banded = sh.select(id_col, "simhash", F.explode(bands).alias("b"))
    l = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "b"
    )
    r = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "b"
    )
    cand = (
        l.join(r, ["b"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
    )
    return (
        cand.select(
            "id_a", "id_b", hamming_expr(F.col("sim_a"), F.col("sim_b")).alias("hamming")
        )
        .where(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Blocked n-gram Jaccard (caller-supplied block column, e.g. `source`)
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact shingle-Jaccard for every within-block pair. For corpora with
    a natural partition key (source, domain, date bucket) this is the
    simple exact alternative to MinHash: the join shuffles on the block
    key, and pair count is bounded by the largest block squared — the
    caller owns keeping blocks small."""
    sh = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col),
        F.array_distinct(shingles_expr(text_col, k)).alias("sh"),
    )
    a = sh.select("blk", F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select("blk", F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, ["blk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "blk",
            "id_a",
            "id_b",
            F.round(jaccard_expr(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
