"""Sketch-based corpus statistics: mergeable approximate aggregates.

Beyond-reference surface (the brief's "novel sketch" slot), built on the
Apache DataSketches functions that ship with Spark 4 (``hll_sketch_agg``,
``theta_sketch_agg`` — JVM-side, codegen'd, mergeable partial aggregates).

Why sketches at 100 TB: an exact ``countDistinct(token)`` must shuffle
every distinct token (web-corpus vocabularies are billions of strings); an
HLL/theta sketch is a FIXED-SIZE state per partition that merges
associatively, so the exchange carries kilobytes per partition no matter
the corpus size, and per-group sketches can be unioned across datasets /
days (``hll_union_agg``) without touching raw data again.

Correctness: estimates cannot hash-match a different engine's estimator,
so the q53 gate pins the CONTRACT instead — the declared query emits the
exact cardinality plus booleans asserting each estimate lands within the
documented tolerance; the DuckDB oracle emits the exact count and TRUE.
The hash matches iff the engine's sketches actually meet their accuracy
bound on the real corpus. Default lgk=14 gives ~0.8% HLL relative
standard error — 5% tolerance is ~6 sigma.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_glm_spark.operators.text import tokens_expr

HLL_LGK = 14  # 2^14 registers: ~0.8% rel. std. error, 16 KiB state


def _token_table(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(F.explode(tokens_expr(text_col)).alias("tok")).where(
        F.length("tok") > 0
    )


def vocab_sketch_stats(
    df: DataFrame, text_col: str = "text", rel_tol: float = 0.05
) -> DataFrame:
    """One row: (n_exact, hll_ok, theta_ok) over the distinct-token set.

    Exact and both sketches compute in ONE aggregate job (shared scan +
    explode); the booleans assert |est/exact - 1| <= rel_tol. At scale,
    drop the exact column and keep the sketches — this form exists so the
    accuracy contract sits under the q53 oracle gate.
    """
    tok = _token_table(df, text_col)
    row = tok.agg(
        F.countDistinct("tok").alias("exact"),
        F.hll_sketch_estimate(F.hll_sketch_agg("tok", F.lit(HLL_LGK))).alias("hll"),
        F.theta_sketch_estimate(F.theta_sketch_agg("tok")).alias("theta"),
    )
    # Zero-guarded ratio (ADVICE r5): on a corpus with no non-empty tokens
    # exact=0 and the est/exact division throws under ANSI mode — the same
    # bug class quality_score_expr fixed. Empty-corpus contract: a sketch
    # is accurate iff it also estimates 0.
    ok = lambda est: F.when(
        F.col("exact") > 0,
        F.abs(F.col(est) / F.col("exact") - 1.0) <= F.lit(float(rel_tol)),
    ).otherwise(F.col(est) == F.lit(0.0))
    return row.select(
        F.col("exact").cast("long").alias("n_exact"),
        ok("hll").alias("hll_ok"),
        ok("theta").alias("theta_ok"),
    )


CMS_DEPTH = 4
CMS_WIDTH = 1 << 10


def cms_counters(
    df: DataFrame,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms",
    tokens_df: DataFrame | None = None,
) -> DataFrame:
    """Count-min sketch over the corpus token stream: ``(i, bucket, cnt)``
    counters with ``cnt = Σ tf(tok)`` over tokens hashing to ``bucket``
    under row ``i``'s salted hash — the frequency companion to the
    HLL/theta cardinality sketches above.

    Why a CMS at 100 TB: exact per-token counts shuffle the whole
    vocabulary (billions of strings); the CMS state is a FIXED
    ``depth×width`` grid of longs that merges by cell-wise addition, so
    the exchange carries ≤ depth·width rows per partition (map-side
    combine bounds it) no matter the corpus, and day-over-day sketches
    union by summing. Point estimates overestimate only:
    ``tf(t) <= est(t) <= tf(t) + ε·N`` with ε = e/width at the standard
    failure bound — collisions add, never subtract.

    Hashing is the engine-portable double polyhash (``hash_bucket_expr``
    with per-row salt ``f"{salt}{i}"``), so a second engine re-derives
    the EXACT same counters — the q36 gate hash-matches estimates, not
    just a tolerance contract."""
    if depth <= 0 or width <= 0:
        raise ValueError(f"depth/width must be positive, got {depth}/{width}")
    from dask_glm_spark.operators.sampling import hash_bucket_expr

    # Aggregate term frequencies FIRST: the portable double polyhash is an
    # interpreted per-char fold, so hashing every token OCCURRENCE (xdepth)
    # dominated the build (q36 8.4x regression when cms landed). Hashing
    # |vocab| distinct tokens instead divides the hash work by the mean tf,
    # and both exchanges stay small (map-side combine: distinct-tokens-per-
    # partition rows, then <=depth*width grid rows). Grid values are
    # unchanged: sum of tf per bucket == count of occurrences per bucket.
    # tokens_df: a caller-supplied (tok) table (e.g. an already-persisted
    # explode shared with a vocabulary aggregate) — skips re-tokenizing df
    tok = tokens_df if tokens_df is not None else _token_table(df, text_col)
    tf = tok.groupBy("tok").agg(F.count("*").cast("long").alias("_tf"))
    pairs = tf.select(
        F.col("_tf"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        hash_bucket_expr(F.col("tok"), width, salt=f"{salt}{i}")
                        .cast("int")
                        .alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.i").alias("i"), F.col("p.bucket").alias("bucket")
    ).agg(F.sum("_tf").cast("long").alias("cnt"))


def cms_estimate(
    tokens_df: DataFrame,
    counters: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms",
    est_col: str = "cms_est",
) -> DataFrame:
    """Append ``est_col`` = count-min point estimate for ``token_col``:
    ``min_i counters[i][h_i(token)]`` via ``depth`` broadcast joins
    against the counter grid (≤ depth·width rows by construction — the
    broadcast is safe no matter the corpus the sketch summarizes; an
    unseen bucket estimates 0). ``depth/width/salt`` must match the
    ``cms_counters`` call that built ``counters``."""
    from dask_glm_spark.operators.sampling import hash_bucket_expr

    out = tokens_df
    drop: list[str] = []
    for i in range(depth):
        ci = counters.where(F.col("i") == i).select(
            F.col("bucket").alias(f"_cmsb{i}"), F.col("cnt").alias(f"_cmsc{i}")
        )
        out = (
            out.withColumn(
                f"_cmsk{i}",
                hash_bucket_expr(F.col(token_col), width, salt=f"{salt}{i}"),
            ).join(
                F.broadcast(ci),
                F.col(f"_cmsk{i}") == F.col(f"_cmsb{i}"),
                "left",
            )
        )
        drop += [f"_cmsb{i}", f"_cmsc{i}", f"_cmsk{i}"]
    est = F.least(
        *[
            F.coalesce(F.col(f"_cmsc{i}"), F.lit(0).cast("long"))
            for i in range(depth)
        ]
    )
    return out.withColumn(est_col, est.cast("long")).drop(*drop)


def vocab_cardinality_by(
    df: DataFrame, by: str = "source", text_col: str = "text"
) -> DataFrame:
    """(by, est_distinct_tokens) per group via HLL — the scale form: state
    per group is one 2^lgk-register sketch, mergeable across datasets."""
    tok = df.select(F.col(by), F.explode(tokens_expr(text_col)).alias("tok")).where(
        F.length("tok") > 0
    )
    return tok.groupBy(by).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("tok", F.lit(HLL_LGK)))
        .cast("long")
        .alias("est_distinct_tokens")
    )
