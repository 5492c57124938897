"""Exact character-n-gram Jaccard near-duplicate pairs.

The SQL-checkable sibling of the sketch pipeline: same shingle
semantics (overlapping, stride 1), exact set intersection via
explode + equi-join + count instead of sketches.

Scale control: shingles occurring in more than ``max_df`` documents
are excluded from BOTH the intersection and the per-document
set sizes (classic stop-shingle cut). Without it, one boilerplate
shingle shared by f docs contributes f^2 join rows — the quadratic
blowup the LSH pipeline exists to avoid. The cap is part of the
operator's definition and is applied identically in the DuckDB oracle,
so results stay bit-comparable.

Integer counts + round(jaccard, 6) keep floats engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spread import spread


def doc_shingles(documents: DataFrame, k: int, hashed: bool = False) -> DataFrame:
    """(doc_id, s): the distinct k-char shingle set per document.

    Dedup happens INSIDE the shingle expression (``array_distinct``
    per document, on the xxhash64 values in hashed mode) before the
    explode, so the output rows are unique by construction and the
    former row-level ``.distinct()`` — a full corpus-sized Exchange in
    every n-gram-family query — is gone (guide §2.4). ``hashed=True``
    dedups the 8-byte hashes (same set as hashing the distinct grams,
    the scale mode); the gates keep raw grams — they join shingles
    back to documents.

    The input is spread to cluster parallelism first: the ~300x explode
    is the expensive map stage of the whole n-gram family, and a
    single-split input would run it on one core (spread.py).

    Guard: Spark's sequence(1, 0) generates a DESCENDING range, so
    short texts must produce an empty array explicitly."""
    gram_arr = (
        f"transform(sequence(1, length(text) - {k - 1}),"
        f" i -> substring(text, i, {k}))"
    )
    if hashed:
        inner, empty = f"transform({gram_arr}, s -> xxhash64(s))", "array<bigint>"
    else:
        inner, empty = gram_arr, "array<string>"
    return spread(documents).select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN length(text) >= {k} THEN "
                f"array_distinct({inner}) "
                f"ELSE CAST(array() AS {empty}) END"
            )
        ).alias("s"),
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    k: int = 5,
    min_jaccard: float = 0.5,
    max_df: int | None = 100,
    key: str = "hash",
) -> DataFrame:
    """(doc_a, doc_b, inter_n, union_n, jaccard) for pairs with
    rare-shingle k-gram Jaccard >= min_jaccard, doc_a < doc_b.

    ``key``: "hash" (scale default) replaces each k-char shingle with
    xxhash64(shingle) immediately after the explode, so the distinct /
    document-frequency / intersection shuffles all carry 8-byte keys
    instead of k-char strings (the functions/substr.py key discipline).
    Set identity is preserved up to a 2^-64 per-pair hash collision,
    which would only perturb one count. "gram" keeps raw shingles for
    bit-exact DuckDB oracle parity (the driver query's mode); both
    modes are pinned equal on the test corpus.
    """
    sh = doc_shingles(documents, k, hashed=(key == "hash"))
    if max_df is not None:
        cap = max_df  # ABSOLUTE cap: join fanout per shingle bounded by
        # max_df^2 regardless of corpus size (a fractional cap would make
        # the worst-case join quadratic in N again)
        rare = (
            sh.groupBy("s")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= cap)
            .select("s")
        )
        sh = sh.join(rare, "s")
    # the shingle set feeds cnt + both sides of the self-join; without
    # an explicit materialization the explode+distinct subtree would be
    # recomputed four times (measured 5x slowdown). At warehouse scale
    # this is a table write instead. localCheckpoint(eager=False), not
    # persist(): checkpoint blocks are reclaimed when the plan is GC'd,
    # so repeated bench/cascade invocations don't accumulate cache
    # blocks the function can never unpersist (ADVICE r5).
    sh = sh.localCheckpoint(eager=False)
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter_n"))
    )
    return (
        inter.join(cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .withColumn("union_n", F.col("na") + F.col("nb") - F.col("inter_n"))
        .withColumn(
            "jaccard",
            F.round(F.col("inter_n").cast("double") / F.col("union_n"), 6),
        )
        .where(F.col("jaccard") >= F.lit(min_jaccard))
        .select("doc_a", "doc_b", "inter_n", "union_n", "jaccard")
    )
