"""Exact character-n-gram Jaccard near-duplicate pairs.

The SQL-checkable sibling of the sketch pipeline: same shingle
semantics (overlapping, stride 1), exact set intersection via
explode + equi-join + count instead of sketches. Quadratic in cluster
size, linear in corpus: only docs sharing at least one shingle pair up,
so Catalyst's shuffle on the shingle key does the candidate pruning.

Integer counts + round(jaccard, 6) keep it bit-comparable with DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_shingles(documents: DataFrame, k: int) -> DataFrame:
    """(doc_id, s): the distinct k-char shingle set per document."""
    return documents.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(text) - {k - 1}, 0)),"
                f" i -> substring(text, i, {k}))"
            )
        ).alias("s"),
    ).distinct()


def ngram_jaccard_pairs(
    documents: DataFrame, k: int = 5, min_jaccard: float = 0.5
) -> DataFrame:
    """(doc_a, doc_b, inter_n, union_n, jaccard) for pairs with exact
    k-gram Jaccard >= min_jaccard, doc_a < doc_b."""
    sh = doc_shingles(documents, k)
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
