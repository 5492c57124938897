"""Exact duplicated-substring spans — the suffix-array-substring dedup
family (north_rule: "MinHash/SimHash/suffix-array substring"),
re-expressed Spark-first.

Semantics follow the ExactSubstr training-data dedup (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL'22):
every byte covered by a length-L window that occurs >= min_count times
in the corpus is duplicated text; maximal covered runs are reported as
(doc_id, span_start, span_len). A suffix array is how a single node
finds those windows; the distributed plan needs none of it:

  1. explode every position's L-gram (JVM-side substring/transform —
     no Python, stride 1),
  2. groupBy gram -> occurrence count (partial aggregation map-side;
     NO self-join anywhere, so template floods cost f log f, not f^2),
  3. semi-join positions against grams with count >= min_count,
  4. per-doc island merge with a window function: consecutive
     duplicated positions chain while the next window starts before
     the previous one ends (gap <= L).

Every step is built-in DataFrame machinery; the whole operator is
ANSI-SQL-expressible, so the driver hash-checks it against DuckDB.

Scale knob: ``key="hash"`` (the DEFAULT — the 100 TB path) groups on
xxhash64(gram) instead of the gram string, so the frequency shuffle
carries 8 bytes instead of L characters per position (L=20 chars would
be a 20x text amplification through the groupBy at corpus scale). A
2^-64 collision can only mark a non-duplicated window as duplicated
(span coverage inflates by <= L bytes per collision, expected
corpus-wide inflation ~positions^2 / 2^64 windows — zero in practice);
``key="gram"`` keeps the raw string as the group key for bit-exact
oracle parity (the driver's DuckDB hash gate runs this variant; both
variants are pinned equal on the test corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .spread import spread


def duplicated_spans(
    documents: DataFrame,
    min_len: int = 20,
    min_count: int = 2,
    key: str = "hash",
) -> DataFrame:
    """(doc_id, span_start, span_len): maximal runs of text covered by
    length-``min_len`` windows occurring >= ``min_count`` times
    corpus-wide. span_start is 1-based (substring semantics)."""
    L = min_len
    # spread: the ~L-per-position gram explode is the heavy map stage
    # (spread.py)
    grams = spread(documents).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN length(text) >= {L} THEN "
                f"transform(sequence(1, length(text) - {L - 1}),"
                f" i -> substring(text, i, {L})) "
                f"ELSE array() END"
            )
        ).alias("off", "g"),
    ).select("doc_id", (F.col("off") + 1).alias("pos"), "g")
    if key == "hash":
        grams = grams.select("doc_id", "pos", F.xxhash64("g").alias("g"))
    hot = (
        grams.groupBy("g")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") >= min_count)
        .select("g")
    )
    covered = grams.join(hot, "g", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    # islands: a new span starts when this window no longer overlaps or
    # touches the previous one (prev covers [prev, prev+L))
    islands = (
        covered.withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "_new",
            (F.col("_prev").isNull() | (F.col("pos") > F.col("_prev") + L)).cast("int"),
        )
        .withColumn("_isl", F.sum("_new").over(w))
    )
    return (
        islands.groupBy("doc_id", "_isl")
        .agg(F.min("pos").alias("span_start"), (F.max("pos") + L - 1).alias("_end"))
        .select(
            "doc_id",
            F.col("span_start").cast("long").alias("span_start"),
            (F.col("_end") - F.col("span_start") + 1).cast("long").alias("span_len"),
        )
    )
