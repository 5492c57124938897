"""Intra-document repetition signals + corpus boilerplate detection.

The two document-quality operators a web-scale training-data pipeline
runs between the filter battery (``textstats.quality_scores``) and
dedup: Gopher-style repetition ratios (documents dominated by a few
repeated words are SEO spam / keyword stuffing) and global
heavy-hitter n-grams (navigation chrome / cookie banners shared by
thousands of pages — the stop-shingle list that feeds
``ngram_jaccard_pairs(max_df=...)`` and the winnow boilerplate cut).

All outputs are integer-exact (x1000 fixed-point for fractions) so the
DuckDB oracle matches bit-for-bit regardless of partitioning.

Scale shape (100 TB): both operators are explode -> groupBy chains
with map-side combine; keys are per-document words (bounded fanout per
doc) or k-char shingles (the corpus vocabulary). No self-joins, no
driver collects; ``boilerplate_ngrams`` ends in a global top-K —
TakeOrdered over partial per-partition top-Ks, not a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ngram import doc_shingles
from .spread import spread


def word_repetition_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_distinct_words, top_word_n,
    dup_word_frac_x1000, top_word_frac_x1000).

    ``dup_word_frac`` = fraction of word occurrences that are repeats
    of a word already seen in the document; ``top_word_frac`` = share
    of the single most frequent word (the Gopher repetition rules).
    Documents with no words (empty text) report all-zero signals
    rather than dropping out.
    """
    # spread: the word explode is the heavy map stage (spread.py)
    toks = spread(documents).select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
        ).alias("w"),
    )
    wc = toks.groupBy("doc_id", "w").agg(F.count("*").alias("n"))
    per = wc.groupBy("doc_id").agg(
        F.sum("n").alias("_nw"),
        F.count("*").alias("_nd"),
        F.max("n").alias("_top"),
    )
    n = F.coalesce(F.col("_nw"), F.lit(0)).cast("long")
    nd = F.coalesce(F.col("_nd"), F.lit(0)).cast("long")
    top = F.coalesce(F.col("_top"), F.lit(0)).cast("long")
    return (
        documents.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            n.alias("n_words"),
            nd.alias("n_distinct_words"),
            top.alias("top_word_n"),
            F.when(n > 0, F.floor(F.lit(1000) * (n - nd) / n).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            .alias("dup_word_frac_x1000"),
            F.when(n > 0, F.floor(F.lit(1000) * top / n).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            .alias("top_word_frac_x1000"),
        )
    )


def boilerplate_ngrams(
    documents: DataFrame, k: int = 5, top_n: int = 50
) -> DataFrame:
    """(s, df): the ``top_n`` character ``k``-grams by document
    frequency — the corpus's boilerplate vocabulary.

    Shingle semantics are exactly ``ngram.doc_shingles`` (overlapping,
    stride 1, distinct per document), so the output is the natural
    stop-shingle list for ``ngram_jaccard_pairs(max_df=...)`` and the
    winnow boilerplate cut. Tie order is total (df DESC, s ASC), so
    the selected set is deterministic across engines and partitionings.
    """
    sh = doc_shingles(documents, k, hashed=False)
    return (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("s"))
        .limit(top_n)
    )
