"""CCNet-style line-level dedup: drop lines whose document frequency
crosses a threshold, keep everything else in order.

The standard web-corpus cleaning step between exact-dup removal and
near-dup detection (CCNet, arXiv:1911.00359 §3.1, which dedups by
per-line hash across shards; C4, arXiv:1910.10683, drops three-
sentence-window repeats; RefinedWeb, arXiv:2306.01116): boilerplate — nav bars,
cookie banners, footers — repeats VERBATIM as whole lines across many
pages, so a line seen in >= ``min_df`` distinct documents is removed
from every document, and the per-document remainder is reassembled in
original line order.

Shape (all built-ins, one Arrow-free pass):

1. ``posexplode(split(text, delim))`` — narrow;
2. line document-frequency: groupBy on a 24-byte ``(xxhash64, md5)``
   line key (the repo's standard collision-safe key discipline — only
   key+doc_id ride this shuffle, never the line text) with
   ``countDistinct(doc_id)``, kept only where ``line_df >= min_df``
   — the FLOODED set;
3. ``left_anti`` join of the lines against the flooded keys — the
   flooded set is the distinct boilerplate vocabulary (small even at
   10^12 docs), so AQE picks a broadcast join and the line payload
   stays map-side;
4. reassemble: ``array_join(transform(array_sort(collect_list(
   struct(pos, line)))))`` per doc — one shuffle on doc_id, the only
   exchange the text payload ever rides (it is the output).

Scale notes: the flooded table has one row per DISTINCT boilerplate
line; a line appearing on 10^9 pages costs one partial count per task
(map-side combine), not a hot reduce key. Joining against the flooded
set rather than the full df table is what keeps the anti-join
broadcastable. Docs whose every line was boilerplate survive with
empty text (left join + coalesce) — dropping them is the caller's
policy.

``rechunk_lines`` is the test-surface adapter: the synthetic
``documents`` corpus is single-line, so the driver query first
re-chunks each doc into ``words_per_line``-word lines (pure
``transform(sequence(...))`` expression, mirrored exactly by the
DuckDB oracle's zip-unnest) and then line-dedups the result — the
operator itself is delimiter-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spread import spread


def rechunk_lines(
    documents: DataFrame,
    words_per_line: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Re-chunk whitespace words into ``words_per_line``-word lines
    joined by ``\\n`` (deterministic multi-line stand-in for page
    text). Pure expression — no UDF, no shuffle.

    Assumes words contain no embedded ``\\n`` (the join delimiter):
    callers with newline-bearing text should flatten it first
    (``regexp_replace(text, '\\n', ' ')``), as the driver query does.
    """
    w = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n_chunks = F.ceil(F.size(w) / F.lit(float(words_per_line))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.array_join(
            F.slice(w, i * words_per_line + 1, words_per_line), " "
        ),
    )
    return documents.withColumn(text_col, F.array_join(chunks, "\n"))


def line_dedup(
    documents: DataFrame,
    min_df: int = 2,
    delim: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove lines appearing in >= ``min_df`` distinct docs.

    Returns ``(id_col, n_lines, n_kept, cleaned_text)``.
    """
    # NULL text == empty text (one empty line): the cascade's round-5
    # NULL-drop bug showed exploded paths silently lose NULL-text docs.
    # spread: split + posexplode + line hashing is the heavy map stage
    # (spread.py)
    docs = spread(documents).select(
        id_col,
        F.split(F.coalesce(F.col(text_col), F.lit("")), delim).alias("_lines"),
    )
    lines = docs.select(
        id_col, F.posexplode("_lines").alias("pos", "line")
    ).withColumn("lk_h", F.xxhash64("line")).withColumn("lk_m", F.md5("line"))
    flooded = (
        lines.groupBy("lk_h", "lk_m")
        .agg(F.count_distinct(F.col(id_col)).alias("line_df"))
        .where(F.col("line_df") >= min_df)
        .select("lk_h", "lk_m")
    )
    kept = (
        lines.join(flooded, ["lk_h", "lk_m"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s.line,
                ),
                delim,
            ).alias("cleaned_text"),
        )
    )
    return (
        docs.select(id_col, F.size("_lines").alias("n_lines"))
        .join(kept, id_col, "left")
        .select(
            id_col,
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )
