"""Text-analysis operators over the ``documents`` table.

All column math is JVM-side (pyspark.sql.functions — whole-stage
codegen); no Python UDFs. Aggregates are integer-exact so results are
bit-comparable with the DuckDB oracle regardless of partitioning /
summation order (floating sums are order-dependent across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# spread() is applied ONLY where the per-row work measurably dominates
# the repartition exchange when the computation actually executes
# (quality_scores 4.07s -> 0.51s, lang_predict 1.93 -> 0.47,
# token_counts_bpe 1.64 -> 0.55 at a 50k-doc scale, noop-sink). The
# projection-only operators (doc_fingerprints, lang_id_scores) and the
# trivial aggregates (exact_dup_groups 0.29 plain vs 0.60 spread,
# token_stats) are deliberately NOT spread: a count()-shaped consumer
# prunes the projection entirely while the exchange would still run,
# and the hash/length work is cheaper than shuffling the text payload.
from .spread import spread


def token_count_col(text: Column) -> Column:
    """Whitespace token count, engine-portable form:
    length(text) - length(replace(text,' ','')) + 1, 0 for empty."""
    return F.when(F.length(text) == 0, F.lit(0)).otherwise(
        F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1
    )


def exact_dup_groups(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups by full-text equality.

    Groups on (xxhash64(text), md5(text)) — a 24-byte compound key —
    so full document bodies never ride the shuffle (at 100 TB the text
    column dominates; the hash pair is ~3 orders of magnitude
    narrower). Semantically identical to grouping by text itself unless
    two DIFFERENT texts collide on xxhash64 AND md5 simultaneously
    (< 2^-190 per pair; no in-group re-check can distinguish texts
    without shuffling them, and md5 is already a cryptographic-width
    check). Output matches the group-by-text oracle.
    """
    return (
        documents.groupBy(F.xxhash64("text").alias("_h"), F.md5("text").alias("_fp"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_id"))
        .where(F.col("n_docs") > 1)
        .select("canonical_id", "n_docs")
    )


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-language corpus statistics (integer-exact)."""
    toks = token_count_col(F.col("text"))
    return documents.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).alias("total_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
        F.min(F.length("text")).alias("min_chars"),
        F.max(F.length("text")).alias("max_chars"),
    )


def source_profile(documents: DataFrame) -> DataFrame:
    """Per-source quality profile (integer-exact)."""
    return documents.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def doc_fingerprints(documents: DataFrame) -> DataFrame:
    """Deterministic document fingerprint (md5 hex of text)."""
    return documents.select("doc_id", F.md5(F.col("text")).alias("fp"))


_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")

# tiny deterministic stopword banks for the language-ID vote
_LANG_BANKS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "las", "una"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
}


def _hits_expr(text_padded, words: tuple[str, ...]):
    """Sum of whole-word occurrence counts (portable length/replace form)."""
    total = None
    for w in words:
        pat = f" {w} "
        hits = (
            F.length(text_padded) - F.length(F.replace(text_padded, F.lit(pat), F.lit("")))
        ) / F.lit(len(pat))
        total = hits if total is None else total + hits
    return total


_BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_counts_bpe(documents: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens, alpha_tokens, digit_tokens).

    The BPE-ish count splits runs of letters, runs of digits, and
    individual punctuation — the cheap stand-in for subword tokenizer
    budgeting when sizing a training mix. Pattern is RE2/Java-regex
    portable so the DuckDB oracle matches exactly.
    """
    text = F.col("text")
    return spread(documents).select(
        "doc_id",
        token_count_col(text).alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{_BPE_ISH}', 0)")).cast("long").alias(
            "bpe_ish_tokens"
        ),
        F.size(F.expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).cast("long").alias(
            "alpha_tokens"
        ),
        F.size(F.expr("regexp_extract_all(text, '[0-9]+', 0)")).cast("long").alias(
            "digit_tokens"
        ),
    )


def lang_predict(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_pred): n-gram/stopword-vote language ID heuristic.

    Engine-portable: per-language whole-word stopword hit counts, argmax
    with a fixed tie order (en > es > de > und). Cheap, deterministic,
    entirely JVM-side column math.
    """
    text = F.col("text")
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    en = F.floor(_hits_expr(padded, _LANG_BANKS["en"])).cast("long")
    es = F.floor(_hits_expr(padded, _LANG_BANKS["es"])).cast("long")
    de = F.floor(_hits_expr(padded, _LANG_BANKS["de"])).cast("long")
    pred = (
        F.when((en >= es) & (en >= de) & (en > 0), F.lit("en"))
        .when((es >= de) & (es > 0), F.lit("es"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )
    return spread(documents).select("doc_id", pred.alias("lang_pred"))


def quality_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, + integer-scaled quality signals): the filter battery a
    training-data pipeline runs before dedup. All signals are integers
    (x1000 fixed-point where fractional) so the DuckDB oracle matches
    bit-for-bit regardless of partitioning.
    """
    text = F.col("text")
    length = F.length(text)
    toks = token_count_col(text)
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    stop_hits = F.floor(_hits_expr(padded, _STOPWORDS)).cast("long")
    space_n = length - F.length(F.replace(text, F.lit(" "), F.lit("")))
    return spread(documents).select(
        "doc_id",
        length.alias("n_chars_m"),
        toks.alias("n_tokens"),
        F.when(toks > 0, F.floor(F.lit(1000) * stop_hits / toks).cast("long"))
        .otherwise(F.lit(0))
        .alias("stopword_ratio_x1000"),
        F.when(length > 0, F.floor(F.lit(1000) * space_n / length).cast("long"))
        .otherwise(F.lit(0))
        .alias("space_ratio_x1000"),
        ((length >= 50) & (toks >= 10)).cast("int").alias("passes_length_gate"),
    )


def lang_id_scores(documents: DataFrame) -> DataFrame:
    """Cheap language-ID / quality heuristic signals per document:
    stopword hits (English n-gram evidence), token count, mean token
    length ×100 (integer), uppercase-free flag. Engine-portable
    expressions only.
    """
    text = F.col("text")
    toks = token_count_col(text)
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    stop_hits = None
    for w in _STOPWORDS:
        pat = f" {w} "
        # occurrence count = (len(s) - len(replace(s, pat, ''))) / len(pat)
        hits = (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit("")))) / F.lit(len(pat))
        stop_hits = hits if stop_hits is None else stop_hits + hits
    # floor() before the integer cast: Spark casts by truncation while
    # DuckDB casts by rounding — floor makes both engines agree.
    return documents.select(
        "doc_id",
        toks.alias("n_tokens"),
        F.floor(stop_hits).cast("long").alias("stopword_hits"),
        F.when(toks > 0, F.floor(F.lit(100) * (F.length(text) - toks + 1) / toks).cast("long"))
        .otherwise(F.lit(0))
        .alias("mean_token_len_x100"),
        (F.length(text) == F.length(F.lower(text))).cast("int").alias("is_lowercase"),
    )
