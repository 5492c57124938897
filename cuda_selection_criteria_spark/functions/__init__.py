"""Document / embedding analytics operators (training-data pipeline
surface): exact dedup, n-gram Jaccard, text stats, fingerprints,
language heuristics, embedding similarity search."""

from .textstats import token_count_col, exact_dup_groups, token_stats, source_profile, doc_fingerprints, lang_id_scores
from .ngram import ngram_jaccard_pairs
from .similarity import embedding_knn, embedding_lsh_candidates

__all__ = [
    "token_count_col",
    "exact_dup_groups",
    "token_stats",
    "source_profile",
    "doc_fingerprints",
    "lang_id_scores",
    "ngram_jaccard_pairs",
    "embedding_knn",
    "embedding_lsh_candidates",
]
