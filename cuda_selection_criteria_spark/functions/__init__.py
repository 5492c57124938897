"""Document / embedding analytics operators (training-data pipeline
surface): exact dedup, n-gram Jaccard, text stats, fingerprints,
language heuristics, embedding similarity search."""

from .textstats import (
    token_count_col,
    exact_dup_groups,
    token_stats,
    source_profile,
    doc_fingerprints,
    lang_id_scores,
    lang_predict,
    quality_scores,
    token_counts_bpe,
)
from .ngram import ngram_jaccard_pairs
from .sampling import (
    hash_bernoulli_sample,
    rate_threshold,
    sample_key,
    stratified_sample,
)
from .cascade import cascade_summary, dedup_cascade
from .urltools import (
    synthetic_urls,
    url_dedup_groups,
    with_canonical_url,
)
from .linededup import line_dedup, rechunk_lines
from .bloom import (
    bloom_bitmap,
    bloom_might_contain,
    bloom_params,
    bloom_subset_gate,
    dedup_against_reference,
    with_bloom_verdict,
)
from .repetition import boilerplate_ngrams, word_repetition_scores
from .events_analytics import (
    asof_join,
    event_type_stats,
    events_asof_clicks,
    key_skew_profile,
    sessionize,
)
from .similarity import embedding_knn, embedding_lsh_candidates, embedding_sim_pairs
from .simhash import simhash_docs, simhash_pairs
from .multimodal import (
    media_features,
    media_feature_sums,
    media_from_documents,
    media_thumbnails,
    frame_sample,
    synthetic_media,
)

__all__ = [
    "token_count_col",
    "exact_dup_groups",
    "token_stats",
    "source_profile",
    "doc_fingerprints",
    "lang_id_scores",
    "lang_predict",
    "quality_scores",
    "token_counts_bpe",
    "ngram_jaccard_pairs",
    "hash_bernoulli_sample",
    "rate_threshold",
    "sample_key",
    "stratified_sample",
    "cascade_summary",
    "dedup_cascade",
    "boilerplate_ngrams",
    "word_repetition_scores",
    "asof_join",
    "event_type_stats",
    "events_asof_clicks",
    "key_skew_profile",
    "sessionize",
    "embedding_knn",
    "embedding_lsh_candidates",
    "embedding_sim_pairs",
    "simhash_docs",
    "simhash_pairs",
    "media_features",
    "media_feature_sums",
    "media_from_documents",
    "media_thumbnails",
    "frame_sample",
    "synthetic_media",
    "with_canonical_url",
    "url_dedup_groups",
    "synthetic_urls",
    "line_dedup",
    "rechunk_lines",
    "bloom_params",
    "bloom_bitmap",
    "bloom_might_contain",
    "dedup_against_reference",
    "bloom_subset_gate",
    "with_bloom_verdict",
]
