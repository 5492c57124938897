"""Structured Streaming surface.

The reference is batch-only (sketches persisted for re-runs,
SURVEY.md §2.6); these operators are the streaming extension a
continuously-crawled corpus needs: windowed event rollups with
watermarked late-data handling, and an incremental exact-dedup stage
(fingerprint dropDuplicates within a watermark horizon). HLL and
SuperMinHash are mergeable, so the batch sketch stage composes with
these via foreachBatch for incremental near-dup refresh.
"""

from .windows import windowed_event_counts, run_available_now
from .dedup import streaming_exact_dedup
from .neardup import streaming_band_candidates

__all__ = [
    "windowed_event_counts",
    "run_available_now",
    "streaming_exact_dedup",
    "streaming_band_candidates",
]
