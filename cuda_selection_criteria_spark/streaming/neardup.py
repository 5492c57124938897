"""Streaming near-duplicate candidate generation: a custom stateful
operator built on ``applyInPandasWithState``.

The batch pipeline's star pairing (operators/candidates._star_pairs)
re-expressed for an unbounded crawl stream: sketches are computed by
the SAME fused mapInPandas stage (mapInPandas works on streaming
DataFrames), bands explode exactly as in batch, and per (band_id,
band) bucket a GroupState holds the bucket REPRESENTATIVE (first-seen
doc). Every later arrival in the bucket emits one candidate pair
(representative, newcomer) after the CB cardinality prune — O(1) state
and O(1) output per arrival, the streaming analogue of star mode's
linear candidate volume.

State is TTL-bounded (ProcessingTimeTimeout): a bucket idle longer
than ``state_ttl`` is dropped, so state size tracks the active-horizon
corpus, not the full crawl history — mandatory for 10^12-doc streams.
Candidates feed the batch verify stage via foreachBatch (HLL blobs are
joined in per micro-batch, never held in state).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..oracle import DedupConfig
from ..operators.candidates import explode_bands
from ..operators.sketch import sketch_pages

CANDIDATE_SCHEMA = "id_a long, id_b long, card_a long, card_b long"
_STATE_SCHEMA = "rep_id long, rep_card long"


def _pair_fn(tau: float, ttl_ms: int | None):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            rep_id, rep_card = state.get
        else:
            rep_id, rep_card = None, None
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            state.update((rep_id, rep_card))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        batch = pd.concat(parts) if len(parts) > 1 else parts[0]
        # deterministic within a micro-batch: smallest url_id first;
        # the representative is fixed after the first arrival, so the
        # whole batch CB-prunes in one vectorized numpy pass (no
        # per-row Python — same discipline as the batch kernels).
        order = np.argsort(batch["url_id"].values, kind="stable")
        uids = batch["url_id"].values[order].astype(np.int64)
        cards = batch["card_i"].values[order].astype(np.int64)
        if rep_id is None:
            rep_id, rep_card = int(uids[0]), int(cards[0])
            uids, cards = uids[1:], cards[1:]
        mask = uids != rep_id
        uids, cards = uids[mask], cards[mask]
        lo = np.minimum(cards, rep_card)
        hi = np.maximum(cards, rep_card)
        keep = (hi > 0) & (lo >= tau * hi)  # CB prune (criteria_sketch.hpp:45-49)
        uids, cards = uids[keep], cards[keep]
        state.update((rep_id, rep_card))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if uids.size:
            first = uids < rep_id
            yield pd.DataFrame(
                {
                    "id_a": np.where(first, uids, rep_id),
                    "id_b": np.where(first, rep_id, uids),
                    "card_a": np.where(first, cards, rep_card),
                    "card_b": np.where(first, rep_card, cards),
                }
            )

    return fn


def streaming_band_candidates(
    pages: DataFrame,
    cfg: DedupConfig = DedupConfig(),
    state_ttl_ms: int | None = 3_600_000,
) -> DataFrame:
    """pages stream (url, text, ...) -> candidate pair stream
    (id_a, id_b, card_a, card_b), append mode.

    Emits the star-mode candidate set incrementally: connected
    components over the emitted pairs equal the batch star pairing's
    (every bucket member links to one bucket representative). Pairs may
    repeat across bands/micro-batches — downstream dedups (the batch
    path's dropDuplicates becomes dropDuplicatesWithinWatermark or
    idempotent MERGE into the dup_pairs table).

    ``state_ttl_ms``: state TTL for continuous streams (bounds state to
    the active horizon). Pass ``None`` for bounded availableNow drains:
    with a TTL pending, Trigger.AvailableNow keeps firing empty
    micro-batches to service future timeouts and never terminates
    (measured: 36 empty batches in 60 s on a one-file drain).
    """
    sk = sketch_pages(pages, cfg, min_partitions=1 if pages.isStreaming else None)
    bands = explode_bands(sk, cfg)
    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return bands.groupBy("band_id", "band").applyInPandasWithState(
        _pair_fn(cfg.tau, state_ttl_ms),
        CANDIDATE_SCHEMA,
        _STATE_SCHEMA,
        "append",
        timeout,
    )
