"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD'03 — the MOSS algorithm).

Selects, from each window of ``w`` consecutive k-gram hashes, the
minimum hash (rightmost on ties, per the paper) — guaranteeing that any
shared substring of length >= w + k - 1 between two documents shares a
fingerprint. The substring-overlap detector that complements the
set-overlap detectors (SuperMinHash/SimHash).

Hashing reuses sketchlib's polynomial+splitmix map (vectorized numpy
inside mapInPandas); selection is a sliding-window argmin per doc.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spread import spread

from ..sketchlib.hashes import shingle_hashes


def _winnow(hashes: np.ndarray, w: int) -> np.ndarray:
    """Positions' values selected by winnowing; returns unique selected
    hash values. hashes = UNdeduplicated k-gram sequence (order matters)."""
    n = hashes.shape[0]
    if n == 0:
        return hashes
    if n <= w:
        return np.array([hashes.min()], dtype=hashes.dtype)
    # sliding-window minimum via stride tricks (windows of length w)
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    # rightmost minimum per window: reverse, argmin finds FIRST (== rightmost
    # in original orientation), convert index back
    rev = win[:, ::-1]
    arg = rev.argmin(axis=1)
    sel_pos = np.arange(win.shape[0]) + (w - 1 - arg)
    return np.unique(hashes[sel_pos])


def winnow_fingerprints(
    documents: DataFrame, k: int = 16, w: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, fp): exploded winnowing fingerprint set per document."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, fps = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                seq = shingle_hashes(text or "", k, dedup=False)
                sel = _winnow(seq, w)
                ids.append(np.full(sel.size, did, dtype=np.int64))
                fps.append(sel.astype(np.int64))  # u64 bit-cast
            yield pd.DataFrame(
                {"doc_id": np.concatenate(ids), "fp": np.concatenate(fps)}
            )

    # spread: the per-doc winnow kernel is the heavy map stage (spread.py)
    return spread(documents.select(F.col(id_col).alias("doc_id"), "text")).mapInPandas(
        fn, schema="doc_id long, fp long"
    )


def winnow_overlap_pairs(
    documents: DataFrame,
    k: int = 16,
    w: int = 8,
    min_shared: int = 3,
    max_df: int | None = 100,
) -> DataFrame:
    """(doc_a, doc_b, shared_fps): pairs sharing >= min_shared
    fingerprints — substring-level near-dup candidates. Same
    explode + equi-join shape as every other candidate generator.

    ``max_df``: fingerprints present in more than this many documents
    are dropped BEFORE the self-join (the absolute stop-shingle cut of
    ngram.py, applied to fingerprints). Without it one boilerplate
    substring shared by f documents contributes f^2 join rows — the
    scale-killer at web corpus size. Part of the operator definition
    (MOSS itself drops ubiquitous fingerprints as template noise);
    pairs whose overlap is ONLY boilerplate are intentionally excluded.
    """
    fps = winnow_fingerprints(documents, k, w)
    if max_df is not None:
        rare = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_df)  # absolute cap: join fanout
            .select("fp")  # per fp bounded by max_df^2, corpus-size-free
        )
        fps = fps.join(rare, "fp")
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
