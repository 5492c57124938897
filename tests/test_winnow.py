"""Winnowing fingerprints: guarantee + pair detection."""

from __future__ import annotations

import numpy as np
import pandas as pd

from cuda_selection_criteria_spark.functions.winnow import (
    _winnow,
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def test_winnow_guarantee_shared_substring():
    # docs sharing a substring of length >= w + k - 1 share a fingerprint
    k, w = 16, 8
    common = "this is a long shared passage that exceeds the winnowing guarantee window"
    a = "prefix one xyz " + common + " suffix alpha"
    b = "totally different start " + common + " and another ending"
    from cuda_selection_criteria_spark.sketchlib.hashes import shingle_hashes

    fa = set(_winnow(shingle_hashes(a, k, dedup=False), w).tolist())
    fb = set(_winnow(shingle_hashes(b, k, dedup=False), w).tolist())
    assert fa & fb


def test_winnow_rightmost_tie_deterministic():
    h = np.array([5, 5, 5, 5, 5], dtype=np.uint64)
    assert _winnow(h, 3).tolist() == [5]


def test_winnow_pairs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "aaaa shared segment of substantial length here bbbb" * 2,
                "cccc shared segment of substantial length here dddd" * 2,
                "completely unrelated words that overlap with nothing at all",
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    pairs = {(r.doc_a, r.doc_b): r.shared_fps for r in winnow_overlap_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
    fps = winnow_fingerprints(docs).collect()
    assert len({r.doc_id for r in fps}) == 3
