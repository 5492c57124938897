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


def test_winnow_boilerplate_df_cap(spark):
    """A boilerplate substring shared by MANY docs must not explode the
    self-join: with max_df below the flood size, the flood contributes
    zero pairs; genuine rare overlaps still surface."""
    import random

    boiler = "standard site footer boilerplate text repeated on every single page "
    rare = "a genuinely shared unique passage long enough to fingerprint reliably "

    def gibberish(i: int) -> str:
        # per-doc random letters: no k=16 window recurs across docs
        rng = random.Random(1000 + i)
        return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(60))

    rows = [(i, boiler + gibberish(i)) for i in range(40)]
    rows += [(100, rare + "tail one"), (101, rare + "tail two")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = winnow_overlap_pairs(docs, min_shared=1, max_df=10).collect()
    got = {(r.doc_a, r.doc_b) for r in capped}
    assert (100, 101) in got
    # the flood collapses: the hot fingerprints (df=40) are gone, so the
    # clique's 780 pairs shrink to the few boundary-selected low-df
    # stragglers (winnowing's selection varies near the suffix junction)
    boiler_pairs = sum(1 for a, b in got if a < 100 and b < 100)
    assert boiler_pairs < 50

    # join fanout bound: after the cap no fingerprint joins more than
    # max_df docs (the f^2-rows-per-fp scale killer)
    from pyspark.sql import functions as F

    fps = winnow_fingerprints(docs)
    rare = fps.groupBy("fp").agg(F.count("*").alias("df")).where(F.col("df") <= 10)
    assert fps.join(rare, "fp").groupBy("fp").count().agg(F.max("count")).collect()[0][0] <= 10

    uncapped = winnow_overlap_pairs(docs, min_shared=1, max_df=None)
    assert uncapped.where("doc_a < 100 AND doc_b < 100").count() == 780


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
