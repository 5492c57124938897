"""Duplicated-substring spans (ExactSubstr semantics, substr.py)."""

from __future__ import annotations

from cuda_selection_criteria_spark.functions.substr import duplicated_spans


def _spans(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_id, r.span_start, r.span_len)
        for r in duplicated_spans(docs, **kw).collect()
    }


def test_planted_shared_passage(spark):
    shared = "0123456789abcdefghijklmnopqrstuvwxyz"  # 36 chars
    # distinct boundary characters: the duplicated region is EXACTLY
    # the shared block (shared flanking chars would legitimately extend
    # the maximal span)
    rows = [
        (1, "AAA." + shared + "~BBBBB"),
        (2, "CCCCCCCCC_" + shared + "#DD"),
        (3, "totally unrelated text with no repeats at all here ok"),
    ]
    got = _spans(spark, rows, min_len=20, min_count=2)
    # doc1: shared starts at pos 5 (1-based), doc2 at pos 11; maximal
    # covered span = exactly the 36 shared chars (windows fully inside)
    assert (1, 5, 36) in got
    assert (2, 11, 36) in got
    assert not any(d == 3 for d, _, _ in got)


def test_within_document_repeat_counts(spark):
    blk = "qwertyuiopasdfghjklz"  # 20 chars = min_len
    rows = [(1, blk + "-----" + blk)]
    got = _spans(spark, rows, min_len=20, min_count=2)
    assert (1, 1, 20) in got and (1, 26, 20) in got


def test_overlapping_windows_merge_to_one_span(spark):
    shared = "x" * 50  # every window inside is duplicated; one span
    rows = [(1, "A" + shared + "B"), (2, "C" + shared + "D")]
    got = _spans(spark, rows, min_len=20, min_count=2)
    assert got == {(1, 2, 50), (2, 2, 50)}


def test_hash_key_mode_matches_gram_mode(spark):
    import random

    rng = random.Random(4)
    base = "".join(rng.choice("abcdef ghij") for _ in range(400))
    rows = [
        (i, base[: 100 + 20 * i] + "".join(rng.choice("klmnop") for _ in range(50)))
        for i in range(8)
    ]
    a = _spans(spark, rows, min_len=20, key="gram")
    b = _spans(spark, rows, min_len=20, key="hash")
    assert a == b  # collisions astronomically unlikely at this size
