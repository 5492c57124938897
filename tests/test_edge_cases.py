"""Degenerate-input robustness: the pipeline must return empty results
(not crash) on empty corpora, single documents, and all-empty texts."""

from __future__ import annotations

from pyspark.sql import functions as F

from cuda_selection_criteria_spark.oracle import DedupConfig
from cuda_selection_criteria_spark.pipeline import dedup_pipeline

CFG = DedupConfig(tau=0.9, shingle_k=16, smh_m=64, hll_p=14)


def _run(spark, rows):
    pages = spark.createDataFrame(rows, "url string, text string")
    res = dedup_pipeline(pages, CFG)
    return res.dup_pairs.collect(), res.clusters.collect()


def test_empty_corpus(spark):
    pairs, clusters = _run(spark, [])
    assert pairs == [] and clusters == []


def test_single_document(spark):
    pairs, clusters = _run(spark, [("a", "just one document, long enough to shingle")])
    assert pairs == [] and clusters == []


def test_all_empty_or_short_texts(spark):
    # below shingle_k: zero shingles, zero cardinality -> skipped
    # (reference skips e2 == 0, selection.cpp:281)
    pairs, clusters = _run(spark, [("a", ""), ("b", "short"), ("c", None)])
    assert pairs == [] and clusters == []


def test_mixed_empty_and_duplicates(spark):
    body = "an actual duplicated page body with plenty of shingle material " * 3
    pairs, clusters = _run(
        spark, [("a", ""), ("b", body), ("c", body), ("d", "x")]
    )
    assert {(r.url_a, r.url_b) for r in pairs} == {("b", "c")}
    assert {r.url for r in clusters} == {"b", "c"}
