"""Containment gates for the sketch flagship (functions/gates.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cuda_selection_criteria_spark.functions.gates import (
    dup_pairs_jaccard_gate,
    exact_jaccard_for_pairs,
)
from cuda_selection_criteria_spark.oracle import DedupConfig
from cuda_selection_criteria_spark.pipeline import dedup_pipeline

CFG = DedupConfig(tau=0.9, shingle_k=16, smh_m=64, hll_p=14)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _base_rows():
    body = "the quick brown fox jumps over the lazy dog and then naps " * 6
    other = "completely different content about spark shuffles and joins " * 6
    return [
        (1, body),
        (2, body),  # exact duplicate of 1
        (3, body + " tiny tail change"),  # near-dup of 1/2
        (4, other),
    ]


def test_gate_empty_on_clean_pipeline(spark):
    docs = _docs(spark, _base_rows())
    pages = docs.select(F.col("doc_id").cast("string").alias("url"), "text")
    pairs = dedup_pipeline(pages, CFG).dup_pairs
    viol = dup_pairs_jaccard_gate(docs, pairs, CFG)
    assert viol.count() == 0


def test_gate_flags_missing_exact_duplicate(spark):
    docs = _docs(spark, _base_rows())
    pages = docs.select(F.col("doc_id").cast("string").alias("url"), "text")
    pairs = dedup_pipeline(pages, CFG).dup_pairs.where(
        ~((F.col("url_a") == "1") & (F.col("url_b") == "2"))
    )
    viol = dup_pairs_jaccard_gate(docs, pairs, CFG).collect()
    assert any(v.kind == "recall" and (v.url_a, v.url_b) == ("1", "2") for v in viol)


def test_gate_flags_low_jaccard_injected_pair(spark):
    docs = _docs(spark, _base_rows())
    pages = docs.select(F.col("doc_id").cast("string").alias("url"), "text")
    pairs = dedup_pipeline(pages, CFG).dup_pairs.union(
        spark.createDataFrame(
            [("1", "4", 0.95)], "url_a string, url_b string, jaccard double"
        )
    )
    viol = dup_pairs_jaccard_gate(docs, pairs, CFG).collect()
    assert any(v.kind == "precision" and (v.url_a, v.url_b) == ("1", "4") for v in viol)


def test_exact_jaccard_identical_and_disjoint(spark):
    docs = _docs(spark, _base_rows())
    pairs = spark.createDataFrame(
        [("1", "2"), ("1", "4")], "url_a string, url_b string"
    )
    got = {
        (r.url_a, r.url_b): r.exact_jaccard
        for r in exact_jaccard_for_pairs(pairs, docs, CFG.shingle_k).collect()
    }
    assert got[("1", "2")] == 1.0
    assert got[("1", "4")] < 0.05


def test_winnow_guarantee_gate_empty_and_sensitive(spark):
    from cuda_selection_criteria_spark.functions.gates import winnow_guarantee_gate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert winnow_guarantee_gate(docs, k=16, w=8).count() == 0


def test_ann_upper_bound_gate_empty(spark):
    from cuda_selection_criteria_spark.functions.gates import ann_upper_bound_gate

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert ann_upper_bound_gate(emb).count() == 0
