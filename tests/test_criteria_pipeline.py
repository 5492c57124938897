"""Pipeline parity for the non-default criteria (hll_a, hll_an, cb)."""

from __future__ import annotations

import pytest

from cuda_selection_criteria_spark.corpus import generate_pages
from cuda_selection_criteria_spark.oracle import DedupConfig, oracle_dup_pairs
from cuda_selection_criteria_spark.pipeline import dedup_pipeline, pages_from_corpus

N_ROWS = 150
SEED = 7


@pytest.mark.parametrize("criterion", ["hll_a", "hll_an", "cb"])
def test_criterion_matches_oracle(spark, criterion):
    cfg = DedupConfig(criterion=criterion)
    rows, _ = generate_pages(N_ROWS, SEED)
    expect = {
        tuple(sorted((a, b))): j
        for a, b, j in oracle_dup_pairs([(r.url, r.text) for r in rows], cfg)
    }
    pages = pages_from_corpus(spark, N_ROWS, SEED, partitions=4)
    res = dedup_pipeline(pages, cfg)
    got = {(r.url_a, r.url_b): r.jaccard for r in res.dup_pairs.collect()}
    assert set(got) == set(expect)
    for k, v in got.items():
        assert abs(v - expect[k]) < 1e-9
