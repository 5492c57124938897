"""Pipeline parity at the reference's timing-experiment config m=512
(MH_SIZE_ARR=(512) in /root/reference/run_time_experiment.sh)."""

from __future__ import annotations

from cuda_selection_criteria_spark.corpus import generate_pages
from cuda_selection_criteria_spark.oracle import DedupConfig, oracle_dup_pairs
from cuda_selection_criteria_spark.pipeline import dedup_pipeline, pages_from_corpus
from cuda_selection_criteria_spark.sketchlib import lsh_params


def test_lsh_params_m512():
    # smallest divisor of 512 with P_r >= 0.95 at tau=0.9
    assert lsh_params(512, 0.9) == (32, 16)


def test_pipeline_matches_oracle_m512(spark):
    cfg = DedupConfig(tau=0.9, shingle_k=31, smh_m=512, hll_p=14)
    rows, _ = generate_pages(100, 11)
    expect = {
        tuple(sorted((a, b))): j
        for a, b, j in oracle_dup_pairs([(r.url, r.text) for r in rows], cfg)
    }
    pages = pages_from_corpus(spark, 100, 11, partitions=4)
    res = dedup_pipeline(pages, cfg)
    got = {(r.url_a, r.url_b): r.jaccard for r in res.dup_pairs.collect()}
    assert set(got) == set(expect)
    for k, v in got.items():
        assert abs(v - expect[k]) < 1e-9
