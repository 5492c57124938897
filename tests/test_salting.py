"""Explicit two-level salting of the parity band join (SURVEY §4 skew
promise): a template clique (identical pages on one hot domain) floods
one band bucket; salting must spread the pair work across s^2 shuffle
keys without changing the emitted pair set."""

from __future__ import annotations

from pyspark.sql import functions as F

from cuda_selection_criteria_spark.operators.candidates import (
    candidate_pairs,
    explode_bands,
)
from cuda_selection_criteria_spark.operators import sketch_pages
from cuda_selection_criteria_spark.oracle import DedupConfig

CFG = DedupConfig(tau=0.9, shingle_k=16, smh_m=64, hll_p=14)
CLIQUE = 60
SALT_TARGET = 16


def _pages(spark):
    template = (
        "identical template page body served for every product url on "
        "the hot domain with enough text to shingle robustly " * 3
    )
    rows = [(f"hot/{i:03d}", template) for i in range(CLIQUE)]
    rows += [
        (f"cold/{i}", f"unique cold page number {i} with its own distinct words "
         f"and enough length to produce a real shingle set for document {i}")
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "url string, text string")


def test_salted_pairs_identical_to_unsalted(spark):
    sk = sketch_pages(_pages(spark), CFG).localCheckpoint(eager=True)
    base = {
        (r.id_a, r.id_b) for r in candidate_pairs(sk, CFG).collect()
    }
    salted = {
        (r.id_a, r.id_b)
        for r in candidate_pairs(sk, CFG, salt_target=SALT_TARGET).collect()
    }
    assert salted == base
    # the clique contributes all its pairs
    assert len(base) >= CLIQUE * (CLIQUE - 1) // 2


def test_salt_bounds_per_key_join_work(spark):
    """No single (band, salt_a, salt_b) join key may hold more than
    ~salt_target rows per side — the straggler-task bound the salting
    exists to enforce."""
    sk = sketch_pages(_pages(spark), CFG).localCheckpoint(eager=True)
    bands = explode_bands(sk, CFG)
    sizes = bands.groupBy("band_id", "band").agg(F.count("*").alias("_n"))
    # the hot bucket really is hot (every clique member shares every band)
    assert sizes.agg(F.max("_n")).collect()[0][0] >= CLIQUE
    salted = (
        bands.join(sizes, ["band_id", "band"])
        .withColumn("_s", F.ceil(F.col("_n") / F.lit(SALT_TARGET)).cast("int"))
        .withColumn("sa", F.pmod(F.xxhash64("url_id"), F.col("_s")).cast("int"))
    )
    per_key = salted.groupBy("band_id", "band", "sa").agg(F.count("*").alias("rows"))
    max_side = per_key.agg(F.max("rows")).collect()[0][0]
    # xxhash64 spreads the clique near-uniformly; 2x headroom on the target
    assert max_side <= 2 * SALT_TARGET
