"""Round-5 regression tests: vectorized Ertl-MLE bit-identity, the
collision-free dense url_id spine, and the cb_bucket_pairs flood guard
(VERDICT r4 "What's wrong" #1-#4)."""

from __future__ import annotations

import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuda_selection_criteria_spark.oracle import DedupConfig
from cuda_selection_criteria_spark.operators import sketch_pages
from cuda_selection_criteria_spark.operators.candidates import cb_bucket_pairs
from cuda_selection_criteria_spark.pipeline import dedup_pipeline, pages_from_corpus
from cuda_selection_criteria_spark.sketchlib.hll import (
    ertl_mle,
    ertl_mle_batch,
    hll_build,
    sum_counts,
)

CFG = DedupConfig(tau=0.9, shingle_k=16, smh_m=64, hll_p=14)


# ------------------------------------------------------------ ertl_mle_batch


@pytest.mark.parametrize("p", [14, 8])
def test_ertl_mle_batch_bit_identical(p):
    """Every row of the vectorized secant must equal the scalar port
    bit-for-bit — same IEEE-754 op sequence per row by construction."""
    rng = np.random.default_rng(7)
    m = 1 << p
    hists = []
    # sparse/dense synthetic register files incl. empty and saturated
    for fill in sorted({0, 1, 3, 10, min(100, m), m // 2, m - 1, m}):
        regs = np.zeros(m, dtype=np.uint8)
        if fill:
            idx = rng.choice(m, size=fill, replace=False)
            regs[idx] = rng.integers(1, 64 - p + 2, size=fill)
        hists.append(sum_counts(regs))
    hists.append(sum_counts(np.full(m, 64 - p + 1, dtype=np.uint8)))  # -> inf
    # realistic: folded from random hashes at varied cardinalities
    for n_el in (5, 500, 50_000, 500_000):
        regs = hll_build(rng.integers(0, 2**63, size=n_el, dtype=np.uint64), p)
        hists.append(sum_counts(regs))
    H = np.stack(hists)
    scalar = np.array([ertl_mle(h, p) for h in H])
    batch = ertl_mle_batch(H, p)
    assert (np.isinf(scalar) == np.isinf(batch)).all()
    fin = ~np.isinf(scalar)
    assert np.array_equal(scalar[fin], batch[fin])  # bit-identical


def test_ertl_mle_batch_single_row_and_1d():
    regs = hll_build(np.arange(1000, dtype=np.uint64), 14)
    h = sum_counts(regs)
    assert ertl_mle_batch(h, 14)[0] == ertl_mle(h, 14)


# ------------------------------------------------------- dense url_id spine


def test_dense_ids_unique_and_default(spark):
    pages = pages_from_corpus(spark, 200, seed=11, partitions=4)
    sk = sketch_pages(pages, CFG).localCheckpoint(eager=True)
    n = sk.count()
    assert n == 200
    assert sk.select("url_id").distinct().count() == n  # collision-free
    # dense ids are NOT url hashes (the r4 silent-merge hazard)
    hashed = sk.withColumn("_h", F.xxhash64("url")).where(
        F.col("_h") == F.col("url_id")
    )
    assert hashed.count() < n


LONG_A = (
    "shared template body for the two genuine near-duplicate documents "
    "with plenty of shingleable text content repeated enough times " * 4
)
LONG_C = (
    "completely unrelated third document about a different topic entirely "
    "carrying its own distinct vocabulary and enough length to sketch " * 4
)


def test_forced_id_collision_wrongly_merges(spark):
    """Documents: A ~ B (true dups), C unrelated. Forcing C onto B's
    url_id (what a 64-bit hash surrogate does at 10^12-doc scale,
    n^2/2^65 times) conflates C with the A-B cluster — the hazard the
    dense spine closes."""
    pages = spark.createDataFrame(
        [
            ("a", 1, LONG_A),
            ("b", 2, LONG_A),
            ("c", 2, LONG_C),  # forced collision with b
        ],
        "url string, url_id long, text string",
    )
    res = dedup_pipeline(pages, CFG)
    clusters = {r.url: r.cluster_id for r in res.clusters.collect()}
    assert clusters["a"] == clusters["b"]  # true dup pair found
    assert clusters.get("c") == clusters["a"]  # the WRONG merge happens


def test_dense_ids_keep_collision_victims_apart(spark):
    """Same three documents through the default dense-id pipeline:
    C stays out of the A-B cluster."""
    pages = spark.createDataFrame(
        [
            ("a", LONG_A),
            ("b", LONG_A),
            ("c", LONG_C),
        ],
        "url string, text string",
    )
    res = dedup_pipeline(pages, CFG)
    clusters = {r.url: r.cluster_id for r in res.clusters.collect()}
    assert clusters["a"] == clusters["b"]
    assert clusters.get("c") != clusters["a"]  # no silent merge


def test_warehouse_ids_stable_and_content_determined(tmp_path, spark):
    """Part-scoped warehouse ids: unique, reproduced identically on
    re-read after resume, and a pure function of table content (a
    fresh warehouse over the same pages assigns the same ids)."""
    from cuda_selection_criteria_spark.warehouse import Warehouse, sketch_with_resume

    pages = pages_from_corpus(spark, 120, seed=5, partitions=3)
    wh1 = Warehouse(spark, str(tmp_path / "wh1"))
    sk1 = sketch_with_resume(wh1, pages, CFG, n_parts=8, run_id="r1")
    ids1 = {r.url: r.url_id for r in sk1.select("url", "url_id").collect()}
    assert len(set(ids1.values())) == len(ids1)  # unique
    # resume (no todo parts) reproduces the persisted ids
    sk2 = sketch_with_resume(wh1, pages, CFG, n_parts=8, run_id="r2")
    ids2 = {r.url: r.url_id for r in sk2.select("url", "url_id").collect()}
    assert ids1 == ids2
    # content-determined: a fresh warehouse assigns the same mapping
    wh2 = Warehouse(spark, str(tmp_path / "wh2"))
    sk3 = sketch_with_resume(wh2, pages, CFG, n_parts=8, run_id="r3")
    ids3 = {r.url: r.url_id for r in sk3.select("url", "url_id").collect()}
    assert ids1 == ids3


def test_warehouse_refuses_metaless_resume(tmp_path, spark):
    """ADVICE r4: completed sketch parts with no sketch_meta must refuse
    to resume instead of back-filling the NEW run's config as the
    recorded identity."""
    from cuda_selection_criteria_spark.warehouse import Warehouse, sketch_with_resume

    pages = pages_from_corpus(spark, 60, seed=5, partitions=2)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sketch_with_resume(wh, pages, CFG, n_parts=4, run_id="r1")
    shutil.rmtree(wh.path("sketch_meta"))  # pre-sketch_meta-era warehouse
    with pytest.raises(ValueError, match="no sketch_meta"):
        sketch_with_resume(wh, pages, CFG, n_parts=4, run_id="r2")


# -------------------------------------------------- cb_bucket_pairs salting

FLOOD = 80


def _flood_pages(spark):
    template = (
        "identical template page flooding a single log-cardinality bucket "
        "with enough repeated shingleable text to build a stable sketch " * 3
    )
    rows = [(f"hot/{i:03d}", template + f" v{i % 2}") for i in range(FLOOD)]
    rows += [
        (
            f"cold/{i}",
            f"cold page {i} with distinct words " + ("filler words here " * (3 + 5 * i)),
        )
        for i in range(15)
    ]
    return spark.createDataFrame(rows, "url string, text string")


def test_cb_salted_pairs_identical_to_unsalted(spark):
    cfg = DedupConfig(tau=0.9, shingle_k=16, smh_m=64, hll_p=14, criterion="cb")
    sk = sketch_pages(_flood_pages(spark), cfg).localCheckpoint(eager=True)
    base = {(r.id_a, r.id_b) for r in cb_bucket_pairs(sk, cfg).collect()}
    salted = {
        (r.id_a, r.id_b)
        for r in cb_bucket_pairs(sk, cfg, salt_target=16).collect()
    }
    assert salted == base
    # the flood bucket really floods: the clique contributes its pairs
    assert len(base) >= FLOOD * (FLOOD - 1) // 2


def test_cb_salt_bounds_per_key_rows(spark):
    """No single (bkt, sa) key may hold more than ~salt_target rows per
    side — the straggler bound the guard enforces within a
    log-cardinality bucket (r4 VERDICT #1: previously quadratic)."""
    import math

    cfg = DedupConfig(tau=0.9, shingle_k=16, smh_m=64, hll_p=14, criterion="cb")
    sk = sketch_pages(_flood_pages(spark), cfg).localCheckpoint(eager=True)
    inv_log = 1.0 / math.log(1.0 / cfg.tau)
    target = 16
    base = sk.where(F.col("card_i") > 0).select(
        "url_id",
        F.floor(F.log(F.col("card_i").cast("double")) * F.lit(inv_log)).alias("bkt"),
    )
    sizes = base.groupBy("bkt").agg(F.count("*").alias("_n"))
    assert sizes.agg(F.max("_n")).collect()[0][0] >= FLOOD  # flood is real
    salted = (
        base.join(sizes, "bkt")
        .withColumn("_s", F.ceil(F.col("_n") / F.lit(target)).cast("int"))
        .withColumn("sa", F.pmod(F.xxhash64("url_id"), F.col("_s")).cast("int"))
    )
    per_key = salted.groupBy("bkt", "sa").agg(F.count("*").alias("rows"))
    assert per_key.agg(F.max("rows")).collect()[0][0] <= 2 * target


def test_cb_max_bucket_drops_flooded_bucket(spark):
    cfg = DedupConfig(tau=0.9, shingle_k=16, smh_m=64, hll_p=14, criterion="cb")
    sk = sketch_pages(_flood_pages(spark), cfg).localCheckpoint(eager=True)
    capped = cb_bucket_pairs(sk, cfg, max_bucket=FLOOD // 2)
    base = cb_bucket_pairs(sk, cfg)
    assert capped.count() < base.count()  # flood bucket dropped
    # surviving pairs are a subset of the unguarded set
    extra = capped.join(base, ["id_a", "id_b"], "left_anti")
    assert extra.count() == 0


def test_ertl_mle_batch_empty_batch():
    """Empty batches return an empty array (the listcomps this replaced
    did); callers like cardinalities()/union_cardinality_batch must not
    crash on zero-row inputs."""
    out = ertl_mle_batch(np.zeros((0, 64), dtype=np.int64), 14)
    assert out.shape == (0,)


def test_sketch_pages_id_mode_typo_raises_on_every_path(spark):
    bad = "desne"
    plain = spark.createDataFrame([("u", LONG_A)], "url string, text string")
    with_id = spark.createDataFrame(
        [("u", 1, LONG_A)], "url string, url_id long, text string"
    )
    for pages in (plain, with_id):  # passthrough must validate too
        with pytest.raises(ValueError, match="id_mode"):
            sketch_pages(pages, CFG, id_mode=bad)


def test_unpersisted_pipeline_matches_persisted(spark):
    """persist_sketches=False switches to recompute-safe hash ids; the
    url-level dup pair set must match the persisted dense-id run."""
    pages = pages_from_corpus(spark, 80, seed=3, partitions=3)
    a = {
        (r.url_a, r.url_b)
        for r in dedup_pipeline(pages, CFG).dup_pairs.collect()
    }
    b = {
        (r.url_a, r.url_b)
        for r in dedup_pipeline(pages, CFG, persist_sketches=False).dup_pairs.collect()
    }
    assert a == b


def test_cb_max_bucket_spares_neighbor_buckets(spark):
    """Dropping a flooded bucket must not drop its (non-flooded)
    neighbors: the cap filters the oversized bucket's DOCS, not every
    join key the explode touches."""
    cfg = DedupConfig(tau=0.9, shingle_k=16, smh_m=64, hll_p=14, criterion="cb")
    rows = [(i, 1000) for i in range(200)]  # flood bucket (card 1000)
    rows += [(1000 + i, 905) for i in range(3)]  # small adjacent bucket
    sk = spark.createDataFrame(rows, "url_id long, card_i long")
    capped = {
        (r.id_a, r.id_b)
        for r in cb_bucket_pairs(sk, cfg, max_bucket=50).collect()
    }
    # all three within-neighbor-bucket pairs survive; every pair
    # involving a flooded doc is gone
    expect = {(1000, 1001), (1000, 1002), (1001, 1002)}
    assert capped == expect


def test_hll_a_pipeline_salted_parity(spark):
    """End-to-end hll_a dup_pairs are unchanged by the flood guard."""
    cfg = DedupConfig(
        tau=0.9, shingle_k=16, smh_m=64, hll_p=14, criterion="hll_a", aux_p=8
    )
    pages = pages_from_corpus(spark, 150, seed=42, partitions=4)
    plain = {
        (r.url_a, r.url_b)
        for r in dedup_pipeline(pages, cfg).dup_pairs.collect()
    }
    salted = {
        (r.url_a, r.url_b)
        for r in dedup_pipeline(pages, cfg, salt_target=16).dup_pairs.collect()
    }
    assert plain == salted
    assert plain  # non-vacuous
