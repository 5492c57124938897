"""Warehouse lineage + resume semantics (FIXTURES.md F5 gate 5)."""

from __future__ import annotations

from cuda_selection_criteria_spark.oracle import DedupConfig
from cuda_selection_criteria_spark.pipeline import pages_from_corpus
from cuda_selection_criteria_spark.warehouse import Warehouse, sketch_with_resume

CFG = DedupConfig()


def test_sketch_resume_skips_completed_parts(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    pages = pages_from_corpus(spark, 120, seed=42)

    sk1 = sketch_with_resume(wh, pages, CFG, n_parts=8, run_id="r1")
    assert sk1.count() == 120
    assert wh.completed_parts("sketch") == set(range(8))

    # second run: nothing to do, identical output
    before = {(r.url, r.card_i) for r in wh.read("sketches").collect()}
    sk2 = sketch_with_resume(wh, pages, CFG, n_parts=8, run_id="r2")
    after = {(r.url, r.card_i) for r in sk2.collect()}
    assert before == after
    # lineage only recorded the first run's parts
    lineage = wh.read("lineage").collect()
    assert {r.run_id for r in lineage} == {"r1"}


def test_crash_between_write_and_mark_leaves_no_duplicates(spark, tmp_path):
    """Crash window: sketches written but lineage NOT recorded. The
    resumed run must REPLACE those partitions (dynamic partition
    overwrite), not append duplicate sketch rows."""
    wh = Warehouse(spark, str(tmp_path / "whc"))
    pages = pages_from_corpus(spark, 120, seed=42)
    sketch_with_resume(wh, pages, CFG, n_parts=8, run_id="r1")
    # simulate the crash: data present, lineage wiped
    import shutil

    shutil.rmtree(wh.path("lineage"))
    assert wh.completed_parts("sketch") == set()
    sk = sketch_with_resume(wh, pages, CFG, n_parts=8, run_id="r2")
    assert sk.count() == 120  # not 240
    dupes = sk.groupBy("url_id").count().where("count > 1").count()
    assert dupes == 0


def test_partial_resume(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh2"))
    pages = pages_from_corpus(spark, 120, seed=42)
    # simulate a killed run: only parts 0-3 done
    full = sketch_with_resume(wh, pages, CFG, n_parts=8, run_id="r1")
    n_full = full.count()
    import shutil, os

    # wipe warehouse, re-run marking half done artificially. A real
    # killed run leaves sketch_meta behind (written before any part
    # completes), so the simulation writes it too — completed parts
    # WITHOUT meta are now refused outright (ADVICE r4 guard,
    # test_round5.test_warehouse_refuses_metaless_resume)
    from cuda_selection_criteria_spark.warehouse import SKETCH_META_SCHEMA

    wh2 = Warehouse(spark, str(tmp_path / "wh3"))
    meta = (
        CFG.criterion, int(CFG.shingle_k), int(CFG.smh_m), int(CFG.hll_p),
        int(CFG.aux_p), CFG.register_encoding, 8,
    )
    wh2.write("sketch_meta", spark.createDataFrame([meta], SKETCH_META_SCHEMA))
    wh2.mark_parts("dead", "sketch", [0, 1, 2, 3])
    sk = sketch_with_resume(wh2, pages, CFG, n_parts=8, run_id="r2")
    # only parts 4-7 materialized (0-3 claimed done by the dead run)
    parts = {r.part_id for r in sk.select("part_id").distinct().collect()}
    assert parts == {4, 5, 6, 7}
    assert sk.count() < n_full
    # metrics recorded
    assert wh2.read("metrics").count() == 1
