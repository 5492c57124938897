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


def test_cli_textops_spans_and_simhash(spark, tmp_path):
    """textops subcommand: run two families end-to-end via the CLI main."""
    from cuda_selection_criteria_spark import cli

    out1 = str(tmp_path / "spans")
    cli.main([
        "textops", "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out1, "--op", "spans",
    ])
    assert spark.read.parquet(out1).count() > 0

    out2 = str(tmp_path / "simhash")
    cli.main([
        "textops", "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out2, "--op", "simhash",
    ])
    assert {f.name for f in spark.read.parquet(out2).schema.fields} == {
        "doc_a", "doc_b", "hamming"
    }


def test_cli_dedup_criterion_flag(spark, tmp_path):
    """-c mirrors the reference selection binary's criterion flag: the
    hll_a cascade runs end-to-end from the CLI, and a warehouse sketched
    under smh_a refuses an aux-criterion resume with guidance."""
    import pytest

    from cuda_selection_criteria_spark import cli

    corpus = str(tmp_path / "pages")
    cli.main(["gen-corpus", "--rows", "300", "--output", corpus])
    wh = str(tmp_path / "wh_hll")
    cli.main(["dedup", "--input", corpus, "--warehouse", wh, "-c", "hll_a"])
    assert spark.read.parquet(f"{wh}/dup_pairs").count() > 0

    wh2 = str(tmp_path / "wh_smh")
    cli.main(["sketch", "--input", corpus, "--warehouse", wh2])
    assert "hll_aux" not in spark.read.parquet(f"{wh2}/sketches").columns
    # the warehouse records the sketch config (sketch_meta) and refuses
    # a config-mismatched resume — a "re-run sketch" under the new
    # criterion would be a silent no-op (lineage is criterion-blind)
    with pytest.raises(ValueError, match="identical.*config|sketch.*config"):
        cli.main(
            ["dedup", "--input", corpus, "--warehouse", wh2, "-c", "hll_a", "--resume"]
        )


def test_cli_textops_simpairs(spark, tmp_path):
    from cuda_selection_criteria_spark import cli

    out = str(tmp_path / "simpairs")
    cli.main([
        "textops", "--input", "/root/testdata/sf0.001/embeddings.parquet",
        "--output", out, "--op", "simpairs", "--min-sim", "0.4",
    ])
    df = spark.read.parquet(out)
    assert {f.name for f in df.schema.fields} == {"id_a", "id_b", "sim"}
    assert df.count() > 0
