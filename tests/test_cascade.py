"""Tiered dedup cascade: planted-corpus semantics (tier order,
survivor pruning, keeper-chain resolution) + DuckDB parity at sf0.001
for both driver queries."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# planted corpus exercising every verdict path:
#  - 10/11: identical text -> 11 exact-removed, keeper 10
#  - 20/21: near-dup pair (jaccard >= 0.5) -> 21 ngram-removed, keeper 20
#  - 30:    unrelated            -> kept
#  - chain: 40/41 identical (41 exact-removed -> keeper 40); 40 is a
#    near-dup of 5 (5 < 40) -> 40 ngram-removed, keeper 5;
#    41's final_keeper must resolve to 5 through the chain hop
NEAR_A = "the quick brown fox jumps over the lazy dog again and again"
NEAR_B = "the quick brown fox jumps over the lazy dog again and agaim"
CHAIN_A = "pack my box with five dozen liquor jugs for the long winter trip"
CHAIN_B = "pack my box with five dozen liquor jugs for the long winter trio"
ROWS = [
    (5, CHAIN_A),
    (10, "identical body text shared by two documents exactly"),
    (11, "identical body text shared by two documents exactly"),
    (20, NEAR_A),
    (21, NEAR_B),
    (30, "completely unrelated content about spark physical plans"),
    (40, CHAIN_B),
    (41, CHAIN_B),
]


def _cascade(spark, **kw):
    from cuda_selection_criteria_spark.functions import dedup_cascade

    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in dedup_cascade(df, max_df=None, **kw).collect()
    }


def test_cascade_verdicts_planted(spark):
    got = _cascade(spark)
    assert len(got) == len(ROWS)  # exactly one verdict per input doc
    assert got[11] == {
        "doc_id": 11, "removed_by": "exact", "keeper_id": 10,
        "final_keeper_id": 10,
    }
    assert got[10]["removed_by"] == "none" and got[10]["keeper_id"] == 10
    assert got[21] == {
        "doc_id": 21, "removed_by": "ngram", "keeper_id": 20,
        "final_keeper_id": 20,
    }
    assert got[20]["removed_by"] == "none"
    assert got[30] == {
        "doc_id": 30, "removed_by": "none", "keeper_id": 30,
        "final_keeper_id": 30,
    }


def test_cascade_keeper_chain_resolves(spark):
    got = _cascade(spark)
    # 41 exact-removed to 40; 40 ngram-removed to 5 -> final keeper 5
    assert got[40]["removed_by"] == "ngram"
    assert got[40]["keeper_id"] == 5 and got[40]["final_keeper_id"] == 5
    assert got[41]["removed_by"] == "exact"
    assert got[41]["keeper_id"] == 40          # tier-local keeper
    assert got[41]["final_keeper_id"] == 5     # chain-resolved
    assert got[5]["removed_by"] == "none"


def test_cascade_survivor_pruning(spark):
    # survivor semantics: an exact-removed doc never reaches the ngram
    # tier, so ngram verdicts only ever name exact-tier keepers
    got = _cascade(spark)
    exact_removed = {d for d, r in got.items() if r["removed_by"] == "exact"}
    for r in got.values():
        if r["removed_by"] == "ngram":
            assert r["doc_id"] not in exact_removed
            assert r["keeper_id"] not in exact_removed


def test_cascade_summary_counts(spark):
    from cuda_selection_criteria_spark.functions import cascade_summary

    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {
        r["removed_by"]: (r["n_docs"], r["n_keepers"])
        for r in cascade_summary(df, max_df=None).collect()
    }
    # removed: 11, 41 (exact); 21, 40 (ngram); kept: 5, 10, 20, 30
    assert got["exact"] == (2, 2)   # final keepers 10 and 5
    assert got["ngram"] == (2, 2)   # final keepers 20 and 5
    assert got["none"] == (4, 4)


def test_cascade_hash_key_mode_matches(spark):
    # key="hash" (narrow-shuffle scale mode) must produce identical
    # verdicts on this corpus
    assert _cascade(spark, key="hash") == _cascade(spark, key="gram")


# ------------------------------------------------- DuckDB parity (sf0.001)

@pytest.mark.parametrize("name", ["dedup_cascade", "dedup_cascade_summary"])
def test_duckdb_parity_sf0001(spark, name):
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    sdf = entry.queries()[name](spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    odf = con.execute(entry.oracle_sql()[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    b = odf[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    for c in cols:
        av, bv = a[c].tolist(), b[c].tolist()
        assert av == bv, f"{name}.{c} mismatch"


def test_cascade_null_text_gets_verdicts(spark):
    """NULL-text docs must not vanish: hash(NULL) is NULL, and a
    non-null-safe exact-tier join would drop them. They form ONE
    exact group (the oracle's PARTITION BY text groups NULLs) and
    never reach the ngram tier (no shingles)."""
    from cuda_selection_criteria_spark.functions import dedup_cascade

    df = spark.createDataFrame(
        [(1, "real text body here"), (2, None), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in dedup_cascade(df, max_df=None).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["removed_by"] == "none"
    assert got[2]["removed_by"] == "none" and got[2]["keeper_id"] == 2
    assert got[3]["removed_by"] == "exact" and got[3]["final_keeper_id"] == 2


# ------------------------------------------------- smh tier-2 variant

def test_cascade_smh_tier_planted(spark):
    """tier2='smh' routes exact-tier survivors through the
    reference-parity sketch pipeline; verdicts keep the cascade
    contract with removed_by='smh'."""
    from cuda_selection_criteria_spark.functions import dedup_cascade
    from cuda_selection_criteria_spark.oracle import DedupConfig

    base = (
        "the quick brown fox jumps over the lazy dog while seventy "
        "wizards briskly mix quartz goblets of java and the pipeline "
        "keeps sketching shingles into superminhash signatures during "
        "the long afternoon of benchmark runs across the web corpus "
        "partition by partition without ever touching a python loop "
        "in the hot path of the verification stage"
    )
    near = base[:200] + "X" + base[201:]  # one midpoint char differs
    rows = [
        (5, base),
        (10, "identical body shared by exactly two documents " * 6),
        (11, "identical body shared by exactly two documents " * 6),
        (21, near),
        (30, "completely unrelated content about spark physical plans " * 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = DedupConfig(tau=0.8, shingle_k=16, smh_m=64, hll_p=14)
    got = {
        r["doc_id"]: r.asDict()
        for r in dedup_cascade(df, tier2="smh", smh_config=cfg).collect()
    }
    assert set(got) == {5, 10, 11, 21, 30}
    assert got[11]["removed_by"] == "exact" and got[11]["keeper_id"] == 10
    assert got[21]["removed_by"] == "smh" and got[21]["keeper_id"] == 5
    assert got[5]["removed_by"] == "none"
    assert got[30]["removed_by"] == "none"


def test_cascade_invariant_gate_empty_and_bites(spark):
    from cuda_selection_criteria_spark.functions import dedup_cascade
    from cuda_selection_criteria_spark.functions.gates import (
        cascade_invariant_gate,
    )

    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    verdicts = dedup_cascade(df, max_df=None)
    assert cascade_invariant_gate(df, verdicts).count() == 0

    # the gate must BITE: drop one verdict row -> missing_verdict;
    # corrupt a keeper -> exact_tier_mismatch
    import pyspark.sql.functions as F

    broken = verdicts.where(F.col("doc_id") != 11)
    kinds = {
        r["kind"] for r in cascade_invariant_gate(df, broken).collect()
    }
    assert "missing_verdict" in kinds and "exact_tier_mismatch" in kinds


def test_cascade_tier2_validation(spark):
    from cuda_selection_criteria_spark.functions import dedup_cascade

    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    with pytest.raises(ValueError, match="tier2"):
        dedup_cascade(df, tier2="simhash")
