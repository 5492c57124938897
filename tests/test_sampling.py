"""Deterministic md5-keyed sampling (functions/sampling.py): the
selection must be a pure function of (seed, doc_id) — identical under
repartitioning and re-runs — and must match an independent hashlib
replay of the same rule, which is what makes the ANSI-SQL oracle
(driver queries sample_bernoulli / sample_stratified) exact rather
than statistical."""

from __future__ import annotations

import hashlib

import pytest

from cuda_selection_criteria_spark.functions import (
    hash_bernoulli_sample,
    rate_threshold,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


def _md5(seed: str, doc_id: int) -> str:
    return hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()


# ------------------------------------------------------- rate_threshold

def test_rate_threshold_bounds():
    assert rate_threshold(0.0) == "00000000"
    assert rate_threshold(1.0) == "g"  # sorts after every hex digit
    assert rate_threshold(0.5) == "80000000"
    with pytest.raises(ValueError):
        rate_threshold(-0.1)
    with pytest.raises(ValueError):
        rate_threshold(1.5)


def test_rate_zero_and_one(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    assert hash_bernoulli_sample(docs, 0.0, seed="7").count() == 0
    assert hash_bernoulli_sample(docs, 1.0, seed="7").count() == n


# ------------------------------------------------------------ bernoulli

def test_bernoulli_matches_hashlib_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rate, seed = 0.2, "42"
    got = {
        r["doc_id"]
        for r in hash_bernoulli_sample(docs, rate, seed=seed)
        .select("doc_id")
        .collect()
    }
    thr = rate_threshold(rate)
    want = {
        r["doc_id"]
        for r in docs.select("doc_id").collect()
        if _md5(seed, r["doc_id"]) < thr
    }
    assert got == want
    assert 0 < len(got) < docs.count()


def test_bernoulli_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {
        r["doc_id"]
        for r in hash_bernoulli_sample(docs, 0.3, seed="s").select("doc_id").collect()
    }
    b = {
        r["doc_id"]
        for r in hash_bernoulli_sample(docs.repartition(7), 0.3, seed="s")
        .select("doc_id")
        .collect()
    }
    assert a == b


def test_bernoulli_seed_changes_subset(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["doc_id"] for r in hash_bernoulli_sample(docs, 0.3, seed="s1").collect()}
    b = {r["doc_id"] for r in hash_bernoulli_sample(docs, 0.3, seed="s2").collect()}
    assert a != b  # 2^-160-ish to collide on this corpus


# ----------------------------------------------------------- stratified

def test_stratified_quota_and_order(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_per = 3
    out = stratified_sample(docs, "lang", n_per, seed="42").collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    all_rows = docs.select("doc_id", "lang").collect()
    strata: dict[str, list[int]] = {}
    for r in all_rows:
        strata.setdefault(r["lang"], []).append(r["doc_id"])
    assert set(by_lang) == set(strata)
    for lang, rows in by_lang.items():
        # quota: min(n_per, stratum size); ranks exactly 1..n
        assert len(rows) == min(n_per, len(strata[lang]))
        assert sorted(r["rk"] for r in rows) == list(range(1, len(rows) + 1))
        # selection = first n in (md5, doc_id) order — hashlib replay
        want = sorted(strata[lang], key=lambda d: (_md5("42", d), d))[: len(rows)]
        got = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rk"])]
        assert got == want


def test_stratified_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    key = lambda rows: sorted((r["doc_id"], r["lang"], r["rk"]) for r in rows)
    a = key(stratified_sample(docs, "lang", 5, seed="q").collect())
    b = key(stratified_sample(docs.repartition(9), "lang", 5, seed="q").collect())
    assert a == b


# ----------------------------------------------- driver-query oracles

def test_driver_sampling_queries_match_duckdb(spark):
    import duckdb

    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    for name in ("sample_bernoulli", "sample_stratified"):
        got = sorted(tuple(r) for r in qs[name](spark, SF).collect())
        want = sorted(tuple(r) for r in con.execute(oracles[name]).fetchall())
        assert got == want, name
        assert len(got) > 0, name


def test_rate_threshold_refuses_subgranular_rate():
    # a positive rate that floors to zero buckets must raise, not
    # silently select nothing
    with pytest.raises(ValueError, match="granularity"):
        rate_threshold(1e-10)
    # but widening digits makes the same rate expressible
    assert rate_threshold(1e-9, digits=10) != "0" * 10
