"""Round-3 gates and flood guards: bounded winnow gate, LSH bucket cap,
simhash/LSH recall gates, streaming-vs-batch CC diff, duplicated_spans
hash-key parity, embedding_knn exact-contract."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ winnow gate bounding

def test_winnow_gate_empty_on_boilerplate_flood(spark):
    """A boilerplate substring shared by f > max_df docs must neither
    blow up the gate (the old fp self-join was O(f^2)) nor create false
    violations: over-max_df grams are excluded from `sharing` by
    definition, and the fingerprint check is pair-anchored."""
    boiler = "this exact boilerplate footer appears on every single page of the site " * 2
    rows = [(i, f"unique lead {i} {np.random.default_rng(i).integers(1e9)} " + boiler) for i in range(150)]
    # plus one genuinely-sharing rare pair
    rare = "a rare shared sentence that only these two documents contain anywhere"
    rows += [(1000, "lead a " + rare + " tail a"), (1001, "lead b " + rare + " tail b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from cuda_selection_criteria_spark.functions.gates import winnow_guarantee_gate

    assert winnow_guarantee_gate(docs, k=16, w=8, max_df=100).count() == 0


def test_winnow_gate_sensitive_to_broken_fingerprints(spark, monkeypatch):
    """If fingerprint selection lost its guarantee, the gate must fire:
    simulate by replacing winnow_fingerprints with an empty relation."""
    import cuda_selection_criteria_spark.functions.winnow as winnow_mod
    from cuda_selection_criteria_spark.functions import gates

    rare = "a rare shared sentence that only these two documents contain anywhere"
    docs = spark.createDataFrame(
        [(1, "lead a " + rare + " tail a"), (2, "lead b " + rare + " tail b")],
        "doc_id long, text string",
    )

    real = winnow_mod.winnow_fingerprints

    def broken(documents, k=16, w=8, id_col="doc_id"):
        return real(documents, k, w, id_col).where(F.lit(False))

    monkeypatch.setattr(winnow_mod, "winnow_fingerprints", broken)
    viol = gates.winnow_guarantee_gate(docs, k=16, w=8).collect()
    assert {(v.doc_a, v.doc_b) for v in viol} == {(1, 2)}


# ------------------------------------------------ LSH bucket flood cap

def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_lsh_flood_bucket_emits_linear_star_pairs(spark):
    from cuda_selection_criteria_spark.functions.similarity import (
        embedding_lsh_candidates,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal(64)
    f = 300
    vecs = [base] * f + [rng.standard_normal(64) for _ in range(20)]
    emb = _emb_df(spark, vecs)
    pairs = embedding_lsh_candidates(emb, max_bucket=50).collect()
    clique = [(r.id_a, r.id_b) for r in pairs if r.id_a < f and r.id_b < f]
    # star mode: every clique member links to the bucket minimum (0) —
    # O(f) rows, not f(f-1)/2
    assert len(clique) == f - 1
    assert all(a == 0 for a, _ in clique)


def test_lsh_cap_rows_unchanged_on_normal_corpus(spark):
    from cuda_selection_criteria_spark.functions.similarity import (
        embedding_lsh_candidates,
    )

    rng = np.random.default_rng(5)
    # clustered but small groups — all buckets far below the cap
    vecs = []
    for c in range(30):
        center = rng.standard_normal(64)
        for _ in range(4):
            vecs.append(center + 0.01 * rng.standard_normal(64))
    emb = _emb_df(spark, vecs)
    capped = {(r.id_a, r.id_b) for r in embedding_lsh_candidates(emb).collect()}
    uncapped = {
        (r.id_a, r.id_b)
        for r in embedding_lsh_candidates(emb, max_bucket=None).collect()
    }
    assert capped == uncapped and capped


# ------------------------------------------------ recall gates

def test_simhash_recall_gate_empty_and_pairs_present(spark):
    from cuda_selection_criteria_spark.functions.gates import simhash_recall_gate
    from cuda_selection_criteria_spark.functions.simhash import simhash_pairs

    body = "alpha beta gamma delta epsilon zeta eta theta " * 4
    docs = spark.createDataFrame(
        [
            (1, body),
            (2, body),  # byte-identical
            (3, body.replace(" ", "  ")),  # same token multiset, extra spaces
            (4, "completely different words entirely unrelated content here"),
        ],
        "doc_id long, text string",
    )
    assert simhash_recall_gate(docs).count() == 0
    got = {(r.doc_a, r.doc_b) for r in simhash_pairs(docs).collect()}
    assert {(1, 2), (1, 3), (2, 3)} <= got


def test_simhash_recall_gate_fires_on_dropped_pair(spark, monkeypatch):
    import cuda_selection_criteria_spark.functions.simhash as sim_mod
    from cuda_selection_criteria_spark.functions import gates

    body = "alpha beta gamma delta epsilon zeta eta theta " * 4
    docs = spark.createDataFrame(
        [(1, body), (2, body)], "doc_id long, text string"
    )
    real = sim_mod.simhash_pairs

    def lossy(documents, max_hamming=3, id_col="doc_id"):
        return real(documents, max_hamming, id_col).where(F.lit(False))

    monkeypatch.setattr(sim_mod, "simhash_pairs", lossy)
    viol = gates.simhash_recall_gate(docs).collect()
    assert {(v.doc_a, v.doc_b) for v in viol} == {(1, 2)}


def test_lsh_recall_gate_empty_with_identical_vectors(spark):
    from cuda_selection_criteria_spark.functions.gates import lsh_recall_gate

    rng = np.random.default_rng(9)
    base = rng.standard_normal(64)
    vecs = [base, base, base] + [rng.standard_normal(64) for _ in range(10)]
    vecs.append(np.zeros(64))  # zero vector: excluded from the invariant
    emb = _emb_df(spark, vecs)
    assert lsh_recall_gate(emb).count() == 0


def test_lsh_recall_gate_survives_flood_star_mode(spark):
    """With the bucket cap forcing star pairing, identical vectors are
    still same-component — the CC-based invariant must hold."""
    from cuda_selection_criteria_spark.functions.gates import lsh_recall_gate

    rng = np.random.default_rng(11)
    base = rng.standard_normal(64)
    vecs = [base] * 120 + [rng.standard_normal(64) for _ in range(10)]
    emb = _emb_df(spark, vecs)
    assert lsh_recall_gate(emb, max_bucket=30).count() == 0


# ------------------------------------------------ streaming-vs-batch CC

def test_cc_diff_gate_empty_on_equal_partitions(spark):
    from cuda_selection_criteria_spark.functions.gates import cc_diff_gate

    # same partition {1,2,3} + {7,8}, different spanning edges
    p_a = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    p_b = spark.createDataFrame([(1, 3), (1, 2), (7, 8)], "id_a long, id_b long")
    assert cc_diff_gate(p_a, p_b).count() == 0


def test_cc_diff_gate_fires_on_split_component(spark):
    from cuda_selection_criteria_spark.functions.gates import cc_diff_gate

    p_a = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    p_b = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    viol = cc_diff_gate(p_a, p_b).collect()
    assert any(v.node == 3 for v in viol)


def test_streaming_batch_cc_gate_driver_query(spark):
    import __spark_entry__ as entry

    assert entry.queries()["streaming_batch_cc_gate"](spark, SF).count() == 0


# ------------------------------------------------ duplicated_spans keys

def test_duplicated_spans_hash_key_equals_gram_key(spark):
    from cuda_selection_criteria_spark.functions.substr import duplicated_spans

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    by_gram = {
        (r.doc_id, r.span_start, r.span_len)
        for r in duplicated_spans(docs, key="gram").collect()
    }
    by_hash = {
        (r.doc_id, r.span_start, r.span_len)
        for r in duplicated_spans(docs).collect()  # default key="hash"
    }
    assert by_gram == by_hash and by_gram


# ------------------------------------------------ knn exact contract

def test_embedding_knn_refuses_oversize_by_default(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    from cuda_selection_criteria_spark.functions.similarity import embedding_knn

    with pytest.raises(ValueError, match="exact brute-force"):
        embedding_knn(emb, max_broadcast_rows=10).count()
    # opt-in fallback routes to IVF instead
    n = embedding_knn(emb, max_broadcast_rows=10, approx_fallback=True).count()
    assert n > 0


# ------------------------------------------------ media guard

def test_media_from_documents_coverage_and_ascii_mode(spark):
    from cuda_selection_criteria_spark.functions.multimodal import (
        media_feature_sums,
        media_from_documents,
    )

    docs = spark.createDataFrame(
        [(1, "plain ascii text"), (2, ""), (3, "café au lait"), (4, "ok")],
        "doc_id long, text string",
    )
    # production contract: EVERY document becomes a media row (non-ASCII
    # and empty payloads included) and the decoder handles them
    ids = {r.media_id for r in media_from_documents(docs).collect()}
    assert ids == {1, 2, 3, 4}
    feats = media_feature_sums(media_from_documents(docs))
    assert {r.media_id for r in feats.collect()} == {1, 2, 3, 4}
    # oracle-gated driver query opts into the ASCII subset (DuckDB's
    # ord/substr is char-indexed; the decoder is byte-indexed)
    ascii_ids = {
        r.media_id for r in media_from_documents(docs, ascii_only=True).collect()
    }
    assert ascii_ids == {1, 4}


# ------------------------------------------------ winnow precision

def test_winnow_precision_gate_empty_and_sensitive(spark, monkeypatch):
    from cuda_selection_criteria_spark.functions import gates

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert gates.winnow_precision_gate(docs, k=16, w=8, min_shared=3).count() == 0

    # inject a bogus pair (two unrelated docs) -> gate must flag it
    import cuda_selection_criteria_spark.functions.winnow as winnow_mod

    two = [r.doc_id for r in docs.select("doc_id").limit(2).collect()]
    bogus = spark.createDataFrame(
        [(min(two), max(two), 3)], "doc_a long, doc_b long, shared_fps long"
    )
    real = winnow_mod.winnow_overlap_pairs

    def lying(documents, k=16, w=8, min_shared=3, max_df=100):
        return real(documents, k, w, min_shared, max_df).union(bogus)

    monkeypatch.setattr(winnow_mod, "winnow_overlap_pairs", lying)
    viol = gates.winnow_precision_gate(docs, k=16, w=8, min_shared=3).collect()
    assert {(v.doc_a, v.doc_b) for v in viol} == {(min(two), max(two))}


# ------------------------------------------------ simhash precision

def test_simhash_precision_gate_empty_and_sensitive(spark, monkeypatch):
    from cuda_selection_criteria_spark.functions import gates

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert gates.simhash_precision_gate(docs, max_hamming=3).count() == 0

    # inject a bogus pair of token-DISJOINT docs -> gate must flag it
    import cuda_selection_criteria_spark.functions.simhash as simhash_mod

    tiny = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    bogus = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    real = simhash_mod.simhash_pairs

    def lying(documents, max_hamming=3, id_col="doc_id"):
        return real(documents, max_hamming, id_col).select("doc_a", "doc_b").union(bogus)

    monkeypatch.setattr(simhash_mod, "simhash_pairs", lying)
    viol = gates.simhash_precision_gate(tiny, max_hamming=3).collect()
    assert {(v.doc_a, v.doc_b) for v in viol} == {(1, 2)}


# ------------------------------------------------ hashed identity keys

def test_identity_star_pairs_matches_payload_grouping(spark):
    """The (xxhash64, md5) identity-group key must reproduce the
    payload-grouped star pairs exactly — for strings AND array keys."""
    from cuda_selection_criteria_spark.functions.gates import _identity_star_pairs

    d = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa"), (4, "aa"), (5, "cc"), (6, "bb")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in _identity_star_pairs(
            d, F.xxhash64("text"), F.md5("text"), "doc_id", "doc_a", "doc_b"
        ).collect()
    }
    grp = d.groupBy("text").agg(
        F.min("doc_id").alias("canon"), F.collect_list("doc_id").alias("members")
    )
    want = {
        (min(r.canon, m), max(r.canon, m))
        for r in grp.collect()
        for m in r.members
        if m != r.canon
    }
    assert got == want == {(1, 3), (1, 4), (2, 6)}

    e = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0]), (3, [2.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got_e = {
        (r.vec_a, r.vec_b)
        for r in _identity_star_pairs(
            e,
            F.xxhash64("embedding"),
            F.md5(F.to_json("embedding")),
            "vec_id",
            "vec_a",
            "vec_b",
        ).collect()
    }
    assert got_e == {(1, 2)}


# ------------------------------------------------ embedding near-dup pairs

def test_embedding_sim_pairs_exact_lsh_and_gate(spark):
    """Exact path matches a numpy brute force; LSH path is a subset and
    finds the planted near-identical pair; subset gate is empty."""
    from cuda_selection_criteria_spark.functions.gates import embedding_sim_subset_gate
    from cuda_selection_criteria_spark.functions.similarity import embedding_sim_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal(64)
    rows = [(0, [float(x) for x in base]),
            (1, [float(x) for x in base + 0.01 * rng.standard_normal(64)])]
    for i in range(2, 40):
        rows.append((i, [float(x) for x in rng.standard_normal(64)]))
    rows.append((40, [0.0] * 64))  # zero vector: excluded from both paths
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {(r.id_a, r.id_b): r.sim
           for r in embedding_sim_pairs(emb, min_sim=0.9).collect()}
    assert (0, 1) in got and got[(0, 1)] >= 0.99
    # brute force over the float32-stored values (what the engine reads)
    V = {i: np.asarray(v, dtype=np.float32).astype(np.float64) for i, v in rows}
    want = {}
    for a in range(41):
        for b in range(a + 1, 41):
            na, nb = np.linalg.norm(V[a]), np.linalg.norm(V[b])
            if na == 0 or nb == 0:
                continue
            s = float(np.round(V[a] @ V[b] / (na * nb), 4))
            if s >= 0.9:
                want[(a, b)] = s
    assert got == want

    lsh = {(r.id_a, r.id_b): r.sim
           for r in embedding_sim_pairs(emb, min_sim=0.9, method="lsh").collect()}
    assert set(lsh) <= set(got) and (0, 1) in lsh
    assert embedding_sim_subset_gate(emb, min_sim=0.9).count() == 0


# ------------------------------------------------ cosine top-k

def test_embedding_knn_topk_matches_bruteforce(spark):
    from cuda_selection_criteria_spark.functions.similarity import embedding_knn

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.vec_id, r.rank): (r.neighbor_id, r.sim)
        for r in embedding_knn(emb, k=4).collect()
    }
    V = {i: np.asarray(v, dtype=np.float32).astype(np.float64) for i, v in rows}
    for q in range(30):
        sims = []
        for m in range(30):
            if m == q:
                continue
            s = float(np.round(V[q] @ V[m] / (np.linalg.norm(V[q]) * np.linalg.norm(V[m])), 4))
            sims.append((-s, m))
        sims.sort()
        for r, (negs, m) in enumerate(sims[:4], start=1):
            assert got[(q, r)] == (m, -negs), (q, r)
