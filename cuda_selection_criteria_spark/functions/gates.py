"""Derived SQL-checkable gates for the sketch-dedup flagship.

The SMH/HLL decisions themselves are not ANSI-SQL-expressible (DuckDB
cannot reproduce WangHash / Ertl-MLE / SuperMinHash), but two hard
invariants of the emitted output ARE exactly checkable:

1. **Precision band** — every emitted dup pair has exact k-shingle
   Jaccard >= tau - eps. The HLL p=14 union estimator has ~0.8%
   relative error per cardinality (Ertl, arXiv:1702.01284), so an
   emitted pair (estimated J >= tau) can sit only a few percent below
   tau in exact J; eps bounds that band with wide margin.
2. **Exact-duplicate recall** — byte-identical documents have identical
   shingle sets, hence identical SuperMinHash signatures (every band
   collides) and identical HLL registers (estimated J == 1), so every
   exact-duplicate pair MUST be emitted in parity ("all") pairing mode.

``dup_pairs_jaccard_gate`` emits the VIOLATIONS of both invariants —
the expected result is the empty relation, which is the DuckDB oracle
(the golden-gate discipline of the reference's results.txt, inverted:
rather than pinning the pair list, we pin "zero provable mistakes").

This mirrors /root/reference/run_comparison_experiment.sh:36-53, which
gates the CUDA path against the CPU oracle pair-by-pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Column

from ..oracle import DedupConfig
from .ngram import doc_shingles


def _identity_star_pairs(
    d: DataFrame, hash_key: Column, fp_key: Column, id_col: str, a_name: str, b_name: str
) -> DataFrame:
    """Canonical (min id) x member pairs of rows whose identity key is
    EQUAL, grouped on a (xxhash64, md5) 24-byte compound key so the
    payload itself (full text / token array / embedding vector) never
    rides the identity-group shuffle — the exact_dup_groups key
    discipline (textstats.py). A false merge needs a simultaneous
    64-bit AND 128-bit collision (< 2^-190 per pair), and in a gate it
    could only surface as an extra violation row to investigate, never
    as a silent pass."""
    grp = d.groupBy(hash_key.alias("_h"), fp_key.alias("_fp")).agg(
        F.min(id_col).alias("canon"), F.collect_list(id_col).alias("members")
    )
    return (
        grp.select("canon", F.explode("members").alias("other"))
        .where(F.col("canon") != F.col("other"))
        .select(
            F.least("canon", "other").alias(a_name),
            F.greatest("canon", "other").alias(b_name),
        )
    )


def exact_jaccard_for_pairs(
    pairs: DataFrame, documents: DataFrame, k: int
) -> DataFrame:
    """Annotate (url_a, url_b) pairs with their exact k-shingle Jaccard.

    Cheap at any scale: documents are semi-joined down to the pair
    participants before the shingle explode, so cost is O(|pairs| *
    doc_len), never O(corpus).
    """
    need = (
        pairs.select(F.col("url_a").alias("u"))
        .union(pairs.select(F.col("url_b").alias("u")))
        .distinct()
    )
    docs = (
        documents.withColumn("u", F.col("doc_id").cast("string"))
        .join(need, "u")
        .select(F.col("u").alias("doc_id"), "text")
    )
    sh = doc_shingles(docs, k)
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("url_a"), "s"), "url_a")
        .join(sh.select(F.col("doc_id").alias("url_b"), F.col("s").alias("s2")), "url_b")
        .where(F.col("s") == F.col("s2"))
        .groupBy("url_a", "url_b")
        .agg(F.count("*").alias("inter_n"))
    )
    return (
        pairs.join(inter, ["url_a", "url_b"], "left")
        .join(cnt.select(F.col("doc_id").alias("url_a"), F.col("n").alias("na")), "url_a")
        .join(cnt.select(F.col("doc_id").alias("url_b"), F.col("n").alias("nb")), "url_b")
        .withColumn("inter_n", F.coalesce(F.col("inter_n"), F.lit(0)))
        .withColumn(
            "exact_jaccard",
            F.col("inter_n").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter_n")).cast("double"),
        )
    )


def dup_pairs_jaccard_gate(
    documents: DataFrame,
    dup_pairs: DataFrame,
    cfg: DedupConfig,
    precision_eps: float | None = None,
    precision_z: float = 10.0,
) -> DataFrame:
    """(url_a, url_b, kind, exact_jaccard_x1e6): invariant VIOLATIONS.

    kind='precision': emitted pair with exact Jaccard < tau - eps.
    kind='recall': byte-identical document pair missing from dup_pairs.
    Expected: empty. Jaccard is emitted as x1e6 fixed-point so the
    (empty) relation hashes identically across engines.

    ``precision_eps`` is a statistical CONFIDENCE BOUND, not a hard
    invariant: the HLL estimator's relative error is ~1.04/sqrt(2^p)
    per cardinality (Ertl MLE does slightly better), so by default eps
    is derived from the CONFIGURED precision as ``precision_z`` sigma
    (z=10 -> eps=0.081 at p=14; measured corpus minimum 0.907 vs
    tau-eps=0.819 — 11x headroom). On very large corpora more emitted
    pairs sample the estimator tails; widen ``precision_z`` (or lower
    tau's share of the band) rather than treating a tail event as a
    pipeline bug. Exact-duplicate recall (kind='recall') IS a hard
    invariant at any scale.
    """
    if precision_eps is None:
        precision_eps = precision_z * 1.04 / float((1 << cfg.hll_p) ** 0.5)
    exact = exact_jaccard_for_pairs(
        dup_pairs.select("url_a", "url_b"), documents, cfg.shingle_k
    )
    precision_viol = exact.where(
        F.col("exact_jaccard") < F.lit(cfg.tau - precision_eps)
    ).select(
        "url_a",
        "url_b",
        F.lit("precision").alias("kind"),
        F.floor(F.col("exact_jaccard") * 1e6).cast("long").alias("exact_jaccard_x1e6"),
    )

    # exact-duplicate pairs: canonical (min doc_id) x every other member
    # of each identical-text group — must all be present in dup_pairs.
    d = documents.select(F.col("doc_id").cast("string").alias("u"), "text").where(
        F.length("text") >= cfg.shingle_k
    )
    ident = _identity_star_pairs(
        d, F.xxhash64("text"), F.md5("text"), "u", "url_a", "url_b"
    )
    recall_viol = ident.join(
        dup_pairs.select("url_a", "url_b"), ["url_a", "url_b"], "left_anti"
    ).select(
        "url_a",
        "url_b",
        F.lit("recall").alias("kind"),
        F.lit(1000000).cast("long").alias("exact_jaccard_x1e6"),
    )
    return precision_viol.union(recall_viol)


def winnow_guarantee_gate(
    documents: DataFrame, k: int = 16, w: int = 8, max_df: int = 100
) -> DataFrame:
    """(doc_a, doc_b): violations of the winnowing guarantee — expected
    empty (the DuckDB oracle is the empty relation).

    Schleimer/Wilkerson/Aiken (SIGMOD'03) Thm: two documents sharing a
    substring of length >= w + k - 1 share at least one selected
    fingerprint. The gate computes substring-sharing pairs exactly
    (distinct (w+k-1)-gram explode + equi-join, document-frequency
    capped like every candidate join here), then checks each pair for
    a shared fingerprint via a pair-anchored join (no fp self-join —
    see below); any surviving row is a provable bug in the fingerprint
    selection.
    """
    from .ngram import doc_shingles

    L = w + k - 1
    grams = doc_shingles(documents, L)
    rare = (
        grams.groupBy("s")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") <= max_df)
        .select("s")
    )
    grams = grams.join(rare, "s")
    a = grams.select(F.col("doc_id").alias("doc_a"), "s")
    b = grams.select(F.col("doc_id").alias("doc_b"), "s")
    sharing = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Bounded check: the guarantee must be verified WITHOUT the max_df
    # cap on fingerprints (the cap would create false violations), but
    # an uncapped fp self-join reintroduces the f^2 boilerplate blowup.
    # Instead fingerprints are computed only for the pair PARTICIPANTS
    # (semi-join, like exact_jaccard_for_pairs) and joined TO THE PAIRS
    # on (doc, fp) — cost O(|sharing| * fps_per_doc), never O(f^2).
    from .winnow import winnow_fingerprints

    participants = (
        sharing.select(F.col("doc_a").alias("doc_id"))
        .union(sharing.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    fps = winnow_fingerprints(
        documents.join(participants, "doc_id", "left_semi"), k=k, w=w
    )
    fp_sharing = (
        sharing.join(fps.select(F.col("doc_id").alias("doc_a"), "fp"), "doc_a")
        .join(fps.select(F.col("doc_id").alias("doc_b"), "fp"), ["doc_b", "fp"])
        .select("doc_a", "doc_b")
        .distinct()
    )
    return sharing.join(fp_sharing, ["doc_a", "doc_b"], "left_anti")


def winnow_precision_gate(
    documents: DataFrame,
    k: int = 16,
    w: int = 8,
    min_shared: int = 3,
    max_df: int | None = 100,
) -> DataFrame:
    """(doc_a, doc_b): winnowing PRECISION violations — expected empty.

    Complements winnow_guarantee_gate (recall): every pair emitted by
    ``winnow_overlap_pairs`` shares >= min_shared fingerprint VALUES,
    and a fingerprint is a hash of a concrete k-gram — so the two
    documents must share at least one identical k-gram substring
    (up to a 2^-64 hash collision, which this gate would correctly
    surface). Checked pair-anchored: k-grams are computed only for pair
    participants and joined to the pairs on (doc, gram) — O(|pairs| *
    doc_len), never a gram self-join.
    """
    from .ngram import doc_shingles
    from .winnow import winnow_overlap_pairs

    pairs = winnow_overlap_pairs(
        documents, k=k, w=w, min_shared=min_shared, max_df=max_df
    ).select("doc_a", "doc_b")
    participants = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    grams = doc_shingles(
        documents.join(participants, "doc_id", "left_semi"), k
    )
    share_gram = (
        pairs.join(grams.select(F.col("doc_id").alias("doc_a"), "s"), "doc_a")
        .join(grams.select(F.col("doc_id").alias("doc_b"), "s"), ["doc_b", "s"])
        .select("doc_a", "doc_b")
        .distinct()
    )
    return pairs.join(share_gram, ["doc_a", "doc_b"], "left_anti")


def simhash_recall_gate(
    documents: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """(doc_a, doc_b): SimHash recall violations — expected empty.

    Hard invariant: two documents with the SAME whitespace-token
    multiset have identical bit votes, hence identical 64-bit SimHash
    (Hamming 0), hence every fingerprint block equal — so the pair MUST
    appear in ``simhash_pairs``. The identical-multiset relation is
    pure SQL (sort_array of the token split), which makes the sketch
    path's recall DuckDB-checkable even though the fingerprint itself
    is not (the empty-relation oracle discipline of
    /root/reference/run_comparison_experiment.sh:36-53).

    Like the jaccard gate's recall arm, each identity group contributes
    (canonical x member) star pairs — O(group), not O(group^2).
    """
    from .simhash import simhash_pairs

    pairs = simhash_pairs(documents, max_hamming=max_hamming)
    d = documents.select(
        "doc_id", F.sort_array(F.split(F.col("text"), " +")).alias("toks")
    )
    ident = _identity_star_pairs(
        d, F.xxhash64("toks"), F.md5(F.to_json("toks")), "doc_id", "doc_a", "doc_b"
    )
    return ident.join(pairs.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti")


def simhash_precision_gate(
    documents: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """(doc_a, doc_b): SimHash PRECISION violations — expected empty.

    Precision complement of ``simhash_recall_gate`` (the
    winnow_precision_gate pattern): every pair emitted by
    ``simhash_pairs`` must share at least one whitespace token. SimHash
    bits are sign-aggregated xxhash64 token votes, so two documents
    with DISJOINT token sets have independent uniform fingerprints —
    P(Hamming <= 3 over 64 bits) ~ 2.4e-15 per pair; a surviving row is
    a provable pipeline bug for all practical purposes. Pair-anchored
    like every gate here: tokens are computed only for pair
    participants and joined to the pairs on (doc, token) — never a
    token self-join.
    """
    from .simhash import simhash_pairs

    pairs = simhash_pairs(documents, max_hamming=max_hamming).select("doc_a", "doc_b")
    participants = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    toks = (
        documents.join(participants, "doc_id", "left_semi")
        .select("doc_id", F.explode(F.split(F.col("text"), " +")).alias("tok"))
        .distinct()
    )
    share = (
        pairs.join(toks.select(F.col("doc_id").alias("doc_a"), "tok"), "doc_a")
        .join(toks.select(F.col("doc_id").alias("doc_b"), "tok"), ["doc_b", "tok"])
        .select("doc_a", "doc_b")
        .distinct()
    )
    return pairs.join(share, ["doc_a", "doc_b"], "left_anti")


def lsh_recall_gate(embeddings: DataFrame, **lsh_kwargs) -> DataFrame:
    """(vec_a, vec_b): hyperplane-LSH recall violations — expected empty.

    Hard invariant: two IDENTICAL (non-zero) embedding vectors produce
    identical sign bits under every hyperplane table, so they share a
    bucket in every table and must end up in the same connected
    component of ``embedding_lsh_candidates`` (component membership,
    not direct pair presence, so the invariant survives the flood-mode
    star pairing inside oversized buckets).
    """
    from ..operators.cluster import connected_components
    from .similarity import embedding_lsh_candidates, with_norm

    pairs = embedding_lsh_candidates(embeddings, **lsh_kwargs)
    cc = connected_components(pairs, a_col="id_a", b_col="id_b")
    e = with_norm(embeddings).where(F.col("_norm") > 0).select("vec_id", "embedding")
    ident = _identity_star_pairs(
        e,
        F.xxhash64("embedding"),
        F.md5(F.to_json("embedding")),
        "vec_id",
        "vec_a",
        "vec_b",
    )
    cc_a = cc.select(F.col("node").alias("vec_a"), F.col("cluster_id").alias("_ca"))
    cc_b = cc.select(F.col("node").alias("vec_b"), F.col("cluster_id").alias("_cb"))
    return (
        ident.join(cc_a, "vec_a", "left")
        .join(cc_b, "vec_b", "left")
        .where(
            F.col("_ca").isNull()
            | F.col("_cb").isNull()
            | (F.col("_ca") != F.col("_cb"))
        )
        .select("vec_a", "vec_b")
    )


def ann_topk_upper_bound_gate(
    embeddings: DataFrame, k: int = 5, eps: float = 1e-4
) -> DataFrame:
    """(vec_id, rank, ivf_sim_x1e6, exact_sim_x1e6): rank-wise ANN
    upper-bound violations — expected empty.

    IVF searches a SUBSET of the corpus, so for every rank r its r-th
    best similarity can never exceed the exact brute-force r-th best
    (the r-th largest of a subset <= the r-th largest of the superset;
    holds under identical rounding). Generalizes ann_upper_bound_gate
    from top-1 to the full top-k surface.
    """
    from .ivf import embedding_ivf_topk
    from .similarity import embedding_knn

    if k == 1:
        # the k==1 schemas are rank-free (record parity); synthesize
        # rank 1 so the gate covers the whole k range, not k >= 2 only
        exact = embedding_knn(embeddings, k=1).select(
            "vec_id", F.lit(1).cast("long").alias("rank"), F.col("sim").alias("exact_sim")
        )
        approx = embedding_ivf_topk(embeddings, k=1).select(
            "vec_id", F.lit(1).cast("long").alias("rank"), F.col("sim").alias("ivf_sim")
        )
    else:
        exact = embedding_knn(embeddings, k=k).select(
            "vec_id", "rank", F.col("sim").alias("exact_sim")
        )
        approx = embedding_ivf_topk(embeddings, k=k).select(
            "vec_id", "rank", F.col("sim").alias("ivf_sim")
        )
    return (
        approx.join(exact, ["vec_id", "rank"])
        .where(F.col("ivf_sim") > F.col("exact_sim") + F.lit(eps))
        .select(
            "vec_id",
            "rank",
            F.floor(F.col("ivf_sim") * 1e6).cast("long").alias("ivf_sim_x1e6"),
            F.floor(F.col("exact_sim") * 1e6).cast("long").alias("exact_sim_x1e6"),
        )
    )


def embedding_sim_subset_gate(
    embeddings: DataFrame, min_sim: float = 0.45, eps: float = 1e-4
) -> DataFrame:
    """(id_a, id_b): violations of the LSH-verify SUBSET property —
    expected empty.

    The LSH near-dup path verifies its candidate pairs with the same
    rounded-cosine check the exact path applies to ALL pairs, so every
    pair it emits must appear in the exact result with (almost) the
    same similarity — any survivor is a provable bug in the
    bucket/verify plumbing. ``eps`` (one unit in the 4th decimal, the
    rounding grain) absorbs the one legitimate divergence: the two
    paths sum the dot product in different orders (blocked BLAS matmul
    vs per-pair elementwise sum), so an unrounded value sitting
    exactly on a rounding boundary can round one grain apart — the
    exact side is therefore fetched at ``min_sim - eps`` and sims are
    compared with |delta| <= eps rather than float equality. (Recall —
    pairs LSH may miss — is the separate lsh_recall_gate.)
    """
    from .similarity import embedding_sim_pairs

    lsh = embedding_sim_pairs(embeddings, min_sim=min_sim, method="lsh")
    exact = embedding_sim_pairs(embeddings, min_sim=min_sim - eps, method="exact")
    joined = lsh.join(
        exact.select("id_a", "id_b", F.col("sim").alias("_exact_sim")),
        ["id_a", "id_b"],
        "left",
    )
    return joined.where(
        F.col("_exact_sim").isNull()
        | (F.abs(F.col("sim") - F.col("_exact_sim")) > F.lit(eps))
    ).select("id_a", "id_b")


def cc_diff_gate(
    pairs_a: DataFrame,
    pairs_b: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """(node, cluster_a, cluster_b): symmetric difference of the two
    edge sets' connected-component assignments — expected empty when
    the two candidate generators induce the same clustering.

    cluster_id is the component MINIMUM on both sides, so equal
    partitions imply identical assignments; a full outer join exposes
    nodes present on one side only (cluster_x NULL) as well as nodes
    assigned to different components.
    """
    from ..operators.cluster import connected_components

    cc_a = connected_components(pairs_a, a_col=a_col, b_col=b_col).select(
        "node", F.col("cluster_id").alias("cluster_a")
    )
    cc_b = connected_components(pairs_b, a_col=a_col, b_col=b_col).select(
        "node", F.col("cluster_id").alias("cluster_b")
    )
    return (
        cc_a.join(cc_b, "node", "full_outer")
        .where(
            F.col("cluster_a").isNull()
            | F.col("cluster_b").isNull()
            | (F.col("cluster_a") != F.col("cluster_b"))
        )
        .select("node", "cluster_a", "cluster_b")
    )


def ann_upper_bound_gate(
    embeddings: DataFrame, eps: float = 1e-4
) -> DataFrame:
    """(vec_id, ivf_sim_x1e6, exact_sim_x1e6): violations of the ANN
    upper bound — expected empty.

    IVF searches a SUBSET of the corpus (the probed cells), so its
    top-1 cosine can never exceed the exact brute-force top-1. Any row
    where ivf_sim > exact_sim + eps is a provable indexing bug (eps
    absorbs the x1e-4 rounding both paths apply).
    """
    from .ivf import embedding_ivf_topk
    from .similarity import embedding_knn

    exact = embedding_knn(embeddings).select(
        "vec_id", F.col("sim").alias("exact_sim")
    )
    approx = embedding_ivf_topk(embeddings).select(
        "vec_id", F.col("sim").alias("ivf_sim")
    )
    return (
        approx.join(exact, "vec_id")
        .where(F.col("ivf_sim") > F.col("exact_sim") + F.lit(eps))
        .select(
            "vec_id",
            F.floor(F.col("ivf_sim") * 1e6).cast("long").alias("ivf_sim_x1e6"),
            F.floor(F.col("exact_sim") * 1e6).cast("long").alias("exact_sim_x1e6"),
        )
    )


def cascade_invariant_gate(
    documents: DataFrame, verdicts: DataFrame
) -> DataFrame:
    """(kind, doc_id) violations — expected EMPTY — pinning a dedup
    cascade's verdict table (any tier-2: ngram or the non-SQL smh
    sketch pipeline) to three exactly-checkable invariants.

    Requires ``url_col=None`` verdicts: the independent exact-tier
    check below windows over ALL documents, while a url-tier cascade
    computes its exact tier over URL-tier survivors only — feeding
    url-cascade verdicts here would report spurious
    ``exact_tier_mismatch`` rows (ADVICE r5; the url cascade is pinned
    by its own DuckDB recursive-CTE oracle instead).

    Invariants:

    - ``missing_verdict`` / ``extra_verdict`` / ``verdict_multiplicity``:
      the cascade is a total function — every input document gets
      exactly one verdict row, nothing else appears.
    - ``exact_tier_mismatch``: the exact tier must equal an INDEPENDENT
      full-text-equality grouping (window over ``text`` — a different
      plan than the cascade's hash-key groupBy, so hash-collision or
      NULL-handling bugs diverge here); compared on
      (doc_id, keeper_id) both directions.
    - ``keeper_removed``: a final keeper must itself be kept — the
      chain-resolution contract (chains are <= 2 hops and terminate at
      a 'none' verdict).
    """
    from pyspark.sql.window import Window

    docs = documents.select("doc_id", "text")
    # localCheckpoint(eager=False), not persist(): blocks are reclaimed
    # when the plan is GC'd, so repeated gate invocations don't leak
    # cache blocks (ADVICE r5)
    v = verdicts.localCheckpoint(eager=False)  # feeds five branches below

    counts = v.groupBy("doc_id").agg(F.count("*").alias("_n"))
    multi = counts.where(F.col("_n") != 1).select(
        F.lit("verdict_multiplicity").alias("kind"), "doc_id"
    )
    missing = docs.join(v, "doc_id", "left_anti").select(
        F.lit("missing_verdict").alias("kind"), "doc_id"
    )
    extra = v.join(docs, "doc_id", "left_anti").select(
        F.lit("extra_verdict").alias("kind"), "doc_id"
    )

    # independent exact tier: window PARTITION BY text groups NULLs
    # together (same as the oracle's PARTITION BY), no join on a
    # possibly-NULL key anywhere
    w = Window.partitionBy("text")
    expected = docs.select(
        "doc_id", F.min("doc_id").over(w).alias("_tk")
    )
    exp_removed = expected.where(F.col("doc_id") != F.col("_tk")).select(
        "doc_id", F.col("_tk").alias("keeper_id")
    )
    got_removed = v.where(F.col("removed_by") == "exact").select(
        "doc_id", "keeper_id"
    )
    mism = (
        exp_removed.exceptAll(got_removed)
        .unionByName(got_removed.exceptAll(exp_removed))
        .select(F.lit("exact_tier_mismatch").alias("kind"), "doc_id")
    )

    keeper_verdict = v.select(
        F.col("doc_id").alias("final_keeper_id"),
        F.col("removed_by").alias("_keeper_rb"),
    )
    keeper_removed = (
        v.join(keeper_verdict, "final_keeper_id")
        .where(F.col("_keeper_rb") != "none")
        .select(F.lit("keeper_removed").alias("kind"), "doc_id")
    )

    return (
        multi.unionByName(missing)
        .unionByName(extra)
        .unionByName(mism)
        .unionByName(keeper_removed)
    )
