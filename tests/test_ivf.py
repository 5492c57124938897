"""IVF ANN: recall vs the exact brute-force baseline."""

from __future__ import annotations

from cuda_selection_criteria_spark.functions import embedding_knn
from cuda_selection_criteria_spark.functions.ivf import embedding_ivf_topk

SF = "/root/testdata/sf0.001"


def test_ivf_recall_vs_exact(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {r.vec_id: r.neighbor_id for r in embedding_knn(emb).collect()}
    approx = {r.vec_id: r.neighbor_id for r in embedding_ivf_topk(emb, n_cells=8, nprobe_assign=3).collect()}
    assert set(approx) == set(exact)  # every vector answered
    hits = sum(1 for v, n in exact.items() if approx.get(v) == n)
    recall = hits / len(exact)
    assert recall >= 0.8, f"IVF top-1 recall {recall}"


def test_ivf_hot_cell_split_identical(spark):
    """Splitting hot cells into member blocks (max_cell) must not
    change any answer: per-block partial top-1s merge to the same
    global top-1 (same values, same tie-breaks)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = sorted(tuple(r) for r in embedding_ivf_topk(emb).collect())
    # 500 vecs x nprobe 2 over 16 cells ~= 62/cell; max_cell=20 forces
    # multi-block on every cell
    split = sorted(tuple(r) for r in embedding_ivf_topk(emb, max_cell=20).collect())
    assert split == base


def test_ivf_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = sorted(tuple(r) for r in embedding_ivf_topk(emb).collect())
    b = sorted(tuple(r) for r in embedding_ivf_topk(emb).collect())
    assert a == b
