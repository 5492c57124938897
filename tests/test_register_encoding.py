"""Sparse register transport must be unambiguous vs the dense layout.

Regression: a sparse blob with nnz == (2^p - 4) / 3 nonzero registers is
exactly 2^p bytes — the same length decode_registers uses to detect the
dense layout — and used to be misparsed as dense, silently corrupting
that document's registers and its union-Jaccard verify decisions.
"""

from __future__ import annotations

import numpy as np

from cuda_selection_criteria_spark.sketchlib.batch import (
    decode_registers,
    encode_registers_sparse,
)


def _roundtrip(regs: np.ndarray, p: int) -> None:
    blobs = encode_registers_sparse(regs)
    back = decode_registers(blobs, p)
    np.testing.assert_array_equal(back, regs)


def test_ambiguous_nnz_roundtrips_exactly():
    p = 8  # m=256 keeps the test tiny; the invariant is p-independent
    m = 1 << p
    nnz = (m - 4) // 3  # sparse layout would be exactly m bytes
    assert 4 + 3 * nnz == m
    rng = np.random.default_rng(5)
    regs = np.zeros((3, m), dtype=np.uint8)
    for i in range(3):
        idx = rng.choice(m, size=nnz, replace=False)
        regs[i, idx] = rng.integers(1, 60, size=nnz, dtype=np.uint8)
    blobs = encode_registers_sparse(regs)
    # the encoder must emit the dense layout here (sparse not shorter)
    assert all(len(b) == m for b in blobs)
    _roundtrip(regs, p)


def test_nnz_sweep_roundtrips_and_sparse_strictly_shorter():
    p = 8
    m = 1 << p
    rng = np.random.default_rng(7)
    for nnz in (0, 1, (m - 4) // 3 - 1, (m - 4) // 3, (m - 4) // 3 + 1, m):
        regs = np.zeros((1, m), dtype=np.uint8)
        idx = rng.choice(m, size=nnz, replace=False)
        regs[0, idx] = rng.integers(1, 60, size=nnz, dtype=np.uint8)
        (blob,) = encode_registers_sparse(regs)
        assert len(blob) < m or len(blob) == m  # never longer than dense
        if len(blob) != m:
            assert len(blob) == 4 + 3 * nnz  # sparse layout, strictly shorter
        _roundtrip(regs, p)


def test_p14_dense_fallback_boundary():
    p = 14
    m = 1 << p
    nnz = (m - 4) // 3  # 5460 — a plausible large-document nnz
    regs = np.zeros((1, m), dtype=np.uint8)
    regs[0, np.arange(nnz) * 3 % m] = 1
    regs[0, :nnz] = np.arange(nnz) % 50 + 1
    nnz_actual = int((regs != 0).sum())
    (blob,) = encode_registers_sparse(regs)
    if 4 + 3 * nnz_actual >= m:
        assert len(blob) == m
    _roundtrip(regs, p)


def test_fused_hll_cards_encode_matches_separate_path():
    """hll_cards_encode_batch == hll_batch -> cardinalities ->
    encode_registers_sparse / dense tobytes, bit for bit."""
    import numpy as np

    from cuda_selection_criteria_spark.sketchlib.batch import (
        cardinalities,
        encode_registers_sparse,
        hll_batch,
        hll_cards_encode_batch,
    )

    rng = np.random.default_rng(3)
    n_docs, p = 700, 10  # crosses several 256-doc chunks; m=1024
    counts = rng.integers(0, 400, size=n_docs)
    counts[5] = 0  # empty doc
    items = rng.integers(0, 2**63, size=int(counts.sum()), dtype=np.uint64)
    didx = np.repeat(np.arange(n_docs), counts)
    regs = hll_batch(items, didx, n_docs, p)
    want_cards = cardinalities(regs, p)
    for enc in ("sparse", "dense"):
        cards, blobs = hll_cards_encode_batch(items, didx, n_docs, p, encoding=enc)
        np.testing.assert_array_equal(cards, want_cards)
        if enc == "sparse":
            want_blobs = encode_registers_sparse(regs)
        else:
            want_blobs = [r.tobytes() for r in regs]
        assert blobs == want_blobs
