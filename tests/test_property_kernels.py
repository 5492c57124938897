"""Hypothesis property tests for the numpy kernels (no Spark).

Complements the fixture-parity tests (which pin EXACT reference
artifacts) with randomized structural properties: batch kernels must
equal their per-doc references on arbitrary inputs, and the register
transport must roundtrip losslessly at every density.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from cuda_selection_criteria_spark.sketchlib.batch import (
    cardinalities,
    decode_registers,
    encode_registers_sparse,
    hll_batch,
    hll_cards_encode_batch,
    superminhash_batch,
)
from cuda_selection_criteria_spark.sketchlib.hashes import (
    shingle_hashes,
    shingle_hashes_batch,
)
from cuda_selection_criteria_spark.sketchlib.hll import hll_build
from cuda_selection_criteria_spark.sketchlib.smh import superminhash

_texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        max_size=120,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=25, deadline=None)
@given(_texts, st.sampled_from([4, 9, 16]))
def test_batch_shingling_equals_per_doc(texts, k):
    items, didx = shingle_hashes_batch(texts, k)
    for i, t in enumerate(texts):
        assert np.array_equal(np.sort(shingle_hashes(t, k)), items[didx == i])


_item_sets = st.lists(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=60),
    min_size=1,
    max_size=8,
)


@settings(max_examples=25, deadline=None)
@given(_item_sets, st.sampled_from([4, 16, 64]))
def test_smh_batch_equals_per_doc(sets, m):
    sets = [np.unique(np.array(s, dtype=np.uint64)) for s in sets]
    counts = np.array([s.size for s in sets], dtype=np.int64)
    items = (
        np.concatenate([s for s in sets if s.size])
        if counts.sum()
        else np.empty(0, dtype=np.uint64)
    )
    didx = np.repeat(np.arange(len(sets), dtype=np.int64), counts)
    sigs = superminhash_batch(items, didx, len(sets), m)
    for i, s in enumerate(sets):
        if s.size:
            assert np.array_equal(sigs[i], superminhash(s, m)), i


@settings(max_examples=25, deadline=None)
@given(_item_sets, st.sampled_from([6, 8]))
def test_hll_fused_equals_per_doc(sets, p):
    sets = [np.unique(np.array(s, dtype=np.uint64)) for s in sets]
    counts = np.array([s.size for s in sets], dtype=np.int64)
    items = (
        np.concatenate([s for s in sets if s.size])
        if counts.sum()
        else np.empty(0, dtype=np.uint64)
    )
    didx = np.repeat(np.arange(len(sets), dtype=np.int64), counts)
    regs = hll_batch(items, didx, len(sets), p)
    for i, s in enumerate(sets):
        assert np.array_equal(regs[i], hll_build(s, p)), i
    cards, blobs = hll_cards_encode_batch(items, didx, len(sets), p, doc_chunk=3)
    np.testing.assert_array_equal(cards, cardinalities(regs, p))
    np.testing.assert_array_equal(decode_registers(blobs, p), regs)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=256),
    st.sampled_from([6, 8]),
    st.randoms(use_true_random=False),
)
def test_register_roundtrip_any_density(nnz, p, rnd):
    m = 1 << p
    nnz = min(nnz, m)
    regs = np.zeros((1, m), dtype=np.uint8)
    idx = rnd.sample(range(m), nnz)
    for i in idx:
        regs[0, i] = rnd.randint(1, 60)
    blobs = encode_registers_sparse(regs)
    assert len(blobs[0]) <= m  # never larger than dense
    np.testing.assert_array_equal(decode_registers(blobs, p), regs)
