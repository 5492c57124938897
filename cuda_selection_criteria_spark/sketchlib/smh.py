"""SuperMinHash (Ertl, arXiv:1706.05601) — one-pass permutation-free MinHash.

Parity target: /root/reference/sketch/include/sketch/bbmh.h:531-670 with
RNG ``wy::WyHash<uint32_t,1>`` (one buffered 64-bit wyhash64 step serves
two little-endian 32-bit draws — /root/reference/sketch/include/aesctr/wy.h).

Semantics reproduced exactly:
- per item, state0 = item ^ seed (0 → 1337);
- iteration j draws ONE 64-bit value v_j: k_j = low32(v_j) & (m-1)
  (SizePow2Policy::mod, policy.h:21-23), r_j = high32(v_j);
- incremental Fisher–Yates permutation p (lazy reset via q/i bookkeeping,
  bbmh.h:645-655): slot s at position j gets candidate value
  (j << 32) | r_j;
- h[s] = min over items (strict <, so duplicate items are no-ops and the
  sketch has set semantics);
- the occupancy histogram b_/a_ early exit only skips candidates that
  cannot beat the current minimum, so the full (non-early-exit)
  computation yields identical h — which is what we vectorize.

Vectorization: across items (rows). The j-loop (m iterations) is
sequential but each step is O(batch) numpy work; memory is bounded by
chunking items.
"""

from __future__ import annotations

import numpy as np

from .hashes import wyhash64_stream

U64 = np.uint64
_M32 = U64(0xFFFFFFFF)


def _superminhash_chunk(items: np.ndarray, m: int) -> np.ndarray:
    """h-minima for one chunk of items; shape [m] uint64."""
    n = items.shape[0]
    draws = wyhash64_stream(items, m)  # [n, m]
    ks = (draws & _M32).astype(U64) & U64(m - 1)  # k_j per item
    rs = draws >> U64(32)  # r_j per item

    # Incremental swap walk across all items at once. NOTE: the
    # reference draws k over the FULL range [0, m) (SizePow2Policy::mod),
    # not [j, m) — so the visited sequence visited[j] = p[j]-after-swap
    # may repeat slots and miss others. A slot's candidate from this
    # item is its EARLIEST visit (the j-component makes later visits
    # strictly larger), and unvisited slots get no candidate.
    perm = np.broadcast_to(np.arange(m, dtype=np.int64), (n, m)).copy()
    rows = np.arange(n)
    visited = np.empty((n, m), dtype=np.int64)
    for j in range(m):
        kj = ks[:, j].astype(np.int64)
        tmp = perm[rows, kj]
        perm[rows, kj] = perm[rows, j]
        perm[rows, j] = tmp
        visited[:, j] = perm[:, j]

    with np.errstate(over="ignore"):
        vals = (np.arange(m, dtype=U64)[None, :] << U64(32)) | rs  # value at iteration j
    # scatter in DESCENDING j so the earliest visit wins each slot
    slot_vals = np.full((n, m), np.iinfo(np.uint64).max, dtype=U64)
    for j in range(m - 1, -1, -1):
        slot_vals[rows, visited[:, j]] = vals[:, j]
    return slot_vals.min(axis=0)


def superminhash(items: np.ndarray, m: int, chunk: int = 4096) -> np.ndarray:
    """SuperMinHash signature h_ (uint64[m]) of a set of u64 items.

    ``m`` must be a power of two (the reference's SizePow2Policy rounds
    up; callers pass powers of two). Duplicates in ``items`` are
    harmless but wasteful — pass a deduplicated set.
    """
    if m & (m - 1):
        raise ValueError(f"m must be a power of two, got {m}")
    items = np.asarray(items, dtype=U64)
    h = np.full(m, np.iinfo(np.uint64).max, dtype=U64)
    for lo in range(0, items.shape[0], chunk):
        part = _superminhash_chunk(items[lo : lo + chunk], m)
        np.minimum(h, part, out=h)
    return h
