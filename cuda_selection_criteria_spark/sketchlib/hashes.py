"""Vectorized 64-bit hash / RNG primitives (numpy, wraparound arithmetic).

Parity targets (public reference sources):
- WangHash mix: /root/reference/sketch/include/sketch/hash.h:42-63
- wyhash64 stateless step: /root/reference/sketch/include/aesctr/wy.h:45-59
  (state += 0x60bee2bee120fc15; mum(state ^ 0xe7037ed1a0b428db, state),
  mum = 128-bit multiply folded lo^hi)
- WyRand seeding: seed 0 maps to state 1337
  (/root/reference/sketch/include/aesctr/wy.h:113)
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_M32 = U64(0xFFFFFFFF)

WY_INC = U64(0x60BEE2BEE120FC15)
WY_XOR = U64(0xE7037ED1A0B428DB)
WY_ZERO_SEED = U64(1337)


def _u64(x) -> np.ndarray:
    return np.asarray(x, dtype=U64)


def wanghash64(key) -> np.ndarray:
    """Thomas Wang 64-bit invertible mix, vectorized.

    Bit-exact vs sketch/include/sketch/hash.h:42-53 (public domain mix).
    """
    key = _u64(key).copy()
    with np.errstate(over="ignore"):
        key = (~key) + (key << U64(21))
        key = key ^ (key >> U64(24))
        key = (key + (key << U64(3))) + (key << U64(8))
        key = key ^ (key >> U64(14))
        key = (key + (key << U64(2))) + (key << U64(4))
        key = key ^ (key >> U64(28))
        key = key + (key << U64(31))
    return key


def _wymum(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """128-bit multiply of two u64 arrays, folded lo ^ hi.

    numpy has no native u128; split into 32-bit halves. All intermediate
    sums fit in u64: (2^32-1)^2 + (2^32-1) < 2^64.
    """
    with np.errstate(over="ignore"):
        xl, xh = x & _M32, x >> U64(32)
        yl, yh = y & _M32, y >> U64(32)
        ll = xl * yl
        lh = xl * yh
        hl = xh * yl
        hh = xh * yh
        cross = lh + (ll >> U64(32))
        cross2 = hl + (cross & _M32)
        hi = hh + (cross >> U64(32)) + (cross2 >> U64(32))
        lo = x * y  # wraparound == low 64 bits
    return lo ^ hi


def wyhash64_stream(seed0, n_steps: int) -> np.ndarray:
    """wyhash64_stateless sequence, vectorized across seeds.

    ``seed0``: array of initial states (shape [N]); zero seeds are mapped
    to 1337 exactly as WyRand does. Returns shape [N, n_steps] uint64 —
    step j for every seed.
    """
    state = _u64(seed0).copy()
    state[state == U64(0)] = WY_ZERO_SEED
    out = np.empty(state.shape + (n_steps,), dtype=U64)
    with np.errstate(over="ignore"):
        for j in range(n_steps):
            state = state + WY_INC
            out[..., j] = _wymum(state ^ WY_XOR, state)
    return out


def splitmix64(x) -> np.ndarray:
    """SplitMix64 finalizer (public domain, Steele et al.) — used to
    scatter the polynomial shingle hash into a well-distributed u64."""
    z = _u64(x).copy()
    with np.errstate(over="ignore"):
        z = (z + U64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> U64(30))) * U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> U64(27))) * U64(0x94D049BB133111EB)
        z = z ^ (z >> U64(31))
    return z


_POLY_M = U64(0x100000001B3)  # FNV-1a 64 prime as polynomial base

# precomputed powers of the base are tiny; cache per k
_POW_CACHE: dict[int, np.ndarray] = {}


def _poly_powers(k: int) -> np.ndarray:
    pw = _POW_CACHE.get(k)
    if pw is None:
        pw = np.empty(k, dtype=U64)
        acc = U64(1)
        with np.errstate(over="ignore"):
            for i in range(k - 1, -1, -1):
                pw[i] = acc
                acc = acc * _POLY_M
        _POW_CACHE[k] = pw
    return pw


def shingle_hashes(data: bytes | np.ndarray, k: int, dedup: bool = True) -> np.ndarray:
    """All overlapping k-byte shingles of ``data`` hashed to u64.

    hash(i) = splitmix64( sum_j data[i+j] * M^(k-1-j)  mod 2^64 ).
    Deterministic, shared verbatim by the Spark pipeline and the pure-
    Python oracle (parity requires only that both use the same map).

    This is the web-text analogue of the reference's rolling 31-mer
    extraction (/root/reference/src/build_sketch.cpp:62-92); stride 1,
    overlapping, window k. Returns the *deduplicated* shingle set by
    default (HLL and SuperMinHash adds are idempotent, so set semantics
    are safe — see SURVEY.md §1).
    """
    if isinstance(data, (bytes, bytearray, str)):
        if isinstance(data, str):
            data = data.encode("utf-8")
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
    else:
        arr = np.asarray(data, dtype=np.uint8)
    n = arr.shape[0]
    if n < k:
        return np.empty(0, dtype=U64)
    nh = n - k + 1
    pw = _poly_powers(k)
    acc = np.zeros(nh, dtype=U64)
    a64 = arr.astype(U64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc += a64[j : j + nh] * pw[j]
    out = splitmix64(acc)
    if dedup:
        out = np.unique(out)
    return out


def word_shingle_hashes(text: str, k: int, dedup: bool = True) -> np.ndarray:
    """k-word shingles (whitespace tokenization) hashed to u64.

    Off-by-default alternative tokenizer (FIXTURES.md F2 allows either);
    hashes the space-rejoined window with the same polynomial map.
    """
    toks = text.split()
    if len(toks) < k:
        return np.empty(0, dtype=U64)
    joined = [" ".join(toks[i : i + k]).encode("utf-8") for i in range(len(toks) - k + 1)]
    out = np.empty(len(joined), dtype=U64)
    with np.errstate(over="ignore"):
        for i, b in enumerate(joined):
            a = np.frombuffer(b, dtype=np.uint8).astype(U64)
            pw = _poly_powers(len(b)) if len(b) else np.empty(0, dtype=U64)
            out[i] = splitmix64(np.sum(a * pw, dtype=U64))[()]
    if dedup:
        out = np.unique(out)
    return out
