"""Readers for the reference's gzipped sketch sidecar files.

Used ONLY by parity tests against the checked-in fixture at
/root/reference/datasets/test_influenzaA/.

Formats (public reference sources):
- .hll / .hll_<p>: uint32 bf[4]{is_calc, estim, jestim, 1} + uint32 np +
  double value + 2^np register bytes — sketch/include/sketch/hll.h:1103-1111.
- .smh<m>: uint32 size + uint64[size] raw h_ —
  /root/reference/src/build_sketch.cpp:9-20, read back
  /root/reference/src/selection.cpp:12-33.
"""

from __future__ import annotations

import gzip
import struct

import numpy as np


def read_hll_sidecar(path: str) -> tuple[np.ndarray, int, float]:
    """Return (registers uint8[2^p], p, stored_value)."""
    with gzip.open(path, "rb") as f:
        raw = f.read()
    bf = struct.unpack_from("<4I", raw, 0)
    np_ = struct.unpack_from("<I", raw, 16)[0]
    value = struct.unpack_from("<d", raw, 20)[0]
    regs = np.frombuffer(raw, dtype=np.uint8, count=1 << np_, offset=28)
    del bf
    return regs.copy(), int(np_), float(value)


def read_smh_sidecar(path: str) -> np.ndarray:
    """Return raw h_ signature (uint64[m])."""
    with gzip.open(path, "rb") as f:
        raw = f.read()
    size = struct.unpack_from("<I", raw, 0)[0]
    return np.frombuffer(raw, dtype="<u8", count=size, offset=4).copy()
