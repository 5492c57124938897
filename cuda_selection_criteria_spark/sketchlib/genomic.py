"""Genomic tokenizer — parity-test-only path (off by default for web text).

Reproduces the reference's rolling canonical 31-mer extraction
(/root/reference/src/build_sketch.cpp:26-39, 62-92): 2-bit base encode
(A=0,C=1,G=2,T=3, case-insensitive), any other character resets the
window, canonical = min(kmer, reverse-complement). Used by tests to
re-derive the checked-in influenza sketches from the .fna.gz inputs,
proving the numpy HLL/SMH builders bit-exact.
"""

from __future__ import annotations

import gzip

import numpy as np

U64 = np.uint64

_CODE = np.full(256, -1, dtype=np.int8)
for i, ch in enumerate(b"ACGT"):
    _CODE[ch] = i
for i, ch in enumerate(b"acgt"):
    _CODE[ch] = i


def read_fasta_gz(path: str) -> list[bytes]:
    """Sequences (concatenated lines) per FASTA record."""
    seqs: list[bytes] = []
    cur: list[bytes] = []
    with gzip.open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if line.startswith(b">"):
                if cur:
                    seqs.append(b"".join(cur))
                    cur = []
            elif line:
                cur.append(line)
    if cur:
        seqs.append(b"".join(cur))
    return seqs


def canonical_kmers(seq: bytes, k: int = 31) -> np.ndarray:
    """All valid canonical k-mers of one sequence, packed 2-bit u64.

    Vectorized: codes via table lookup; windows containing a reset
    position are masked out; pack via polynomial dot with 4^j weights.
    """
    codes = _CODE[np.frombuffer(seq, dtype=np.uint8)]
    n = codes.shape[0]
    if n < k:
        return np.empty(0, dtype=U64)
    valid = codes >= 0
    c64 = np.where(valid, codes, 0).astype(U64)
    nh = n - k + 1
    acc = np.zeros(nh, dtype=U64)
    ok = np.ones(nh, dtype=bool)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = (acc << U64(2)) | c64[j : j + nh]
            ok &= valid[j : j + nh]
    kmers = acc[ok]
    if kmers.size == 0:
        return kmers
    # canonical = min(kmer, revcomp) — build_sketch.cpp:26-39
    km = kmers.copy()
    with np.errstate(over="ignore"):
        km = ((km >> U64(2)) & U64(0x3333333333333333)) | ((km & U64(0x3333333333333333)) << U64(2))
        km = ((km >> U64(4)) & U64(0x0F0F0F0F0F0F0F0F)) | ((km & U64(0x0F0F0F0F0F0F0F0F)) << U64(4))
        km = ((km >> U64(8)) & U64(0x00FF00FF00FF00FF)) | ((km & U64(0x00FF00FF00FF00FF)) << U64(8))
        km = ((km >> U64(16)) & U64(0x0000FFFF0000FFFF)) | ((km & U64(0x0000FFFF0000FFFF)) << U64(16))
        km = (km >> U64(32)) | (km << U64(32))
        rev = (U64(0xFFFFFFFFFFFFFFFF) - km) >> U64(64 - 2 * k)
    return np.minimum(kmers, rev)


def file_kmers(path: str, k: int = 31, dedup: bool = True) -> np.ndarray:
    """All canonical k-mers of every record in a gz FASTA file."""
    parts = [canonical_kmers(s, k) for s in read_fasta_gz(path)]
    if not parts:
        return np.empty(0, dtype=U64)
    out = np.concatenate(parts)
    return np.unique(out) if dedup else out
