"""Portable deterministic hashing shared by the Python pipelines and the
DuckDB oracle SQL.

h64(s)  = first 16 hex digits of md5(s) as uint64 — identical to
          DuckDB's ('0x' || substr(md5(s), 1, 16))::UBIGINT.
minhash = (a_i * (h mod P) + b_i) mod P over word shingles, P = 2^61-1,
          with the fixed permutation constants below (inlined into the
          SQL so both sides compute the same signatures).
"""

from __future__ import annotations

import hashlib

import numpy as np

MERSENNE_P = (1 << 61) - 1

# 16 fixed (a, b) permutation constants (a odd, < 2^32). Hardcoded so
# the SQL oracle can inline them; do not regenerate.
MINHASH_PERMS: list[tuple[int, int]] = [
    (2654435761, 1013904223), (2246822519, 3266489917),
    (3266489917, 668265263), (668265263, 374761393),
    (374761393, 2246822519), (2654435769, 40503),
    (40499, 2654435761), (179426549, 15485863),
    (15485867, 179424673), (179424691, 32452843),
    (32452867, 49979687), (49979693, 86028121),
    (86028157, 104395301), (104395303, 122949823),
    (122949829, 141650939), (141650963, 160481183),
]
NUM_PERMS = len(MINHASH_PERMS)
LSH_BANDS = 4
LSH_ROWS = NUM_PERMS // LSH_BANDS  # 4 rows per band
SHINGLE_W = 3          # word shingles for near-dup detection
FINGERPRINT_W = 8      # word shingles for document fingerprinting
SIMHASH_BITS = 60      # keep simhash < 2^62 so it fits int64 everywhere


def h64(s: str) -> int:
    """md5-based 64-bit hash, identical to the SQL expression."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)


def h64_many(strings) -> np.ndarray:
    md5 = hashlib.md5
    return np.fromiter(
        (int(md5(s.encode("utf-8")).hexdigest()[:16], 16) for s in strings),
        dtype=np.uint64, count=len(strings),
    )


def word_shingles(tokens: list[str], w: int) -> list[str]:
    """Space-joined w-shingles; a doc shorter than w yields one shingle
    of all its tokens (empty docs yield the empty-string shingle)."""
    if len(tokens) <= w:
        return [" ".join(tokens)]
    return [" ".join(tokens[i:i + w]) for i in range(len(tokens) - w + 1)]


def minhash_signature(shingle_hashes: np.ndarray) -> np.ndarray:
    """NUM_PERMS minhash values (int64 < 2^61) for one doc's distinct
    shingle hash set. Python ints avoid uint64 overflow, matching the
    SQL's HUGEINT arithmetic."""
    hs = [int(h) % MERSENNE_P for h in shingle_hashes]
    out = np.empty(NUM_PERMS, dtype=np.int64)
    for i, (a, b) in enumerate(MINHASH_PERMS):
        out[i] = min((a * h + b) % MERSENNE_P for h in hs)
    return out


def simhash(token_hashes: np.ndarray, weights: np.ndarray) -> int:
    """SIMHASH_BITS-bit simhash: bit b is set iff the tf-weighted sum of
    (±1 per token-hash bit b) is > 0."""
    v = np.zeros(SIMHASH_BITS, dtype=np.int64)
    h = token_hashes.astype(np.uint64)
    w = weights.astype(np.int64)
    for b in range(SIMHASH_BITS):
        bits = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        v[b] = np.sum(np.where(bits == 1, w, -w))
    out = 0
    for b in range(SIMHASH_BITS):
        if v[b] > 0:
            out |= 1 << b
    return out
