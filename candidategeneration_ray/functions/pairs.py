"""d-window term-pair ("d-bigram") generation and int64 key packing.

Reference semantics (src/main/java/PredictiveIndex/InvertedIndex.java:264-314):
for each position i in the token stream, pair words[i] with each of
words[i+1 .. i+d] (window shrinks at the doc tail); sort the two term
ids ascending before packing (`:289-290`); pack as
`(long)lo << 32 | hi` (WWW.java:432-434); each distinct pair is emitted
at most once per doc (the `noDuplicateSet`, `:291`). Self-pairs
(lo == hi, a token repeated inside the window) are legal keys.

Because term ids are 1-based, packed pair keys are >= 2^32 and share an
int64 key space with unigram keys (the raw term id) without collision.
"""

from __future__ import annotations

import numpy as np


def pack_pairs(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Pack sorted id pairs into int64 keys: (lo << 32) | hi."""
    return (lo.astype(np.int64) << 32) | hi.astype(np.int64)


def unpack_pairs(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    k = np.asarray(keys, dtype=np.int64)
    return (k >> 32).astype(np.int32), (k & 0xFFFFFFFF).astype(np.int32)


def doc_pair_keys(term_ids: np.ndarray, distance: int) -> np.ndarray:
    """Distinct packed pair keys of one doc's token-id sequence.

    Vectorized: for each shift s in 1..d, zip ids[:-s] with ids[s:],
    min/max-order each pair, pack, then np.unique for the per-doc dedup.
    """
    ids = np.asarray(term_ids, dtype=np.int64)
    n = ids.size
    if n < 2:
        return np.empty(0, dtype=np.int64)
    chunks = []
    for s in range(1, min(distance, n - 1) + 1):
        a = ids[:-s]
        b = ids[s:]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        chunks.append((lo << 32) | hi)
    return np.unique(np.concatenate(chunks))
