"""Golomb-Rice posting-list codec — the classic geometric-gap code
(Golomb 1966; Rice 1971; the postings codec of MG / early Lucene
lineage). Gaps g_i (delta from 0, the varint convention) are coded
with a per-list parameter k = floor(log2(u/n)) (u = last value — the
sum of gaps — so k tracks the mean gap; 0 when u < n):

    quotient  q_i = g_i >> k   in unary (q_i zeros then a 1)
    remainder r_i = g_i & (2^k − 1)   in k fixed bits

Layout: [k: 1 byte][unary byte length: 4 bytes LE][unary bitstream,
little-endian packbits][remainder bitstream, k bits each]. n is NOT
stored — the index schema carries it per row (the bitpack/eliasfano
contract).

Vectorization: encode sets one terminator bit per value in a zeroed
bit array (cumulative positions) + one packbits for the remainder
matrix; decode is two np.unpackbits + one flatnonzero — no
per-element Python.

Reference analog: VariableByteCode.java:68-113 is the reference's only
codec; Rice is the classic alternative its static index never took.
"""

from __future__ import annotations

import numpy as np


def _rice_k(u: int, n: int) -> int:
    """floor(log2(u/n)) as exact integer arithmetic (0 when u < n)."""
    q = u // n
    return q.bit_length() - 1 if q >= 1 else 0


def encode_rice(sorted_values: np.ndarray) -> bytes:
    """Golomb-Rice encode a non-decreasing uint sequence (as gaps)."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    u = int(v[-1])
    if u >= (1 << 63):
        raise OverflowError("rice values must fit 2^63")
    gaps = np.diff(v, prepend=np.uint64(0))
    k = _rice_k(u, n)
    q = (gaps >> np.uint64(k)).astype(np.int64)
    unary_bits = int(q.sum()) + n
    ub = np.zeros(unary_bits, np.uint8)
    ub[np.cumsum(q + 1) - 1] = 1          # terminator after q_i zeros
    unary = np.packbits(ub, bitorder="little")
    if k:
        shifts = np.arange(k, dtype=np.uint64)
        bits = (((gaps & np.uint64((1 << k) - 1))[:, None] >> shifts)
                & np.uint64(1)).astype(np.uint8)
        rem = np.packbits(bits.reshape(-1), bitorder="little")
    else:
        rem = np.zeros(0, np.uint8)
    head = np.zeros(5, np.uint8)
    head[0] = k
    head[1:5] = np.frombuffer(
        int(unary.size).to_bytes(4, "little"), np.uint8)
    return head.tobytes() + unary.tobytes() + rem.tobytes()


def decode_rice(data: bytes | np.ndarray, n: int) -> np.ndarray:
    """Inverse of :func:`encode_rice`; returns the uint64 values."""
    if n == 0:
        return np.zeros(0, np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8) \
        if not isinstance(data, np.ndarray) else data
    if buf.size < 5:
        raise ValueError(f"rice payload is {buf.size} bytes, too short")
    k = int(buf[0])
    unary_len = int.from_bytes(buf[1:5].tobytes(), "little")
    if buf.size < 5 + unary_len + (n * k + 7) // 8:
        raise ValueError(
            f"rice payload is {buf.size} bytes, too short for n={n}, "
            f"k={k}, unary_len={unary_len}")
    ub = np.unpackbits(buf[5:5 + unary_len], bitorder="little")
    # count ALL terminators: surplus set bits (mis-sliced / corrupted
    # payload) must raise too, not silently decode the first n
    pos = np.flatnonzero(ub)
    if pos.size != n:
        raise ValueError(
            f"rice unary stream has {pos.size} terminators, expected {n}")
    q = np.diff(pos, prepend=-1).astype(np.uint64) - np.uint64(1)
    if k:
        bits = np.unpackbits(buf[5 + unary_len:],
                             bitorder="little")[:n * k]
        shifts = np.arange(k, dtype=np.uint64)
        rem = (bits.reshape(n, k).astype(np.uint64) << shifts) \
            .sum(axis=1, dtype=np.uint64)
    else:
        rem = np.zeros(n, np.uint64)
    gaps = (q << np.uint64(k)) | rem
    return np.cumsum(gaps, dtype=np.uint64)


def rice_size(sorted_values: np.ndarray) -> int:
    """On-disk byte size encode_rice would produce, without encoding."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return 0
    u = int(v[-1])
    k = _rice_k(u, n)
    gaps = np.diff(v, prepend=np.uint64(0))
    unary_bits = int((gaps >> np.uint64(k)).sum()) + n
    return 5 + (unary_bits + 7) // 8 + (n * k + 7) // 8
