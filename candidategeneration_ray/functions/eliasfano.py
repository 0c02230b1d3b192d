"""Elias-Fano posting-list codec — the succinct monotone-sequence
encoding (Elias 1974, Fano 1971; the quasi-succinct index layout of
Vigna, "Quasi-succinct indices", WSDM 2013; Lucene ≥ 4.x ships it for
postings). For a non-decreasing sequence v_0..v_{n-1} with u = v_{n-1}:

    l    = max(0, floor(log2(u / n)))           low bits per element
    low  = the l low bits of every element, bit-packed little-endian
    high = a unary bitvector: bit ((v_i >> l) + i) is set for every i
           (length (u >> l) + n bits)

yielding n*l + (u >> l) + n bits <= n * (2 + ceil(log2(u/n))) — within
half a bit per element of the information-theoretic minimum for a
monotone sequence, independent of gap distribution (binary packing and
varint both degrade on mixed-gap blocks; EF cannot).

Layout here: 1 header byte holding l, then the low section
((n*l + 7)//8 bytes), then the high bitvector (((u >> l) + n + 7)//8
bytes). n is NOT stored — the index schema already carries it per row
(the same contract as functions/bitpack).

Vectorization: encode is two np.packbits calls (one for the low
matrix, one for the high bitvector scatter); decode is two
np.unpackbits + one flatnonzero — no per-element Python. Values must
fit 2^63 (doc ids / packed keys always do; guarded).

Reference analog: VariableByteCode.java:68-113 is the reference's only
codec; EF is the public upgrade path its static index never took.
"""

from __future__ import annotations

import numpy as np


def _low_bits(u_over_n: int) -> int:
    """floor(log2(u/n)) as exact integer arithmetic (0 when u < n)."""
    return u_over_n.bit_length() - 1 if u_over_n >= 1 else 0


def encode_ef(sorted_values: np.ndarray) -> bytes:
    """Elias-Fano encode a non-decreasing uint sequence."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    u = int(v[-1])
    if u >= (1 << 63):
        raise OverflowError("elias-fano values must fit 2^63")
    l = _low_bits(u // n)
    low_bytes = (n * l + 7) // 8
    high_len = (u >> l) + n
    out = np.zeros(1 + low_bytes + (high_len + 7) // 8, np.uint8)
    out[0] = l
    if l:
        shifts = np.arange(l, dtype=np.uint64)
        bits = (((v & np.uint64((1 << l) - 1))[:, None] >> shifts)
                & np.uint64(1)).astype(np.uint8)
        out[1:1 + low_bytes] = np.packbits(bits.reshape(-1),
                                           bitorder="little")
    hb = np.zeros(high_len, np.uint8)
    hb[(v >> np.uint64(l)).astype(np.int64) + np.arange(n)] = 1
    out[1 + low_bytes:] = np.packbits(hb, bitorder="little")
    return out.tobytes()


def decode_ef(data: bytes | np.ndarray, n: int) -> np.ndarray:
    """Inverse of :func:`encode_ef`; returns the uint64 values."""
    if n == 0:
        return np.zeros(0, np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8) \
        if not isinstance(data, np.ndarray) else data
    if buf.size == 0:
        raise ValueError(f"elias-fano payload is empty but n={n}")
    l = int(buf[0])
    low_bytes = (n * l + 7) // 8
    if buf.size < 1 + low_bytes + (n + 7) // 8:
        raise ValueError(
            f"elias-fano payload is {buf.size} bytes, too short for n={n}")
    if l:
        bits = np.unpackbits(buf[1:1 + low_bytes],
                             bitorder="little")[:n * l]
        shifts = np.arange(l, dtype=np.uint64)
        low = (bits.reshape(n, l).astype(np.uint64) << shifts) \
            .sum(axis=1, dtype=np.uint64)
    else:
        low = np.zeros(n, np.uint64)
    hb = np.unpackbits(buf[1 + low_bytes:], bitorder="little")
    pos = np.flatnonzero(hb)
    if pos.size != n:  # trailing byte padding is zeros; exactly n ones
        raise ValueError(
            f"elias-fano high bitvector has {pos.size} set bits, "
            f"expected {n}")
    high = (pos - np.arange(n)).astype(np.uint64)
    return (high << np.uint64(l)) | low


def ef_size(sorted_values: np.ndarray) -> int:
    """On-disk byte size encode_ef would produce, without encoding."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return 0
    u = int(v[-1])
    l = _low_bits(u // n)
    return 1 + (n * l + 7) // 8 + ((u >> l) + n + 7) // 8
