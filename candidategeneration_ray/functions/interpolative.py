"""Binary interpolative coding for doc arrays — the recursive
range-splitting code of Moffat & Stuiver ("Binary Interpolative Coding
for Effective Index Compression", Information Retrieval 3(1), 2000):
the midpoint of a strictly-increasing list is coded against the bounds
implied by its neighbours, then each half recurses with tightened
bounds. Clustered lists cost close to 0 bits/gap — the known best
static postings codec on runs (our transcript lists are doc-ordered
and bursty, exactly its good case).

This is the FIXED-WIDTH variant: a node covering values[s:e) inside
value bounds [lo, hi] codes x = values[mid] (mid = s + (e-s)//2) as
(x - lo') in w = bit_length(r - 1) bits, where lo' = lo + (mid - s),
hi' = hi - (e - 1 - mid), r = hi' - lo' + 1 (w = 0 when r == 1 — the
value is forced and costs nothing). The canonical centred minimal
binary refinement saves <1 bit/node but makes the size data-dependent
inside a node; fixed width keeps the exact analytic size model the
SQL oracle recomputes (`postings_bytes_bic`).

Traversal is LEVEL ORDER (all nodes of depth d, left children then
right children), not the paper's depth-first order: every level's
widths depend only on already-known bounds, so encode and decode are
both whole-level vectorized (one ragged bit-scatter / bit-gather per
level, no per-node Python). The bit-count is traversal-invariant, so
the oracle's recursion order doesn't have to match.

Layout: [u: 8 bytes LE][bit payload, little-endian packbits]. n is
NOT stored — the index schema carries it per row (the bitpack /
eliasfano / rice contract). Values must be STRICTLY increasing (doc
arrays are distinct doc ids); duplicates would break the bounds
invariant and raise.

Reference analog: VariableByteCode.java:68-113 is the reference's only
codec; interpolative is the classic alternative its static index never
took.
"""

from __future__ import annotations

import numpy as np

# POW2[k] = 2^k; bit_length(x) = searchsorted(POW2, x, 'right') for
# x >= 0 (0 -> 0, 1 -> 1, 2..3 -> 2, ...).
_POW2 = (np.uint64(1) << np.arange(63, dtype=np.uint64))


def _bit_lengths(x: np.ndarray) -> np.ndarray:
    """Element-wise int.bit_length for non-negative int64 arrays."""
    return np.searchsorted(_POW2, x.astype(np.uint64), side="right")


def _level_geometry(s, e, lo, hi, values):
    """One level's node geometry: (mid, x, lo', widths)."""
    mid = s + ((e - s) >> 1)
    x = values[mid].astype(np.int64)
    lop = lo + (mid - s)
    hip = hi - (e - 1 - mid)
    r = hip - lop + 1
    if np.any(r < 1) or np.any(x < lop) or np.any(x > hip):
        raise ValueError("bic requires strictly increasing values "
                         "within [0, u]")
    return mid, x, lop, _bit_lengths(r - 1)


def _children(s, e, lo, hi, mid, x):
    """Next level in the canonical order: left children, then right."""
    ml = mid > s
    mr = e > mid + 1
    return (np.concatenate((s[ml], mid[mr] + 1)),
            np.concatenate((mid[ml], e[mr])),
            np.concatenate((lo[ml], x[mr] + 1)),
            np.concatenate((x[ml] - 1, hi[mr])))


def encode_bic(sorted_values: np.ndarray) -> bytes:
    """Interpolative-encode a strictly increasing uint sequence."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    u = int(v[-1])
    if u >= (1 << 62):
        raise OverflowError("bic values must fit 2^62")
    vi = v.astype(np.int64)
    s = np.zeros(1, np.int64)
    e = np.full(1, n, np.int64)
    lo = np.zeros(1, np.int64)
    hi = np.full(1, u, np.int64)
    codes, widths = [], []
    while s.size:
        mid, x, lop, w = _level_geometry(s, e, lo, hi, vi)
        codes.append((x - lop).astype(np.uint64))
        widths.append(w.astype(np.int64))
        s, e, lo, hi = _children(s, e, lo, hi, mid, x)
    codes = np.concatenate(codes)
    widths = np.concatenate(widths)
    total = int(widths.sum())
    # ragged bit scatter: bit j of the stream is bit (j - start) of
    # its field's code, fields in emission order
    starts = np.concatenate(([0], np.cumsum(widths)))
    fid = np.repeat(np.arange(widths.size), widths)
    bitpos = (np.arange(total, dtype=np.int64)
              - starts[fid]).astype(np.uint64)
    bits = ((codes[fid] >> bitpos) & np.uint64(1)).astype(np.uint8)
    payload = np.packbits(bits, bitorder="little")
    return int(u).to_bytes(8, "little") + payload.tobytes()


def decode_bic(data: bytes | np.ndarray, n: int) -> np.ndarray:
    """Inverse of :func:`encode_bic`; returns the uint64 values."""
    if n == 0:
        return np.zeros(0, np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8) \
        if not isinstance(data, np.ndarray) else data
    if buf.size < 8:
        raise ValueError(f"bic payload is {buf.size} bytes, too short")
    u = int.from_bytes(buf[:8].tobytes(), "little")
    bits = np.unpackbits(buf[8:], bitorder="little")
    out = np.empty(n, np.int64)
    s = np.zeros(1, np.int64)
    e = np.full(1, n, np.int64)
    lo = np.zeros(1, np.int64)
    hi = np.full(1, u, np.int64)
    consumed = 0
    while s.size:
        # widths depend only on bounds, known before reading the level
        mid = s + ((e - s) >> 1)
        lop = lo + (mid - s)
        hip = hi - (e - 1 - mid)
        r = hip - lop + 1
        if np.any(r < 1):
            raise ValueError("bic stream bounds invariant violated")
        w = _bit_lengths(r - 1).astype(np.int64)
        lvl = int(w.sum())
        if consumed + lvl > bits.size:
            raise ValueError("bic payload too short for n")
        starts = np.concatenate(([0], np.cumsum(w)))
        codes = np.zeros(w.size, np.uint64)
        nz = np.flatnonzero(w)
        if nz.size:
            fid = np.repeat(np.arange(w.size), w)
            bitpos = (np.arange(lvl, dtype=np.int64)
                      - starts[fid]).astype(np.uint64)
            weighted = (bits[consumed:consumed + lvl].astype(np.uint64)
                        << bitpos)
            # reduceat over non-empty segments only (empty segments
            # would echo the next element instead of summing to 0)
            codes[nz] = np.add.reduceat(weighted, starts[nz])
        consumed += lvl
        x = lop + codes.astype(np.int64)
        if np.any(x > hip):
            raise ValueError("bic code out of range")
        out[mid] = x
        s, e, lo, hi = _children(s, e, lo, hi, mid, x)
    return out.astype(np.uint64)


def bic_size(sorted_values: np.ndarray) -> int:
    """On-disk byte size encode_bic would produce, without encoding."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return 0
    vi = v.astype(np.int64)
    s = np.zeros(1, np.int64)
    e = np.full(1, n, np.int64)
    lo = np.zeros(1, np.int64)
    hi = np.full(1, int(v[-1]), np.int64)
    total = 0
    while s.size:
        mid, x, lop, w = _level_geometry(s, e, lo, hi, vi)
        total += int(w.sum())
        s, e, lo, hi = _children(s, e, lo, hi, mid, x)
    return 8 + (total + 7) // 8
