"""Delta + varint compression for sorted doc-id sequences, numpy-vectorized.

The reference compresses docs with a variable-byte code
(src/PredictiveIndex/VariableByteCode.java:18-57 plain,
68-113 delta/"interpolate"; decoder utilsClass.java:62-80). We keep the
same idea — delta-gap the sorted doc ids, then a 7-bit-per-byte varint
with a continuation bit — implemented fresh as vectorized numpy byte
arithmetic (LEB128 layout: low 7 bits first, MSB set on all but the
final byte of each number).

encode_delta / decode_delta are exact inverses for any non-decreasing
uint64 sequence (property-tested).
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # ceil(64 / 7)


def varint_sizes(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value under varint_encode's scheme
    (1 + number of 7-bit groups above the first) — THE sizing rule;
    callers that split a concatenated encoding must use this instead
    of re-deriving it."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(v.size, dtype=np.int64)
    for k in range(1, _MAX_BYTES):
        nbytes += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    return nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array as concatenated LEB128 varints (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = varint_sizes(v)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(offsets[-1], dtype=np.uint8)
    for j in range(_MAX_BYTES):
        mask = nbytes > j
        if not mask.any():
            break
        idx = offsets[:-1][mask] + j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(data: bytes | np.ndarray) -> np.ndarray:
    """Decode concatenated LEB128 varints back to a uint64 array."""
    b = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    if not (b & 0x80).any():
        # all-single-byte fast path: dense doc-id gaps are < 128 for
        # every hot list, and the generic repeat/reduceat decode is
        # ~40x slower than this cast (measured: 4.4 ms -> 0.1 ms for a
        # 210k-posting list) — this is the serving-latency hot path
        return b.astype(np.uint64)
    ends = np.nonzero((b & 0x80) == 0)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lengths)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


def encode_delta_grouped(
    values: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> list[bytes]:
    """Delta+varint encode MANY groups in one vectorized pass.

    `values` holds all groups' non-decreasing sequences concatenated;
    group g spans values[starts[g]:ends[g]]. The first element of each
    group is stored as an absolute value (delta resets per group).
    Returns one bytes object per group. Equivalent to
    [encode_delta(values[s:e]) for s, e in zip(starts, ends)] but
    without per-group numpy call overhead.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return [b""] * len(starts)
    gaps = np.empty_like(v)
    gaps[0] = v[0]
    np.subtract(v[1:], v[:-1], out=gaps[1:])
    gaps[starts] = v[starts]  # delta reset at each group head
    # vectorized varint sizing/filling (same scheme as varint_encode)
    nbytes = np.ones(v.size, dtype=np.int64)
    for k in range(1, _MAX_BYTES):
        nbytes += (gaps >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(offsets[-1], dtype=np.uint8)
    for j in range(_MAX_BYTES):
        mask = nbytes > j
        if not mask.any():
            break
        idx = offsets[:-1][mask] + j
        chunk = (gaps[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    buf = out.tobytes()
    bs = offsets[starts]
    be = offsets[ends]
    return [buf[s:e] for s, e in zip(bs, be)]


def encode_delta_grouped_concat(
    values: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Like encode_delta_grouped but returns (payload uint8 array,
    per-group byte offsets len(starts)+1) — zero per-group Python
    objects. Groups must tile `values` contiguously
    (ends[i] == starts[i+1]); byte offsets are relative to payload."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, np.uint8), np.zeros(len(starts) + 1, np.int64)
    gaps = np.empty_like(v)
    gaps[0] = v[0]
    np.subtract(v[1:], v[:-1], out=gaps[1:])
    gaps[starts] = v[starts]
    nbytes = np.ones(v.size, dtype=np.int64)
    for k in range(1, _MAX_BYTES):
        nbytes += (gaps >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(offsets[-1], dtype=np.uint8)
    for j in range(_MAX_BYTES):
        mask = nbytes > j
        if not mask.any():
            break
        idx = offsets[:-1][mask] + j
        chunk = (gaps[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    group_off = np.concatenate((offsets[starts], [offsets[-1]]))
    return out, group_off


def decode_delta_concat(
    concat: bytes | np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY concatenated encode_delta payloads in one pass.

    `concat` is the byte-concatenation of per-group encode_delta blobs;
    `counts[g]` is the number of values in group g. Returns
    (values uint64 flat array, group value-offsets of len(counts)+1).
    """
    gaps = varint_decode(concat)
    offsets = np.concatenate(([0], np.cumsum(np.asarray(counts, dtype=np.int64))))
    if gaps.size != offsets[-1]:
        raise ValueError(f"decoded {gaps.size} values, expected {offsets[-1]}")
    if gaps.size == 0:
        return gaps, offsets
    cs = np.cumsum(gaps, dtype=np.uint64)
    starts = offsets[:-1]
    # subtract the running total up to each group head, then re-add the
    # head's absolute value (stored as its own gap)
    base = np.zeros(len(starts), dtype=np.uint64)
    nz = starts > 0
    base[nz] = cs[starts[nz] - 1]
    lengths = np.diff(offsets)
    values = cs - np.repeat(base, lengths)
    return values, offsets


def encode_delta(sorted_values: np.ndarray) -> bytes:
    """Delta-gap a non-decreasing int sequence and varint-encode the gaps."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return b""
    gaps = np.empty_like(v)
    gaps[0] = v[0]
    np.subtract(v[1:], v[:-1], out=gaps[1:])
    return varint_encode(gaps)


def decode_delta(data: bytes | np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_delta`; returns uint64 array."""
    gaps = varint_decode(data)
    return np.cumsum(gaps, dtype=np.uint64)
