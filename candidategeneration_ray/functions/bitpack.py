"""Binary-packing (BP128-family) posting-list codec.

The FastPFOR/Lemire-Boytsov "binary packing" layout without SIMD
intrinsics: delta-gap the non-decreasing sequence (first element
absolute, like functions/varint.encode_delta), split gaps into
fixed-size blocks of BP_BLOCK, store ONE width byte per block (the
maximum gap's bit length) and then each block's gaps bit-packed
little-endian at that width, each block padded only to a byte
boundary: a short LAST block stores exactly its own gaps
((cnt·w + 7)//8 bytes), never zero-padding to the full BP_BLOCK.
Full-block padding would cost ~w·127 bits on every short list, and
the d-bigram index is DOMINATED by short large-gap pair lists
(measured: full-block padding made bp 3.4x LARGER than varint there;
byte-bound padding keeps short lists ≈ varint-sized while long dense
unigram lists stay ~2.4x smaller).

Vectorization: blocks group by width (≤64 distinct values), each width
group packs/unpacks in ONE numpy op (np.packbits/np.unpackbits with
bitorder="little"), so cost is O(total bits) with no per-block Python
loop. Bit lengths come from np.frexp — exact for every integer < 2^53,
which any doc-id gap is.

This is the alternative codec the postings_bytes_bp driver entry
accounts against an analytic SQL model (width = length(bin(max_gap))),
next to the production delta+varint codec (reference analog
VariableByteCode.java:68-113; binary packing per Lemire & Boytsov,
"Decoding billions of integers per second through vectorization",
SPE 2015).
"""

from __future__ import annotations

import numpy as np

BP_BLOCK = 128


def _widths(block_max: np.ndarray) -> np.ndarray:
    """Exact bit length per block maximum (0 for an all-zero block)."""
    w = np.zeros(block_max.size, np.uint8)
    nz = block_max > 0
    if nz.any():
        w[nz] = np.frexp(block_max[nz].astype(np.float64))[1].astype(np.uint8)
    return w


def _block_counts(n: int, block: int) -> np.ndarray:
    nb = (n + block - 1) // block
    cnt = np.full(nb, block, np.int64)
    cnt[-1] = n - (nb - 1) * block
    return cnt


def encode_bp(sorted_values: np.ndarray, block: int = BP_BLOCK) -> bytes:
    """Delta-gap + binary-pack a non-decreasing int sequence."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    gaps = np.empty_like(v)
    gaps[0] = v[0]
    np.subtract(v[1:], v[:-1], out=gaps[1:])
    nb = (n + block - 1) // block
    cnt = _block_counts(n, block)
    g = np.zeros(nb * block, np.uint64)
    g[:n] = gaps
    grid = g.reshape(nb, block)
    widths = _widths(grid.max(axis=1))
    bytes_per = (cnt * widths.astype(np.int64) + 7) // 8
    offsets = np.concatenate(([0], np.cumsum(bytes_per))) + nb
    out = np.zeros(int(offsets[-1]), np.uint8)
    out[:nb] = widths
    for w in np.unique(widths):
        if w == 0:
            continue
        idx = np.nonzero(widths == w)[0]
        sub = grid[idx]
        shifts = np.arange(w, dtype=np.uint64)
        bits = ((sub[..., None] >> shifts) & np.uint64(1)).astype(np.uint8)
        packed = np.packbits(bits.reshape(idx.size, block * int(w)),
                             axis=1, bitorder="little")
        # copy each block's OWN byte span (short last block copies less)
        for j, bi in enumerate(idx.tolist()):
            span = int(bytes_per[bi])
            out[int(offsets[bi]):int(offsets[bi]) + span] = packed[j, :span]
    return out.tobytes()


def decode_bp(data: bytes | np.ndarray, n: int,
              block: int = BP_BLOCK) -> np.ndarray:
    """Inverse of :func:`encode_bp`; returns the uint64 values."""
    if n == 0:
        return np.zeros(0, np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8) \
        if not isinstance(data, np.ndarray) else data
    nb = (n + block - 1) // block
    cnt = _block_counts(n, block)
    widths = buf[:nb]
    bytes_per = (cnt * widths.astype(np.int64) + 7) // 8
    offsets = np.concatenate(([0], np.cumsum(bytes_per))) + nb
    if int(offsets[-1]) != buf.size:
        raise ValueError(
            f"bp payload is {buf.size} bytes, expected {int(offsets[-1])}")
    grid = np.zeros((nb, block), np.uint64)
    for w in np.unique(widths):
        if w == 0:
            continue
        idx = np.nonzero(widths == w)[0]
        span = (block * int(w) + 7) // 8
        mat = np.zeros((idx.size, span), np.uint8)
        for j, bi in enumerate(idx.tolist()):  # short blocks zero-pad here
            bspan = int(bytes_per[bi])
            mat[j, :bspan] = buf[int(offsets[bi]):int(offsets[bi]) + bspan]
        bits = np.unpackbits(mat, axis=1,
                             bitorder="little")[:, :block * int(w)]
        shifts = np.arange(w, dtype=np.uint64)
        vals = (bits.reshape(idx.size, block, int(w)).astype(np.uint64)
                << shifts).sum(axis=2, dtype=np.uint64)
        grid[idx] = vals
    gaps = grid.reshape(-1)[:n]
    return np.cumsum(gaps, dtype=np.uint64)


def bp_size(sorted_values: np.ndarray, block: int = BP_BLOCK) -> int:
    """On-disk byte size encode_bp would produce, without encoding."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return 0
    gaps = np.empty_like(v)
    gaps[0] = v[0]
    np.subtract(v[1:], v[:-1], out=gaps[1:])
    nb = (n + block - 1) // block
    g = np.zeros(nb * block, np.uint64)
    g[:n] = gaps
    widths = _widths(g.reshape(nb, block).max(axis=1))
    cnt = _block_counts(n, block)
    return int(nb + ((cnt * widths.astype(np.int64) + 7) // 8).sum())
