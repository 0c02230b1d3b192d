"""Doc-array codec dispatch for the persisted index.

The index's doc arrays are stored under `EngineConfig.codec`:

  "varint" (default) — delta + LEB128 (functions/varint), the
      production codec with fully vectorized grouped encode/decode;
  "bp" — binary packing (functions/bitpack, BP128 layout): one width
      byte per 128-gap block + bit-packed gaps. ~2.4x smaller on the
      dense transcript lists (1-byte varint floor vs a few bits/gap);
      grouped encode loops per key (vectorized inside each key), the
      documented trade for the non-default codec.

Emission-combiner PARTIAL rows are always varint — they are a
transient exchange format, never served — so only the FINAL list
encode/decode dispatches here. `codec` is part of
EngineConfig.index_tag(), so indexes built under different codecs
never share cache dirs, resumes, or generations.
"""

from __future__ import annotations

import numpy as np

from candidategeneration_ray.functions import varint as _vi
from candidategeneration_ray.functions import bitpack as _bp

CODECS = ("varint", "bp")


def encode_docs(sorted_values: np.ndarray, codec: str) -> bytes:
    if codec == "bp":
        return _bp.encode_bp(sorted_values)
    return _vi.encode_delta(sorted_values)


def decode_docs(blob, n: int, codec: str) -> np.ndarray:
    if codec == "bp":
        return _bp.decode_bp(blob, n)
    return _vi.decode_delta(blob)


def encode_docs_grouped_concat(values: np.ndarray, starts: np.ndarray,
                               ends: np.ndarray, codec: str):
    """(payload uint8 array, per-group byte offsets len(starts)+1)."""
    if codec != "bp":
        return _vi.encode_delta_grouped_concat(values, starts, ends)
    blobs = [_bp.encode_bp(values[s:e]) for s, e in zip(starts, ends)]
    off = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=off[1:])
    payload = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    return payload, off


def decode_docs_concat(concat, counts: np.ndarray, codec: str,
                       byte_offsets: np.ndarray | None = None):
    """(values uint64 flat array, group value-offsets len(counts)+1).

    varint recovers group boundaries from `counts` alone; bp blobs are
    not self-delimiting inside a concatenation, so the caller must pass
    the per-group `byte_offsets` (binary_column_concat returns them).
    """
    if codec != "bp":
        return _vi.decode_delta_concat(concat, counts)
    if byte_offsets is None:
        raise ValueError("bp codec needs per-group byte offsets")
    buf = np.frombuffer(concat, dtype=np.uint8) \
        if not isinstance(concat, np.ndarray) else concat
    counts = np.asarray(counts, dtype=np.int64)
    voff = np.concatenate(([0], np.cumsum(counts)))
    values = np.empty(int(voff[-1]), np.uint64)
    for g, n in enumerate(counts):
        values[voff[g]:voff[g + 1]] = _bp.decode_bp(
            buf[int(byte_offsets[g]):int(byte_offsets[g + 1])], int(n))
    return values, voff
