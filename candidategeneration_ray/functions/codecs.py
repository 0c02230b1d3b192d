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
from candidategeneration_ray.functions import eliasfano as _ef
from candidategeneration_ray.functions import rice as _rice
from candidategeneration_ray.functions import interpolative as _bic

CODECS = ("varint", "bp", "ef", "rice", "bic")
# non-varint codecs are not self-delimiting inside a concatenation, so
# grouped decode needs per-group byte offsets for them
_ENC = {"bp": _bp.encode_bp, "ef": _ef.encode_ef,
        "rice": _rice.encode_rice, "bic": _bic.encode_bic}
_DEC = {"bp": _bp.decode_bp, "ef": _ef.decode_ef,
        "rice": _rice.decode_rice, "bic": _bic.decode_bic}


def encode_docs(sorted_values: np.ndarray, codec: str) -> bytes:
    if codec in _ENC:
        return _ENC[codec](sorted_values)
    return _vi.encode_delta(sorted_values)


def decode_docs(blob, n: int, codec: str) -> np.ndarray:
    if codec in _DEC:
        return _DEC[codec](blob, n)
    return _vi.decode_delta(blob)


def encode_docs_grouped_concat(values: np.ndarray, starts: np.ndarray,
                               ends: np.ndarray, codec: str):
    """(payload uint8 array, per-group byte offsets len(starts)+1)."""
    if codec not in _ENC:
        return _vi.encode_delta_grouped_concat(values, starts, ends)
    enc = _ENC[codec]
    blobs = [enc(values[s:e]) for s, e in zip(starts, ends)]
    off = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=off[1:])
    payload = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    return payload, off


def decode_docs_concat(concat, counts: np.ndarray, codec: str,
                       byte_offsets: np.ndarray | None = None):
    """(values uint64 flat array, group value-offsets len(counts)+1).

    varint recovers group boundaries from `counts` alone; every other
    codec's blobs (bp/ef/rice/bic) are not self-delimiting inside a
    concatenation, so the caller must pass the per-group
    `byte_offsets` (binary_column_concat returns them).
    """
    if codec not in _DEC:
        return _vi.decode_delta_concat(concat, counts)
    if byte_offsets is None:
        raise ValueError(f"{codec} codec needs per-group byte offsets")
    dec = _DEC[codec]
    buf = np.frombuffer(concat, dtype=np.uint8) \
        if not isinstance(concat, np.ndarray) else concat
    counts = np.asarray(counts, dtype=np.int64)
    voff = np.concatenate(([0], np.cumsum(counts)))
    values = np.empty(int(voff[-1]), np.uint64)
    for g, n in enumerate(counts):
        values[voff[g]:voff[g + 1]] = dec(
            buf[int(byte_offsets[g]):int(byte_offsets[g + 1])], int(n))
    return values, voff
