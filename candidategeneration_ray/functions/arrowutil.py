"""Zero-copy helpers for Arrow binary columns.

Posting-list blobs move through the build as pa.binary() columns; these
helpers avoid materializing per-row Python bytes objects (a million
tiny copies per shuffle otherwise):

  - binary_column_concat: view a BinaryArray's rows as ONE contiguous
    uint8 numpy array + per-row value offsets (rows are stored
    back-to-back in the Arrow data buffer);
  - binary_array_from_concat: build a BinaryArray directly from a
    concatenated payload + offsets via Array.from_buffers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def binary_column_concat(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Return (data uint8 array, value_offsets int64 array of len n+1)
    such that row i's payload is data[offsets[i]:offsets[i+1]]."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    if isinstance(arr, pa.LargeBinaryArray):
        offs = np.frombuffer(off_buf, dtype=np.int64)
    else:
        offs = np.frombuffer(off_buf, dtype=np.int32)
    offs = offs[arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(data_buf, dtype=np.uint8)
    return data[offs[0]:offs[-1]], offs - offs[0]


def binary_array_from_concat(data, value_offsets: np.ndarray) -> pa.Array:
    """BinaryArray over a concatenated payload without per-row copies."""
    n = len(value_offsets) - 1
    offs32 = np.ascontiguousarray(value_offsets, dtype=np.int32)
    buf = data if isinstance(data, (bytes, bytearray, memoryview)) else \
        np.ascontiguousarray(data, dtype=np.uint8).data
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offs32), pa.py_buffer(buf)]
    )
