"""Arrow block utilities shared by the driver-side gather patterns."""

from __future__ import annotations

import pyarrow as pa


def concat_blocks(tables, empty_schema: pa.Schema) -> pa.Table:
    """Concatenate object-store dataset blocks, skipping the
    ZERO-COLUMN placeholder blocks Ray Data emits for empty groupby
    partitions (they carry no schema and break pa.concat_tables —
    whether one appears depends on data layout, so callers downstream
    of a bucket-fold MUST tolerate them). Returns an empty table with
    `empty_schema` when every block is a placeholder."""
    ts = [t for t in tables if t.num_columns > 0]
    if not ts:
        return empty_schema.empty_table()
    return pa.concat_tables(ts)
