"""Task-routed bucket exchange — groupby(int bucket).map_groups minus
Ray's sort machinery.

Every fold in this repo already routes rows by a small int bucket
column and processes ONE bucket per map_groups call. Ray executes that
groupby as a full sort exchange; at bench scale the Sort operator
spends seconds of wall on milliseconds of compute (the round-5 build
measurement: 3.7 s wall for ~2 cpu-s; the PPJoin plan ran FOUR such
sorts). This module routes the same all-to-all explicitly: each
upstream block is split into per-bucket zero-copy slices
(`num_returns` fan-out), and one task per bucket folds its slices —
identical input rows per fold, no sort, no extra copies.

At cluster scale the traffic is the same K objects per (block, bucket)
the sort exchange moves — minus the sort. Bucket counts come from the
callers (size-derived via tableutil.auto_buckets where the stream is
corpus-proportional)."""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray


@ray.remote
def _split_col(block: pa.Table, col: str, nb: int):
    """One stable sort by the bucket column + nb zero-copy slices."""
    if block.num_rows == 0 or col not in block.schema.names:
        # Ray passes EMPTY blocks through map stages unchanged (the
        # appended bucket column never materializes on them); 0-row
        # slices are filtered before the fold concat, so any schema works
        return tuple(block.slice(0, 0) for _ in range(nb))
    b = block.column(col).to_numpy().astype(np.int64)
    order = np.argsort(b, kind="stable")
    tbl = block.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(b[order], np.arange(nb + 1))
    return tuple(tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
                 for i in range(nb))


@ray.remote
def _fold_slices(fold_fn: Callable, empty_out: pa.Table,
                 *slices: pa.Table) -> pa.Table:
    live = [s for s in slices if s.num_rows]
    if not live:
        return empty_out
    return fold_fn(pa.concat_tables(live))


def fold_by_bucket(ds: ray.data.Dataset, bucket_col: str,
                   fold_fn: Callable[[pa.Table], pa.Table],
                   num_buckets: int,
                   empty_out: pa.Table) -> ray.data.Dataset:
    """`ds.groupby(bucket_col).map_groups(fold_fn)` with task routing.

    Requirements (same as the folds already satisfy): `bucket_col`
    holds ints in [0, num_buckets); `fold_fn` is order-insensitive
    over its group's rows and receives the bucket column like
    map_groups does. Empty buckets yield `empty_out` (the fold's
    0-row output schema) — map_groups simply skipped them, so
    downstream code must already tolerate empty blocks."""
    refs = ds.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow([empty_out])
    if num_buckets == 1:
        return ray.data.from_arrow_refs(
            [_fold_slices.remote(fold_fn, empty_out, *refs)])
    split_out = [
        _split_col.options(num_returns=num_buckets).remote(
            r, bucket_col, num_buckets)
        for r in refs
    ]
    merged = [
        _fold_slices.remote(fold_fn, empty_out,
                            *[so[b] for so in split_out])
        for b in range(num_buckets)
    ]
    return ray.data.from_arrow_refs(merged)
