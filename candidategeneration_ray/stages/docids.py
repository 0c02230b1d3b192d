"""Stable doc-id assignment by (conv_id asc, turn_idx asc) rank.

The reference consumes externally assigned sequential doc ids (docInfo
field 1, InvertedIndex.java:140); our transcript analog derives them as
a PURE FUNCTION of the data, never of execution order (resume/retry
determinism, SURVEY §7.4):

    doc_id = conv_base_offset[conv_id] + turn_idx

where conv_base_offset is the cumulative turn count over conv_ids in
ascending order. Validity requires turn_idx to be dense 0..T-1 within
each conversation — validated during the offsets aggregate.

Scale note: the offsets map is one row per conversation. On a real
cluster with ~10^11 conversations the dict-broadcast below is replaced
by range-partitioning conv_ids, computing per-partition turn counts
(tiny), prefix-summing the per-partition bases on the driver, and
broadcasting only partition bases + doing a partition-local rank; the
doc_id values produced are identical. The function boundary
(`conv_offsets` → mapping, `attach_doc_ids` → map_batches) is the same
in both variants.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def conv_offsets(ds: ray.data.Dataset) -> dict:
    """Aggregate per-conversation turn stats and build base offsets.

    Returns {"conv_ids": sorted np array, "bases": int64 np array,
    "n_docs": int}. Raises if turn_idx is not dense 0..T-1 per conv.
    """
    from ray.data.aggregate import Count, Max, Min

    agg = (
        ds.select_columns(["conv_id", "turn_idx"])
        .groupby("conv_id")
        .aggregate(
            Count(alias_name="n_turns"),
            Min("turn_idx", alias_name="min_t"),
            Max("turn_idx", alias_name="max_t"),
        )
    )
    pdf = agg.to_pandas()  # one row per conversation (small relative to turns)
    pdf = pdf.sort_values("conv_id").reset_index(drop=True)
    if not ((pdf["min_t"] == 0).all() and (pdf["max_t"] == pdf["n_turns"] - 1).all()):
        bad = pdf[(pdf["min_t"] != 0) | (pdf["max_t"] != pdf["n_turns"] - 1)]
        raise ValueError(
            f"turn_idx not dense 0..T-1 for {len(bad)} conversations, "
            f"e.g. {bad['conv_id'].iloc[0]!r}"
        )
    counts = pdf["n_turns"].to_numpy(np.int64)
    bases = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return {
        "conv_ids": pdf["conv_id"].to_numpy(),  # sorted ascending
        "bases": bases,
        "counts": counts,
        "n_docs": int(counts.sum()),
    }


def remap_doc_ids(ds: ray.data.Dataset, mapping_ref,
                  column: str = "doc_id") -> ray.data.Dataset:
    """Apply an old→new doc-id mapping to a dataset column (M11,
    utilsClass.java:398-436: the reference reads a CSV remap and
    rewrites postings). mapping_ref is a ray.put of {"old": sorted
    int64 array, "new": int64 array}; lookup is a broadcast
    searchsorted — no shuffle. Ids absent from the map pass through."""

    def _remap(batch: pa.Table, *, _c={}) -> pa.Table:
        if "m" not in _c:
            _c["m"] = ray.get(mapping_ref) if not isinstance(mapping_ref, dict) else mapping_ref
        m = _c["m"]
        old = batch.column(column).to_numpy().astype(np.int64)
        pos = np.searchsorted(m["old"], old)
        pos = np.minimum(pos, len(m["old"]) - 1)
        hit = m["old"][pos] == old
        new = np.where(hit, m["new"][pos], old)
        i = batch.schema.get_field_index(column)
        return batch.set_column(i, column, pa.array(new, pa.int64()))

    return ds.map_batches(_remap, batch_format="pyarrow")


def attach_doc_ids(ds: ray.data.Dataset, offsets_ref) -> ray.data.Dataset:
    """Add int64 `doc_id` column via broadcast offsets (zero shuffle).

    `offsets_ref` is a ray.put() handle of conv_offsets(...)'s result.
    """

    def _assign(batch: pa.Table, *, _cache={}) -> pa.Table:
        if "off" not in _cache:
            _cache["off"] = ray.get(offsets_ref)
        off = _cache["off"]
        convs = batch.column("conv_id").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(off["conv_ids"], convs)
        doc_id = off["bases"][idx] + batch.column("turn_idx").to_numpy().astype(np.int64)
        return batch.append_column("doc_id", pa.array(doc_id, pa.int64()))

    return ds.map_batches(_assign, batch_format="pyarrow")
