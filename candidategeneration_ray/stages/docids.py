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


def _conv_partials(batch: pa.Table) -> pa.Table:
    """Per-batch (conv_id, n_turns, min_t, max_t) partials — the groupby
    shuffle moves ~one row per (conv, batch) instead of one per turn."""
    conv = batch.column("conv_id").combine_chunks().dictionary_encode()
    codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turns = batch.column("turn_idx").to_numpy().astype(np.int64)
    order = np.argsort(codes, kind="stable")
    sc, st = codes[order], turns[order]
    starts = np.concatenate(([0], np.nonzero(sc[1:] != sc[:-1])[0] + 1))
    counts = np.diff(np.concatenate((starts, [sc.size])))
    names = np.asarray(conv.dictionary.to_pylist(), dtype=object)[sc[starts]]
    return pa.table({
        "conv_id": pa.array(names.tolist(), pa.string()),
        "n_turns": pa.array(counts, pa.int64()),
        "min_t": pa.array(np.minimum.reduceat(st, starts), pa.int64()),
        "max_t": pa.array(np.maximum.reduceat(st, starts), pa.int64()),
    })


def conv_offsets(ds: ray.data.Dataset, num_buckets: int = 64) -> dict:
    """Aggregate per-conversation turn stats and build base offsets.

    Returns {"conv_ids": sorted np array, "bases": int64 np array,
    "n_docs": int}. Raises if turn_idx is not dense 0..T-1 per conv.

    `num_buckets` sizes the per-conv fold (task-routed exchange);
    build_index passes a size-derived count (16 for sub-256 MB local
    inputs — measured fastest — else bytes-derived)."""
    def _bucketize(batch: pa.Table) -> pa.Table:
        import pandas as pd

        names = np.asarray(batch.column("conv_id").to_pylist(),
                           dtype=object)
        b = (pd.util.hash_array(names)
             % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("cbucket", pa.array(b))

    def _fold(group: pa.Table) -> pa.Table:
        """Bucket-local exact fold — one row per conversation. The
        int-bucket groupby + vectorized fold replaces the string-key
        sort aggregate (measured 4.2 s -> ~1.5 s on the headline
        stats phase)."""
        import pandas as pd

        names = np.asarray(group.column("conv_id").to_pylist(),
                           dtype=object)
        n = group.column("n_turns").to_numpy().astype(np.int64)
        mn = group.column("min_t").to_numpy().astype(np.int64)
        mx = group.column("max_t").to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(names)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        starts = np.concatenate(
            ([0], np.nonzero(sc[1:] != sc[:-1])[0] + 1))
        return pa.table({
            "conv_id": pa.array(
                np.asarray(uniq, dtype=object)[sc[starts]].tolist(),
                pa.string()),
            "n_turns": pa.array(
                np.bincount(codes, weights=n, minlength=uniq.size)
                .astype(np.int64)[sc[starts]], pa.int64()),
            "min_t": pa.array(
                np.minimum.reduceat(mn[order], starts), pa.int64()),
            "max_t": pa.array(
                np.maximum.reduceat(mx[order], starts), pa.int64()),
        })

    from candidategeneration_ray.functions.exchange import fold_by_bucket

    agg = fold_by_bucket(
        ds.select_columns(["conv_id", "turn_idx"])
        .map_batches(lambda b: _bucketize(_conv_partials(b)),
                     batch_format="pyarrow"),
        "cbucket", _fold, num_buckets,
        pa.table({"conv_id": pa.array([], pa.string()),
                  "n_turns": pa.array([], pa.int64()),
                  "min_t": pa.array([], pa.int64()),
                  "max_t": pa.array([], pa.int64())}))
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


def conv_offsets_scalable(ds: ray.data.Dataset, num_blocks: int = 64) -> dict:
    """Cluster-scale variant of conv_offsets: the conversation→offset
    mapping never materializes on the driver.

    1. groupby(conv_id) turn counts (+ density validation aggregates),
    2. distributed sort by conv_id, repartitioned into `num_blocks`
       range blocks that stay in the OBJECT STORE (ray.put refs),
    3. driver holds only per-block metadata: first conv_id and base
       offset (prefix sum of block totals) — num_blocks rows, O(KB)
       regardless of conversation count.

    attach_doc_ids_scalable then resolves conv_id → base by
    searchsorted over the block boundaries (broadcast, tiny) and pulls
    ONLY the 1-2 mapping blocks its batch's conv range touches — a
    range-partitioned broadcast join, the standard replacement for a
    driver-side dict at 10^11+ conversations.
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
        .sort("conv_id")
        .repartition(num_blocks)
    )
    mat = agg.materialize()
    block_refs = list(mat.get_internal_block_refs())

    @ray.remote
    def _meta(block) -> tuple:
        t = block if hasattr(block, "column") else block.to_arrow()
        if t.num_rows == 0:
            return None
        counts = t.column("n_turns").to_numpy().astype(np.int64)
        if not ((t.column("min_t").to_numpy() == 0).all()
                and (t.column("max_t").to_numpy() == counts - 1).all()):
            raise ValueError("turn_idx not dense 0..T-1 within conversations")
        return (t.column("conv_id")[0].as_py(), int(counts.sum()))

    metas = ray.get([_meta.remote(b) for b in block_refs])
    keep = [(r, m) for r, m in zip(block_refs, metas) if m is not None]
    totals = np.array([m[1] for _, m in keep], dtype=np.int64)
    bases = np.concatenate(([0], np.cumsum(totals)[:-1]))
    return {
        "block_refs": [r for r, _ in keep],
        "block_first_conv": np.array([m[0] for _, m in keep], dtype=object),
        "block_bases": bases,
        "n_docs": int(totals.sum()),
        "_mat": mat,  # keep the materialized mapping alive
    }


def attach_doc_ids_scalable(ds: ray.data.Dataset, offsets: dict) -> ray.data.Dataset:
    """doc_id assignment against the range-blocked offset mapping from
    conv_offsets_scalable — identical ids to attach_doc_ids (tested)."""
    block_refs = offsets["block_refs"]
    firsts = offsets["block_first_conv"]
    block_bases = offsets["block_bases"]

    def _assign(batch: pa.Table, *, _cache={}) -> pa.Table:
        convs = np.asarray(batch.column("conv_id").to_pylist(), dtype=object)
        doc_id = np.empty(len(convs), dtype=np.int64)
        # which mapping blocks does this batch touch?
        block_idx = np.searchsorted(firsts, convs, side="right") - 1
        for bi in np.unique(block_idx):
            if bi not in _cache:
                t = ray.get(block_refs[bi])
                t = t if hasattr(t, "column") else t.to_arrow()
                counts = t.column("n_turns").to_numpy().astype(np.int64)
                local = np.concatenate(([0], np.cumsum(counts)[:-1]))
                _cache[bi] = {
                    "conv_ids": np.asarray(t.column("conv_id").to_pylist(), dtype=object),
                    "bases": block_bases[bi] + local,
                }
            blk = _cache[bi]
            rows = block_idx == bi
            pos = np.searchsorted(blk["conv_ids"], convs[rows])
            doc_id[rows] = blk["bases"][pos]
        doc_id += batch.column("turn_idx").to_numpy().astype(np.int64)
        return batch.append_column("doc_id", pa.array(doc_id, pa.int64()))

    return ds.map_batches(_assign, batch_format="pyarrow")


def rank_prior_scalable(ds: ray.data.Dataset, by: str = "n_chars",
                        num_blocks: int = 64) -> tuple[dict, object]:
    """Distributed static-prior rank (the HIT-family prior, J6): rank
    every doc by (`by` desc, doc_id asc), 1-based, without the corpus
    ever touching the driver. The reference loads HITS[docID] from a
    precomputed file (utilsClass.java:251-263) — this is that
    precomputation as a Ray pipeline:

      1. distributed sort by (`by` desc, doc_id asc); per-block row
         counts (tiny remote calls) prefix-sum into block base ranks on
         the driver — num_blocks scalars, O(KB) at any corpus size;
      2. per-block rank emission (base + arange) as object-store Arrow
         blocks, re-sorted by doc_id into `num_blocks` range blocks;
      3. the returned prior dict holds only block refs + per-block
         first doc_id; PostingEmitter's blocked-prior mode pulls the
         1-2 blocks each batch touches (same range-partitioned
         broadcast-join shape as attach_doc_ids_scalable).

    Ranks are int32 to match the index score column; a corpus beyond
    2^31 docs needs the score format widened first.

    Returns (prior_dict, keepalive) — hold `keepalive` until every
    pipeline consuming the prior has executed (it owns the
    materialized object-store blocks).
    """
    sorted_ds = (
        ds.select_columns([by, "doc_id"])
        .sort([by, "doc_id"], descending=[True, False])
        .materialize()
    )
    refs = list(sorted_ds.get_internal_block_refs())

    @ray.remote
    def _count(block) -> int:
        t = block if hasattr(block, "column") else block.to_arrow()
        return t.num_rows

    counts = np.array(ray.get([_count.remote(r) for r in refs]), dtype=np.int64)
    bases = np.concatenate(([0], np.cumsum(counts)[:-1]))

    @ray.remote
    def _rank(block, base: int) -> pa.Table:
        t = block if hasattr(block, "column") else block.to_arrow()
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "rank": pa.array(
                base + np.arange(1, t.num_rows + 1, dtype=np.int64), pa.int32()),
        })

    rank_refs = [_rank.remote(r, int(b)) for r, b, c in zip(refs, bases, counts) if c]
    ranked = (
        ray.data.from_arrow_refs(rank_refs)
        .sort("doc_id")
        .repartition(num_blocks)
        .materialize()
    )
    block_refs = list(ranked.get_internal_block_refs())

    @ray.remote
    def _first(block):
        t = block if hasattr(block, "column") else block.to_arrow()
        return None if t.num_rows == 0 else int(t.column("doc_id")[0].as_py())

    firsts = ray.get([_first.remote(r) for r in block_refs])
    keep = [(r, f) for r, f in zip(block_refs, firsts) if f is not None]
    prior = {
        "block_refs": [r for r, _ in keep],
        "block_first_doc": np.array([f for _, f in keep], dtype=np.int64),
    }
    return prior, ranked


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


def blocked_prefix_apply(ds_sorted: ray.data.Dataset, num_blocks: int,
                         total_fn, emit_fn,
                         combine: str = "sum") -> ray.data.Dataset:
    """The range-blocked global prefix-SCAN pattern, factored once (the
    scaffolding conv_offsets_scalable / rank_prior_scalable /
    token_offsets / order_global_rank / peak_concurrency / late_events
    all share): a SORTED dataset is split into `num_blocks`
    order-preserving blocks that stay in the object store;
    `total_fn(table) -> int` extracts each block's contribution, the
    driver holds ONLY the O(num_blocks) totals and their EXCLUSIVE
    prefix under `combine` ("sum" → running totals base 0, "max" →
    running maxima base -2^62 — any associative scan fits the shape),
    and `emit_fn(table, base) -> pa.Table` finishes each block in
    parallel with its global base. No driver materialization, no
    sequential scan.

    Correctness leans on Ray Data preserving block order through
    repartition of a sorted dataset — the one assumption, audited
    here and tested by the callers' block-count-invariance tests."""
    mat = ds_sorted.repartition(num_blocks).materialize()
    block_refs = list(mat.get_internal_block_refs())

    def _as_table(block) -> pa.Table:
        return block if hasattr(block, "column") else block.to_arrow()

    @ray.remote
    def _total(block) -> int:
        return int(total_fn(_as_table(block)))

    totals = np.array(ray.get([_total.remote(b) for b in block_refs]),
                      np.int64)
    if combine == "sum":
        bases = np.concatenate(([0], np.cumsum(totals)[:-1]))
    elif combine == "max":
        ident = np.int64(-(1 << 62))
        bases = np.concatenate(
            ([ident], np.maximum.accumulate(totals)[:-1]))
    else:
        raise ValueError(f"unknown combine {combine!r}")

    @ray.remote
    def _emit(block, base: int) -> pa.Table:
        return emit_fn(_as_table(block), int(base))

    refs = [_emit.remote(b, int(base))
            for b, base in zip(block_refs, bases)]
    return ray.data.from_arrow_refs(refs)
