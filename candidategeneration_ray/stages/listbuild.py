"""Posting-list assembly: the one all-to-all shuffle of the index build.

Replaces the reference's run files + external k-way merge
(InvertedIndex.flushBuffer :471-498, ExternalSort.massiveBinaryMerge
:91-205, Go binsort WWWMain.java:378) with a single hash shuffle:

  postings → add bucket = hash(key) % num_buckets
           → groupby("bucket")
           → per-bucket vectorized list build (one task per bucket)

A bucket holds MANY keys, so list building is one np.lexsort +
reduceat-style boundary walk per bucket — not one Python call per key.
Each final list row is:

  key:int64, n:int64, docs:binary (delta+varint over sorted doc ids),
  scores:binary (raw little-endian int32, aligned with docs),
  block_max:list<int32> (max quantized score per block of
  `cfg.block_size` postings — the block-max WAND metadata),
  block_last:list<int64> (last doc id per block, the skip table)

Within-list order is doc_id ascending (WAND intersection order); the
reference's impact order (score desc, ExternalSort sort orders
WWW.java:211-258) is recoverable per list by sorting on the decoded
scores, and is exposed by QueryEngine.top_layer() (SURVEY §7.4).

Skew: a pathologically hot key is handled by the partitioned build
(pipelines/build.py), where each input partition contributes a
doc-range-disjoint sub-list and the merge is ordered concatenation —
the "salted two-phase aggregation" of SURVEY §4, with partition id as
the salt.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from candidategeneration_ray.config import EngineConfig

_HASH_MULT = np.uint64(0x9E3779B97F4A7C15)


def bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic int64-key → bucket hash (splitmix-style multiply)."""
    h = keys.astype(np.uint64) * _HASH_MULT
    h ^= h >> np.uint64(29)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def attach_bucket(ds: ray.data.Dataset, num_buckets: int) -> ray.data.Dataset:
    def _b(batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_numpy()
        return batch.append_column("bucket", pa.array(bucket_of(keys, num_buckets), pa.int32()))

    return ds.map_batches(_b, batch_format="pyarrow")


def prune_mask(pk: np.ndarray, docs: np.ndarray, scores: np.ndarray,
               starts: np.ndarray, ends: np.ndarray,
               cfg: EngineConfig) -> np.ndarray:
    """Exact build-time list pruning (reference O3 sampled selection,
    InvertedIndex.java:428-462: keep <=1000/list, first 100
    unconditional, rest above a sampled score threshold). Deterministic
    variant over (key, doc)-sorted postings: per list keep the first
    `unconditional_prefix` postings in doc order plus the best
    (max_list_postings - prefix) of the remainder by (score desc,
    doc asc). Vectorized across the whole bucket — one extra lexsort
    over only the tail postings.

    Safe at every level: applying this mask to any SUBSET of a list
    (a partition's sub-list, a batch) keeps a superset of the global
    keep-set's intersection with that subset — a global-prefix posting
    is within the subset's first `prefix` docs, and a global-top-budget
    tail posting beats all but < budget subset-tail postings — so
    partitioned builds may prune per partition AND at the final merge
    and still produce the exact single-pass result (tested)."""
    n = pk.size
    prefix = cfg.unconditional_prefix
    budget = cfg.max_list_postings - prefix
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, ends - starts)
    keep = pos < prefix
    if budget <= 0:
        return keep
    tail = np.nonzero(~keep)[0]
    if tail.size == 0:
        return keep
    tk = pk[tail]
    ts = scores[tail].astype(np.int64)
    td = docs[tail]
    o = np.lexsort((td, -ts, tk))
    tko = tk[o]
    tstarts = np.concatenate(([0], np.nonzero(tko[1:] != tko[:-1])[0] + 1))
    tcounts = np.diff(np.concatenate((tstarts, [tail.size])))
    rank = np.arange(tail.size, dtype=np.int64) - np.repeat(tstarts, tcounts)
    keep[tail[o[rank < budget]]] = True
    return keep


def build_lists_for_bucket(
    keys: np.ndarray,
    scores: np.ndarray,
    doc_ids: np.ndarray,
    cfg: EngineConfig,
    bucket: int,
) -> pa.Table:
    """Vectorized list build over one bucket's postings."""
    from candidategeneration_ray.functions.codecs import encode_docs

    order = np.lexsort((doc_ids, keys))
    keys = keys[order]
    scores = scores[order]
    doc_ids = doc_ids[order]
    # group boundaries over the sorted keys (no group at all if empty —
    # the task exchange can hand a bucket zero rows)
    if keys.size:
        starts = np.concatenate(([0], np.nonzero(keys[1:] != keys[:-1])[0] + 1))
        ends = np.concatenate((starts[1:], [keys.size]))
    else:
        starts = np.zeros(0, np.int64)
        ends = np.zeros(0, np.int64)
    if cfg.max_list_postings is not None and keys.size:
        keep = prune_mask(keys, doc_ids, scores, starts, ends, cfg)
        keys, scores, doc_ids = keys[keep], scores[keep], doc_ids[keep]
        starts = np.concatenate(([0], np.nonzero(keys[1:] != keys[:-1])[0] + 1))
        ends = np.concatenate((starts[1:], [keys.size]))
    bs = cfg.block_size

    out = {
        "key": keys[starts],
        "n": (ends - starts).astype(np.int64),
        "docs": [],
        "scores": [],
        "block_max": [],
        "block_last": [],
    }
    for s, e in zip(starts, ends):
        d = doc_ids[s:e]
        sc = scores[s:e]
        out["docs"].append(encode_docs(d, cfg.codec))
        out["scores"].append(sc.astype("<i4").tobytes())
        nb = (d.size + bs - 1) // bs
        bm = np.empty(nb, dtype=np.int32)
        bl = np.empty(nb, dtype=np.int64)
        for bi in range(nb):
            bm[bi] = sc[bi * bs:(bi + 1) * bs].max()
            bl[bi] = d[min((bi + 1) * bs, d.size) - 1]
        out["block_max"].append(bm)
        out["block_last"].append(bl)
    return pa.table({
        "key": pa.array(out["key"], pa.int64()),
        "n": pa.array(out["n"], pa.int64()),
        "docs": pa.array(out["docs"], pa.binary()),
        "scores": pa.array(out["scores"], pa.binary()),
        "block_max": pa.array([b.tolist() for b in out["block_max"]], pa.list_(pa.int32())),
        "block_last": pa.array([b.tolist() for b in out["block_last"]], pa.list_(pa.int64())),
        "bucket": pa.array(np.full(len(starts), bucket, dtype=np.int32), pa.int32()),
    })


def merge_partial_lists(
    keys: np.ndarray,
    ns: np.ndarray,
    docs_bin,
    scores_bin,
    cfg: EngineConfig,
    bucket: int,
    tombstones: tuple[np.ndarray, np.ndarray] | None = None,
    src_codec: str = "varint",
    docs_off: np.ndarray | None = None,
) -> pa.Table:
    """Merge per-batch partial-list rows (one per (key, batch)) into
    final lists, fully vectorized across the whole bucket:

      1. one-pass decode of ALL partial blobs (decode_delta_concat),
      2. one global np.lexsort by (key, doc_id) over every posting,
      3. grouped re-encode (encode_delta_grouped) + reduceat block
         metadata — no per-key numpy-call overhead.

    `src_codec`/`docs_off`: codec of the INPUT rows (emission partials
    are always varint; final/generation rows carry cfg.codec, whose bp
    form needs the per-row byte offsets). Output encodes cfg.codec.

    `tombstones` = (starts, ends) sorted disjoint deleted doc-id ranges
    (pipelines.update.delete_docs): tombstoned postings are dropped
    BEFORE pruning/encode, so compaction physically removes deleted
    docs and keys left empty vanish from the segment.
    """
    from candidategeneration_ray.functions.arrowutil import binary_array_from_concat
    from candidategeneration_ray.functions.codecs import (
        decode_docs_concat, encode_docs_grouped_concat,
    )

    ns = np.asarray(ns, dtype=np.int64)
    # 1. bulk-decode every partial row in input order (docs_bin /
    # scores_bin arrive as ONE contiguous payload + offsets — zero-copy
    # views of the Arrow data buffers)
    flat_docs_u, row_off = decode_docs_concat(docs_bin, ns, src_codec,
                                              byte_offsets=docs_off)
    flat_docs = flat_docs_u.astype(np.int64)
    flat_scores = np.frombuffer(scores_bin, dtype="<i4") if isinstance(scores_bin, (bytes, bytearray)) \
        else np.ascontiguousarray(scores_bin, dtype=np.uint8).view("<i4")
    posting_key = np.repeat(keys, ns)

    # 2. global (key, doc) order
    order = np.lexsort((flat_docs, posting_key))
    pk = posting_key[order]
    docs = flat_docs[order]
    scores = flat_scores[order]

    if tombstones is not None and pk.size:
        t_starts, t_ends = tombstones
        idx = np.searchsorted(t_starts, docs, side="right") - 1
        live = np.ones(docs.size, dtype=bool)
        has = idx >= 0
        live[has] = docs[has] >= t_ends[idx[has]]
        if not live.all():
            pk, docs, scores = pk[live], docs[live], scores[live]
        if pk.size == 0:
            return build_lists_for_bucket(
                np.empty(0, np.int64), np.empty(0, np.int32),
                np.empty(0, np.int64), cfg, bucket)

    starts = np.concatenate(([0], np.nonzero(pk[1:] != pk[:-1])[0] + 1))
    ends = np.concatenate((starts[1:], [pk.size]))
    if cfg.max_list_postings is not None and pk.size:
        keep = prune_mask(pk, docs, scores, starts, ends, cfg)
        pk, docs, scores = pk[keep], docs[keep], scores[keep]
        starts = np.concatenate(([0], np.nonzero(pk[1:] != pk[:-1])[0] + 1))
        ends = np.concatenate((starts[1:], [pk.size]))
    out_key = pk[starts]
    out_n = ends - starts

    # 3a. grouped re-encode, again buffer-oriented
    dbuf, doff = encode_docs_grouped_concat(docs, starts, ends, cfg.codec)
    out_docs = binary_array_from_concat(dbuf, doff)
    value_off = np.concatenate((starts, [pk.size])).astype(np.int64)
    out_scores = binary_array_from_concat(
        scores.astype("<i4").view(np.uint8), 4 * value_off)

    # 3b. block metadata via reduceat over per-key block starts
    bs = cfg.block_size
    nb = (out_n + bs - 1) // bs
    block_starts = np.concatenate([
        np.arange(s, e, bs, dtype=np.int64) for s, e in zip(starts, ends)
    ]) if starts.size else np.empty(0, np.int64)
    bmax = np.maximum.reduceat(scores, block_starts) if block_starts.size else np.empty(0, np.int32)
    block_ends = np.minimum(block_starts + bs, np.repeat(ends, nb))
    blast = docs[block_ends - 1] if block_starts.size else np.empty(0, np.int64)
    list_off = np.concatenate(([0], np.cumsum(nb))).astype(np.int32)
    bmax_col = pa.ListArray.from_arrays(pa.array(list_off, pa.int32()),
                                        pa.array(bmax.astype(np.int32), pa.int32()))
    blast_col = pa.ListArray.from_arrays(pa.array(list_off, pa.int32()),
                                         pa.array(blast, pa.int64()))
    return pa.table({
        "key": pa.array(out_key, pa.int64()),
        "n": pa.array(out_n.astype(np.int64), pa.int64()),
        "docs": out_docs,
        "scores": out_scores,
        "block_max": bmax_col,
        "block_last": blast_col,
        "bucket": pa.array(np.full(out_key.size, bucket, dtype=np.int32), pa.int32()),
    })


@ray.remote
def _split_by_bucket(block: pa.Table, nb: int, groups: int):
    """One stable sort by bucket + `groups` zero-copy slices of this
    combiner-output block; group g owns the contiguous bucket range
    [g*nb//groups, (g+1)*nb//groups) (num_returns=groups routes each
    slice straight to its group's merge task — grouping caps the
    object count at blocks x groups instead of blocks x nb, which is
    what dominates tiny local builds)."""
    keys = block.column("key").to_numpy()
    b = bucket_of(keys, nb)
    order = np.argsort(b, kind="stable")
    tbl = block.take(pa.array(order, pa.int64()))
    lo = (np.arange(groups + 1, dtype=np.int64) * nb) // groups
    bounds = np.searchsorted(b[order], lo)
    return tuple(tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
                 for i in range(groups))


@ray.remote
def _merge_bucket_slices(blo: int, bhi: int, nb: int, cfg: EngineConfig,
                         *slices: pa.Table) -> pa.Table:
    """Fold every bucket in [blo, bhi): one merge_partial_lists call
    per non-empty bucket, concatenated. Buckets arrive pre-sorted by
    bucket id inside each slice, so per-bucket rows are contiguous
    after ONE argsort over the concatenated bucket ids."""
    from candidategeneration_ray.functions.arrowutil import binary_column_concat

    live = [s for s in slices if s.num_rows]
    if not live:
        return build_lists_for_bucket(
            np.empty(0, np.int64), np.empty(0, np.int32),
            np.empty(0, np.int64), cfg, blo)
    tb = pa.concat_tables(live)
    keys_all = tb.column("key").to_numpy().astype(np.int64)
    bk = bucket_of(keys_all, nb)
    order = np.argsort(bk, kind="stable")
    tb = tb.take(pa.array(order, pa.int64()))
    bk = bk[order]
    outs = []
    bounds = np.searchsorted(bk, np.arange(blo, bhi + 1))
    for i, bucket in enumerate(range(blo, bhi)):
        part = tb.slice(bounds[i], bounds[i + 1] - bounds[i])
        if part.num_rows == 0:
            continue
        docs_data, _ = binary_column_concat(part.column("docs"))
        scores_data, _ = binary_column_concat(part.column("scores"))
        outs.append(merge_partial_lists(
            part.column("key").to_numpy().astype(np.int64),
            part.column("n").to_numpy().astype(np.int64),
            docs_data, scores_data, cfg, bucket))
    if not outs:
        return build_lists_for_bucket(
            np.empty(0, np.int64), np.empty(0, np.int32),
            np.empty(0, np.int64), cfg, blo)
    return outs[0] if len(outs) == 1 else pa.concat_tables(outs)


def build_posting_lists(postings: ray.data.Dataset,
                        cfg: EngineConfig | None = None,
                        exchange: str = "tasks") -> ray.data.Dataset:
    """postings → posting-list dataset (see module doc).

    Accepts either raw posting rows (key, score, doc_id) or the
    combiner's partial-list rows (key, n, docs, scores).

    Partial-list input takes the task-routed bucket exchange: each
    combiner block is split into per-bucket zero-copy slices
    (num_returns fan-out) and ONE task per bucket folds its slices —
    the same all-to-all as groupby(bucket) minus Ray's sort machinery
    (measured on the 8.8M-partial bench build: 5.4 s -> 4.6 s for the
    emission phase; the Sort op spent 3.7 s wall on ~2 cpu-s of
    work). The fold is order-insensitive (merge re-sorts each key's
    postings), so the result is identical to the groupby plan —
    byte-identity is pytest-forced. Raw posting rows keep the
    groupby(bucket) route (cold path, used by small family builds)."""
    cfg = cfg or EngineConfig()
    partial = "docs" in postings.schema().names
    if partial and exchange == "tasks":
        nb = cfg.num_buckets
        refs = postings.to_arrow_refs()
        if not refs:
            return ray.data.from_arrow(
                [build_lists_for_bucket(
                    np.empty(0, np.int64), np.empty(0, np.int32),
                    np.empty(0, np.int64), cfg, 0)])
        if nb == 1:   # no routing needed: one fold over all
            return ray.data.from_arrow_refs(
                [_merge_bucket_slices.remote(0, 1, 1, ray.put(cfg),
                                             *refs)])
        # merge-task count: one per CPU-ish, each folding a contiguous
        # bucket range — parallelism without blocks x nb tiny objects
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        groups = max(1, min(nb, cpus))
        split_out = [
            _split_by_bucket.options(num_returns=groups).remote(
                r, nb, groups)
            for r in refs]
        if groups == 1:
            split_out = [[s] for s in split_out]
        cfg_ref = ray.put(cfg)
        lo = [(g * nb) // groups for g in range(groups + 1)]
        merged = [
            _merge_bucket_slices.remote(lo[g], lo[g + 1], nb, cfg_ref,
                                        *[so[g] for so in split_out])
            for g in range(groups)
        ]
        return ray.data.from_arrow_refs(merged)
    bucketed = attach_bucket(postings, cfg.num_buckets)

    def _build(group: pa.Table) -> pa.Table:
        keys = group.column("key").to_numpy()
        if keys.size == 0:
            return build_lists_for_bucket(
                keys, np.empty(0, np.int32), np.empty(0, np.int64), cfg, 0
            )
        bucket = int(group.column("bucket")[0].as_py())
        if partial:
            from candidategeneration_ray.functions.arrowutil import binary_column_concat

            docs_data, _ = binary_column_concat(group.column("docs"))
            scores_data, _ = binary_column_concat(group.column("scores"))
            return merge_partial_lists(
                keys.astype(np.int64),
                group.column("n").to_numpy().astype(np.int64),
                docs_data,
                scores_data,
                cfg,
                bucket,
            )
        return build_lists_for_bucket(
            keys.astype(np.int64),
            group.column("score").to_numpy().astype(np.int32),
            group.column("doc_id").to_numpy().astype(np.int64),
            cfg,
            bucket,
        )

    return bucketed.groupby("bucket").map_groups(_build, batch_format="pyarrow")
