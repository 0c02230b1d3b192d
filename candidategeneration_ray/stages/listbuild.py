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


def build_lists_for_bucket(
    keys: np.ndarray,
    scores: np.ndarray,
    doc_ids: np.ndarray,
    cfg: EngineConfig,
    bucket: int,
) -> pa.Table:
    """Vectorized list build over one bucket's postings."""
    from candidategeneration_ray.functions.varint import encode_delta

    order = np.lexsort((doc_ids, keys))
    keys = keys[order]
    scores = scores[order]
    doc_ids = doc_ids[order]
    # group boundaries over the sorted keys
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
        out["docs"].append(encode_delta(d))
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


def build_posting_lists(postings: ray.data.Dataset, cfg: EngineConfig | None = None) -> ray.data.Dataset:
    """postings(key, score, doc_id) → posting-list dataset (see module doc)."""
    cfg = cfg or EngineConfig()
    bucketed = attach_bucket(postings, cfg.num_buckets)

    def _build(group: dict) -> pa.Table:
        keys = np.asarray(group["key"], dtype=np.int64)
        if keys.size == 0:
            return build_lists_for_bucket(
                keys, np.empty(0, np.int32), np.empty(0, np.int64), cfg, 0
            )
        return build_lists_for_bucket(
            keys,
            np.asarray(group["score"], dtype=np.int32),
            np.asarray(group["doc_id"], dtype=np.int64),
            cfg,
            int(group["bucket"][0]),
        )

    return bucketed.groupby("bucket").map_groups(_build, batch_format="numpy")
