"""Positional index family + exact phrase queries.

The reference's index is docid+score only; its d-window PAIR keys
(InvertedIndex.java:246-287) prove proximity but cannot answer "exact
phrase" — the standard fulltext extension is a positional family that
stores, per (term, doc), the ascending kept-token positions. This
module builds that family with the SAME architecture as the unigram /
bigram / HIT families (pipelines/docquery.py): batch-global vectorized
emission -> ONE bucketed shuffle -> bucket-parallel merged segments
cached under a manifest.

On-disk layout (one row per term key, doc-ordered):
    key     int64   1-based term id (the shared dictionary)
    n       int64   number of docs
    docs    binary  delta+varint doc ids (ascending)
    counts  binary  varint positions-per-doc, aligned with docs
    pos     binary  concat of per-doc delta+varint position lists
    bucket  int32   hash bucket (the serving-time pruning key)

Positions are 1-based ranks within the KEPT token stream (stopwords
and rejected tokens removed before ranking) — adjacency therefore
means "adjacent among indexed terms", the usual semantics for a
stopworded positional index.

Scale notes (100 TB): emission is embarrassingly parallel and adds
~1-2 bytes/token over the docid index; the single shuffle is the same
bucketed exchange the main index uses; a phrase query reads ONLY the
buckets holding its terms' keys (parquet predicate pushdown on the
`bucket`/`key` columns) and the intersection cost is bounded by the
rarest term's posting bytes. Each phrase runs as its own Ray task, so
a query trace fans out across the cluster.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from candidategeneration_ray.config import EngineConfig
from candidategeneration_ray.functions.arrowutil import (
    binary_array_from_concat, binary_column_concat,
)
from candidategeneration_ray.functions.tokenize import tokenize_text
from candidategeneration_ray.functions.varint import (
    decode_delta_concat, encode_delta_grouped,
    encode_delta_grouped_concat, varint_decode, varint_encode,
)
from candidategeneration_ray.pipelines.docquery import (
    _cache_dir, corpus_stats, doc_tokens,
)
from candidategeneration_ray.stages.listbuild import attach_bucket, bucket_of

# positions pack into the low bits of (doc_id << POS_BITS | pos); the
# emitter asserts doc_len and doc_id stay within their fields.
POS_BITS = 20

# Fixed phrase trace (same role as DOC_QUERIES): common bigrams, a rare
# trigram, a repeated-term phrase, and an unmapped phrase that must
# produce zero rows.
PHRASE_QUERIES: list[tuple[int, str]] = [
    (0, "part filter"),
    (1, "order sort"),
    (2, "table hash"),
    (3, "query join"),
    (4, "filter hash table"),
    (5, "customer join"),
    (6, "order order"),     # repeated term — self-shifted intersection
    (7, "zzzq qqqz"),       # unmapped terms → no rows
]


class _PositionalEmitter:
    """map_batches callable: tokens -> (key, doc_id, npos, pos) rows.

    Batch-global: one dictionary-encode for token->id, one lexsort for
    (doc, term) grouping, one grouped delta+varint encode for ALL
    position lists. Dictionary broadcast once via ray.put, fetched per
    actor/worker on first batch (PostingEmitter's pattern,
    stages/postings.py:69-104)."""

    def __init__(self, terms_ref):
        t = ray.get(terms_ref) if not isinstance(terms_ref, np.ndarray) else terms_ref
        self.terms = t  # sorted ascending; id = index + 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("tokens").combine_chunks()
        offsets = col.offsets.to_numpy().astype(np.int64)
        base = offsets[0]
        lens = np.diff(offsets)
        flat_strs = col.values
        if flat_strs.offset != 0 or len(flat_strs) != (offsets[-1] - base):
            flat_strs = flat_strs.slice(0, len(flat_strs))
        n_tok = len(flat_strs)
        if n_tok == 0:
            return pa.table({
                "key": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "npos": pa.array([], pa.int32()),
                "pos": pa.array([], pa.binary()),
            })
        denc = flat_strs.dictionary_encode()
        uniq = np.asarray(denc.dictionary.to_pylist(), dtype=object)
        loc = np.searchsorted(self.terms, uniq)
        uniq_ids = loc.astype(np.int64) + 1  # corpus tokens always resolve
        indices = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        flat_ids = uniq_ids[indices]

        doc_ids = batch.column("doc_id").to_numpy().astype(np.int64)
        didx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        # 1-based position within the doc's kept-token stream
        positions = np.arange(n_tok, dtype=np.int64) \
            - np.repeat(np.cumsum(lens) - lens, lens) + 1
        # 64 slots of headroom so proximity windows (a + window) never
        # roll into the next doc's packed range
        if lens.max(initial=0) >= (1 << POS_BITS) - 64:
            raise ValueError(
                f"doc_len {lens.max()} exceeds the {POS_BITS}-bit position "
                "field; raise POS_BITS for this corpus")

        # (doc, term) groups; lexsort is stable so positions stay ascending
        order = np.lexsort((flat_ids, didx))
        sd, si = didx[order], flat_ids[order]
        new_grp = np.concatenate(([True], (sd[1:] != sd[:-1]) | (si[1:] != si[:-1])))
        gstart = np.nonzero(new_grp)[0]
        gend = np.concatenate((gstart[1:], [n_tok]))
        blobs = encode_delta_grouped(positions[order], gstart, gend)
        return pa.table({
            "key": pa.array(si[gstart], pa.int64()),
            "doc_id": pa.array(doc_ids[sd[gstart]], pa.int64()),
            "npos": pa.array((gend - gstart).astype(np.int32), pa.int32()),
            "pos": pa.array(blobs, pa.binary()),
        })


def _merge_bucket(group: pa.Table) -> pa.Table:
    """One bucket's (key, doc, npos, pos) rows -> one row per key.

    A (key, doc) pair exists in exactly one emission row (a doc lives
    in one batch), so the merge is a pure regroup: one lexsort by
    (key, doc), grouped docs re-encode, and a byte-gather that
    concatenates each key's per-doc position blobs in doc order —
    no per-key Python loop."""
    keys = group.column("key").to_numpy().astype(np.int64)
    if keys.size == 0:
        return pa.table({
            "key": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
            "docs": pa.array([], pa.binary()), "counts": pa.array([], pa.binary()),
            "pos": pa.array([], pa.binary()),
            "bucket": pa.array([], pa.int32()),
        })
    bucket = int(group.column("bucket")[0].as_py())
    docs = group.column("doc_id").to_numpy().astype(np.int64)
    npos = group.column("npos").to_numpy().astype(np.int64)
    payload, offs = binary_column_concat(group.column("pos"))

    order = np.lexsort((docs, keys))
    k, d, c = keys[order], docs[order], npos[order]
    kstart = np.concatenate(([0], np.nonzero(k[1:] != k[:-1])[0] + 1))
    kend = np.concatenate((kstart[1:], [k.size]))

    dbuf, doff = encode_delta_grouped_concat(d, kstart, kend)
    out_docs = binary_array_from_concat(dbuf, doff)

    # counts column: varint(npos) back-to-back, split at key boundaries
    cbytes = np.asarray(
        np.frombuffer(varint_encode(c), dtype=np.uint8))
    # per-value byte size, same rule as varint_encode's sizing pass
    v = c.astype(np.uint64)
    csz = np.ones(c.size, dtype=np.int64)
    for kb in range(1, 10):
        csz += (v >= np.uint64(1) << np.uint64(7 * kb)).astype(np.int64)
    cum = np.concatenate(([0], np.cumsum(csz)))
    out_counts = binary_array_from_concat(
        cbytes, cum[np.concatenate((kstart, [c.size]))])

    # pos column: gather per-row blobs into key order without per-row copies
    row_lens = np.diff(offs)
    new_starts = offs[:-1][order]
    new_lens = row_lens[order]
    out_off = np.concatenate(([0], np.cumsum(new_lens)))
    total = int(out_off[-1])
    gather = np.repeat(new_starts - out_off[:-1], new_lens) \
        + np.arange(total, dtype=np.int64)
    out_payload = payload[gather] if total else np.empty(0, np.uint8)
    out_pos = binary_array_from_concat(
        out_payload, out_off[np.concatenate((kstart, [k.size]))])

    return pa.table({
        "key": pa.array(k[kstart], pa.int64()),
        "n": pa.array((kend - kstart).astype(np.int64), pa.int64()),
        "docs": out_docs,
        "counts": out_counts,
        "pos": out_pos,
        "bucket": pa.array(np.full(kstart.size, bucket, dtype=np.int32), pa.int32()),
    })


def build_positional_family(sf_dir: str, cfg: EngineConfig | None = None) -> dict:
    """Build (or reuse) the positional family over `documents`."""
    from candidategeneration_ray.state import checkpoint as ckpt

    cfg = cfg or EngineConfig()
    stats = corpus_stats(sf_dir)
    fam_dir = _cache_dir(sf_dir, f"pos-{cfg.index_tag()}")
    final = os.path.join(fam_dir, "final")
    src = os.path.join(sf_dir, "documents.parquet")
    if ckpt.is_complete(final, [src]):
        return {"final_dir": final, "stats": stats}
    ckpt.clear_stale(final)

    terms_ref = ray.put(np.asarray(stats["terms"], dtype=object))
    rows = doc_tokens(sf_dir).map_batches(
        _PositionalEmitter, fn_constructor_args=(terms_ref,),
        batch_format="pyarrow", concurrency=(1, 8),
    )
    lists = attach_bucket(rows, cfg.num_buckets) \
        .groupby("bucket").map_groups(_merge_bucket, batch_format="pyarrow")
    os.makedirs(final, exist_ok=True)
    lists.write_parquet(final)
    ckpt.write_manifest(final, {"phase": "positional-family", "inputs": [src],
                                "cfg": cfg.index_tag()})
    return {"final_dir": final, "stats": stats}


def phrase_term_ids(stats: dict, phrase: str) -> list[int] | None:
    """Tokenize a phrase with the indexing tokenizer and map to term
    ids; None if any token is outside the dictionary (no match)."""
    terms = np.asarray(stats["terms"], dtype=object)
    toks = tokenize_text(phrase)
    if not toks:
        return None
    ids = []
    for t in toks:
        i = int(np.searchsorted(terms, t))
        if i >= terms.size or terms[i] != t:
            return None
        ids.append(i + 1)
    return ids


@ray.remote
def _phrase_task(final_dir: str, phrase_id: int, tids: list[int],
                 num_buckets: int) -> pa.Table:
    """Serve one phrase: bucket/key-pruned segment read, then packed
    (doc << POS_BITS | pos) sorted-set intersection with per-term
    shifts — occurrence p matches iff p+i is a position of term i for
    every i. Overlapping occurrences count (standard phrase TF)."""
    import pyarrow.parquet as pq

    empty = pa.table({
        "phrase_id": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.int64()),
        "n_occurrences": pa.array([], pa.int64()),
    })
    uniq_tids = sorted(set(tids))
    buckets = np.unique(
        bucket_of(np.asarray(uniq_tids, np.int64), num_buckets)).tolist()
    t = pq.read_table(
        sorted(glob.glob(os.path.join(final_dir, "*.parquet"))),
        filters=[("bucket", "in", buckets), ("key", "in", uniq_tids)],
        columns=["key", "docs", "counts", "pos"],
    )
    packed: dict[int, np.ndarray] = {}
    for row in range(t.num_rows):
        key = int(t.column("key")[row].as_py())
        counts = varint_decode(t.column("counts")[row].as_py()).astype(np.int64)
        docs = decode_delta_concat(
            t.column("docs")[row].as_py(), np.array([counts.size]))[0].astype(np.int64)
        posv, _ = decode_delta_concat(t.column("pos")[row].as_py(), counts)
        if docs.size and int(docs.max()) >= (1 << (62 - POS_BITS)):
            raise ValueError("doc_id exceeds the packed field")
        packed[key] = (np.repeat(docs, counts) << POS_BITS) | posv.astype(np.int64)
    if any(tid not in packed for tid in tids):
        return empty
    s = packed[tids[0]]
    for i, tid in enumerate(tids[1:], 1):
        s = np.intersect1d(s, packed[tid] - i, assume_unique=True)
        if s.size == 0:
            return empty
    d, occ = np.unique(s >> POS_BITS, return_counts=True)
    return pa.table({
        "phrase_id": pa.array(np.full(d.size, phrase_id, np.int64), pa.int64()),
        "doc_id": pa.array(d, pa.int64()),
        "n_occurrences": pa.array(occ.astype(np.int64), pa.int64()),
    })


# Proximity trace: every term must fall inside one W-wide kept-token
# window (the query-time generalization of the reference's d-window
# PAIR keys, InvertedIndex.java:246-287 — there the windows are baked
# into index keys at d=5; here they're evaluated from positions).
PROX_W = 6
PROX_QUERIES: list[tuple[int, str]] = [
    (0, "query join"),
    (1, "customer window merge"),
    (2, "stream filter hash"),
    (3, "vector spark data"),
    (4, "table scan"),
    (5, "zzzq table"),       # unmapped term → no rows
]


@ray.remote
def _proximity_task(final_dir: str, query_id: int, tids: list[int],
                    window: int, num_buckets: int) -> pa.Table:
    """One proximity query: every distinct term must have a position
    in [a, a+window) for some anchor position a (any term's position —
    a satisfying window's minimum is always an anchor, so anchors are
    complete). n_anchors counts the satisfying anchors per doc. Same
    pruned read + packed-position machinery as _phrase_task; the
    searchsorted range tests run over ALL docs' anchors at once."""
    import pyarrow.parquet as pq

    empty = pa.table({
        "query_id": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.int64()),
        "n_anchors": pa.array([], pa.int64()),
    })
    uniq_tids = sorted(set(tids))
    buckets = np.unique(
        bucket_of(np.asarray(uniq_tids, np.int64), num_buckets)).tolist()
    t = pq.read_table(
        sorted(glob.glob(os.path.join(final_dir, "*.parquet"))),
        filters=[("bucket", "in", buckets), ("key", "in", uniq_tids)],
        columns=["key", "docs", "counts", "pos"],
    )
    packed: dict[int, np.ndarray] = {}
    for row in range(t.num_rows):
        key = int(t.column("key")[row].as_py())
        counts = varint_decode(t.column("counts")[row].as_py()).astype(np.int64)
        docs = decode_delta_concat(
            t.column("docs")[row].as_py(), np.array([counts.size]))[0].astype(np.int64)
        posv, _ = decode_delta_concat(t.column("pos")[row].as_py(), counts)
        packed[key] = (np.repeat(docs, counts) << POS_BITS) | posv.astype(np.int64)
    if any(tid not in packed for tid in uniq_tids):
        return empty
    anchors = np.sort(np.concatenate([packed[tid] for tid in uniq_tids]))
    ok = np.ones(anchors.size, dtype=bool)
    for tid in uniq_tids:
        p = packed[tid]
        lo = np.searchsorted(p, anchors)
        hi = np.searchsorted(p, anchors + window)
        ok &= hi > lo
    hits = anchors[ok]
    if hits.size == 0:
        return empty
    d, n = np.unique(hits >> POS_BITS, return_counts=True)
    return pa.table({
        "query_id": pa.array(np.full(d.size, query_id, np.int64), pa.int64()),
        "doc_id": pa.array(d, pa.int64()),
        "n_anchors": pa.array(n.astype(np.int64), pa.int64()),
    })


def q_proximity_docs(sf_dir: str, window: int = PROX_W,
                     queries: list[tuple[int, str]] | None = None) -> pa.Table:
    """Proximity retrieval from the persisted positional family:
    (query_id, doc_id, n_anchors) for docs where all query terms
    co-occur within a `window`-wide kept-token span. One Ray task per
    query, bucket/key-pruned reads."""
    cfg = EngineConfig()
    fam = build_positional_family(sf_dir, cfg)
    stats = fam["stats"]
    futs = []
    for qid, text in (queries or PROX_QUERIES):
        tids = phrase_term_ids(stats, text)
        if tids is None:
            continue
        futs.append(_proximity_task.remote(
            fam["final_dir"], qid, tids, window, cfg.num_buckets))
    parts = [p for p in ray.get(futs) if p.num_rows] if futs else []
    if not parts:
        return pa.table({
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "n_anchors": pa.array([], pa.int64()),
        })
    out = pa.concat_tables(parts)
    order = pa.compute.sort_indices(
        out, sort_keys=[("query_id", "ascending"), ("doc_id", "ascending")])
    return out.take(order)


def q_phrase_postings(sf_dir: str,
                      phrases: list[tuple[int, str]] | None = None) -> pa.Table:
    """Exact phrase search over the persisted positional family:
    (phrase_id, doc_id, n_occurrences) for every doc containing each
    trace phrase as consecutive kept tokens. One Ray task per phrase;
    each task's read is pruned to its terms' buckets."""
    cfg = EngineConfig()
    fam = build_positional_family(sf_dir, cfg)
    stats = fam["stats"]
    futs = []
    for pid, phrase in (phrases or PHRASE_QUERIES):
        tids = phrase_term_ids(stats, phrase)
        if tids is None:
            continue
        futs.append(_phrase_task.remote(
            fam["final_dir"], pid, tids, cfg.num_buckets))
    parts = [p for p in ray.get(futs) if p.num_rows] if futs else []
    if not parts:
        return pa.table({
            "phrase_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "n_occurrences": pa.array([], pa.int64()),
        })
    out = pa.concat_tables(parts)
    order = pa.compute.sort_indices(
        out, sort_keys=[("phrase_id", "ascending"), ("doc_id", "ascending")])
    return out.take(order)
