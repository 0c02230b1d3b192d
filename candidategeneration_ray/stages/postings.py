"""Posting emission: (doc_id, tokens) -> (key:int64, score:int32, doc_id:int64).

Re-expresses the reference's per-doc emission loops as a stateful
actor-pool map_batches stage:

  - unigram postings (InvertedIndex.java:364-389): one posting per
    DISTINCT term per doc, score = quantized BM25 of that term in the
    doc; key = term id (int64 < 2^32);
  - d-bigram postings (InvertedIndex.java:264-314): one posting per
    distinct d-window pair per doc, score = bm25(lo) + bm25(hi); key =
    packed pair (>= 2^32, disjoint key space).

Per-doc tf / maxFreq are recomputed inline (np.unique with counts)
instead of the reference's second localTermStats pass
(utilsClass.java:85-110) — that pass only existed because the Java heap
could not hold the corpus.

The broadcast index stats (dictionary, df, N, avgdl) are pulled ONCE
per actor in __init__ (T1, InvertedIndex.java:86-121 analog). All
per-batch math is numpy; the only Python loop is over docs in the
batch, each iteration doing vectorized work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from candidategeneration_ray.config import EngineConfig
from candidategeneration_ray.functions.bm25 import bm25_quantized


def _combine_partial(keys: np.ndarray, scores: np.ndarray, docs: np.ndarray) -> pa.Table:
    """Batch-local combiner: group this batch's postings by key and emit
    ONE partial-list row per key — (key, n, docs varint-delta binary,
    scores raw-int32 binary). This is the map-side pre-aggregation of
    SURVEY §4: the groupby shuffle then moves ~|keys| compressed rows
    per batch instead of one row per posting (10-20x fewer rows), which
    is what keeps the all-to-all exchange from dominating the build."""
    from candidategeneration_ray.functions.arrowutil import binary_array_from_concat
    from candidategeneration_ray.functions.varint import encode_delta_grouped_concat

    if keys.size == 0:
        # a filter set can strip every posting from a batch; the
        # keys[starts] gather below would IndexError on an empty array
        return pa.table({
            "key": pa.array([], pa.int64()),
            "n": pa.array([], pa.int32()),
            "docs": pa.array([], pa.binary()),
            "scores": pa.array([], pa.binary()),
        })
    order = np.lexsort((docs, keys))
    keys = keys[order]
    scores = scores[order]
    docs = docs[order]
    starts = np.concatenate(([0], np.nonzero(keys[1:] != keys[:-1])[0] + 1))
    ends = np.concatenate((starts[1:], [keys.size]))
    dbuf, doff = encode_delta_grouped_concat(docs, starts, ends)
    value_off = np.concatenate((starts, [keys.size])).astype(np.int64)
    return pa.table({
        "key": pa.array(keys[starts], pa.int64()),
        "n": pa.array((ends - starts).astype(np.int32), pa.int32()),
        "docs": binary_array_from_concat(dbuf, doff),
        "scores": binary_array_from_concat(scores.astype("<i4").view(np.uint8), 4 * value_off),
    })


class PostingEmitter:
    """Callable class for ds.map_batches(PostingEmitter, fn_constructor_args=...)."""

    def __init__(self, stats_ref, cfg: EngineConfig | None = None,
                 filter_ref=None, prior_ref=None):
        stats = ray.get(stats_ref) if not isinstance(stats_ref, dict) else stats_ref
        self.cfg = cfg or EngineConfig()
        # HIT-family mode (InvertedIndex.java:375-378): when a per-doc
        # static prior is supplied, unigram postings carry the doc's
        # prior rank instead of BM25 (pairs are not emitted — the HIT
        # family is unigram-only). prior = {"doc_ids": sorted int64,
        # "rank": int32 aligned}.
        if prior_ref is None:
            self.prior = None
        else:
            self.prior = ray.get(prior_ref) if not isinstance(prior_ref, dict) else prior_ref
        self._prior_block_cache: dict[int, dict] = {}
        if "block_refs" in stats:
            # range-blocked dictionary (stats_to_blocks): pull blocks on
            # demand per batch instead of holding the whole vocabulary
            self.blocks = stats
            self._block_cache: dict[int, dict] = {}
            self.term_to_id = None
            self.df_by_id = None
        else:
            self.blocks = None
            self.term_to_id = {t: i + 1 for i, t in enumerate(stats["terms"])}
            self.df_by_id = np.asarray(stats["df_by_id"], dtype=np.int64)
        self.n_docs = stats["n_docs"]
        self.avgdl = stats["avgdl"]
        # filter set (M4/J1: broadcast semi-join; sorted int64 keys)
        if filter_ref is None:
            self.filter_keys = None
        else:
            fk = ray.get(filter_ref) if not isinstance(filter_ref, np.ndarray) else filter_ref
            self.filter_keys = np.sort(np.asarray(fk, dtype=np.int64))

    def _resolve_blocks(self, dictionary) -> tuple[np.ndarray, np.ndarray]:
        """Blocks mode: map this batch's UNIQUE tokens to (term_id, df)
        by pulling only the dictionary blocks whose term range the
        batch touches (cached per worker). Tokens first check the
        delta-appended OVERLAY (terms whose ids continue past the base
        vocabulary, update.extend_stats_blocks — delta-sized, rides in
        the broadcast dict) since appended ids break the base blocks'
        term-range invariant."""
        toks = np.asarray(dictionary.to_pylist(), dtype=object)
        blocks = self.blocks
        ids = np.empty(toks.size, dtype=np.int64)
        dfs = np.empty(toks.size, dtype=np.int64)
        pending = np.ones(toks.size, dtype=bool)
        ov_t = blocks.get("overlay_terms")
        if ov_t is not None and len(ov_t):
            pos = np.searchsorted(ov_t, toks)
            pos_c = np.minimum(pos, len(ov_t) - 1)
            hit = ov_t[pos_c] == toks
            ids[hit] = blocks["overlay_ids"][pos_c[hit]]
            dfs[hit] = blocks["overlay_df"][pos_c[hit]]
            pending &= ~hit
        firsts = blocks["block_first_term"]
        bases = blocks["block_base_id"]
        bidx = np.searchsorted(firsts, toks, side="right") - 1
        bidx = np.maximum(bidx, 0)
        for bi in np.unique(bidx[pending]):
            if bi not in self._block_cache:
                self._block_cache[bi] = ray.get(blocks["block_refs"][bi])
            blk = self._block_cache[bi]
            rows = pending & (bidx == bi)
            pos = np.searchsorted(blk["terms"], toks[rows])
            # corpus tokens always resolve (dictionary covers the corpus)
            ids[rows] = bases[bi] + pos + 1
            dfs[rows] = blk["df"][np.minimum(pos, blk["df"].size - 1)]
        return ids, dfs

    def _prior_ranks(self, pdocs: np.ndarray) -> np.ndarray:
        """doc_id -> static prior rank, in either prior layout:
        broadcast {"doc_ids" sorted, "rank"} or range-blocked
        {"block_refs", "block_first_doc"} (stages.docids.
        rank_prior_scalable) — the blocked form pulls only the mapping
        blocks this batch's doc range touches, so the prior never has
        to fit in one object (10^12-doc scale path)."""
        pr = self.prior
        if "block_refs" not in pr:
            pos = np.searchsorted(pr["doc_ids"], pdocs)
            pos = np.minimum(pos, pr["doc_ids"].size - 1)
            if pr["doc_ids"].size == 0 or not np.array_equal(
                    pr["doc_ids"][pos], pdocs):
                missing = pdocs[pr["doc_ids"][pos] != pdocs][:5] \
                    if pr["doc_ids"].size else pdocs[:5]
                raise KeyError(
                    f"HIT prior has no rank for doc_ids {missing.tolist()}; "
                    "the prior map must cover every indexed doc")
            return pr["rank"][pos].astype(np.int32)
        firsts = pr["block_first_doc"]
        bidx = np.searchsorted(firsts, pdocs, side="right") - 1
        if bidx.size and bidx.min() < 0:
            raise KeyError(
                f"HIT prior has no rank for doc_ids "
                f"{pdocs[bidx < 0][:5].tolist()} (below first block)")
        ranks = np.empty(pdocs.size, dtype=np.int32)
        for bi in np.unique(bidx):
            if bi not in self._prior_block_cache:
                t = ray.get(pr["block_refs"][bi])
                t = t if hasattr(t, "column") else t.to_arrow()
                self._prior_block_cache[bi] = {
                    "doc_ids": t.column("doc_id").to_numpy().astype(np.int64),
                    "rank": t.column("rank").to_numpy().astype(np.int32),
                }
            blk = self._prior_block_cache[bi]
            rows = bidx == bi
            want = pdocs[rows]
            pos = np.searchsorted(blk["doc_ids"], want)
            pos = np.minimum(pos, blk["doc_ids"].size - 1)
            if not np.array_equal(blk["doc_ids"][pos], want):
                missing = want[blk["doc_ids"][pos] != want][:5]
                raise KeyError(
                    f"HIT prior has no rank for doc_ids {missing.tolist()}; "
                    "the prior map must cover every indexed doc")
            ranks[rows] = blk["rank"][pos]
        return ranks

    def _apply_filter(self, keys: np.ndarray) -> np.ndarray:
        """Boolean mask of keys present in the filter set (searchsorted
        membership — no shuffle, reference InvertedIndex.java:291)."""
        if self.filter_keys.size == 0:
            return np.zeros(keys.size, dtype=bool)
        pos = np.searchsorted(self.filter_keys, keys)
        pos = np.minimum(pos, self.filter_keys.size - 1)
        return self.filter_keys[pos] == keys

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch-GLOBAL vectorized emission — no per-doc Python loop.

        All docs' token ids are processed as one flat array with a
        parallel doc-index array; per-(doc,term) tf, per-doc maxtf,
        window pairs (masked at doc boundaries) and dedup all run as
        whole-batch numpy kernels.
        """
        cfg = self.cfg
        col = batch.column("tokens").combine_chunks()
        offsets = col.offsets.to_numpy().astype(np.int64)
        base = offsets[0]
        lens = np.diff(offsets)
        # token -> term id via Arrow dictionary encode (C++ hash), then a
        # small Python pass over the batch's UNIQUE tokens only
        flat_strs = col.values
        if flat_strs.offset != 0 or len(flat_strs) != (offsets[-1] - base):
            flat_strs = flat_strs.slice(0, len(flat_strs))
        denc = flat_strs.dictionary_encode()
        if self.blocks is not None:
            uniq_ids, self._uniq_df = self._resolve_blocks(denc.dictionary)
            self._uniq_ids_sorted = np.sort(uniq_ids)
            self._uniq_df_sorted = self._uniq_df[np.argsort(uniq_ids, kind="stable")]
        else:
            lookup = self.term_to_id
            uniq_ids = np.fromiter(
                (lookup[t] for t in denc.dictionary.to_pylist()),
                dtype=np.int64, count=len(denc.dictionary),
            )
        indices = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        flat_ids = uniq_ids[indices]

        doc_ids = batch.column("doc_id").to_numpy().astype(np.int64)
        doc_lens = batch.column("doc_len").to_numpy().astype(np.int64)
        n_tok = flat_ids.size
        if n_tok == 0:
            out_key = []
        else:
            didx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
            # --- per-(doc, term) tf via one global lexsort
            order = np.lexsort((flat_ids, didx))
            sd, si = didx[order], flat_ids[order]
            new_grp = np.concatenate(([True], (sd[1:] != sd[:-1]) | (si[1:] != si[:-1])))
            gstart = np.nonzero(new_grp)[0]
            gend = np.concatenate((gstart[1:], [n_tok]))
            tf = gend - gstart                      # per (doc, term)
            g_doc = sd[gstart]                      # doc index per group
            g_term = si[gstart]                     # term id per group
            # per-doc max tf: groups are doc-contiguous
            doc_first = np.concatenate(([True], g_doc[1:] != g_doc[:-1]))
            dstart = np.nonzero(doc_first)[0]
            maxtf_per_presentdoc = np.maximum.reduceat(tf, dstart)
            # map back: docs with zero tokens never appear in groups
            present_docs = g_doc[dstart]
            maxtf_by_doc = np.zeros(batch.num_rows, dtype=np.int64)
            maxtf_by_doc[present_docs] = maxtf_per_presentdoc

            if self.blocks is not None:
                g_df = self._uniq_df_sorted[
                    np.searchsorted(self._uniq_ids_sorted, g_term)]
            else:
                g_df = self.df_by_id[g_term]
            scores = bm25_quantized(
                tf, maxtf_by_doc[g_doc], doc_lens[g_doc], g_df,
                self.n_docs, self.avgdl, cfg.k1, cfg.b, cfg.quantization,
            )

            if self.prior is not None:
                # replace scores with the doc's prior rank (HIT family)
                scores = self._prior_ranks(doc_ids[g_doc])

            out_key, out_score, out_doc = [], [], []
            if cfg.emit_unigrams:
                if self.filter_keys is not None:
                    um = self._apply_filter(g_term)
                    out_key.append(g_term[um])
                    out_score.append(scores[um])
                    out_doc.append(doc_ids[g_doc[um]])
                else:
                    out_key.append(g_term)
                    out_score.append(scores)
                    out_doc.append(doc_ids[g_doc])
            if cfg.emit_pairs and n_tok >= 2 and self.prior is None:
                # window pairs, batch-global: shift + doc-boundary mask.
                # Pair entries are built over batch-LOCAL term ranks so
                # (doc, pair) packs into ONE int64 when it fits — a
                # single np.sort dedup instead of a two-key lexsort
                # (~1.5x on the hottest kernel); falls back to the
                # lexsort path for huge batch vocabularies.
                v_local = np.int64(uniq_ids.size)  # batch vocab (== |uniq|)
                # rank of each token's global id among the batch's
                # sorted unique ids — order-isomorphic to global ids
                uniq_sorted = np.sort(uniq_ids)
                rank_of_code = np.searchsorted(uniq_sorted, uniq_ids).astype(np.int64)
                flat_rank = rank_of_code[indices]
                packable = (
                    v_local * v_local * batch.num_rows < (1 << 62)
                )
                chunks_k, chunks_d = [], []
                for s in range(1, cfg.distance + 1):
                    if s >= n_tok:
                        break
                    same = didx[:-s] == didx[s:]
                    a = flat_rank[:-s][same]
                    b2 = flat_rank[s:][same]
                    lo = np.minimum(a, b2)
                    hi = np.maximum(a, b2)
                    chunks_k.append(lo * v_local + hi)
                    chunks_d.append(didx[:-s][same])
                pk = np.concatenate(chunks_k) if chunks_k else np.empty(0, np.int64)
                pd_ = np.concatenate(chunks_d) if chunks_d else np.empty(0, np.int64)
                if packable and pk.size:
                    combined = pd_ * (v_local * v_local) + pk
                    combined = np.sort(combined)
                    keep = np.concatenate(([True], combined[1:] != combined[:-1]))
                    combined = combined[keep]
                    pd_ = combined // (v_local * v_local)
                    pk = combined % (v_local * v_local)
                elif pk.size:
                    porder = np.lexsort((pk, pd_))
                    pk, pd_ = pk[porder], pd_[porder]
                    keep = np.concatenate(([True], (pd_[1:] != pd_[:-1]) | (pk[1:] != pk[:-1])))
                    pk, pd_ = pk[keep], pd_[keep]
                # local rank pair -> global packed pair key
                if pk.size:
                    lo_g = uniq_sorted[(pk // v_local)]
                    hi_g = uniq_sorted[(pk % v_local)]
                    pk = (lo_g << 32) | hi_g
                if pk.size and self.filter_keys is not None:
                    pm = self._apply_filter(pk)
                    pk, pd_ = pk[pm], pd_[pm]
                # score lookup: (doc, term) -> score via searchsorted on
                # the group table (sorted by (doc, term) already)
                gkey = (g_doc << 32) | g_term
                if pk.size:
                    s_lo = scores[np.searchsorted(gkey, (pd_ << 32) | (pk >> 32))]
                    s_hi = scores[np.searchsorted(gkey, (pd_ << 32) | (pk & 0xFFFFFFFF))]
                    out_key.append(pk)
                    out_score.append((s_lo.astype(np.int64) + s_hi).astype(np.int32))
                    out_doc.append(doc_ids[pd_])

        if not out_key:
            if self.cfg.partial_lists:
                return pa.table({
                    "key": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int32()),
                    "docs": pa.array([], pa.binary()),
                    "scores": pa.array([], pa.binary()),
                })
            return pa.table({
                "key": pa.array([], pa.int64()),
                "score": pa.array([], pa.int32()),
                "doc_id": pa.array([], pa.int64()),
            })
        keys = np.concatenate(out_key)
        scores = np.concatenate(out_score).astype(np.int32)
        docs = np.concatenate(out_doc)
        if not self.cfg.partial_lists:
            return pa.table({
                "key": pa.array(keys, pa.int64()),
                "score": pa.array(scores, pa.int32()),
                "doc_id": pa.array(docs, pa.int64()),
            })
        return _combine_partial(keys, scores, docs)


# per-worker-process emitter cache, keyed by the broadcast ref so
# different builds in one session don't collide
_WORKER_EMITTERS: dict = {}


def emit_postings(ds, stats_ref, cfg: EngineConfig | None = None,
                  concurrency=None, use_actors: bool = False,
                  filter_ref=None, prior_ref=None):
    """Map the token dataset to the posting stream (T1, SURVEY §2.3).

    Default is stateless TASKS with a per-worker-process emitter cache:
    the broadcast state (ray.put ref) is deserialized once per worker,
    like an actor pool, but without the pool's cold-start cost (~5 s
    for 32 fresh actor processes per build — measured; worker processes
    are already warm from earlier stages and are reused). Set
    use_actors=True for the actor-pool variant (useful when the state
    is too large for the worker heap to share with task execution).
    """
    cfg = cfg or EngineConfig()
    # Broadcast plain objects ONCE here so (a) every worker shares one
    # plasma copy instead of re-shipping state per task, and (b) the
    # task-path worker cache below can key on the ref's stable hex id —
    # keying on id() of a plain object risks CPython id reuse handing a
    # later build a stale emitter with the previous build's stats.
    if stats_ref is not None and not hasattr(stats_ref, "hex"):
        stats_ref = ray.put(stats_ref)
    if filter_ref is not None and not hasattr(filter_ref, "hex"):
        filter_ref = ray.put(np.asarray(filter_ref, dtype=np.int64))
    if prior_ref is not None and not hasattr(prior_ref, "hex"):
        prior_ref = ray.put(prior_ref)
    projected = ds.select_columns(["doc_id", "doc_len", "tokens"])
    if use_actors:
        if concurrency is None:
            try:
                total = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                total = 8
            concurrency = (1, max(2, total))
        return projected.map_batches(
            PostingEmitter,
            fn_constructor_args=(stats_ref, cfg, filter_ref, prior_ref),
            batch_format="pyarrow",
            batch_size=cfg.emit_batch_size,
            concurrency=concurrency,
        )

    def _rid(r):
        return None if r is None else r.hex()

    key = (_rid(stats_ref), _rid(filter_ref), _rid(prior_ref))

    def _emit(batch: pa.Table) -> pa.Table:
        em = _WORKER_EMITTERS.get(key)
        if em is None:
            if len(_WORKER_EMITTERS) >= 4:  # bound worker-heap growth
                _WORKER_EMITTERS.pop(next(iter(_WORKER_EMITTERS)))
            em = _WORKER_EMITTERS[key] = PostingEmitter(
                stats_ref, cfg, filter_ref, prior_ref)
        return em(batch)

    return projected.map_batches(
        _emit, batch_format="pyarrow", batch_size=cfg.emit_batch_size)
