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


class PostingEmitter:
    """Callable class for ds.map_batches(PostingEmitter, fn_constructor_args=...)."""

    def __init__(self, stats_ref, cfg: EngineConfig | None = None):
        stats = ray.get(stats_ref) if not isinstance(stats_ref, dict) else stats_ref
        self.cfg = cfg or EngineConfig()
        self.term_to_id = {t: i + 1 for i, t in enumerate(stats["terms"])}
        self.df_by_id = np.asarray(stats["df_by_id"], dtype=np.int64)
        self.n_docs = stats["n_docs"]
        self.avgdl = stats["avgdl"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        col = batch.column("tokens").combine_chunks()
        offsets = col.offsets.to_numpy()
        base = offsets[0]
        lookup = self.term_to_id
        flat_ids = np.fromiter(
            (lookup[t] for t in col.values.to_pylist()),
            dtype=np.int64,
            count=int(offsets[-1] - base),
        )
        doc_ids = batch.column("doc_id").to_numpy()
        doc_lens = batch.column("doc_len").to_numpy()

        out_key, out_score, out_doc = [], [], []
        d = cfg.distance
        for r in range(batch.num_rows):
            ids = flat_ids[offsets[r] - base:offsets[r + 1] - base]
            n = ids.size
            if n == 0:
                continue
            uids, counts = np.unique(ids, return_counts=True)
            max_tf = int(counts.max())
            scores = bm25_quantized(
                counts, max_tf, int(doc_lens[r]), self.df_by_id[uids],
                self.n_docs, self.avgdl, cfg.k1, cfg.b, cfg.quantization,
            )
            doc = np.int64(doc_ids[r])
            if cfg.emit_unigrams:
                out_key.append(uids)
                out_score.append(scores)
                out_doc.append(np.full(uids.size, doc))
            if cfg.emit_pairs and n >= 2:
                chunks = []
                for s in range(1, min(d, n - 1) + 1):
                    a, b2 = ids[:-s], ids[s:]
                    lo = np.minimum(a, b2)
                    hi = np.maximum(a, b2)
                    chunks.append((lo << 32) | hi)
                pkeys = np.unique(np.concatenate(chunks))
                lo_ids = pkeys >> 32
                hi_ids = pkeys & 0xFFFFFFFF
                # per-doc score lookup by binary search into this doc's uids
                s_lo = scores[np.searchsorted(uids, lo_ids)]
                s_hi = scores[np.searchsorted(uids, hi_ids)]
                out_key.append(pkeys)
                out_score.append((s_lo.astype(np.int64) + s_hi).astype(np.int32))
                out_doc.append(np.full(pkeys.size, doc))

        if not out_key:
            return pa.table({
                "key": pa.array([], pa.int64()),
                "score": pa.array([], pa.int32()),
                "doc_id": pa.array([], pa.int64()),
            })
        return pa.table({
            "key": pa.array(np.concatenate(out_key), pa.int64()),
            "score": pa.array(np.concatenate(out_score).astype(np.int32), pa.int32()),
            "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
        })


def emit_postings(ds, stats_ref, cfg: EngineConfig | None = None,
                  concurrency=None):
    """Map the token dataset to the posting stream.

    Uses an actor pool so the dictionary/df state is deserialized once
    per actor, not once per task (T1, SURVEY §2.3).
    """
    cfg = cfg or EngineConfig()
    kwargs = {"concurrency": concurrency if concurrency is not None else (1, 8)}
    return ds.select_columns(["doc_id", "doc_len", "tokens"]).map_batches(
        PostingEmitter,
        fn_constructor_args=(stats_ref, cfg),
        batch_format="pyarrow",
        batch_size=cfg.emit_batch_size,
        **kwargs,
    )
