"""Global statistics + document frequency + term dictionary.

Reference: PHASE1 (WWWMain.java:69-74) accumulates N / total words into a
shared long[2] and df into a shared, UNSYNCHRONIZED int[] (lossy races,
InvertedIndex.java:157-173). We compute both exactly with pre-aggregated
groupbys:

  - per-batch partial df (one (term, df) row per term per batch) →
    groupby(term).sum — the shuffle moves per-batch partials, not one
    row per (doc, term);
  - N / total tokens via the same partial trick (one row per batch).

Term dictionary (WWW.java:269-281): terms sorted ascending → 1-based
sequential int32 ids — deterministic, so id spaces are reproducible
across runs and parallelism levels.

The resulting broadcast state ("index stats") is a dict of numpy arrays
shipped once via ray.put and pulled once per worker (actor __init__ /
first batch), mirroring the reference's load-once InvertedIndex ctor
(InvertedIndex.java:86-121).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from candidategeneration_ray.functions.bm25 import truncated_avgdl


def _partial_df(batch: pa.Table) -> pa.Table:
    """One (term, df, n_docs, total_tokens) partial row per distinct term
    in the batch; doc-count/token-count partials ride on the first row.
    Pre-aggregation: the groupby shuffle moves per-batch partials, not
    one row per (doc, term). Fully vectorized: Arrow dictionary_encode
    (C++ hash) + one np.unique over (doc, term-code) pairs + bincount."""
    col = batch.column("tokens").combine_chunks()
    offsets = col.offsets.to_numpy().astype(np.int64)
    lens = np.diff(offsets)
    total_tokens = int(lens.sum())
    values = col.values
    if len(values) and total_tokens:
        denc = values.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab_n = len(denc.dictionary)
        didx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        uniq_pairs = np.unique(didx * vocab_n + codes)
        df_counts = np.bincount(uniq_pairs % vocab_n, minlength=vocab_n)
        terms = denc.dictionary
        counts = df_counts.astype(np.int64)
    else:
        terms = pa.array([""], pa.string())
        counts = np.zeros(1, dtype=np.int64)
    n_docs = np.zeros(len(terms), dtype=np.int64)
    n_toks = np.zeros(len(terms), dtype=np.int64)
    n_docs[0] = batch.num_rows
    n_toks[0] = total_tokens
    return pa.table({
        "term": terms,
        "df": pa.array(counts, pa.int64()),
        "n_docs_partial": pa.array(n_docs, pa.int64()),
        "n_tokens_partial": pa.array(n_toks, pa.int64()),
    })


def stats_to_blocks(stats: dict, num_blocks: int = 16) -> dict:
    """Range-blocked form of the dictionary/df state for vocabularies
    too large to broadcast whole (SCALE.md): the sorted term space is
    split into `num_blocks` ranges, each ray.put as its own object;
    the describing dict holds only per-block first terms and base ids.
    Term ids are IDENTICAL to the broadcast dictionary (block b's terms
    get ids base_b+1..base_b+len). Workers pull only the blocks their
    batches' tokens touch (PostingEmitter blocks mode)."""
    terms = np.asarray(stats["terms"], dtype=object)
    df = np.asarray(stats["df_by_id"][1:], dtype=np.int64)
    bounds = np.linspace(0, terms.size, num_blocks + 1).astype(np.int64)
    block_refs, first_terms, base_ids = [], [], []
    for i in range(num_blocks):
        lo, hi = bounds[i], bounds[i + 1]
        if lo >= hi:
            continue
        block_refs.append(ray.put({"terms": terms[lo:hi], "df": df[lo:hi]}))
        first_terms.append(terms[lo])
        base_ids.append(int(lo))
    return {
        "block_refs": block_refs,
        "block_first_term": np.array(first_terms, dtype=object),
        "block_base_id": np.array(base_ids, dtype=np.int64),
        "n_terms": int(terms.size),
        "n_docs": stats["n_docs"],
        "total_tokens": stats["total_tokens"],
        "avgdl": stats["avgdl"],
    }


def compute_stats_blocks(ds_tokens: ray.data.Dataset, num_blocks: int = 16) -> dict:
    """Blocked-dictionary CONSTRUCTION that never materializes the
    vocabulary on the driver (the scale path stats_to_blocks only
    reshapes a driver-built dict; this builds the blocks straight from
    the aggregate's object-store blocks):

      partial df rows → groupby(term) sum → sort(term) →
      repartition(num_blocks) — blocks stay in the object store; one
      tiny remote task per block normalizes it ({"terms", "df"} dict,
      padding rows dropped) and reports (first_term, n_terms,
      n_docs/total_tokens partial sums). The driver holds only
      per-block firsts + prefix-sum base ids: O(num_blocks), any vocab.

    Term ids are IDENTICAL to compute_stats's (position in the global
    sorted term order + 1) — verified by the byte-identity build test.
    Returns the same dict shape PostingEmitter's blocks mode consumes.
    """
    from ray.data.aggregate import Sum

    agg = (
        ds_tokens.select_columns(["tokens"])
        .map_batches(_partial_df, batch_format="pyarrow")
        .groupby("term")
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("n_docs_partial", alias_name="nd"),
            Sum("n_tokens_partial", alias_name="nt"),
        )
        .sort("term")
        .repartition(num_blocks)
        .materialize()
    )
    block_refs = list(agg.get_internal_block_refs())

    @ray.remote(num_returns=2)
    def _normalize(block):
        """One dictionary block: drop padding rows, return the lookup
        dict (stays in the object store) + tiny metadata."""
        t = block if hasattr(block, "column") else block.to_arrow()
        terms = np.asarray(t.column("term").to_pylist(), dtype=object)
        df = t.column("df").to_numpy().astype(np.int64)
        nd = int(t.column("nd").to_numpy().sum())
        nt = int(t.column("nt").to_numpy().sum())
        keep = (df > 0) & (terms != "")
        terms, df = terms[keep], df[keep]
        blk = {"terms": terms, "df": df}
        meta = {"first": terms[0] if terms.size else None,
                "n": int(terms.size), "nd": nd, "nt": nt}
        return blk, meta

    pairs = [_normalize.remote(r) for r in block_refs]
    metas = ray.get([m for _, m in pairs])
    n_docs = sum(m["nd"] for m in metas)
    total_tokens = sum(m["nt"] for m in metas)
    keep = [(blk, m) for (blk, _), m in zip(pairs, metas) if m["n"]]
    counts = np.array([m["n"] for _, m in keep], dtype=np.int64)
    bases = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return {
        "block_refs": [blk for blk, _ in keep],
        "block_first_term": np.array([m["first"] for _, m in keep], dtype=object),
        "block_base_id": bases,
        "n_terms": int(counts.sum()),
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": truncated_avgdl(total_tokens, n_docs) if n_docs else 1.0,
    }


def compute_stats(ds_tokens: ray.data.Dataset,
                  num_buckets: int = 64) -> dict:
    """ds_tokens must carry a `tokens:list<string>` column.

    Returns {"terms": sorted np object array (id = index+1),
             "df_by_id": int64 array (df_by_id[0] unused),
             "n_docs": int, "total_tokens": int, "avgdl": float}.

    `num_buckets` sizes the df fold (task-routed exchange) — small
    local corpora run best at ~16 (object-count overhead); callers
    with a corpus-scale input should pass a size-derived count
    (build_index does)."""
    def _bucketize(batch: pa.Table) -> pa.Table:
        import pandas as pd

        names = np.asarray(batch.column("term").to_pylist(), dtype=object)
        b = (pd.util.hash_array(names)
             % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("tbucket", pa.array(b))

    def _fold(group: pa.Table) -> pa.Table:
        """Bucket-local exact fold: one row per term. The int-bucket
        groupby + vectorized fold replaces the string-key sort
        aggregate (measured ~2x on the headline stats phase — same
        per-block fixed-cost lesson as relational.sized_read)."""
        import pandas as pd

        terms = np.asarray(group.column("term").to_pylist(), dtype=object)
        df = group.column("df").to_numpy().astype(np.int64)
        nd = group.column("n_docs_partial").to_numpy().astype(np.int64)
        nt = group.column("n_tokens_partial").to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(terms)
        return pa.table({
            "term": pa.array(np.asarray(uniq, dtype=object).tolist(),
                             pa.string()),
            "df": pa.array(np.bincount(codes, weights=df,
                                       minlength=uniq.size)
                           .astype(np.int64), pa.int64()),
            "nd": pa.array(np.bincount(codes, weights=nd,
                                       minlength=uniq.size)
                           .astype(np.int64), pa.int64()),
            "nt": pa.array(np.bincount(codes, weights=nt,
                                       minlength=uniq.size)
                           .astype(np.int64), pa.int64()),
        })

    # the df fold keeps the sort-based groupby: A/B'd against the
    # task-routed exchange (round 5) and the sort wins here (0.90 vs
    # 1.03 s) — the partial rows carry term strings, so the split's
    # per-bucket take() copies string buffers the sort never touches
    agg = (ds_tokens.select_columns(["tokens"])
           .map_batches(lambda b: _bucketize(_partial_df(b)),
                        batch_format="pyarrow")
           .groupby("tbucket").map_groups(_fold, batch_format="pyarrow"))
    pdf = agg.to_pandas()
    n_docs = int(pdf["nd"].sum())
    total_tokens = int(pdf["nt"].sum())
    pdf = pdf[(pdf["df"] > 0) & (pdf["term"] != "")].sort_values("term")
    terms = pdf["term"].to_numpy()
    df_by_id = np.concatenate(([0], pdf["df"].to_numpy(np.int64)))
    return {
        "terms": terms,
        "df_by_id": df_by_id,
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": truncated_avgdl(total_tokens, n_docs) if n_docs else 1.0,
    }
