"""Tokenization stage: text:string -> tokens:list<string> + doc_len:int32.

Replaces the reference's forward-index decode + docInfo lock-step read
(utilsClass.java:46-80, InvertedIndex.java:138-144): Parquet rows are
self-describing, so the tokenized form is just a derived column. The
raw `text` column passes through untouched (per-turn text-equality
invariant).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from candidategeneration_ray.functions.tokenize import tokenize_many


def _tokenize_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    token_lists = tokenize_many(texts)
    batch = batch.append_column("tokens", pa.array(token_lists, pa.list_(pa.string())))
    return batch.append_column(
        "doc_len", pa.array([len(t) for t in token_lists], pa.int32())
    )


def attach_tokens(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(_tokenize_batch, batch_format="pyarrow")
