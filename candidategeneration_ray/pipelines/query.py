"""Query-serving pipeline: queries table → top-k candidates table.

queries(query_id:int64, text:string)
  → map_batches(QueryEngine actor pool, concurrency=K)   # T2
  → (query_id, rank, doc_id, score)                       # S7 analog

Queries that tokenize to nothing (stopword-only, Metadata.java:214-218)
produce no output rows.
"""

from __future__ import annotations

import ray
import ray.data

from candidategeneration_ray.config import EngineConfig
from candidategeneration_ray.state.queryengine import QueryEngine


def write_candidates(results: ray.data.Dataset, out_dir: str) -> str:
    """Candidate-pool sink (S7, algo_toplayer.cpp:978-1012 writes
    `qid:did did ...` text lines): persist (query_id, rank, doc_id,
    score) as partitioned Parquet — the self-describing replacement for
    the reference's text file."""
    results.write_parquet(out_dir)
    return out_dir


def run_queries(
    index_dir: str,
    queries: ray.data.Dataset,
    stats: dict,
    cfg: EngineConfig | None = None,
    concurrency=(1, 4),
) -> ray.data.Dataset:
    """Load the index segments ONCE on the driver and ship the Arrow
    table through the object store: every actor maps the same plasma
    buffers zero-copy instead of re-reading the segment files
    (N_actors x IO -> 1 x IO). On a multi-node cluster the table is
    transferred once per node by the object store."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    cfg = cfg or EngineConfig()
    files = sorted(glob.glob(os.path.join(index_dir, "**", "*.parquet"),
                             recursive=True))
    table = pa.concat_tables([pq.read_table(f) for f in files]).combine_chunks()
    index_ref = ray.put(table)
    stats_ref = ray.put(stats)
    return queries.map_batches(
        QueryEngine,
        fn_constructor_args=(index_ref, stats_ref, cfg),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
