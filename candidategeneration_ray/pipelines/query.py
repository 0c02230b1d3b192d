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
    cfg = cfg or EngineConfig()
    stats_ref = ray.put(stats)
    return queries.map_batches(
        QueryEngine,
        fn_constructor_args=(index_dir, stats_ref, cfg),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
