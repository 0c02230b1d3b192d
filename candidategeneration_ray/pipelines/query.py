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


# Above this on-disk segment size the driver no longer concatenates the
# index into one plasma object: each serving actor reads the segment
# files itself (parallel IO, per-actor memory bounded by its reads) —
# the default that stays safe when the index outgrows one node. For
# cross-node scale-out use ShardedQueryEngine (doc-sharded fleet) or
# IndexReader(buckets=...) (key-sharded fleet).
BROADCAST_INDEX_MAX_BYTES = 2 << 30


def run_queries(
    index_dir: str | list[str],
    queries: ray.data.Dataset,
    stats: dict,
    cfg: EngineConfig | None = None,
    concurrency=(1, 4),
    broadcast_max_bytes: int | None = None,
    tombstones: dict | None = None,
) -> ray.data.Dataset:
    """Serve a query dataset against the built index.

    `index_dir` may be a list of segment sources — the LSM serving view
    of a base index plus delta generations
    (pipelines.update.serving_sources), base first. `tombstones`
    (pipelines.update.load_tombstones) filters deleted docs at decode
    time in every serving actor — pass it whenever the index has
    uncompacted deletes.

    Small index (<= broadcast_max_bytes on disk): load segments ONCE on
    the driver and ship the Arrow tables through the object store —
    every actor maps the same plasma buffers zero-copy instead of
    re-reading the segment files (N_actors x IO -> 1 x IO; transferred
    once per node by the object store).

    Large index: pass the segment PATHS to the actors — each loads the
    files itself in parallel and the driver never materializes the
    index (the whole-index ray.put would otherwise cap serving at one
    node's driver heap)."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    cfg = cfg or EngineConfig()
    limit = BROADCAST_INDEX_MAX_BYTES if broadcast_max_bytes is None \
        else broadcast_max_bytes
    dirs = index_dir if isinstance(index_dir, list) else [index_dir]
    per_dir_files = [
        sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
        for d in dirs
    ]
    # size the broadcast decision on the DECODED footprint, not the
    # compressed file size: parquet row-group metadata records the
    # uncompressed byte size, which tracks the Arrow tables placed in
    # plasma far better (advisor finding: an index just under the
    # on-disk limit could still exhaust the object store)
    total_bytes = 0
    for files in per_dir_files:
        for f in files:
            md = pq.read_metadata(f)
            total_bytes += sum(md.row_group(g).total_byte_size
                               for g in range(md.num_row_groups))
    stats_ref = ray.put(stats)
    if total_bytes <= limit:
        from concurrent.futures import ThreadPoolExecutor

        # parquet decode releases the GIL — a thread pool turns the
        # driver-side segment load from serial file reads into a
        # bandwidth-bound parallel read (measured 4-6x at GB sizes)
        with ThreadPoolExecutor(max_workers=8) as ex:
            tables = [
                pa.concat_tables(list(ex.map(pq.read_table, files))).combine_chunks()
                for files in per_dir_files
            ]
        source = ray.put(tables if isinstance(index_dir, list) else tables[0])
    else:
        source = dirs if isinstance(index_dir, list) else index_dir
    tomb_ref = ray.put(tombstones) if tombstones is not None else None
    return queries.map_batches(
        QueryEngine,
        fn_constructor_args=(source, stats_ref, cfg, tomb_ref),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
