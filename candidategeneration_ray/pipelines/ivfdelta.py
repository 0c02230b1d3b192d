"""Incremental (LSM) updates for the learned-codebook IVF layout.

Extends the text-index LSM capability (pipelines/update.py) to the
embedding side: a built IVF layout (clustering.build_ivf_kmeans_index,
hive-partitioned `cluster=*/` dirs + persisted codebook) absorbs new
vectors WITHOUT retraining — the delta is assigned under the FROZEN
base codebook and lands as a generation directory
`gen-NNNN/cluster=*/`, exactly the frozen-epoch semantics the text LSM
uses for BM25 stats. Serving probes read base + every complete
generation for the probed clusters only.

Compaction is a trivial-move (RocksDB's no-overlap move-down): each
generation file is renamed into its base cluster directory with a
generation-unique name, then the emptied generation is dropped. Since
inverted lists are disjoint by cluster and probing reads whole cluster
dirs, a move IS a full compaction here — no byte rewrite, and every
crash window is safe: renames are atomic per file, so a file is
readable from exactly one location at all times, and a half-moved
generation serves its remaining files while the moved ones already
serve from base.

Scale notes: delta cost is O(delta) (assign + one partitioned write);
nothing touches the base layout until compaction, and compaction is
O(#generation files) renames. At 100 TB the same layout holds with
cluster dirs sharded across a DFS; the frozen-codebook drift caveat is
the standard IVF practice (retrain offline when drift matters).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from candidategeneration_ray.pipelines.clustering import (
    _assign, _quantize, build_ivf_kmeans_index,
)

_GEN_MANIFEST = "GEN_MANIFEST.json"


def _generations(ivf_dir: str, complete_only: bool = True) -> list[str]:
    gens = sorted(glob.glob(os.path.join(ivf_dir, "gen-*")))
    if complete_only:
        gens = [g for g in gens
                if os.path.exists(os.path.join(g, _GEN_MANIFEST))]
    return gens


def _next_gen_num(ivf_dir: str) -> int:
    """Next generation number — scans live gen dirs AND the gen-NNNN-
    prefixes of files already compacted into the base cluster dirs, so
    a number (and therefore a moved-file name) is never reused across
    compaction epochs (os.rename would silently clobber)."""
    nums = [int(os.path.basename(g).split("-")[1])
            for g in _generations(ivf_dir, complete_only=False)]
    for f in glob.glob(os.path.join(ivf_dir, "cluster=*", "gen-*.parquet")):
        nums.append(int(os.path.basename(f).split("-")[1]))
    return 1 + max(nums, default=0)


def update_ivf_index(ivf_dir: str, cent: np.ndarray,
                     delta_path: str) -> str:
    """Ingest one delta file as a new generation; returns its dir.

    Vec ids must be new (the LSM is append-only, like the text path);
    the codebook is the base's — FROZEN, never retrained here."""
    n = _next_gen_num(ivf_dir)
    gen_dir = os.path.join(ivf_dir, f"gen-{n:04d}")
    cent_ref = ray.put(cent)

    def _code(batch: pa.Table) -> pa.Table:
        _, xq = _quantize(batch)
        return batch.append_column(
            "cluster", pa.array(_assign(xq, ray.get(cent_ref)), pa.int64()))

    ray.data.read_parquet(delta_path, columns=["vec_id", "embedding"]) \
        .map_batches(_code, batch_format="pyarrow") \
        .write_parquet(gen_dir, partition_cols=["cluster"])
    with open(os.path.join(gen_dir, _GEN_MANIFEST), "w") as f:
        json.dump({"generation": n, "inputs": [delta_path]}, f)
    return gen_dir


def ivf_serving_paths(ivf_dir: str, clusters) -> list[str]:
    """All parquet files serving the given clusters: base layout plus
    every COMPLETE generation (an interrupted ingest without its
    manifest is invisible — crash healing by re-ingest)."""
    roots = [ivf_dir] + _generations(ivf_dir)
    paths = []
    for c in clusters:
        for r in roots:
            paths.extend(sorted(glob.glob(
                os.path.join(r, f"cluster={int(c)}", "*.parquet"))))
    return paths


def compact_ivf_index(ivf_dir: str) -> int:
    """Move every complete generation's files down into the base
    cluster dirs (names prefixed with the generation so they never
    collide), then drop the generation. Returns #files moved."""
    import shutil

    moved = 0
    for g in _generations(ivf_dir):
        gname = os.path.basename(g)
        for f in sorted(glob.glob(os.path.join(g, "cluster=*", "*.parquet"))):
            cdir = os.path.join(ivf_dir, os.path.basename(os.path.dirname(f)))
            os.makedirs(cdir, exist_ok=True)
            os.rename(f, os.path.join(
                cdir, f"{gname}-{os.path.basename(f)}"))
            moved += 1
        os.remove(os.path.join(g, _GEN_MANIFEST))
        for d in sorted(glob.glob(os.path.join(g, "cluster=*"))):
            os.rmdir(d)
        os.rmdir(g)
    # sweep manifest-less skeletons a crash between the manifest
    # removal and the rmdirs may have left (their files, if any, were
    # already moved — the dirs are empty husks)
    for g in glob.glob(os.path.join(ivf_dir, "gen-*")):
        if not os.path.exists(os.path.join(g, _GEN_MANIFEST)) \
                and not glob.glob(os.path.join(g, "cluster=*", "*.parquet")):
            shutil.rmtree(g, ignore_errors=True)
    return moved


# ------------------------------------------------------- driver entry

def _delta_ivf(sf_dir: str) -> tuple[str, np.ndarray]:
    """Build (or reuse) the delta-exercising IVF: embeddings split by
    vec_id parity — EVEN ids are the base corpus (codebook trained on
    them alone), ODD ids arrive as a delta under the frozen codebook —
    then compacted. Parity (unlike a midpoint) keeps the SQL oracle
    free of table-size constants."""
    from candidategeneration_ray.pipelines.clustering import (
        KMEANS_ITERS, KMEANS_K)
    from candidategeneration_ray.pipelines.docquery import _cache_dir
    from candidategeneration_ray.state import checkpoint as ckpt

    root = _cache_dir(sf_dir, f"ivfdelta-k{KMEANS_K}i{KMEANS_ITERS}")
    done = os.path.join(root, "DONE")
    base_dir = os.path.join(root, "base")
    if os.path.exists(done):
        # the codebook persists with the base layout
        # (build_ivf_kmeans_index's own cache) — single source of truth
        ivf_dir, cent = build_ivf_kmeans_index(base_dir)
        return ivf_dir, cent
    ckpt.clear_stale(root)
    os.makedirs(base_dir, exist_ok=True)

    tab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    ids = tab.column("vec_id").to_numpy()
    import pyarrow.compute as pc

    even = pc.equal(pc.bit_wise_and(tab.column("vec_id"), 1), 0)
    pq.write_table(tab.filter(even), os.path.join(base_dir, "embeddings.parquet"))
    delta_f = os.path.join(root, "delta.parquet")
    pq.write_table(tab.filter(pc.invert(even)), delta_f)
    assert (ids % 2 == 0).any() and (ids % 2 == 1).any(), \
        "parity split needs both halves non-empty"

    ivf_dir, cent = build_ivf_kmeans_index(base_dir)
    # crash hygiene: a previous attempt may have ingested (gen dirs) or
    # compacted (gen-prefixed files in the base cluster dirs) this same
    # delta and died before DONE — reset to the pristine base layout so
    # re-ingest can't double-serve.
    import shutil

    for g in glob.glob(os.path.join(ivf_dir, "gen-*")):
        shutil.rmtree(g, ignore_errors=True)
    for f in glob.glob(os.path.join(ivf_dir, "cluster=*", "gen-*.parquet")):
        os.remove(f)
    update_ivf_index(ivf_dir, cent, delta_f)
    compact_ivf_index(ivf_dir)
    with open(done, "w") as f:
        json.dump({"ivf_dir": ivf_dir}, f)
    return ivf_dir, cent


@ray.remote
def _cluster_stats(files: list[str], cluster: int) -> tuple[int, int, int]:
    if not files:
        return cluster, 0, 0
    t = pq.read_table(files, columns=["vec_id"])
    v = t.column("vec_id").to_numpy()
    return cluster, int(v.size), int(v.sum())


def q_ivf_delta_counts(sf_dir: str) -> pa.Table:
    """Post-delta, post-compaction IVF inverted-list membership:
    (cluster, n_vectors, vec_id_sum) over base+delta — every vector
    assigned under the base-half (even vec_ids) codebook. Vec-id sums
    make the check membership-exact, not just cardinality-exact; one
    Ray task per inverted list."""
    from candidategeneration_ray.pipelines.clustering import KMEANS_K

    ivf_dir, _ = _delta_ivf(sf_dir)
    futs = [
        _cluster_stats.remote(ivf_serving_paths(ivf_dir, [c]), c)
        for c in range(KMEANS_K)
    ]
    rows = sorted(r for r in ray.get(futs) if r[1] > 0)
    return pa.table({
        "cluster": pa.array([r[0] for r in rows], pa.int64()),
        "n_vectors": pa.array([r[1] for r in rows], pa.int64()),
        "vec_id_sum": pa.array([r[2] for r in rows], pa.int64()),
    })
