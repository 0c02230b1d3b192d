"""Distributed k-means over the embeddings table, value-verified.

Lloyd's algorithm is normally unverifiable against SQL because float
summation order differs between a distributed reduce and a single-node
oracle.  This implementation is EXACT and partition-order independent:

- vectors are quantized once by a power-of-two scale (x_q =
  trunc(x * 2^16) — scaling a float by a power of two is exact, so
  numpy and DuckDB compute identical int64 coordinates);
- per-batch partials are integer (cluster, dim, sum) rows merged by one
  groupby — integer addition is associative/commutative, so the merged
  sums are independent of batching;
- the centroid update is integer floor division (floor(sum/count) via
  float64 division is exact here: |sum| < 2^40 and count < 2^31 keep
  the rational's distance from any non-equal integer above the float64
  rounding error);
- assignment minimizes the integer squared L2 distance with a (dist
  asc, cluster asc) tie-break.

Every step is therefore reproducible in DuckDB as ITERS unrolled
CTE pairs (assign_i, centroids_i) — the driver's hash compare is exact,
not float-tolerant.  Scale shape: each iteration is one pass
(map_batches partials -> k*(dim+1)-row groupby -> driver update of the
k x dim codebook); the data is never materialized and the broadcast is
the codebook, not the table.  The codebook doubles as a learned IVF
coarse quantizer (see q_ann_ivf_kmeans_top10).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

KMEANS_K = 8
KMEANS_ITERS = 4
KMEANS_SCALE = 1 << 16          # power of two -> exact quantization
_COUNT_DIM = -1                 # reserved dim row carrying cluster counts


def _embeddings_ds(sf_dir: str) -> ray.data.Dataset:
    """Column-pruned embeddings read with size-aware blocks
    (relational.sized_read policy). Measured round 5: the default
    split shredded the sub-MB bench file into ~200 blocks and every
    consumer paid per-block fixed costs — codebook training 6.6 ->
    2.0 s, kNN graph 1.5 -> 0.6 s at ONE block; per-batch compute
    here is small relative to block overhead all the way up to the
    256 MB cutoff, past which Ray's own heuristic takes over."""
    from candidategeneration_ray.pipelines.relational import sized_read

    return sized_read(sf_dir, "embeddings", ["vec_id", "embedding"])


def _quantize(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy()
    emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
    return ids.astype(np.int64), np.trunc(emb * KMEANS_SCALE).astype(np.int64)


def _assign(xq: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Nearest centroid by integer squared L2; ties -> lowest cluster id.
    dist fits int64: |coord diff| < 2^18, dim<=2^10 -> < 2^47."""
    # (n, k) distances without materializing (n, k, d): ||x||^2 - 2 x.c + ||c||^2
    d2 = (
        (xq * xq).sum(axis=1, keepdims=True)
        - 2 * (xq @ cent.T)
        + (cent * cent).sum(axis=1)[None, :]
    )
    return np.argmin(d2, axis=1).astype(np.int64)  # argmin takes first = lowest id


def _init_centroids(sf_dir: str) -> np.ndarray:
    """Quantized vectors of the K smallest vec_ids: per-batch partial
    bottom-k, then a distributed sort + limit over the k-per-batch
    partials — the driver receives exactly K rows, never the partial
    union (which is k x n_batches rows at scale)."""

    def _partial(batch: pa.Table) -> pa.Table:
        ids, xq = _quantize(batch)
        keep = np.argsort(ids, kind="stable")[:KMEANS_K]
        return pa.table({
            "vec_id": pa.array(ids[keep], pa.int64()),
            "xq": pa.array(list(xq[keep]), pa.list_(pa.int64())),
        })

    rows = (
        _embeddings_ds(sf_dir)
        .map_batches(_partial, batch_format="pyarrow")
        .sort("vec_id")
        .limit(KMEANS_K)
        .take_all()
    )
    return np.array([r["xq"] for r in rows], dtype=np.int64)


def _update_pass(sf_dir: str, cent: np.ndarray) -> np.ndarray:
    """One Lloyd iteration: broadcast codebook, integer partial sums per
    (cluster, dim) + a count row per cluster, one groupby merge, floor
    division on the driver.  Empty clusters keep their centroid."""
    cent_ref = ray.put(cent)

    def _partials(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        _, xq = _quantize(batch)
        if xq.shape[0] == 0:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        a = _assign(xq, c)
        k, dim = c.shape
        out_c, out_d, out_s = [], [], []
        for cl in np.unique(a):
            sums = xq[a == cl].sum(axis=0)
            out_c.append(np.full(dim + 1, cl, dtype=np.int64))
            out_d.append(np.concatenate((np.arange(dim), [_COUNT_DIM])))
            out_s.append(np.concatenate((sums, [int((a == cl).sum())])))
        return pa.table({
            "cluster": pa.array(np.concatenate(out_c), pa.int64()),
            "dim": pa.array(np.concatenate(out_d).astype(np.int64), pa.int64()),
            "s": pa.array(np.concatenate(out_s), pa.int64()),
        })

    merged = (
        _embeddings_ds(sf_dir)
        .map_batches(_partials, batch_format="pyarrow")
        .groupby(["cluster", "dim"])
        .aggregate(Sum("s", alias_name="s"))
        .take_all()
    )
    k, dim = cent.shape
    sums = np.zeros((k, dim), dtype=np.int64)
    counts = np.zeros(k, dtype=np.int64)
    for r in merged:
        if r["dim"] == _COUNT_DIM:
            counts[r["cluster"]] = r["s"]
        else:
            sums[r["cluster"], r["dim"]] = r["s"]
    new = cent.copy()
    nz = counts > 0
    new[nz] = np.floor(sums[nz] / counts[nz, None]).astype(np.int64)
    return new


# in-process memo — three driver entries (centroids, assignments, IVF)
# share one training run per table instead of re-running the Lloyd
# passes; the result is deterministic so memoization is transparent
_CODEBOOK_MEMO: dict[str, np.ndarray] = {}


def kmeans_codebook(sf_dir: str) -> np.ndarray:
    """The (k, dim) int64 codebook after KMEANS_ITERS Lloyd passes."""
    key = os.path.realpath(sf_dir)
    if key not in _CODEBOOK_MEMO:
        cent = _init_centroids(sf_dir)
        for _ in range(KMEANS_ITERS):
            cent = _update_pass(sf_dir, cent)
        _CODEBOOK_MEMO[key] = cent
    return _CODEBOOK_MEMO[key].copy()


def q_kmeans_centroids(sf_dir: str) -> pa.Table:
    """Final quantized centroids, long form (cluster, dim, centroid_q)."""
    cent = kmeans_codebook(sf_dir)
    k, dim = cent.shape
    return pa.table({
        "cluster": pa.array(np.repeat(np.arange(k), dim), pa.int64()),
        "dim": pa.array(np.tile(np.arange(dim), k), pa.int64()),
        "centroid_q": pa.array(cent.ravel(), pa.int64()),
    })


def q_kmeans_assignments(sf_dir: str) -> ray.data.Dataset:
    """(vec_id, cluster) under the final codebook — one extra assign
    pass with the broadcast codebook; fully streaming."""
    cent_ref = ray.put(kmeans_codebook(sf_dir))

    def _assign_batch(batch: pa.Table) -> pa.Table:
        ids, xq = _quantize(batch)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(_assign(xq, ray.get(cent_ref)), pa.int64()),
        })

    return _embeddings_ds(sf_dir).map_batches(
        _assign_batch, batch_format="pyarrow")


def q_silhouette_ppm(sf_dir: str) -> ray.data.Dataset:
    """Simplified (centroid) silhouette per vector — the INTERNAL
    clustering-quality metric the eval family lacked (purity/ARI need
    ground-truth labels; silhouette scores the geometry itself):
    a = integer squared-L2 to the OWN (nearest) centroid, b = min over
    the other centroids, s_ppm = 10⁶·(b − a) // max(a, b, 1). With the
    own centroid the argmin, a ≤ b, so s_ppm ∈ [0, 10⁶]; near-0 rows
    sit on a cluster boundary, near-10⁶ rows are well separated. The
    centroid-simplified form (Hruschka et al.) is THE scale path — the
    classic silhouette's pairwise means are quadratic; this is one
    broadcast codebook pass, exact integers end to end.

    Shape: one map_batches with the broadcast (k, dim) codebook; no
    shuffle. Output (vec_id, cluster, s_ppm)."""
    cent_ref = ray.put(kmeans_codebook(sf_dir))

    def _sil(batch: pa.Table) -> pa.Table:
        ids, xq = _quantize(batch)
        cent = ray.get(cent_ref)
        d2 = ((xq * xq).sum(axis=1, keepdims=True)
              - 2 * (xq @ cent.T)
              + (cent * cent).sum(axis=1)[None, :])
        own = np.argmin(d2, axis=1)
        a = d2[np.arange(ids.size), own]
        d2[np.arange(ids.size), own] = np.int64(1) << np.int64(62)
        b = d2.min(axis=1)
        # 10^6 * d2 can pass 2^63 (d2 < 2^47) — bigint the numerator
        s = ((b - a).astype(object) * 10 ** 6
             // np.maximum(np.maximum(a, b), 1).astype(object))
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(own.astype(np.int64), pa.int64()),
            "s_ppm": pa.array(s.astype(np.int64), pa.int64()),
        })

    return _embeddings_ds(sf_dir).map_batches(_sil, batch_format="pyarrow")


# ------------------------------------------------- learned-codebook IVF

IVF_NPROBE = 3


def build_ivf_kmeans_index(sf_dir: str) -> tuple[str, np.ndarray]:
    """Persist the learned-codebook IVF layout once: train the k-means
    codebook, assign every vector, and write the table hive-partitioned
    by cluster (one directory per inverted list — the embedding analog
    of the bucket-partitioned posting segments).  Query-time probing
    reads only the probed clusters' directories.  The codebook is
    persisted next to the layout so serving never retrains; the
    manifest keys on the source file (lineage), so a changed table
    rebuilds."""
    import json

    from candidategeneration_ray.pipelines.docquery import _cache_dir
    from candidategeneration_ray.state import checkpoint as ckpt

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    out = _cache_dir(sf_dir, f"ivfkm-k{KMEANS_K}i{KMEANS_ITERS}")
    cb_path = os.path.join(out, "codebook.json")
    if ckpt.is_complete(out, [emb_path]):
        cent = np.array(json.load(open(cb_path)), dtype=np.int64)
        return out, cent
    ckpt.clear_stale(out)
    cent = kmeans_codebook(sf_dir)
    cent_ref = ray.put(cent)

    def _code(batch: pa.Table) -> pa.Table:
        _, xq = _quantize(batch)
        return batch.append_column(
            "cluster", pa.array(_assign(xq, ray.get(cent_ref)), pa.int64()))

    os.makedirs(out, exist_ok=True)
    ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"]) \
        .map_batches(_code, batch_format="pyarrow") \
        .write_parquet(out, partition_cols=["cluster"])
    json.dump(cent.tolist(), open(cb_path, "w"))
    ckpt.write_manifest(out, {"phase": "ivf-kmeans", "inputs": [emb_path],
                              "k": KMEANS_K, "iters": KMEANS_ITERS})
    return out, cent


def ivf_kmeans_probe_paths(ivf_dir: str, clusters) -> list[str]:
    import glob

    paths = []
    for c in clusters:
        paths.extend(sorted(glob.glob(
            os.path.join(ivf_dir, f"cluster={int(c)}", "*.parquet"))))
    return paths


def q_ann_ivf_kmeans_top10(sf_dir: str, nprobe: int = IVF_NPROBE) -> pa.Table:
    """ANN top-10 through the LEARNED IVF: probe the query's `nprobe`
    nearest centroids (same integer L2 as training), bucket-pruned read
    of only those inverted lists, exact cosine + partial top-k within.
    Approximate by design (recall vs the brute-force twin asserted in
    pytest); the trained codebook probes the true neighborhood far more
    sharply than the hyperplane-sign variant at equal probe budget."""
    from candidategeneration_ray.pipelines.extras import (
        _emb_matrix, _read_query_vec)

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    ivf_dir, cent = build_ivf_kmeans_index(sf_dir)
    qv = _read_query_vec(emb_path)
    xq = np.trunc(qv[None, :] * KMEANS_SCALE).astype(np.int64)
    d2 = ((xq - cent) ** 2).sum(axis=1)
    probe = np.sort(np.argsort(d2, kind="stable")[:nprobe])
    files = ivf_kmeans_probe_paths(ivf_dir, probe)
    if not files:
        return pa.table({"rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64())})
    qn = qv / np.linalg.norm(qv)
    q_ref = ray.put(qn)

    def _score(batch: pa.Table, *, _c={}) -> pa.Table:
        if "q" not in _c:
            _c["q"] = ray.get(q_ref)
        ids, mat = _emb_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        cos = (mat @ _c["q"]) / np.where(norms == 0, 1.0, norms)
        top = np.lexsort((ids, -cos))[:10]
        return pa.table({
            "vec_id": pa.array(ids[top], pa.int64()),
            "cos": pa.array(cos[top], pa.float64()),
        })

    parts = ray.data.read_parquet(files, columns=["vec_id", "embedding"]) \
        .map_batches(_score, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["cos", "vec_id"],
                              ascending=[False, True]).head(10)
    return pa.table({
        "rank": pa.array(np.arange(1, len(parts) + 1, dtype=np.int64),
                         pa.int64()),
        "vec_id": pa.array(parts["vec_id"].to_numpy(np.int64), pa.int64()),
    })


# ------------------------------------------------------ exact kNN graph

KNN_K = 3


def _graph_buckets() -> int:
    """Node-hash bucket count for the graph operators (kNN merge,
    PageRank scatter), scaled with the cluster like the event-stream
    user buckets: one bucket = one vectorized task over ~n/buckets
    nodes, so per-node work is numpy, never a Python call per node.
    Results are bucket-count independent (bucketing only partitions
    the groupby)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        cpus = 16
    return max(32, 4 * cpus)


def q_knn_graph(sf_dir: str, k: int = KNN_K, n_blocks: int = 4) -> ray.data.Dataset:
    """EXACT k-nearest-neighbor graph over the embeddings (the seed
    structure for graph clustering / diversity filtering): for every
    vector its k nearest others by (integer squared L2 asc, nbr_id asc),
    value-verified because the quantized distances are exact integers.

    Same block-pair all-pairs decomposition as q_embedding_neardups
    (extras.py): each pair-group computes one bounded distance matrix
    and emits per-vector PARTIAL top-k rows (both directions for
    off-diagonal groups); groupby(vec_id) then merges <= n_blocks
    partials per vector into the final top-k. No task holds more than
    2/n_blocks of the table; the merge shuffles k*n_blocks rows per
    vector, not distances.

    The result is memoized MATERIALIZED per (table, k, n_blocks) — five
    graph entries (pagerank, ppr, hits, label vote, triangles) consume
    the same deterministic graph; the driver's sweep runs them in one
    process, so the all-pairs pass runs once, not five times (the same
    pattern as the kmeans codebook memo)."""
    memo_key = (os.path.realpath(sf_dir), k, n_blocks)
    if memo_key in _KNN_MEMO:
        return _KNN_MEMO[memo_key]

    def _expand(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy().astype(np.int64)
        blk = (ids % n_blocks).astype(np.int64)
        pair_of = np.empty((n_blocks, n_blocks), dtype=np.int64)
        side_of = np.empty((n_blocks, n_blocks), dtype=np.int64)
        for a in range(n_blocks):
            for b in range(n_blocks):
                lo, hi = min(a, b), max(a, b)
                pair_of[a, b] = lo * n_blocks + hi
                side_of[a, b] = 0 if a == lo else 1
        take = np.repeat(np.arange(ids.size), n_blocks)
        pair_id = pair_of[np.repeat(blk, n_blocks),
                          np.tile(np.arange(n_blocks), ids.size)]
        side = side_of[np.repeat(blk, n_blocks),
                       np.tile(np.arange(n_blocks), ids.size)]
        rep = batch.take(take)
        return pa.table({
            "pair_id": pa.array(pair_id, pa.int64()),
            "side": pa.array(side, pa.int64()),
            "vec_id": rep.column("vec_id").cast(pa.int64()),
            "embedding": rep.column("embedding"),
        })

    def _partial_topk(ids_a, xa, ids_b, xb, exclude_self: bool):
        """Per-row top-k of a (len(a), len(b)) integer distance matrix."""
        d2 = ((xa * xa).sum(1, keepdims=True) - 2 * (xa @ xb.T)
              + (xb * xb).sum(1)[None, :])
        if exclude_self:
            self_m = ids_a[:, None] == ids_b[None, :]
            d2 = np.where(self_m, np.iinfo(np.int64).max, d2)
        kk = min(k, ids_b.size - (1 if exclude_self else 0))
        if kk <= 0:
            return (np.empty(0, np.int64),) * 3
        # lexsort per row on (d2, nbr_id): sort a composite is overkill —
        # argsort d2 then stable tie-break via nbr order within equal d2
        order = np.lexsort((np.broadcast_to(ids_b, d2.shape), d2), axis=1)[:, :kk]
        rows = np.repeat(ids_a, kk)
        cols = order.ravel()
        return rows, ids_b[cols], d2[np.repeat(np.arange(ids_a.size), kk), cols]

    def _score_group(group: pa.Table) -> pa.Table:
        from candidategeneration_ray.pipelines.extras import _emb_matrix

        pair_id = int(group.column("pair_id")[0].as_py())
        i, j = divmod(pair_id, n_blocks)
        side = group.column("side").to_numpy().astype(np.int64)
        ids, mat = _emb_matrix(group)
        xq = np.trunc(mat * KMEANS_SCALE).astype(np.int64)
        if i == j:
            m0 = side == 0
            out = [_partial_topk(ids[m0], xq[m0], ids[m0], xq[m0], True)]
        else:
            m0, m1 = side == 0, side == 1
            out = [_partial_topk(ids[m0], xq[m0], ids[m1], xq[m1], False),
                   _partial_topk(ids[m1], xq[m1], ids[m0], xq[m0], False)]
        return pa.table({
            "vec_id": pa.array(np.concatenate([o[0] for o in out]), pa.int64()),
            "nbr_id": pa.array(np.concatenate([o[1] for o in out]), pa.int64()),
            "d2": pa.array(np.concatenate([o[2] for o in out]), pa.int64()),
        })

    nbk = _graph_buckets()

    def _tag_bucket(batch: pa.Table) -> pa.Table:
        vec = batch.column("vec_id").to_numpy().astype(np.int64)
        return batch.append_column("bkt", pa.array(vec % nbk, pa.int64()))

    def _merge_bucket(group: pa.Table) -> pa.Table:
        """Vectorized per-bucket merge: ONE lexsort + rank-within-vector
        selection for the whole bucket's partials — no per-node Python
        (a 10^12-node graph must not pay a Python call per node)."""
        vec = group.column("vec_id").to_numpy().astype(np.int64)
        nbr = group.column("nbr_id").to_numpy().astype(np.int64)
        d2 = group.column("d2").to_numpy().astype(np.int64)
        order = np.lexsort((nbr, d2, vec))
        v = vec[order]
        first = np.r_[True, v[1:] != v[:-1]]
        starts = np.flatnonzero(first)
        rank = np.arange(v.size, dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, v.size]))
        sel = rank < k
        o = order[sel]
        return pa.table({
            "vec_id": pa.array(v[sel], pa.int64()),
            "rank": pa.array(rank[sel] + 1, pa.int64()),
            "nbr_id": pa.array(nbr[o], pa.int64()),
            "d2": pa.array(d2[o], pa.int64()),
        })

    out = (
        _embeddings_ds(sf_dir)
        .map_batches(_expand, batch_format="pyarrow")
        .groupby("pair_id").map_groups(_score_group, batch_format="pyarrow")
        .map_batches(_tag_bucket, batch_format="pyarrow")
        .groupby("bkt").map_groups(_merge_bucket, batch_format="pyarrow")
    ).materialize()
    _KNN_MEMO[memo_key] = out
    return out


# in-process memo of the materialized kNN graph (see the docstring)
_KNN_MEMO: dict[tuple, ray.data.Dataset] = {}


# ------------------------------------------- SemDeDup (cluster-then-dedup)

def q_semantic_neardups(sf_dir: str, threshold_pct: int = 40) -> ray.data.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    recipe): exact cosine near-dup pairs RESTRICTED to vectors in the
    same k-means cluster, so the candidate-pair space shrinks from n^2
    to sum(c_i^2) — the clustered analog of q_embedding_neardups whose
    codebook is the value-verified Lloyd run above.

    Shape: one assign pass with the broadcast codebook, then
    groupby(cluster).map_groups with ONE bounded matmul per cluster.
    KMEANS_K should scale with the corpus so expected cluster size
    stays task-bounded; a monster cluster takes the block-pair
    decomposition WITHIN the cluster (the q_embedding_neardups shape
    keyed by (cluster, pair_id)) — documented, not needed at the
    driver scales.

    Returns (cluster, vec_a, vec_b), vec_a < vec_b, cosine*100 >=
    threshold_pct."""
    from candidategeneration_ray.pipelines.extras import _emb_matrix

    cent_ref = ray.put(kmeans_codebook(sf_dir))

    def _assign_batch(batch: pa.Table) -> pa.Table:
        _, xq = _quantize(batch)
        return batch.append_column(
            "cluster", pa.array(_assign(xq, ray.get(cent_ref)), pa.int64()))

    def _pairs(group: pa.Table) -> pa.Table:
        cl = int(group.column("cluster")[0].as_py())
        ids, mat = _emb_matrix(group)
        norms = np.linalg.norm(mat, axis=1)
        unit = mat / np.where(norms == 0, 1.0, norms)[:, None]
        cos = unit @ unit.T
        ia, ib = np.triu_indices(ids.size, k=1)
        keep = cos[ia, ib] * 100 >= threshold_pct
        a, b = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({
            "cluster": pa.array(np.full(lo.size, cl, np.int64), pa.int64()),
            "vec_a": pa.array(lo, pa.int64()),
            "vec_b": pa.array(hi, pa.int64()),
        })

    return (
        _embeddings_ds(sf_dir)
        .map_batches(_assign_batch, batch_format="pyarrow")
        .groupby("cluster").map_groups(_pairs, batch_format="pyarrow")
    )


# --------------------------------------- integer PageRank over kNN graph

PR_ITERS = 3
PR_SCALE = 1_000_000          # rank fixed-point scale
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def q_pagerank(sf_dir: str, iters: int = PR_ITERS,
               small_graph_max_edges: int = 2_500_000
               ) -> ray.data.Dataset:
    """Integer PageRank over the exact kNN graph — the representative
    ITERATIVE graph algorithm on Ray Data (the same family as label
    propagation in q_dup_clusters). Fixed-point arithmetic makes every
    iteration exact and partition-independent, so the DuckDB oracle
    unrolls the iterations and the driver's hash compare is exact:

        r0(v)   = S                       (S = 1e6)
        give(u) = (85 * r(u)) // (100 * deg)
        r'(v)   = (15 * S) // 100 + sum_{u->v} give(u)

    deg is the kNN constant min(k, n-1) — every vector has exactly
    that many out-edges, so there are no dangling nodes.

    Shape: ONE bounded shuffle per iteration. The static structure
    (out-edges + a node row per vector, both keyed by node-hash
    bucket) is materialized once into the object store; each round is
    a single groupby(bkt) whose task (a) reconstructs this bucket's
    ranks from the PREVIOUS round's contribution rows (base + in-bucket
    sum — the aggregation is fused into the scatter instead of being
    its own shuffle) and (b) scatters the new per-edge contributions
    keyed by the TARGET's bucket. All per-node work is one sort + two
    searchsorteds per bucket — no Python call per node, nothing on the
    driver. A final groupby materializes the last ranks.

    Returns (vec_id, pagerank) for every vector."""
    return _pagerank_rounds(sf_dir, iters, seed_mod=None,
                            out_col="pagerank",
                            small_graph_max_edges=small_graph_max_edges)


PPR_SEED_MOD = 10   # vec_id % 10 == 0 are the personalization seeds


def q_personalized_pagerank(sf_dir: str, iters: int = PR_ITERS,
                            seed_mod: int = PPR_SEED_MOD,
                            small_graph_max_edges: int = 2_500_000
                            ) -> ray.data.Dataset:
    """PERSONALIZED PageRank: teleport mass goes only to the seed set
    (vec_id % seed_mod == 0) — the seeded-relevance propagation used
    for 'expand this trusted subset' curation (find documents
    graph-close to a vetted seed corpus). Same integer recurrence as
    q_pagerank but r0 and the restart term are seed-conditional:

        r0(v)   = S·[v ∈ seeds]
        r'(v)   = (15·S)//100·[v ∈ seeds] + Σ_{u→v} give(u)

    Non-seed nodes score only what the graph walks into them — the
    score IS the seed-proximity measure. Same one-shuffle-per-round
    scatter as q_pagerank (shared machinery), same unrolled-oracle
    verification. Returns (vec_id, ppr)."""
    if seed_mod < 1:
        raise ValueError("seed_mod must be >= 1")
    return _pagerank_rounds(sf_dir, iters, seed_mod=seed_mod,
                            out_col="ppr",
                            small_graph_max_edges=small_graph_max_edges)


@ray.remote
def _small_graph_pagerank(iters: int, seed_mod, deg: int, base: int,
                          out_col: str, *tables: pa.Table) -> pa.Table:
    """Task-sized exact replica of the staged rounds' integer
    recurrence (same floor-divided give, same seed-conditional base)
    over object-store kNN blocks — the bounded fast path the
    iterative-graph family uses (HITS/SSSP pattern); equality to the
    staged route is pytest-forced via the cap."""
    tabs = [t for t in tables if t.num_rows > 0]
    if not tabs:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         out_col: pa.array([], pa.int64())})
    vec = np.concatenate([t.column("vec_id").to_numpy().astype(np.int64)
                          for t in tabs])
    nbr = np.concatenate([t.column("nbr_id").to_numpy().astype(np.int64)
                          for t in tabs])
    nodes = np.unique(vec)
    src = np.searchsorted(nodes, vec)
    dst = np.minimum(np.searchsorted(nodes, nbr), nodes.size - 1)
    if not bool((nodes[dst] == nbr).all()):
        # nodes come from the SOURCE column; a producer emitting an
        # edge into a node with no outgoing edges would silently
        # credit rank mass to the wrong node — fail loudly instead
        raise ValueError("kNN edge targets a vec_id absent from the "
                         "source column; _small_graph_pagerank needs "
                         "every nbr_id to appear as a vec_id")
    seed = np.ones(nodes.size, bool) if seed_mod is None \
        else nodes % seed_mod == 0
    r = np.where(seed, np.int64(PR_SCALE), np.int64(0))
    for _ in range(iters):
        give = (PR_DAMP_NUM * r) // (PR_DAMP_DEN * deg) if deg > 0 \
            else np.zeros(nodes.size, np.int64)
        nxt = np.where(seed, np.int64(base), np.int64(0))
        np.add.at(nxt, dst, give[src])
        r = nxt
    return pa.table({"vec_id": pa.array(nodes, pa.int64()),
                     out_col: pa.array(r, pa.int64())})


def _pagerank_rounds(sf_dir: str, iters: int, seed_mod: int | None,
                     out_col: str,
                     small_graph_max_edges: int = 2_500_000
                     ) -> ray.data.Dataset:
    """Shared PageRank machinery; seed_mod=None = uniform teleport,
    else teleport only to nodes with node % seed_mod == 0."""
    n = _embeddings_ds(sf_dir).count()
    deg = min(KNN_K, n - 1)
    base = (100 - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN
    nbk = _graph_buckets()

    knn = q_knn_graph(sf_dir).materialize()
    if knn.count() <= small_graph_max_edges:
        refs = (knn.select_columns(["vec_id", "nbr_id"])
                .materialize().to_arrow_refs())
        return ray.data.from_arrow_refs([_small_graph_pagerank.remote(
            iters, seed_mod, deg, base, out_col, *refs)])

    def _seed_mask(nodes: np.ndarray) -> np.ndarray:
        if seed_mod is None:
            return np.ones(nodes.size, bool)
        return nodes % seed_mod == 0

    # row kinds in the union: node row (dst = -1), edge row (dst >= 0),
    # contribution row (dst = -2, give = value targeted at `node`)
    def _static_rows(b: pa.Table) -> pa.Table:
        vec = b.column("vec_id").to_numpy().astype(np.int64)
        nbr = b.column("nbr_id").to_numpy().astype(np.int64)
        # one node row per vector: its rank-1 edge row (batch-boundary
        # proof, unlike adjacent-difference dedup)
        nodes = vec[b.column("rank").to_numpy().astype(np.int64) == 1]
        return pa.table({
            "bkt": pa.array(np.concatenate((vec, nodes)) % nbk, pa.int64()),
            "node": pa.array(np.concatenate((vec, nodes)), pa.int64()),
            "dst": pa.array(
                np.concatenate((nbr, np.full(nodes.size, -1, np.int64))),
                pa.int64()),
            "give": pa.array(
                np.zeros(vec.size + nodes.size, np.int64), pa.int64()),
        })

    static = knn.map_batches(
        _static_rows, batch_format="pyarrow").materialize()

    def _bucket_ranks(group: pa.Table, first: bool):
        """(sorted node array, rank array) for one bucket."""
        node = group.column("node").to_numpy().astype(np.int64)
        dst = group.column("dst").to_numpy().astype(np.int64)
        give = group.column("give").to_numpy().astype(np.int64)
        rn = np.sort(node[dst == -1])
        seed = _seed_mask(rn)
        if first:
            return rn, np.where(seed, PR_SCALE, 0).astype(np.int64)
        rv = np.where(seed, base, 0).astype(np.int64)
        is_con = dst == -2
        np.add.at(rv, np.searchsorted(rn, node[is_con]), give[is_con])
        return rn, rv

    def _make_round(first: bool):
        def _round(group: pa.Table) -> pa.Table:
            node = group.column("node").to_numpy().astype(np.int64)
            dst = group.column("dst").to_numpy().astype(np.int64)
            rn, rv = _bucket_ranks(group, first)
            give_n = (PR_DAMP_NUM * rv) // (PR_DAMP_DEN * deg) if deg > 0 \
                else np.zeros(rn.size, np.int64)
            is_edge = dst >= 0
            es, ed = node[is_edge], dst[is_edge]
            return pa.table({
                "bkt": pa.array(ed % nbk, pa.int64()),
                "node": pa.array(ed, pa.int64()),
                "dst": pa.array(np.full(ed.size, -2, np.int64), pa.int64()),
                "give": pa.array(give_n[np.searchsorted(rn, es)], pa.int64()),
            })
        return _round

    def _final(group: pa.Table) -> pa.Table:
        rn, rv = _bucket_ranks(group, False)
        return pa.table({
            "vec_id": pa.array(rn, pa.int64()),
            out_col: pa.array(rv, pa.int64()),
        })

    cur = static
    for t in range(iters):
        contribs = cur.groupby("bkt").map_groups(
            _make_round(t == 0), batch_format="pyarrow")
        cur = static.union(contribs)
    if iters == 0:
        return static.groupby("bkt").map_groups(
            lambda g: (lambda rn, rv: pa.table({
                "vec_id": pa.array(rn, pa.int64()),
                out_col: pa.array(rv, pa.int64()),
            }))(*_bucket_ranks(g, True)), batch_format="pyarrow")
    return cur.groupby("bkt").map_groups(_final, batch_format="pyarrow")


# ------------------------------------------- multi-source BFS hops

BFS_SEED_MOD = 17     # vec_id % 17 == 0 are the BFS sources
BFS_MAX_HOPS = 4      # exact distances up to this cap; beyond = -1
_BFS_INF = np.int64(1) << np.int64(60)


def q_bfs_hops(sf_dir: str, max_hops: int = BFS_MAX_HOPS,
               seed_mod: int = BFS_SEED_MOD) -> ray.data.Dataset:
    """Multi-source BFS over the undirected kNN graph — hop distance
    from the nearest seed (vec_id % seed_mod == 0), exact up to
    `max_hops`, -1 beyond. The graph-proximity labeling used for
    'how far is each document from a vetted seed set' curation; the
    third member of the iterative-graph family (pagerank = sum-combine,
    dup_clusters = min-LABEL-combine, this = min-DISTANCE-combine,
    which converges by frontier rather than by fixed point).

    Shape (same scatter skeleton as _pagerank_rounds): the symmetrized
    edge set and one node row per vector are keyed by node-hash bucket
    and materialized once; each of the `max_hops` rounds is ONE
    groupby(bkt) whose task (a) folds incoming distance rows into this
    bucket's current distances with np.minimum.at, (b) re-emits the
    carry rows, and (c) scatters dist+1 to each out-edge whose source
    is already reached (frontier-bounded: candidates beyond the cap are
    never emitted). All per-node work is a sort + searchsorteds; the
    driver holds nothing. A node at distance d gets its exact value in
    round d, so `max_hops` rounds are sufficient — the DuckDB oracle
    unrolls the same recurrence round for round and the compare is
    exact. Returns (vec_id, hops) for every vector."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    nbk = _graph_buckets()
    cap = np.int64(max_hops)

    # row kinds: edge row (dst >= 0), node row (dst == -1),
    # distance row (dst == -2, give = current hop count for `node`)
    def _static_rows(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy().astype(np.int64)
        v = b.column("v").to_numpy().astype(np.int64)
        src = np.concatenate((u, v))
        dst = np.concatenate((v, u))
        return pa.table({
            "bkt": pa.array(src % nbk, pa.int64()),
            "node": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "give": pa.array(np.zeros(src.size, np.int64), pa.int64()),
        })

    def _node_rows(b: pa.Table) -> pa.Table:
        vec = b.column("vec_id").to_numpy().astype(np.int64)
        return pa.table({
            "bkt": pa.array(vec % nbk, pa.int64()),
            "node": pa.array(vec, pa.int64()),
            "dst": pa.array(np.full(vec.size, -1, np.int64), pa.int64()),
            "give": pa.array(np.zeros(vec.size, np.int64), pa.int64()),
        })

    static = (_knn_undirected_edges(sf_dir)
              .map_batches(_static_rows, batch_format="pyarrow")
              .union(_embeddings_ds(sf_dir)
                     .select_columns(["vec_id"])
                     .map_batches(_node_rows, batch_format="pyarrow"))
              .materialize())

    def _bucket_dists(group: pa.Table, first: bool):
        node = group.column("node").to_numpy().astype(np.int64)
        dst = group.column("dst").to_numpy().astype(np.int64)
        give = group.column("give").to_numpy().astype(np.int64)
        rn = np.sort(node[dst == -1])
        dv = np.where(rn % seed_mod == 0, np.int64(0), _BFS_INF)
        if not first:
            is_d = dst == -2
            np.minimum.at(dv, np.searchsorted(rn, node[is_d]), give[is_d])
        return rn, dv

    def _make_round(first: bool):
        def _round(group: pa.Table) -> pa.Table:
            node = group.column("node").to_numpy().astype(np.int64)
            dst = group.column("dst").to_numpy().astype(np.int64)
            rn, dv = _bucket_dists(group, first)
            is_edge = dst >= 0
            es, ed = node[is_edge], dst[is_edge]
            sd = dv[np.searchsorted(rn, es)]
            live = sd < cap          # dist+1 > cap can never be output
            reached = dv < _BFS_INF  # carry only reached nodes
            out_node = np.concatenate((rn[reached], ed[live]))
            out_give = np.concatenate((dv[reached], sd[live] + 1))
            return pa.table({
                "bkt": pa.array(out_node % nbk, pa.int64()),
                "node": pa.array(out_node, pa.int64()),
                "dst": pa.array(np.full(out_node.size, -2, np.int64),
                                pa.int64()),
                "give": pa.array(out_give, pa.int64()),
            })
        return _round

    def _final(group: pa.Table) -> pa.Table:
        rn, dv = _bucket_dists(group, False)
        return pa.table({
            "vec_id": pa.array(rn, pa.int64()),
            "hops": pa.array(np.where(dv <= cap, dv, np.int64(-1)),
                             pa.int64()),
        })

    cur = static
    for t in range(max_hops):
        dists = cur.groupby("bkt").map_groups(
            _make_round(t == 0), batch_format="pyarrow")
        cur = static.union(dists)
    return cur.groupby("bkt").map_groups(_final, batch_format="pyarrow")


# ----------------------------- pivot-based harmonic centrality

HC_SEED_MOD = 17      # vec_id % 17 == 0 are the pivot sources
HC_MAX_HOPS = 4       # distances counted up to this cap
# floor(1e6 / d) — the bounded-domain reciprocal LUT (shared rule with
# the adamic_adar/entropy LUT pattern: tiny domain, exact integers)
HC_PPM = {d: 10 ** 6 // d for d in range(1, HC_MAX_HOPS + 1)}


@ray.remote
def _small_graph_harmonic(max_hops: int, seed_mod: int, lut: np.ndarray,
                          n_edge_tables: int, *tables: pa.Table) -> pa.Table:
    """Bounded fast path: labeled multi-source BFS in one numpy task
    over the object-store edge blocks — EXACTLY the staged rounds'
    function (dist_{t+1}[v, s] = min over in-edges of dist_t[u, s]+1,
    hop-capped), on a dense (nodes × pivots) distance matrix."""
    edge_tabs = [t for t in tables[:n_edge_tables] if t.num_rows > 0]
    node_tabs = [t for t in tables[n_edge_tables:] if t.num_rows > 0]
    vec = np.sort(np.concatenate(
        [t.column("vec_id").to_numpy().astype(np.int64)
         for t in node_tabs]))
    piv = vec[vec % seed_mod == 0]
    inf = np.int64(1) << np.int64(40)
    d = np.full((vec.size, piv.size), inf, np.int64)
    d[np.searchsorted(vec, piv), np.arange(piv.size)] = 0
    if edge_tabs and piv.size:
        u = np.concatenate([t.column("u").to_numpy().astype(np.int64)
                            for t in edge_tabs])
        v = np.concatenate([t.column("v").to_numpy().astype(np.int64)
                            for t in edge_tabs])
        src = np.searchsorted(vec, np.concatenate((u, v)))
        dst = np.searchsorted(vec, np.concatenate((v, u)))
        # chunk the scatter so the (chunk × pivots) gather temp stays
        # bounded regardless of edge count (review finding)
        chunk = max(1, 4_000_000 // max(piv.size, 1))
        for _ in range(max_hops):
            for lo in range(0, src.size, chunk):
                hi = lo + chunk
                np.minimum.at(d, dst[lo:hi], d[src[lo:hi]] + 1)
    reach = (d >= 1) & (d <= max_hops)
    # a pivot can't count itself: its own column holds 0, never >= 1
    return pa.table({
        "vec_id": pa.array(vec, pa.int64()),
        "n_reached": pa.array(reach.sum(axis=1).astype(np.int64),
                              pa.int64()),
        "harmonic_ppm": pa.array(
            (lut[np.where(reach, d, 0)]).sum(axis=1).astype(np.int64),
            pa.int64()),
    })


def q_harmonic_centrality(sf_dir: str, max_hops: int = HC_MAX_HOPS,
                          seed_mod: int = HC_SEED_MOD,
                          small_graph_max_edges: int = 2_500_000
                          ) -> ray.data.Dataset:
    """Pivot-based harmonic centrality over the undirected kNN graph
    (Boldi & Vigna "Axioms for centrality" 2014; pivot sampling is the
    HyperBall-class scale path — exact all-pairs closeness is
    quadratic, so production centrality picks O(1/ε²) pivots): for
    each node, H(v) = Σ over pivot sources s ≠ v within `max_hops` of
    floor(1e6 / d(s, v)) — the closeness-family centrality the graph
    suite lacked (PageRank/HITS rank by propagation, k-core/truss by
    cohesion; harmonic ranks by DISTANCE). Pivots are deterministic
    (vec_id % seed_mod == 0), so given the declared pivot set the
    value is exact and the oracle unrolls the same labeled-BFS
    recurrence round for round.

    Shape: the bfs_hops scatter skeleton lifted to LABELED pairs —
    per (node-hash bucket) round task folds incoming (node, src, d)
    rows with one lexsort-min, re-emits carries, and scatters d+1
    along out-edges with the repeat/range-gather expansion (pair
    volume ≤ nodes × pivots, the declared sampling budget; no
    per-edge Python). Output (vec_id, n_reached, harmonic_ppm) for
    every vector."""
    if max_hops < 1 or max_hops > HC_MAX_HOPS:
        raise ValueError("max_hops must be in 1..HC_MAX_HOPS")
    nbk = _graph_buckets()
    cap = np.int64(max_hops)
    lut0 = np.zeros(max_hops + 1, np.int64)
    for d_, p_ in HC_PPM.items():
        if d_ <= max_hops:
            lut0[d_] = p_

    knn_edges = _knn_undirected_edges(sf_dir).materialize()
    n_vecs = _embeddings_ds(sf_dir).count()
    # the fast path's dense state is (nodes × pivots) — bound THAT,
    # not just edges (review finding: an edge cap alone lets a 100k-
    # node graph allocate a multi-GB matrix in one task)
    pair_state = n_vecs * (n_vecs // seed_mod + 1)
    if (knn_edges.count() <= small_graph_max_edges
            and pair_state <= 50_000_000):
        # bounded fast path (the sssp/dup_clusters pattern): one task
        # over the edge blocks, identical per-round semantics — the
        # staged path below stays the >cap route (equality pytest)
        edge_refs = knn_edges.to_arrow_refs()
        node_refs = (_embeddings_ds(sf_dir).select_columns(["vec_id"])
                     .to_arrow_refs())
        return ray.data.from_arrow_refs([_small_graph_harmonic.remote(
            max_hops, seed_mod, lut0, len(edge_refs),
            *edge_refs, *node_refs)])

    # row kinds: edge row (dst >= 0), node row (dst == -1),
    # pair row (dst == -2: src = pivot node id, give = distance)
    def _static_rows(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy().astype(np.int64)
        v = b.column("v").to_numpy().astype(np.int64)
        src = np.concatenate((u, v))
        dst = np.concatenate((v, u))
        z = np.zeros(src.size, np.int64)
        return pa.table({
            "bkt": pa.array(src % nbk, pa.int64()),
            "node": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "src": pa.array(z - 1, pa.int64()),
            "give": pa.array(z, pa.int64()),
        })

    def _node_rows(b: pa.Table) -> pa.Table:
        vec = b.column("vec_id").to_numpy().astype(np.int64)
        z = np.zeros(vec.size, np.int64)
        return pa.table({
            "bkt": pa.array(vec % nbk, pa.int64()),
            "node": pa.array(vec, pa.int64()),
            "dst": pa.array(z - 1, pa.int64()),
            "src": pa.array(z - 1, pa.int64()),
            "give": pa.array(z, pa.int64()),
        })

    static = (knn_edges
              .map_batches(_static_rows, batch_format="pyarrow")
              .union(_embeddings_ds(sf_dir)
                     .select_columns(["vec_id"])
                     .map_batches(_node_rows, batch_format="pyarrow"))
              .materialize())

    def _bucket_pairs(group: pa.Table, first: bool):
        """Fold this bucket's pair rows to min d per (node, src); in
        the first round seed (s, s, 0) from the bucket's pivots."""
        node = group.column("node").to_numpy().astype(np.int64)
        dst = group.column("dst").to_numpy().astype(np.int64)
        if first:
            pivots = np.unique(node[(dst == -1) & (node % seed_mod == 0)])
            return pivots, pivots.copy(), np.zeros(pivots.size, np.int64)
        is_p = dst == -2
        pn = node[is_p]
        ps = group.column("src").to_numpy().astype(np.int64)[is_p]
        pd = group.column("give").to_numpy().astype(np.int64)[is_p]
        if pn.size == 0:       # a bucket the frontier has not reached
            return pn, ps, pd
        order = np.lexsort((pd, ps, pn))
        pn, ps, pd = pn[order], ps[order], pd[order]
        keep = np.concatenate(([True], (pn[1:] != pn[:-1])
                               | (ps[1:] != ps[:-1])))
        return pn[keep], ps[keep], pd[keep]

    def _make_round(first: bool):
        def _round(group: pa.Table) -> pa.Table:
            node = group.column("node").to_numpy().astype(np.int64)
            dst = group.column("dst").to_numpy().astype(np.int64)
            pn, ps, pd = _bucket_pairs(group, first)
            is_edge = dst >= 0
            es, ed = node[is_edge], dst[is_edge]
            # per-edge expansion: all live pairs of the edge source
            live_lo = np.searchsorted(pn, es, side="left")
            live_hi = np.searchsorted(pn, es, side="right")
            rep = live_hi - live_lo
            total = int(rep.sum())
            if total:
                base = np.repeat(live_lo, rep)
                step = np.arange(total) - np.repeat(
                    np.concatenate(([0], np.cumsum(rep)[:-1])), rep)
                pi = base + step
                sc_ok = pd[pi] + 1 <= cap
                sc_node = np.repeat(ed, rep)[sc_ok]
                sc_src = ps[pi][sc_ok]
                sc_d = pd[pi][sc_ok] + 1
            else:
                sc_node = sc_src = sc_d = np.array([], np.int64)
            out_node = np.concatenate((pn, sc_node))
            out_src = np.concatenate((ps, sc_src))
            out_d = np.concatenate((pd, sc_d))
            return pa.table({
                "bkt": pa.array(out_node % nbk, pa.int64()),
                "node": pa.array(out_node, pa.int64()),
                "dst": pa.array(np.full(out_node.size, -2, np.int64),
                                pa.int64()),
                "src": pa.array(out_src, pa.int64()),
                "give": pa.array(out_d, pa.int64()),
            })
        return _round

    lut = lut0

    def _final(group: pa.Table) -> pa.Table:
        node = group.column("node").to_numpy().astype(np.int64)
        dst = group.column("dst").to_numpy().astype(np.int64)
        pn, ps, pd = _bucket_pairs(group, False)
        keep = (ps != pn) & (pd >= 1) & (pd <= cap)
        pn, pd = pn[keep], pd[keep]
        rn = np.sort(np.unique(node[dst == -1]))
        n_reached = np.zeros(rn.size, np.int64)
        hsum = np.zeros(rn.size, np.int64)
        idx = np.searchsorted(rn, pn)
        np.add.at(n_reached, idx, 1)
        np.add.at(hsum, idx, lut[pd])
        return pa.table({
            "vec_id": pa.array(rn, pa.int64()),
            "n_reached": pa.array(n_reached, pa.int64()),
            "harmonic_ppm": pa.array(hsum, pa.int64()),
        })

    cur = static
    for t in range(max_hops):
        pairs = cur.groupby("bkt").map_groups(
            _make_round(t == 0), batch_format="pyarrow")
        cur = static.union(pairs)
    return cur.groupby("bkt").map_groups(_final, batch_format="pyarrow")


# --------------------------------------- pivot-sourced stress centrality

STRESS_SEED_MOD = 17    # pivots share the harmonic sampling design
STRESS_MAX_HOPS = 4


def _brandes_passes(nodes: np.ndarray, es: np.ndarray, ed: np.ndarray,
                    s: int, max_hops: int):
    """Brandes' two passes from one source over index-mapped edge
    arrays, hop-capped, all integers: returns (source index, layered
    distances d, path counts sig, continuation counts h) or None if
    the source is not in the edge-induced node set. Shared by node
    stress and edge stress (bridge detection)."""
    si = int(np.searchsorted(nodes, s))
    if si >= nodes.size or nodes[si] != s:
        return None
    inf = np.int64(1) << np.int64(40)
    d = np.full(nodes.size, inf, np.int64)
    sig = np.zeros(nodes.size, np.int64)
    d[si] = 0
    sig[si] = 1
    for layer in range(1, max_hops + 1):
        m = (d[es] == layer - 1) & (d[ed] >= layer)
        if not m.any():
            break
        d[ed[m]] = layer
        np.add.at(sig, ed[m], sig[es[m]])
    h = np.zeros(nodes.size, np.int64)
    for layer in range(max_hops - 1, -1, -1):
        m = (d[es] == layer) & (d[ed] == layer + 1)
        if m.any():
            np.add.at(h, es[m], 1 + h[ed[m]])
    return si, d, sig, h


def q_stress_centrality(sf_dir: str, max_hops: int = STRESS_MAX_HOPS,
                        seed_mod: int = STRESS_SEED_MOD
                        ) -> ray.data.Dataset:
    """Pivot-sourced STRESS centrality (Shimbel 1953; the
    integer-exact member of the betweenness family — betweenness
    itself divides by σ_st and leaves rationals, stress counts raw
    shortest PATHS through each node, so the whole computation is
    integer and hash-verifies): for each pivot source s and every
    interior node v ≠ s,

        stress(v) += σ_sv · h_s(v)

    where σ_sv = #shortest s→v paths (forward layer recurrence) and
    h_s(v) = Σ over shortest-path-DAG successors w of (1 + h_s(w))
    (backward layer recurrence — each term extends a shortest path
    ending at v to one ending at some t beyond v), both hop-capped.
    This is exactly Brandes' two-pass structure with the dependency
    kept as a path COUNT instead of a fraction.

    Shape: pivot-parallel (THE standard Brandes parallelization) —
    the edge arrays broadcast once via ray.put, a pivots dataset maps
    per-batch tasks that run the vectorized per-layer passes (every
    inner op is O(edges) numpy; the per-pivot loop is the declared
    sampling budget), emitting (node, contrib) partials; ONE
    groupby(node) sum, zero-filled from the node rows. The
    edge-set-per-task assumption is the documented kNN-subgraph
    class. Output (vec_id, stress)."""
    from ray.data.aggregate import Sum

    ew = _knn_undirected_edges(sf_dir).to_pandas()
    u = ew["u"].to_numpy(np.int64)
    v = ew["v"].to_numpy(np.int64)
    eref = ray.put((np.concatenate((u, v)), np.concatenate((v, u))))

    def _pivot_contribs(batch: pa.Table) -> pa.Table:
        src_all, dst_all = ray.get(eref)
        nodes = np.unique(np.concatenate((src_all, dst_all)))
        es = np.searchsorted(nodes, src_all)
        ed = np.searchsorted(nodes, dst_all)
        piv = batch.column("vec_id").to_numpy().astype(np.int64)
        piv = piv[piv % seed_mod == 0]
        out = np.zeros(nodes.size, np.int64)
        for s in piv:
            got = _brandes_passes(nodes, es, ed, s, max_hops)
            if got is None:
                continue          # isolated pivot: no edges, no paths
            si, d, sig, h = got
            contrib = sig * h
            contrib[si] = 0       # v == s is not an interior node
            out += contrib
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "stress": pa.array(out, pa.int64())})

    def _zero_rows(batch: pa.Table) -> pa.Table:
        vec = batch.column("vec_id").to_numpy().astype(np.int64)
        return pa.table({"node": pa.array(vec, pa.int64()),
                         "stress": pa.array(
                             np.zeros(vec.size, np.int64), pa.int64())})

    pivots = _embeddings_ds(sf_dir).select_columns(["vec_id"])
    agg = (pivots.map_batches(_pivot_contribs, batch_format="pyarrow")
           .union(pivots.map_batches(_zero_rows, batch_format="pyarrow"))
           .groupby("node").aggregate(Sum("stress", alias_name="stress")))
    return agg.map_batches(
        lambda t: pa.table({"vec_id": t.column("node").cast(pa.int64()),
                            "stress": t.column("stress").cast(pa.int64())}),
        batch_format="pyarrow")


BRIDGE_TOPK = 20


def q_bridge_edges(sf_dir: str, max_hops: int = STRESS_MAX_HOPS,
                   seed_mod: int = STRESS_SEED_MOD,
                   topk: int = BRIDGE_TOPK) -> pa.Table:
    """EDGE stress — the Girvan-Newman kernel (PNAS'02: communities
    emerge by repeatedly cutting the highest-betweenness edge; one
    exact integer round of its edge metric): for each DAG edge u→v
    under pivot source s, uses(u,v) += σ_su · (1 + h_s(v)) — the
    number of hop-capped shortest s→t paths crossing that edge. Top-k
    undirected edges by total uses are the corpus's BRIDGES: the
    between-cluster links whose removal fragments the similarity
    graph (dedup/near-dup review prioritizes exactly these). Same
    pivot-parallel shape and _brandes_passes kernel as
    q_stress_centrality; output (u, v, uses) for the top-k
    (uses desc, u, v)."""
    from ray.data.aggregate import Sum

    ew = _knn_undirected_edges(sf_dir).to_pandas()
    eu = ew["u"].to_numpy(np.int64)
    evv = ew["v"].to_numpy(np.int64)
    eref = ray.put((np.concatenate((eu, evv)), np.concatenate((evv, eu))))

    def _pivot_edge_uses(batch: pa.Table) -> pa.Table:
        src_all, dst_all = ray.get(eref)
        nodes = np.unique(np.concatenate((src_all, dst_all)))
        es = np.searchsorted(nodes, src_all)
        ed = np.searchsorted(nodes, dst_all)
        piv = batch.column("vec_id").to_numpy().astype(np.int64)
        piv = piv[piv % seed_mod == 0]
        uses = np.zeros(es.size, np.int64)   # per ORIENTED edge slot
        for s in piv:
            got = _brandes_passes(nodes, es, ed, s, max_hops)
            if got is None:
                continue
            _, d, sig, h = got
            m = d[ed] == d[es] + 1           # DAG edges under s
            uses[m] += sig[es[m]] * (1 + h[ed[m]])
        a = np.minimum(nodes[es], nodes[ed])
        b = np.maximum(nodes[es], nodes[ed])
        keep = uses > 0
        return pa.table({"u": pa.array(a[keep], pa.int64()),
                         "v": pa.array(b[keep], pa.int64()),
                         "uses": pa.array(uses[keep], pa.int64())})

    agg = (_embeddings_ds(sf_dir).select_columns(["vec_id"])
           .map_batches(_pivot_edge_uses, batch_format="pyarrow")
           .groupby(["u", "v"]).aggregate(Sum("uses", alias_name="uses"))
           .to_pandas())                     # O(edges)
    agg = agg.sort_values(["uses", "u", "v"],
                          ascending=[False, True, True],
                          kind="mergesort").head(topk)
    return pa.table({
        "u": pa.array(agg["u"].to_numpy(np.int64), pa.int64()),
        "v": pa.array(agg["v"].to_numpy(np.int64), pa.int64()),
        "uses": pa.array(agg["uses"].to_numpy(np.int64), pa.int64()),
    })


# -------------------------------- hop-bounded weighted shortest paths

WSP_ROUNDS = 4        # exact over paths of <= this many edges


def _knn_weighted_edges(sf_dir: str) -> "ray.data.Dataset":
    """Symmetrized undirected kNN edges KEEPING the exact integer
    squared-L2 weight (distance is symmetric, so the groupby-min is
    a dedup, not a choice)."""
    from candidategeneration_ray.pipelines.extras import _doc_buckets

    nkb = _doc_buckets(sf_dir, "embeddings")

    def _sym(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_id").to_numpy().astype(np.int64)
        b = batch.column("nbr_id").to_numpy().astype(np.int64)
        w = batch.column("d2").to_numpy().astype(np.int64)
        key = (np.minimum(a, b) << np.int64(32)) | np.maximum(a, b)
        hh = key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        hh ^= hh >> np.uint64(29)
        return pa.table({
            "kbkt": pa.array((hh % np.uint64(nkb)).astype(np.int32)),
            "key": pa.array(key, pa.int64()),
            "d2": pa.array(w, pa.int64()),
        })

    def _fold(group: pa.Table) -> pa.Table:
        """Bucket-local per-edge min (the dedup) — int-bucket fold
        replacing the (u, v) sort aggregate."""
        k = group.column("key").to_numpy().astype(np.int64)
        d2 = group.column("d2").to_numpy().astype(np.int64)
        order = np.lexsort((d2, k))
        k, d2 = k[order], d2[order]
        first = np.concatenate(([True], k[1:] != k[:-1]))
        k, d2 = k[first], d2[first]
        return pa.table({
            "u": pa.array(k >> np.int64(32), pa.int64()),
            "v": pa.array(k & np.int64(0xFFFFFFFF), pa.int64()),
            "w": pa.array(d2, pa.int64()),
        })

    return (q_knn_graph(sf_dir)
            .map_batches(_sym, batch_format="pyarrow")
            .groupby("kbkt").map_groups(_fold, batch_format="pyarrow"))


@ray.remote
def _small_graph_sssp(rounds: int, seed_mod: int, n_edge_tables: int,
                      *tables: pa.Table) -> pa.Table:
    """Hop-bounded multi-source Bellman-Ford over a task-sized edge
    list — one numpy task over object-store blocks (the edge list
    never touches the driver). Computes EXACTLY the staged rounds'
    function: dist_{t+1}[v] = min(dist_t[v], min_u dist_t[u] + w(u,v))
    over the symmetric edge set, dist_0 = 0 at seeds."""
    edge_tabs = [t for t in tables[:n_edge_tables] if t.num_rows > 0]
    node_tabs = [t for t in tables[n_edge_tables:] if t.num_rows > 0]
    vec = np.sort(np.concatenate(
        [t.column("vec_id").to_numpy().astype(np.int64)
         for t in node_tabs]))
    if edge_tabs:
        u = np.concatenate([t.column("u").to_numpy().astype(np.int64)
                            for t in edge_tabs])
        v = np.concatenate([t.column("v").to_numpy().astype(np.int64)
                            for t in edge_tabs])
        w = np.concatenate([t.column("w").to_numpy().astype(np.int64)
                            for t in edge_tabs])
        src = np.searchsorted(vec, np.concatenate((u, v)))
        dst = np.searchsorted(vec, np.concatenate((v, u)))
        ww = np.concatenate((w, w))
    else:
        src = dst = ww = np.empty(0, np.int64)
    dist = np.where(vec % seed_mod == 0, np.int64(0), _BFS_INF)
    for _ in range(rounds):
        sd = dist[src]
        live = sd < _BFS_INF
        nxt = dist.copy()
        np.minimum.at(nxt, dst[live], sd[live] + ww[live])
        dist = nxt
    return pa.table({
        "vec_id": pa.array(vec, pa.int64()),
        "dist": pa.array(np.where(dist < _BFS_INF, dist, np.int64(-1)),
                         pa.int64()),
    })


def q_shortest_paths(sf_dir: str, rounds: int = WSP_ROUNDS,
                     seed_mod: int = BFS_SEED_MOD,
                     small_graph_max_edges: int = 2_500_000) -> ray.data.Dataset:
    """Multi-source WEIGHTED shortest paths over the kNN graph —
    hop-bounded Bellman-Ford: for every vector the minimum total
    integer-L2 edge weight over paths of <= `rounds` edges from the
    nearest seed (vec_id % seed_mod == 0), -1 if no such path. The
    weighted sibling of q_bfs_hops (graph-proximity curation where
    edge LENGTH matters, not just hop count); the hop bound makes the
    quantity exact and oracle-checkable rather than
    convergence-dependent.

    Shape: identical scatter skeleton to q_bfs_hops — static edge and
    node rows keyed by node-hash bucket, one groupby(bkt) per
    relaxation round whose task folds incoming distances with
    np.minimum.at and scatters dist+w along out-edges of reached
    sources. Integer weights from the memoized exact kNN graph; the
    DuckDB oracle unrolls the same `rounds` relaxations. Per-round
    traffic is O(E) rows; the driver holds nothing."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    nbk = _graph_buckets()
    ew = _knn_weighted_edges(sf_dir).materialize()
    if ew.count() <= small_graph_max_edges:
        # bounded fast path (the dup_clusters/dbscan pattern): one task
        # over the edge blocks, identical per-round semantics — the
        # staged path below stays the >cap route (equality pytest)
        edge_refs = ew.to_arrow_refs()
        node_refs = (_embeddings_ds(sf_dir).select_columns(["vec_id"])
                     .to_arrow_refs())
        return ray.data.from_arrow_refs([_small_graph_sssp.remote(
            rounds, seed_mod, len(edge_refs), *edge_refs, *node_refs)])

    # row kinds: edge row (dst >= 0, give = weight),
    # node row (dst == -1), distance row (dst == -2, give = dist)
    def _static_rows(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy().astype(np.int64)
        v = b.column("v").to_numpy().astype(np.int64)
        w = b.column("w").to_numpy().astype(np.int64)
        src = np.concatenate((u, v))
        dst = np.concatenate((v, u))
        ww = np.concatenate((w, w))
        return pa.table({
            "bkt": pa.array(src % nbk, pa.int64()),
            "node": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "give": pa.array(ww, pa.int64()),
        })

    def _node_rows(b: pa.Table) -> pa.Table:
        vec = b.column("vec_id").to_numpy().astype(np.int64)
        return pa.table({
            "bkt": pa.array(vec % nbk, pa.int64()),
            "node": pa.array(vec, pa.int64()),
            "dst": pa.array(np.full(vec.size, -1, np.int64), pa.int64()),
            "give": pa.array(np.zeros(vec.size, np.int64), pa.int64()),
        })

    static = (ew
              .map_batches(_static_rows, batch_format="pyarrow")
              .union(_embeddings_ds(sf_dir)
                     .select_columns(["vec_id"])
                     .map_batches(_node_rows, batch_format="pyarrow"))
              .materialize())

    def _bucket_dists(group: pa.Table, first: bool):
        node = group.column("node").to_numpy().astype(np.int64)
        dst = group.column("dst").to_numpy().astype(np.int64)
        give = group.column("give").to_numpy().astype(np.int64)
        rn = np.sort(node[dst == -1])
        dv = np.where(rn % seed_mod == 0, np.int64(0), _BFS_INF)
        if not first:
            is_d = dst == -2
            np.minimum.at(dv, np.searchsorted(rn, node[is_d]), give[is_d])
        return rn, dv

    def _make_round(first: bool):
        def _round(group: pa.Table) -> pa.Table:
            node = group.column("node").to_numpy().astype(np.int64)
            dst = group.column("dst").to_numpy().astype(np.int64)
            give = group.column("give").to_numpy().astype(np.int64)
            rn, dv = _bucket_dists(group, first)
            is_edge = dst >= 0
            es, ed, ew = node[is_edge], dst[is_edge], give[is_edge]
            sd = dv[np.searchsorted(rn, es)]
            live = sd < _BFS_INF
            reached = dv < _BFS_INF
            out_node = np.concatenate((rn[reached], ed[live]))
            out_give = np.concatenate((dv[reached], sd[live] + ew[live]))
            return pa.table({
                "bkt": pa.array(out_node % nbk, pa.int64()),
                "node": pa.array(out_node, pa.int64()),
                "dst": pa.array(np.full(out_node.size, -2, np.int64),
                                pa.int64()),
                "give": pa.array(out_give, pa.int64()),
            })
        return _round

    def _final(group: pa.Table) -> pa.Table:
        rn, dv = _bucket_dists(group, False)
        return pa.table({
            "vec_id": pa.array(rn, pa.int64()),
            "dist": pa.array(np.where(dv < _BFS_INF, dv, np.int64(-1)),
                             pa.int64()),
        })

    cur = static
    for t in range(rounds):
        dists = cur.groupby("bkt").map_groups(
            _make_round(t == 0), batch_format="pyarrow")
        cur = static.union(dists)
    return cur.groupby("bkt").map_groups(_final, batch_format="pyarrow")


# ------------------------------------------- cluster keyword labeling

def q_cluster_top_terms(sf_dir: str, k_terms: int = 5) -> ray.data.Dataset:
    """Cross-modal cluster labeling: for each k-means cluster (trained
    on the embeddings), the top terms of its member DOCUMENTS by summed
    integer tf-idf — the human-readable summary step of a SemDeDup/
    clustering pipeline (embeddings pick the clusters, text explains
    them). vec_id joins doc_id 1:1.

    Shape: the cluster side is an assign pass over the embeddings
    (broadcast codebook); the text side emits compressed per-doc
    (doc, term, tf) rows; an id-hash bucketed union-tag join (the
    relational.py machinery) attaches clusters, aggregating inside the
    bucket to (cluster, term, sum_tf) partials; one O(clusters x terms)
    groupby merges; per-cluster top-k is a tiny final groupby. The idf
    table is the standard dictionary broadcast.

    Returns (cluster, rank, term, score)."""
    from candidategeneration_ray.pipelines.docquery import (
        corpus_stats, documents_ds)
    from candidategeneration_ray.pipelines.textlm import _packed_doc_terms
    from candidategeneration_ray.functions.tokenize import tokenize_many

    nbk = _graph_buckets()
    cent_ref = ray.put(kmeans_codebook(sf_dir))
    stats = corpus_stats(sf_dir)
    idf = np.trunc(
        np.log(float(stats["n_docs"]) / stats["df_by_id"][1:].astype(np.float64))
        * 1e7).astype(np.int64)
    idf_ref = ray.put((stats["terms"], idf))

    def _emb_rows(batch: pa.Table) -> pa.Table:
        ids, xq = _quantize(batch)
        return pa.table({
            "bkt": pa.array(ids % nbk, pa.int64()),
            "key": pa.array(ids, pa.int64()),
            "cluster": pa.array(_assign(xq, ray.get(cent_ref)), pa.int64()),
            "term": pa.array([""] * ids.size, pa.string()),
            "tf": pa.array(np.zeros(ids.size, np.int64), pa.int64()),
        })

    def _doc_rows(batch: pa.Table) -> pa.Table:
        token_lists = tokenize_many(batch.column("text").to_pylist())
        doc_ids = batch.column("doc_id").to_numpy().astype(np.int64)
        _, u, doc_g, term_g, tf_g = _packed_doc_terms(token_lists)
        keys = doc_ids[doc_g]
        return pa.table({
            "bkt": pa.array(keys % nbk, pa.int64()),
            "key": pa.array(keys, pa.int64()),
            "cluster": pa.array(np.full(keys.size, -1, np.int64), pa.int64()),
            "term": pa.array(u[term_g].tolist(), pa.string()),
            "tf": pa.array(tf_g, pa.int64()),
        })

    def _probe(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy().astype(np.int64)
        cl = group.column("cluster").to_numpy().astype(np.int64)
        tf = group.column("tf").to_numpy().astype(np.int64)
        term = np.asarray(group.column("term").to_pylist(), dtype=object)
        build = cl >= 0
        bk, bc = key[build], cl[build]
        o = np.argsort(bk)
        bk, bc = bk[o], bc[o]
        pk = key[~build]
        idx = np.searchsorted(bk, pk)
        if bk.size:
            idx[idx == bk.size] = 0
            hit = bk[idx] == pk
        else:
            hit = np.zeros(pk.size, bool)
        cls = bc[idx[hit]]
        tms = term[~build][hit]
        tfs = tf[~build][hit]
        # in-bucket partial aggregate to (cluster, term, sum_tf)
        tu, tinv = np.unique(tms, return_inverse=True)
        pk2 = cls * np.int64(len(tu) + 1) + tinv
        ku, kinv = np.unique(pk2, return_inverse=True)
        s = np.zeros(ku.size, np.int64)
        np.add.at(s, kinv, tfs)
        return pa.table({
            "cluster": pa.array(ku // (len(tu) + 1), pa.int64()),
            "term": pa.array(tu[ku % (len(tu) + 1)].tolist(), pa.string()),
            "tf": pa.array(s, pa.int64()),
        })

    def _score_topk(group: pa.Table) -> pa.Table:
        terms_sorted, idf_arr = ray.get(idf_ref)
        cl = int(group.column("cluster")[0].as_py())
        term = np.asarray(group.column("term").to_pylist(), dtype=object)
        tf = group.column("tf").to_numpy().astype(np.int64)
        score = tf * idf_arr[np.searchsorted(terms_sorted, term)]
        _, tinv = np.unique(term, return_inverse=True)  # lexsortable ints
        order = np.lexsort((tinv, -score))[:k_terms]
        return pa.table({
            "cluster": pa.array(np.full(order.size, cl, np.int64), pa.int64()),
            "rank": pa.array(np.arange(1, order.size + 1, dtype=np.int64),
                             pa.int64()),
            "term": pa.array(term[order].tolist(), pa.string()),
            "score": pa.array(score[order], pa.int64()),
        })

    emb = _embeddings_ds(sf_dir).map_batches(_emb_rows, batch_format="pyarrow")
    docs = documents_ds(sf_dir).map_batches(_doc_rows, batch_format="pyarrow")
    return (
        emb.union(docs)
        .groupby("bkt").map_groups(_probe, batch_format="pyarrow")
        .groupby(["cluster", "term"]).aggregate(Sum("tf", alias_name="tf"))
        .groupby("cluster").map_groups(_score_topk, batch_format="pyarrow")
    )


def q_kmeans_label_eval(sf_dir: str) -> ray.data.Dataset:
    """Clustering evaluation against the embeddings table's ground-truth
    `label` column: the (cluster, label) contingency counts — the
    clustering twin of langid_eval (purity / NMI / rand index are all
    driver-side functions of this O(k x labels) summary).

    Shape: one assign pass with the broadcast codebook emitting
    compressed per-batch (cluster, label, n) partials -> one
    O(k x labels) groupby."""
    cent_ref = ray.put(kmeans_codebook(sf_dir))

    def _part(batch: pa.Table) -> pa.Table:
        ids, xq = _quantize(batch)
        a = _assign(xq, ray.get(cent_ref))
        lab = batch.column("label").to_numpy().astype(np.int64)
        key = a * (int(lab.max()) + 1 if lab.size else 1) + lab
        width = int(lab.max()) + 1 if lab.size else 1
        ku, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "cluster": pa.array(ku // width, pa.int64()),
            "label": pa.array(ku % width, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding", "label"])
        .map_batches(_part, batch_format="pyarrow")
        .groupby(["cluster", "label"])
        .aggregate(Sum("n", alias_name="n"))
    )


def q_kmeans_purity(sf_dir: str) -> pa.Table:
    """Clustering purity vs the ground-truth labels, as an integer
    (millionths): sum over clusters of the majority-label count, over
    n. The driver finalizes over the O(k x labels) contingency summary
    only — the classic sketch-then-finalize shape."""
    rows = q_kmeans_label_eval(sf_dir).take_all()
    best: dict[int, int] = {}
    n = 0
    for r in rows:
        c, cnt = int(r["cluster"]), int(r["n"])
        n += cnt
        if cnt > best.get(c, 0):
            best[c] = cnt
    purity = sum(best.values()) * 1_000_000 // n if n else 0
    return pa.table({
        "n_vectors": pa.array([n], pa.int64()),
        "purity_millionths": pa.array([purity], pa.int64()),
    })


def q_kmeans_ari(sf_dir: str) -> pa.Table:
    """Adjusted Rand Index of the k-means clustering vs the ground
    truth, as EXACT integers: pair-count sums from the O(k x labels)
    contingency summary plus the ARI fraction's numerator/denominator
    (both x2 to stay integral) — no float division anywhere, so the
    oracle hash compare is exact even when ARI is negative."""
    rows = q_kmeans_label_eval(sf_dir).take_all()
    a: dict[int, int] = {}
    b: dict[int, int] = {}
    index_comb = 0
    n = 0
    for r in rows:
        c, l, cnt = int(r["cluster"]), int(r["label"]), int(r["n"])
        a[c] = a.get(c, 0) + cnt
        b[l] = b.get(l, 0) + cnt
        index_comb += cnt * (cnt - 1) // 2
        n += cnt
    sum_a = sum(s * (s - 1) // 2 for s in a.values())
    sum_b = sum(s * (s - 1) // 2 for s in b.values())
    comb_n = n * (n - 1) // 2
    num2 = 2 * (index_comb * comb_n - sum_a * sum_b)
    den2 = comb_n * (sum_a + sum_b) - 2 * sum_a * sum_b
    return pa.table({
        "n_vectors": pa.array([n], pa.int64()),
        "index_comb": pa.array([index_comb], pa.int64()),
        "sum_a_comb": pa.array([sum_a], pa.int64()),
        "sum_b_comb": pa.array([sum_b], pa.int64()),
        "ari_num2": pa.array([num2], pa.int64()),
        "ari_den2": pa.array([den2], pa.int64()),
    })


def q_term_embeddings(sf_dir: str, top_m: int = 20) -> pa.Table:
    """Cross-modal TERM embeddings: for the top_m highest-df terms,
    the integer centroid of the embeddings of the docs CONTAINING the
    term (vec_id joins doc_id 1:1) — the anchor-based word-vector
    derivation, with the same exact-integer arithmetic as k-means
    (trunc-quantize, int sums, floor-div on doubles).

    Shape: neither side broadcasts the other — doc-term membership
    rows and quantized embedding rows union-tag into id-hash buckets;
    each bucket joins by searchsorted and emits per-(term, dim)
    integer partial sums plus per-term doc counts; one O(top_m x dim)
    groupby merges; the driver floor-divides the tiny summary."""
    from ray.data.aggregate import Sum

    from candidategeneration_ray.functions.tokenize import tokenize_many
    from candidategeneration_ray.pipelines.docquery import (
        corpus_stats, documents_ds)
    from candidategeneration_ray.pipelines.textlm import _packed_doc_terms

    nbk = _graph_buckets()
    stats = corpus_stats(sf_dir)
    terms = np.asarray(stats["terms"], dtype=object)
    df = np.asarray(stats["df_by_id"], dtype=np.int64)[1:]
    pick = np.lexsort((terms, -df))[:top_m]
    sel = np.sort(terms[pick])  # sorted for searchsorted membership
    sel_ref = ray.put(sel)

    def _doc_rows(batch: pa.Table) -> pa.Table:
        s = ray.get(sel_ref)
        token_lists = tokenize_many(batch.column("text").to_pylist())
        _, u, doc_g, term_g, _ = _packed_doc_terms(token_lists)
        if u.size == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "tidx": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64())})
        pos = np.minimum(np.searchsorted(s, u), max(s.size - 1, 0))
        keep_u = (s[pos] == u) if s.size else np.zeros(u.size, bool)
        m = keep_u[term_g]
        ids = batch.column("doc_id").to_numpy().astype(np.int64)[doc_g[m]]
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "tidx": pa.array(pos[term_g[m]].astype(np.int64), pa.int64()),
            "dim": pa.array(np.full(ids.size, -1, np.int64), pa.int64()),
            "x": pa.array(np.zeros(ids.size, np.int64), pa.int64()),
        })

    def _emb_rows(batch: pa.Table) -> pa.Table:
        ids, xq = _quantize(batch)
        n, dim = xq.shape
        return pa.table({
            "id": pa.array(np.repeat(ids, dim), pa.int64()),
            "tidx": pa.array(np.full(n * dim, -1, np.int64), pa.int64()),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), n),
                            pa.int64()),
            "x": pa.array(xq.ravel(), pa.int64()),
        })

    def _bucket(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy().astype(np.int64)
        return batch.append_column(
            "bkt", pa.array(i % np.int64(nbk), pa.int64()))

    def _join(group: pa.Table) -> pa.Table:
        ids = group.column("id").to_numpy().astype(np.int64)
        tidx = group.column("tidx").to_numpy().astype(np.int64)
        dim = group.column("dim").to_numpy().astype(np.int64)
        x = group.column("x").to_numpy().astype(np.int64)
        is_emb = tidx == -1
        # per-id embedding matrix (ids unique per (id, dim) on this side)
        eo = np.lexsort((dim[is_emb], ids[is_emb]))
        eids = ids[is_emb][eo]
        ex = x[is_emb][eo]
        ndim = int(dim[is_emb].max()) + 1 if is_emb.any() else 0
        uids = eids[::ndim] if ndim else np.empty(0, np.int64)
        # membership rows join their doc's vector
        mt = tidx[~is_emb]
        mid = ids[~is_emb]
        if uids.size:
            j = np.minimum(np.searchsorted(uids, mid), uids.size - 1)
            hit = uids[j] == mid
        else:
            j = np.zeros(mid.size, np.int64)
            hit = np.zeros(mid.size, bool)
        mt, j = mt[hit], j[hit]
        # partial sums per (term, dim) + doc counts per term (dim = -1)
        nt = mt.size
        if nt == 0:
            return pa.table({"tidx": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        vec = ex.reshape(-1, ndim)[j]           # (nt, ndim)
        tkey = (np.repeat(mt, ndim) * np.int64(ndim + 1)
                + np.tile(np.arange(ndim, dtype=np.int64), nt))
        uk, inv = np.unique(tkey, return_inverse=True)
        s = np.zeros(uk.size, np.int64)
        np.add.at(s, inv, vec.ravel())
        cu, cc = np.unique(mt, return_counts=True)
        return pa.table({
            "tidx": pa.array(np.concatenate((uk // (ndim + 1), cu)), pa.int64()),
            "dim": pa.array(np.concatenate((uk % (ndim + 1),
                                            np.full(cu.size, -1, np.int64))),
                            pa.int64()),
            "s": pa.array(np.concatenate((s, cc.astype(np.int64))), pa.int64()),
        })

    docs = documents_ds(sf_dir).map_batches(_doc_rows, batch_format="pyarrow")
    embs = _embeddings_ds(sf_dir).map_batches(_emb_rows, batch_format="pyarrow")
    merged = (
        docs.union(embs)
        .map_batches(_bucket, batch_format="pyarrow")
        .groupby("bkt").map_groups(_join, batch_format="pyarrow")
        .groupby(["tidx", "dim"]).aggregate(Sum("s", alias_name="s"))
        .take_all()
    )
    counts: dict[int, int] = {}
    sums: dict[tuple[int, int], int] = {}
    for r in merged:
        if r["dim"] == -1:
            counts[int(r["tidx"])] = counts.get(int(r["tidx"]), 0) + int(r["s"])
        else:
            sums[(int(r["tidx"]), int(r["dim"]))] = int(r["s"])
    rows = sorted(sums)
    out_t = [str(sel[t]) for t, _ in rows]
    out_d = [d for _, d in rows]
    out_c = [int(np.floor(sums[(t, d)] / counts[t])) for t, d in rows]
    return pa.table({
        "term": pa.array(out_t, pa.string()),
        "dim": pa.array(out_d, pa.int64()),
        "centroid_q": pa.array(out_c, pa.int64()),
    })


TRI_PAIR_BUCKETS = 64
TRI_NODE_BUCKETS = 64


def _knn_undirected_edges(sf_dir: str) -> "ray.data.Dataset":
    """Symmetrized, distinct undirected edge set of the kNN graph —
    shared by the wedge-based motif operators (triangles, common
    neighbors)."""

    knn = q_knn_graph(sf_dir)
    from candidategeneration_ray.pipelines.extras import _doc_buckets

    nkb = _doc_buckets(sf_dir, "embeddings")

    def _sym_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_id").to_numpy().astype(np.int64)
        b = batch.column("nbr_id").to_numpy().astype(np.int64)
        key = (np.minimum(a, b) << np.int64(32)) | np.maximum(a, b)
        uk = np.unique(key)
        hh = uk.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        hh ^= hh >> np.uint64(29)
        return pa.table({
            "kbkt": pa.array((hh % np.uint64(nkb)).astype(np.int32)),
            "key": pa.array(uk, pa.int64()),
        })

    def _fold(group: pa.Table) -> pa.Table:
        """Bucket-local distinct — replaces the (u, v) sort aggregate."""
        uk = np.unique(group.column("key").to_numpy().astype(np.int64))
        return pa.table({
            "u": pa.array(uk >> np.int64(32), pa.int64()),
            "v": pa.array(uk & np.int64(0xFFFFFFFF), pa.int64()),
        })

    return (knn.map_batches(_sym_edges, batch_format="pyarrow")
            .groupby("kbkt").map_groups(_fold, batch_format="pyarrow"))


def _wedge_edge_union(edges: "ray.data.Dataset",
                      npb: int = TRI_PAIR_BUCKETS) -> "ray.data.Dataset":
    """Pair-hash-bucketed union of wedge rows and edge rows over the
    undirected edge set — the shared front half of every wedge-check
    plan. Schema: (pbucket, pkey, apex) where apex >= 0 marks a wedge
    (its apex node) and apex == -1 marks an adjacency row; all copies
    of a pair land in one pbucket, so per-bucket counting is
    bucket-complete. O(Σ deg²) wedges, bounded by kNN degree <= 2k."""

    def _adj_rows(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy().astype(np.int64)
        v = batch.column("v").to_numpy().astype(np.int64)
        node = np.concatenate((u, v))
        nbr = np.concatenate((v, u))
        hh = node.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        hh ^= hh >> np.uint64(29)
        return pa.table({
            "nbucket": pa.array(
                (hh % np.uint64(TRI_NODE_BUCKETS)).astype(np.int32)),
            "node": pa.array(node, pa.int64()),
            "nbr": pa.array(nbr, pa.int64()),
        })

    def _wedges(group: pa.Table) -> pa.Table:
        node = group.column("node").to_numpy().astype(np.int64)
        nbr = group.column("nbr").to_numpy().astype(np.int64)
        order = np.lexsort((nbr, node))
        node, nbr = node[order], nbr[order]
        starts = np.flatnonzero(
            np.concatenate(([True], node[1:] != node[:-1])))
        counts = np.diff(np.concatenate((starts, [node.size])))
        out_a, out_b, out_apex = [], [], []
        for c in np.unique(counts):
            if c < 2:
                continue
            s_c = starts[counts == c]
            mat = nbr[s_c[:, None] + np.arange(c)]     # sorted per row
            ia, ib = np.triu_indices(int(c), k=1)
            out_a.append(mat[:, ia].ravel())
            out_b.append(mat[:, ib].ravel())
            out_apex.append(np.repeat(node[s_c], ia.size))
        if not out_a:
            return pa.table({"pkey": pa.array([], pa.int64()),
                             "apex": pa.array([], pa.int64())})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pa.table({
            "pkey": pa.array((a << np.int64(32)) | b, pa.int64()),
            "apex": pa.array(np.concatenate(out_apex), pa.int64()),
        })

    def _edge_keys(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy().astype(np.int64)
        v = batch.column("v").to_numpy().astype(np.int64)
        if u.size and (int(u.max()) >= 1 << 31 or int(v.max()) >= 1 << 31):
            raise ValueError("packed pair key needs vec_id < 2^31")
        return pa.table({
            "pkey": pa.array((u << np.int64(32)) | v, pa.int64()),
            "apex": pa.array(np.full(u.size, -1, np.int64), pa.int64()),
        })

    def _pbucket(batch: pa.Table) -> pa.Table:
        k = batch.column("pkey").to_numpy().astype(np.uint64)
        hh = k * np.uint64(0x9E3779B97F4A7C15)
        hh ^= hh >> np.uint64(29)
        return batch.append_column(
            "pbucket", pa.array((hh % np.uint64(npb)).astype(np.int32)))

    wedges = (edges.map_batches(_adj_rows, batch_format="pyarrow")
              .groupby("nbucket").map_groups(_wedges,
                                             batch_format="pyarrow"))
    return (wedges
            .union(edges.map_batches(_edge_keys, batch_format="pyarrow"))
            .map_batches(_pbucket, batch_format="pyarrow"))


def q_triangle_counts(sf_dir: str) -> ray.data.Dataset:
    """Per-node triangle counts over the UNDIRECTED kNN graph — the
    graph-motif aggregation shape (the local clustering-coefficient
    numerator used for graph-based quality/diversity filtering). A
    triangle {x,y,z} exists when all three undirected edges do; each
    node's count is the number of triangles containing it.

    Shape: the classic distributed wedge-check (node-iterator) plan —
    (1) kNN edges symmetrize + distinct through one groupby;
    (2) adjacency buckets by node hash, each node emits its sorted
    neighbor PAIRS (wedges, apex attached) — O(Σ deg²) rows, bounded
    because kNN degree <= 2k; (3) wedges and edges union-tag into
    pair-hash buckets where one sorted membership test marks closed
    wedges; each triangle closes exactly once per apex, so per-apex
    match counts ARE per-node triangle counts (partial rows →
    groupby(vec_id) sum). No adjacency ever materializes on the
    driver; skew ceiling is max-degree², not graph size."""
    from ray.data.aggregate import Sum

    def _close(group: pa.Table) -> pa.Table:
        pkey = group.column("pkey").to_numpy().astype(np.int64)
        apex = group.column("apex").to_numpy().astype(np.int64)
        is_edge = apex < 0
        ek = np.unique(pkey[is_edge])
        wk, wa = pkey[~is_edge], apex[~is_edge]
        if ek.size == 0 or wk.size == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "n_triangles": pa.array([], pa.int64())})
        idx = np.minimum(np.searchsorted(ek, wk), ek.size - 1)
        hit = ek[idx] == wk
        u, cnt = np.unique(wa[hit], return_counts=True)
        return pa.table({
            "vec_id": pa.array(u, pa.int64()),
            "n_triangles": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    return (
        _wedge_edge_union(_knn_undirected_edges(sf_dir))
        .groupby("pbucket").map_groups(_close, batch_format="pyarrow")
        .groupby("vec_id")
        .aggregate(Sum("n_triangles", alias_name="n_triangles"))
    )


HITS_ITERS = 2
HITS_SCALE = np.int64(1_000_000)


@ray.remote
def _small_graph_hits(iters: int, *tables: pa.Table) -> pa.Table:
    """Integer HITS over a task-sized directed edge list — one numpy
    task over object-store blocks, computing EXACTLY the staged
    half-rounds: raw sums along (reverse) edges, floor normalization
    by the global max of the contributed nodes (every node has k
    out-edges, so hub rows cover all nodes and auth rows exactly the
    in-edge-receiving ones — zeros elsewhere, as the staged union
    fills)."""
    tables = [t for t in tables if t.num_rows > 0]
    u = np.concatenate([t.column("vec_id").to_numpy().astype(np.int64)
                        for t in tables])
    v = np.concatenate([t.column("nbr_id").to_numpy().astype(np.int64)
                        for t in tables])
    nodes = np.unique(u)
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)
    s = np.int64(HITS_SCALE)
    h = np.full(nodes.size, s, np.int64)
    a = np.zeros(nodes.size, np.int64)
    for _ in range(iters):
        a_raw = np.zeros(nodes.size, np.int64)
        np.add.at(a_raw, vi, h[ui])
        a = a_raw * s // np.int64(a_raw.max())
        h_raw = np.zeros(nodes.size, np.int64)
        np.add.at(h_raw, ui, a[vi])
        h = h_raw * s // np.int64(h_raw.max())
    return pa.table({
        "vec_id": pa.array(nodes, pa.int64()),
        "hub": pa.array(h, pa.int64()),
        "auth": pa.array(a, pa.int64()),
    })


def q_hits_scores(sf_dir: str, iters: int = HITS_ITERS,
                  small_graph_max_edges: int = 2_500_000) -> ray.data.Dataset:
    """Integer HITS (hubs & authorities, Kleinberg JACM'99) over the
    directed kNN graph — closes SURVEY §2 A7 with a value-verified
    implementation instead of the prior-join stand-in: the reference
    consumes precomputed HIT ranks (utilsClass.java:251-263); this
    computes them. Fixed-point arithmetic with FLOOR max-normalization
    keeps every round exact and partition-independent:

        h0(u)    = S                      (S = 1e6)
        a'(v)    = Σ_{u→v} h(u);  a(v) = a'(v)·S // max_w a'(w)
        h'(u)    = Σ_{u→v} a(v);  h(u) = h'(u)·S // max_w h'(w)

    The global max is ONE scalar aggregate per half-round (broadcast
    into the next map) — exactly computable by the unrolled DuckDB
    oracle, so the driver hash-compares the scores.

    Shape: per half-round one co-location groupby (edges + scores
    union-tagged by source-node bucket, contributions scattered to
    targets) and one groupby(node) sum — the plain join-per-round
    iterative shape; q_pagerank shows the fused-scatter optimization
    that halves the shuffles when rounds dominate. Output (vec_id,
    hub, auth) for every vector (auth 0 for in-edge-free nodes)."""
    from ray.data.aggregate import Sum

    if iters < 1:
        raise ValueError("q_hits_scores needs iters >= 1")
    nbk = _graph_buckets()
    # materialize ONCE: edges, the h0 rows and the zero rows all
    # derive from the kNN graph, and the all-pairs distance pass is
    # the dominant cost (q_pagerank does the same)
    knn = q_knn_graph(sf_dir).materialize()
    if knn.count() <= small_graph_max_edges:
        # bounded fast path (the dup_clusters/dbscan/sssp pattern):
        # the staged plan below stays the >cap route (equality pytest)
        refs = (knn.select_columns(["vec_id", "nbr_id"])
                .materialize().to_arrow_refs())
        return ray.data.from_arrow_refs([_small_graph_hits.remote(
            iters, *refs)])

    def _edge_rows(b: pa.Table) -> pa.Table:
        u = b.column("vec_id").to_numpy().astype(np.int64)
        v = b.column("nbr_id").to_numpy().astype(np.int64)
        return pa.table({
            "node": pa.array(u, pa.int64()),
            "other": pa.array(v, pa.int64()),
            "s": pa.array(np.zeros(u.size, np.int64), pa.int64()),
        })

    edges = knn.map_batches(_edge_rows, batch_format="pyarrow").materialize()

    def _node_rows(b: pa.Table) -> pa.Table:
        u = b.column("vec_id").to_numpy().astype(np.int64)
        nodes = u[b.column("rank").to_numpy().astype(np.int64) == 1]
        return pa.table({
            "node": pa.array(nodes, pa.int64()),
            "other": pa.array(np.full(nodes.size, -1, np.int64), pa.int64()),
            "s": pa.array(np.full(nodes.size, int(HITS_SCALE), np.int64),
                          pa.int64()),
        })

    def _bkt(batch: pa.Table) -> pa.Table:
        n_ = batch.column("node").to_numpy().astype(np.int64)
        return batch.append_column("bkt", pa.array(n_ % nbk, pa.int64()))

    def _scatter(group: pa.Table) -> pa.Table:
        """Send each source node's score along its out-edges."""
        node = group.column("node").to_numpy().astype(np.int64)
        other = group.column("other").to_numpy().astype(np.int64)
        s = group.column("s").to_numpy().astype(np.int64)
        is_score = other < 0
        sn, sv = node[is_score], s[is_score]
        order = np.argsort(sn, kind="stable")
        sn, sv = sn[order], sv[order]
        eu, ev = node[~is_score], other[~is_score]
        idx = np.searchsorted(sn, eu)       # every source has a score row
        return pa.table({
            "node": pa.array(ev, pa.int64()),
            "c": pa.array(sv[idx], pa.int64()),
        })

    def _push(scores: ray.data.Dataset,
              reverse: bool) -> ray.data.Dataset:
        """One half-round: raw sums at the edge targets (reverse=False
        pushes along u→v for authorities; True along v→u for hubs),
        floor-normalized by the global max."""
        e = edges
        if reverse:
            e = edges.map_batches(
                lambda b: pa.table({"node": b.column("other"),
                                    "other": b.column("node"),
                                    "s": b.column("s")}),
                batch_format="pyarrow")
        raw = (
            e.union(scores)
            .map_batches(_bkt, batch_format="pyarrow")
            .groupby("bkt").map_groups(_scatter, batch_format="pyarrow")
            .groupby("node").aggregate(Sum("c", alias_name="raw"))
        ).materialize()
        mx = int(raw.max("raw"))

        def _scale(batch: pa.Table) -> pa.Table:
            r = batch.column("raw").to_numpy().astype(np.int64)
            return pa.table({
                "node": batch.column("node"),
                "other": pa.array(np.full(r.size, -1, np.int64), pa.int64()),
                "s": pa.array(r * HITS_SCALE // np.int64(mx), pa.int64()),
            })

        return raw.map_batches(_scale, batch_format="pyarrow")

    hubs = knn.map_batches(_node_rows, batch_format="pyarrow")
    auths = None
    for _ in range(iters):
        auths = _push(hubs, reverse=False)
        hubs = _push(auths, reverse=True)

    def _final(tag: str):
        def _f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "vec_id": batch.column("node"),
                "hub": batch.column("s") if tag == "hub" else pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()),
                "auth": batch.column("s") if tag == "auth" else pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()),
            })
        return _f

    # union hub rows + auth rows + zero rows for every node, sum per node
    zeros = knn.map_batches(_node_rows, batch_format="pyarrow") \
        .map_batches(
            lambda b: pa.table({
                "vec_id": b.column("node"),
                "hub": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                "auth": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
            }), batch_format="pyarrow")
    return (
        hubs.map_batches(_final("hub"), batch_format="pyarrow")
        .union(auths.map_batches(_final("auth"), batch_format="pyarrow"))
        .union(zeros)
        .groupby("vec_id")
        .aggregate(Sum("hub", alias_name="hub"),
                   Sum("auth", alias_name="auth"))
    )


LABEL_HOLDOUT = 5  # vec_id % 5 == 0 treated as unlabeled


def q_knn_label_vote(sf_dir: str,
                     holdout: int = LABEL_HOLDOUT) -> ray.data.Dataset:
    """Semi-supervised label propagation, one round: vectors with
    vec_id % holdout == 0 are treated as UNLABELED and receive the
    majority label among their k nearest labeled neighbors (ties to
    the smallest label; vectors whose whole neighborhood is unlabeled
    emit nothing). This is the transductive-labeling step of a
    weak-supervision pipeline (label a seed set, propagate over the
    embedding kNN graph) — integer votes, so value-verified.

    Shape: edges restricted to unlabeled sources + label rows,
    union-tagged and co-located by NEIGHBOR id hash-bucket (one
    searchsorted attach per bucket, the same join layout as
    q_triangle_counts); vote counting is ONE groupby((vec, label));
    the per-vector argmax co-locates ≤ k vote rows per vector by
    vector bucket. No driver step; every kernel is numpy over the
    bucket's arrays."""
    from ray.data.aggregate import Sum

    nbk = _graph_buckets()
    knn = q_knn_graph(sf_dir)

    def _edge_rows(b: pa.Table) -> pa.Table:
        u = b.column("vec_id").to_numpy().astype(np.int64)
        v = b.column("nbr_id").to_numpy().astype(np.int64)
        keep = u % holdout == 0
        u, v = u[keep], v[keep]
        return pa.table({
            "node": pa.array(v, pa.int64()),
            "u": pa.array(u, pa.int64()),
            "lbl": pa.array(np.full(u.size, -1, np.int64), pa.int64()),
        })

    def _label_rows(b: pa.Table) -> pa.Table:
        vec = b.column("vec_id").to_numpy().astype(np.int64)
        lbl = b.column("label").to_numpy().astype(np.int64)
        keep = vec % holdout != 0
        vec, lbl = vec[keep], lbl[keep]
        return pa.table({
            "node": pa.array(vec, pa.int64()),
            "u": pa.array(np.full(vec.size, -1, np.int64), pa.int64()),
            "lbl": pa.array(lbl, pa.int64()),
        })

    def _bkt(batch: pa.Table) -> pa.Table:
        n_ = batch.column("node").to_numpy().astype(np.int64)
        return batch.append_column("bkt", pa.array(n_ % nbk, pa.int64()))

    def _attach(group: pa.Table) -> pa.Table:
        node = group.column("node").to_numpy().astype(np.int64)
        u = group.column("u").to_numpy().astype(np.int64)
        lbl = group.column("lbl").to_numpy().astype(np.int64)
        is_lab = u < 0
        ln, lv = node[is_lab], lbl[is_lab]
        order = np.argsort(ln, kind="stable")
        ln, lv = ln[order], lv[order]
        ev, eu = node[~is_lab], u[~is_lab]
        idx = np.searchsorted(ln, ev)
        ok = (idx < ln.size) & (ln[np.minimum(idx, max(ln.size - 1, 0))]
                                == ev) if ln.size else np.zeros(
                                    ev.size, bool)
        return pa.table({
            "vec_id": pa.array(eu[ok], pa.int64()),
            "pred_label": pa.array(lv[idx[ok]], pa.int64()),
            "n_votes": pa.array(np.ones(int(ok.sum()), np.int64),
                                pa.int64()),
        })

    def _vbkt(batch: pa.Table) -> pa.Table:
        v_ = batch.column("vec_id").to_numpy().astype(np.int64)
        return batch.append_column("vbkt", pa.array(v_ % nbk, pa.int64()))

    def _argmax(group: pa.Table) -> pa.Table:
        vec = group.column("vec_id").to_numpy().astype(np.int64)
        lbl = group.column("pred_label").to_numpy().astype(np.int64)
        n = group.column("n_votes").to_numpy().astype(np.int64)
        order = np.lexsort((lbl, -n, vec))
        vec, lbl, n = vec[order], lbl[order], n[order]
        first = np.concatenate(([True], vec[1:] != vec[:-1]))
        return pa.table({
            "vec_id": pa.array(vec[first], pa.int64()),
            "pred_label": pa.array(lbl[first], pa.int64()),
            "n_votes": pa.array(n[first], pa.int64()),
        })

    labels = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "label"])
    votes = (
        knn.map_batches(_edge_rows, batch_format="pyarrow")
        .union(labels.map_batches(_label_rows, batch_format="pyarrow"))
        .map_batches(_bkt, batch_format="pyarrow")
        .groupby("bkt").map_groups(_attach, batch_format="pyarrow")
        .groupby(["vec_id", "pred_label"])
        .aggregate(Sum("n_votes", alias_name="n_votes"))
    )
    return (
        votes.map_batches(_vbkt, batch_format="pyarrow")
        .groupby("vbkt").map_groups(_argmax, batch_format="pyarrow")
    )


# ------------------------------------------------ product quantization

PQ_M = 8                      # subspaces: 64 dims -> 8 x 8
_PQ_MEMO: dict[str, list[np.ndarray]] = {}


def pq_codebooks(sf_dir: str) -> list[np.ndarray]:
    """Per-subspace integer k-means codebooks for product quantization
    (Jégou et al., TPAMI'11): the embedding splits into PQ_M
    contiguous subvectors, each trained with the SAME exact-integer
    Lloyd recipe as the global codebook (init = K smallest vec_ids'
    subvectors, floor-div centroid updates) — so every subspace chain
    is SQL-unrollable and the codes are value-verified.

    Training is FUSED: one data pass per Lloyd iteration computes all
    PQ_M subspaces' partials together (per-batch (subspace, cluster,
    dim) integer sums → one small groupby → driver floor-div over
    M·K·(dsub+1) rows) — M separate trainings would scan the table
    M times."""
    key = os.path.realpath(sf_dir)
    if key in _PQ_MEMO:
        return [c.copy() for c in _PQ_MEMO[key]]
    init = _init_centroids(sf_dir)          # (K, dim) int64
    dim = init.shape[1]
    if dim % PQ_M:
        raise ValueError(f"dim {dim} not divisible by PQ_M={PQ_M}")
    ds = dim // PQ_M
    cents = [init[:, m * ds:(m + 1) * ds].copy() for m in range(PQ_M)]
    for _ in range(KMEANS_ITERS):
        cents = _pq_update_pass(sf_dir, cents, ds)
    _PQ_MEMO[key] = [c.copy() for c in cents]
    return cents


def _pq_update_pass(sf_dir: str, cents: list[np.ndarray],
                    ds: int) -> list[np.ndarray]:
    cent_ref = ray.put(cents)

    def _partials(batch: pa.Table) -> pa.Table:
        cs = ray.get(cent_ref)
        _, xq = _quantize(batch)
        empty = pa.table({"subspace": pa.array([], pa.int64()),
                          "cluster": pa.array([], pa.int64()),
                          "dim": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64())})
        if xq.shape[0] == 0:
            return empty
        out_m, out_c, out_d, out_s = [], [], [], []
        for m, c in enumerate(cs):
            sub = xq[:, m * ds:(m + 1) * ds]
            a = _assign(sub, c)
            for cl in np.unique(a):
                sums = sub[a == cl].sum(axis=0)
                out_m.append(np.full(ds + 1, m, np.int64))
                out_c.append(np.full(ds + 1, cl, np.int64))
                out_d.append(np.concatenate((np.arange(ds),
                                             [_COUNT_DIM])))
                out_s.append(np.concatenate(
                    (sums, [int((a == cl).sum())])))
        return pa.table({
            "subspace": pa.array(np.concatenate(out_m), pa.int64()),
            "cluster": pa.array(np.concatenate(out_c), pa.int64()),
            "dim": pa.array(np.concatenate(out_d).astype(np.int64),
                            pa.int64()),
            "s": pa.array(np.concatenate(out_s), pa.int64()),
        })

    merged = (
        _embeddings_ds(sf_dir)
        .map_batches(_partials, batch_format="pyarrow")
        .groupby(["subspace", "cluster", "dim"])
        .aggregate(Sum("s", alias_name="s"))
        .take_all()
    )
    k = cents[0].shape[0]
    sums = np.zeros((PQ_M, k, ds), np.int64)
    counts = np.zeros((PQ_M, k), np.int64)
    for r in merged:
        if r["dim"] == _COUNT_DIM:
            counts[r["subspace"], r["cluster"]] = r["s"]
        else:
            sums[r["subspace"], r["cluster"], r["dim"]] = r["s"]
    new = [c.copy() for c in cents]
    for m in range(PQ_M):
        nz = counts[m] > 0
        new[m][nz] = np.floor(
            sums[m][nz] / counts[m][nz, None]).astype(np.int64)
    return new


def q_pq_codes(sf_dir: str) -> ray.data.Dataset:
    """(vec_id, subspace, code): every vector's PQ code word — one
    streaming assign pass with the broadcast codebooks (64 ints per
    vector compress to PQ_M codes: the 100 TB embedding-storage
    path)."""
    cents = pq_codebooks(sf_dir)
    ds = cents[0].shape[1]
    cent_ref = ray.put(cents)

    def _codes(batch: pa.Table) -> pa.Table:
        cs = ray.get(cent_ref)
        ids, xq = _quantize(batch)
        n = ids.size
        return pa.table({
            "vec_id": pa.array(np.tile(ids, PQ_M), pa.int64()),
            "subspace": pa.array(np.repeat(np.arange(PQ_M), n),
                                 pa.int64()),
            "code": pa.array(np.concatenate(
                [_assign(xq[:, m * ds:(m + 1) * ds], cs[m])
                 for m in range(PQ_M)]), pa.int64()),
        })

    return _embeddings_ds(sf_dir).map_batches(_codes,
                                              batch_format="pyarrow")


def q_ann_pq_top10(sf_dir: str, k: int = 10) -> pa.Table:
    """ADC (asymmetric distance) top-k for the fixed query (vec_id 0)
    through the PQ codes: the query's per-subspace distances to every
    centroid form an M×K integer lookup table; a vector's approximate
    distance is the sum of its codes' LUT entries. The RANKING is a
    deterministic integer computation — so unlike most ANN entries
    this one is fully SQL-verified (the approximation is relative to
    true neighbors, not to the oracle). Per-batch LUT-gather +
    partial top-k, driver merges ≤ k·n_batches rows."""
    import pyarrow.parquet as pq

    cents = pq_codebooks(sf_dir)
    ds = cents[0].shape[1]
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qtab = pq.read_table(emb_path, filters=[("vec_id", "=", 0)],
                         columns=["vec_id", "embedding"])
    qx = np.trunc(np.asarray(qtab.column("embedding").to_pylist()[0],
                             np.float64) * KMEANS_SCALE).astype(np.int64)
    lut = np.stack([
        ((qx[m * ds:(m + 1) * ds][None, :] - cents[m]) ** 2).sum(axis=1)
        for m in range(PQ_M)
    ])                                     # (M, K) int64
    lut_ref = ray.put(lut)
    cent_ref = ray.put(cents)

    def _partial(batch: pa.Table) -> pa.Table:
        cs = ray.get(cent_ref)
        lt = ray.get(lut_ref)
        ids, xq = _quantize(batch)
        adc = np.zeros(ids.size, np.int64)
        for m in range(PQ_M):
            adc += lt[m][_assign(xq[:, m * ds:(m + 1) * ds], cs[m])]
        top = np.lexsort((ids, adc))[:k]
        return pa.table({
            "vec_id": pa.array(ids[top], pa.int64()),
            "adc_d2": pa.array(adc[top], pa.int64()),
        })

    parts = pa.concat_tables(ray.get(
        _embeddings_ds(sf_dir)
        .map_batches(_partial, batch_format="pyarrow")
        .to_arrow_refs()))
    ids = parts.column("vec_id").to_numpy().astype(np.int64)
    adc = parts.column("adc_d2").to_numpy().astype(np.int64)
    top = np.lexsort((ids, adc))[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, top.size + 1, dtype=np.int64),
                         pa.int64()),
        "vec_id": pa.array(ids[top], pa.int64()),
        "adc_d2": pa.array(adc[top], pa.int64()),
    })


def build_pq_family(sf_dir: str) -> tuple[list[np.ndarray], str]:
    """Persisted PQ serving family: the subspace codebooks (json) plus
    every vector's PQ CODES written hive-partitioned by the coarse
    k-means cluster — one codes directory aligned with the IVF layout,
    so IVF-PQ probing reads only the probed clusters' CODES (PQ_M
    ints/vector instead of the raw embedding) and never re-trains or
    re-encodes. Built once per source table and reused across
    processes, exactly like build_ivf_kmeans_index (round-4 verdict:
    codebook + encodings were rebuilt per invocation, ~7 s warm);
    the manifest keys on the source file, so a changed table
    rebuilds."""
    import json

    from candidategeneration_ray.pipelines.docquery import _cache_dir
    from candidategeneration_ray.state import checkpoint as ckpt

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    out = _cache_dir(sf_dir, f"pqfam-k{KMEANS_K}i{KMEANS_ITERS}m{PQ_M}")
    cb_path = os.path.join(out, "codebooks.json")
    codes_dir = os.path.join(out, "codes")
    if ckpt.is_complete(out, [emb_path]):
        cents = [np.array(c, dtype=np.int64)
                 for c in json.load(open(cb_path))]
        return cents, codes_dir
    ckpt.clear_stale(out)
    _, coarse = build_ivf_kmeans_index(sf_dir)
    cents = pq_codebooks(sf_dir)
    dsub = cents[0].shape[1]
    state_ref = ray.put((coarse, cents))

    def _codes(batch: pa.Table) -> pa.Table:
        co, cs = ray.get(state_ref)
        ids, xq = _quantize(batch)
        cols = {"vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(_assign(xq, co), pa.int64())}
        for m in range(PQ_M):
            cols[f"code_{m}"] = pa.array(
                _assign(xq[:, m * dsub:(m + 1) * dsub],
                        cs[m]).astype(np.int32), pa.int32())
        return pa.table(cols)

    os.makedirs(out, exist_ok=True)
    (ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
     .map_batches(_codes, batch_format="pyarrow")
     .write_parquet(codes_dir, partition_cols=["cluster"]))
    json.dump([c.tolist() for c in cents], open(cb_path, "w"))
    ckpt.write_manifest(out, {"phase": "pq-family", "inputs": [emb_path],
                              "k": KMEANS_K, "iters": KMEANS_ITERS,
                              "m": PQ_M})
    return cents, codes_dir


def q_ann_ivfpq_top10(sf_dir: str, k: int = 10,
                      nprobe: int = IVF_NPROBE) -> pa.Table:
    """IVF-PQ — the canonical vector-database layout, composed from
    two already-verified pieces: the COARSE k-means quantizer prunes
    the search to `nprobe` inverted lists (reading ONLY those
    clusters' partitions of the persisted IVF layout), and ADC over
    the PQ codes ranks the survivors. Both stages are deterministic
    integer computations, so the full two-stage ranking is
    SQL-verified — probe selection by (coarse d2, cluster) and final
    order by (adc_d2, vec_id).

    At 100 TB the probed read touches nprobe/K of the table and each
    candidate costs PQ_M LUT adds — this is the serving geometry the
    round-2 verdict asked for (persisted bucket layout + probe-time
    pruned read), now with compressed in-list scoring."""
    import glob

    import pyarrow.parquet as pq

    _, coarse = build_ivf_kmeans_index(sf_dir)
    cents, codes_dir = build_pq_family(sf_dir)
    ds = cents[0].shape[1]
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qtab = pq.read_table(emb_path, filters=[("vec_id", "=", 0)],
                         columns=["vec_id", "embedding"])
    qx = np.trunc(np.asarray(qtab.column("embedding").to_pylist()[0],
                             np.float64) * KMEANS_SCALE).astype(np.int64)
    # probe the nprobe nearest coarse centroids by (d2, cluster)
    cd2 = ((coarse - qx[None, :]) ** 2).sum(axis=1)
    probe = np.lexsort((np.arange(coarse.shape[0]), cd2))[:nprobe]
    files = []
    for c in sorted(int(c) for c in probe):
        files.extend(sorted(glob.glob(
            os.path.join(codes_dir, f"cluster={c}", "*.parquet"))))
    lut = np.stack([
        ((qx[m * ds:(m + 1) * ds][None, :] - cents[m]) ** 2).sum(axis=1)
        for m in range(PQ_M)
    ])
    lut_ref = ray.put(lut)
    code_cols = [f"code_{m}" for m in range(PQ_M)]

    def _partial(batch: pa.Table) -> pa.Table:
        """ADC over the PERSISTED codes: PQ_M LUT gathers per batch —
        no embedding read, no re-encode (build_pq_family)."""
        lt = ray.get(lut_ref)
        ids = batch.column("vec_id").to_numpy().astype(np.int64)
        if ids.size == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "adc_d2": pa.array([], pa.int64())})
        adc = np.zeros(ids.size, np.int64)
        for m in range(PQ_M):
            adc += lt[m][batch.column(code_cols[m]).to_numpy()]
        top = np.lexsort((ids, adc))[:k]
        return pa.table({
            "vec_id": pa.array(ids[top], pa.int64()),
            "adc_d2": pa.array(adc[top], pa.int64()),
        })

    parts = pa.concat_tables(ray.get(
        ray.data.read_parquet(files, columns=["vec_id"] + code_cols)
        .map_batches(_partial, batch_format="pyarrow")
        .to_arrow_refs()))
    ids = parts.column("vec_id").to_numpy().astype(np.int64)
    adc = parts.column("adc_d2").to_numpy().astype(np.int64)
    top = np.lexsort((ids, adc))[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, top.size + 1, dtype=np.int64),
                         pa.int64()),
        "vec_id": pa.array(ids[top], pa.int64()),
        "adc_d2": pa.array(adc[top], pa.int64()),
    })


def q_embedding_gram(sf_dir: str) -> ray.data.Dataset:
    """Distributed Gram matrix XᵀX over the quantized embeddings — the
    sufficient statistic for PCA / whitening / covariance (cov =
    Gram/n − mean meanᵀ, eigendecomposition is the driver-side float
    finalizer over a d×d result). The moments pattern at matrix scale:
    each batch contributes ONE d×d integer partial via a single matmul
    (never a row loop), the shuffle carries O(d²) rows per batch, and
    the groupby result is d(d+1)/2 upper-triangle rows total.

    int64 bound: |x| ≤ 2^16 ⇒ x² ≤ 2^32, safe to ~2^31 rows; beyond,
    per-shard Grams combine in int128/float128 on the driver
    (documented). Output (dim_a ≤ dim_b, sum_xy) plus the n row as
    (-1, -1, n)."""
    def _partial(batch: pa.Table) -> pa.Table:
        _, xq = _quantize(batch)
        if xq.shape[0] == 0:
            return pa.table({"dim_a": pa.array([], pa.int64()),
                             "dim_b": pa.array([], pa.int64()),
                             "sum_xy": pa.array([], pa.int64())})
        g = xq.T @ xq                       # (d, d) int64, one matmul
        d = g.shape[0]
        ia, ib = np.triu_indices(d)
        return pa.table({
            "dim_a": pa.array(np.concatenate((ia.astype(np.int64),
                                              [-1])), pa.int64()),
            "dim_b": pa.array(np.concatenate((ib.astype(np.int64),
                                              [-1])), pa.int64()),
            "sum_xy": pa.array(np.concatenate((g[ia, ib],
                                               [xq.shape[0]])),
                               pa.int64()),
        })

    return (
        _embeddings_ds(sf_dir)
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(["dim_a", "dim_b"])
        .aggregate(Sum("sum_xy", alias_name="sum_xy"))
    )


JL_DIMS = 16


def _jl_signs(dim_in: int, dim_out: int) -> np.ndarray:
    """Deterministic ±1 projection matrix: sign of the md5-derived
    h64('r|d') parity — reproducible everywhere including in SQL."""
    from candidategeneration_ray.functions.hashing import h64_many

    keys = [f"{r}|{d}" for r in range(dim_out) for d in range(dim_in)]
    bits = (h64_many(keys) & np.uint64(1)).astype(np.int64)
    return (2 * bits - 1).reshape(dim_out, dim_in)


def q_embedding_jl_sketch(sf_dir: str,
                          dim_out: int = JL_DIMS) -> ray.data.Dataset:
    """Johnson-Lindenstrauss sketch: project each quantized embedding
    through a DETERMINISTIC ±1 matrix (Achlioptas'03 database-friendly
    JL) down to dim_out integer coordinates — the 4× embedding
    compressor in front of dedup/clustering when full vectors are too
    wide to ship. Hash-derived signs make the projection reproducible
    on any worker AND in the SQL oracle, so the sketch values are
    hash-verified exactly (distance preservation is probabilistic;
    the COMPUTATION is deterministic).

    Shape: broadcast the (dim_out × dim) sign matrix once, one matmul
    per batch, long-form output. int64 bound: |x| ≤ 2^16, dim 64 ⇒
    |proj| ≤ 2^22."""
    signs_ref = None

    def _project(batch: pa.Table) -> pa.Table:
        nonlocal signs_ref
        ids, xq = _quantize(batch)
        if ids.size == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "jdim": pa.array([], pa.int64()),
                             "value": pa.array([], pa.int64())})
        s = _jl_signs(xq.shape[1], dim_out)     # cached per process by
        proj = xq @ s.T                          # numpy; tiny anyway
        n = ids.size
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, dim_out), pa.int64()),
            "jdim": pa.array(np.tile(np.arange(dim_out, dtype=np.int64),
                                     n), pa.int64()),
            "value": pa.array(proj.reshape(-1), pa.int64()),
        })

    return _embeddings_ds(sf_dir).map_batches(_project,
                                              batch_format="pyarrow")


CN_TOPK = 20


def q_common_neighbors(sf_dir: str, k_out: int = CN_TOPK) -> pa.Table:
    """Link prediction by common-neighbor count (the simplest of the
    classic neighborhood scores — Liben-Nowell & Kleinberg CIKM'03):
    the top NON-adjacent pairs of the undirected kNN graph ranked by
    how many neighbors they share. High scorers are edges the kNN
    truncation cut — the candidate pairs a graph-expansion /
    semi-supervised pass would probe first.

    Shape: the triangle plan with the closure polarity INVERTED —
    adjacency buckets emit sorted neighbor pairs (wedges, O(Σ deg²)
    bounded by kNN degree ≤ 2k), pair-hash buckets co-locate every
    copy of a pair, and each bucket counts its wedges per pair then
    DROPS pairs that are edges (the anti test is one sorted membership
    probe). Pair counts are bucket-complete, so the global answer is a
    dataset-side sort/limit over O(distinct candidate pairs) rows."""

    def _count_nonedges(group: pa.Table) -> pa.Table:
        pkey = group.column("pkey").to_numpy().astype(np.int64)
        apex = group.column("apex").to_numpy().astype(np.int64)
        is_edge = apex < 0
        ek = np.unique(pkey[is_edge])
        wk = pkey[~is_edge]
        if wk.size and ek.size:
            idx = np.minimum(np.searchsorted(ek, wk), ek.size - 1)
            wk = wk[ek[idx] != wk]
        if wk.size == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "n_common": pa.array([], pa.int64())})
        uk, cnt = np.unique(wk, return_counts=True)
        return pa.table({
            "u": pa.array(uk >> np.int64(32), pa.int64()),
            "v": pa.array(uk & np.int64(0xFFFFFFFF), pa.int64()),
            "n_common": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    top = (
        _wedge_edge_union(_knn_undirected_edges(sf_dir))
        .groupby("pbucket").map_groups(_count_nonedges,
                                       batch_format="pyarrow")
        .sort(key=["n_common", "u", "v"], descending=[True, False, False])
        .limit(k_out)
        .take_all()
    )
    return pa.table({
        "u": pa.array([r["u"] for r in top], pa.int64()),
        "v": pa.array([r["v"] for r in top], pa.int64()),
        "n_common": pa.array([r["n_common"] for r in top], pa.int64()),
    })


def _edge_degree_ref(edges: "ray.data.Dataset"):
    """Broadcast (sorted node ids, degrees) of an undirected edge set —
    the node-count-sized lookup the weighted link scores share. Built
    by a distributed degree groupby; only the merged O(nodes) summary
    touches the driver."""
    from ray.data.aggregate import Sum

    def _deg_rows(batch: pa.Table) -> pa.Table:
        node = np.concatenate((
            batch.column("u").to_numpy().astype(np.int64),
            batch.column("v").to_numpy().astype(np.int64)))
        uk, cnt = np.unique(node, return_counts=True)
        return pa.table({"node": pa.array(uk, pa.int64()),
                         "deg": pa.array(cnt.astype(np.int64), pa.int64())})

    deg_df = (edges.map_batches(_deg_rows, batch_format="pyarrow")
              .groupby("node").aggregate(Sum("deg", alias_name="deg"))
              ).to_pandas()  # node-count-sized
    dn = deg_df["node"].to_numpy(np.int64)
    dd = deg_df["deg"].to_numpy(np.int64)
    o = np.argsort(dn)
    return ray.put((dn[o], dd[o]))


JACCARD_LINK_NUM = 1
JACCARD_LINK_DEN = 4


def q_neighborhood_jaccard(sf_dir: str) -> pa.Table:
    """Link prediction by neighborhood Jaccard — the normalized
    companion of q_common_neighbors (Liben-Nowell & Kleinberg CIKM'03):
    every NON-adjacent pair of the undirected kNN graph whose
    |N(u)∩N(v)| / |N(u)∪N(v)| ≥ 1/4. The threshold comparison is
    EXACT by cross-multiplication — with uni = deg(u)+deg(v)−inter,
      inter/uni ≥ 1/4  ⟺  (4+1)·inter ≥ deg(u)+deg(v)
    — no float ratio anywhere, so the entry hash-verifies. Output
    (u, v, n_common, n_union) with both count columns exposed; the
    caller divides if it wants the score.

    Shape: the shared wedge plan (pair-hash buckets, bucket-complete
    counts, anti test against edges) plus ONE broadcast degree array
    (node-count-sized, built from a distributed degree groupby)."""
    edges = _knn_undirected_edges(sf_dir)
    deg_ref = _edge_degree_ref(edges)
    num = np.int64(JACCARD_LINK_NUM)
    den = np.int64(JACCARD_LINK_DEN)

    def _jaccard_pairs(group: pa.Table) -> pa.Table:
        pkey = group.column("pkey").to_numpy().astype(np.int64)
        apex = group.column("apex").to_numpy().astype(np.int64)
        is_edge = apex < 0
        ek = np.unique(pkey[is_edge])
        wk = pkey[~is_edge]
        if wk.size and ek.size:
            idx = np.minimum(np.searchsorted(ek, wk), ek.size - 1)
            wk = wk[ek[idx] != wk]
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "n_common": pa.array([], pa.int64()),
                          "n_union": pa.array([], pa.int64())})
        if wk.size == 0:
            return empty
        uk, inter = np.unique(wk, return_counts=True)
        u = uk >> np.int64(32)
        v = uk & np.int64(0xFFFFFFFF)
        gn, gd = ray.get(deg_ref)
        du = gd[np.searchsorted(gn, u)]
        dv = gd[np.searchsorted(gn, v)]
        keep = den * inter >= num * (du + dv - inter)
        if not keep.any():
            return empty
        return pa.table({
            "u": pa.array(u[keep], pa.int64()),
            "v": pa.array(v[keep], pa.int64()),
            "n_common": pa.array(inter[keep].astype(np.int64), pa.int64()),
            "n_union": pa.array((du + dv - inter)[keep].astype(np.int64),
                                pa.int64()),
        })

    rows = (_wedge_edge_union(edges)
            .groupby("pbucket")
            .map_groups(_jaccard_pairs, batch_format="pyarrow")
            ).take_all()  # O(qualifying pairs) — threshold-bounded
    rows.sort(key=lambda r: (-r["n_common"], r["u"], r["v"]))
    return pa.table({
        "u": pa.array([r["u"] for r in rows], pa.int64()),
        "v": pa.array([r["v"] for r in rows], pa.int64()),
        "n_common": pa.array([r["n_common"] for r in rows], pa.int64()),
        "n_union": pa.array([r["n_union"] for r in rows], pa.int64()),
    })


KCORE_K = 2
KCORE_SUPPORT = 2   # co-purchase edge support threshold
KCORE_ROUNDS = 12


def q_kcore_nodes(sf_dir: str, k: int = KCORE_K,
                  max_rounds: int = KCORE_ROUNDS) -> pa.Table:
    """k-core decomposition (Seidman 1983) of the CO-PURCHASE graph
    (parts adjacent when ≥ KCORE_SUPPORT orders contain both,
    relational.copurchase_edges — the kNN graph's min-degree-K
    construction makes its cores all-or-nothing, so the heavy-tailed
    association graph is the instructive input): the maximal subgraph
    in which every node keeps degree ≥ k — the standard dense-region
    extractor (community seeding, spam/outlier trimming).
    Simultaneous peeling: each round drops EVERY node whose degree
    among still-alive nodes is < k; the fixed point is unique and
    round-order independent, so the result is exact.

    Shape: edges stay distributed; each round is one map_batches
    (broadcast sorted removed-ids array, two searchsorted probes) +
    one node-keyed degree groupby whose output is node-count-sized
    (the same driver-material degree map the other graph scores use).
    Rounds are bounded by `max_rounds` and the function RAISES on
    non-convergence rather than returning a partial peel (the advisor
    rule from q_dup_clusters); the SQL oracle unrolls the same bound,
    and post-convergence rounds are idempotent, so early exit is safe.
    Output: (node, core_deg) — degree WITHIN the core."""
    from ray.data.aggregate import Sum

    from candidategeneration_ray.pipelines.relational import copurchase_edges

    edges = copurchase_edges(sf_dir, KCORE_SUPPORT).materialize()
    removed = np.empty(0, np.int64)

    def _deg_table(rem: np.ndarray):
        rem_ref = ray.put(rem)

        def _deg(batch: pa.Table) -> pa.Table:
            u = batch.column("u").to_numpy().astype(np.int64)
            v = batch.column("v").to_numpy().astype(np.int64)
            dead = ray.get(rem_ref)
            if dead.size:
                iu = np.minimum(np.searchsorted(dead, u), dead.size - 1)
                iv = np.minimum(np.searchsorted(dead, v), dead.size - 1)
                live = (dead[iu] != u) & (dead[iv] != v)
                u, v = u[live], v[live]
            node = np.concatenate((u, v))
            uk, cnt = np.unique(node, return_counts=True)
            return pa.table({"node": pa.array(uk, pa.int64()),
                             "deg": pa.array(cnt.astype(np.int64), pa.int64())})

        df = (edges.map_batches(_deg, batch_format="pyarrow")
              .groupby("node").aggregate(Sum("deg", alias_name="deg"))
              ).to_pandas()  # node-count-sized
        if "deg" not in df.columns:  # every edge peeled away
            import pandas as pd

            return pd.DataFrame({"node": np.empty(0, np.int64),
                                 "deg": np.empty(0, np.int64)})
        return df

    deg = None
    for _ in range(max_rounds):
        deg = _deg_table(removed)
        drop = deg[deg["deg"] < k]["node"].to_numpy(np.int64)
        if drop.size == 0:
            break
        removed = np.union1d(removed, drop)
    else:
        raise ValueError(
            f"k-core peeling did not converge in {max_rounds} rounds "
            f"(still dropping); raise max_rounds (and regenerate the "
            "unrolled oracle to the same bound)")
    core = deg[deg["deg"] >= k].sort_values("node")
    return pa.table({
        "node": pa.array(core["node"].to_numpy(np.int64), pa.int64()),
        "core_deg": pa.array(core["deg"].to_numpy(np.int64), pa.int64()),
    })


# ------------------------------------------------------- mutual kNN

def q_mutual_knn(sf_dir: str, k: int = KNN_K) -> ray.data.Dataset:
    """Reciprocal (mutual) kNN edges — the density-robust link filter
    (an edge survives iff EACH endpoint ranks the other inside its own
    top-k; hub vectors that everyone points at but that point back at
    nothing lose their spurious links). Intersection of the directed
    kNN graph with its transpose: canonicalize each directed edge to
    (min, max), one groupby — a pair kept iff both directions arrived.
    d2 is symmetric integer L2, so Max == the single shared value.
    Output (a, b, d2) with a < b."""
    from ray.data.aggregate import Max

    g = q_knn_graph(sf_dir, k=k)

    def _pairs(batch: pa.Table) -> pa.Table:
        v = batch.column("vec_id").to_numpy().astype(np.int64)
        n = batch.column("nbr_id").to_numpy().astype(np.int64)
        d2 = batch.column("d2").to_numpy().astype(np.int64)
        return pa.table({
            "a": pa.array(np.minimum(v, n), pa.int64()),
            "b": pa.array(np.maximum(v, n), pa.int64()),
            "d2": pa.array(d2, pa.int64()),
            "ndir": pa.array(np.ones(v.size, np.int64), pa.int64()),
        })

    agg = (g.map_batches(_pairs, batch_format="pyarrow")
           .groupby(["a", "b"])
           .aggregate(Sum("ndir", alias_name="ndir"),
                      Max("d2", alias_name="d2")))

    def _mutual(batch: pa.Table) -> pa.Table:
        keep = batch.column("ndir").to_numpy().astype(np.int64) == 2
        t = batch.filter(pa.array(keep))
        return pa.table({
            "a": t.column("a").cast(pa.int64()),
            "b": t.column("b").cast(pa.int64()),
            "d2": t.column("d2").cast(pa.int64()),
        })

    return agg.map_batches(_mutual, batch_format="pyarrow")


# ----------------------------------------------------- k-center coreset

KCENTER_K = 8


def q_kcenter_coreset(sf_dir: str, k: int = KCENTER_K) -> pa.Table:
    """Greedy k-center coreset selection (Gonzalez 1985's 2-approx
    farthest-point traversal) — the geometric data-pruning primitive
    behind coverage-maximizing training-subset selection: start from
    the lowest vec_id, then k-1 times add the vector FARTHEST (integer
    squared L2 over the shared power-of-two quantization) from the
    chosen set, ties broken by lowest vec_id. Each selected row carries
    the distance at which it was chosen — a non-increasing sequence of
    coverage radii, so the output doubles as the corpus' covering-
    radius profile.

    Shape: k-1 rounds, each ONE broadcast map_batches pass (chosen
    centers via ray.put) emitting a single per-batch (argmax d2) row;
    the driver folds only n_batches partials per round and holds k
    vectors. No shuffle at all — the same partial-argmax skeleton as
    _init_centroids. At 10^9 vectors the cost is k scans, which is why
    greedy k-center (not exact k-center, NP-hard) is the standard
    coreset pick."""
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "d2": pa.array([], pa.int64()),
                      "xq": pa.array([], pa.list_(pa.int64()))})

    def _seed_partial(batch: pa.Table) -> pa.Table:
        ids, xq = _quantize(batch)
        if ids.size == 0:
            return empty
        j = int(np.argmin(ids))
        return pa.table({"vec_id": pa.array([ids[j]], pa.int64()),
                         "d2": pa.array([0], pa.int64()),
                         "xq": pa.array([xq[j].tolist()], pa.list_(pa.int64()))})

    seed_rows = sorted(
        _embeddings_ds(sf_dir).map_batches(
            _seed_partial, batch_format="pyarrow").take_all(),
        key=lambda r: r["vec_id"])
    if not seed_rows:
        return pa.table({"round": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "d2": pa.array([], pa.int64())})
    chosen_ids = [int(seed_rows[0]["vec_id"])]
    chosen_xq = [np.asarray(seed_rows[0]["xq"], dtype=np.int64)]
    chosen_d2 = [0]

    for _ in range(1, k):
        ref = ray.put((np.asarray(chosen_ids, np.int64),
                       np.stack(chosen_xq)))

        def _far_partial(batch: pa.Table) -> pa.Table:
            ids, xq = _quantize(batch)
            if ids.size == 0:
                return empty
            cids, c = ray.get(ref)
            keep = ~np.isin(ids, cids)
            if not keep.any():
                return empty
            ids, xq = ids[keep], xq[keep]
            d2 = (
                (xq * xq).sum(axis=1, keepdims=True)
                - 2 * (xq @ c.T)
                + (c * c).sum(axis=1)[None, :]
            ).min(axis=1)
            j = int(np.lexsort((ids, -d2))[0])
            return pa.table({"vec_id": pa.array([ids[j]], pa.int64()),
                             "d2": pa.array([int(d2[j])], pa.int64()),
                             "xq": pa.array([xq[j].tolist()],
                                            pa.list_(pa.int64()))})

        partials = _embeddings_ds(sf_dir).map_batches(
            _far_partial, batch_format="pyarrow").take_all()
        if not partials:
            break
        win = min(partials, key=lambda r: (-int(r["d2"]), int(r["vec_id"])))
        chosen_ids.append(int(win["vec_id"]))
        chosen_xq.append(np.asarray(win["xq"], dtype=np.int64))
        chosen_d2.append(int(win["d2"]))

    return pa.table({
        "round": pa.array(np.arange(len(chosen_ids)), pa.int64()),
        "vec_id": pa.array(chosen_ids, pa.int64()),
        "d2": pa.array(chosen_d2, pa.int64()),
    })


# --------------------------------------------------------------- DBSCAN

DBSCAN_EPS2 = 5_600_000_000   # integer squared-L2 radius (quantized space)
DBSCAN_MIN_PTS = 4            # |N_eps(p)| >= min_pts (self included) -> core


def _eps_pairs(sf_dir: str, eps2: int, n_blocks: int = 4) -> ray.data.Dataset:
    """Exact eps-neighbor pairs (a < b, integer squared L2 <= eps2) via
    the block-pair all-pairs decomposition (same shape as
    extras.q_embedding_neardups: every pair scored exactly once, no
    task holds more than 2/n_blocks of the table, scale by raising
    n_blocks)."""

    def _expand(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy().astype(np.int64)
        blk = (ids % n_blocks).astype(np.int64)
        pair_of = np.empty((n_blocks, n_blocks), dtype=np.int64)
        side_of = np.empty((n_blocks, n_blocks), dtype=np.int64)
        for k in range(n_blocks):
            for j in range(n_blocks):
                lo, hi = min(k, j), max(k, j)
                pair_of[k, j] = lo * n_blocks + hi
                side_of[k, j] = 0 if k == lo else 1
        take = np.repeat(np.arange(ids.size), n_blocks)
        pair_id = pair_of[np.repeat(blk, n_blocks),
                          np.tile(np.arange(n_blocks), ids.size)]
        side = side_of[np.repeat(blk, n_blocks),
                       np.tile(np.arange(n_blocks), ids.size)]
        rep = batch.take(take)
        return pa.table({
            "pair_id": pa.array(pair_id, pa.int64()),
            "side": pa.array(side, pa.int64()),
            "vec_id": rep.column("vec_id").cast(pa.int64()),
            "embedding": rep.column("embedding"),
        })

    def _d2(xa: np.ndarray, xb: np.ndarray) -> np.ndarray:
        return ((xa * xa).sum(axis=1)[:, None]
                - 2 * (xa @ xb.T)
                + (xb * xb).sum(axis=1)[None, :])

    def _score_group(group: pa.Table) -> pa.Table:
        pair_id = int(group.column("pair_id")[0].as_py())
        i, j = divmod(pair_id, n_blocks)
        side = group.column("side").to_numpy().astype(np.int64)
        ids = group.column("vec_id").to_numpy().astype(np.int64)
        xq = np.trunc(np.array(group.column("embedding").to_pylist(),
                               dtype=np.float64) * KMEANS_SCALE).astype(np.int64)
        if i == j:
            m0 = side == 0
            x, xid = xq[m0], ids[m0]
            d2 = _d2(x, x)
            ia, ib = np.triu_indices(xid.size, k=1)
            keep = d2[ia, ib] <= eps2
            a, b = xid[ia[keep]], xid[ib[keep]]
        else:
            m0, m1 = side == 0, side == 1
            xa, ida = xq[m0], ids[m0]
            xb, idb = xq[m1], ids[m1]
            d2 = _d2(xa, xb)
            ka, kb = np.nonzero(d2 <= eps2)
            a, b = ida[ka], idb[kb]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"a": pa.array(lo, pa.int64()),
                         "b": pa.array(hi, pa.int64())})

    return (
        _embeddings_ds(sf_dir)
        .map_batches(_expand, batch_format="pyarrow")
        .groupby("pair_id").map_groups(_score_group, batch_format="pyarrow")
    )



@ray.remote
def _dbscan_small(min_pts: int, *tables: pa.Table) -> pa.Table:
    """Task-sized DBSCAN over the eps-pair edge list (the dup_clusters
    small-graph pattern): degree coreness, CC over core-core edges
    (pointer-jumped min-label), deterministic min-label border rule —
    all in ONE task over object-store edge blocks. Returns (vec_id,
    cluster, is_core) for edge-touched nodes only; isolated nodes get
    their noise rows from the identity union outside."""
    tables = [t for t in tables if t.num_rows > 0]
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "cluster": pa.array([], pa.int64()),
                      "is_core": pa.array([], pa.int64())})
    if not tables:
        return empty
    t = pa.concat_tables(tables)
    a = t.column("a").to_numpy().astype(np.int64)
    b = t.column("b").to_numpy().astype(np.int64)
    src = np.concatenate((a, b))
    dst = np.concatenate((b, a))
    nodes = np.unique(src)
    isrc = np.searchsorted(nodes, src)
    idst = np.searchsorted(nodes, dst)
    deg = np.bincount(isrc, minlength=nodes.size)
    core = deg + 1 >= min_pts
    # CC over core-core edges: pointer-jumped min-label propagation
    label = np.where(core, np.arange(nodes.size), -1)
    cc = core[isrc] & core[idst]
    ci, cj = isrc[cc], idst[cc]
    while True:
        new = label.copy()
        if ci.size:
            np.minimum.at(new, ci, label[cj])
        nz = new >= 0
        new[nz] = np.minimum(new[nz], new[new[nz]])
        if np.array_equal(new, label):
            break
        label = new
    cluster = np.full(nodes.size, -1, np.int64)
    cluster[core] = nodes[label[core]]
    # border: non-core with a core neighbor -> min core cluster
    be = core[isrc] & ~core[idst]
    if be.any():
        bl = np.full(nodes.size, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(bl, idst[be], cluster[isrc[be]])
        hasb = ~core & (bl < np.iinfo(np.int64).max)
        cluster[hasb] = bl[hasb]
    return pa.table({
        "vec_id": pa.array(nodes, pa.int64()),
        "cluster": pa.array(cluster, pa.int64()),
        "is_core": pa.array(core.astype(np.int64), pa.int64()),
    })


def q_dbscan_clusters(sf_dir: str, eps2: int = DBSCAN_EPS2,
                      min_pts: int = DBSCAN_MIN_PTS,
                      n_blocks: int = 4,
                      n_buckets: int = 64,
                      small_graph_max_pairs: int = 2_500_000) -> ray.data.Dataset:
    """Deterministic DBSCAN over the quantized embeddings — the
    density-based clustering class (kmeans partitions EVERYTHING;
    DBSCAN finds dense regions and labels sparse points noise):

      core    |N_eps(p)| >= min_pts (self included)
      cluster connected components of the core-core eps-graph,
              labeled by min core vec_id (order-free, unlike textbook
              DBSCAN's scan-order border assignment)
      border  non-core with a core eps-neighbor -> MIN core neighbor's
              cluster (deterministic variant of the order-dependent
              tie)
      noise   everything else, cluster = -1

    Shape: exact eps-pairs by block-pair decomposition -> degree
    groupby -> coreness attached to edges by two bucketed union-tag
    joins -> CC over the core-core subgraph (single-task fast path /
    label-propagation rounds, the q_dup_clusters machinery) -> border
    labels as one more bucketed join + groupby(min). Every stage is a
    bounded shuffle; nothing corpus-sized touches the driver.
    Output (vec_id, cluster, is_core)."""
    from ray.data.aggregate import Count, Max, Min

    from candidategeneration_ray.pipelines.extras import (
        _doc_buckets, _propagation_rounds, _small_graph_cc)

    pairs = _eps_pairs(sf_dir, eps2, n_blocks).materialize()

    def _ident(batch: pa.Table) -> pa.Table:
        v = batch.column("vec_id").cast(pa.int64())
        return pa.table({
            "vec_id": v,
            "cluster": pa.array(np.full(batch.num_rows, -1, np.int64),
                                pa.int64()),
            "is_core": pa.array(np.zeros(batch.num_rows, np.int64),
                                pa.int64()),
        })

    ident = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id"]
    ).map_batches(_ident, batch_format="pyarrow")

    # small-graph fast path (the dup_clusters pattern): the pair list is
    # duplication/density-bound, so even large corpora often fit one
    # task; the staged path below handles graphs past the threshold
    if pairs.count() <= small_graph_max_pairs:
        labels = ray.data.from_arrow_refs(
            [_dbscan_small.remote(min_pts, *pairs.to_arrow_refs())])
        return (
            ident.union(labels)
            .groupby("vec_id")
            .aggregate(Max("cluster", alias_name="cluster"),
                       Max("is_core", alias_name="is_core"))
        )

    def _sym(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate((a, b)), pa.int64()),
            "dst": pa.array(np.concatenate((b, a)), pa.int64()),
        })

    sym = pairs.map_batches(_sym, batch_format="pyarrow").materialize()
    deg = sym.groupby("src").aggregate(Count(alias_name="deg"))

    def _core_flags(batch: pa.Table) -> pa.Table:
        d = batch.column("deg").to_numpy().astype(np.int64)
        keep = d + 1 >= min_pts
        t = batch.filter(pa.array(keep))
        return pa.table({"node": t.column("src").cast(pa.int64())})

    cores = deg.map_batches(_core_flags, batch_format="pyarrow").materialize()

    # attach coreness to edges: bucketed union-tag join, keyed by src
    # then by dst (kind 1 = flag row, kind 0 = edge row)
    def _tag_edges(key: str):
        def _f(batch: pa.Table) -> pa.Table:
            k = batch.column(key).to_numpy().astype(np.int64)
            out = {"bkt": pa.array((k % n_buckets), pa.int64()),
                   "kind": pa.array(np.zeros(k.size, np.int64), pa.int64())}
            for c in batch.column_names:
                out[c] = batch.column(c)
            return pa.table(out)
        return _f

    def _join_core(key: str, flag_col: str):
        def _g(group: pa.Table) -> pa.Table:
            kind = group.column("kind").to_numpy().astype(np.int64)
            flags = group.filter(pa.array(kind == 1))
            edges = group.filter(pa.array(kind == 0))
            core_set = np.sort(flags.column(key).to_numpy().astype(np.int64))
            k = edges.column(key).to_numpy().astype(np.int64)
            pos = np.searchsorted(core_set, k)
            pos_c = np.minimum(pos, max(core_set.size - 1, 0))
            is_core = (core_set.size > 0) & (core_set[pos_c] == k) \
                if core_set.size else np.zeros(k.size, bool)
            out = {c: edges.column(c) for c in edges.column_names
                   if c not in ("bkt", "kind")}
            out[flag_col] = pa.array(is_core.astype(np.int64), pa.int64())
            return pa.table(out)
        return _g

    # pass 1: src coreness
    edges1_in = sym.map_batches(_tag_edges("src"), batch_format="pyarrow")
    flags1 = cores.map_batches(
        lambda b: pa.table({
            "bkt": pa.array(b.column("node").to_numpy().astype(np.int64)
                            % n_buckets, pa.int64()),
            "kind": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
            "src": b.column("node").cast(pa.int64()),
            "dst": pa.array(np.full(b.num_rows, -1, np.int64), pa.int64()),
        }), batch_format="pyarrow")
    e1 = (edges1_in.union(flags1).groupby("bkt")
          .map_groups(_join_core("src", "src_core"), batch_format="pyarrow"))

    # pass 2: dst coreness
    edges2_in = e1.map_batches(_tag_edges("dst"), batch_format="pyarrow")
    flags2 = cores.map_batches(
        lambda b: pa.table({
            "bkt": pa.array(b.column("node").to_numpy().astype(np.int64)
                            % n_buckets, pa.int64()),
            "kind": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
            "src": pa.array(np.full(b.num_rows, -1, np.int64), pa.int64()),
            "dst": b.column("node").cast(pa.int64()),
            "src_core": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
        }), batch_format="pyarrow")
    e2 = (edges2_in.union(flags2).groupby("bkt")
          .map_groups(_join_core("dst", "dst_core"),
                      batch_format="pyarrow").materialize())

    # CC over core-core edges (symmetric by construction)
    cc_edges = e2.filter(
        expr="src_core == 1 and dst_core == 1").select_columns(["src", "dst"])
    n_cc = cc_edges.count()
    if n_cc == 0:
        cc_labels = ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "lbl": pa.array([], pa.int64())}))
    elif n_cc <= 5_000_000:
        cc_labels = ray.data.from_arrow_refs(
            [_small_graph_cc.remote(*cc_edges.to_arrow_refs())])
    else:
        def _with_lbl(batch: pa.Table) -> pa.Table:
            s = batch.column("src")
            return pa.table({
                "src": s, "dst": batch.column("dst"),
                "lbl": pa.array(np.full(batch.num_rows,
                                        np.iinfo(np.int64).max, np.int64),
                                pa.int64())})
        cc_labels = _propagation_rounds(
            cc_edges.map_batches(_with_lbl,
                                 batch_format="pyarrow").materialize(), 40,
            num_buckets=_doc_buckets(sf_dir, "embeddings"))

    # full core labels = CC labels  ∪  core identity (isolated cores)
    core_ident = cores.map_batches(
        lambda b: pa.table({"node": b.column("node").cast(pa.int64()),
                            "lbl": b.column("node").cast(pa.int64())}),
        batch_format="pyarrow")
    core_lbl = (core_ident.union(cc_labels).groupby("node")
                .aggregate(Min("lbl", alias_name="lbl")).materialize())

    # border: core src -> non-core dst edges, label = min core nbr lbl;
    # one more bucketed union-tag join keyed by src
    border_edges = e2.filter(expr="src_core == 1 and dst_core == 0")

    def _tag_border(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy().astype(np.int64)
        return pa.table({
            "bkt": pa.array(s % n_buckets, pa.int64()),
            "kind": pa.array(np.zeros(s.size, np.int64), pa.int64()),
            "src": pa.array(s, pa.int64()),
            "dst": batch.column("dst").cast(pa.int64()),
            "lbl": pa.array(np.full(s.size, -1, np.int64), pa.int64()),
        })

    def _tag_lbls(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_numpy().astype(np.int64)
        return pa.table({
            "bkt": pa.array(n % n_buckets, pa.int64()),
            "kind": pa.array(np.ones(n.size, np.int64), pa.int64()),
            "src": pa.array(n, pa.int64()),
            "dst": pa.array(np.full(n.size, -1, np.int64), pa.int64()),
            "lbl": batch.column("lbl").cast(pa.int64()),
        })

    def _attach_lbl(group: pa.Table) -> pa.Table:
        kind = group.column("kind").to_numpy().astype(np.int64)
        lrows = group.filter(pa.array(kind == 1))
        erows = group.filter(pa.array(kind == 0))
        keys = lrows.column("src").to_numpy().astype(np.int64)
        vals = lrows.column("lbl").to_numpy().astype(np.int64)
        order = np.argsort(keys)
        keys, vals = keys[order], vals[order]
        s = erows.column("src").to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, s)
        return pa.table({
            "dst": erows.column("dst").cast(pa.int64()),
            "lbl": pa.array(vals[pos], pa.int64()),
        })

    border_lbl = (
        border_edges.map_batches(_tag_border, batch_format="pyarrow")
        .union(core_lbl.map_batches(_tag_lbls, batch_format="pyarrow"))
        .groupby("bkt").map_groups(_attach_lbl, batch_format="pyarrow")
        .groupby("dst").aggregate(Min("lbl", alias_name="lbl"))
    )

    # final union: identity(-1, non-core) ∪ core(lbl, 1) ∪ border(lbl, 0)
    core_rows = core_lbl.map_batches(
        lambda b: pa.table({
            "vec_id": b.column("node").cast(pa.int64()),
            "cluster": b.column("lbl").cast(pa.int64()),
            "is_core": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
        }), batch_format="pyarrow")
    border_rows = border_lbl.map_batches(
        lambda b: pa.table({
            "vec_id": b.column("dst").cast(pa.int64()),
            "cluster": b.column("lbl").cast(pa.int64()),
            "is_core": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
        }), batch_format="pyarrow")

    return (
        ident.union(core_rows).union(border_rows)
        .groupby("vec_id")
        .aggregate(Max("cluster", alias_name="cluster"),
                   Max("is_core", alias_name="is_core"))
    )


# ----------------------------------------------- Adamic-Adar link score

AA_LN_PPB_SCALE = 10 ** 9     # ln values held as parts-per-billion ints
AA_WEIGHT_NUM = 10 ** 15      # w(d) = AA_WEIGHT_NUM // ln_ppb(d)
AA_DEG_CAP = 1024             # LUT domain cap: ln is nearly flat past
                              # this, so hub apexes clamp (documented)
AA_TOPK = 20


def aa_weight_lut() -> list[int]:
    """Adamic-Adar apex weights 1/ln(d) as FIXED integers for
    d = 2..AA_DEG_CAP: w(d) = 10^15 // round(ln(d)*10^9). Shared
    verbatim by the engine (numpy array) and the SQL oracle (inlined
    VALUES), so the weighted sum is deterministic integer arithmetic
    end to end — the same bounded-domain scaled-ln trick as
    sketches.hll_ln_lut()."""
    d = np.arange(2, AA_DEG_CAP + 1, dtype=np.float64)
    ln_ppb = np.round(np.log(d) * AA_LN_PPB_SCALE).astype(np.int64)
    return [AA_WEIGHT_NUM // int(x) for x in ln_ppb]


def q_adamic_adar(sf_dir: str, k_out: int = AA_TOPK) -> pa.Table:
    """Link prediction by the Adamic-Adar score (Adamic & Adar 2003;
    Liben-Nowell & Kleinberg CIKM'03): the top NON-adjacent pairs of
    the undirected kNN graph ranked by Σ_z 1/ln(deg(z)) over their
    common neighbors z — rare shared neighbors count for more than
    hub ones, the refinement plain common-neighbor counting lacks.

    Exactness: apex weights come from the fixed integer LUT
    aa_weight_lut() (deg clamped at AA_DEG_CAP), so scores are int64
    sums both sides compute identically — the entry hash-verifies.

    Shape: the shared wedge plan (q_common_neighbors) — adjacency
    buckets emit wedges with their apex attached, pair-hash buckets
    co-locate every copy of a pair — plus ONE broadcast degree array
    (_edge_degree_ref); per-bucket the apex degrees become LUT weights
    summed per pair with an int64 sorted reduceat (no float
    accumulation). O(Σ deg²) wedge rows, degree-bounded; the global
    answer is a dataset-side sort/limit over distinct candidate
    pairs."""
    edges = _knn_undirected_edges(sf_dir)
    deg_ref = _edge_degree_ref(edges)
    lut = np.zeros(AA_DEG_CAP + 1, dtype=np.int64)
    lut[2:] = np.asarray(aa_weight_lut(), dtype=np.int64)

    def _aa_pairs(group: pa.Table) -> pa.Table:
        pkey = group.column("pkey").to_numpy().astype(np.int64)
        apex = group.column("apex").to_numpy().astype(np.int64)
        is_edge = apex < 0
        ek = np.unique(pkey[is_edge])
        wk = pkey[~is_edge]
        wapex = apex[~is_edge]
        if wk.size and ek.size:
            idx = np.minimum(np.searchsorted(ek, wk), ek.size - 1)
            keep = ek[idx] != wk
            wk, wapex = wk[keep], wapex[keep]
        if wk.size == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "n_common": pa.array([], pa.int64()),
                             "aa_score": pa.array([], pa.int64())})
        gn, gd = ray.get(deg_ref)
        dz = gd[np.searchsorted(gn, wapex)]
        w = lut[np.minimum(dz, np.int64(AA_DEG_CAP))]
        order = np.argsort(wk, kind="stable")
        wk, w = wk[order], w[order]
        starts = np.flatnonzero(
            np.concatenate(([True], wk[1:] != wk[:-1])))
        score = np.add.reduceat(w, starts)          # int64-exact
        cnt = np.diff(np.concatenate((starts, [wk.size])))
        uk = wk[starts]
        return pa.table({
            "u": pa.array(uk >> np.int64(32), pa.int64()),
            "v": pa.array(uk & np.int64(0xFFFFFFFF), pa.int64()),
            "n_common": pa.array(cnt.astype(np.int64), pa.int64()),
            "aa_score": pa.array(score, pa.int64()),
        })

    top = (
        _wedge_edge_union(edges)
        .groupby("pbucket").map_groups(_aa_pairs, batch_format="pyarrow")
        .sort(key=["aa_score", "u", "v"], descending=[True, False, False])
        .limit(k_out)
        .take_all()
    )
    return pa.table({
        "u": pa.array([r["u"] for r in top], pa.int64()),
        "v": pa.array([r["v"] for r in top], pa.int64()),
        "n_common": pa.array([r["n_common"] for r in top], pa.int64()),
        "aa_score": pa.array([r["aa_score"] for r in top], pa.int64()),
    })


# ------------------------------------------- deterministic random walks

WALK_STEPS = 4     # walk length (sequence = start + WALK_STEPS nodes)
WALK_WINDOW = 2    # co-occurrence window over the walk sequence
WALK_TOPK = 50


def _walk_choice_hash(cur: np.ndarray, step: int) -> np.ndarray:
    """uint64 hash drawn once per (node, step) — the deterministic
    stand-in for the walk's random next-neighbor draw (md5, so the SQL
    oracle replays the exact walks)."""
    from candidategeneration_ray.functions import hashing as H

    return H.h64_many([f"{int(c)}:{step}" for c in cur])


@ray.remote
def _small_graph_walks(steps: int, *tables: pa.Table) -> pa.Table:
    """Deterministic walk sequences over a task-sized symmetric edge
    list — one numpy task over object-store blocks computing EXACTLY
    the staged rounds' hops: next = sorted-neighbors[h64(cur:step) %
    deg]. Returns (walk, step, node) rows for steps 0..steps."""
    tables = [t for t in tables if t.num_rows > 0]
    u = np.concatenate([t.column("u").to_numpy().astype(np.int64)
                        for t in tables])
    v = np.concatenate([t.column("v").to_numpy().astype(np.int64)
                        for t in tables])
    node = np.concatenate((u, v))
    nbr = np.concatenate((v, u))
    order = np.lexsort((nbr, node))
    node, nbr = node[order], nbr[order]
    nodes = np.unique(node)
    starts = np.searchsorted(node, nodes, side="left")
    ends = np.searchsorted(node, nodes, side="right")
    deg = (ends - starts).astype(np.uint64)
    cur = nodes.copy()
    out_w = [nodes]
    out_s = [np.zeros(nodes.size, np.int64)]
    out_n = [nodes]
    for step in range(steps):
        pick = (_walk_choice_hash(cur, step) % deg[
            np.searchsorted(nodes, cur)]).astype(np.int64)
        cur = nbr[starts[np.searchsorted(nodes, cur)] + pick]
        out_w.append(nodes)
        out_s.append(np.full(nodes.size, step + 1, np.int64))
        out_n.append(cur)
    return pa.table({
        "walk": pa.array(np.concatenate(out_w), pa.int64()),
        "step": pa.array(np.concatenate(out_s), pa.int64()),
        "node": pa.array(np.concatenate(out_n), pa.int64()),
    })


def q_walk_cooccurrence(sf_dir: str, steps: int = WALK_STEPS,
                        window: int = WALK_WINDOW,
                        k_out: int = WALK_TOPK,
                        small_graph_max_edges: int = 2_500_000) -> pa.Table:
    """DeepWalk-style graph context mining (Perozzi et al. KDD'14 —
    the corpus-generation half, which is the distributed part): one
    walk starts at every node of the undirected kNN graph; the next
    hop is the h64(node:step) % deg -th sorted neighbor (deterministic
    hash draws, so the walks — and therefore the entry — replay
    exactly in SQL); the output is the top co-occurring node pairs
    within a WALK_WINDOW skip-gram window over the walk sequences,
    i.e. the positive-pair corpus a node-embedding trainer consumes.

    Shape: adjacency rows bucket by node hash and materialize ONCE;
    each of `steps` rounds is one groupby(bkt) join of the frontier
    against its bucket's sorted adjacency (deg lookup + one pick per
    walk — no per-node Python loop beyond the hash draw); sequences
    then co-locate by walk id for the window-pair expansion
    (O(walks × steps × window) rows) and ONE pair groupby finishes.
    The driver sees only the merged top-k."""
    from ray.data.aggregate import Sum

    nbk = _graph_buckets()
    und = _knn_undirected_edges(sf_dir).materialize()

    if und.count() <= small_graph_max_edges:
        # bounded fast path (the shared single-task pattern): walks in
        # one numpy task; the staged rounds below stay the >cap route
        # (equality pytest). The window-pair expansion still runs
        # distributed over the walk-id buckets.
        seq = ray.data.from_arrow_refs([_small_graph_walks.remote(
            steps, *und.to_arrow_refs())])
        return _walk_pairs_topk(seq, window, k_out, nbk)

    def _adj_rows(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy().astype(np.int64)
        v = b.column("v").to_numpy().astype(np.int64)
        src = np.concatenate((u, v))
        dst = np.concatenate((v, u))
        return pa.table({
            "bkt": pa.array(src % nbk, pa.int64()),
            "node": pa.array(src, pa.int64()),
            "nbr": pa.array(dst, pa.int64()),
        })

    adj = (und
           .map_batches(_adj_rows, batch_format="pyarrow")
           .materialize())

    def _start_rows(b: pa.Table) -> pa.Table:
        vec = b.column("vec_id").to_numpy().astype(np.int64)
        return pa.table({
            "bkt": pa.array(vec % nbk, pa.int64()),
            "walk": pa.array(vec, pa.int64()),
            "cur": pa.array(vec, pa.int64()),
        })

    frontier = (_embeddings_ds(sf_dir).select_columns(["vec_id"])
                .map_batches(_start_rows, batch_format="pyarrow"))
    seq_parts = []   # datasets of (walk, step, node)

    def _tag(step: int):
        def _t(b: pa.Table) -> pa.Table:
            return pa.table({
                "walk": b.column("walk"),
                "step": pa.array(
                    np.full(b.num_rows, step, np.int64), pa.int64()),
                "node": b.column("cur"),
            })
        return _t

    seq_parts.append(frontier.map_batches(_tag(0), batch_format="pyarrow"))

    def _make_step(step: int):
        def _step(group: pa.Table) -> pa.Table:
            empty = pa.table({"bkt": pa.array([], pa.int64()),
                              "walk": pa.array([], pa.int64()),
                              "cur": pa.array([], pa.int64())})
            is_w = group.column("kind").to_numpy() == 1
            w_walk = group.column("walk").to_numpy().astype(np.int64)[is_w]
            w_cur = group.column("cur").to_numpy().astype(np.int64)[is_w]
            a_node = group.column("cur").to_numpy().astype(np.int64)[~is_w]
            a_nbr = group.column("walk").to_numpy().astype(np.int64)[~is_w]
            if w_walk.size == 0:
                return empty
            order = np.lexsort((a_nbr, a_node))
            a_node, a_nbr = a_node[order], a_nbr[order]
            lo = np.searchsorted(a_node, w_cur, side="left")
            hi = np.searchsorted(a_node, w_cur, side="right")
            deg = hi - lo
            if (deg == 0).any():
                raise ValueError("walk reached a node with no adjacency "
                                 "rows in its bucket")
            pick = (_walk_choice_hash(w_cur, step)
                    % deg.astype(np.uint64)).astype(np.int64)
            nxt = a_nbr[lo + pick]
            return pa.table({
                "bkt": pa.array(nxt % nbk, pa.int64()),
                "walk": pa.array(w_walk, pa.int64()),
                "cur": pa.array(nxt, pa.int64()),
            })
        return _step

    for step in range(steps):
        # union-tag: adjacency rows (kind 0: walk=nbr, cur=node) +
        # frontier rows (kind 1)
        def _adj_tag(b: pa.Table) -> pa.Table:
            return pa.table({
                "bkt": b.column("bkt"),
                "walk": b.column("nbr"),
                "cur": b.column("node"),
                "kind": pa.array(np.zeros(b.num_rows, np.int64),
                                 pa.int64()),
            })

        def _fr_tag(b: pa.Table) -> pa.Table:
            return pa.table({
                "bkt": b.column("bkt"),
                "walk": b.column("walk"),
                "cur": b.column("cur"),
                "kind": pa.array(np.ones(b.num_rows, np.int64),
                                 pa.int64()),
            })

        frontier = (adj.map_batches(_adj_tag, batch_format="pyarrow")
                    .union(frontier.map_batches(_fr_tag,
                                                batch_format="pyarrow"))
                    .groupby("bkt")
                    .map_groups(_make_step(step), batch_format="pyarrow")
                    .materialize())
        seq_parts.append(frontier.map_batches(_tag(step + 1),
                                              batch_format="pyarrow"))

    seq = seq_parts[0]
    for p in seq_parts[1:]:
        seq = seq.union(p)
    return _walk_pairs_topk(seq, window, k_out, nbk)


def _walk_pairs_topk(seq: "ray.data.Dataset", window: int, k_out: int,
                     nbk: int) -> pa.Table:
    """Skip-gram window pair counts + top-k over (walk, step, node)
    sequence rows — shared by the staged and fast walk paths."""
    from ray.data.aggregate import Sum

    def _walk_bucket(b: pa.Table) -> pa.Table:
        w = b.column("walk").to_numpy().astype(np.int64)
        return b.append_column("wbkt", pa.array(w % nbk, pa.int64()))

    def _pairs(group: pa.Table) -> pa.Table:
        w = group.column("walk").to_numpy().astype(np.int64)
        s = group.column("step").to_numpy().astype(np.int64)
        nd = group.column("node").to_numpy().astype(np.int64)
        order = np.lexsort((s, w))
        w, s, nd = w[order], s[order], nd[order]
        out_a, out_b = [], []
        for off in range(1, window + 1):
            m = (w[off:] == w[:-off]) if off < w.size else \
                np.empty(0, bool)
            a, b2 = nd[:-off][m], nd[off:][m]
            ne = a != b2
            out_a.append(np.minimum(a[ne], b2[ne]))
            out_b.append(np.maximum(a[ne], b2[ne]))
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b2 = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        key = (a << np.int64(32)) | b2
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "a": pa.array(uk >> np.int64(32), pa.int64()),
            "b": pa.array(uk & np.int64(0xFFFFFFFF), pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    top = (seq.map_batches(_walk_bucket, batch_format="pyarrow")
           .groupby("wbkt").map_groups(_pairs, batch_format="pyarrow")
           .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n"))
           .sort(key=["n", "a", "b"], descending=[True, False, False])
           .limit(k_out)
           .take_all())
    return pa.table({
        "a": pa.array([r["a"] for r in top], pa.int64()),
        "b": pa.array([r["b"] for r in top], pa.int64()),
        "n": pa.array([r["n"] for r in top], pa.int64()),
    })


# -------------------------------------------------- minimum spanning tree

MST_MAX_ROUNDS = 20


def _edge_node_ids(edges: "ray.data.Dataset") -> np.ndarray:
    """Sorted distinct node ids of an undirected edge set — one
    distinct groupby; only the O(nodes) summary reaches the driver."""
    from ray.data.aggregate import Count

    def _node_rows(batch: pa.Table) -> pa.Table:
        node = np.unique(np.concatenate((
            batch.column("u").to_numpy().astype(np.int64),
            batch.column("v").to_numpy().astype(np.int64))))
        return pa.table({"node": pa.array(node, pa.int64())})

    df = (edges.map_batches(_node_rows, batch_format="pyarrow")
          .groupby("node").aggregate(Count(alias_name="_c"))).to_pandas()
    return np.sort(df["node"].to_numpy(np.int64))


def q_mst_edges(sf_dir: str) -> pa.Table:
    """Minimum spanning forest of the weighted kNN graph by Borůvka's
    algorithm (1926; the distributed-MST classic) — single-linkage
    clustering's backbone: cutting the forest's heaviest edges yields
    the single-linkage dendrogram at any level. Edge weights are
    totally ordered by (d2, u, v), so the MSF is UNIQUE and the SQL
    oracle (the same Borůvka recurrence unrolled, component closure as
    a recursive CTE per round) must reproduce it edge for edge.

    Shape: per round, ONE distributed pass over the edge set computes
    each component's minimum outgoing edge (batch partials → a
    components-sized groupby argmin); the driver folds only the
    O(components) chosen edges (halving each round) with a union-find
    and re-broadcasts the node-count label array — the same
    O(nodes)-driver-state class as the degree broadcast the wedge
    operators use, never O(edges). ≤ log2(n) rounds by Borůvka's
    halving argument; raises past MST_MAX_ROUNDS."""
    ew = _knn_weighted_edges(sf_dir).materialize()
    node_arr = _edge_node_ids(ew)   # O(nodes) via a distinct groupby
    labels = node_arr.copy()
    chosen: dict[tuple[int, int], int] = {}

    def _argmin_rows(batch: pa.Table, lbl_ref) -> pa.Table:
        nodes, lbl = ray.get(lbl_ref)
        u = batch.column("u").to_numpy().astype(np.int64)
        v = batch.column("v").to_numpy().astype(np.int64)
        w = batch.column("w").to_numpy().astype(np.int64)
        lu = lbl[np.searchsorted(nodes, u)]
        lv = lbl[np.searchsorted(nodes, v)]
        x = lu != lv
        if not x.any():
            return pa.table({"comp": pa.array([], pa.int64()),
                             "u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64()),
                             "lu": pa.array([], pa.int64()),
                             "lv": pa.array([], pa.int64())})
        u, v, w, lu, lv = u[x], v[x], w[x], lu[x], lv[x]
        comp = np.concatenate((lu, lv))
        uu = np.concatenate((u, u))
        vv = np.concatenate((v, v))
        ww = np.concatenate((w, w))
        llu = np.concatenate((lu, lu))
        llv = np.concatenate((lv, lv))
        order = np.lexsort((vv, uu, ww, comp))
        comp, uu, vv, ww = comp[order], uu[order], vv[order], ww[order]
        llu, llv = llu[order], llv[order]
        first = np.concatenate(([True], comp[1:] != comp[:-1]))
        return pa.table({
            "comp": pa.array(comp[first], pa.int64()),
            "u": pa.array(uu[first], pa.int64()),
            "v": pa.array(vv[first], pa.int64()),
            "w": pa.array(ww[first], pa.int64()),
            "lu": pa.array(llu[first], pa.int64()),
            "lv": pa.array(llv[first], pa.int64()),
        })

    def _argmin_merge(group: pa.Table) -> pa.Table:
        w = group.column("w").to_numpy().astype(np.int64)
        u = group.column("u").to_numpy().astype(np.int64)
        v = group.column("v").to_numpy().astype(np.int64)
        i = int(np.lexsort((v, u, w))[0])
        return group.take([i])

    for _ in range(MST_MAX_ROUNDS):
        lbl_ref = ray.put((node_arr, labels))
        rows = (ew.map_batches(
                    lambda b, r=lbl_ref: _argmin_rows(b, r),
                    batch_format="pyarrow")
                .groupby("comp")
                .map_groups(_argmin_merge, batch_format="pyarrow")
                .take_all())  # O(components), halves every round
        if not rows:
            break
        # driver union-find over the components-sized chosen set
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for r in rows:
            chosen[(int(r["u"]), int(r["v"]))] = int(r["w"])
            ra, rb = find(int(r["lu"])), find(int(r["lv"]))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # relabel: component -> root, nodes inherit
        comp_ids = np.unique(labels)
        root = np.asarray([find(int(c)) for c in comp_ids], np.int64)
        labels = root[np.searchsorted(comp_ids, labels)]
    else:
        raise RuntimeError("Borůvka exceeded MST_MAX_ROUNDS without "
                           "exhausting cross edges")

    items = sorted(chosen.items(), key=lambda t: (t[1], t[0]))
    return pa.table({
        "u": pa.array([a for (a, _), _ in items], pa.int64()),
        "v": pa.array([b for (_, b), _ in items], pa.int64()),
        "w": pa.array([w for _, w in items], pa.int64()),
    })


def q_single_linkage_clusters(sf_dir: str,
                              small_graph_max_edges: int = 2_500_000
                              ) -> ray.data.Dataset:
    """Single-linkage flat clustering at the MEDIAN edge weight — the
    dendrogram consumer of q_mst_edges: clusters at threshold t are the
    connected components of the edges with w <= t, which by the
    single-linkage property equals cutting the Borůvka forest's
    heavier edges at t. Threshold = the exact lower median of the kNN
    edge weights under the (w, u, v) total order, so the whole entry
    is deterministic and SQL-replayable. Output (vec_id, cluster) for
    every vector, cluster = min member id (singletons label
    themselves).

    Shape: ONE distributed sort + the range-blocked rank pattern finds
    the median edge (driver holds O(blocks)); the light-edge filter is
    a pure map; components reuse the shared CC machinery (bounded
    single-task fast path, groupby label-propagation rounds past the
    cap); the final union-min groupby restores singleton vectors."""
    from ray.data.aggregate import Min

    from candidategeneration_ray.pipelines.extras import (
        _doc_buckets, _propagation_rounds, _small_graph_cc)
    from candidategeneration_ray.stages.docids import blocked_prefix_apply

    ew = _knn_weighted_edges(sf_dir).materialize()
    n_edges = ew.count()
    target = (n_edges + 1) // 2

    def _emit(t: pa.Table, base: int) -> pa.Table:
        if t.num_rows == 0 or "w" not in t.column_names:
            return pa.table({"w": pa.array([], pa.int64()),
                             "rn": pa.array([], pa.int64())})
        return pa.table({
            "w": t.column("w").cast(pa.int64()),
            "rn": pa.array(base + 1 + np.arange(t.num_rows,
                                                dtype=np.int64),
                           pa.int64()),
        })

    ranked = blocked_prefix_apply(ew.sort(key=["w", "u", "v"]), 16,
                                  lambda t: t.num_rows, _emit)
    med_rows = ranked.filter(expr=f"rn == {target}").take_all()
    t_med = int(med_rows[0]["w"])

    def _sym(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy().astype(np.int64)
        keep = w <= t_med
        u = batch.column("u").to_numpy().astype(np.int64)[keep]
        v = batch.column("v").to_numpy().astype(np.int64)[keep]
        return pa.table({
            "src": pa.array(np.concatenate((u, v)), pa.int64()),
            "dst": pa.array(np.concatenate((v, u)), pa.int64()),
            # edge-row marker _propagation_rounds' unioned schema needs
            "lbl": pa.array(np.full(2 * u.size,
                                    np.iinfo(np.int64).max, np.int64),
                            pa.int64()),
        })

    sym = ew.map_batches(_sym, batch_format="pyarrow").materialize()
    if sym.count() <= 2 * small_graph_max_edges:
        labels = ray.data.from_arrow_refs(
            [_small_graph_cc.remote(*sym.to_arrow_refs())])
    else:
        labels = _propagation_rounds(
            sym, 20, num_buckets=_doc_buckets(sf_dir, "embeddings"))

    def _lbl_rows(b: pa.Table) -> pa.Table:
        return pa.table({"vec_id": b.column("node").cast(pa.int64()),
                         "cluster": b.column("lbl").cast(pa.int64())})

    ident = _embeddings_ds(sf_dir).select_columns(["vec_id"]).map_batches(
        lambda b: pa.table({
            "vec_id": b.column("vec_id").cast(pa.int64()),
            "cluster": b.column("vec_id").cast(pa.int64()),
        }), batch_format="pyarrow")
    return (labels.map_batches(_lbl_rows, batch_format="pyarrow")
            .union(ident)
            .groupby("vec_id")
            .aggregate(Min("cluster", alias_name="cluster")))


# ------------------------------------------ maximal independent set (MIS)

MIS_MAX_ROUNDS = 12   # shared with the SQL unroll — widen BOTH together


def _luby_local_minima(ew: "ray.data.Dataset", nodes: np.ndarray,
                       prio: np.ndarray, und: np.ndarray) -> np.ndarray:
    """One Luby symmetry-breaking round, factored for MIS and graph
    coloring: among the undecided nodes, return the bool mask of those
    whose (h64, node) is strictly smaller than every undecided
    neighbor's. ONE distributed pass over the edge set (batch partials
    → a nodes-sized groupby argmin); the driver folds the O(und)
    summary against the node-count state arrays."""

    def _nbr_min(batch: pa.Table, state_ref) -> pa.Table:
        nds, pr, u_mask = ray.get(state_ref)
        a = batch.column("u").to_numpy().astype(np.int64)
        b = batch.column("v").to_numpy().astype(np.int64)
        src = np.concatenate((a, b))
        dst = np.concatenate((b, a))
        si = np.searchsorted(nds, src)
        di = np.searchsorted(nds, dst)
        live = u_mask[si] & u_mask[di]
        if not live.any():
            return pa.table({"node": pa.array([], pa.int64()),
                             "nh": pa.array([], pa.uint64()),
                             "nv": pa.array([], pa.int64())})
        di, si = di[live], si[live]
        # per-dst min (h, v) within the batch
        order = np.lexsort((nds[si], pr[si], di))
        di, si = di[order], si[order]
        first = np.concatenate(([True], di[1:] != di[:-1]))
        return pa.table({
            "node": pa.array(nds[di[first]], pa.int64()),
            "nh": pa.array(pr[si[first]], pa.uint64()),
            "nv": pa.array(nds[si[first]], pa.int64()),
        })

    def _merge_min(group: pa.Table) -> pa.Table:
        nh = group.column("nh").to_numpy().astype(np.uint64)
        nv = group.column("nv").to_numpy().astype(np.int64)
        i = int(np.lexsort((nv, nh))[0])
        return group.take([i])

    state_ref = ray.put((nodes, prio, und))
    rows = (ew.map_batches(
                lambda b, r=state_ref: _nbr_min(b, r),
                batch_format="pyarrow")
            .groupby("node")
            .map_groups(_merge_min, batch_format="pyarrow")
            .take_all())  # O(undecided)
    # nodes with an undecided neighbor: min (h, v) over them —
    # one vectorized scatter over the O(und) summary
    nbr_h = np.zeros(nodes.size, np.uint64)
    nbr_v = np.zeros(nodes.size, np.int64)
    has_nbr = np.zeros(nodes.size, bool)
    rn = np.fromiter((r["node"] for r in rows), np.int64, len(rows))
    rh = np.fromiter((r["nh"] for r in rows), np.uint64, len(rows))
    rv = np.fromiter((r["nv"] for r in rows), np.int64, len(rows))
    ri = np.searchsorted(nodes, rn)
    has_nbr[ri] = True
    nbr_h[ri] = rh
    nbr_v[ri] = rv
    return und & (~has_nbr
                  | (prio < nbr_h)
                  | ((prio == nbr_h) & (nodes < nbr_v)))


def q_mis_nodes(sf_dir: str) -> pa.Table:
    """Maximal independent set over the undirected kNN graph by Luby's
    algorithm (Luby SICOMP'86 — THE parallel symmetry-breaking
    classic) with deterministic md5 priorities: each round every
    undecided node whose (h64(node), node) is smaller than all its
    undecided neighbors' joins the set; the node and its neighbors
    leave the pool. O(log n) rounds w.h.p.; raises past
    MIS_MAX_ROUNDS (the SQL oracle unrolls exactly that many — widen
    both together). MIS is the scheduling/conflict-free-selection
    primitive (pick a maximal set of pairwise-non-similar docs).

    Shape: per round ONE distributed pass over the edge set computes
    each undecided node's minimum undecided-neighbor priority (batch
    partials → a nodes-sized groupby argmin); the driver holds only
    the node-count priority/state arrays (the accepted
    degree-broadcast class) and folds the O(und) summary. Output
    (vec_id, mis_round) for the selected nodes."""
    from candidategeneration_ray.functions import hashing as H

    ew = _knn_weighted_edges(sf_dir).materialize()
    nodes = _edge_node_ids(ew)
    prio = H.h64_many([str(int(v)) for v in nodes])
    und = np.ones(nodes.size, bool)
    picked = np.full(nodes.size, -1, np.int64)   # round joined, -1 = no

    for rnd in range(MIS_MAX_ROUNDS):
        if not und.any():
            break
        cand = _luby_local_minima(ew, nodes, prio, und)
        picked[cand] = rnd
        # remove candidates and their neighbors (locally: neighbors of
        # cand are exactly the dst's whose min undecided nbr could be a
        # cand — recompute from edge rows next round; here mark via the
        # rows we already have plus cand itself)
        und = und & ~cand
        # neighbors of cand: one more distributed pass is avoided by
        # folding removal into the next round's live mask — but Luby
        # requires removing N(cand) NOW; do it with a driver-free pass
        cand_ids = nodes[cand]
        if cand_ids.size:
            cref = ray.put(cand_ids)

            def _touched(batch: pa.Table, cref=cref) -> pa.Table:
                cs = ray.get(cref)
                a = batch.column("u").to_numpy().astype(np.int64)
                b = batch.column("v").to_numpy().astype(np.int64)
                am = np.isin(a, cs)
                bm = np.isin(b, cs)
                out = np.unique(np.concatenate((b[am], a[bm])))
                return pa.table({"node": pa.array(out, pa.int64())})

            from ray.data.aggregate import Count

            tdf = (ew.map_batches(_touched, batch_format="pyarrow")
                   .groupby("node").aggregate(Count(alias_name="_c"))
                   ).to_pandas()
            tid = tdf["node"].to_numpy(np.int64)
            und[np.searchsorted(nodes, tid)] = False
    else:
        if und.any():
            raise RuntimeError("Luby MIS exceeded MIS_MAX_ROUNDS")

    sel = picked >= 0
    return pa.table({
        "vec_id": pa.array(nodes[sel], pa.int64()),
        "mis_round": pa.array(picked[sel], pa.int64()),
    })


# ------------------------------------------------ greedy maximal matching

MATCHING_MAX_ROUNDS = 12   # shared with the SQL unroll


def q_matching_edges(sf_dir: str) -> pa.Table:
    """Maximal matching over the undirected kNN graph by parallel
    greedy locally-minimal selection (the Luby-style symmetry-breaking
    twin of q_mis_nodes, and the classic 2-approx vertex-cover /
    pair-up primitive — e.g. pairing near-duplicate docs for A/B
    dedup review): edge priorities are h64("u:v"); each round every
    undecided edge whose priority is the strict minimum among ALL
    edges sharing an endpoint joins the matching, and its endpoints'
    edges leave the pool. Deterministic; raises past
    MATCHING_MAX_ROUNDS (the SQL unrolls the same count).

    Shape: per round ONE distributed pass computes each node's
    min-incident-undecided priority (batch partials → nodes-sized
    groupby min); an edge is selected iff its priority equals BOTH
    endpoints' minima (strict minimality under distinct md5
    priorities). Driver holds the node-count state arrays. Output
    (u, v, match_round)."""
    from candidategeneration_ray.functions import hashing as H
    from ray.data.aggregate import Min

    def _with_prio(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy().astype(np.int64)
        v = batch.column("v").to_numpy().astype(np.int64)
        p = H.h64_many([f"{int(a)}:{int(b)}" for a, b in zip(u, v)])
        # order-preserving signed shift (x - 2^63): keeps int64-native
        # Arrow columns through the Min aggregate (uint64 > 2^63 would
        # fall back to pickled Python objects); the SQL side compares
        # raw UBIGINT — the shift preserves the order on both sides
        ps = (p - np.uint64(1 << 63)).astype(np.int64)
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "p": pa.array(ps, pa.int64())})

    # edge priorities hash ONCE (the oracle's epr CTE), not per round
    ew = (_knn_weighted_edges(sf_dir)
          .map_batches(_with_prio, batch_format="pyarrow").materialize())
    nodes = _edge_node_ids(ew)
    alive = np.ones(nodes.size, bool)   # node still unmatched
    out_u, out_v, out_r = [], [], []

    def _node_min(batch: pa.Table, state_ref) -> pa.Table:
        nds, al = ray.get(state_ref)
        u = batch.column("u").to_numpy().astype(np.int64)
        v = batch.column("v").to_numpy().astype(np.int64)
        pe = batch.column("p").to_numpy().astype(np.int64)
        live = al[np.searchsorted(nds, u)] & al[np.searchsorted(nds, v)]
        u, v, p = u[live], v[live], pe[live]
        if u.size == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "mp": pa.array([], pa.int64())})
        node = np.concatenate((u, v))
        pp = np.concatenate((p, p))
        order = np.lexsort((pp, node))
        node, pp = node[order], pp[order]
        first = np.concatenate(([True], node[1:] != node[:-1]))
        return pa.table({"node": pa.array(node[first], pa.int64()),
                         "mp": pa.array(pp[first], pa.int64())})

    for rnd in range(MATCHING_MAX_ROUNDS):
        state_ref = ray.put((nodes, alive))
        mins = (ew.map_batches(
                    lambda b, r=state_ref: _node_min(b, r),
                    batch_format="pyarrow")
                .groupby("node").aggregate(Min("mp", alias_name="mp"))
                ).to_pandas()  # O(alive nodes)
        if len(mins) == 0:
            break
        mn = mins["node"].to_numpy(np.int64)
        mv = mins["mp"].to_numpy(np.int64)
        o = np.argsort(mn)
        mn, mv = mn[o], mv[o]
        min_ref = ray.put((nodes, alive, mn, mv))

        def _cand(batch: pa.Table, r=min_ref) -> pa.Table:
            nds, al, mn_, mv_ = ray.get(r)
            u = batch.column("u").to_numpy().astype(np.int64)
            v = batch.column("v").to_numpy().astype(np.int64)
            pe = batch.column("p").to_numpy().astype(np.int64)
            live = (al[np.searchsorted(nds, u)]
                    & al[np.searchsorted(nds, v)])
            u, v, p = u[live], v[live], pe[live]
            if u.size == 0:
                return pa.table({"u": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())})
            iu = np.searchsorted(mn_, u)
            iv = np.searchsorted(mn_, v)
            keep = (mv_[iu] == p) & (mv_[iv] == p)
            return pa.table({"u": pa.array(u[keep], pa.int64()),
                             "v": pa.array(v[keep], pa.int64())})

        from candidategeneration_ray.functions.tableutil import (
            concat_blocks)

        cand = concat_blocks(ray.get(
            ew.map_batches(_cand, batch_format="pyarrow")
            .to_arrow_refs()),   # O(matched this round)
            pa.schema([("u", pa.int64()), ("v", pa.int64())]))
        if cand.num_rows == 0:
            break
        cu = cand.column("u").to_numpy().astype(np.int64)
        cv = cand.column("v").to_numpy().astype(np.int64)
        out_u.extend(cu.tolist())
        out_v.extend(cv.tolist())
        out_r.extend([rnd] * cu.size)
        alive[np.searchsorted(nodes, cu)] = False
        alive[np.searchsorted(nodes, cv)] = False
    else:
        # pool may legitimately be empty exactly at the last round
        state_ref = ray.put((nodes, alive))
        leftover = (ew.map_batches(
            lambda b, r=state_ref: _node_min(b, r),
            batch_format="pyarrow").take_all())
        if leftover:
            raise RuntimeError("matching exceeded MATCHING_MAX_ROUNDS")

    order = np.lexsort((np.asarray(out_v, np.int64),
                        np.asarray(out_u, np.int64)))
    return pa.table({
        "u": pa.array(np.asarray(out_u, np.int64)[order], pa.int64()),
        "v": pa.array(np.asarray(out_v, np.int64)[order], pa.int64()),
        "match_round": pa.array(np.asarray(out_r, np.int64)[order],
                                pa.int64()),
    })


# ------------------------------------------------------- graph coloring

COLOR_MAX_ROUNDS = 16   # shared with the SQL unroll — widen BOTH together
COLOR_MAX_COLORS = 64   # mex never exceeds max degree; hard guard


@ray.remote
def _small_graph_coloring(max_rounds: int, *edge_tabs: pa.Table) -> pa.Table:
    """Bounded fast path: the EXACT Jones-Plassmann rounds in one
    numpy task over the object-store edge blocks — same priorities,
    same local-minima rule, same mex (lowest zero bit of the
    colored-neighbor bitmask == lowest absent color)."""
    from candidategeneration_ray.functions import hashing as H

    tabs = [t for t in edge_tabs if t.num_rows > 0]
    if not tabs:      # empty edge set: empty coloring (staged parity)
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "color": pa.array([], pa.int64()),
                         "color_round": pa.array([], pa.int64())})
    u = np.concatenate([t.column("u").to_numpy().astype(np.int64)
                        for t in tabs])
    v = np.concatenate([t.column("v").to_numpy().astype(np.int64)
                        for t in tabs])
    nodes = np.unique(np.concatenate((u, v)))
    prio = H.h64_many([str(int(x)) for x in nodes])
    src = np.searchsorted(nodes, np.concatenate((u, v)))
    dst = np.searchsorted(nodes, np.concatenate((v, u)))
    und = np.ones(nodes.size, bool)
    color = np.full(nodes.size, -1, np.int64)
    rnd_of = np.full(nodes.size, -1, np.int64)
    for rnd in range(max_rounds):
        if not und.any():
            break
        live = und[src] & und[dst]
        # per-node min undecided-neighbor (h, v): lexsort once
        nbr_h = np.full(nodes.size, np.iinfo(np.uint64).max, np.uint64)
        nbr_v = np.full(nodes.size, np.int64(1) << np.int64(62), np.int64)
        if live.any():
            ls, ld = src[live], dst[live]
            order = np.lexsort((nodes[ls], prio[ls], ld))
            ld_o, ls_o = ld[order], ls[order]
            first = np.concatenate(([True], ld_o[1:] != ld_o[:-1]))
            nbr_h[ld_o[first]] = prio[ls_o[first]]
            nbr_v[ld_o[first]] = nodes[ls_o[first]]
        has_nbr = nbr_h != np.iinfo(np.uint64).max
        cand = und & (~has_nbr
                      | (prio < nbr_h)
                      | ((prio == nbr_h) & (nodes < nbr_v)))
        # used colors of already-colored neighbors, folded as a bitmask
        mask = np.zeros(nodes.size, np.uint64)
        cm = cand[src] & (color[dst] >= 0)
        if cm.any():
            np.bitwise_or.at(
                mask, src[cm],
                (np.uint64(1) << color[dst][cm].astype(np.uint64)))
        lowest_zero = (~mask[cand]) & (mask[cand] + np.uint64(1))
        if (lowest_zero == 0).any():     # all 64 bits used: mex >= 64
            raise RuntimeError("coloring exceeded COLOR_MAX_COLORS")
        mex = np.round(np.log2(lowest_zero.astype(np.float64))
                       ).astype(np.int64)
        if mex.size and int(mex.max()) >= COLOR_MAX_COLORS:
            raise RuntimeError("coloring exceeded COLOR_MAX_COLORS")
        color[cand] = mex
        rnd_of[cand] = rnd
        und = und & ~cand
    else:
        if und.any():
            raise RuntimeError("coloring exceeded COLOR_MAX_ROUNDS")
    return pa.table({
        "vec_id": pa.array(nodes, pa.int64()),
        "color": pa.array(color, pa.int64()),
        "color_round": pa.array(rnd_of, pa.int64()),
    })


def q_graph_coloring(sf_dir: str,
                     small_graph_max_edges: int = 2_500_000) -> pa.Table:
    """Greedy distance-1 graph coloring over the undirected kNN graph
    by the Jones–Plassmann schedule (Jones & Plassmann SIAM JSC'93 —
    the third classic of the symmetry-breaking family beside Luby MIS
    and greedy matching; the conflict-free SCHEDULING primitive:
    same-color docs can be processed/updated concurrently because no
    two are neighbors). Each round the uncolored nodes whose
    deterministic (h64, node) priority is a local minimum among
    UNCOLORED neighbors take the smallest color (mex) absent from
    their already-colored neighborhood — adjacent nodes can never
    color in the same round, so the coloring is proper by
    construction; colors used ≤ max degree + 1. Deterministic; raises
    past COLOR_MAX_ROUNDS (the SQL oracle unrolls the same count —
    converged rounds are no-ops).

    Shape: per round the shared Luby pass (_luby_local_minima — one
    distributed edge sweep, nodes-sized groupby argmin) picks the
    frontier, then a second edge sweep emits (frontier node,
    colored-neighbor color) pairs whose O(frontier × degree) distinct
    summary feeds one vectorized driver mex (sort + reduceat — no
    per-node loop). Driver state stays O(nodes). Output
    (vec_id, color, color_round)."""
    from ray.data.aggregate import Count

    from candidategeneration_ray.functions import hashing as H

    ew = _knn_weighted_edges(sf_dir).materialize()
    if ew.count() <= small_graph_max_edges:
        # bounded fast path (the sssp/harmonic pattern): one task over
        # the edge blocks, identical per-round semantics — the staged
        # path below stays the >cap route (equality pytest)
        edge_refs = ew.to_arrow_refs()
        return ray.get(_small_graph_coloring.remote(
            COLOR_MAX_ROUNDS, *edge_refs))

    nodes = _edge_node_ids(ew)
    prio = H.h64_many([str(int(v)) for v in nodes])
    und = np.ones(nodes.size, bool)
    color = np.full(nodes.size, -1, np.int64)
    rnd_of = np.full(nodes.size, -1, np.int64)

    def _used_colors(batch: pa.Table, sref) -> pa.Table:
        nds, col, cand_sorted = ray.get(sref)
        a = batch.column("u").to_numpy().astype(np.int64)
        b = batch.column("v").to_numpy().astype(np.int64)
        src = np.concatenate((a, b))
        dst = np.concatenate((b, a))
        cb = col[np.searchsorted(nds, dst)]
        pos = np.searchsorted(cand_sorted, src)
        pos[pos == cand_sorted.size] = 0
        keep = (cand_sorted[pos] == src) & (cb >= 0)
        if not keep.any():
            return pa.table({"node": pa.array([], pa.int64()),
                             "uc": pa.array([], pa.int64())})
        packed = np.unique(src[keep] * COLOR_MAX_COLORS + cb[keep])
        return pa.table({
            "node": pa.array(packed // COLOR_MAX_COLORS, pa.int64()),
            "uc": pa.array(packed % COLOR_MAX_COLORS, pa.int64()),
        })

    for rnd in range(COLOR_MAX_ROUNDS):
        if not und.any():
            break
        cand = _luby_local_minima(ew, nodes, prio, und)
        cand_ids = nodes[cand]           # already sorted (nodes sorted)
        mex = np.zeros(cand_ids.size, np.int64)
        if cand_ids.size:
            sref = ray.put((nodes, color, cand_ids))
            used = (ew.map_batches(
                        lambda b, r=sref: _used_colors(b, r),
                        batch_format="pyarrow")
                    .groupby(["node", "uc"])
                    .aggregate(Count(alias_name="_c"))
                    ).to_pandas()        # O(frontier × degree) distinct
            if len(used):
                un = used["node"].to_numpy(np.int64)
                uc = used["uc"].to_numpy(np.int64)
                gi = np.searchsorted(cand_ids, un)
                order = np.lexsort((uc, gi))
                gi, uc = gi[order], uc[order]
                first = np.concatenate(([True], gi[1:] != gi[:-1]))
                starts = np.nonzero(first)[0]
                counts = np.diff(np.append(starts, gi.size))
                # mex: within each group uc is sorted distinct; the
                # smallest absent color is the first position where
                # uc != its rank, else the group size
                pos = np.arange(gi.size) - np.repeat(starts, counts)
                miss = np.where(uc != pos, pos, np.int64(1 << 62))
                first_miss = np.minimum.reduceat(miss, starts)
                mex[gi[starts]] = np.minimum(
                    first_miss, counts.astype(np.int64))
        if cand_ids.size and int(mex.max(initial=0)) >= COLOR_MAX_COLORS:
            raise RuntimeError("coloring exceeded COLOR_MAX_COLORS")
        ci = np.searchsorted(nodes, cand_ids)
        color[ci] = mex
        rnd_of[ci] = rnd
        und = und & ~cand
    else:
        if und.any():
            raise RuntimeError("coloring exceeded COLOR_MAX_ROUNDS")

    return pa.table({
        "vec_id": pa.array(nodes, pa.int64()),
        "color": pa.array(color, pa.int64()),
        "color_round": pa.array(rnd_of, pa.int64()),
    })


# --------------------------------------------- spectral (power iteration)

POWER_ITERS = 4
POWER_SCALE = 10 ** 6


def q_gram_power_iteration(sf_dir: str,
                           iters: int = POWER_ITERS) -> pa.Table:
    """Leading-eigenvector estimate of the Gram matrix XᵀX by
    fixed-point power iteration — the spectral step PCA/whitening
    pipelines run on the verified distributed Gram sufficient
    statistic (q_embedding_gram): v ← trunc(G·v · S / max|G·v|), all
    integer (Python big-int on the driver over the d×d summary,
    HUGEINT in the oracle; division truncates toward zero on BOTH
    sides — DuckDB's `//`). The distributed work is the Gram build;
    the iteration is the documented O(d²) driver finalizer. Output
    (dim, v) after `iters` rounds, scaled to max |v| = 10^6.

    Convergence RATE is (λ2/λ1)^iters — spectrum-dependent; the
    near-isotropic synthetic embeddings need many steps for full
    alignment, so the entry verifies the exact iteration (each step a
    Krylov step that provably improves the Rayleigh quotient —
    pytest), and `iters` is the caller's accuracy knob."""
    rows = q_embedding_gram(sf_dir).take_all()   # d(d+1)/2 + 1 rows
    dims = max(int(r["dim_a"]) for r in rows) + 1
    g = [[0] * dims for _ in range(dims)]
    for r in rows:
        i, j = int(r["dim_a"]), int(r["dim_b"])
        if i < 0:
            continue
        g[i][j] = int(r["sum_xy"])
        g[j][i] = int(r["sum_xy"])
    s = POWER_SCALE
    v = [s] * dims
    for _ in range(iters):
        w = [sum(g[i][j] * v[j] for j in range(dims))
             for i in range(dims)]
        mx = max(abs(x) for x in w)
        if mx == 0:
            break
        v = [(abs(x) * s) // mx * (1 if x >= 0 else -1) for x in w]
    return pa.table({
        "dim": pa.array(np.arange(dims, dtype=np.int64), pa.int64()),
        "v": pa.array(np.asarray(v, dtype=np.int64), pa.int64()),
    })


# ------------------------------------------------- densest subgraph (2+ε)

DENSEST_MAX_ROUNDS = 32


def q_densest_subgraph(sf_dir: str) -> pa.Table:
    """Greedy densest-subgraph 2-approximation by parallel peeling
    (Charikar APPROX'00; the distributed variant of Bahmani, Kumar &
    Vassilvitskii VLDB'12 with ε = 0) over the CO-PURCHASE graph (the
    same skewed association graph as q_kcore_nodes — a quasi-regular
    kNN graph would make round 0 trivially densest): each round
    removes EVERY node whose degree is at most the current average
    (n·deg ≤ 2·|E| — integer cross-multiplication, no division), and
    the answer is the densest iterate — community-core / bundle
    extraction. Deterministic; raises past DENSEST_MAX_ROUNDS (the
    SQL unrolls the same count; post-fixed-point rounds are no-ops).
    NOTE the round bound: with ε = 0 the constant-fraction-per-round
    argument needs ε > 0 — sparse chain-shaped graphs can peel one
    layer per round, so the cap is a graph-diameter-class guard, not
    O(log n); widen BOTH sides together if a corpus trips it.

    Density compares exactly by cross-multiplication; ties between
    iterates break toward the EARLIEST round — the SQL replays the
    same rule. Output one row per member of the winning iterate
    (part, best_round, e2 = 2·|E|, n = |V|), density = e2 / (2·n).

    Shape: per round ONE edge-set pass computes surviving degrees
    (batch partials → nodes-sized groupby); the driver holds the
    node-count alive/degree arrays (the accepted broadcast class).
    The per-round edge count is Σdeg/2 — no second pass."""
    from ray.data.aggregate import Sum

    from candidategeneration_ray.pipelines.relational import (
        copurchase_edges)

    ew = copurchase_edges(sf_dir, KCORE_SUPPORT).materialize()
    nodes = _edge_node_ids(ew)
    alive = np.ones(nodes.size, bool)
    iterates = []   # (round, e2, n, alive snapshot)

    def _deg_rows(batch: pa.Table, state_ref) -> pa.Table:
        nds, al = ray.get(state_ref)
        u = batch.column("u").to_numpy().astype(np.int64)
        v = batch.column("v").to_numpy().astype(np.int64)
        live = al[np.searchsorted(nds, u)] & al[np.searchsorted(nds, v)]
        u, v = u[live], v[live]
        node = np.concatenate((u, v))
        uk, cnt = np.unique(node, return_counts=True)
        return pa.table({"node": pa.array(uk, pa.int64()),
                         "deg": pa.array(cnt.astype(np.int64),
                                         pa.int64())})

    for rnd in range(DENSEST_MAX_ROUNDS):
        state_ref = ray.put((nodes, alive))
        degs = (ew.map_batches(
                    lambda b, r=state_ref: _deg_rows(b, r),
                    batch_format="pyarrow")
                .groupby("node").aggregate(Sum("deg", alias_name="deg"))
                ).to_pandas()   # O(alive nodes)
        deg = np.zeros(nodes.size, np.int64)
        if len(degs):
            dn = degs["node"].to_numpy(np.int64)
            deg[np.searchsorted(nodes, dn)] = \
                degs["deg"].to_numpy(np.int64)
        n_alive = int(np.count_nonzero(alive))
        e2 = int(deg[alive].sum())          # = 2|E| of the iterate
        if n_alive == 0:
            break
        iterates.append((rnd, e2, n_alive, alive.copy()))
        # peel: deg <= avg  <=>  n * deg <= e2  (isolated nodes too)
        peel = alive & (n_alive * deg <= e2)
        if not peel.any():                  # stable core: done
            break
        alive = alive & ~peel
    else:
        if alive.any():
            raise RuntimeError("densest-subgraph peeling exceeded "
                               "DENSEST_MAX_ROUNDS")

    if not iterates:   # empty edge set: 0 rows, like the oracle
        return pa.table({"part": pa.array([], pa.int64()),
                         "best_round": pa.array([], pa.int64()),
                         "e2": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    # densest iterate: max e2/(2n) -> cross-multiplied, earliest wins
    best = iterates[0]
    for it in iterates[1:]:
        # it denser than best  <=>  it.e2 * best.n > best.e2 * it.n
        if it[1] * best[2] > best[1] * it[2]:
            best = it
    rnd, e2, n_alive, snap = best
    sel = nodes[snap]
    return pa.table({
        "part": pa.array(sel, pa.int64()),
        "best_round": pa.array(np.full(sel.size, rnd, np.int64),
                               pa.int64()),
        "e2": pa.array(np.full(sel.size, e2, np.int64), pa.int64()),
        "n": pa.array(np.full(sel.size, n_alive, np.int64), pa.int64()),
    })


# --------------------------------------------------------------- k-truss

TRUSS_K = 3            # edges must sit in >= K-2 triangles among survivors
                       # (3-truss: every edge in a triangle — the synthetic
                       # co-purchase graph thins out at sf0.01, so K=4 is empty)
TRUSS_MAX_ROUNDS = 16  # shared with the SQL unroll — widen BOTH together


def _edge_support(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(u, v, s) triangle support per edge of an undirected edge set —
    the wedge plan with the closure polarity of triangle_counts but
    aggregated per EDGE: in each pair-hash bucket, s(pkey) = wedge
    rows whose pair IS an edge (zero-support edges still emit)."""

    def _support(group: pa.Table) -> pa.Table:
        pkey = group.column("pkey").to_numpy().astype(np.int64)
        apex = group.column("apex").to_numpy().astype(np.int64)
        is_edge = apex < 0
        ek = np.unique(pkey[is_edge])
        if ek.size == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        wk = pkey[~is_edge]
        s = np.zeros(ek.size, np.int64)
        if wk.size:
            idx = np.searchsorted(ek, wk)
            idx_ok = np.minimum(idx, ek.size - 1)
            hit = ek[idx_ok] == wk
            np.add.at(s, idx_ok[hit], 1)
        return pa.table({
            "u": pa.array(ek >> np.int64(32), pa.int64()),
            "v": pa.array(ek & np.int64(0xFFFFFFFF), pa.int64()),
            "s": pa.array(s, pa.int64()),
        })

    return (_wedge_edge_union(edges)
            .groupby("pbucket").map_groups(_support,
                                           batch_format="pyarrow"))


def q_ktruss_edges(sf_dir: str, k: int = TRUSS_K) -> ray.data.Dataset:
    """The k-truss of the co-purchase graph (Cohen 2008) — the EDGE
    analog of q_kcore_nodes and the third member of the
    triangle/k-core/truss cohesion family: iteratively delete every
    edge in fewer than k−2 triangles among the SURVIVING edges, to a
    fixed point. Trusses are the tight community scaffold (every
    surviving edge has k−2 common-neighbor witnesses). Deterministic;
    raises past TRUSS_MAX_ROUNDS (the SQL unrolls the same count;
    post-fixed-point rounds are no-ops; peeling cascades can be
    diameter-long on pathological graphs — same honesty note as
    densest_subgraph).

    Shape: each round ONE wedge-plan pass computes per-edge triangle
    support (O(Σ deg²) wedge rows, degree-bounded) and a pure filter
    peels; the driver sees only the per-round edge count. Output the
    surviving edges with their fixed-point support (u, v, support)."""
    from candidategeneration_ray.pipelines.relational import (
        copurchase_edges)

    if k < 3:
        raise ValueError("k-truss needs k >= 3")
    edges = (copurchase_edges(sf_dir, KCORE_SUPPORT)
             .materialize())
    n_edges = edges.count()
    supp = None
    for _ in range(TRUSS_MAX_ROUNDS):
        supp = _edge_support(edges).materialize()
        kept = supp.filter(expr=f"s >= {k - 2}")   # vectorized Arrow
        n_kept = kept.count()
        if n_kept == n_edges:
            break
        edges = kept.select_columns(["u", "v"]).materialize()
        n_edges = n_kept
    else:
        # converged exactly at the cap only if the last pass was clean
        supp = _edge_support(edges).materialize()
        if supp.filter(expr=f"s < {k - 2}").count() > 0:
            raise RuntimeError("k-truss peeling exceeded "
                               "TRUSS_MAX_ROUNDS")
    return (supp.filter(expr=f"s >= {k - 2}")
            .map_batches(lambda b: pa.table({
                "u": b.column("u").cast(pa.int64()),
                "v": b.column("v").cast(pa.int64()),
                "support": b.column("s").cast(pa.int64()),
            }), batch_format="pyarrow"))
