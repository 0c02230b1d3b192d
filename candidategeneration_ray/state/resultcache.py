"""Query-result cache keyed by (query, k, index CONTENT lineage).

Serving-side memoization with correct invalidation by construction:
the cache key digests the serving sources' manifests plus their
parquet file listing (relative name + byte size), so any index event —
an LSM delta generation appearing, compaction rewriting `final`,
tombstones landing, a codec rebuild — changes the digest and every
stale entry is simply never addressed again. There is no invalidation
protocol to get wrong and no crash window: the key IS the lineage
(compare the reference, which has no serving cache and re-scores every
repeated query; WWWMain.java's query loop).

Entries are k-row parquet files written atomically (tmp + rename), so
a crashed fill leaves no partial entry and concurrent fills of the
same key are idempotent. At fleet scale the cache root lives on shared
storage and the hit path costs one small object read — no index pages,
no scoring, no shuffle.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


def index_digest(sources, extra: str = "") -> str:
    """Content-lineage digest of one serving-source dir or an ordered
    list of them: manifest bytes + (relative file name, size) pairs.
    `extra` folds in serving-time modifiers that change results without
    changing the index bytes (doc filters, tombstone sets, algorithm
    parameters)."""
    dirs = [sources] if isinstance(sources, str) else list(sources)
    h = hashlib.md5()
    h.update(extra.encode())
    for d in dirs:
        h.update(b"|dir|")
        h.update(os.path.basename(os.path.normpath(d)).encode())
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if not os.path.isfile(p):
                continue
            if name.endswith(".json"):
                with open(p, "rb") as f:
                    h.update(name.encode())
                    h.update(f.read())
            else:
                h.update(json.dumps([name, os.path.getsize(p)]).encode())
    return h.hexdigest()


class CachedEngine:
    """Lazy engine behind a lineage-keyed result cache. The underlying
    QueryEngine is only constructed on the first MISS — a process that
    serves entirely from cache never touches the index at all."""

    def __init__(self, sources, stats, cache_root: str,
                 engine_factory=None, extra: str = ""):
        self.digest = index_digest(sources, extra)
        self.cache_root = cache_root
        os.makedirs(cache_root, exist_ok=True)
        if engine_factory is None:
            def engine_factory():
                from candidategeneration_ray.state.queryengine import QueryEngine

                return QueryEngine(sources, stats)
        self._factory = engine_factory
        self._eng = None
        self.misses = 0
        self.hits = 0

    def _path(self, text: str, k: int) -> str:
        key = hashlib.md5(f"{self.digest}|{k}|{text}".encode()).hexdigest()
        return os.path.join(self.cache_root, f"{key}.parquet")

    def topk(self, text: str, k: int = 10) -> list[tuple[int, int]]:
        path = self._path(text, k)
        if os.path.exists(path):
            self.hits += 1
            t = pq.read_table(path)
            return list(zip(t.column("score").to_pylist(),
                            t.column("doc_id").to_pylist()))
        self.misses += 1
        if self._eng is None:
            self._eng = self._factory()
        hits = self._eng.topk(text, k=k)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(pa.table({
            "score": pa.array([s for s, _ in hits], pa.int64()),
            "doc_id": pa.array([d for _, d in hits], pa.int64()),
        }), tmp)
        os.replace(tmp, path)
        return hits
