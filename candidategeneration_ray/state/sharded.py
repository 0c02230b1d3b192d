"""Document-sharded distributed query serving.

At index sizes past one node's memory, serving shards BY DOCUMENT
RANGE: each shard actor loads one partition's sub-index (the
doc-range-disjoint segments the partitioned build already produces) and
answers every query over its doc slice with the full local engine
(hybrid TAAT / block-max WAND). A doc's total score lives entirely in
its own shard, so per-shard top-k + a k-way merge of S×k candidates is
EXACT — the textbook scatter-gather layout (and the Ray-actors case
SURVEY §2.9 anticipates: a shared serving fleet the Dataset API doesn't
express).

This generalizes the reference's single-process C++ engine
(algo_toplayer.cpp ctor :61-83) to a fleet; rank identity vs the
single-engine path is tested.
"""

from __future__ import annotations

import ray

from candidategeneration_ray.config import EngineConfig
from candidategeneration_ray.state.queryengine import QueryEngine


# Shard actors are pure functions of their segment dir + broadcast
# stats, so Ray can transparently restart a crashed one (re-running
# __init__ reloads the segments) and retry the in-flight pure topk
# calls — serving survives worker loss without fleet-level logic.
@ray.remote(max_restarts=2, max_task_retries=2)
class _ShardActor:
    def __init__(self, part_dir: str, stats_ref, cfg: EngineConfig,
                 tombstones_ref=None):
        self.engine = QueryEngine(part_dir, stats_ref, cfg,
                                  tombstones_ref=tombstones_ref)

    def topk(self, text: str, k: int) -> list[tuple[int, int]]:
        return self.engine.topk(text, k=k)

    def ping(self) -> bool:
        return True


class ShardedQueryEngine:
    """Fan-out/merge serving over partition sub-indexes.

    part_dirs: the build's segments/part-* directories (doc-range
    disjoint). Corpus-wide stats are shipped once via ray.put.

    LSM updates compose for free: a delta generation
    (pipelines.update) holds a disjoint doc range BY CONSTRUCTION, so
    appending its dir to part_dirs adds the new documents to the fleet
    as one more shard — no re-shard of existing actors, and the
    scatter-gather merge stays exact (tested equal to the
    multi-generation QueryEngine).
    """

    def __init__(self, part_dirs: list[str], stats: dict,
                 cfg: EngineConfig | None = None,
                 tombstones: dict | None = None):
        """`tombstones` (pipelines.update.load_tombstones): deleted-doc
        ranges, shipped once and filtered inside every shard — deletes
        compose with doc-sharding exactly like generations do."""
        self.cfg = cfg or EngineConfig()
        stats_ref = ray.put(stats)
        tomb_ref = ray.put(tombstones) if tombstones is not None else None
        self.shards = [
            _ShardActor.remote(d, stats_ref, self.cfg, tomb_ref)
            for d in part_dirs
        ]
        ray.get([s.ping.remote() for s in self.shards])  # surface init errors

    def topk(self, text: str, k: int | None = None) -> list[tuple[int, int]]:
        """Exact global top-k: per-shard top-k (concurrent), then merge
        by (score desc, doc_id asc)."""
        k = k or self.cfg.top_k
        partials = ray.get([s.topk.remote(text, k) for s in self.shards])
        merged = [p for part in partials for p in part]
        merged.sort(key=lambda p: (-p[0], p[1]))
        return merged[:k]

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
