"""candidategeneration_ray — a Ray-Data-native inverted-index build and
BM25 query engine with the query/data-processing capabilities of
aalto1/candidategeneration (reference at /root/reference, read-only).

Built from scratch on ray.data.Dataset / map_batches over zero-copy Arrow
batches; no code is ported from the reference. Reference file:line
citations in docstrings mark which reference semantics each piece
re-implements so parity can be audited.
"""

from candidategeneration_ray.config import EngineConfig

__all__ = ["EngineConfig"]
