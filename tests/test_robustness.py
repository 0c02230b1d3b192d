"""Defensive behavior: malformed inputs fail loudly and early."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


class TestInputValidation:
    def test_sparse_turn_idx_rejected(self, ray_session, tmp_path):
        """Non-dense turn_idx must raise during the offsets aggregate
        (doc-id purity depends on density) — not silently mis-assign."""
        import ray.data

        from candidategeneration_ray.stages.docids import conv_offsets

        t = pa.table({
            "conv_id": pa.array(["a", "a", "b"], pa.string()),
            "turn_idx": pa.array([0, 2, 0], pa.int32()),  # gap in conv a
            "text": pa.array(["x", "y", "z"]),
        })
        p = str(tmp_path / "bad.parquet")
        pq.write_table(t, p)
        with pytest.raises(ValueError, match="dense"):
            conv_offsets(ray.data.read_parquet(p))

    def test_null_text_tolerated(self, ray_session, tmp_path):
        import ray.data

        from candidategeneration_ray.pipelines.build import build_index

        t = pa.table({
            "conv_id": pa.array(["a", "a", "b"], pa.string()),
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "text": pa.array(["alpha beta", None, "gamma delta"], pa.string()),
        })
        p = str(tmp_path / "nulls")
        import os

        os.makedirs(p)
        pq.write_table(t, os.path.join(p, "t.parquet"))
        res = build_index(p, str(tmp_path / "idx"))
        assert res["metrics"]["n_docs"] == 3  # null-text turn still a doc

    def test_missing_index_dir_raises(self):
        from candidategeneration_ray.state.queryengine import IndexReader

        with pytest.raises((ValueError, FileNotFoundError)):
            IndexReader("/nonexistent/nowhere", None)

    def test_empty_corpus_build(self, ray_session, tmp_path):
        """A corpus that tokenizes to nothing still builds (empty index)
        rather than crashing mid-pipeline."""
        import os

        import ray.data

        from candidategeneration_ray.pipelines.build import build_index

        t = pa.table({
            "conv_id": pa.array(["a"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "text": pa.array(["the and of ..."], pa.string()),  # stopwords only
        })
        p = str(tmp_path / "empty")
        os.makedirs(p)
        pq.write_table(t, os.path.join(p, "t.parquet"))
        res = build_index(p, str(tmp_path / "eidx"))
        assert res["metrics"]["n_docs"] == 1
        assert len(res["stats"]["terms"]) == 0
