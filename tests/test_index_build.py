"""End-to-end index build vs the exhaustive oracle (SURVEY §5.2)."""

import numpy as np
import pyarrow.dataset as pads
import pytest

from candidategeneration_ray.config import EngineConfig
from candidategeneration_ray.functions.varint import decode_delta
from candidategeneration_ray.oracle import build_oracle_index
from candidategeneration_ray.state.queryengine import IndexReader


@pytest.fixture(scope="module")
def reader(built_index):
    return IndexReader(built_index["final_dir"], built_index["stats"])


class TestStats:
    def test_global_stats_match_oracle(self, built_index, oracle_small):
        s = built_index["stats"]
        assert s["n_docs"] == oracle_small.n_docs
        assert s["total_tokens"] == oracle_small.total_tokens
        assert s["avgdl"] == oracle_small.avgdl

    def test_df_matches_oracle(self, built_index, oracle_small):
        s = built_index["stats"]
        assert list(s["terms"]) == sorted(oracle_small.df)
        for i, t in enumerate(s["terms"]):
            assert s["df_by_id"][i + 1] == oracle_small.df[t], t

    def test_term_ids_are_deterministic_dictionary(self, built_index, oracle_small):
        s = built_index["stats"]
        for t, tid in oracle_small.term_ids.items():
            assert s["terms"][tid - 1] == t


class TestDocIds:
    def test_docid_is_stable_rank(self, built_index, transcripts_dir):
        off = built_index["offsets"]
        # conv_ids sorted; bases = prefix sums
        assert list(off["conv_ids"]) == sorted(off["conv_ids"])
        assert off["bases"][0] == 0
        assert np.array_equal(
            np.diff(off["bases"]), off["counts"][:-1]
        )

    def test_text_equality_invariant(self, transcripts_dir, ray_session):
        """Per-turn text equality under stable (conv_id, turn_idx) order:
        the tokenize stage passes `text` through byte-identical."""
        import ray.data
        from candidategeneration_ray.stages.tokenize import attach_tokens

        ds = ray.data.read_parquet(transcripts_dir)
        out = attach_tokens(ds).select_columns(["conv_id", "turn_idx", "text"]).to_pandas()
        src = pads.dataset(transcripts_dir).to_table(
            columns=["conv_id", "turn_idx", "text"]).to_pandas()
        out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        src = src.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert (out["text"] == src["text"]).all()


class TestPostingLists:
    def test_unigram_lists_match_oracle(self, reader, oracle_small):
        # every term's list: same docs, same quantized scores, doc order
        for t, tid in oracle_small.term_ids.items():
            got = reader.get(tid)
            expect = oracle_small.unigram_postings(t)
            assert got is not None, t
            docs, scores, bmax, blast = got
            assert docs.tolist() == [d for d, _ in expect], t
            assert scores.tolist() == [s for _, s in expect], t

    def test_structural_invariants(self, reader):
        cfg = EngineConfig()
        for key in reader.keys:
            docs, scores, bmax, blast = reader.get(int(key))
            assert np.all(np.diff(docs) > 0), "doc ids strictly increasing"
            assert docs.size == scores.size == reader.list_len(int(key))
            nb = (docs.size + cfg.block_size - 1) // cfg.block_size
            assert bmax.size == blast.size == nb
            for b in range(nb):
                blk = scores[b * cfg.block_size:(b + 1) * cfg.block_size]
                assert bmax[b] == blk.max(), "block_max is the block max"
                assert blast[b] == docs[min((b + 1) * cfg.block_size, docs.size) - 1]

    def test_pair_lists_match_oracle_sample(self, reader, oracle_small):
        # spot-check d-bigram lists for pairs the oracle can verify
        pair_keys = [int(k) for k in reader.keys if k >= (1 << 32)]
        assert pair_keys, "index contains pair lists"
        rng = np.random.default_rng(7)
        id_to_term = {v: k for k, v in oracle_small.term_ids.items()}
        for key in rng.choice(pair_keys, size=min(40, len(pair_keys)), replace=False):
            lo, hi = int(key) >> 32, int(key) & 0xFFFFFFFF
            t1, t2 = id_to_term[lo], id_to_term[hi]
            expect = oracle_small.pair_postings(t1, t2, distance=5)
            docs, scores, _, _ = reader.get(int(key))
            assert docs.tolist() == [d for d, _ in expect], (t1, t2)
            assert scores.tolist() == [s for _, s in expect], (t1, t2)

    def test_total_postings_conservation(self, reader, oracle_small):
        # Σ unigram list lengths == Σ per-doc distinct terms
        uni_total = sum(
            reader.list_len(int(k)) for k in reader.keys if k < (1 << 32)
        )
        expect = sum(len(set(ts)) for ts in oracle_small.tokens.values())
        assert uni_total == expect


class TestBlockedDictionary:
    def test_blocks_mode_emits_identical_postings(self, ray_session, transcripts_dir, built_index):
        """The range-blocked dictionary (scale path) produces the exact
        same posting stream as the broadcast dictionary."""
        import ray
        import ray.data

        from candidategeneration_ray.config import EngineConfig
        from candidategeneration_ray.stages.stats import compute_stats, stats_to_blocks
        from candidategeneration_ray.stages.tokenize import attach_tokens
        from candidategeneration_ray.stages.docids import attach_doc_ids, conv_offsets
        from candidategeneration_ray.stages.postings import emit_postings

        cfg = EngineConfig(partial_lists=False)
        ds = ray.data.read_parquet(transcripts_dir, columns=["conv_id", "turn_idx", "text"])
        toks = attach_tokens(ds)
        stats = built_index["stats"]
        off_ref = ray.put(conv_offsets(ds))
        wi = attach_doc_ids(toks, off_ref)

        a = emit_postings(wi, ray.put(stats), cfg).to_pandas() \
            .sort_values(["key", "doc_id"]).reset_index(drop=True)
        blocks = stats_to_blocks(stats, num_blocks=7)
        b = emit_postings(wi, ray.put(blocks), cfg).to_pandas() \
            .sort_values(["key", "doc_id"]).reset_index(drop=True)
        assert a.equals(b)


class TestDistributedPrior:
    def _docs_table(self):
        import pyarrow as pa

        rng = np.random.default_rng(13)
        n = 200
        words = np.array(["alpha", "beta", "gamma", "delta", "query", "index"])
        texts = [" ".join(rng.choice(words, size=int(rng.integers(2, 12))))
                 for _ in range(n)]
        return pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })

    def test_rank_prior_scalable_matches_driver_rank(self, ray_session):
        """The distributed (sort + block-base) prior rank equals the
        driver-side lexsort rank, and the driver only ever holds block
        metadata (verified by reading the blocks back explicitly)."""
        import pyarrow as pa
        import ray
        import ray.data

        from candidategeneration_ray.stages.docids import rank_prior_scalable

        t = self._docs_table()
        ds = ray.data.from_arrow(t).repartition(5)
        prior, keep = rank_prior_scalable(
            ds.select_columns(["doc_id", "n_chars"]), num_blocks=4)
        assert set(prior) == {"block_refs", "block_first_doc"}
        got = {}
        for ref in prior["block_refs"]:
            blk = ray.get(ref)
            blk = blk if hasattr(blk, "column") else blk.to_arrow()
            for d, r in zip(blk.column("doc_id").to_pylist(),
                            blk.column("rank").to_pylist()):
                got[d] = r
        ids = t.column("doc_id").to_numpy()
        nch = t.column("n_chars").to_numpy()
        order = np.lexsort((ids, -nch))
        expect = {int(ids[i]): r + 1 for r, i in enumerate(order)}
        assert got == expect
        del keep

    def test_hit_emission_identical_blocked_vs_broadcast(self, ray_session):
        """HIT-family postings from the range-blocked prior (scale path)
        are identical to the broadcast-prior emission."""
        import ray
        import ray.data

        from candidategeneration_ray.stages.docids import rank_prior_scalable
        from candidategeneration_ray.stages.postings import emit_postings
        from candidategeneration_ray.stages.stats import compute_stats
        from candidategeneration_ray.stages.tokenize import attach_tokens

        t = self._docs_table()
        ds = ray.data.from_arrow(t).repartition(5)
        toks = attach_tokens(ds)
        stats = compute_stats(toks)
        cfg = EngineConfig(emit_pairs=False, partial_lists=False)

        ids = t.column("doc_id").to_numpy()
        nch = t.column("n_chars").to_numpy()
        rank_of = np.empty(ids.size, dtype=np.int32)
        rank_of[np.lexsort((ids, -nch))] = np.arange(1, ids.size + 1, dtype=np.int32)
        broadcast = {"doc_ids": ids, "rank": rank_of}
        a = emit_postings(toks, ray.put(stats), cfg,
                          prior_ref=ray.put(broadcast)).to_pandas() \
            .sort_values(["key", "doc_id"]).reset_index(drop=True)

        blocked, keep = rank_prior_scalable(
            ds.select_columns(["doc_id", "n_chars"]), num_blocks=4)
        b = emit_postings(toks, ray.put(stats), cfg,
                          prior_ref=ray.put(blocked)).to_pandas() \
            .sort_values(["key", "doc_id"]).reset_index(drop=True)
        del keep
        assert a.equals(b)


class TestTokenCache:
    def test_token_cache_build_identical(self, ray_session, transcripts_dir,
                                         built_index, tmp_path_factory):
        """token_cache=True (tokenize once into out_dir/tokens/, stats +
        emission from the columnar store) produces a byte-identical
        final index, and a re-run skips every phase including the token
        store."""
        import os

        from candidategeneration_ray.pipelines.build import build_index

        out = str(tmp_path_factory.mktemp("idx_tokcache"))
        res = build_index(transcripts_dir, out, partitions=2, token_cache=True)
        assert os.path.isdir(os.path.join(out, "tokens"))

        base = IndexReader(built_index["final_dir"], built_index["stats"])
        cached = IndexReader(res["final_dir"], res["stats"])
        assert sorted(res["stats"]["terms"].tolist()) == \
            sorted(built_index["stats"]["terms"].tolist())
        assert set(map(int, base.keys)) == set(map(int, cached.keys))
        import numpy as np

        for k in map(int, base.keys):
            a, b = base.get(k), cached.get(k)
            np.testing.assert_array_equal(a[0], b[0])
            np.testing.assert_array_equal(a[1], b[1])

        res2 = build_index(transcripts_dir, out, partitions=2, token_cache=True)
        assert all(p.get("skipped") for p in res2["metrics"]["phases"]
                   if p["phase"] != "tokens")
        assert res2["metrics"]["total_sec"] < 5


class TestIndexIntegrity:
    def test_detects_injected_corruption(self, ray_session, tmp_path):
        """The audit reports 0 on a fresh index and flags a row whose
        block_max metadata is tampered with."""
        import glob
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        from candidategeneration_ray.pipelines.docquery import (
            build_documents_index, q_index_integrity)

        sf = "/root/testdata/sf0.001"
        clean = q_index_integrity(sf).to_pandas()
        assert clean.loc[0, "n_violations"] == 0
        assert clean.loc[0, "n_keys"] > 0

        # copy the built index, corrupt one block_max entry, re-audit
        from candidategeneration_ray.config import EngineConfig
        built = build_documents_index(sf, EngineConfig(emit_pairs=False))
        src_dir = built["final_dir"]
        dst = str(tmp_path / "final")
        shutil.copytree(src_dir, dst)
        f = sorted(glob.glob(dst + "/**/*.parquet", recursive=True))[0]
        t = pq.read_table(f)
        bm = t.column("block_max").to_pylist()
        bm[0] = [v + 1 for v in bm[0]]          # inflate one skip bound
        t = t.set_column(t.schema.get_field_index("block_max"),
                         "block_max", pa.array(bm, pa.list_(pa.int32())))
        pq.write_table(t, f)

        import numpy as np
        import ray.data
        from ray.data.aggregate import Sum
        from candidategeneration_ray.functions.codecs import decode_docs
        # re-run the audit kernel against the corrupted copy
        import candidategeneration_ray.pipelines.docquery as dq
        orig = dq.build_documents_index
        try:
            dq.build_documents_index = lambda s, c=None: {
                "final_dir": dst, "stats": built["stats"]}
            got = q_index_integrity(sf).to_pandas()
        finally:
            dq.build_documents_index = orig
        assert got.loc[0, "n_violations"] == 1


class TestExchangeIdentity:
    def test_task_exchange_equals_sort_exchange(self, ray_session,
                                                transcripts_dir):
        """The task-routed bucket exchange (split + per-bucket merge
        tasks) must produce the SAME posting lists as the groupby
        sort exchange — the fold is order-insensitive, so only the
        routing differs."""
        import glob

        import numpy as np
        import ray

        from candidategeneration_ray.config import EngineConfig
        from candidategeneration_ray.pipelines.build import (
            INPUT_COLUMNS)
        from candidategeneration_ray.stages.docids import (
            attach_doc_ids, conv_offsets)
        from candidategeneration_ray.stages.listbuild import (
            build_posting_lists)
        from candidategeneration_ray.stages.postings import emit_postings
        from candidategeneration_ray.stages.tokenize import attach_tokens

        inputs = sorted(glob.glob(transcripts_dir + "/*.parquet"))
        cfg = EngineConfig()
        base = ray.data.read_parquet(inputs, columns=INPUT_COLUMNS)
        offsets_ref = ray.put(conv_offsets(base))
        from candidategeneration_ray.stages.stats import compute_stats
        stats_ref = ray.put(compute_stats(attach_tokens(base)))

        def lists_df(exchange):
            ds = ray.data.read_parquet(inputs, columns=INPUT_COLUMNS)
            with_ids = attach_doc_ids(attach_tokens(ds), offsets_ref)
            p = emit_postings(with_ids, stats_ref, cfg)
            df = build_posting_lists(p, cfg, exchange=exchange).to_pandas()
            return df.sort_values("key").reset_index(drop=True)

        a, b = lists_df("tasks"), lists_df("sort")
        assert len(a) == len(b) > 0
        assert list(a.columns) == list(b.columns)
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            assert all(np.array_equal(x, y) for x, y in zip(av, bv)), c
