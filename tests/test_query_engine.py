"""BM25 top-k rank identity: block-max WAND vs TAAT vs the exhaustive
oracle (the north-rule check, BASELINE.md targets)."""

import numpy as np
import pytest

from candidategeneration_ray.config import EngineConfig
from candidategeneration_ray.state.queryengine import (
    IndexReader, QueryEngine, _List, blockmax_topk, maxscore_topk,
    ta_impact_topk, taat_topk, wand_topk,
)

# a query mix per FIXTURES.md §2: hot terms, rare terms, absent terms,
# stopword-only, multi-term
QUERIES = [
    "data",                      # hottest term (negative IDF path)
    "query engine",
    "index worker shard",
    "rareterma",
    "rareterma rareterme data",
    "absentzzz",                 # not in corpus
    "the and of",                # stopword-only → empty
    "model kernel latency vector actor",
    "1003 1007",                 # numeric tokens
    "duplicate payload text",
    "alpha beta gamma",
    "data data data",            # repeated query term == distinct once
    "cluster dataset engine frame group",
    "agenting batching caching",
]


@pytest.fixture(scope="module")
def engine(built_index):
    return QueryEngine(built_index["final_dir"], built_index["stats"])


class TestRankIdentity:
    @pytest.mark.parametrize("qtext", QUERIES)
    def test_wand_matches_oracle(self, engine, oracle_small, qtext):
        from candidategeneration_ray.functions.tokenize import tokenize_text

        got = engine.topk(qtext, k=10, algorithm="wand")
        expect = oracle_small.topk(tokenize_text(qtext), k=10)
        assert [(d, s) for s, d in got] == expect, qtext

    @pytest.mark.parametrize("qtext", QUERIES)
    def test_auto_dispatch_matches_oracle(self, engine, oracle_small, qtext):
        from candidategeneration_ray.functions.tokenize import tokenize_text

        got = engine.topk(qtext, k=10)  # hybrid auto path
        expect = oracle_small.topk(tokenize_text(qtext), k=10)
        assert [(d, s) for s, d in got] == expect, qtext

    @pytest.mark.parametrize("qtext", QUERIES)
    def test_wand_matches_taat(self, engine, qtext):
        ids = engine.reader.query_term_ids(qtext)
        taat = taat_topk(engine.reader, ids, 10)
        wand = engine.topk(qtext, k=10, algorithm="wand")
        assert wand == taat, qtext

    @pytest.mark.parametrize("qtext", QUERIES)
    def test_maxscore_matches_taat(self, engine, qtext):
        ids = engine.reader.query_term_ids(qtext)
        taat = taat_topk(engine.reader, ids, 10)
        got = engine.topk(qtext, k=10, algorithm="maxscore")
        assert got == taat, qtext

    @pytest.mark.parametrize("qtext", QUERIES)
    def test_ta_impact_matches_taat(self, engine, qtext):
        """Impact-ordered TA (the all-non-positive heavy-mix path) is
        rank-identical to the exhaustive TAAT merge at several k."""
        ids = engine.reader.query_term_ids(qtext)
        for k in (1, 3, 10, 100):
            assert (engine.topk(qtext, k=k, algorithm="ta_impact")
                    == taat_topk(engine.reader, ids, k)), (qtext, k)

    def test_warm_preserves_results(self, built_index):
        """Serving-actor warmup (hot-list decode + impact orders +
        dense views) changes latency only, never results."""
        cold = QueryEngine(built_index["final_dir"], built_index["stats"])
        want = {q: cold.topk(q, k=10) for q in QUERIES}
        warmed = QueryEngine(built_index["final_dir"],
                             built_index["stats"])
        assert warmed.warm(top_lists=8) > 0
        for q in QUERIES:
            assert warmed.topk(q, k=10) == want[q], q

    def test_various_k(self, engine, oracle_small):
        from candidategeneration_ray.functions.tokenize import tokenize_text

        for k in (1, 3, 25, 100, 10_000):
            got = engine.topk("query index data worker", k=k, algorithm="wand")
            expect = oracle_small.topk(
                tokenize_text("query index data worker"), k=k)
            assert [(d, s) for s, d in got] == expect, k


@pytest.mark.parametrize("scorer", [wand_topk, blockmax_topk, maxscore_topk],
                         ids=["wand_scalar", "blockmax_vec", "maxscore"])
class TestWandUnit:
    def _mk(self, docs, scores, bs=4):
        docs = np.asarray(docs, np.int64)
        scores = np.asarray(scores, np.int32)
        nb = (docs.size + bs - 1) // bs
        bmax = np.array([scores[i * bs:(i + 1) * bs].max() for i in range(nb)], np.int32)
        blast = np.array([docs[min((i + 1) * bs, docs.size) - 1] for i in range(nb)], np.int64)
        return _List(docs, scores, bmax, blast)

    def test_tie_break_doc_asc(self, scorer):
        l1 = self._mk([1, 2, 3], [5, 5, 5])
        out = scorer([l1], 2, 4)
        assert out == [(5, 1), (5, 2)]

    def test_negative_scores(self, scorer):
        l1 = self._mk([1, 2], [-3, -7])
        l2 = self._mk([2, 3], [4, 4])
        # doc2: -7+4=-3; doc1: -3; doc3: 4 → top2 = (4,3),(-3,1)
        out = scorer([l1, l2], 2, 4)
        assert out == [(4, 3), (-3, 1)]

    def test_block_skip_correctness(self, scorer):
        # long list with one high block at the end
        docs = list(range(1, 101))
        scores = [1] * 99 + [100]
        l1 = self._mk(docs, scores, bs=8)
        l2 = self._mk([100, 200], [50, 60])
        out = scorer([l1, l2], 2, 8)
        assert out == [(150, 100), (60, 200)]

    def test_exhaustive_random_vs_taat_reference(self, scorer):
        rng = np.random.default_rng(0)
        for trial in range(50):
            nlists = int(rng.integers(1, 6))
            lists = []
            ref_acc = {}
            for _ in range(nlists):
                n = int(rng.integers(1, 40))
                docs = np.sort(rng.choice(200, size=n, replace=False)).astype(np.int64)
                scores = rng.integers(-50, 1000, size=n).astype(np.int32)
                for d, s in zip(docs, scores):
                    ref_acc[int(d)] = ref_acc.get(int(d), 0) + int(s)
                lists.append(self._mk(docs, scores, bs=7))
            k = int(rng.integers(1, 12))
            expect = sorted(
                ((s, d) for d, s in ref_acc.items()), key=lambda p: (-p[0], p[1])
            )[:k]
            got = scorer(lists, k, 7)
            assert got == expect, trial


class TestCandidates:
    def test_pair_candidates_contain_cooccurring_docs(self, engine, oracle_small):
        cands = engine.candidates("alpha beta", budget=1000)
        # every doc where the pair co-occurs must be in the pool
        expect = oracle_small.pair_postings("alpha", "beta", distance=5)
        for d, _ in expect:
            assert d in cands

    def test_top_layer_is_impact_ordered_prefix(self, engine):
        key = int(engine.reader.keys[0])
        docs, scores = engine.reader.top_layer(key, 5)
        assert np.all(np.diff(scores) <= 0)


class TestActorPoolServing(object):
    def test_map_batches_over_queries(self, built_index, ray_session):
        import ray.data
        from candidategeneration_ray.pipelines.query import run_queries

        queries = ray.data.from_items([
            {"query_id": i, "text": q} for i, q in enumerate(QUERIES)
        ])
        out = run_queries(
            built_index["final_dir"], queries, built_index["stats"],
            concurrency=(1, 2),
        ).to_pandas()
        assert set(out.columns) == {"query_id", "rank", "doc_id", "score"}
        # stopword-only and absent queries yield no rows
        assert 6 not in set(out["query_id"])
        # each answered query has ranks 0..n-1 with n<=10
        for qid, grp in out.groupby("query_id"):
            assert list(grp.sort_values("rank")["rank"]) == list(range(len(grp)))
            assert len(grp) <= 10

    def test_large_index_path_routing_identical(self, built_index, ray_session):
        """Above the broadcast threshold the actors load segments from
        the path themselves; results must be identical to the
        plasma-broadcast mode."""
        import ray.data
        from candidategeneration_ray.pipelines.query import run_queries

        queries = ray.data.from_items([
            {"query_id": i, "text": q} for i, q in enumerate(QUERIES)
        ])

        def _run(limit):
            return run_queries(
                built_index["final_dir"], queries, built_index["stats"],
                concurrency=(1, 2), broadcast_max_bytes=limit,
            ).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)

        a = _run(None)   # default: broadcast (index is tiny)
        b = _run(0)      # force the large-index path mode
        assert a.equals(b)


class TestBucketFilteredLoad:
    def test_bucket_subset_covers_its_keys(self, built_index):
        from candidategeneration_ray.stages.listbuild import bucket_of
        import numpy as np

        full = IndexReader(built_index["final_dir"], built_index["stats"])
        cfg = EngineConfig()
        some = IndexReader(built_index["final_dir"], built_index["stats"],
                           buckets=[0, 1, 2])
        # every loaded key belongs to the requested buckets and matches
        # the full reader's list byte-for-byte
        assert 0 < some.keys.size < full.keys.size
        b = bucket_of(some.keys, cfg.num_buckets)
        assert set(b.tolist()) <= {0, 1, 2}
        for k in some.keys[::17]:
            for x, y in zip(some.get(int(k)), full.get(int(k))):
                assert np.array_equal(x, y)
        # union of all buckets reproduces the full key set
        union_keys = sum(
            IndexReader(built_index["final_dir"], built_index["stats"],
                        buckets=list(range(s, cfg.num_buckets, 4))).keys.size
            for s in range(4)
        )
        assert union_keys == full.keys.size


def test_prf_topk_second_scale_oracle(ray_session):
    """prf_topk hash-verifies at sf0.01 in the contract sweep; this
    re-verifies the full expansion chain at sf0.001 (different corpus
    statistics exercise different expansion-term ties)."""
    import duckdb
    import pandas as pd

    from candidategeneration_ray.pipelines.docquery import q_prf_topk
    from candidategeneration_ray.pipelines.sql_oracles import core_oracles

    SF = "/root/testdata/sf0.001"
    got = q_prf_topk(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.sql(core_oracles()["prf_topk"]).df()
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False)


def test_forward_export_conserves_postings(ray_session):
    """The transpose must conserve postings: Σ n_terms over docs ==
    Σ list lengths over terms, and per-doc term counts equal the
    tokenizer's distinct-term counts."""
    from candidategeneration_ray.pipelines.docquery import (
        q_forward_export, q_unigram_list_lengths)

    SF = "/root/testdata/sf0.001"
    fwd = q_forward_export(SF).to_pandas()
    lens = q_unigram_list_lengths(SF).to_pandas()
    assert fwd["n_terms"].sum() == lens["n"].sum()
    import pyarrow.parquet as pq
    from candidategeneration_ray.functions.tokenize import tokenize_text

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    want = {int(r.doc_id): len(set(tokenize_text(r.text)))
            for r in docs.itertuples()}
    got = dict(zip(fwd["doc_id"].astype(int), fwd["n_terms"].astype(int)))
    assert got == {d: n for d, n in want.items() if n > 0}


def test_doc_filter_algorithms_agree_and_respect_filter(ray_session):
    """The filtered index view serves identically under WAND / scalar
    WAND / TAAT, returns only allowed docs, and equals the unfiltered
    ranking restricted to the allowed set."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from candidategeneration_ray.config import EngineConfig
    from candidategeneration_ray.pipelines.docquery import (
        DOC_QUERIES, build_documents_index)
    from candidategeneration_ray.state.queryengine import QueryEngine

    SF = "/root/testdata/sf0.001"
    cfg = EngineConfig(emit_pairs=False)
    built = build_documents_index(SF, cfg)
    meta = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"])
    allowed = np.sort(meta.filter(pc.equal(meta.column("lang"), "en"))
                      .column("doc_id").to_numpy().astype(np.int64))
    eng_f = QueryEngine(built["final_dir"], built["stats"], cfg,
                        doc_filter_ref=allowed)
    eng = QueryEngine(built["final_dir"], built["stats"], cfg)
    aset = set(allowed.tolist())
    for _, q in DOC_QUERIES:
        w = eng_f.topk(q, k=10, algorithm="wand")
        assert eng_f.topk(q, k=10, algorithm="wand_scalar") == w
        assert eng_f.topk(q, k=10, algorithm="taat") == w
        assert all(d in aset for _, d in w)
        full = [(s, d) for s, d in eng.topk(q, k=10_000) if d in aset]
        assert w == full[:10]


def test_collapse_topk_invariants(ray_session):
    """Field collapsing at sf0.001: one doc per (query, source), ranks
    are 1..n in (score desc, doc_id asc) order, and each collapsed row
    is the best-scoring doc of its source within the query's full
    match set (cross-checked against uncollapsed TAAT)."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines.docquery import (
        DOC_QUERIES, build_documents_index, q_collapse_topk)
    from candidategeneration_ray.config import EngineConfig
    from candidategeneration_ray.state.queryengine import IndexReader, taat_topk

    SF = "/root/testdata/sf0.001"
    t = q_collapse_topk(SF).to_pandas()
    assert not t.duplicated(["query_id", "source"]).any()
    built = build_documents_index(SF, EngineConfig(emit_pairs=False))
    reader = IndexReader(built["final_dir"], built["stats"])
    meta = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    src_of = dict(zip(meta.doc_id, meta.source))
    for qid, text in DOC_QUERIES:
        sub = t[t.query_id == qid].sort_values("rank")
        if sub.empty:
            continue
        assert list(sub["rank"]) == list(range(1, len(sub) + 1))
        pairs = list(zip(sub["score"], sub["doc_id"]))
        assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
        full = taat_topk(reader, reader.query_term_ids(text), 1 << 60)
        best = {}
        for s, d in full:  # already (score desc, doc asc)
            best.setdefault(src_of[d], (s, d))
        for r in sub.itertuples():
            assert best[r.source] == (r.score, r.doc_id)


def test_mmr_topk_greedy_invariants(ray_session):
    """MMR at sf0.001: rank 1 equals the plain BM25 top-1, no doc
    repeats, and every later pick maximizes the marginal value over the
    remaining pool (recomputed brute-force per step with tokenize_text
    term sets)."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.config import EngineConfig
    from candidategeneration_ray.functions.tokenize import tokenize_text
    from candidategeneration_ray.pipelines.docquery import (
        DOC_QUERIES, MMR_PEN_W, MMR_POOL, MMR_REL_W, MMR_SIM_SCALE,
        build_documents_index, q_mmr_topk)
    from candidategeneration_ray.state.queryengine import IndexReader, taat_topk

    SF = "/root/testdata/sf0.001"
    t = q_mmr_topk(SF).to_pandas()
    assert not t.duplicated(["query_id", "doc_id"]).any()
    built = build_documents_index(SF, EngineConfig(emit_pairs=False))
    reader = IndexReader(built["final_dir"], built["stats"])
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    text_of = dict(zip(docs.doc_id, docs.text))
    for qid, qtext in DOC_QUERIES:
        sub = t[t.query_id == qid].sort_values("rank")
        if sub.empty:
            continue
        pool = taat_topk(reader, reader.query_term_ids(qtext), MMR_POOL)
        assert (sub.iloc[0].doc_id, sub.iloc[0].score) == (pool[0][1], pool[0][0])
        tsets = {d: set(tokenize_text(text_of[d])) for _, d in pool}
        chosen = []
        for r in sub.itertuples():
            vals = {}
            for s, d in pool:
                if d in chosen:
                    continue
                mo = max((len(tsets[d] & tsets[c]) for c in chosen), default=0)
                vals[d] = MMR_REL_W * s - MMR_PEN_W * MMR_SIM_SCALE * mo
            best = min((d for d in vals if vals[d] == max(vals.values())))
            assert (r.doc_id, r.mmr_value) == (best, vals[best])
            chosen.append(r.doc_id)


def test_hybrid_topk_invariants(ray_session):
    """Hybrid dense+sparse fusion at sf0.001: the dense seed (sparse
    rank-1 doc) wins final rank 1 (rank 1 in BOTH lists is unbeatable
    RRF mass), rrf_micro is brute-force-reproduced from the two
    rankings, and queries with no sparse matches produce no rows."""
    import numpy as np
    import pyarrow.parquet as pq

    from candidategeneration_ray.config import EngineConfig
    from candidategeneration_ray.pipelines.docquery import (
        DOC_QUERIES, HYBRID_POOL, HYBRID_RRF_C, build_documents_index,
        q_hybrid_topk)
    from candidategeneration_ray.state.queryengine import QueryEngine

    SF = "/root/testdata/sf0.001"
    t = q_hybrid_topk(SF).to_pandas()
    assert not t.duplicated(["query_id", "doc_id"]).any()
    built = build_documents_index(SF, EngineConfig(emit_pairs=False))
    eng = QueryEngine(built["final_dir"], built["stats"])
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    ids = emb.vec_id.to_numpy(np.int64)
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    seen_nonempty = False
    for qid, qtext in DOC_QUERIES:
        sub = t[t.query_id == qid].sort_values("rank")
        hits = eng.topk(qtext, k=HYBRID_POOL)
        if not hits:
            assert sub.empty
            continue
        seen_nonempty = True
        sparse = [int(d) for _, d in hits]
        seed = sparse[0]
        qv = mat[ids == seed][0]
        cos = (mat @ qv) / (norms * np.linalg.norm(qv))
        dense = ids[np.lexsort((ids, -cos))][:HYBRID_POOL].tolist()
        assert dense[0] == seed          # cos(seed, seed) = 1 is the max
        score: dict[int, int] = {}
        for r, d in enumerate(sparse, 1):
            score[d] = score.get(d, 0) + 1_000_000 // (HYBRID_RRF_C + r)
        for r, d in enumerate(dense, 1):
            score[int(d)] = score.get(int(d), 0) + 1_000_000 // (HYBRID_RRF_C + r)
        top = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = list(zip(sub.doc_id, sub.rrf_micro))
        assert got == top
        assert sub.iloc[0].doc_id == seed  # double rank-1 is unbeatable
    assert seen_nonempty


def test_bm25f_fielded_transform_and_ranking(ray_session):
    """BM25F at sf0.001: (a) the fielded token transform preserves term
    PRESENCE per doc (df unchanged) while inflating doc_len by exactly
    (W-1)*min(dl, H); (b) the fielded ranking actually differs from the
    unfielded one somewhere (the head weight is load-bearing); (c) the
    per-query result sets obey the engine's (score desc, doc asc) order."""
    import numpy as np

    from candidategeneration_ray.pipelines.docquery import (
        BM25F_HEAD, BM25F_WEIGHT, doc_tokens, doc_tokens_fielded,
        q_bm25_topk, q_bm25f_topk)

    SF = "/root/testdata/sf0.001"
    plain = doc_tokens(SF).to_pandas().set_index("doc_id")
    fielded = doc_tokens_fielded(SF).to_pandas().set_index("doc_id")
    assert set(plain.index) == set(fielded.index)
    for doc_id in list(plain.index)[:200]:
        p = list(plain.loc[doc_id, "tokens"])
        f = list(fielded.loc[doc_id, "tokens"])
        assert set(p) == set(f)  # presence (df) preserved
        exp_len = len(p) + (BM25F_WEIGHT - 1) * min(len(p), BM25F_HEAD)
        assert len(f) == exp_len == fielded.loc[doc_id, "doc_len"]
        # weighted tf: head tokens gain exactly W-1 extra copies
        head = p[:BM25F_HEAD]
        for tok in set(p):
            exp_tf = p.count(tok) + (BM25F_WEIGHT - 1) * head.count(tok)
            assert f.count(tok) == exp_tf

    base = q_bm25_topk(SF).to_pandas()
    fld = q_bm25f_topk(SF).to_pandas()
    # same queries produce results; scores must differ somewhere
    assert set(base.query_id) == set(fld.query_id)
    merged = base.merge(fld, on=["query_id", "rank"], suffixes=("_b", "_f"))
    assert (merged.score_b != merged.score_f).any()
    for qid, sub in fld.groupby("query_id"):
        sub = sub.sort_values("rank")
        s = sub.score.to_numpy(np.int64)
        d = sub.doc_id.to_numpy(np.int64)
        assert all((s[i] > s[i + 1]) or (s[i] == s[i + 1] and d[i] < d[i + 1])
                   for i in range(len(s) - 1))


def test_result_cache_lineage_invalidation(ray_session, tmp_path):
    """CachedEngine over a real LSM index: (a) fill then hit without an
    engine; (b) a delta generation changes the lineage digest so the
    same query MISSES and returns the updated results; (c) compaction
    changes it again but results stay equal to the post-delta truth."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines.build import build_index
    from candidategeneration_ray.pipelines.update import (
        compact_index, serving_sources, update_index)
    from candidategeneration_ray.sources.transcripts import (
        generate_transcripts, write_transcripts)
    from candidategeneration_ray.state.resultcache import CachedEngine, index_digest

    src = write_transcripts(str(tmp_path / "tr"), num_convs=60, seed=11)
    out = str(tmp_path / "idx")
    res = build_index(src, out, partitions=2)
    root = str(tmp_path / "cache")
    q = "query engine latency"

    fill = CachedEngine(res["final_dir"], res["stats"], root)
    base = fill.topk(q, k=5)
    assert (fill.misses, fill.hits) == (1, 0)

    def _boom():
        raise AssertionError("hit path constructed an engine")
    hit = CachedEngine(res["final_dir"], res["stats"], root, engine_factory=_boom)
    assert hit.topk(q, k=5) == base and hit.hits == 1
    # different k = different key (cold), so the factory must fire
    try:
        hit.topk(q, k=3)
        raise AssertionError("expected engine construction for new k")
    except AssertionError as e:
        assert "hit path" in str(e)

    # delta: new conversations under a fresh prefix
    t = generate_transcripts(10, seed=23)
    t = t.set_column(
        t.schema.get_field_index("conv_id"), "conv_id",
        pc.binary_join_element_wise(
            pa.array(["zd"] * len(t)), t.column("conv_id"), "-"))
    os.makedirs(str(tmp_path / "delta"), exist_ok=True)
    pq.write_table(t, str(tmp_path / "delta" / "p0.parquet"))
    upd = update_index(out, str(tmp_path / "delta"))
    assert index_digest(upd["sources"]) != index_digest(res["final_dir"])

    upd_eng = CachedEngine(upd["sources"], upd["stats"], root)
    post = upd_eng.topk(q, k=5)
    assert upd_eng.misses == 1  # new lineage -> cold key
    compact_index(out)
    comp = CachedEngine(serving_sources(out), upd["stats"], root)
    assert comp.topk(q, k=5) == post and comp.misses == 1


class TestHardNegatives:
    def test_triple_structure(self, ray_session):
        from candidategeneration_ray.pipelines.docquery import (
            q_bm25_topk, q_hard_negatives)

        sf = "/root/testdata/sf0.01"
        got = q_hard_negatives(sf).to_pandas()
        assert len(got) > 0
        # same ranking => pos always scores >= neg
        assert (got["margin"] >= 0).all()
        assert (got["pos_rank"] <= 3).all()
        assert got["neg_rank"].between(11, 20).all()
        # positives agree with the exact top-k entry's top-3
        top = q_bm25_topk(sf).to_pandas()
        for qid, grp in got.groupby("query_id"):
            want_pos = set(top[(top.query_id == qid) & (top["rank"] <= 3)]
                           ["doc_id"])
            assert set(grp["pos_doc_id"]) <= want_pos
            # a doc is never both positive and negative for one query
            assert not (set(grp["pos_doc_id"]) & set(grp["neg_doc_id"]))


class TestPassageMaxP:
    def test_best_passage_beats_length(self, ray_session, tmp_path):
        """A doc whose FIRST 32-token chunk is identical to a short
        relevant doc ties it on best-passage score no matter how much
        unrelated tail follows — the MaxP property (doc-level BM25
        would bury the long doc under its dl penalty)."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from candidategeneration_ray.pipelines.docquery import (
            q_passage_bm25_topk)

        chunk = ["batch"] * 4 + [f"filler{chr(97 + i)}x" for i in range(28)]
        tail = [f"noise{chr(97 + i // 26)}{chr(97 + i % 26)}"
                for i in range(320)]
        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([
                " ".join(chunk),                  # short relevant doc
                " ".join(chunk + tail),           # same best passage + tail
                " ".join(tail[:64]),              # irrelevant
            ], pa.string()),
        })
        d = str(tmp_path)
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = q_passage_bm25_topk(d).to_pandas()
        g5 = got[got.query_id == 5].sort_values("rank")   # query "batch"
        assert g5["doc_id"].tolist()[:2] == [0, 1]
        s = g5.set_index("doc_id")["score"]
        assert s[0] == s[1]                      # identical best passages tie
        assert 2 not in set(g5["doc_id"])        # no query term, no score

    def test_chunk_packing_failfast(self, ray_session, tmp_path):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest

        from candidategeneration_ray.pipelines.docquery import build_chunk_index

        toks = [f"w{chr(97 + i % 26)}{chr(97 + (i // 26) % 26)}"
                f"{chr(97 + (i // 676) % 26)}" for i in range(1024 * 32 + 32)]
        t = pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array([" ".join(toks)], pa.string()),
        })
        d = str(tmp_path)
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        with pytest.raises(Exception, match="packing overflow"):
            build_chunk_index(d)


class TestLtrRerankAndAgreement:
    def test_rerank_is_pool_permutation(self, ray_session):
        from candidategeneration_ray.pipelines.docquery import (
            LTR_WEIGHTS, q_ltr_features, q_ltr_rerank_topk)

        sf = "/root/testdata/sf0.01"
        feat = q_ltr_features(sf).to_pandas()
        got = q_ltr_rerank_topk(sf).to_pandas()
        for qid, grp in got.groupby("query_id"):
            pool = feat[feat.query_id == qid]
            # reranked docs come from the feature pool
            assert set(grp["doc_id"]) <= set(pool["doc_id"])
            # scores recompute from the weight vector
            fs = pool.set_index("doc_id")
            for _, r in grp.iterrows():
                want = sum(w * int(fs.loc[r["doc_id"], c])
                           for c, w in LTR_WEIGHTS.items())
                assert r["ltr_score"] == want
            s = grp.sort_values("rank")["ltr_score"].to_numpy()
            assert (np.diff(s) <= 0).all()

    def test_agreement_monotone_and_bounded(self, ray_session):
        from candidategeneration_ray.pipelines.docquery import (
            q_ranking_agreement)

        got = q_ranking_agreement("/root/testdata/sf0.01").to_pandas()
        for qid, grp in got.groupby("query_id"):
            g = grp.sort_values("depth")
            n = g["n_common"].to_numpy()
            d = g["depth"].to_numpy()
            assert (n <= d).all()
            assert (np.diff(n) >= 0).all()     # prefix intersection grows


class TestQppAndPooling:
    def test_qpp_invariants(self, ray_session):
        from candidategeneration_ray.pipelines.docquery import (
            q_query_difficulty)

        got = q_query_difficulty("/root/testdata/sf0.01").to_pandas()
        assert len(got) > 0
        assert (got["min_df"] <= got["max_df"]).all()
        assert (got["scope"] >= got["max_df"]).all()   # union >= largest list
        assert (got["topk_n"] <= 10).all()
        # Cauchy-Schwarz: n*ss >= sum^2 (variance nonneg)
        n, s, ss = (got["topk_n"].astype(object), got["score_sum"].astype(object),
                    got["score_ss"].astype(object))
        assert ((n * ss - s * s) >= 0).all()

    def test_pool_union_semantics(self, ray_session):
        from candidategeneration_ray.pipelines.docquery import (
            q_bm25_topk, q_judgment_pool)

        sf = "/root/testdata/sf0.01"
        pool = q_judgment_pool(sf).to_pandas()
        assert pool["n_systems"].between(1, 4).all()
        bm = q_bm25_topk(sf).to_pandas()
        bm_pairs = set(zip(bm["query_id"], bm["doc_id"]))
        pool_pairs = set(zip(pool["query_id"], pool["doc_id"]))
        assert bm_pairs <= pool_pairs          # every system's top-10 pooled
        assert (pool["n_systems"] >= 3).any()  # cross-system consensus exists


class _FakeReader:
    """Dict-backed IndexReader stand-in for the TA property test:
    provides exactly the surface ta_impact_topk touches."""

    def __init__(self, lists):
        # lists: {tid: (docs int64 asc, scores int32)}
        self._lists = {}
        for tid, (d, s) in lists.items():
            d = np.asarray(d, np.int64)
            s = np.asarray(s, np.int32)
            bs = 4
            nb = (d.size + bs - 1) // bs
            bmax = np.array([s[i*bs:(i+1)*bs].max() for i in range(nb)],
                            np.int32)
            blast = np.array([d[min((i+1)*bs, d.size)-1]
                              for i in range(nb)], np.int64)
            self._lists[tid] = (d, s, bmax, blast)
        self._impact = {}

    def get(self, tid):
        return self._lists.get(tid)

    def impact_order(self, tid):
        d, s, _, _ = self._lists[tid]
        return np.lexsort((d, -s.astype(np.int64))).astype(np.int32)

    def dense_view(self, tid):
        return None   # force the searchsorted probe path


def test_ta_impact_property_random_lists():
    """ta_impact == brute-force TAAT on randomized signed lists with
    heavy ties — positive, negative, and mixed regimes, several k."""
    from candidategeneration_ray.state.queryengine import ta_impact_topk

    rng = np.random.default_rng(7)
    for trial in range(40):
        n_lists = int(rng.integers(1, 5))
        lists = {}
        for t in range(n_lists):
            m = int(rng.integers(1, 400))
            docs = np.sort(rng.choice(2000, size=m, replace=False))
            regime = trial % 3
            if regime == 0:      # all positive
                scores = rng.integers(1, 20, m)
            elif regime == 1:    # all non-positive (the TA target mix)
                scores = -rng.integers(0, 20, m)
            else:                # signed mix
                scores = rng.integers(-15, 15, m)
            lists[t + 1] = (docs, scores.astype(np.int32))
        reader = _FakeReader(lists)
        # brute force totals
        acc = {}
        for d, s, _, _ in reader._lists.values():
            for dd, ss in zip(d, s):
                acc[int(dd)] = acc.get(int(dd), 0) + int(ss)
        want_order = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        for k in (1, 3, 10, 57):
            got = ta_impact_topk(reader, list(lists), k)
            want = [(s, d) for d, s in want_order[:k]]
            assert got == want, (trial, k)


def test_taat_dense_equals_sparse_paths(monkeypatch):
    """The bincount scatter-add TAAT merge must equal the sort-merge
    fallback exactly (float64 accumulation exactness bound) across
    random signed lists; the fallback is forced via the dense cap."""
    import candidategeneration_ray.state.queryengine as qe

    rng = np.random.default_rng(13)
    for trial in range(25):
        lists = {}
        for t in range(int(rng.integers(2, 5))):
            m = int(rng.integers(1, 300))
            docs = np.sort(rng.choice(5000, size=m, replace=False))
            scores = rng.integers(-(2**30), 2**30, m).astype(np.int32)
            lists[t + 1] = (docs, scores)
        reader = _FakeReader(lists)
        for k in (1, 5, 40):
            dense = qe.taat_topk(reader, list(lists), k)
            monkeypatch.setattr(qe, "TAAT_DENSE_MAX_DOC", -1)
            sparse = qe.taat_topk(reader, list(lists), k)
            monkeypatch.setattr(qe, "TAAT_DENSE_MAX_DOC", 1 << 26)
            assert dense == sparse, (trial, k)
