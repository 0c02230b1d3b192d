"""Corpus-LM / retrieval / mixture operators (pipelines/textlm.py):
kernel identities and semantic invariants at sf0.001. The sf0.01
oracle-identity check for all six entries runs in test_driver_contract."""

import numpy as np
import pytest

from candidategeneration_ray.functions.tokenize import tokenize_many
from candidategeneration_ray.pipelines import textlm as tl

SF_DIR = "/root/testdata/sf0.001"


def test_packed_doc_terms_matches_per_doc_sets():
    lists = [["b", "a", "b", "c"], [], ["a"], ["z", "z", "z"]]
    lens, u, doc_g, term_g, tf_g = tl._packed_doc_terms(lists)
    assert lens.tolist() == [4, 0, 1, 3]
    got = {}
    for d, t, f in zip(doc_g, term_g, tf_g):
        got.setdefault(int(d), {})[u[t]] = int(f)
    want = {i: dict(zip(*np.unique(np.asarray(t, object), return_counts=True)))
            for i, t in enumerate(lists) if t}
    want = {i: {k: int(v) for k, v in m.items()} for i, m in want.items()}
    assert got == want


def test_packed_doc_terms_empty_batch():
    lens, u, doc_g, term_g, tf_g = tl._packed_doc_terms([[], []])
    assert lens.tolist() == [0, 0] and u.size == 0 and doc_g.size == 0


def test_decontaminate_never_flags_bench_docs(ray_session):
    out = tl.q_decontaminate(SF_DIR).to_pandas()
    assert len(out) > 0
    assert (out["doc_id"] % tl.BENCH_MOD != 0).all()
    assert (out["n_overlap"] >= 1).all()


def test_lm_bigram_scores_split_and_bounds(ray_session):
    from candidategeneration_ray.functions import hashing as H

    out = tl.q_lm_bigram_scores(SF_DIR).to_pandas()
    assert len(out) > 0
    hs = H.h64_many([str(i) for i in out["doc_id"].tolist()])
    assert (hs % np.uint64(100) >= tl.TRAIN_PCT).all()  # val docs only
    assert (out["n_known"] <= out["n_bigrams"]).all()
    assert (out["cnt_sum"] >= out["n_known"]).all()  # every LM count >= 1
    assert (out["n_bigrams"] >= 1).all()


def test_bool_and_docs_matches_direct_scan(ray_session):
    import pyarrow.parquet as pq

    out = tl.q_bool_and_docs(SF_DIR).to_pandas()
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    toks = {int(d): set(t) for d, t in zip(
        docs.column("doc_id").to_pylist(),
        tokenize_many(docs.column("text").to_pylist()))}
    from candidategeneration_ray.functions.tokenize import tokenize_text
    from candidategeneration_ray.pipelines.docquery import DOC_QUERIES

    want = []
    for qid, text in DOC_QUERIES:
        terms = set(tokenize_text(text))
        if not terms:
            continue
        if not all(any(t in s for s in toks.values()) for t in terms):
            continue
        for d, s in toks.items():
            if terms <= s:
                want.append((qid, d))
    got = sorted(zip(out["query_id"].tolist(), out["doc_id"].tolist()))
    assert got == sorted(want)
    assert 3 not in {q for q, _ in got}  # stopword-only query vanishes


def test_mixture_select_respects_budget(ray_session):
    budget = 400
    out = tl.q_mixture_select(SF_DIR, budget=budget).to_pandas()
    assert len(out) > 0
    assert (out.groupby("source")["cum_tokens"].max() <= budget).all()
    # cum_tokens strictly increases along each source's selection order
    for _, g in out.groupby("source"):
        cums = np.sort(g["cum_tokens"].to_numpy())
        assert (np.diff(cums) > 0).all()


def test_tfidf_at_most_k_rows_per_doc(ray_session):
    out = tl.q_tfidf_top3(SF_DIR).to_pandas()
    assert len(out) > 0
    assert out.groupby("doc_id").size().max() <= 3
    assert (out["score"] >= 0).all()
    # within a doc, rows ordered by score desc break ties by term asc
    for _, g in out.groupby("doc_id"):
        rows = list(zip(-g["score"].to_numpy(), g["term"].tolist()))
        assert rows == sorted(rows)


def test_pmi_scores_monotone_and_bounded(ray_session):
    out = tl.q_pmi_top50(SF_DIR).to_pandas()
    assert 0 < len(out) <= 50
    assert (out["c_ab"] >= 5).all()
    rows = list(zip(-out["score"].to_numpy(), out["bigram"].tolist()))
    assert rows == sorted(rows)


def test_source_quantile_filter_drops_short_tail(ray_session):
    from candidategeneration_ray.pipelines import sketches as sk

    out = sk.q_source_quantile_filter(SF_DIR).to_pandas()
    assert len(out) > 0
    assert (out["n_chars"] // sk.HIST_BIN_WIDTH >= out["thr_bin"]).all()
    # each source keeps at most ~75% + one bin's worth of its docs
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["source"]).to_pandas()
    tot = docs.groupby("source").size()
    kept = out.groupby("source").size()
    assert (kept <= tot[kept.index]).all()
    assert kept.sum() < len(docs)  # something was dropped


def test_pretrain_select_stage_semantics(ray_session):
    """Every selected doc passes quality, is not benchmark, is not
    contaminated, has a unique text among selections, and each source
    stays within budget."""
    from candidategeneration_ray.pipelines import extras as ex
    import pyarrow.parquet as pq

    sel = tl.q_pretrain_select(SF_DIR).to_pandas()
    assert len(sel) > 0
    assert (sel.groupby("source")["cum_tokens"].max() <= 400).all()
    assert (sel["doc_id"] % tl.BENCH_MOD != 0).all()
    contaminated = set(tl.q_decontaminate(SF_DIR).to_pandas()["doc_id"])
    assert not (set(sel["doc_id"]) & contaminated)
    qual = ex.q_quality_filter(SF_DIR).to_pandas()
    ok = set(qual[qual["keep"] == 1]["doc_id"])
    assert set(sel["doc_id"]) <= ok
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    texts = docs.set_index("doc_id")["text"]
    assert texts[sel["doc_id"]].is_unique


def test_write_pretrain_corpus_roundtrip_and_resume(ray_session, tmp_path):
    import pyarrow.dataset as pads

    out = str(tmp_path / "corpus")
    r1 = tl.write_pretrain_corpus(SF_DIR, out)
    assert not r1["skipped"] and r1["n_docs"] > 0
    sel = tl.q_pretrain_select(SF_DIR).to_pandas()
    written = pads.dataset(out, format="parquet", partitioning="hive",
                           exclude_invalid_files=True).to_table()
    assert written.num_rows == len(sel) == r1["n_docs"]
    assert set(written.column("doc_id").to_pylist()) == set(sel["doc_id"])
    # one hive directory per source
    import os as _os
    srcs = {d for d in _os.listdir(out) if d.startswith("source=")}
    assert len(srcs) == sel["source"].nunique()
    # second call resumes via the manifest
    r2 = tl.write_pretrain_corpus(SF_DIR, out)
    assert r2["skipped"] and r2["n_docs"] == r1["n_docs"]


def test_token_offsets_contiguous_and_block_invariant(ray_session):
    """Offsets tile the token stream exactly (each doc starts where the
    previous ends, in doc_id order), seq ids match the arithmetic, and
    the result is block-count independent."""
    import numpy as np

    from candidategeneration_ray.pipelines import textlm as tl

    sf = "/root/testdata/sf0.001"
    got = tl.q_token_offsets(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    n = got["n_tokens"].to_numpy()
    start = got["token_start"].to_numpy()
    assert start[0] == 0
    assert (start[1:] == start[:-1] + n[:-1]).all()
    assert (n >= 1).all()
    L = tl.SEQ_LEN
    assert (got["seq_first"] == start // L).all()
    assert (got["seq_last"] == (start + n - 1) // L).all()

    other = tl.q_token_offsets(sf, num_blocks=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert other.equals(got)


def test_sequence_manifest_conservation(ray_session):
    """Sequence manifests conserve tokens: Σ n_tokens == corpus kept
    tokens, every non-final sequence is exactly full, seq ids are the
    dense range, and doc spans nest (first_doc <= last_doc)."""
    import pyarrow.parquet as pq

    df = tl.q_sequence_manifest(SF_DIR).to_pandas().sort_values("seq_id")
    texts = pq.read_table(SF_DIR + "/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    total = sum(len(t) for t in tokenize_many(texts))
    assert int(df["n_tokens"].sum()) == total
    assert df["seq_id"].tolist() == list(range(len(df)))
    assert (df["n_tokens"].iloc[:-1] == tl.SEQ_LEN).all()
    assert 0 < int(df["n_tokens"].iloc[-1]) <= tl.SEQ_LEN
    assert (df["first_doc"] <= df["last_doc"]).all()


class TestBpe:
    def test_matches_reference_trainer(self, ray_session, tmp_path):
        """Distributed BPE equals a textbook in-memory trainer on a
        fixture with overlapping repeats (aaaa), count ties, and
        multi-char merge chains."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from candidategeneration_ray.pipelines.textlm import (
            q_bpe_merges, q_bpe_segmented)

        texts = ["aaaa aaaa banana bandana", "banana banana anna",
                 "aaaa banana", "anna bandana banana aaaa"]
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }), str(tmp_path / "documents.parquet"))

        from candidategeneration_ray.functions.tokenize import tokenize_many
        from collections import Counter
        vocab = Counter(t for ts in tokenize_many(texts) for t in ts)
        state = {w: list(w) for w in vocab}
        want = []
        for step in range(6):
            pairs = Counter()
            for w, syms in state.items():
                for a, b in zip(syms, syms[1:]):
                    pairs[(a, b)] += vocab[w]
            if not pairs:
                break
            (l, r), n = sorted(pairs.items(),
                               key=lambda t: (-t[1], t[0]))[0]
            want.append((step, l, r, n))
            for w, syms in state.items():
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == l
                            and syms[i + 1] == r):
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                state[w] = out

        got = q_bpe_merges(str(tmp_path)).to_pandas()
        assert [tuple(r) for r in
                got[["step", "left", "right", "pair_n"]].itertuples(
                    index=False)] == want
        seg = q_bpe_segmented(str(tmp_path)).to_pandas()
        assert {r.word: r.segmented for r in seg.itertuples()} \
            == {w: " ".join(s) for w, s in state.items()}
        assert (seg["freq"].to_numpy()
                == [vocab[w] for w in seg["word"]]).all()


def test_percolate_equals_bool_and(ray_session):
    """Ingest-time percolation (streamed docs vs broadcast stored
    queries, no index) returns exactly the index-side conjunctive-AND
    result set at sf0.001."""
    import pandas as pd

    from candidategeneration_ray.pipelines import textlm as tl

    sf = "/root/testdata/sf0.001"
    a = tl.q_percolate_matches(sf).to_pandas()
    b = tl.q_bool_and_docs(sf).to_pandas()
    key = ["query_id", "doc_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a[key], b[key])


class TestSetCoverSelect:
    def _brute(self, sf_dir: str, k: int):
        import pyarrow.parquet as pq

        from candidategeneration_ray.functions import hashing as H

        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
        ids = np.array(t["doc_id"], np.int64)
        toks = tokenize_many(t["text"].to_pylist())
        sh = [set(H.h64_many(H.word_shingles(tk, tl.DECON_W)).tolist())
              for tk in toks]
        bench = set().union(*(s for i, s in zip(ids, sh)
                              if i % tl.BENCH_MOD == 0))
        cand = {int(i): s & bench for i, s in zip(ids, sh)
                if i % tl.BENCH_MOD != 0}
        covered: set = set()
        out = []
        for r in range(1, k + 1):
            gains = {d: len(s - covered) for d, s in cand.items()}
            d = min(gains, key=lambda d: (-gains[d], d))
            if gains[d] == 0:
                break
            covered |= cand[d]
            out.append((r, d, gains[d], len(covered)))
            del cand[d]
        return out

    def test_matches_bruteforce(self, ray_session):
        sf = "/root/testdata/sf0.001"
        want = self._brute(sf, tl.SETCOVER_K)
        got = tl.q_set_cover_select(sf).to_pandas()
        assert [tuple(r) for r in got.itertuples(index=False)] == want
        # greedy gains are non-increasing
        g = got["gain"].to_numpy()
        assert (np.diff(g) <= 0).all()

    def test_early_stop_when_universe_exhausted(self, ray_session, tmp_path):
        """One candidate doc covers the whole benchmark; selection must
        stop after it (no zero-gain rows)."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        bench_text = " ".join(f"bench{chr(97 + i)}x" for i in range(8))
        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),   # 0 = benchmark
            "text": pa.array([
                bench_text,
                bench_text + " extra tail tokens here",  # covers everything
                bench_text,                              # same cover, later id
            ], pa.string()),
        })
        d = str(tmp_path)
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = tl.q_set_cover_select(d).to_pandas()
        assert len(got) == 1
        assert got.loc[0, "doc_id"] == 1
        assert got.loc[0, "gain"] == got.loc[0, "covered_total"]
