"""Session-13 operators: brute-force / property coverage."""

import numpy as np
import pandas as pd
import pytest

from candidategeneration_ray.pipelines import clustering as cl

SF = "/root/testdata/sf0.001"


def test_adamic_adar_brute_force(ray_session):
    """Top pairs equal a numpy recomputation over the exact kNN edge
    set: integer LUT weights, non-adjacency, and the tie-break order."""
    got = cl.q_adamic_adar(SF).to_pandas()
    edges = cl._knn_undirected_edges(SF).to_pandas()
    adj = {}
    for u, v in zip(edges["u"], edges["v"]):
        adj.setdefault(int(u), set()).add(int(v))
        adj.setdefault(int(v), set()).add(int(u))
    eset = {(int(u), int(v)) for u, v in zip(edges["u"], edges["v"])}
    lut = np.zeros(cl.AA_DEG_CAP + 1, dtype=np.int64)
    lut[2:] = np.asarray(cl.aa_weight_lut(), dtype=np.int64)
    from collections import defaultdict

    score = defaultdict(int)
    count = defaultdict(int)
    for z, nbrs in adj.items():
        w = int(lut[min(len(nbrs), cl.AA_DEG_CAP)])
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                score[p] += w
                count[p] += 1
    cand = [(s, u, v, count[(u, v)])
            for (u, v), s in score.items() if (u, v) not in eset]
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [(u, v, n, s) for s, u, v, n in cand[:cl.AA_TOPK]]
    assert [(int(r.u), int(r.v), int(r.n_common), int(r.aa_score))
            for r in got.itertuples()] == want


def test_aa_weight_lut_monotone():
    """Weights strictly decrease over the LUT domain and stay positive
    (1/ln is monotone; the fixed-point scale preserves that)."""
    w = cl.aa_weight_lut()
    assert len(w) == cl.AA_DEG_CAP - 1
    assert all(a > b for a, b in zip(w, w[1:]))
    assert w[-1] > 0


def test_winnow_coverage_guarantee(ray_session):
    """The winnowing invariant: selected positions cover every
    WINNOW_W-window of the k-gram sequence (max gap <= W), so any
    shared run of K+W-1 words is caught by a shared fingerprint."""
    from candidategeneration_ray.functions import hashing as H
    from candidategeneration_ray.functions.tokenize import tokenize_many
    from candidategeneration_ray.pipelines import extras as ex
    import pyarrow.parquet as pq

    fps = ex.q_winnow_fingerprints(SF).to_pandas()
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    toks = tokenize_many(docs["text"].tolist())
    n_kgrams = {int(d): len(H.word_shingles(t, ex.WINNOW_K))
                for d, t in zip(docs["doc_id"], toks)}
    for doc_id, grp in fps.groupby("doc_id"):
        ps = sorted(grp["pos"].tolist())
        n = n_kgrams[int(doc_id)]
        assert ps[0] <= ex.WINNOW_W
        assert all(b - a <= ex.WINNOW_W for a, b in zip(ps, ps[1:]))
        assert n - ps[-1] <= ex.WINNOW_W - 1


def test_winnow_shared_span_is_caught():
    """Two token streams sharing a run of K+W-1 words share at least
    one fingerprint HASH — the winnowing guarantee, on synthetic docs
    with different surrounding context."""
    from candidategeneration_ray.functions import hashing as H
    from candidategeneration_ray.pipelines import extras as ex

    span = [f"shared{i}" for i in range(ex.WINNOW_K + ex.WINNOW_W - 1)]
    doc_a = [f"alpha{i}" for i in range(37)] + span + ["tail0", "tail1"]
    doc_b = ["zeta0"] + span + [f"omega{i}" for i in range(23)]

    def fps(toks):
        return {h for _, h in ex.winnow_select(
            H.h64_many(H.word_shingles(toks, ex.WINNOW_K)))}

    span_hashes = {int(h) for h in
                   H.h64_many(H.word_shingles(span, ex.WINNOW_K))}
    shared = fps(doc_a) & fps(doc_b) & span_hashes
    assert shared, "shared K+W-1 run must yield a common fingerprint"


class TestKMV:
    def _truth(self):
        import pyarrow.parquet as pq
        from candidategeneration_ray.functions.tokenize import tokenize_many

        docs = pq.read_table(SF + "/documents.parquet",
                             columns=["text", "source"]).to_pandas()
        toks = tokenize_many(docs["text"].tolist())
        per_src = {}
        for s, t in zip(docs["source"], toks):
            per_src.setdefault(s, set()).update(t)
        return per_src

    def test_overlap_estimates_within_bounds(self, ray_session):
        """KMV union/intersection estimates land within 5 relative
        standard errors (rse ~ 1/sqrt(k-1)) of the exact counts."""
        from candidategeneration_ray.pipelines import sketches as sk

        got = sk.q_kmv_source_overlap(SF).to_pandas()
        per_src = self._truth()
        rse = 5.0 / np.sqrt(sk.KMV_K - 1)
        assert len(got) == len(per_src) * (len(per_src) - 1) // 2
        for r in got.itertuples():
            a, b = per_src[r.src_a], per_src[r.src_b]
            true_union = len(a | b)
            true_inter = len(a & b)
            assert abs(r.union_est - true_union) <= max(
                rse * true_union, 2), (r.src_a, r.src_b)
            assert abs(r.inter_est - true_inter) <= max(
                rse * true_union, 2), (r.src_a, r.src_b)

    def test_registers_are_global_bottom_k(self, ray_session):
        from candidategeneration_ray.functions import hashing as H
        from candidategeneration_ray.pipelines import sketches as sk

        got = sk.q_kmv_registers(SF).to_pandas()
        per_src = self._truth()
        allh = np.unique(H.h64_many(
            sorted(set().union(*per_src.values()))))
        want = allh[:sk.KMV_K]
        got_u = np.asarray(
            [v + (1 << 64) if v < 0 else v for v in got["kmv_hash"]],
            dtype=np.uint64)
        assert got["rank"].tolist() == list(range(1, len(want) + 1))
        assert (got_u == want).all()


def test_scd2_join_brute_force(ray_session):
    """Point-in-time join equals a per-user Python replay: last version
    chain value at or before each purchase ts, -1 before the first."""
    import re

    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines import events as ev

    got = ev.q_scd2_join(SF).to_pandas().sort_values("event_id")
    raw = pq.read_table(SF + "/events.parquet").to_pandas()
    raw["ts_us"] = raw["ts"].astype("int64")
    chains = {}
    ch = raw[raw["event_type"] == ev.SCD2_TYPE].sort_values(
        ["user_id", "ts_us", "event_id"])
    for r in ch.itertuples():
        seg = int(re.search(r'"k":\s*(-?\d+)', r.props).group(1))
        c = chains.setdefault(int(r.user_id), [])
        if not c or c[-1][1] != seg:
            c.append((int(r.ts_us), seg))
    want = {}
    for r in raw[raw["event_type"] == "purchase"].itertuples():
        seg = -1
        for f, s in chains.get(int(r.user_id), []):
            if f <= int(r.ts_us):
                seg = s
        want[int(r.event_id)] = seg
    assert len(got) == len(want)
    for r in got.itertuples():
        assert int(r.segment) == want[int(r.event_id)], int(r.event_id)
    assert (got["segment"] == -1).any(), "fixture should have pre-chain buys"


def test_ntile_of_rank_matches_sql_rule():
    """_ntile_of_rank equals the SQL NTILE rule (bucket sizes differ by
    at most one, larger buckets first) for a sweep of (n, k)."""
    from candidategeneration_ray.pipelines.events import _ntile_of_rank

    for n in (1, 2, 3, 4, 5, 7, 8, 9, 100, 101, 103):
        for k in (1, 2, 3, 4, 5):
            ranks = np.arange(1, n + 1, dtype=np.int64)
            got = _ntile_of_rank(ranks, n, k)
            # reference: assign round-robin bucket sizes then expand
            q, r = divmod(n, k)
            sizes = [(q + 1 if b < r else q) for b in range(k)]
            want = np.repeat(np.arange(1, k + 1), sizes)[:n]
            assert (got == want).all(), (n, k)


def test_rfm_block_count_invariance(ray_session):
    """RFM output is identical under different prefix block counts."""
    from candidategeneration_ray.pipelines import events as ev

    a = (ev.q_rfm_segments(SF, num_blocks=3).to_pandas()
         .sort_values("user_id").reset_index(drop=True))
    b = (ev.q_rfm_segments(SF, num_blocks=16).to_pandas()
         .sort_values("user_id").reset_index(drop=True))
    assert a.equals(b)
    assert set(a["r_score"]) <= {1, 2, 3, 4}
    # quartiles are balanced: counts differ by at most one
    for col in ("r_score", "f_score", "m_score"):
        counts = a[col].value_counts()
        assert counts.max() - counts.min() <= 1


def test_maxsim_brute_force(ray_session):
    """MaxSim top-10 equals a single-process numpy replay: per query
    token, max dot over each doc's distinct token vectors, relu, sum."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.functions.tokenize import (
        tokenize_many, tokenize_text)
    from candidategeneration_ray.pipelines import extras as ex
    from candidategeneration_ray.pipelines.docquery import DOC_QUERIES

    got = ex.q_maxsim_top10(SF).to_pandas()
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    toks = tokenize_many(docs["text"].tolist())
    want_rows = []
    for qid, text in DOC_QUERIES:
        qt = sorted(set(tokenize_text(text)))
        if not qt:
            continue
        qv = ex._token_slot_vecs(qt)
        scored = []
        for d, tl in zip(docs["doc_id"], toks):
            dt = sorted(set(tl))
            if not dt:
                continue
            dv = ex._token_slot_vecs(dt)
            m = (qv @ dv.T).max(axis=1)
            s = int(np.maximum(m, 0).sum())
            if s > 0:
                scored.append((int(d), s))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (d, s) in enumerate(scored[:10], 1):
            want_rows.append((int(qid), rank, d, s))
    got_rows = [(int(r.query_id), int(r.rank), int(r.doc_id), int(r.score))
                for r in got.itertuples()]
    assert got_rows == want_rows


def test_decision_stump_brute_force(ray_session):
    """Per-feature best split equals an O(n log n) single-process scan,
    and the chosen errors beat (or tie) every other threshold."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.functions.tokenize import tokenize_many
    from candidategeneration_ray.pipelines import extras as ex

    got = ex.q_decision_stump(SF).to_pandas().set_index("feature")
    docs = pq.read_table(SF + "/documents.parquet").to_pandas()
    toks = tokenize_many(docs["text"].tolist())
    y = (docs["lang"] == "en").to_numpy().astype(np.int64)
    feats = {
        "n_chars": docs["n_chars"].to_numpy().astype(np.int64),
        "n_tokens": np.asarray([len(t) for t in toks], np.int64),
        "n_types": np.asarray([len(set(t)) for t in toks], np.int64),
    }
    assert list(got.index) == sorted(ex.STUMP_FEATURES)
    for name, x in feats.items():
        best = (10**9, None)
        for t in np.unique(x):
            left, right = y[x <= t], y[x > t]
            e = (min(left.sum(), len(left) - left.sum())
                 + min(right.sum(), len(right) - right.sum()))
            if e < best[0]:
                best = (int(e), int(t))
        r = got.loc[name]
        assert (int(r.n_errors), int(r.threshold)) == best, name
        left, right = y[x <= r.threshold], y[x > r.threshold]
        assert int(r.left_label) == (
            1 if left.sum() > len(left) - left.sum() else 0)
        assert int(r.right_label) == (
            1 if right.sum() > len(right) - right.sum() else 0)


def test_svs_intersect_property():
    """_svs_intersect equals np.intersect1d on random sorted sets,
    including empty and disjoint cases."""
    from candidategeneration_ray.pipelines.textlm import _svs_intersect

    rng = np.random.default_rng(13)
    for _ in range(50):
        a = np.unique(rng.integers(0, 200, rng.integers(0, 40)))
        b = np.unique(rng.integers(0, 200, rng.integers(0, 400)))
        want = np.intersect1d(a, b)
        assert (_svs_intersect(a, b) == want).all()
        assert (_svs_intersect(b, a) == want).all()


def test_readability_known_values():
    """Hand-checked Flesch rational on tiny fixtures."""
    from candidategeneration_ray.pipelines import extras as ex
    import pyarrow as pa

    # reuse the kernel through a fake batch by calling the pipeline's
    # inner map via q_readability over sf data is covered by the
    # contract; here check the formula algebra on a known case:
    # "the cat sat." -> w=3, s=1, syllables=3
    w, s, y = 3, 1, 3
    num = 206835 * s * w - 1015 * w * w - 84600 * y * s
    den = 1000 * s * w
    # F = 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert abs(num / den - 119.19) < 1e-9


def test_item_cosine_threshold_soundness(ray_session):
    """Every emitted pair clears the cross-multiplied cosine² bound and
    its counts match a pandas recomputation from raw lineitem."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines import relational as rl

    got = rl.q_item_cosine_pairs(SF).to_pandas()
    assert (8 * got["n_orders"] ** 2 >= got["sup_a"] * got["sup_b"]).all()
    li = pq.read_table(SF + "/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    op = li.drop_duplicates()
    sup = op.groupby("l_partkey").size()
    by_order = op.groupby("l_orderkey")["l_partkey"].apply(
        lambda s: sorted(set(s)))
    from collections import Counter

    pc_ = Counter()
    for parts in by_order:
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pc_[(parts[i], parts[j])] += 1
    want = sorted(
        (a, b, n, int(sup[a]), int(sup[b]))
        for (a, b), n in pc_.items()
        if n >= rl.RULE_MIN_SUPPORT and 8 * n * n >= sup[a] * sup[b])
    got_rows = sorted(zip(got["p1"], got["p2"], got["n_orders"],
                          got["sup_a"], got["sup_b"]))
    assert [tuple(map(int, r)) for r in got_rows] == want


def test_ta_early_termination_and_exactness(ray_session):
    """TA stops before scanning the whole static list (the point of the
    algorithm) and its top-10 equals a full-scan numpy recomputation."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.functions.tokenize import (
        tokenize_many, tokenize_text)
    from candidategeneration_ray.pipelines import docquery as dq

    got = dq.q_ta_fused_topk(SF).to_pandas()
    per_q = dq.q_ta_fused_topk.last_per_query
    # every query is within the exhaustive bound, and early termination
    # is REAL on at least a third of them (TA's worst case is a full
    # scan when the static attribute barely discriminates — some fixed
    # queries hit that; the wins are the point)
    assert all(p1 <= n1 and p2 <= n2 for _, p1, n1, p2, n2 in per_q)
    early = [q for q, _, _, p2, n2 in per_q if p2 < n2 // 4]
    assert len(early) * 3 >= len(per_q), per_q
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    # reuse the engine's own fluency kernel for truth
    import pyarrow as pa

    from candidategeneration_ray.pipelines.extras import _textstats

    ts = _textstats(pa.table({
        "doc_id": pa.array(docs["doc_id"], pa.int64()),
        "text": pa.array(docs["text"], pa.string())})).to_pandas()
    fl = {int(r.doc_id): (int(r.n_stop) * 1_000_000)
          // max(int(r.n_words), 1) for r in ts.itertuples()}
    # bm25 truth straight from the persisted per-term lists
    from candidategeneration_ray.config import EngineConfig
    from candidategeneration_ray.state.queryengine import IndexReader

    built = dq.build_documents_index(SF, EngineConfig(emit_pairs=False))
    reader = IndexReader(built["final_dir"], built["stats"])
    bm = {}
    for qid_, text in dq.DOC_QUERIES:
        for t in sorted(set(tokenize_text(text))):
            tid = reader.term_to_id.get(t)
            lst = reader.get(int(tid)) if tid is not None else None
            if lst is None:
                continue
            for d, s in zip(lst[0].tolist(), lst[1].tolist()):
                key = (int(qid_), int(d))
                bm[key] = bm.get(key, 0) + int(s)
    for qid, grp in got.groupby("query_id"):
        fused = {int(d): bm.get((int(qid), int(d)), 0)
                 + dq.TA_FLUENCY_W * fl[int(d)] for d in docs["doc_id"]}
        want = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:10]
        got_rows = [(int(r.doc_id), int(r.fused))
                    for r in grp.sort_values("rank").itertuples()]
        assert got_rows == want, qid


def test_haar_invariants(ray_session):
    """Perfect reconstruction (inverse transform returns the daily
    series) and Parseval-style energy accounting for the unnormalized
    Haar bank; approx row equals the type's total count."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines import events as ev

    got = ev.q_haar_daily(SF).to_pandas()
    raw = pq.read_table(SF + "/events.parquet",
                        columns=["ts", "event_type"]).to_pandas()
    raw["day"] = raw["ts"].astype("int64") // 86_400_000_000
    day0 = int(raw["day"].min())
    for et, grp in raw.groupby("event_type"):
        dense = np.zeros(ev.HAAR_N, np.int64)
        for d, n in grp.groupby("day").size().items():
            dense[int(d) - day0] = n
        g = got[got["event_type"] == et]
        assert int(g[g["level"] == ev.HAAR_LEVELS + 1]["coeff"].iloc[0]) \
            == int(dense.sum())
        # inverse transform: start from approx, apply details upward
        s = np.array([int(g[g["level"] == ev.HAAR_LEVELS + 1]
                          ["coeff"].iloc[0])], np.int64)
        for lvl in range(ev.HAAR_LEVELS, 0, -1):
            dd = (g[g["level"] == lvl].sort_values("idx")["coeff"]
                  .to_numpy(np.int64))
            a = (s + dd) // 2
            b = (s - dd) // 2
            assert ((s + dd) % 2 == 0).all()    # integers reconstruct
            nxt = np.empty(2 * s.size, np.int64)
            nxt[0::2] = a
            nxt[1::2] = b
            s = nxt
        assert (s == dense).all(), et


def test_selection_audit_consistency(ray_session):
    """The audit's 'selected' rows are exactly pretrain_select's
    survivors; every doc gets exactly one reason; reasons partition."""
    from candidategeneration_ray.pipelines import textlm as tl

    audit = tl.q_selection_audit(SF).to_pandas()
    sel = tl.q_pretrain_select(SF).to_pandas()
    assert audit["doc_id"].is_unique
    got_sel = set(audit[audit["reason"] == "selected"]["doc_id"])
    assert got_sel == set(sel["doc_id"])
    allowed = {"benchmark", "quality", "contaminated", "empty",
               "duplicate", "over_budget", "selected"}
    assert set(audit["reason"]) <= allowed
    # priority sanity: every benchmark doc is labeled benchmark
    assert (audit[audit["doc_id"] % tl.BENCH_MOD == 0]["reason"]
            == "benchmark").all()


def test_df_drift_brute_force(ray_session):
    """Top drift terms equal a pandas recomputation over the halves."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.functions.tokenize import tokenize_many
    from candidategeneration_ray.pipelines import extras as ex

    got = ex.q_df_drift(SF).to_pandas()
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    n = len(docs)
    n_a, n_b = n // 2, n - n // 2
    toks = tokenize_many(docs["text"].tolist())
    from collections import Counter

    da, db = Counter(), Counter()
    for d, tl in zip(docs["doc_id"], toks):
        for t in set(tl):
            (da if int(d) < n_a else db)[t] += 1
    vocab = set(da) | set(db)
    rows = sorted(
        ((abs(da[t] * n_b - db[t] * n_a), t, da[t], db[t]) for t in vocab),
        key=lambda r: (-r[0], r[1]))[:ex.DF_DRIFT_TOPK]
    want = [(t, a, b, dn) for dn, t, a, b in rows]
    assert [(r.tok, int(r.df_a), int(r.df_b), int(r.drift_num))
            for r in got.itertuples()] == want


def test_snm_window_soundness(ray_session):
    """Every emitted pair is within the window in the global sorted
    order of distinct names, its ed <= SNM_K, and the set equals a
    single-process window scan."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines import extras as ex

    got = ex.q_snm_pairs(SF).to_pandas()
    names = sorted(set(pq.read_table(
        SF + "/part.parquet", columns=["p_name"])["p_name"].to_pylist()))
    want = []
    for i, a in enumerate(names):
        for j in range(i + 1, min(i + ex.SNM_W, len(names))):
            b = names[j]
            ed = int(ex._ed_many([a], [b])[0])
            if ed <= ex.SNM_K:
                want.append((a, b, ed))
    got_rows = sorted((r.name_a, r.name_b, int(r.ed))
                      for r in got.itertuples())
    assert got_rows == sorted(want)
    assert len(got_rows) > 0


def test_walk_cooccurrence_brute_force(ray_session):
    """Deterministic walks replayed single-process: hash-chosen sorted
    neighbors, skip-gram window pairs, top-k order."""
    from collections import Counter

    from candidategeneration_ray.functions import hashing as H

    got = cl.q_walk_cooccurrence(SF).to_pandas()
    edges = cl._knn_undirected_edges(SF).to_pandas()
    adj = {}
    for u, v in zip(edges["u"], edges["v"]):
        adj.setdefault(int(u), []).append(int(v))
        adj.setdefault(int(v), []).append(int(u))
    adj = {k: sorted(vs) for k, vs in adj.items()}
    cnt = Counter()
    for start in adj:
        seq = [start]
        cur = start
        for s in range(cl.WALK_STEPS):
            nbrs = adj[cur]
            cur = nbrs[int(H.h64(f"{cur}:{s}")) % len(nbrs)]
            seq.append(cur)
        for i in range(len(seq)):
            for j in range(i + 1, min(i + cl.WALK_WINDOW + 1, len(seq))):
                if seq[i] != seq[j]:
                    cnt[(min(seq[i], seq[j]), max(seq[i], seq[j]))] += 1
    want = sorted(((n, a, b) for (a, b), n in cnt.items()),
                  key=lambda t: (-t[0], t[1], t[2]))[:cl.WALK_TOPK]
    got_rows = [(int(r.n), int(r.a), int(r.b)) for r in got.itertuples()]
    assert got_rows == want


def test_l_diversity_brute_force(ray_session):
    """Violating QI groups equal a pandas recomputation."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines import extras as ex

    got = ex.q_l_diversity(SF).to_pandas()
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["lang", "source", "n_chars"]).to_pandas()
    docs["chars_bucket"] = docs["n_chars"] // ex.K_ANON_CHAR_BUCKET
    g = docs.groupby(["source", "chars_bucket"]).agg(
        n_docs=("lang", "size"), n_langs=("lang", "nunique")).reset_index()
    want = g[g["n_langs"] < ex.L_DIVERSITY]
    a = got.sort_values(["source", "chars_bucket"]).reset_index(drop=True)
    b = want.sort_values(["source", "chars_bucket"]).reset_index(drop=True)
    assert len(a) == len(b)
    for col in ("source", "chars_bucket", "n_docs", "n_langs"):
        assert (a[col].values == b[col].values).all(), col


def test_mst_matches_kruskal(ray_session):
    """Borůvka output equals a single-process Kruskal under the same
    (w, u, v) total order, spans each component, and is acyclic."""
    got = cl.q_mst_edges(SF).to_pandas()
    ew = cl._knn_weighted_edges(SF).to_pandas()
    edges = sorted((int(w), int(u), int(v))
                   for u, v, w in zip(ew["u"], ew["v"], ew["w"]))
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    want = []
    for w, u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            want.append((u, v, w))
    want.sort(key=lambda t: (t[2], t[0], t[1]))
    got_rows = [(int(r.u), int(r.v), int(r.w)) for r in got.itertuples()]
    assert got_rows == want
    nodes = set(ew["u"]).union(set(ew["v"]))
    n_cc = len({find(n) for n in nodes})
    assert len(got_rows) == len(nodes) - n_cc


def test_shortest_paths_fast_path_equals_staged(ray_session):
    """The single-task Bellman-Ford fast path equals the bucket-round
    staged plan row for row (forced via small_graph_max_edges=0)."""
    fast = (cl.q_shortest_paths(SF).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    staged = (cl.q_shortest_paths(SF, small_graph_max_edges=0)
              .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert fast.equals(staged)


def test_hits_fast_path_equals_staged(ray_session):
    """The single-task HITS fast path equals the staged half-round
    plan row for row (forced via small_graph_max_edges=0)."""
    fast = (cl.q_hits_scores(SF).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    staged = (cl.q_hits_scores(SF, small_graph_max_edges=0)
              .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert fast.equals(staged)


def test_single_linkage_consistency_with_mst(ray_session):
    """Single-linkage at the median weight equals cutting MST edges
    heavier than the threshold (the single-linkage property) AND a
    brute-force union-find over light graph edges."""
    sl = cl.q_single_linkage_clusters(SF).to_pandas()
    mst = cl.q_mst_edges(SF).to_pandas()
    ew = cl._knn_weighted_edges(SF).to_pandas()
    ws = sorted(zip(ew["w"], ew["u"], ew["v"]))
    t = int(ws[(len(ws) + 1) // 2 - 1][0])

    def cc(edges, nodes):
        parent = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(int(u)), find(int(v))
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        return {n: find(int(n)) for n in nodes}

    nodes = sl["vec_id"].tolist()
    via_graph = cc([(u, v) for u, v, w in
                    zip(ew["u"], ew["v"], ew["w"]) if w <= t], nodes)
    via_mst = cc([(u, v) for u, v, w in
                  zip(mst["u"], mst["v"], mst["w"]) if w <= t], nodes)
    got = dict(zip(sl["vec_id"], sl["cluster"]))
    assert got == via_graph == via_mst


def test_fd_audit_brute_force(ray_session):
    """FD verdicts equal pandas nunique checks; PK FDs hold exactly."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines import relational as rl

    got = rl.q_fd_audit(SF).to_pandas().set_index(
        ["tbl", "determinant", "dependent"])
    for tbl, det, dep in rl.FD_CANDIDATES:
        df = pq.read_table(f"{SF}/{tbl}.parquet",
                           columns=[det, dep]).to_pandas()
        g = df.groupby(det)[dep].agg(["nunique", "size"])
        r = got.loc[(tbl, det, dep)]
        assert int(r.n_keys) == len(g)
        assert int(r.n_violating_keys) == int((g["nunique"] > 1).sum())
        assert int(r.n_violating_rows) == int(
            g[g["nunique"] > 1]["size"].sum())
    # primary-key determinants must hold by construction
    assert int(got.loc[("orders", "o_orderkey", "o_custkey")]
               .n_violating_keys) == 0
    assert int(got.loc[("customer", "c_custkey", "c_nationkey")]
               .n_violating_keys) == 0


def test_char_entropy_properties(ray_session):
    """Entropy numerator equals a Counter recomputation and behaves:
    uniform-ish text scores higher than a single repeated char."""
    from collections import Counter

    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines import extras as ex

    got = ex.q_char_entropy(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    lut = [0] + ex.entropy_ln_lut()
    for r in docs.itertuples():
        cnt = Counter(b for b in r.text.encode("utf-8") if b < 128)
        n = sum(cnt.values())
        num = sum(c * (lut[n] - lut[c]) for c in cnt.values())
        row = got.loc[int(r.doc_id)]
        assert int(row.n_ascii) == n
        assert int(row.entropy_num) == num
        # 0 <= H <= ln(128): num in [0, n * lut-ish bound]
        assert 0 <= num <= n * lut[min(n, 128)] if n else num == 0


def test_time_rollup_consistency(ray_session):
    """Grain totals agree: day rows sum to week rows sum to month rows
    sum to the total event count and purchase cents."""
    from candidategeneration_ray.pipelines import events as ev

    got = ev.q_time_rollup(SF).to_pandas()
    for col in ("n_events", "cents"):
        vals = got.groupby("grain")[col].sum()
        assert vals["day"] == vals["week"] == vals["month"], col


def test_single_linkage_staged_path_equals_fast(ray_session):
    """The >cap _propagation_rounds route equals the single-task CC
    fast path (regression: the staged route once dropped the lbl
    sentinel column and produced garbage labels)."""
    fast = (cl.q_single_linkage_clusters(SF).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    staged = (cl.q_single_linkage_clusters(SF, small_graph_max_edges=0)
              .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert fast.equals(staged)
    assert (staged["cluster"] >= 0).all()


def test_mis_is_maximal_independent(ray_session):
    """MIS properties on the real kNN graph: no two selected nodes are
    adjacent (independent) and every unselected node has a selected
    neighbor (maximal); equals a sequential Luby replay."""
    from candidategeneration_ray.functions import hashing as H

    got = cl.q_mis_nodes(SF).to_pandas()
    sel = set(got["vec_id"].astype(int))
    ew = cl._knn_weighted_edges(SF).to_pandas()
    adj = {}
    for u, v in zip(ew["u"], ew["v"]):
        adj.setdefault(int(u), set()).add(int(v))
        adj.setdefault(int(v), set()).add(int(u))
    for u, v in zip(ew["u"], ew["v"]):
        assert not (int(u) in sel and int(v) in sel)
    for n, nbrs in adj.items():
        assert n in sel or (nbrs & sel), n
    # sequential replay with the same priorities and round rule
    prio = {n: (int(H.h64(str(n))), n) for n in adj}
    und = set(adj)
    want = {}
    rnd = 0
    while und:
        cand = {n for n in und
                if all(prio[n] < prio[m] for m in adj[n] if m in und)}
        for n in cand:
            want[n] = rnd
        und -= cand | {m for n in cand for m in adj[n]}
        rnd += 1
    assert dict(zip(got["vec_id"].astype(int),
                    got["mis_round"].astype(int))) == want


def test_matching_is_maximal(ray_session):
    """Matching properties: no node appears twice (a matching) and no
    surviving edge has both endpoints unmatched (maximal)."""
    got = cl.q_matching_edges(SF).to_pandas()
    used = got["u"].astype(int).tolist() + got["v"].astype(int).tolist()
    assert len(used) == len(set(used))
    matched = set(used)
    ew = cl._knn_weighted_edges(SF).to_pandas()
    for u, v in zip(ew["u"], ew["v"]):
        assert int(u) in matched or int(v) in matched


def test_power_iteration_exact_and_improving(ray_session):
    """The fixed-point vector equals an exact big-int replay of the
    truncating recurrence, and its Rayleigh quotient strictly improves
    on the start vector's (convergence RATE is spectrum-dependent —
    the synthetic embeddings are near-isotropic, so full alignment
    needs more steps; the oracle verifies the iteration itself)."""
    got = cl.q_gram_power_iteration(SF).to_pandas().sort_values("dim")
    rows = cl.q_embedding_gram(SF).take_all()
    d = max(int(r["dim_a"]) for r in rows) + 1
    g = [[0] * d for _ in range(d)]
    for r in rows:
        i, j = int(r["dim_a"]), int(r["dim_b"])
        if i >= 0:
            g[i][j] = g[j][i] = int(r["sum_xy"])
    s = cl.POWER_SCALE
    v = [s] * d
    for _ in range(cl.POWER_ITERS):
        w = [sum(g[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w)
        v = [(abs(x) * s) // mx * (1 if x >= 0 else -1) for x in w]
    assert got["v"].tolist() == v
    G = np.asarray(g, np.float64)

    def rayleigh(x):
        x = np.asarray(x, np.float64)
        return (x @ G @ x) / (x @ x)

    assert rayleigh(v) > rayleigh([s] * d)


def test_densest_subgraph_brute_force(ray_session):
    """Peeling replayed single-process over the co-purchase graph:
    iterate-dominance, earliest-tie-break and membership all match."""
    from candidategeneration_ray.pipelines import clustering as cl
    from candidategeneration_ray.pipelines import relational as rl

    got = cl.q_densest_subgraph(SF).to_pandas()
    ew = rl.copurchase_edges(SF, cl.KCORE_SUPPORT).to_pandas()
    edges = [(int(u), int(v)) for u, v in zip(ew["u"], ew["v"])]
    alive = {x for e in edges for x in e}
    iters = []
    for _ in range(cl.DENSEST_MAX_ROUNDS):
        deg = {n: 0 for n in alive}
        for u, v in edges:
            if u in alive and v in alive:
                deg[u] += 1
                deg[v] += 1
        n = len(alive)
        e2 = sum(deg.values())
        if n == 0:
            break
        iters.append((e2, n, set(alive)))
        peel = {x for x in alive if n * deg[x] <= e2}
        if not peel:
            break
        alive -= peel
    best = iters[0]
    best_rnd = 0
    for i, it in enumerate(iters[1:], 1):
        if it[0] * best[1] > best[0] * it[1]:
            best, best_rnd = it, i
    e2, n, members = best
    assert set(got["part"].astype(int)) == members
    assert int(got["e2"].iloc[0]) == e2
    assert int(got["n"].iloc[0]) == n
    assert int(got["best_round"].iloc[0]) == best_rnd
    # the winner's density dominates EVERY iterate (cross-multiplied)
    for e2i, ni, _ in iters:
        assert e2 * ni >= e2i * n


def test_ktruss_fixed_point_and_replay(ray_session):
    """k-truss equals a sequential peel replay, and the fixed point
    holds: every surviving edge has >= K-2 common neighbors among
    survivors."""
    from candidategeneration_ray.pipelines import relational as rl

    got = cl.q_ktruss_edges(SF).to_pandas()
    ew = rl.copurchase_edges(SF, cl.KCORE_SUPPORT).to_pandas()
    edges = {(int(u), int(v)) for u, v in zip(ew["u"], ew["v"])}
    k = cl.TRUSS_K
    for _ in range(cl.TRUSS_MAX_ROUNDS + 1):
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        supp = {(u, v): len(adj[u] & adj[v]) for u, v in edges}
        nxt = {e for e in edges if supp[e] >= k - 2}
        if nxt == edges:
            break
        edges = nxt
    want = sorted((u, v, supp[(u, v)]) for u, v in edges)
    got_rows = sorted((int(r.u), int(r.v), int(r.support))
                      for r in got.itertuples())
    assert got_rows == want
    assert len(got_rows) > 0


def test_rate_limit_brute_force(ray_session):
    """Flags equal a per-user pandas window count with peer (equal-ts)
    semantics; flagged set non-empty on the fixture."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines import events as ev

    got = ev.q_rate_limit_flags(SF).to_pandas()
    raw = pq.read_table(SF + "/events.parquet",
                        columns=["event_id", "ts", "user_id"]).to_pandas()
    raw["tsu"] = raw["ts"].astype("int64")
    want = {}
    for uid, grp in raw.groupby("user_id"):
        t = np.sort(grp["tsu"].to_numpy(np.int64))
        for r in grp.itertuples():
            lo = np.searchsorted(t, r.tsu - int(ev.RATE_LIMIT_W_US), "left")
            hi = np.searchsorted(t, r.tsu, "right")
            n = int(hi - lo)
            if n > ev.RATE_LIMIT_N:
                want[int(r.event_id)] = n
    got_map = dict(zip(got["event_id"].astype(int),
                       got["n_in_window"].astype(int)))
    assert got_map == want
    assert len(want) > 0


def test_walk_fast_path_equals_staged(ray_session):
    """The single-task walk fast path equals the staged bucket-join
    rounds (forced via small_graph_max_edges=0)."""
    fast = cl.q_walk_cooccurrence(SF).to_pandas()
    staged = cl.q_walk_cooccurrence(SF, small_graph_max_edges=0).to_pandas()
    assert fast.equals(staged)


def test_conversion_delay_brute_force(ray_session):
    """Quantiles equal a pandas replay of first-view -> first purchase
    at/after, ceil-rank rule."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines import events as ev

    got = ev.q_conversion_delay(SF).to_pandas().set_index("pct")
    raw = pq.read_table(SF + "/events.parquet",
                        columns=["ts", "user_id", "event_type"]).to_pandas()
    raw["tsu"] = raw["ts"].astype("int64")
    delays = []
    for uid, grp in raw.groupby("user_id"):
        views = grp[grp["event_type"] == "view"]["tsu"]
        if views.empty:
            continue
        t0 = int(views.min())
        purch = grp[(grp["event_type"] == "purchase")
                    & (grp["tsu"] >= t0)]["tsu"]
        if purch.empty:
            continue
        delays.append((int(purch.min()) - t0, int(uid)))
    delays.sort()
    n = len(delays)
    for p in ev.CONV_PCTS:
        rnk = max(1, -(-p * n // 100))
        assert int(got.loc[p].delay_us) == delays[rnk - 1][0], p
        assert int(got.loc[p].n_users) == n


def test_dow_profile_conservation(ray_session):
    """Per-type dow sums equal the type's total events/cents; n_days
    across dows equals the span length."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines import events as ev

    got = ev.q_dow_profile(SF).to_pandas()
    raw = pq.read_table(SF + "/events.parquet",
                        columns=["ts", "event_type"]).to_pandas()
    totals = raw.groupby("event_type").size()
    g = got.groupby("event_type")["n_events"].sum()
    for et, n in totals.items():
        assert int(g[et]) == int(n), et
    day = raw["ts"].astype("int64") // 86_400_000_000
    span = int(day.max() - day.min() + 1)
    per_dow = got.drop_duplicates("dow").set_index("dow")["n_days"]
    assert int(per_dow.sum()) == span
