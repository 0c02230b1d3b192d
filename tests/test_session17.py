"""Session-17 operators, pinned against independent brute-force
references over the sf0.001 tables (the driver contract test covers
the SQL oracles; these pin the math itself)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


class TestKappaEval:
    def test_matches_bruteforce(self, ray_session):
        """kappa num/den recomputed from the (oracle-verified)
        nb_predict output joined with the true langs — by the direct
        Cohen definition, not the confusion-partials plumbing."""
        from candidategeneration_ray.pipelines.textlm import (
            q_kappa_eval, q_nb_predict)

        preds = q_nb_predict(SF).to_pandas()
        truth = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "lang"]
        ).to_pandas()
        j = preds.merge(truth, on="doc_id")
        n = len(j)
        agree = int((j["pred_lang"] == j["lang"]).sum())
        rows = j["lang"].value_counts()
        cols = j["pred_lang"].value_counts()
        pe = sum(int(rows[c]) * int(cols.get(c, 0)) for c in rows.index)

        got = q_kappa_eval(SF).to_pylist()
        assert got == [{
            "n": n, "n_agree": agree, "pe_cross": pe,
            "kappa_num": n * agree - pe, "kappa_den": n * n - pe,
        }]
        # sanity: kappa is a proper fraction of a positive denominator
        assert got[0]["kappa_den"] > 0
        assert abs(got[0]["kappa_num"]) <= got[0]["kappa_den"]

    def test_perfect_and_chance_extremes(self, ray_session):
        """The finalize math on synthetic confusions: perfect agreement
        gives kappa == 1 exactly; a constant predictor gives num == 0."""
        # direct identity checks of the emitted num/den form
        # perfect: conf = diag(10, 20) -> n=30, agree=30, pe=100+400
        n, agree, pe = 30, 30, 10 * 10 + 20 * 20
        assert n * agree - pe == n * n - pe - 0 * (n * n - pe)
        # constant predictor: all mass in one predicted column ->
        # pe == n * row_of_that_class... num = n*agree - pe == 0
        # (agree = count of the predicted class)
        rows = {"en": 12, "fr": 18}
        cols = {"en": 30}
        agree_c = rows["en"]
        pe_c = sum(v * cols.get(k, 0) for k, v in rows.items())
        assert 30 * agree_c - pe_c == 0


class TestPrPoints:
    def test_consistent_with_retrieval_eval(self, ray_session):
        """The PR points must agree with the (oracle-verified)
        retrieval_eval witnesses: hit counts at rank<=10 and the first
        relevant rank."""
        from candidategeneration_ray.pipelines.docquery import (
            q_pr_points, q_retrieval_eval)

        pts = q_pr_points(SF).to_pylist()
        ev = {r["query_id"]: r for r in q_retrieval_eval(SF).to_pylist()}
        by_q: dict[int, list] = {}
        for p in pts:
            by_q.setdefault(p["query_id"], []).append(p)
        for q, rows in by_q.items():
            rows.sort(key=lambda r: r["hit_idx"])
            # hit_idx is 1..m and ranks strictly increase
            assert [r["hit_idx"] for r in rows] == list(
                range(1, len(rows) + 1))
            ranks = [r["rank"] for r in rows]
            assert ranks == sorted(set(ranks))
            assert ev[q]["first_rel_rank"] == ranks[0]
            assert ev[q]["hits_at_10"] == sum(1 for k in ranks if k <= 10)
            # precision is a proper fraction: hit_idx <= rank
            assert all(r["hit_idx"] <= r["rank"] for r in rows)
        # queries with no relevant hit emit no rows, matching eval
        for q, r in ev.items():
            assert (q in by_q) == (r["first_rel_rank"] > 0)


class TestMcnemar:
    def test_matches_bruteforce(self, ray_session):
        """Cells recomputed from the (oracle-verified) nb_predict and
        langid outputs joined with truth — by direct definition."""
        from candidategeneration_ray.pipelines.extras import q_langid
        from candidategeneration_ray.pipelines.textlm import (
            q_mcnemar_test, q_nb_predict)

        preds = q_nb_predict(SF).to_pandas()[["doc_id", "pred_lang"]]
        lang = q_langid(SF).to_pandas()[["doc_id", "is_en"]]
        truth = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "lang"]
        ).to_pandas()
        j = preds.merge(lang, on="doc_id").merge(truth, on="doc_id")
        t = j["lang"] == "en"
        a_ok = ((j["pred_lang"] == "en") == t).to_numpy()
        b_ok = (j["is_en"] == t).to_numpy()
        b = int((a_ok & ~b_ok).sum())
        c = int((~a_ok & b_ok).sum())
        num = (abs(b - c) - 1) ** 2 if abs(b - c) > 1 else 0
        got = q_mcnemar_test(SF).to_pylist()
        assert got == [{
            "n": len(j), "both_right": int((a_ok & b_ok).sum()),
            "both_wrong": int((~a_ok & ~b_ok).sum()),
            "b_cell": b, "c_cell": c,
            "chi2_num": num, "chi2_den": b + c if num > 0 else 1,
        }]
        assert got[0]["n"] > 0

    def test_counters_partition(self, ray_session):
        from candidategeneration_ray.pipelines.textlm import q_mcnemar_test

        r = q_mcnemar_test(SF).to_pylist()[0]
        assert (r["both_right"] + r["both_wrong"]
                + r["b_cell"] + r["c_cell"]) == r["n"]


class TestActiveTime:
    def _brute(self, gap_sec: int) -> tuple[int, int]:
        """Union length by direct microsecond-set semantics on the
        sf0.001 events: build sessions per user, merge inclusive
        [s, e] intervals, sweep the sorted interval list."""
        import pandas as pd

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts"]).to_pandas()
        ev["tus"] = ev["ts"].astype("int64")
        gap_us = gap_sec * 1_000_000
        spans = []
        for _, g in ev.groupby("user_id"):
            t = np.sort(g["tus"].to_numpy())
            brk = np.nonzero(np.diff(t) > gap_us)[0]
            starts = np.concatenate(([0], brk + 1))
            ends = np.concatenate((brk, [t.size - 1]))
            spans += [(int(t[s]), int(t[e]) + 1)
                      for s, e in zip(starts, ends)]
        n_sessions = len(spans)
        spans.sort()
        covered, cur_s, cur_e = 0, None, None
        for s, e in spans:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            covered += cur_e - cur_s
        return covered, n_sessions

    def test_matches_bruteforce(self, ray_session):
        from candidategeneration_ray.pipelines.events import (
            PEAK_GAP_SEC, q_active_time)

        got = q_active_time(SF).to_pylist()[0]
        covered, n_sessions = self._brute(PEAK_GAP_SEC)
        assert got == {"covered_us": covered, "n_sessions": n_sessions}
        assert got["covered_us"] > 0

    def test_block_count_invariance(self, ray_session):
        """The boundary stitch must not depend on where the range
        blocks fall — 1 block (no stitch) == many tiny blocks."""
        from candidategeneration_ray.pipelines.events import q_active_time

        one = q_active_time(SF, num_blocks=1).to_pylist()
        many = q_active_time(SF, num_blocks=13).to_pylist()
        assert one == many


class TestGraphColoring:
    @pytest.fixture(scope="class")
    def colored(self, ray_session):
        from candidategeneration_ray.pipelines.clustering import (
            q_graph_coloring)

        t = q_graph_coloring(SF)
        return {int(v): (int(c), int(r)) for v, c, r in zip(
            t.column("vec_id").to_pylist(),
            t.column("color").to_pylist(),
            t.column("color_round").to_pylist())}

    @pytest.fixture(scope="class")
    def edges(self, ray_session):
        from candidategeneration_ray.pipelines.clustering import (
            _knn_weighted_edges)

        ew = _knn_weighted_edges(SF).to_pandas()
        return list(zip(ew["u"].astype(int), ew["v"].astype(int)))

    def test_proper_and_complete(self, colored, edges):
        assert all(c >= 0 and r >= 0 for c, r in colored.values())
        for u, v in edges:
            assert colored[u][0] != colored[v][0], (u, v)
            # adjacent nodes can never be frontier in the same round
            assert colored[u][1] != colored[v][1], (u, v)

    def test_matches_sequential_replay(self, colored, edges):
        """Replay Jones-Plassmann sequentially in plain Python: rounds
        of priority-local-minima, mex over colored neighbors."""
        from candidategeneration_ray.functions import hashing as H

        adj: dict[int, set] = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        prio = {n: (int(H.h64_many([str(n)])[0]), n) for n in adj}
        col: dict[int, tuple] = {}
        und = set(adj)
        rnd = 0
        while und:
            frontier = [n for n in und
                        if all(prio[n] < prio[m]
                               for m in adj[n] if m in und)]
            for n in frontier:
                used = {col[m][0] for m in adj[n] if m in col}
                c = 0
                while c in used:
                    c += 1
                col[n] = (c, rnd)
            und -= set(frontier)
            rnd += 1
            assert rnd <= 64
        assert colored == col

    def test_staged_equals_fast_path(self, ray_session, colored):
        from candidategeneration_ray.pipelines.clustering import (
            q_graph_coloring)

        staged = q_graph_coloring(SF, small_graph_max_edges=0)
        got = {int(v): (int(c), int(r)) for v, c, r in zip(
            staged.column("vec_id").to_pylist(),
            staged.column("color").to_pylist(),
            staged.column("color_round").to_pylist())}
        assert got == colored

    def test_color_count_bounded(self, colored, edges):
        deg: dict[int, int] = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        n_colors = len({c for c, _ in colored.values()})
        assert n_colors <= max(deg.values()) + 1


class TestRankingRbo:
    def test_matches_definition(self, ray_session):
        """RBO recomputed from the (verified) two rankings by the
        textbook truncated formula in exact fractions."""
        from fractions import Fraction

        from candidategeneration_ray.pipelines.docquery import (
            q_bm25_topk, q_passage_bm25_topk, q_ranking_rbo)

        def by_q(t):
            out = {}
            for r in sorted(t.to_pylist(), key=lambda r: r["rank"]):
                out.setdefault(r["query_id"], []).append(r["doc_id"])
            return out

        a, b = by_q(q_bm25_topk(SF)), by_q(q_passage_bm25_topk(SF))
        p = Fraction(9, 10)
        got = q_ranking_rbo(SF).to_pylist()
        for r in got:
            la = a.get(r["query_id"], [])
            lb = b.get(r["query_id"], [])
            rbo = sum(p ** (d - 1)
                      * Fraction(len(set(la[:d]) & set(lb[:d])), d)
                      for d in range(1, 11))
            norm = sum(p ** (d - 1) for d in range(1, 11))
            assert Fraction(r["rbo_num"], r["rbo_den"]) == rbo / norm
            assert 0 <= r["rbo_num"] <= r["rbo_den"]

    def test_self_rbo_is_one(self):
        from candidategeneration_ray.pipelines.docquery import (
            rbo_weights)

        w, den = rbo_weights()
        # perfect agreement: A_d = d at every depth
        assert sum(d * w[d] for d in w) == den


class TestKendallTau:
    def test_matches_scipy_free_definition(self, ray_session):
        """Tau pairs recomputed directly from the two (verified)
        rankings; pair counts partition."""
        from candidategeneration_ray.pipelines.docquery import (
            q_bm25_topk, q_kendall_tau, q_ltr_rerank_topk)

        def ranks(t):
            out = {}
            for r in t.to_pylist():
                out.setdefault(r["query_id"], {})[r["doc_id"]] = r["rank"]
            return out

        ra, rb = ranks(q_bm25_topk(SF)), ranks(q_ltr_rerank_topk(SF))
        got = q_kendall_tau(SF).to_pylist()
        assert got
        for r in got:
            q = r["query_id"]
            common = sorted(set(ra[q]) & set(rb[q]))
            n = len(common)
            assert r["n_common"] == n
            assert r["concordant"] + r["discordant"] == n * (n - 1) // 2
            c = sum(1 for i in range(n) for j in range(i + 1, n)
                    if (ra[q][common[i]] < ra[q][common[j]])
                    == (rb[q][common[i]] < rb[q][common[j]]))
            assert r["concordant"] == c


class TestPrioritySample:
    def test_matches_bruteforce(self, ray_session):
        from candidategeneration_ray.functions import hashing as H
        from candidategeneration_ray.pipelines.extras import (
            PRIO_SAMPLE_K, q_priority_sample)

        d = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "n_chars"]).to_pandas()
        pr = []
        for doc, w in zip(d["doc_id"].astype(int),
                          d["n_chars"].astype(int)):
            h = max(int(H.h64_many([str(doc)])[0]), 1)
            pr.append((w * (1 << 64) // h, doc, w))
        pr.sort(key=lambda t: (-t[0], t[1]))
        tau = pr[PRIO_SAMPLE_K][0]
        exp = [{"doc_id": doc, "weight": w,
                "est_weight": min(max(w, tau), 1 << 62)}
               for _, doc, w in pr[:PRIO_SAMPLE_K]]
        got = q_priority_sample(SF).to_pylist()
        assert got == exp

    def test_subset_sums_consistent(self, ray_session):
        """Per-source estimates recompute from the (verified) sample
        joined with sources; truth equals the direct per-source sum;
        estimates total exactly the sample's est_weight total."""
        import pandas as pd

        from candidategeneration_ray.pipelines.extras import (
            q_priority_sample, q_sample_subset_sums)

        samp = q_priority_sample(SF).to_pandas()
        meta = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "source", "n_chars"]
                             ).to_pandas()
        j = samp.merge(meta[["doc_id", "source"]], on="doc_id")
        got = q_sample_subset_sums(SF).to_pandas()
        truth = meta.groupby("source")["n_chars"].sum()
        assert set(got["source"]) == set(truth.index)
        for r in got.itertuples():
            g = j[j["source"] == r.source]
            assert r.n_sampled == len(g)
            assert r.est_chars == int(g["est_weight"].sum())
            assert r.true_chars == int(truth[r.source])
        assert int(got["est_chars"].sum()) == int(
            samp["est_weight"].sum())

    def test_ht_estimator_tracks_total(self, ray_session):
        """Σ est_weight is the unbiased HT estimate of total weight —
        on this fixture it must land within a loose factor of truth
        (a 25-of-500 weighted sample, deterministic draws)."""
        from candidategeneration_ray.pipelines.extras import (
            q_priority_sample)

        d = pq.read_table(f"{SF}/documents.parquet",
                          columns=["n_chars"]).to_pandas()
        total = int(d["n_chars"].sum())
        est = sum(r["est_weight"]
                  for r in q_priority_sample(SF).to_pylist())
        assert total // 4 <= est <= total * 4


class TestAnnRecallReport:
    def test_anchor_and_consistency(self, ray_session):
        from candidategeneration_ray.pipelines.extras import (
            q_ann_cosine_top10, q_ann_recall_report, q_ann_sq8_top10)

        rep = {r["method"]: r
               for r in q_ann_recall_report(SF).to_pylist()}
        assert set(rep) == {"cosine", "ivf", "ivfk", "ivfpq", "pq",
                            "sq8"}
        # the truth anchor scores itself perfectly
        assert rep["cosine"] == {"method": "cosine", "n_hits": 10,
                                 "top1_match": 1}
        # every method's hits recompute from its own (verified) output
        exact = set(q_ann_cosine_top10(SF).to_pandas()["vec_id"])
        sq8 = set(q_ann_sq8_top10(SF).to_pandas()["vec_id"])
        assert rep["sq8"]["n_hits"] == len(sq8 & exact)
        assert all(0 <= r["n_hits"] <= 10 for r in rep.values())


class TestCodecReport:
    def test_consistent_with_per_term_entries(self, ray_session):
        from candidategeneration_ray.pipelines.docquery import (
            q_codec_report, q_postings_bytes, q_postings_bytes_ef)

        rep = {r["codec"]: r for r in q_codec_report(SF).to_pylist()}
        assert set(rep) == {"varint", "bic", "bp", "ef", "rice"}
        base = q_postings_bytes(SF).to_pandas()
        assert rep["varint"]["n_terms"] == len(base)
        assert rep["varint"]["n_postings"] == int(base["n"].sum())
        assert rep["varint"]["docs_bytes"] == int(base["docs_bytes"].sum())
        ef = q_postings_bytes_ef(SF).to_pandas()
        assert rep["ef"]["docs_bytes"] == int(ef["docs_bytes_ef"].sum())
        # all codecs size the same posting multiset
        assert len({r["n_postings"] for r in rep.values()}) == 1
        assert all(r["docs_bytes"] > 0 for r in rep.values())


class TestListOverlapKmv:
    def test_exact_when_sketch_not_full(self, ray_session):
        """Lists shorter than KMV_K are sketched whole — the union
        estimate is then the exact union size and inter_est the exact
        intersection (sampling without loss)."""
        from candidategeneration_ray.pipelines.docquery import (
            q_list_overlap_kmv, q_selectivity_audit)
        from candidategeneration_ray.pipelines.sketches import KMV_K

        ex = {(r["t1"], r["t2"]): r
              for r in q_selectivity_audit(SF).to_pylist()}
        for r in q_list_overlap_kmv(SF).to_pylist():
            e = ex[(r["t1"], r["t2"])]
            assert r["actual"] == e["actual"]
            union = e["df1"] + e["df2"] - e["actual"]
            if union < KMV_K:
                assert r["ku"] == union
                assert r["union_est"] == union
                assert r["n_match"] == e["actual"]
                assert r["inter_est"] == e["actual"]

    def test_estimator_in_range(self, ray_session):
        from candidategeneration_ray.pipelines.docquery import (
            q_list_overlap_kmv)

        rows = q_list_overlap_kmv(SF).to_pylist()
        assert rows
        for r in rows:
            assert 0 <= r["n_match"] <= r["ku"]
            assert r["inter_est"] >= 0
            # full sketches: a 64-slot sample keeps the estimate
            # within a loose constant factor of truth on these lists
            if r["actual"] > 0 and r["ku"] > 0:
                assert r["inter_est"] <= 20 * max(r["actual"], 1) + 50
                assert 20 * r["inter_est"] + 50 >= r["actual"] // 20


class TestTargetEncoding:
    def test_matches_bruteforce(self, ray_session):
        from candidategeneration_ray.pipelines.extras import (
            TE_M, q_target_encoding)

        d = pq.read_table(f"{SF}/documents.parquet",
                          columns=["source", "lang"]).to_pandas()
        nt = len(d)
        sy = int((d["lang"] == "en").sum())
        got = q_target_encoding(SF).to_pylist()
        assert len(got) == d["source"].nunique()
        for r in got:
            g = d[d["source"] == r["source"]]
            n, y = len(g), int((g["lang"] == "en").sum())
            assert r == {"source": r["source"], "n": n, "sum_y": y,
                         "enc_num": y * nt + TE_M * sy,
                         "enc_den": (n + TE_M) * nt}

    def test_shrinkage_toward_prior(self, ray_session):
        """Every encoded value lies between the raw category mean and
        the global prior (the m-estimate contract), strictly inside
        whenever they differ."""
        from fractions import Fraction

        from candidategeneration_ray.pipelines.extras import (
            q_target_encoding)

        rows = q_target_encoding(SF).to_pylist()
        nt = sum(r["n"] for r in rows)
        prior = Fraction(sum(r["sum_y"] for r in rows), nt)
        for r in rows:
            enc = Fraction(r["enc_num"], r["enc_den"])
            raw = Fraction(r["sum_y"], r["n"])
            lo, hi = min(raw, prior), max(raw, prior)
            assert lo <= enc <= hi
            if raw != prior:
                assert lo < enc < hi


class TestSelectivityAudit:
    def test_matches_bruteforce(self, ray_session):
        """dfs and true co-occurrence recomputed with the tokenizer
        directly (no index involved)."""
        from candidategeneration_ray.functions.tokenize import (
            tokenize_many)
        from candidategeneration_ray.pipelines.docquery import (
            q_selectivity_audit, selectivity_pairs)

        d = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"]).to_pandas()
        docsets = {t: set() for pair in selectivity_pairs() for t in pair}
        for doc_id, toks in zip(d["doc_id"],
                                tokenize_many(d["text"].tolist())):
            for t in set(toks) & set(docsets):
                docsets[t].add(int(doc_id))
        got = q_selectivity_audit(SF).to_pylist()
        assert [(r["t1"], r["t2"]) for r in got] == selectivity_pairs()
        for r in got:
            s1, s2 = docsets[r["t1"]], docsets[r["t2"]]
            assert r["df1"] == len(s1) and r["df2"] == len(s2)
            assert r["actual"] == len(s1 & s2)
            assert r["est_num"] == len(s1) * len(s2)
        # the audit is non-trivial: some pair co-occurs, some misses
        assert any(r["actual"] > 0 for r in got)
        assert any(r["est_num"] // max(r["n_docs"], 1) != r["actual"]
                   for r in got)


class TestTCloseness:
    def test_matches_bruteforce(self, ray_session):
        from candidategeneration_ray.pipelines.extras import (
            K_ANON_CHAR_BUCKET, T_CLOSENESS_PPM, q_t_closeness)

        d = pq.read_table(f"{SF}/documents.parquet",
                          columns=["lang", "source", "n_chars"]).to_pandas()
        d["cb"] = d["n_chars"] // K_ANON_CHAR_BUCKET
        glob = d["lang"].value_counts().to_dict()
        nt = len(d)
        got = {(r["source"], r["chars_bucket"]): r
               for r in q_t_closeness(SF).to_pandas().to_dict("records")}
        assert len(got) == len(d.groupby(["source", "cb"]))
        for (src, cb), g in d.groupby(["source", "cb"]):
            n = len(g)
            cnt = g["lang"].value_counts().to_dict()
            num = sum(abs(nt * cnt.get(l, 0) - n * c)
                      for l, c in glob.items())
            ppm = 10 ** 6 * num // (2 * n * nt)
            r = got[(src, cb)]
            assert r["n_docs"] == n and r["tvd_ppm"] == ppm
            assert r["violates"] == (1 if ppm > T_CLOSENESS_PPM else 0)

    def test_uniform_release_scores_zero(self):
        """A group whose distribution equals the global marginal has
        TVD exactly 0 — identity of the num formula."""
        glob = {"en": 60, "fr": 40}
        n, nt = 10, 100
        cnt = {"en": 6, "fr": 4}
        num = sum(abs(nt * cnt.get(l, 0) - n * c) for l, c in glob.items())
        assert num == 0


class TestSilhouette:
    def test_matches_bruteforce(self, ray_session):
        from candidategeneration_ray.pipelines.clustering import (
            _quantize, kmeans_codebook, q_silhouette_ppm)

        emb = pq.read_table(f"{SF}/embeddings.parquet")
        ids, xq = _quantize(emb)
        cent = kmeans_codebook(SF)
        d2 = ((xq[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        own = d2.argmin(axis=1)
        a = d2[np.arange(ids.size), own]
        d2[np.arange(ids.size), own] = 1 << 62
        b = d2.min(axis=1)
        exp = {int(i): (int(c), int(10 ** 6 * (bb - aa)
                                    // max(aa, bb, 1)))
               for i, c, aa, bb in zip(ids, own, a, b)}
        got = q_silhouette_ppm(SF).to_pandas()
        assert len(got) == ids.size
        for r in got.itertuples():
            assert exp[r.vec_id] == (r.cluster, r.s_ppm)
        # scores live in [0, 1e6] and the geometry isn't degenerate
        assert got["s_ppm"].between(0, 10 ** 6).all()
        assert got["s_ppm"].nunique() > 1

    def test_agrees_with_assignments(self, ray_session):
        from candidategeneration_ray.pipelines.clustering import (
            q_kmeans_assignments, q_silhouette_ppm)

        asg = {r["vec_id"]: r["cluster"]
               for r in q_kmeans_assignments(SF).to_pandas().to_dict(
                   "records")}
        for r in q_silhouette_ppm(SF).to_pandas().to_dict("records"):
            assert asg[r["vec_id"]] == r["cluster"]


class TestHarmonicCentrality:
    def test_matches_bruteforce(self, ray_session):
        """Plain-Python BFS from every pivot over the same kNN edge
        set; H(v) = sum of floor(1e6/d) over pivots within the cap."""
        from collections import deque

        from candidategeneration_ray.pipelines.clustering import (
            HC_MAX_HOPS, HC_PPM, HC_SEED_MOD, _knn_weighted_edges,
            q_harmonic_centrality)

        ew = _knn_weighted_edges(SF).to_pandas()
        adj: dict[int, list] = {}
        for u, v in zip(ew["u"].astype(int), ew["v"].astype(int)):
            adj.setdefault(u, []).append(v)
            adj.setdefault(v, []).append(u)
        pivots = [n for n in adj if n % HC_SEED_MOD == 0]
        h: dict[int, int] = {}
        nr: dict[int, int] = {}
        for s in pivots:
            dist = {s: 0}
            q = deque([s])
            while q:
                x = q.popleft()
                if dist[x] == HC_MAX_HOPS:
                    continue
                for y in adj[x]:
                    if y not in dist:
                        dist[y] = dist[x] + 1
                        q.append(y)
            for v, d in dist.items():
                if v != s and 1 <= d <= HC_MAX_HOPS:
                    h[v] = h.get(v, 0) + HC_PPM[d]
                    nr[v] = nr.get(v, 0) + 1
        got = q_harmonic_centrality(SF).to_pandas()
        # the staged (>cap) bucket-scatter route must equal the
        # single-task fast path — force it via a zero cap
        staged = q_harmonic_centrality(
            SF, small_graph_max_edges=0).to_pandas()
        assert (staged.sort_values("vec_id").reset_index(drop=True)
                .equals(got.sort_values("vec_id").reset_index(drop=True)))
        assert len(got) == len(adj) or len(got) >= len(adj)  # all vecs
        for r in got.itertuples():
            assert r.harmonic_ppm == h.get(r.vec_id, 0)
            assert r.n_reached == nr.get(r.vec_id, 0)
        # pivots exist and reach something on this graph
        assert pivots and sum(h.values()) > 0


class TestNoveltyAndHeaps:
    def test_novelty_matches_bruteforce(self, ray_session):
        from candidategeneration_ray.functions import hashing as H
        from candidategeneration_ray.functions.tokenize import (
            tokenize_many)
        from candidategeneration_ray.pipelines.extras import (
            q_novelty_scores)

        d = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"]).to_pandas()
        d = d.sort_values("doc_id")
        seen: set = set()
        exp = {}
        for doc_id, toks in zip(d["doc_id"].astype(int),
                                tokenize_many(d["text"].tolist())):
            hs = set(int(x) for x in
                     H.h64_many(H.word_shingles(toks, H.SHINGLE_W)))
            exp[doc_id] = (len(hs), len(hs - seen))
            seen |= hs
        got = q_novelty_scores(SF).to_pandas()
        assert len(got) == len(d)
        for r in got.itertuples():
            assert (r.n_shingles, r.n_novel) == exp[r.doc_id]
        # the first doc is fully novel; totals conserve
        first = got.sort_values("doc_id").iloc[0]
        assert first.n_novel == first.n_shingles
        assert int(got["n_novel"].sum()) == len(seen)

    def test_heaps_monotone_and_exact_tail(self, ray_session):
        from candidategeneration_ray.functions.tokenize import (
            tokenize_many)
        from candidategeneration_ray.pipelines.extras import (
            q_heaps_curve)

        got = q_heaps_curve(SF).to_pylist()
        vs = [r["vocab_size"] for r in got]
        assert vs == sorted(vs)              # monotone growth
        d = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"]).to_pandas()
        full_vocab = len({t for toks in tokenize_many(d["text"].tolist())
                          for t in toks})
        assert got[-1]["vocab_size"] == full_vocab
        assert got[-1]["n_docs_seen"] == len(d)


class TestStressCentrality:
    def test_matches_bruteforce(self, ray_session):
        """Stress recomputed by literal path enumeration: for every
        pivot, enumerate ALL shortest paths (hop-capped) by BFS-DAG
        DFS and count interior visits."""
        from candidategeneration_ray.pipelines.clustering import (
            STRESS_MAX_HOPS, STRESS_SEED_MOD, _knn_weighted_edges,
            q_stress_centrality)

        ew = _knn_weighted_edges(SF).to_pandas()
        adj: dict[int, list] = {}
        for u, v in zip(ew["u"].astype(int), ew["v"].astype(int)):
            adj.setdefault(u, []).append(v)
            adj.setdefault(v, []).append(u)
        stress: dict[int, int] = {}
        pivots = [n for n in adj if n % STRESS_SEED_MOD == 0]
        from collections import deque
        for s in pivots:
            dist = {s: 0}
            q = deque([s])
            while q:
                x = q.popleft()
                if dist[x] == STRESS_MAX_HOPS:
                    continue
                for y in adj[x]:
                    if y not in dist:
                        dist[y] = dist[x] + 1
                        q.append(y)

            # enumerate every shortest path from s by DAG DFS
            def walk(path):
                v = path[-1]
                for w in adj[v]:
                    if dist.get(w, 99) == dist[v] + 1:
                        for interior in path[1:]:
                            stress[interior] = stress.get(interior, 0) + 1
                        walk(path + [w])

            walk([s])
        got = {r["vec_id"]: r["stress"]
               for r in q_stress_centrality(SF).to_pandas().to_dict(
                   "records")}
        assert len(got) == 500
        for v, val in got.items():
            assert val == stress.get(v, 0), v
        assert sum(stress.values()) > 0


class TestBridgeEdges:
    def test_matches_path_enumeration(self, ray_session):
        """Edge uses recomputed by literal shortest-path enumeration:
        every enumerated path increments each of its edges."""
        from collections import deque

        from candidategeneration_ray.pipelines.clustering import (
            BRIDGE_TOPK, STRESS_MAX_HOPS, STRESS_SEED_MOD,
            _knn_weighted_edges, q_bridge_edges)

        ew = _knn_weighted_edges(SF).to_pandas()
        adj: dict[int, list] = {}
        for u, v in zip(ew["u"].astype(int), ew["v"].astype(int)):
            adj.setdefault(u, []).append(v)
            adj.setdefault(v, []).append(u)
        uses: dict[tuple, int] = {}
        for s in [n for n in adj if n % STRESS_SEED_MOD == 0]:
            dist = {s: 0}
            q = deque([s])
            while q:
                x = q.popleft()
                if dist[x] == STRESS_MAX_HOPS:
                    continue
                for y in adj[x]:
                    if y not in dist:
                        dist[y] = dist[x] + 1
                        q.append(y)

            def walk(path):
                v = path[-1]
                for w in adj[v]:
                    if dist.get(w, 99) == dist[v] + 1:
                        for a, b in zip(path, path[1:] + [w]):
                            e = (min(a, b), max(a, b))
                            uses[e] = uses.get(e, 0) + 1
                        walk(path + [w])

            walk([s])
        exp = sorted(uses.items(), key=lambda kv: (-kv[1], kv[0]))
        got = q_bridge_edges(SF).to_pylist()
        assert len(got) == min(BRIDGE_TOPK, len(exp))
        for r, ((u, v), n) in zip(got, exp):
            assert (r["u"], r["v"], r["uses"]) == (u, v, n)


class TestDedupIndex:
    def test_drop_set_matches_keep_best_rule(self, ray_session):
        """Drop set replayed in pandas: per multi-doc LSH cluster keep
        the longest doc (ties → min doc_id), drop the rest."""
        import pandas as pd

        from candidategeneration_ray.pipelines.docquery import (
            _dedup_drop_ids)
        from candidategeneration_ray.pipelines.extras import q_dup_clusters

        cl = q_dup_clusters(SF).to_pandas()
        nc = pq.read_table(f"{SF}/documents.parquet",
                           columns=["doc_id", "n_chars"]).to_pandas()
        j = cl.merge(nc, on="doc_id")
        expected = []
        for _, g in j.groupby("cluster"):
            if len(g) < 2:
                continue
            keep = g.sort_values(["n_chars", "doc_id"],
                                 ascending=[False, True]
                                 )["doc_id"].iloc[0]
            expected += [int(d) for d in g["doc_id"] if d != keep]
        got = _dedup_drop_ids(SF)
        assert sorted(expected) == got.tolist()
        assert got.size > 0        # fixture must exercise the path

    def test_rebuild_serves_survivors_with_new_stats(self, ray_session):
        from candidategeneration_ray.pipelines.docquery import (
            _dedup_drop_ids, q_bm25_topk, q_dedup_bm25_topk)

        drop = set(_dedup_drop_ids(SF).tolist())
        full = q_bm25_topk(SF).to_pylist()
        ded = q_dedup_bm25_topk(SF).to_pylist()
        # dropped docs never surface
        assert all(r["doc_id"] not in drop for r in ded)
        # a genuine rebuild: N/avgdl/df shifted, so scores differ from
        # the full-corpus epoch (unlike the doc_filter serving view)
        assert ded != full

    def test_drop_filter_edge_cases(self):
        """Regression (review finding): an empty drop set must pass
        batches through, not crash on the zero-length searchsorted;
        ids past the last drop entry must survive the clamp."""
        import pyarrow as pa

        from candidategeneration_ray.pipelines.docquery import (
            drop_doc_filter)

        batch = pa.table({
            "doc_id": pa.array([1, 2, 3, 99], pa.int64()),
            "tokens": pa.array([["a"], ["b"], ["c"], ["d"]],
                               pa.list_(pa.string())),
        })
        out = drop_doc_filter(batch, np.array([], np.int64))
        assert out.num_rows == 4            # empty set: untouched
        out = drop_doc_filter(batch, np.array([2, 3], np.int64))
        assert out.column("doc_id").to_pylist() == [1, 99]
        # drop id 1 specifically: the past-the-end clamp maps 99 to
        # position 0 — it must NOT be dropped by aliasing with id 1
        out = drop_doc_filter(batch, np.array([1], np.int64))
        assert out.column("doc_id").to_pylist() == [2, 3, 99]


class TestStemmedIndex:
    def test_recall_win_on_plural_corpus(self, ray_session, tmp_path):
        """The point of the stemmed family: a singular query matches
        plural-only documents the raw index misses."""
        import pyarrow as pa

        from candidategeneration_ray.config import EngineConfig
        from candidategeneration_ray.functions.tokenize import (
            tokenize_text)
        from candidategeneration_ray.pipelines.docquery import (
            build_documents_index, build_documents_index_stemmed,
            s_stem_unique)
        from candidategeneration_ray.state.queryengine import QueryEngine

        docs = pa.table({
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array([
                "queries tables indexes merging",   # plurals only
                "query table index merging",        # singulars
                "vector scan filter merging",       # neither
            ]),
        })
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        cfg = EngineConfig(emit_pairs=False)
        raw_built = build_documents_index(str(tmp_path), cfg)
        raw = QueryEngine(raw_built["final_dir"], raw_built["stats"])
        st_built = build_documents_index_stemmed(str(tmp_path), cfg)
        st = QueryEngine(st_built["final_dir"], st_built["stats"])

        toks = tokenize_text("query table")
        stemmed = s_stem_unique(np.asarray(toks, dtype=object))
        raw_docs = {d for _, d in raw.topk("query table", k=10)}
        st_docs = {d for _, d in st.topk("query table", k=10,
                                         tokens=stemmed)}
        assert raw_docs == {1}          # raw index misses the plurals
        assert st_docs == {0, 1}        # stemmed index recalls both

    def test_identity_on_pluralless_fixture(self, ray_session):
        """On the plural-less sf fixture the stemmed index is the raw
        index: rankings must be identical (stemming never over-stems
        this vocabulary)."""
        from candidategeneration_ray.pipelines.docquery import (
            q_bm25_topk, q_stemmed_bm25_topk)

        assert (q_stemmed_bm25_topk(SF).to_pylist()
                == q_bm25_topk(SF).to_pylist())


class TestSStemmer:
    def test_rule_table(self):
        from candidategeneration_ray.pipelines.docquery import (
            s_stem_unique)

        cases = {
            # ies rule + exceptions
            "queries": "query", "flies": "fly", "ties": "ty",
            "eies": "eies", "aies": "aies", "movies": "movy",
            # es rule + exceptions (es -> e, NOT stripped twice)
            "indexes": "indexe", "tables": "table", "caches": "cache",
            "aes": "aes", "trees": "trees", "goes": "goes", "shoes": "shoes",
            # s rule + exceptions
            "workers": "worker", "columns": "column",
            "status": "status", "class": "class", "bus": "bus",
            # no suffix
            "merge": "merge", "data": "data",
        }
        got = s_stem_unique(np.array(sorted(cases), dtype=object))
        assert got == [cases[k] for k in sorted(cases)]

    def test_noop_on_pluralless_corpus(self, ray_session):
        """The sf fixture vocabulary has no plural forms, so stemmed df
        must equal raw df exactly (the stemmer never over-stems)."""
        from candidategeneration_ray.pipelines.docquery import (
            q_df_top50, q_stemmed_df_top50)

        raw = {r["term"]: r["df"] for r in q_df_top50(SF).to_pylist()}
        st = {r["stem"]: r["df"] for r in q_stemmed_df_top50(SF).to_pylist()}
        assert raw == st

    def test_conflation_synthetic(self, ray_session, tmp_path):
        """On a corpus WITH plurals the stemmer conflates: df(stem) =
        docs containing any surface form."""
        import pyarrow as pa

        from candidategeneration_ray.pipelines.docquery import (
            q_stemmed_df_top50)

        docs = pa.table({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array([
                "query tables fast",
                "queries table index",
                "query worker workers",
                "caches cache bus status",
            ]),
        })
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        st = {r["stem"]: r["df"]
              for r in q_stemmed_df_top50(str(tmp_path)).to_pylist()}
        assert st["query"] == 3      # query, queries, query
        assert st["table"] == 2      # tables, table
        assert st["worker"] == 1     # worker+workers in ONE doc
        assert st["cache"] == 1
        assert st["bus"] == 1 and st["status"] == 1  # exceptions keep s
