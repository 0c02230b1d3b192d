"""Session-16 operators, pinned against independent brute-force
references over the sf0.001 tables (the driver contract test covers
the SQL oracles; these pin the math itself)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@pytest.fixture(scope="module")
def doc_feats(ray_session):
    from candidategeneration_ray.pipelines.extras import _textstats

    t = pq.read_table(f"{SF}/documents.parquet")
    ts = _textstats(t)
    return {name: ts.column(name).to_numpy().astype(np.int64)
            for name in ("n_chars", "n_words", "n_stop", "n_punct_chars")}


class TestGbdtModel:
    def _brute_round(self, feats, r):
        """Brute-force best split: per candidate, recompute the SSE
        directly from doc-level residuals (no prefix-sum algebra)."""
        from candidategeneration_ray.pipelines.extras import GBDT_FEATURES

        best = None
        for name in sorted(GBDT_FEATURES):
            x = feats[name]
            for v in sorted(set(x.tolist())):
                lm = x <= v
                nl, nr = int(lm.sum()), int((~lm).sum())
                ll = _tdiv(int(r[lm].sum()), nl)
                lr = _tdiv(int(r[~lm].sum()), nr) if nr else 0
                sse = int(((r[lm] - ll) ** 2).sum()) + \
                    int(((r[~lm] - lr) ** 2).sum())
                key = (sse, name, int(v))
                if best is None or key < best[:3]:
                    best = (sse, name, int(v), ll, lr)
        return best

    def test_matches_bruteforce(self, ray_session, doc_feats):
        from candidategeneration_ray.pipelines.extras import (
            GBDT_ROUNDS, GBDT_SCALE, q_gbdt_model)

        got = q_gbdt_model(SF).to_pylist()
        assert len(got) == GBDT_ROUNDS
        r = GBDT_SCALE * doc_feats["n_chars"].astype(object)
        for t, row in enumerate(got, 1):
            sse, name, v, ll, lr = self._brute_round(doc_feats, r)
            assert row == {"round": t, "feature": name, "threshold": v,
                           "leaf_l": ll, "leaf_r": lr, "sse": sse}
            r = r - np.where(doc_feats[name] <= v, ll, lr)
        # the reported final SSE is the actual residual energy
        assert int((r.astype(np.int64) ** 2).sum()) == got[-1]["sse"]

    def test_sse_nonincreasing(self, ray_session):
        from candidategeneration_ray.pipelines.extras import q_gbdt_model

        sses = [r["sse"] for r in q_gbdt_model(SF).to_pylist()]
        assert all(a >= b for a, b in zip(sses, sses[1:]))
        assert all(s >= 0 for s in sses)


class TestIsotonicCalibration:
    @staticmethod
    def _pava(n, p):
        """Classic adjacent-violators pooling with exact Fractions."""
        from fractions import Fraction

        blocks = [[Fraction(pi, ni), ni, pi] for ni, pi in zip(n, p)]
        i = 0
        while i < len(blocks) - 1:
            if blocks[i][0] > blocks[i + 1][0]:
                a, b = blocks[i], blocks[i + 1]
                merged = [Fraction(a[2] + b[2], a[1] + b[1]),
                          a[1] + b[1], a[2] + b[2]]
                blocks[i:i + 2] = [merged]
                i = max(i - 1, 0)
            else:
                i += 1
        # expand merged blocks back to per-bin fitted values by
        # walking the input weights each block absorbed
        vals, bi = [], 0
        for mean, ni, _ in blocks:
            covered = 0
            while covered < ni:
                covered += n[bi]
                vals.append(mean)
                bi += 1
        return vals

    def test_matches_pava_pooling(self, ray_session):
        from candidategeneration_ray.pipelines.extras import (
            ISO_KEY_SCALE, q_isotonic_calibration)

        t = q_isotonic_calibration(SF).to_pylist()
        n = [r["n"] for r in t]
        p = [r["p"] for r in t]
        ref = self._pava(n, p)
        for row, mean in zip(t, ref):
            assert row["fit_s12"] == (ISO_KEY_SCALE * mean.numerator) \
                // mean.denominator
        # nondecreasing fit, exactly the isotonic property
        fits = [r["fit_s12"] for r in t]
        assert all(a <= b for a, b in zip(fits, fits[1:]))

    def test_synthetic_violators(self, ray_session):
        """Hand case: a strict violation pools to the weighted mean."""
        from fractions import Fraction

        vals = self._pava([2, 2], [2, 0])    # 1.0 then 0.0 -> pooled
        assert vals == [Fraction(1, 2), Fraction(1, 2)]
        # blocks 0 | 1 | 1/2: violation (1 > 1/2) pools to 2/3, 2/3
        vals = self._pava([1, 1, 2], [0, 1, 1])
        assert vals == [Fraction(0), Fraction(2, 3), Fraction(2, 3)]


class TestSpendGini:
    def test_matches_bruteforce(self, ray_session):
        from candidategeneration_ray.functions.money import round_scaled
        from candidategeneration_ray.pipelines.events import q_spend_gini

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "event_type", "value"])
        mask = np.asarray(ev.column("event_type").to_pylist(),
                          dtype=object) == "purchase"
        uid = ev.column("user_id").to_numpy()[mask]
        cents = round_scaled(ev.column("value").to_numpy()[mask])
        totals: dict[int, int] = {}
        for u, c in zip(uid.tolist(), cents.tolist()):
            totals[u] = totals.get(u, 0) + c
        xs = [c for _, c in sorted(totals.items(),
                                   key=lambda kv: (kv[1], kv[0]))]
        n, t = len(xs), sum(xs)
        rx = sum((i + 1) * x for i, x in enumerate(xs))
        row = q_spend_gini(SF).to_pylist()[0]
        assert row == {"n_users": n, "total_cents": t,
                       "gini_num": 2 * rx - (n + 1) * t,
                       "gini_den": n * t,
                       "gini_ppm": (1_000_000 * (2 * rx - (n + 1) * t))
                       // (n * t)}
        assert 0 <= row["gini_ppm"] <= 1_000_000

    def test_block_count_invariance(self, ray_session):
        from candidategeneration_ray.pipelines.events import q_spend_gini

        a = q_spend_gini(SF, num_blocks=3).to_pylist()
        b = q_spend_gini(SF, num_blocks=64).to_pylist()
        assert a == b


class TestNbEval:
    def test_matches_prediction_confusion(self, ray_session):
        from candidategeneration_ray.pipelines.textlm import (
            q_nb_eval, q_nb_predict)

        truth = dict(zip(
            *[pq.read_table(f"{SF}/documents.parquet",
                            columns=["doc_id", "lang"]).column(c).to_pylist()
              for c in ("doc_id", "lang")]))
        preds = {r["doc_id"]: r["pred_lang"]
                 for r in q_nb_predict(SF).take_all()}
        rows = {r["lang"]: r for r in q_nb_eval(SF).to_pylist()}
        classes = sorted({truth[d] for d in preds})
        assert sorted(rows) == classes
        for c in classes:
            tp = sum(1 for d, p in preds.items()
                     if truth[d] == c and p == c)
            fp = sum(1 for d, p in preds.items()
                     if truth[d] != c and p == c)
            fn = sum(1 for d, p in preds.items()
                     if truth[d] == c and p != c)
            r = rows[c]
            assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn)
            assert r["support"] == tp + fn
            if tp + fp:
                assert r["precision_ppm"] == (10**6 * tp) // (tp + fp)
            if tp + fn:
                assert r["recall_ppm"] == (10**6 * tp) // (tp + fn)
            d2 = 2 * tp + fp + fn
            assert r["f1_ppm"] == ((2 * 10**6 * tp) // d2 if d2 else 0)
        # every val prediction is accounted for exactly once
        assert sum(r["support"] for r in rows.values()) == len(preds)


class TestSoundex:
    def test_known_codes(self, ray_session):
        from candidategeneration_ray.pipelines.lexicon import soundex_code

        # classic reference values that don't involve the h/w rule
        assert soundex_code("robert") == "R163"
        assert soundex_code("rupert") == "R163"
        assert soundex_code("tymczak") == "T522"
        assert soundex_code("honeyman") == "H555"
        assert soundex_code("jazz") == "J200"
        # p and f share code 1: the leading run collapses into the P
        assert soundex_code("pfister") == "P236"
        # documented variant: h/w BREAK runs (classic A261 -> A226 here)
        assert soundex_code("ashcraft") == "A226"
        assert soundex_code("a") == "A000"

    def test_lookup_finds_soundalikes(self, ray_session):
        from candidategeneration_ray.pipelines.lexicon import (
            q_phonetic_lookup)

        rows = q_phonetic_lookup(SF).take_all()
        got = {(r["qword"], r["term"]) for r in rows}
        assert ("badge", "batch") in got
        assert ("march", "merge") in got
        assert ("soared", "sort") in got
        # every match shares the probe's code by construction
        from candidategeneration_ray.pipelines.lexicon import soundex_code
        for r in rows:
            assert soundex_code(r["term"]) == r["code"] == \
                soundex_code(r["qword"])


class TestCdcChunks:
    def test_partition_invariant(self, ray_session):
        from candidategeneration_ray.functions.tokenize import tokenize_text
        from candidategeneration_ray.pipelines.extras import q_cdc_chunks

        rows = q_cdc_chunks(SF).take_all()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        texts = pq.read_table(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"])
        kept = {d: len(tokenize_text(t)) for d, t in zip(
            texts.column("doc_id").to_pylist(),
            texts.column("text").to_pylist())}
        for did, chunks in by_doc.items():
            chunks.sort(key=lambda r: r["chunk_idx"])
            # chunks tile the kept-token stream exactly
            pos = 1
            for c in chunks:
                assert c["start_kpos"] == pos
                pos += c["n_tokens"]
            assert pos - 1 == kept[did]
        assert set(by_doc) == {d for d, n in kept.items() if n > 0}

    def test_shift_invariance(self, ray_session):
        """The CDC property: a shared passage yields identical interior
        chunks regardless of its offset in the doc."""
        import hashlib

        from candidategeneration_ray.pipelines.extras import _cdc_bounds

        shared = ("query engine latency budget shard merge spill "
                  "vector column batch stream filter hash join sort "
                  "window group order scan table row key data line "
                  "part value small slow fast big").split()
        doc_a = shared * 3                       # offset 0
        doc_b = "alpha beta gamma delta".split() + shared * 3

        def chunk_set(toks):
            b = _cdc_bounds(toks)
            return {hashlib.md5(" ".join(toks[b[i]:b[i + 1]]).encode())
                    .hexdigest() for i in range(len(b) - 1)}

        common = chunk_set(doc_a) & chunk_set(doc_b)
        # interior chunks of the shared run must coincide
        assert len(common) >= 3

    def test_dedup_stats_consistent(self, ray_session):
        from candidategeneration_ray.pipelines.extras import (
            q_cdc_chunks, q_cdc_dedup_stats)

        rows = q_cdc_chunks(SF).take_all()
        stats = q_cdc_dedup_stats(SF).to_pylist()[0]
        md5s = [r["chunk_md5"] for r in rows]
        assert stats["total_chunks"] == len(md5s)
        assert stats["distinct_chunks"] == len(set(md5s))
        assert stats["dup_chunks"] == len(md5s) - len(set(md5s))
        assert stats["total_tokens"] == sum(r["n_tokens"] for r in rows)
        assert 0 <= stats["redundant_tokens"] <= stats["total_tokens"]


class TestVoptHistogram:
    def test_tiling_and_totals(self, ray_session):
        from candidategeneration_ray.pipelines.sketches import (
            VOPT_BIN_WIDTH, VOPT_BUCKETS, q_vopt_histogram)

        rows = q_vopt_histogram(SF).to_pylist()
        assert [r["bucket"] for r in rows] == list(
            range(1, VOPT_BUCKETS + 1))
        lens = pq.read_table(f"{SF}/documents.parquet",
                             columns=["n_chars"]).column("n_chars")
        s = lens.to_numpy() // VOPT_BIN_WIDTH
        assert rows[0]["lo_bin"] == 0
        assert rows[-1]["hi_bin"] == int(s.max())
        for a, b in zip(rows, rows[1:]):
            assert b["lo_bin"] == a["hi_bin"] + 1
        assert sum(r["n_docs"] for r in rows) == len(s)

    def test_beats_alternative_segmentations(self, ray_session):
        from candidategeneration_ray.pipelines.sketches import (
            VOPT_BIN_WIDTH, VOPT_BUCKETS, q_vopt_histogram)

        lens = pq.read_table(f"{SF}/documents.parquet",
                             columns=["n_chars"]).column("n_chars")
        s = (lens.to_numpy() // VOPT_BIN_WIDTH).astype(np.int64)
        m = int(s.max())
        f = np.bincount(s, minlength=m + 1).astype(np.int64)

        def seg_cost(lo, hi):
            seg = f[lo:hi + 1]
            s1, n = int(seg.sum()), hi - lo + 1
            mu = s1 // n
            return int((seg * seg).sum()) - 2 * mu * s1 + n * mu * mu

        def total(cuts):           # cuts: sorted interior fenceposts
            bounds = [0] + list(cuts) + [m + 1]
            return sum(seg_cost(bounds[i], bounds[i + 1] - 1)
                       for i in range(len(bounds) - 1))

        opt = sum(r["sse"] for r in q_vopt_histogram(SF).to_pylist())
        # equal-width cuts plus 200 deterministic pseudo-random cut sets
        rng = np.random.default_rng(7)
        cand = [sorted((np.arange(1, VOPT_BUCKETS) * (m + 1))
                       // VOPT_BUCKETS)]
        for _ in range(200):
            cand.append(sorted(rng.choice(
                np.arange(1, m + 1), size=VOPT_BUCKETS - 1,
                replace=False).tolist()))
        for cuts in cand:
            if len(set(cuts)) == VOPT_BUCKETS - 1 and 0 not in cuts:
                assert opt <= total(cuts)

    def test_more_buckets_never_worse(self, ray_session):
        from candidategeneration_ray.pipelines.sketches import (
            q_vopt_histogram)

        t5 = sum(r["sse"] for r in
                 q_vopt_histogram(SF, n_buckets=5).to_pylist())
        t6 = sum(r["sse"] for r in
                 q_vopt_histogram(SF, n_buckets=6).to_pylist())
        assert t6 <= t5


class TestCvStump:
    def test_matches_bruteforce(self, ray_session):
        """Per fold, train and validate directly on doc-level arrays
        (no sufficient-statistic algebra)."""
        from candidategeneration_ray.functions import hashing as H
        from candidategeneration_ray.functions.tokenize import tokenize_text
        from candidategeneration_ray.pipelines.extras import (
            CV_FOLDS, STUMP_FEATURES, q_cv_stump)

        t = pq.read_table(f"{SF}/documents.parquet")
        toks = [tokenize_text(x) for x in t.column("text").to_pylist()]
        feats = {
            "n_chars": t.column("n_chars").to_numpy().astype(np.int64),
            "n_tokens": np.array([len(x) for x in toks], np.int64),
            "n_types": np.array([len(set(x)) for x in toks], np.int64),
        }
        y = (np.asarray(t.column("lang").to_pylist(), dtype=object)
             == "en").astype(np.int64)
        fold = (H.h64_many([str(i) for i in
                            t.column("doc_id").to_pylist()])
                % np.uint64(CV_FOLDS)).astype(np.int64)
        got = q_cv_stump(SF).to_pylist()
        assert [r["fold"] for r in got] == list(range(CV_FOLDS))
        # candidate thresholds = the feature's distinct values over
        # the WHOLE corpus (the sufficient statistic's domain)
        for row in got:
            f = row["fold"]
            tr = fold != f
            best = None
            for name in sorted(STUMP_FEATURES):
                for v in sorted(set(feats[name].tolist())):
                    lm = feats[name][tr] <= v
                    pl = int(y[tr][lm].sum())
                    nl = int(lm.sum()) - pl
                    pr = int(y[tr].sum()) - pl
                    nr = int(tr.sum() - lm.sum()) - pr
                    err = min(pl, nl) + min(pr, nr)
                    key = (err, name, int(v))
                    if best is None or key < best[:3]:
                        best = (err, name, int(v),
                                1 if pl > nl else 0, 1 if pr > nr else 0)
            err, name, thr, labl, labr = best
            assert (row["train_errors"], row["feature"],
                    row["threshold"], row["left_label"],
                    row["right_label"]) == (err, name, thr, labl, labr)
            va = fold == f
            pred = np.where(feats[name][va] <= thr, labl, labr)
            assert row["val_errors"] == int((pred != y[va]).sum())


class TestShardPlan:
    def test_greedy_properties(self, ray_session):
        from candidategeneration_ray.pipelines.relational import (
            SHARD_PLAN_N, q_shard_plan)

        rows = q_shard_plan(SF).to_pylist()
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["source", "lang", "n_chars"])
        cells: dict[tuple, int] = {}
        for s, l, n in zip(docs.column("source").to_pylist(),
                           docs.column("lang").to_pylist(),
                           docs.column("n_chars").to_pylist()):
            cells[(s, l)] = cells.get((s, l), 0) + n
        # every cell appears exactly once with its true mass
        assert {(r["source"], r["lang"]): r["mass"]
                for r in rows} == cells
        assert all(1 <= r["shard"] <= SHARD_PLAN_N for r in rows)
        # replay the greedy: each placement must hit the least-loaded
        loads = [0] * SHARD_PLAN_N
        for r in sorted(rows, key=lambda r: (-r["mass"], r["source"],
                                             r["lang"])):
            s = r["shard"] - 1
            assert loads[s] == min(loads)
            assert all(loads[i] > loads[s] for i in range(s))
            loads[s] += r["mass"]
        # LPT guarantee: makespan <= (4/3 - 1/3m) * OPT and trivially
        # < total/m + max_mass — check the loose additive bound
        total, mx = sum(cells.values()), max(cells.values())
        assert max(loads) <= total // SHARD_PLAN_N + mx


class TestHashRing:
    def test_counts_and_minimal_movement(self, ray_session):
        from candidategeneration_ray.pipelines.extras import (
            RING_NODES, q_hash_ring_counts, q_hash_ring_rebalance)

        counts = {r["node"]: r["n_docs"]
                  for r in q_hash_ring_counts(SF).take_all()}
        n_docs = pq.read_table(f"{SF}/documents.parquet",
                               columns=["doc_id"]).num_rows
        assert sum(counts.values()) == n_docs
        assert set(counts) <= set(range(1, RING_NODES + 1))
        row = q_hash_ring_rebalance(SF).to_pylist()[0]
        assert row["n_docs"] == n_docs
        # THE consistent-hashing guarantee: every moved doc moved TO
        # the new node — zero reshuffling among the old nodes
        assert row["moved_docs"] == row["moved_to_new"]
        # expected movement ~ n/(N+1); assert a generous envelope
        assert row["moved_docs"] <= n_docs // 2
        assert row["moved_docs"] > 0

    def test_owner_is_clockwise_successor(self, ray_session):
        from candidategeneration_ray.functions import hashing as H
        from candidategeneration_ray.pipelines.extras import (
            RING_NODES, _ring_owner, _ring_points)

        ring = _ring_points(RING_NODES)
        hs, owners = ring
        assert np.all(np.diff(hs.astype(object)) > 0)
        # probe keys around vnode positions: at the vnode, just after,
        # and the global wrap
        one = np.uint64(1)   # uint64 + python int promotes to float64
        probes = np.array([hs[0], hs[0] + one, hs[-1], hs[-1] + one, 0],
                          dtype=np.uint64)
        got = _ring_owner(probes.copy(), ring)
        assert got[0] == owners[0]          # exact hit owns
        assert got[2] == owners[-1]
        assert got[3] == owners[0]          # wraps past the last vnode
        assert got[4] == owners[0]
