"""Session-15 operators: AMS F2 sketch, Count-Sketch, batch perceptron.
Each checked against an independent pure-Python reference over the
sf0.001 tables (the driver contract test covers the SQL oracles; these
pin the math itself)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _token_counts():
    """Exact kept-token occurrence counts, sequential reference."""
    from candidategeneration_ray.functions.tokenize import tokenize_text

    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    counts: dict[str, int] = {}
    for txt in t.column("text").to_pylist():
        for tok in tokenize_text(txt):
            counts[tok] = counts.get(tok, 0) + 1
    return counts


@pytest.fixture(scope="module")
def tf(ray_session):
    return _token_counts()


class TestAmsF2:
    def test_rows_match_sequential(self, ray_session, tf):
        from candidategeneration_ray.functions import hashing as H
        from candidategeneration_ray.pipelines.sketches import (
            AMS_ROWS, q_ams_f2)

        got = {int(r["row"]): (int(r["x"]), int(r["x2"]))
               for r in q_ams_f2(SF).take_all()}
        assert len(got) == AMS_ROWS
        terms = sorted(tf)
        cnt = np.asarray([tf[t] for t in terms], np.int64)
        for r in range(AMS_ROWS):
            h = H.h64_many([f"a{r}:{t}" for t in terms])
            s = np.where(h % np.uint64(2) == 0, 1, -1).astype(np.int64)
            x = int((cnt * s).sum())
            assert got[r] == (x, x * x), f"row {r}"

    def test_estimate_fields(self, ray_session, tf):
        from candidategeneration_ray.pipelines.sketches import (
            AMS_ROWS, q_ams_f2, q_ams_f2_estimate)

        est = q_ams_f2_estimate(SF).to_pylist()[0]
        f2_true = sum(c * c for c in tf.values())
        assert est["f2_true"] == f2_true
        assert est["rows"] == AMS_ROWS
        x2 = sorted(int(r["x2"]) for r in q_ams_f2(SF).take_all())
        assert est["f2_est"] == x2[(AMS_ROWS + 1) // 2 - 1]
        # the median-of-squares estimator should land within an order
        # of magnitude on this corpus (loose sanity, not a hash check)
        assert f2_true / 10 <= est["f2_est"] <= f2_true * 10


class TestCountSketch:
    def test_counters_match_sequential(self, ray_session, tf):
        from candidategeneration_ray.functions import hashing as H
        from candidategeneration_ray.pipelines.sketches import (
            CS_DEPTH, CS_WIDTH, q_countsketch_counters)

        got = {(int(r["depth"]), int(r["cell"])): int(r["cnt"])
               for r in q_countsketch_counters(SF).take_all()}
        terms = sorted(tf)
        cnt = np.asarray([tf[t] for t in terms], np.int64)
        for d in range(CS_DEPTH):
            cells = (H.h64_many([f"s{d}:{t}" for t in terms])
                     % np.uint64(CS_WIDTH)).astype(np.int64)
            signs = np.where(H.h64_many([f"g{d}:{t}" for t in terms])
                             % np.uint64(2) == 0, 1, -1).astype(np.int64)
            ref = np.zeros(CS_WIDTH, np.int64)
            np.add.at(ref, cells, cnt * signs)
            for cell in np.nonzero(ref)[0]:
                assert got.get((d, int(cell)), 0) == int(ref[cell])
            # zero-sum cells may be present or absent depending on
            # whether any term hashed there; present ones must be 0
            for (dd, cell), v in got.items():
                if dd == d:
                    assert v == int(ref[cell])

    def test_estimates_are_medians(self, ray_session, tf):
        from candidategeneration_ray.functions import hashing as H
        from candidategeneration_ray.pipelines.sketches import (
            CS_DEPTH, CS_PROBES, CS_WIDTH, q_countsketch_counters,
            q_countsketch_estimates)

        counters = {(int(r["depth"]), int(r["cell"])): int(r["cnt"])
                    for r in q_countsketch_counters(SF).take_all()}
        est = {r["term"]: (int(r["cs_estimate"]), int(r["true_count"]))
               for r in q_countsketch_estimates(SF).to_pylist()}
        for t in CS_PROBES:
            vals = []
            for d in range(CS_DEPTH):
                cell = int(H.h64_many([f"s{d}:{t}"])[0]
                           % np.uint64(CS_WIDTH))
                sign = 1 if int(H.h64_many([f"g{d}:{t}"])[0]
                                % np.uint64(2)) == 0 else -1
                vals.append(sign * counters.get((d, cell), 0))
            assert est[t][0] == sorted(vals)[CS_DEPTH // 2]
            assert est[t][1] == tf.get(t, 0)


class TestPerceptron:
    def _ref_feats(self):
        import pyarrow as pa

        from candidategeneration_ray.pipelines.extras import _textstats

        t = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text", "lang"])
        s = _textstats(t)
        x = np.stack([
            np.ones(t.num_rows, np.int64),
            s.column("n_words").to_numpy().astype(np.int64),
            s.column("n_stop").to_numpy().astype(np.int64),
            s.column("n_digit_tokens").to_numpy().astype(np.int64),
            s.column("n_punct_chars").to_numpy().astype(np.int64),
        ], axis=1)
        y = np.where(np.asarray(t.column("lang").to_pylist(),
                                dtype=object) == "en", 1, -1).astype(np.int64)
        return x, y

    def test_trajectory_matches_sequential(self, ray_session):
        from candidategeneration_ray.pipelines.textlm import (
            PERCEPTRON_NF, PERCEPTRON_T, q_perceptron)

        got = q_perceptron(SF).to_pylist()
        x, y = self._ref_feats()
        w = np.zeros(PERCEPTRON_NF, np.int64)
        for k in range(1, PERCEPTRON_T + 1):
            m = y * (x @ w) <= 0
            n_err = int(m.sum())
            w = w + (y[m, None] * x[m]).sum(axis=0, dtype=np.int64)
            row = got[k - 1]
            assert row["it"] == k
            assert row["n_err"] == n_err, f"iter {k}"
            for j in range(PERCEPTRON_NF):
                assert row[f"w{j}"] == int(w[j]), f"iter {k} w{j}"

    def test_separable_fixture_converges(self, ray_session, tmp_path):
        """On a linearly separable corpus the batch perceptron must
        reach (and keep) zero training error."""
        import pyarrow as pa

        from candidategeneration_ray.pipelines.textlm import q_perceptron

        rng = np.random.default_rng(7)
        rows = []
        for i in range(200):
            en = i % 2 == 0
            # 'en' docs: many stopwords; others: none (separable on x2)
            words = (["the", "of", "and"] * 5 if en
                     else ["zzz", "qqq", "xxx"] * 5)
            rng.shuffle(words)
            rows.append({"doc_id": i, "text": " ".join(words),
                         "lang": "en" if en else "xx"})
        tab = pa.Table.from_pylist(rows)
        import pyarrow.parquet as _pq

        d = tmp_path / "sep"
        d.mkdir()
        _pq.write_table(tab, str(d / "documents.parquet"))
        out = q_perceptron(str(d), iters=12).to_pylist()
        errs = [r["n_err"] for r in out]
        assert errs[-1] == 0
        # once a separating w is found, the update is empty and the
        # weights freeze: trailing zeros only
        first_zero = errs.index(0)
        assert all(e == 0 for e in errs[first_zero:])


def test_nb_predict_empty_train_split(ray_session, tmp_path):
    """All docs hashing into the val split leaves zero trained classes;
    the prediction must be empty (matching the oracle's empty cls CTE),
    not an argmax crash."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from candidategeneration_ray.functions import hashing as H
    from candidategeneration_ray.pipelines.textlm import TRAIN_PCT, q_nb_predict

    val_ids = [i for i in range(3000)
               if int(H.h64_many([str(i)])[0]) % 100 >= TRAIN_PCT][:20]
    assert val_ids, "fixture needs at least one val-split doc_id"
    tab = pa.Table.from_pylist(
        [{"doc_id": i, "text": "query engine words", "lang": "en"}
         for i in val_ids])
    d = tmp_path / "valonly"
    d.mkdir()
    _pq.write_table(tab, str(d / "documents.parquet"))
    out = q_nb_predict(str(d)).to_pandas()
    assert len(out) == 0
    # Ray's to_pandas drops the schema of an all-empty dataset, so only
    # the row count (and the absence of a crash) is asserted here


def test_chi2_terms_matches_sequential(ray_session):
    """chi2_terms equals a pure-Python bigint reference at sf0.001."""
    import pyarrow.parquet as _pq

    from candidategeneration_ray.functions.tokenize import tokenize_text
    from candidategeneration_ray.pipelines.textlm import (
        CHI2_TOP_K, q_chi2_terms)

    t = _pq.read_table(f"{SF}/documents.parquet",
                       columns=["text", "lang"])
    n_all = t.num_rows
    n_en = 0
    a_cnt: dict[str, int] = {}
    ab_cnt: dict[str, int] = {}
    for txt, lg in zip(t.column("text").to_pylist(),
                       t.column("lang").to_pylist()):
        en = lg == "en"
        n_en += en
        for tok in set(tokenize_text(txt)):
            ab_cnt[tok] = ab_cnt.get(tok, 0) + 1
            if en:
                a_cnt[tok] = a_cnt.get(tok, 0) + 1
    ref = []
    for tok, ab in ab_cnt.items():
        a = a_cnt.get(tok, 0)
        b = ab - a
        c, d = n_en - a, (n_all - n_en) - b
        den = ab * (c + d) * (a + c) * (b + d)
        ppm = (n_all * (a * d - b * c) ** 2 * 1_000_000) // den if den else 0
        ref.append((tok, a, b, ppm))
    ref.sort(key=lambda r: (-r[3], r[0]))
    got = q_chi2_terms(SF).to_pylist()
    assert len(got) == min(CHI2_TOP_K, len(ref))
    for row, (tok, a, b, ppm) in zip(got, ref):
        assert (row["term"], row["a"], row["b"], row["chi2_ppm"]) == \
            (tok, a, b, ppm)


def test_als_rank1_matches_sequential(ray_session):
    """q_als_rank1 equals the sequential integer ALS at sf0.001, and
    the factors are nonnegative fixed-point ints."""
    import pyarrow.parquet as _pq

    from candidategeneration_ray.functions.money import round_scaled
    from candidategeneration_ray.pipelines.relational import (
        ALS_ROUNDS, ALS_SCALE, q_als_rank1)

    t = _pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_suppkey", "l_partkey", "l_quantity"])
    r: dict[tuple[int, int], int] = {}
    q = (round_scaled(t.column("l_quantity").to_numpy()) // 100)
    for s, p, v in zip(t.column("l_suppkey").to_pylist(),
                       t.column("l_partkey").to_pylist(), q.tolist()):
        r[(int(s), int(p))] = r.get((int(s), int(p)), 0) + int(v)
    v_fac = {p: ALS_SCALE for (_, p) in r}
    u_fac: dict[int, int] = {}
    for _ in range(ALS_ROUNDS):
        num: dict[int, int] = {}
        den: dict[int, int] = {}
        for (s, p), rv in r.items():
            num[s] = num.get(s, 0) + rv * v_fac[p]
            den[s] = den.get(s, 0) + v_fac[p] ** 2
        u_fac = {s: (ALS_SCALE * num[s]) // den[s] if den[s] else 0
                 for s in num}
        num, den = {}, {}
        for (s, p), rv in r.items():
            num[p] = num.get(p, 0) + rv * u_fac[s]
            den[p] = den.get(p, 0) + u_fac[s] ** 2
        v_fac = {p: (ALS_SCALE * num[p]) // den[p] if den[p] else 0
                 for p in num}
    got = q_als_rank1(SF).to_pylist()
    gu = {r_["id"]: r_["factor"] for r_ in got if r_["kind"] == "supplier"}
    gv = {r_["id"]: r_["factor"] for r_ in got if r_["kind"] == "part"}
    assert gu == u_fac
    assert gv == v_fac
    assert all(v >= 0 for v in gu.values())
    assert all(v >= 0 for v in gv.values())


def test_ks_source_test_matches_bruteforce(ray_session):
    """KS statistic equals the brute-force empirical-CDF sup over raw
    n_chars values at sf0.001."""
    import itertools

    import pyarrow.parquet as _pq

    from candidategeneration_ray.pipelines.sketches import q_ks_source_test

    t = _pq.read_table(f"{SF}/documents.parquet",
                       columns=["source", "n_chars"])
    by_src: dict[str, list[int]] = {}
    for s, v in zip(t.column("source").to_pylist(),
                    t.column("n_chars").to_pylist()):
        by_src.setdefault(s, []).append(int(v))
    got = {(r["src_a"], r["src_b"]): (r["n_a"], r["n_b"],
                                      r["d_num"], r["d_den"])
           for r in q_ks_source_test(SF).to_pylist()}
    names = sorted(by_src)
    assert len(got) == len(names) * (len(names) - 1) // 2
    for a, b in itertools.combinations(names, 2):
        va, vb = sorted(by_src[a]), sorted(by_src[b])
        na, nb = len(va), len(vb)
        support = sorted(set(va) | set(vb))
        d_num = 0
        for v in support:
            import bisect
            ca = bisect.bisect_right(va, v)
            cb = bisect.bisect_right(vb, v)
            d_num = max(d_num, abs(ca * nb - cb * na))
        assert got[(a, b)] == (na, nb, d_num, na * nb), (a, b)


def test_ridge_regression_matches_float_solve(ray_session):
    """The exact Cramer betas agree with numpy's float ridge solution
    to within the ppm quantization at sf0.001, and replaying the bigint
    arithmetic reproduces the entry bit-for-bit."""
    import pyarrow.parquet as _pq

    from candidategeneration_ray.pipelines.extras import (
        RIDGE_LAMBDA, _textstats, q_ridge_regression)

    t = _pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"])
    s = _textstats(t)
    x1 = s.column("n_words").to_numpy().astype(np.int64)
    x2 = s.column("n_punct_chars").to_numpy().astype(np.int64)
    y = s.column("n_chars").to_numpy().astype(np.int64)
    X = np.stack([np.ones_like(x1), x1, x2], axis=1).astype(np.float64)
    A = X.T @ X + RIDGE_LAMBDA * np.eye(3)
    beta = np.linalg.solve(A, X.T @ y.astype(np.float64))
    got = q_ridge_regression(SF).to_pylist()[0]
    for j in range(3):
        assert abs(got[f"beta{j}_ppm"] / 1e6 - beta[j]) < 1e-3, j
    # bigint replay
    m = {"n": len(y), "sx1": int(x1.sum()), "sx2": int(x2.sum()),
         "sx11": int((x1 * x1).sum()), "sx12": int((x1 * x2).sum()),
         "sx22": int((x2 * x2).sum()), "sy": int(y.sum()),
         "sx1y": int((x1 * y).sum()), "sx2y": int((x2 * y).sum())}
    a = [[m["n"] + RIDGE_LAMBDA, m["sx1"], m["sx2"]],
         [m["sx1"], m["sx11"] + RIDGE_LAMBDA, m["sx12"]],
         [m["sx2"], m["sx12"], m["sx22"] + RIDGE_LAMBDA]]
    b = [m["sy"], m["sx1y"], m["sx2y"]]

    def det3(mm):
        return (mm[0][0] * (mm[1][1] * mm[2][2] - mm[1][2] * mm[2][1])
                - mm[0][1] * (mm[1][0] * mm[2][2] - mm[1][2] * mm[2][0])
                + mm[0][2] * (mm[1][0] * mm[2][1] - mm[1][1] * mm[2][0]))

    det = det3(a)
    for j in range(3):
        aj = [row[:] for row in a]
        for i in range(3):
            aj[i][j] = b[i]
        num = 1_000_000 * det3(aj)
        q = abs(num) // abs(det)
        if (num >= 0) != (det >= 0):
            q = -q
        assert got[f"beta{j}_ppm"] == q, j
