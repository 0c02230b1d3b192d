"""Session-14 operators: Kneser-Ney bigram LM, Naive Bayes classifier,
exact ROC-AUC. Each checked against an independent pure-Python
reference over the sf0.001 tables (the driver contract test covers the
SQL oracles; these pin the math itself)."""

import collections
import math

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _tokenize(text):
    from candidategeneration_ray.functions.tokenize import tokenize_text

    return tokenize_text(text)


def _h64(s):
    from candidategeneration_ray.functions import hashing as H

    return int(H.h64_many([s])[0])


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    return list(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist(),
                    t.column("lang").to_pylist()))


def test_kn_bigram_lm_matches_reference(ray_session):
    from candidategeneration_ray.pipelines.textlm import (
        TRAIN_PCT, q_kn_bigram_lm)

    got = q_kn_bigram_lm(SF).to_pydict()
    # pure-Python interpolated KN with D = 3/4 as exact rationals
    bg = collections.Counter()
    for did, text, _ in _docs():
        if _h64(str(did)) % 100 >= TRAIN_PCT:
            continue
        toks = _tokenize(text)
        bg.update(zip(toks, toks[1:]))
    c1 = collections.Counter()
    n1l = collections.Counter()
    n1r = collections.Counter()
    for (w1, w2), c in bg.items():
        c1[w1] += c
        n1l[w1] += 1
        n1r[w2] += 1
    t = len(bg)
    rows = sorted(bg.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    rows = rows[:200]
    assert len(got["w1"]) == len(rows)
    ref = {}
    for (w1, w2), c in rows:
        pnum = (4 * c - 3) * t + 3 * n1l[w1] * n1r[w2]
        pden = 4 * c1[w1] * t
        ref[(w1, w2)] = (c, pnum, pden)
    for w1, w2, c, pnum, pden in zip(got["w1"], got["w2"], got["c"],
                                     got["pnum"], got["pden"]):
        assert ref[(w1, w2)] == (c, pnum, pden)
        assert 0 < pnum < pden  # every smoothed probability in (0, 1)


def test_nb_predict_matches_reference(ray_session):
    from candidategeneration_ray.pipelines.textlm import (
        TRAIN_PCT, q_nb_predict)

    got = q_nb_predict(SF).to_pandas().set_index("doc_id")
    # pure-Python multinomial NB with the same quantization discipline
    cnt = collections.defaultdict(collections.Counter)
    ndocs = collections.Counter()
    val = []
    for did, text, lang in _docs():
        if _h64(str(did)) % 100 < TRAIN_PCT:
            ndocs[lang] += 1
            cnt[lang].update(_tokenize(text))
        else:
            val.append((did, text))
    vocab = sorted({t for c in cnt.values() for t in c})
    v = len(vocab)
    classes = sorted(ndocs)
    tot = sum(ndocs.values())
    w = {}
    for c in classes:
        tc = sum(cnt[c].values())
        for tok in vocab:
            w[(c, tok)] = math.trunc(
                math.log((cnt[c][tok] + 1) / (tc + v)) * 1e7)
    pri = {c: math.trunc(math.log(ndocs[c] / tot) * 1e7) for c in classes}
    assert len(got) == len(val)
    vset = set(vocab)
    for did, text in val:
        toks = [t for t in _tokenize(text) if t in vset]
        scores = {c: pri[c] + sum(w[(c, t)] for t in toks)
                  for c in classes}
        best = min(classes, key=lambda c: (-scores[c], c))
        row = got.loc[did]
        assert row["pred_lang"] == best
        assert int(row["score"]) == scores[best]
        assert int(row["n_known"]) == len(toks)


def test_nb_predict_separates_correlated_classes(ray_session, tmp_path):
    """On a corpus whose token mix IS class-correlated (the sf tables'
    lang label is random metadata, so they can't show this), the
    classifier must recover the class with high accuracy."""
    import pyarrow as pa

    from candidategeneration_ray.pipelines.textlm import q_nb_predict

    vocab = {"en": ["window merge sort table scan batch",
                    "query filter join merge window table"],
             "de": ["fenster tabelle sortieren abfrage zusammen",
                    "abfrage filter tabelle fenster sortieren"]}
    rows = []
    for i in range(120):
        lang = "en" if i % 2 == 0 else "de"
        rows.append((i, vocab[lang][i % 4 // 2] + " extra" + str(i % 3),
                     lang))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = q_nb_predict(str(tmp_path)).to_pandas()
    truth = dict((r[0], r[2]) for r in rows)
    assert len(got) > 0
    acc = np.mean([truth[d] == p for d, p in
                   zip(got["doc_id"], got["pred_lang"])])
    assert acc == 1.0  # fully separable vocabularies


def test_auc_eval_matches_bruteforce(ray_session):
    from candidategeneration_ray.pipelines.extras import q_auc_eval
    from candidategeneration_ray.functions.stopwords import STOPWORDS
    import re

    got = q_auc_eval(SF).to_pydict()
    pos_s, neg_s = [], []
    for _, text, lang in _docs():
        words = [x.lower() for x in re.findall(r"[A-Za-z]+", text)]
        n_words = len(words)
        n_stop = sum(1 for x in words if x in STOPWORDS)
        s = (5000 * n_stop) // max(n_words, 1)
        (pos_s if lang == "en" else neg_s).append(s)
    u2 = 0
    for p in pos_s:
        for n in neg_s:
            u2 += 2 if p > n else (1 if p == n else 0)
    assert got["n_pos"][0] == len(pos_s)
    assert got["n_neg"][0] == len(neg_s)
    assert got["u2"][0] == u2
    assert got["auc_ppm"][0] == (1_000_000 * u2) // (
        2 * len(pos_s) * len(neg_s))
    # the sf labels are random metadata, so AUC ~ chance; only bounds
    assert 0 <= got["auc_ppm"][0] <= 1_000_000
