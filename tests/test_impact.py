"""Impact-ordered family: SAAT exactness + admission-cutoff pruning."""

import numpy as np
import pytest


def _brute(term_segments, k):
    acc = {}
    for segs in term_segments:
        for lvl, docs in segs:
            for d in docs.tolist():
                acc[d] = acc.get(d, 0) + lvl
    return sorted(((s, d) for d, s in acc.items()),
                  key=lambda p: (-p[0], p[1]))[:k]


def test_saat_random_vs_bruteforce():
    from candidategeneration_ray.pipelines.impact import IMPACT_Q, saat_topk

    rng = np.random.default_rng(7)
    for _ in range(200):
        nterms = int(rng.integers(1, 5))
        terms = []
        for _ in range(nterms):
            docs = np.sort(rng.choice(60, size=int(rng.integers(1, 30)),
                                      replace=False)).astype(np.int64)
            lvls = rng.integers(1, IMPACT_Q + 1, size=docs.size)
            segs = []
            for lvl in np.unique(lvls)[::-1]:
                segs.append((int(lvl), docs[lvls == lvl]))
            terms.append(segs)
        k = int(rng.integers(1, 8))
        assert saat_topk(terms, k) == _brute(terms, k)


def test_saat_admission_cutoff_prunes():
    """A huge level-1 tail behind a decisive high-impact head must be
    processed WITHOUT admitting its docs: the cutoff fires after the
    head segments, and the result is still exact."""
    from candidategeneration_ray.pipelines.impact import saat_topk

    head = np.arange(10, dtype=np.int64)          # 10 docs at level 8
    tail = np.arange(100, 5100, dtype=np.int64)   # 5000 docs at level 1
    terms = [
        [(8, head), (1, tail)],
        [(8, head), (1, tail + 5000)],
    ]
    got, n_admitted = saat_topk(terms, 5, count_admissions=True)
    assert got == [(16, d) for d in range(5)]
    assert n_admitted == 2  # both level-8 heads; neither level-1 tail


def test_saat_cutoff_strictness_tie():
    """An unseen doc whose best possible total EQUALS the current kth
    sum must still be admitted (it could win the doc-asc tie-break):
    doc 0 appears only in the later segment with total == theta."""
    from candidategeneration_ray.pipelines.impact import saat_topk

    terms = [
        [(4, np.array([10, 11], dtype=np.int64)),
         (4, np.array([0], dtype=np.int64))],
    ]
    got = saat_topk(terms, 2)
    assert got == [(4, 0), (4, 10)]


def test_impact_family_layout(ray_session, tmp_path):
    """The persisted family partitions each key's postings exactly:
    levels descend per key, docs within a level are sorted, and the
    union reconstructs the original list."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import os

    from candidategeneration_ray.config import EngineConfig
    from candidategeneration_ray.functions.varint import decode_delta
    from candidategeneration_ray.pipelines.docquery import build_documents_index
    from candidategeneration_ray.pipelines.impact import build_impact_family
    from candidategeneration_ray.state.queryengine import IndexReader

    SF = "/root/testdata/sf0.001"
    fam = build_impact_family(SF)
    built = build_documents_index(SF, EngineConfig(emit_pairs=False))
    reader = IndexReader(built["final_dir"], built["stats"])
    files = sorted(os.path.join(fam["family_dir"], f)
                   for f in os.listdir(fam["family_dir"])
                   if f.endswith(".parquet"))
    tab = pq.read_table(files)
    keys = tab.column("key").to_numpy()
    lvls = tab.column("impact").to_numpy()
    assert tab.num_rows > 0
    for key in np.unique(keys):
        rows = np.nonzero(keys == key)[0]
        assert list(lvls[rows]) == sorted(lvls[rows], reverse=True)
        parts = [decode_delta(tab.column("docs")[int(r)].as_py()).astype(np.int64)
                 for r in rows]
        for p in parts:
            assert (np.diff(p) > 0).all() if p.size > 1 else True
        got = np.sort(np.concatenate(parts))
        want = np.sort(reader.get(int(key))[0])
        assert np.array_equal(got, want)
