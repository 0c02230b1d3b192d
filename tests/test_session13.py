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
